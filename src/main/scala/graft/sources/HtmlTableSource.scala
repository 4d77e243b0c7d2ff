package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SRC3 — HTML table → DataFrame (the reference's crawl-output parse,
  * `/root/reference/src/crawlers/krx_delisted_crawler.py:137-194` and its
  * twin `krx_new_listing_crawler.py:164-221`): pick the `<table>` with the
  * most rows, first row is the header, pad/truncate body cells to the
  * header width.
  *
  * The reference parses one document at a time driver-side with
  * BeautifulSoup; here the parse is a per-partition map over a
  * distributed collection of raw HTML documents (one crawl drop each) —
  * the one operator in the surface that is genuinely imperative
  * (SURVEY.md §2.10), so it uses `mapPartitions`-style row generation
  * rather than Catalyst expressions. Downstream normalization (T1–T9)
  * then runs declaratively.
  */
object HtmlTableSource {

  private val TableRe = "(?s)<table[^>]*>.*?</table>".r
  private val RowRe = "(?s)<tr[^>]*>.*?</tr>".r
  private val CellRe = "(?s)<t[dh][^>]*>(.*?)</t[dh]>".r

  /** Strip nested tags and basic entities from a cell. */
  private[sources] def cleanCell(s: String): String =
    s.replaceAll("(?s)<[^>]*>", "")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">")
      .trim

  /** All rows (as cell sequences) of the largest table in the document;
    * empty when no table exists. */
  private[sources] def largestTableRows(html: String): Seq[Seq[String]] = {
    val tables = TableRe.findAllIn(html).toSeq
    if (tables.isEmpty) Seq.empty
    else {
      val best = tables.maxBy(t => RowRe.findAllIn(t).size)
      RowRe.findAllIn(best).toSeq
        .map(r => CellRe.findAllMatchIn(r).map(m => cleanCell(m.group(1))).toSeq)
        .filter(_.nonEmpty)
    }
  }

  /** Header of the largest table of one (representative) document — the
    * driver-side schema-discovery step (the reference reads the header of
    * its single crawled page the same way). */
  def discoverHeader(html: String): Seq[String] =
    largestTableRows(html).headOption.getOrElse(Seq.empty)

  /** Parse a distributed collection of HTML documents into one DataFrame
    * with the given columns: per document, take the largest table, drop
    * its header row, pad/truncate every body row to the column count
    * (reference pad/truncate at `krx_delisted_crawler.py:170-180`).
    * All-string output — typing is the normalize stage's job. */
  def parse(spark: SparkSession, htmlDocs: Dataset[String],
            columns: Seq[String]): DataFrame = {
    val n = columns.size
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    val rows = htmlDocs.rdd.mapPartitions(_.flatMap { html =>
      largestTableRows(html).drop(1).map { cells =>
        Row.fromSeq(cells.padTo(n, "").take(n))
      }
    })
    spark.createDataFrame(rows, schema)
  }
}
