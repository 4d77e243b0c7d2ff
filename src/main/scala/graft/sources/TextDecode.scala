package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Decoded crawl drop: file path, decoded text, and the charset that won
  * the fallback race. */
case class DecodedText(path: String, text: String, charset: String)

/** Charset-fallback text ingest for raw crawl drops — the Spark-native
  * form of the reference's EUC-KR → UTF-8 → CP949 → latin1 decode chain
  * (`/root/reference/src/crawlers/krx_delisted_crawler.py:110-121`):
  * each charset is tried STRICTLY (any malformed byte rejects it) and
  * the first clean decode wins; the terminal latin1 is total (every byte
  * sequence is valid latin1), so the chain never fails.
  *
  * Scale posture: files arrive via the `binaryFile` source (one row per
  * file, distributed listing), and decoding happens in a typed `map` on
  * the executors — a crawl drop of millions of pages decodes with
  * per-file parallelism and zero driver involvement. Decode is genuinely
  * imperative per-file work (charset state machines), which is the one
  * place SURVEY §2.10 sanctions leaving Column expressions.
  */
object TextDecode {

  /** Reference fallback order (KRX pages are usually EUC-KR). */
  val DefaultChain: Seq[String] = Seq("EUC-KR", "UTF-8", "x-windows-949", "ISO-8859-1")

  /** Strict-then-fallback decode of one byte array: first charset that
    * decodes without error wins. The last entry is decoded leniently
    * (REPLACE) so the chain is total even if a caller passes a custom
    * chain ending in a non-total charset. */
  def decode(bytes: Array[Byte], chain: Seq[String] = DefaultChain): (String, String) = {
    chain.dropRight(1).foreach { cs =>
      try {
        val dec = Charset.forName(cs).newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        return (dec.decode(ByteBuffer.wrap(bytes)).toString, cs)
      } catch { case _: CharacterCodingException => () }
    }
    val last = chain.last
    (new String(bytes, Charset.forName(last)), last)
  }

  /** Distributed decode of a `binaryFile` drop: one row per file with
    * (path, text, charset). Pushes a glob/path filter into the listing;
    * decode runs on executors. */
  def readTextWithFallback(spark: SparkSession, pathGlob: String,
                           chain: Seq[String] = DefaultChain): Dataset[DecodedText] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val (text, cs) = decode(bytes, chain)
        DecodedText(path, text, cs)
      }
  }

  /** End-to-end crawl ingest: decode a drop of raw HTML pages, then
    * parse each through the SRC3 HTML-table parser. */
  def readHtmlTables(spark: SparkSession, pathGlob: String,
                     columns: Seq[String],
                     chain: Seq[String] = DefaultChain): DataFrame = {
    import spark.implicits._
    HtmlTableSource.parse(spark,
      readTextWithFallback(spark, pathGlob, chain).map(_.text), columns)
  }
}
