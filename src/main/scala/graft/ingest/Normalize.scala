package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Declarative normalization operators — the Spark re-expression of the
  * reference's crawl-output cleanup (SURVEY.md §2.3 T1–T9; reference at
  * `/root/reference/src/crawlers/krx_delisted_crawler.py:196-257` and
  * `/root/reference/src/crawlers/krx_new_listing_crawler.py:223-303`).
  *
  * Every operator is a pure `DataFrame => DataFrame` (or `Column => Column`)
  * built from codegen'd Catalyst expressions — no UDFs — so normalization
  * stays inside WholeStageCodegen and fuses with the scan at any scale:
  * on a 1000-executor cluster these run as part of the read stage with
  * zero extra shuffles.
  */
object Normalize {

  /** T1 — first-match-wins substring rename map
    * (`krx_delisted_crawler.py:200-221`): for each physical column, the
    * first map entry whose key is a substring of the column name wins.
    * Pure metadata operation (schema-only, zero cost at runtime).
    */
  def renameBySubstring(df: DataFrame, mapping: Seq[(String, String)]): DataFrame = {
    val renames = df.columns.flatMap { c =>
      mapping.collectFirst { case (k, v) if c.contains(k) => c -> v }
    }.toMap
    df.withColumnsRenamed(renames)
  }

  /** T3 — strip non-digits then lenient `yyyyMMdd` date parse; malformed
    * input yields null instead of throwing (Polars `strict=False` parity,
    * `krx_delisted_crawler.py:226-232`). ANSI-safe via try_to_timestamp. */
  def lenientDate(c: Column): Column =
    try_to_timestamp(regexp_replace(c, "[^0-9]", ""), lit("yyyyMMdd")).cast("date")

  /** T4 — strip non-digits, keep first `len` chars (symbol extraction,
    * `krx_delisted_crawler.py:234-241`). */
  def digitsPrefix(c: Column, len: Int = 6): Column =
    substring(regexp_replace(c, "[^0-9]", ""), 1, len)

  /** T5 — lenient numeric parse: strip everything but digits and dot, then
    * try_cast (`"10,000원"` → 10000.0; `krx_new_listing_crawler.py:281-290`). */
  def lenientDouble(c: Column): Column =
    regexp_replace(c, "[^0-9.]", "").try_cast("double")

  /** T4+cast — digit-extracted integer code (lenient). */
  def lenientCode(c: Column): Column =
    regexp_replace(c, "[^0-9]", "").try_cast("bigint")

  /** T6 — empty string → NULL on every string column
    * (`krx_delisted_crawler.py:246-251`). */
  def emptyToNull(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    stringCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c) === "", lit(null)).otherwise(col(c)))
    }
  }

  /** T7 — trim every string column
    * (`load_stock_master_clickhouse.py:116-117`). */
  def trimAll(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    stringCols.foldLeft(df)((d, c) => d.withColumn(c, trim(col(c))))
  }

  /** T8/T9 — conditional defaults (`daily_stock_master_update.py:235-242`,
    * `stock_master.py:67-73`): null → literal default per column. */
  def withDefaults(df: DataFrame, defaults: Map[String, Column]): DataFrame =
    defaults.foldLeft(df) { case (d, (c, default)) =>
      d.withColumn(c, coalesce(col(c), default))
    }
}
