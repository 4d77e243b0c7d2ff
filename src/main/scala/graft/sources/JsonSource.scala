package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink with a declared schema — the interchange
  * format crawl and annotation pipelines actually drop (one JSON object
  * per line). The reference stores JSON only embedded in strings (its
  * HTTP layer, `client.py:23-51`); as an ENGINE format this completes
  * the source matrix next to parquet (SRC7), CSV (SRC8), raw HTML
  * (SRC3) and binary drops.
  *
  * Scale posture mirrors [[CsvSource]]: JSON-lines is splittable, the
  * declared schema skips the whole-input inference pre-pass, and
  * PERMISSIVE mode nulls malformed records instead of aborting a
  * 100 TB load (`columnNameOfCorruptRecord` is left unset — corrupt
  * rows surface as all-null, countable by the data-quality operators).
  */
object JsonSource {

  /** Read JSON-lines with a declared schema — no inference scan. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Write a DataFrame as a JSON-lines directory (one part per
    * partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
