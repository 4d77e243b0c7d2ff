package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** SRC8 — schema'd CSV bulk load. The reference's initial-load path
  * writes temp CSV and pipes it to `clickhouse-client ... FORMAT CSV`
  * (`/root/reference/src/setup/setup_clickhouse.py:143-170` master,
  * `:209-235` price in 1000-row batches). The Spark-native equivalent is
  * a declared-schema distributed `spark.read.csv`: schema declaration
  * replaces the DDL the pipe relied on, partition parallelism replaces
  * the 1000-row batching, and PERMISSIVE mode keeps the load lenient the
  * way the reference's CSV pipe was (bad cells → null, never a job
  * abort).
  *
  * Scale posture: CSV is splittable when uncompressed, so a 100 TB drop
  * fans out across executors at `maxPartitionBytes` granularity; the
  * explicit schema avoids the full inference pre-pass Spark would
  * otherwise spend on the whole input.
  */
object CsvSource {

  /** Read a CSV file/directory with a declared schema — no inference
    * scan, lenient parsing (malformed cells null out, PERMISSIVE). */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Write a DataFrame as a CSV directory (one part per partition — the
    * engine-native form of the reference's batched pipe). */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
