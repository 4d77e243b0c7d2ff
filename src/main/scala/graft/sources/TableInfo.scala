package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage introspection over the monthly-partitioned fact layout — the
  * Spark analogue of the reference's `get_table_info`
  * (`/root/reference/src/clickhouse/price_client.py:286-318`), which
  * reports total rows, distinct symbols, and per-partition rows/bytes
  * out of `system.parts`. Here the "system table" is the partition
  * directory tree [[Sinks.writeMonthlyPartitioned]] lays down: bytes and
  * file counts come from an O(#partitions) filesystem listing, row
  * counts from a parquet count that Spark satisfies from footer
  * metadata (no data pages are read).
  */
object TableInfo {

  /** Per-partition physical stats: one row per `part_month` with
    * n_rows / n_bytes / n_files. The directory listing is driver-side
    * but touches only partition dirs and their file statuses — the same
    * order of work as querying `system.parts`, independent of row
    * count. */
  def partitionStats(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.read.parquet(path)
      .groupBy(col(Sinks.MonthCol).cast("string").as(Sinks.MonthCol))
      .agg(count(lit(1)).as("n_rows"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory)
      .toSeq.map { d =>
        val month = d.getPath.getName.dropWhile(_ != '=').drop(1)
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        (month, files.map(_.getLen).sum, files.length.toLong)
      }
    import spark.implicits._
    rows.join(parts.toDF(Sinks.MonthCol, "n_bytes", "n_files"),
        Seq(Sinks.MonthCol))
      .select(col(Sinks.MonthCol), col("n_rows"), col("n_bytes"), col("n_files"))
      .orderBy(Sinks.MonthCol)
  }

  /** Table-level summary (the reference's headline numbers): total rows,
    * distinct key values, partition count, total bytes. One distributed
    * aggregation + the partition listing above. */
  def summary(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val stats = partitionStats(spark, path)
      .agg(sum("n_rows").as("n_rows"), sum("n_bytes").as("n_bytes"),
        count(lit(1)).as("n_partitions"))
    val keys = spark.read.parquet(path)
      .agg(countDistinct(col(keyCol)).as("n_keys"))
    stats.crossJoin(keys)
      .select(col("n_rows"), col("n_keys"), col("n_partitions"), col("n_bytes"))
  }
}
