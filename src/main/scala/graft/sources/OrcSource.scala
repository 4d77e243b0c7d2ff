package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar interchange format next to
  * parquet (SRC7). Warehouses that standardized on Hive/ORC hand corpora
  * over in it; the engine reads and writes it natively so ingestion
  * doesn't round-trip through CSV. Beyond the reference (ClickHouse
  * ingests CSV only, `setup_clickhouse.py:143-170`).
  *
  * Scale posture: ORC is splittable with stripe-level min/max statistics
  * — Spark's vectorized ORC reader prunes stripes on pushed predicates
  * exactly as parquet prunes row groups, and the declared schema keeps
  * column pruning at the scan. Same layout guidance as
  * [[Sinks.writeMonthlyPartitioned]] applies (partition dirs + sorted
  * stripes) when ORC is the persistent format rather than a hand-off. */
object OrcSource {

  /** Read an ORC directory with a declared schema (no inference scan). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write a DataFrame as an ORC directory (one file per partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
