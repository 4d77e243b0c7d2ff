package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated test tables (`/root/repo/TESTDATA.md`,
  * schemas in `/root/repo/FIXTURES.md` §B) plus the reference-shaped
  * canonical schemas (SURVEY.md §1.2; reference DDL at
  * `/root/reference/src/clickhouse/stock_master.py:18-30` and
  * `/root/reference/src/clickhouse/price_client.py:78-96`).
  *
  * Scale posture: loaders are plain `spark.read.parquet` so Catalyst keeps
  * full predicate-pushdown / column-pruning / partition-discovery freedom.
  * Nothing is cached or collected here; at 100 TB these reads become
  * distributed columnar scans whose cost is governed entirely by what the
  * downstream plan actually projects and filters.
  */
object Tables {

  /** All driver test tables, one parquet file/dir each. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical types across driver data
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so it is read as nanos-since-epoch (legacy long
    * mode) and truncated to µs with integer `div` (lossless: the data
    * carries nothing below µs) — and plain µs TIMESTAMP, which arrives
    * as TimestampType or TimestampNTZType directly. Normalize all three
    * to a µs TimestampType column; the session timezone is pinned to UTC
    * everywhere (Bench/Verify/specs), so the NTZ→LTZ cast relabels the
    * same wall-clock micros rather than shifting them, and every
    * downstream `unix_micros`/window sees identical values regardless of
    * which generation wrote the file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TimestampNTZType
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Small-input fan-out. Parquet splits at row-group granularity, so a
    * small single-file table arrives as ONE partition and any
    * explode/self-join-heavy operator downstream serializes on one core.
    * Repartition up to the session's default parallelism only when the
    * input is smaller than one split per core — on a real many-row-group
    * (100 TB) input this is a no-op, so large scans never pay an extra
    * shuffle. The decision reads optimizer STATS (file-listing size), not
    * `df.rdd` — forcing the RDD would physical-plan and codegen a scan
    * stage just to read its partition count, then throw it away. */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < BigInt(splitBytes) * target) df.repartition(target) else df
  }
}
