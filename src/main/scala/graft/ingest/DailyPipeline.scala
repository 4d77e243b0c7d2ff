package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's flagship daily batch
  * (`/root/reference/scripts/daily_stock_master_update.py:333-367`,
  * traced in SURVEY.md §3.1) as one composed, set-based Spark job:
  *
  *  1. normalize the crawl drop (T1 substring renames, T3/T4 lenient
  *     date/symbol parsing, T6/T7 cleanup, T8/T9 defaults);
  *  2. validate (required columns, P2 six-digit key, P3 non-empty name,
  *     P4 date sanity) — rejects split off for quarantine, never dropped
  *     silently;
  *  3. upsert into the dimension state (J5/J6 as ONE distributed merge —
  *     the reference loops row-at-a-time against ClickHouse);
  *  4. compaction is inherent (upsert = union + last-write-wins, §4.2);
  *  5. report per-market active/delisted counts (A3).
  *
  * Pure `DataFrame => DataFrame` stages — IO (parquet state, timestamped
  * backups) stays in `graft.sources.Sinks`, so the same pipeline runs over
  * any store. At 100 TB the merge is one shuffle on the key; nothing ever
  * collects to the driver.
  */
object DailyPipeline {

  /** Canonical dimension schema (SURVEY §1.2; reference DDL at
    * `stock_master.py:18-30`). */
  val MasterSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("market", StringType, nullable = false),
    StructField("listing_date", DateType, nullable = true),
    StructField("delisting_date", DateType, nullable = true),
    StructField("is_active", IntegerType, nullable = false),
    StructField("update_dt", TimestampType, nullable = false)))

  /** Korean→English rename map of the reference crawls
    * (`krx_delisted_crawler.py:200-221`), extended with the English
    * passthroughs. First match wins on substring. */
  val DefaultRenames: Seq[(String, String)] = Seq(
    "회사명" -> "name", "종목명" -> "name", "종목코드" -> "symbol",
    "폐지일" -> "delisting_date", "상장일" -> "listing_date",
    "시장" -> "market",
    "company" -> "name", "code" -> "symbol",
    "delist" -> "delisting_date", "list" -> "listing_date",
    "market" -> "market")

  /** Stage 1 — normalize a raw all-string crawl drop into the canonical
    * schema. `stamp` versions the batch (the reference's `update_dt`
    * DEFAULT now(); injected here for determinism). */
  def normalize(raw: DataFrame, stamp: String): DataFrame = {
    val renamed = Normalize.emptyToNull(Normalize.trimAll(
      Normalize.renameBySubstring(raw, DefaultRenames)))
    val withCols = Seq("listing_date", "delisting_date", "market")
      .foldLeft(renamed)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string")))
    withCols.select(
      Normalize.digitsPrefix(col("symbol"), 6).as("symbol"),
      coalesce(col("name"), lit("Unknown")).as("name"),
      coalesce(upper(col("market")), lit("UNKNOWN")).as("market"),
      Normalize.lenientDate(col("listing_date")).as("listing_date"),
      Normalize.lenientDate(col("delisting_date")).as("delisting_date"),
      when(Normalize.lenientDate(col("delisting_date")).isNotNull, 0)
        .otherwise(1).as("is_active"),
      to_timestamp(lit(stamp)).as("update_dt"))
  }

  /** Stage 2 — the QC gate (`sync_delisted_stocks.py:50-101`). */
  def validationRules: Seq[org.apache.spark.sql.Column] = Seq(
    Validate.keyMatches(col("symbol"), "^[0-9]{6}$"),
    Validate.nonEmpty(col("name")),
    Validate.dateInRange(col("listing_date"), "1990-01-01"),
    Validate.dateInRange(col("delisting_date"), "1990-01-01"))

  def validate(df: DataFrame): DataFrame =
    Validate.accept(Validate.requireColumns(df, MasterSchema.fieldNames), validationRules)

  /** Rejected rows (quarantine stream — the reference only logs counts). */
  def rejects(df: DataFrame): DataFrame = Validate.reject(df, validationRules)

  /** Stage 3/4 — merge a normalized+validated batch into the state with
    * last-write-wins on (symbol), versioned by update_dt; ties break
    * deterministically on delisted-over-active then name. */
  def merge(state: DataFrame, batch: DataFrame): DataFrame =
    Ingest.upsert(state, batch, Seq("symbol"), col("update_dt"),
      Seq(col("is_active").asc, col("name").desc))

  /** Empty initial state. */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      MasterSchema)

  /** Stage 5 — the A3 report (`stock_master.py:261-270`): per-market
    * total/active/delisted. */
  def report(state: DataFrame): DataFrame =
    state.groupBy("market")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("is_active") === 1, 1).otherwise(0)).as("n_active"),
        sum(when(col("is_active") === 0, 1).otherwise(0)).as("n_delisted"))
      .orderBy("market")

  /** One daily run: raw crawl drop → merged state (caller persists via
    * Sinks and keeps the rejects stream). */
  def runBatch(state: DataFrame, raw: DataFrame, stamp: String): DataFrame =
    merge(state, validate(normalize(raw, stamp)))
}
