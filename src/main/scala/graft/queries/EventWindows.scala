package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{Parity, Tables}

/** Batch equivalents of streaming time-window operators over the `events`
  * table (SURVEY.md §2.9): the reference is daily-batch with no streaming
  * surface (planned steps at `/root/reference/progress.md:91-148`), so the
  * engine exposes the standard window family as ordinary aggregations —
  * tumbling / sliding via Spark's `window()` (identical semantics to the
  * Structured Streaming operator, epoch-aligned), gap-based sessionization
  * via lag + running sum.
  *
  * Scale posture: tumbling/sliding are single-shuffle hash aggregations on
  * (bucket, key) — partial aggregation upstream means the shuffle carries
  * one row per (window × key), not per event. Sessionization shuffles once
  * on user_id; per-user state is a sort within the partition, bounded by
  * per-user event counts (the same keying a streaming
  * flatMapGroupsWithState would use — see graft.streaming).
  */
object EventWindows {
  import Parity._

  /** Timestamp outputs must be written tz-naive: DuckDB's TIMESTAMP has no
    * zone, and a tz-aware Spark parquet column (isAdjustedToUTC) fails the
    * driver's value compare even at identical instants. The session TZ is
    * pinned to UTC (Verify/Bench builders), so this cast is lossless. */
  private def ntz(c: org.apache.spark.sql.Column) = c.cast("timestamp_ntz")

  /** Tumbling 1-hour window per event_type. `window()` buckets are
    * epoch-aligned, so window_start ≡ date_trunc('hour', ts). */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(ntz(col("window.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour window, 30-minute slide: each event lands in exactly
    * window/slide = 2 buckets. Same single-shuffle shape as tumbling; the
    * fan-out factor multiplies shuffle rows, not scan cost. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(ntz(col("window.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization (30-min inactivity) per user: a new session
    * starts when the gap since the previous event exceeds the threshold;
    * session id = running count of session starts. Gap comparison is done
    * on integer epoch-µs so both engines evaluate the identical predicate.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        ntz(min(col("ts"))).as("session_start"),
        ntz(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Native Spark `session_window` sessionization (the same operator the
    * streaming surface uses — graft.streaming.EventStream.sessionWindows —
    * here in batch mode, oracle-checked from first principles: Spark
    * merges events with gap < gapDuration, so the oracle CTE splits on
    * `diff >= gap`, and window end = last event + gap). */
  def sessionWindowNative(spark: SparkSession, dir: String,
                          gap: String = "30 minutes"): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .select(
        ntz(col("session_window.start")).as("session_start"),
        ntz(col("session_window.end")).as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Dynamic JSON props column → typed fields (`events.props` carries a
    * JSON object; the reference's analogue is the inferred-then-normalized
    * crawl schema, SURVEY.md §1.3). get_json_object is a codegen'd
    * expression — the parse fuses with the scan. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("bigint"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")
}
