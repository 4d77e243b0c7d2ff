package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row with the same key
  * and `rightTs <= leftTs` (the canonical market-data lookup: price
  * as-of a timestamp). The reference delegates all temporal logic to
  * lag windows, but a reference user porting quote/trade alignment needs
  * this operator; Spark has no native form.
  *
  * Implementation composes existing operators (preferred over a custom
  * SparkPlan — SURVEY §7.2): tag and union both sides, one window per
  * key ordered by (ts, side, tiebreak) with an ignore-nulls `last` over
  * the unbounded-preceding frame, keep the left rows. Right rows at the
  * same timestamp sort before left rows, so `<=` semantics hold.
  *
  * Scale: ONE shuffle on the key (the window partition) regardless of
  * either side's size — no range-join explosion, no per-row probes.
  * State per key is the sort, bounded by per-key row counts. Ties on
  * (key, rightTs) must be pre-deduplicated by the caller for determinism
  * (`Ingest.compactReplacing`).
  */
object AsOfJoin {

  /** `left` gains `valueCols` from the as-of matched `right` row (null
    * when no right row is at-or-before). Both inputs must share `key`;
    * `valueCols` must exist on `right` and not collide with `left`
    * columns (pre-rename on the right side); `tieBreak` must totally
    * order left rows within (key, ts).
    *
    * All value columns travel in ONE struct through a single
    * ignore-nulls `last`: right rows carry a non-null struct (even when
    * individual fields are null), left rows carry null. Every output
    * value therefore comes from the SAME matched right row — a null
    * field in the latest right row stays null rather than falling back
    * to an older row per-column. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, valueCols: Seq[String],
           tieBreak: Seq[Column]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(valueCols.map(col): _*).as("__vs"))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc +: col("__side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__vs"), ignoreNulls = true).over(w))
    val out = matched.filter(col("__side") === 1)
    valueCols.foldLeft(out)((df, c) => df.withColumn(c, col(s"__m.$c")))
      .drop("__ts", "__side", "__vs", "__m")
  }

  /** As-of join with a STALENESS BOUND: like [[asOf]], but a match older
    * than `maxDays` (calendar days, left ts minus right ts) is treated
    * as no-match — the quote-alignment contract where a price from last
    * quarter must not silently back-fill today's row. Adds
    * `staleness_days` (null when unmatched or out-of-window) so callers
    * can audit match quality.
    *
    * Same single-shuffle plan as [[asOf]] — the tolerance is a post-match
    * projection, not a range join: the window still finds the latest
    * at-or-before row, then the bound nulls it out. (A match-the-newest-
    * IN-window semantics would be identical: the latest match is the
    * only candidate that can satisfy the bound.) */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, valueCols: Seq[String],
                 tieBreak: Seq[Column], maxDays: Int): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct((col(rightTs).as("__rts") +: valueCols.map(col)): _*).as("__vs"))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc +: col("__side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m0", last(col("__vs"), ignoreNulls = true).over(w))
      .withColumn("__age",
        datediff(col(leftTs).cast("date"), col("__m0.__rts").cast("date")))
      .withColumn("__m", when(col("__age") <= maxDays, col("__m0")))
    val out = matched.filter(col("__side") === 1)
      .withColumn("staleness_days",
        when(col("__m").isNotNull, col("__age")))
    valueCols.foldLeft(out)((df, c) => df.withColumn(c, col(s"__m.$c")))
      .drop("__ts", "__side", "__vs", "__m0", "__m", "__age")
  }
}
