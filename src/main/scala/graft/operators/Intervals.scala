package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Overlapping-interval union (the gaps-and-islands merge): collapse a
  * per-key set of half-open integer intervals [start, end) into maximal
  * disjoint "islands" and measure what they cover.
  *
  * The classic sequential sweep (sort by start, extend or cut the
  * current island) becomes one PARTITIONED window pipeline: per key,
  * order by (start, end), compare each start against the running max of
  * all earlier ends — a strictly greater start opens a new island — and
  * turn the open-island flags into island ids with a running sum over
  * the same frame. Two window functions, one shuffle, state = one row
  * per task; keys partition independently, so a single key's history is
  * the only thing that serializes (the same contract as every per-key
  * window in the engine).
  */
object Intervals {

  /** One row per (key, island): `island_start`, `island_end`,
    * `n_intervals` merged into it. `startCol`/`endCol` are integer
    * columns (half-open, start < end). Touching intervals
    * ([1,3),[3,5)) merge — start = previous end extends, start >
    * previous end cuts. */
  def islands(df: DataFrame, keyCol: String, startCol: String,
              endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__cut",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island").as("island_id"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Per-key coverage report over the merged islands: interval count,
    * island count, covered units (Σ island lengths) and the key's total
    * span — the duty-cycle summary (covered/span) of an activity
    * timeline. */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
               endCol: String): DataFrame =
    islands(df, keyCol, startCol, endCol)
      .groupBy(keyCol)
      .agg(sum(col("n_intervals")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"),
        (max(col("island_end")) - min(col("island_start"))).as("span"))
}
