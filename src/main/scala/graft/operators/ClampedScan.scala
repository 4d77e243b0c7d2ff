package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped-at-zero running balance — the inventory/credit scan
  * `b := max(0, b + delta)` that LOOKS like an inherently sequential,
  * non-associative fold (the clamp destroys associativity, so no plain
  * prefix sum or window aggregate computes it directly) and is usually
  * implemented as a per-key collect-and-fold.
  *
  * It linearizes. With prefix sums S_i = Σ_{j≤i} delta_j and the
  * running floor m_i = min(0, min_{j≤i} S_j):
  *
  *     b_i = S_i − m_i
  *
  * (induction: subtracting the lowest water mark is exactly what the
  * clamp forfeited), and a clamp fires at row i iff S_i < m_{i−1} —
  * the prefix sum digs a NEW low. So the whole scan is two stacked
  * window functions over one key-partitioned sort: a running sum and a
  * running min — one shuffle, per-row state, no collect_list, no fold,
  * exact integers. The per-key report then needs no ordered "last row"
  * pick either: final = S_n − min(0, min S), peak = max b.
  */
object ClampedScan {

  /** Per-row clamped balance: adds `balance` (the post-row clamped
    * value) and `clamped` (1 when this row's delta hit the floor) to
    * `df`. `deltaCol` is a LONG column; ordering per key follows
    * `ord`. */
  def withBalance(df: DataFrame, keyCol: String, ord: Seq[Column],
                  deltaCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__s", sum(col(deltaCol)).over(w))
      .withColumn("__m", least(lit(0L), min(col("__s")).over(w)))
      .withColumn("__mprev",
        least(lit(0L), coalesce(min(col("__s")).over(wPrev), lit(0L))))
      .withColumn("balance", col("__s") - col("__m"))
      .withColumn("clamped",
        when(col("__s") < col("__mprev"), 1L).otherwise(0L))
      .drop("__s", "__m", "__mprev")
  }

  /** Per-key summary: movement count, net signed flow, final and peak
    * clamped balance, and clamp count. The final balance is the last
    * row's `balance` carried through the aggregation as
    * `max_by(balance, ord)` — no second window, no join back.
    *
    * `ord` must be PLAIN ASCENDING columns: the same sequence is used
    * both as the window orderBy (where `.desc` would be honored) and as
    * the `max_by` key struct (where sort direction is ignored), so a
    * descending ordering would silently read the final balance from the
    * wrong end of the scan. Enforced, not just documented. */
  def balanceReport(df: DataFrame, keyCol: String, ord: Seq[Column],
                    deltaCol: String): DataFrame = {
    // the ColumnNode subclasses are private[sql]; the class-name check is
    // the accessible way to spot a SortOrder-wrapped column
    require(!ord.exists(_.node.getClass.getSimpleName.startsWith("SortOrder")),
      "balanceReport: ord must be plain ascending columns (no .asc/.desc) — " +
        "the max_by final-balance key ignores sort direction")
    withBalance(df, keyCol, ord, deltaCol)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_moves"),
        sum(col(deltaCol)).as("net_delta"),
        max_by(col("balance"), struct(ord: _*)).as("final_balance"),
        max(col("balance")).as("peak_balance"),
        sum(col("clamped")).as("n_clamps"))
  }
}
