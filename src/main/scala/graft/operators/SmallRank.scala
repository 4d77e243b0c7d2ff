package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contractual rank for an already-limited top-k result.
  *
  * Every top-k head in the engine plans as `orderBy(...).limit(k)` —
  * TakeOrderedAndProject, never a global sort — and then needs a 1..k
  * rank column. Reading `monotonically_increasing_id()` off the limited
  * result assumes the limit emits ONE partition in sort order, which is
  * an implementation detail of the current physical strategy, not an API
  * contract (the id function is documented nondeterministic; a future
  * CollectLimit / AQE plan change would scramble ranks silently). This
  * helper ranks by CONTRACT instead: `row_number()` over a window that
  * re-states the same ordering. The window's constant partition key is
  * folded away by the optimizer, leaving an UNPARTITIONED window — which
  * is exactly right here: its input is the k-row relation the limit
  * already produced, so the single-task window is bounded by
  * construction, never by data volume (PlanSpec's window pins accept an
  * empty partition spec only above a GlobalLimit for this reason).
  */
object SmallRank {

  /** Adds an `IntegerType` `rank` column (1-based) to `df` — a result
    * already truncated to a bounded row count — ordered by `ord`, which
    * must restate the `orderBy` that fed the `limit` (ties included, so
    * the rank is deterministic). */
  def afterLimit(df: DataFrame, ord: Column*): DataFrame =
    df.withColumn("rank",
      row_number().over(Window.partitionBy(lit(0)).orderBy(ord: _*)))
}
