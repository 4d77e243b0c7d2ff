package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional per-group skyline (Pareto frontier): the points not
  * dominated by any other point in their group, where domination means
  * ≤ on the minimized axis, ≥ on the maximized axis, and strict on at
  * least one.
  *
  * In 2-D the frontier is a staircase, so the quadratic NOT EXISTS
  * self-join (the textbook formulation — and the DuckDB oracle for it)
  * collapses to ONE window pass: order each group by (minCol asc,
  * maxCol desc) over DISTINCT value pairs; a point survives iff its
  * maxCol strictly exceeds the running max of every earlier point.
  * Earlier rows have smaller-or-equal minCol by the sort, so a
  * non-exceeded point is dominated by whichever earlier point set the
  * running max, and an exceeding point cannot be dominated (any
  * dominator would need ≥ its maxCol with ≤ minCol — i.e. an earlier
  * row with a higher running max). Distinctness makes the tie cases
  * line up with the strictness rule: of two identical points neither
  * dominates, and the distinct collapse keeps that single value pair.
  *
  * Scale shape: the distinct collapse is one grouped aggregation keyed
  * (group, min, max); the window partitions by group. No self-join, no
  * broadcast, nothing quadratic — at any group count the plan is two
  * keyed exchanges.
  */
object Skyline {

  /** Frontier of `df` per `groupCol`, minimizing `minCol` and maximizing
    * `maxCol` (both numeric). Returns (group, minCol, maxCol, n_rows)
    * where n_rows counts the input rows collapsed into that frontier
    * point. */
  def frontier2d(df: DataFrame, groupCol: String, minCol: String,
                 maxCol: String): DataFrame = {
    val points = df.groupBy(col(groupCol), col(minCol), col(maxCol))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col(minCol).asc, col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    points
      .withColumn("__best", max(col(maxCol)).over(w))
      .filter(col("__best").isNull || col(maxCol) > col("__best"))
      .drop("__best")
  }
}
