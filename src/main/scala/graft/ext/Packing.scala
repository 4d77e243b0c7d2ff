package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents, in key order, to
  * fixed-token-budget bins — the "group texts into training sequences"
  * step that turns a filtered corpus into fixed-length training rows.
  * Documents are not split; a doc belongs to the bin its starting offset
  * falls in (greedy by running token count), so bins can overhang by at
  * most one document — the standard concat-and-chunk formulation.
  *
  * The assignment is an exclusive prefix sum over the corpus order. At
  * test scale it runs as one unpartitioned window (exact, oracle-
  * mirrorable); at 100 TB the same two-pass shape distributes: per-range
  * partial sums on a range-partitioned sort, then a tiny driver-side
  * exclusive scan over the per-range totals broadcast back as offsets —
  * the window below IS that plan with one range. Packing is inherently
  * an ordered prefix operation; there is no shuffle-free form.
  */
object Packing {

  /** (doc_id, n_tokens, bin) with `bin = floor(prefix_tokens / budget)`,
    * prefix exclusive, ordered by `keyCol`. */
  def packByBudget(docs: DataFrame, keyCol: String, textCol: String,
                   budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = size(TextOps.tokens(TextOps.normText(col(textCol)))).cast("long")
    val w = Window.orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(keyCol), n.as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
  }

  /** Per-bin packing report: docs per bin, token fill, and the id range
    * packed into each bin. */
  def packingReport(docs: DataFrame, keyCol: String, textCol: String,
                    budget: Int): DataFrame =
    packByBudget(docs, keyCol, textCol, budget)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        min(keyCol).as("first_id"), max(keyCol).as("last_id"))
}
