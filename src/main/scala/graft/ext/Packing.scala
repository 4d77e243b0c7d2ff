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
  * The assignment is an exclusive prefix sum over the corpus order,
  * computed with the distributed two-pass scheme of
  * [[graft.operators.PrefixSum]] — per-range partial sums under a
  * deterministic key bucketing, a driver-side exclusive scan over the
  * ≤ `ranges` per-range totals, broadcast offsets back. No single task
  * ever sees more than one range, so the plan survives a corpus of any
  * size — the failure mode of the naive global-window form (kept as
  * [[packByBudgetGlobalWindow]] for the equality spec) is the one
  * unpartitioned window that drags every (doc, count) row to a single
  * task. Packing is inherently an ordered prefix operation; two passes
  * over the narrow (key, n_tokens) projection is the shuffle-minimal
  * form (PrefixSum stages the projection once via localCheckpoint, so
  * the text is tokenized exactly once however many passes read it).
  *
  * Bin assignment is invariant to WHERE the range boundaries fall (any
  * contiguous split yields the same prefix sums — PackingSpec pins
  * equality for range counts 1/3/8/64 on a skewed corpus), so the
  * quantile approximation only affects balance, never values.
  */
object Packing {

  /** (doc_id, n_tokens, bin) with `bin = floor(prefix_tokens / budget)`,
    * prefix exclusive, ordered by `keyCol` (numeric). Distributed
    * two-pass prefix sum; `ranges` defaults to the session's shuffle
    * parallelism. */
  def packByBudget(docs: DataFrame, keyCol: String, textCol: String,
                   budget: Int, ranges: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.types.NumericType
    // Non-numeric corpus keys (string/date orderings) can't be
    // range-bucketed by quantile; they keep the pre-round-6 global
    // window semantics rather than failing a previously-legal call.
    if (!docs.schema(keyCol).dataType.isInstanceOf[NumericType])
      return packByBudgetGlobalWindow(docs, keyCol, textCol, budget)
    val n = size(TextOps.tokens(TextOps.normText(col(textCol)))).cast("long")
    // Narrow projection first: only (key, n_tokens) ever reaches the
    // prefix machinery — the text never travels through an exchange.
    val base = docs.select(col(keyCol), n.as("n_tokens"))
    graft.operators.PrefixSum.exclusive(base, keyCol, descending = false,
        ties = Seq.empty, valueCol = "n_tokens", outCol = "prefix",
        ranges = ranges)
      .select(col(keyCol), col("n_tokens"),
        floor(col("prefix") / budget).as("bin"))
  }

  /** The naive single-window form of [[packByBudget]]: exact and
    * oracle-mirrorable, but the unpartitioned window moves every
    * (key, n_tokens) row to ONE task — reference semantics for the
    * equality spec, not a scale path. */
  private[graft] def packByBudgetGlobalWindow(
      docs: DataFrame, keyCol: String, textCol: String,
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
