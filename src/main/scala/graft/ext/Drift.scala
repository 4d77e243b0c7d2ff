package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus cohorts — the
  * monitoring step a recurring ingest runs to catch a silent shift in
  * document statistics (token lengths, quality scores, …) between
  * snapshots, sources, or pipeline versions.
  *
  * The statistic is the two-sample Kolmogorov–Smirnov distance
  * D = max_v |ECDF_a(v) − ECDF_b(v)|, computed exactly and entirely in
  * integers: with N_a, N_b the cohort sizes and cum_a(v), cum_b(v) the
  * inclusive cumulative counts, D's numerator at v is
  * |cum_a(v)·N_b − cum_b(v)·N_a| (a 38-digit decimal — no doubles, so
  * the argmax and the reported ppm value are engine-exact).
  *
  * Scale shape: each cohort collapses to its value spine (one grouped
  * count — the only corpus-wide shuffles, keyed on the value), the
  * spines full-outer-join (≤ distinct-values rows), and the two
  * cumulative counts ride the distributed two-pass prefix sum of
  * [[graft.operators.PrefixSum]] — no unpartitioned window even when
  * the value support is large. The final argmax is an ORDER BY ... LIMIT 1
  * over the spine (TakeOrderedAndProject, no global sort).
  */
object Drift {

  /** One-row report: `at_value` (smallest value attaining the max gap),
    * `ks_ppm` = ⌊10⁶·D⌋, and the cohort sizes. `valueCol` must be a
    * numeric column present in both inputs. */
  def ksReport(a: DataFrame, b: DataFrame, valueCol: String,
               ranges: Int = 0): DataFrame = {
    val sa = a.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt_a"))
    val sb = b.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt_b"))
    val spine = sa.join(sb, Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val pre = graft.operators.PrefixSum.exclusiveMulti(spine, "v",
      descending = false, ties = Seq.empty,
      valueCols = Seq("cnt_a" -> "ex_a", "cnt_b" -> "ex_b"), ranges = ranges)
    val totals = spine.agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    pre.crossJoin(broadcast(totals))
      .withColumn("dnum",
        abs(expr("CAST(ex_a + cnt_a AS DECIMAL(38,0)) * n_b") -
          expr("CAST(ex_b + cnt_b AS DECIMAL(38,0)) * n_a")))
      .orderBy(col("dnum").desc, col("v").asc)
      .limit(1)
      .select(col("v").as("at_value"),
        expr("CAST(dnum * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)" +
          " AS BIGINT)").as("ks_ppm"),
        col("n_a"), col("n_b"))
  }
}
