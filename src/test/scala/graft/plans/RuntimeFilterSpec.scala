package graft.plans

import graft.SparkSpec
import graft.queries.Correlated

/** Runtime bloom-filter compatibility pin: at cluster scale, Spark's
  * `InjectRuntimeFilter` can push a bloom probe built from a selective
  * join side onto the fact scan (`spark.sql.optimizer.runtime.
  * bloomFilter.*`). The rule only fires above size thresholds that a
  * test-scale parquet never meets (application side > ~10 GB by
  * default), so this spec lowers the thresholds and pins that the
  * engine's join shapes — plain equi joins over pruned key projections,
  * nothing exotic — remain ELIGIBLE for the injection: the optimized
  * plan grows a `bloom_filter_might_contain` probe on the fact side.
  * If a future refactor re-shapes a join so the filter can no longer
  * inject (e.g. hiding the join key behind a non-trivial expression),
  * this fails loudly rather than silently costing a full fact scan at
  * 100 TB.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("brand-pruned fact join stays eligible for runtime bloom injection") {
    // InjectRuntimeFilter is deliberately conservative: the selective
    // filter must sit directly over the scan that owns the creation-side
    // join key (a filter reached through ANOTHER join's branch — e.g.
    // q151's nation prune feeding supplier — does not qualify). q132's
    // brand equality over `part` is exactly the qualifying shape.
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the rule only helps (and only fires) on shuffle joins — at test
      // scale everything broadcasts, so disable auto-broadcast to model
      // the cluster-scale shape where the fact side actually shuffles
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = Correlated.smallQtyRevenue(spark, sf001)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter no longer injects on the fact join:\n$p")
    }
  }
}
