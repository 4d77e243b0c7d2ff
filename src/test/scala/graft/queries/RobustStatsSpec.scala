package graft.queries

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Value-level properties for the robust-stats / audit tier (q197–q200):
  * the DuckDB oracle pins cross-engine parity; these pin the MATH —
  * each statistic is re-derived from first principles on sf0.001 (small
  * enough for brute-force identities) and compared exactly.
  */
class RobustStatsSpec extends SparkSpec {

  test("gini rank formula equals the pairwise mean-difference identity") {
    // G = (2·Σ i·x_i − (n+1)·Σx)/(n·Σx) (ranked form, the query) and
    // G = ΣΣ|x_i − x_j| / (2·n·Σx) (pairwise form) are the same number;
    // with ppm floors they agree exactly since the numerators are 2:1.
    val out = WarehouseAnalytics.giniBySegment(spark, sf001).collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("gini_ppm"))
      .toMap
    val perCust = Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .join(Tables.customer(spark, sf001),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "cents").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.keySet == perCust.keySet)
    perCust.foreach { case (seg, xs) =>
      val n = BigInt(xs.length); val s = xs.map(BigInt(_)).sum
      val p = (for (a <- xs; b <- xs) yield (BigInt(a) - BigInt(b)).abs).sum
      val pairwisePpm = (p * 1000000) / (2 * n * s)
      assert(out(seg) == pairwisePpm.toLong, s"segment $seg")
    }
  }

  test("benford shares cover the digit domain and sum to one") {
    val rows = WarehouseAnalytics.benfordPrices(spark, sf001).collect()
    val digits = rows.map(_.getAs[Int]("digit")).toSet
    assert(digits.subsetOf((1 to 9).toSet) && digits.contains(1))
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum <= 1000000L && obsSum >= 1000000L - 9,
      s"floor-ppm shares sum to $obsSum")
    // Expected Benford ppm values are fixed constants.
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val want = math.round(math.log10(1.0 + 1.0 / d) * 1e6)
      assert(r.getAs[Long]("exp_ppm") == want)
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))
    }
  }

  test("trimmed and winsorized means match a direct recomputation") {
    val out = WarehouseAnalytics.robustMeans(spark, sf001).collect()
    val byPrio = Tables.orders(spark, sf001)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(1))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(identity).map(_._1)).toMap
    out.foreach { r =>
      val xs = byPrio(r.getAs[String]("o_orderpriority"))
      val n = xs.length; val k = n / 20
      assert(r.getAs[Int]("n_orders") == n && r.getAs[Int]("k_trim") == k)
      val trim = xs.slice(k, n - k)
      val lo = xs(k); val hi = xs(n - k - 1)
      assert(r.getAs[Double]("lo_bound") == lo / 100.0)
      assert(r.getAs[Double]("hi_bound") == hi / 100.0)
      assert(r.getAs[Double]("trimmed_mean") ==
        trim.sum.toDouble / 100.0 / trim.length)
      val wins = xs.map(x => math.min(math.max(x, lo), hi))
      assert(r.getAs[Double]("winsor_mean") ==
        wins.sum.toDouble / 100.0 / n)
      // Winsorized mean is bracketed by its clamp bounds.
      assert(r.getAs[Double]("winsor_mean") >= lo / 100.0 &&
        r.getAs[Double]("winsor_mean") <= hi / 100.0)
    }
  }

  test("abc classes partition part revenue under the prior-share rule") {
    val out = WarehouseAnalytics.abcPareto(spark, sf001).collect()
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Int]("n_parts"), r.getAs[Long]("share_ppm"))).toMap
    assert(out.keySet.subsetOf(Set("A", "B", "C")) && out.contains("A"))
    assert(out.values.map(_._2).sum >= 1000000L - 3 &&
      out.values.map(_._2).sum <= 1000000L)
    // Recompute the classification directly: sort desc, prior share.
    val revs = Tables.lineitem(spark, sf001)
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy { case (rev, pk) => (-rev, pk) }
    val total = revs.map(r => BigInt(r._1)).sum
    var prior = BigInt(0)
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    revs.foreach { case (rev, _) =>
      val ppm = prior * 1000000 / total
      val cls = if (ppm < 800000) "A" else if (ppm < 950000) "B" else "C"
      counts(cls) += 1; prior += rev
    }
    counts.foreach { case (cls, n) => assert(out(cls)._1 == n, s"class $cls") }
  }
}
