package graft.queries

import graft.SparkSpec
import graft.ext.{Sampling, TextDedup}
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Value-level properties for the lifecycle tier (q217–q219): sequential
  * rules against a direct replay, Kaplan–Meier against its defining
  * identities, and the leak-free split against per-document band
  * membership.
  */
class LifecycleSpec extends SparkSpec {

  test("sequential rules match a direct first-purchase replay") {
    val out = WarehouseAnalytics.sequentialRules(spark, sf001).collect()
    assert(out.nonEmpty && out.length <= 25)
    val firsts = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(min(col("o_orderdate").cast("date")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val adopters = firsts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val frequent = adopters.filter(_._2 >= 5).keySet
    val byCust = firsts.filter(t => frequent(t._2)).groupBy(_._1)
    val pairCounts = byCust.values.flatMap { arr =>
      val items = arr.toSeq
      for (a <- items; b <- items if a._3.isBefore(b._3)) yield (a._2, b._2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      assert(pairCounts(key) == r.getAs[Long]("n_cust"), s"support of $key")
      assert(adopters(key._1) == r.getAs[Long]("n_ante"))
      assert(r.getAs[Long]("conf_ppm") ==
        r.getAs[Long]("n_cust") * 1000000L / r.getAs[Long]("n_ante"))
    }
    // the head really is the top of the support order
    val maxSupport = pairCounts.values.max
    assert(out.head.getAs[Long]("n_cust") == maxSupport)
  }

  test("kaplan-meier satisfies its defining identities") {
    val out = WarehouseAnalytics.kaplanMeier(spark, sf001).collect()
    assert(out.length > 1)
    val rows = out.sortBy(_.getAs[Int]("t_months"))
    val total = rows.map(_.getAs[Long]("n_at_t")).sum
    // risk set: suffix sums of arrivals, starting from the full cohort
    var remaining = total
    var logSurv = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") == remaining, s"t=${r.getInt(0)}")
      val (n, d) = (r.getAs[Long]("n_risk"), r.getAs[Long]("n_churn"))
      assert(d <= n && d >= 0)
      assert(r.getAs[Long]("hazard_ppm") == d * 1000000L / n)
      val term = math.round(math.log(math.max(n - d, 1L).toDouble) * 1e6) -
        math.round(math.log(n.toDouble) * 1e6)
      logSurv += term
      assert(r.getAs[Long]("log_surv_micro") == logSurv)
      remaining -= r.getAs[Long]("n_at_t")
    }
    assert(remaining == 0L)
    // log-survival is non-increasing (each factor <= 1)
    val ls = rows.map(_.getAs[Long]("log_surv_micro"))
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a })
    // censoring is active: some rows must have arrivals that don't churn
    assert(rows.exists(r => r.getAs[Long]("n_at_t") > r.getAs[Long]("n_churn")))
  }

  test("eval split keeps only eval-bucket docs with no train band collision") {
    val kept = CurationQueries.leakFreeEvalSplit(spark, sf001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept.nonEmpty)
    val docs = Tables.documents(spark, sf001)
    val buckets = docs.select(col("doc_id"),
        Sampling.bucket100(col("doc_id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.forall(buckets(_) >= 80), "every survivor is an eval doc")
    val bands = TextDedup.minhashBands(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("band_hash")))
    val trainBuckets = bands.filter(t => buckets(t._1) < 80)
      .map(t => (t._2, t._3)).toSet
    val evalDocs = buckets.filter(_._2 >= 80).keySet
    val leaky = bands.filter(t => evalDocs(t._1) &&
      trainBuckets((t._2, t._3))).map(_._1).toSet
    assert(kept == evalDocs -- leaky)
  }
}
