package graft.queries

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Value-level properties for the audit/maintenance tier (q207–q211):
  * constraint audit, percentile normalization, incremental aggregate
  * maintenance, k-anonymity, RFM segmentation.
  */
class AuditSpec extends SparkSpec {

  test("constraint audit covers all 17 constraints and is exercised") {
    val rows = ProfileAnalytics.constraintAudit(spark, sf001).collect()
    assert(rows.length == 17)
    assert(rows.count(_.getAs[String]("kind") == "pk") == 10)
    assert(rows.count(_.getAs[String]("kind") == "fk") == 7)
    val byName = rows.map(r => r.getAs[String]("constraint_name") -> r).toMap
    // The synthetic lineitem violates its composite PK — the audit must
    // SEE that, or a broken distinct-count would pass silently.
    assert(byName("pk_lineitem").getAs[Long]("n_violations") > 0)
    // Cross-check one PK leg directly.
    val li = Tables.lineitem(spark, sf001)
    val n = li.count()
    val nd = li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(byName("pk_lineitem").getAs[Long]("n_rows") == n)
    assert(byName("pk_lineitem").getAs[Long]("n_violations") == n - nd)
    rows.foreach { r =>
      assert(r.getAs[Long]("violation_ppm") ==
        r.getAs[Long]("n_violations") * 1000000L /
          math.max(r.getAs[Long]("n_rows"), 1L))
    }
  }

  test("incremental state merge equals the flat aggregate") {
    val merged = WarehouseAnalytics.incrementalAgg(spark, sf001).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("revenue"),
          r.getAs[java.sql.Date]("last_order").toString)).toMap
    val flat = Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .cast("double") / 100.0).as("rev"),
        max(col("o_orderdate").cast("date")).as("d"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("rev"),
          r.getAs[java.sql.Date]("d").toString)).toMap
    assert(merged == flat)
  }

  test("k-anonymity classes partition the customer table") {
    val rows = ProfileAnalytics.kAnonymity(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("class_size")).sum ==
      Tables.customer(spark, sf001).count())
    rows.foreach { r =>
      assert((r.getAs[Long]("class_size") >= 5) ==
        (r.getAs[Int]("is_k_anonymous") == 1))
    }
  }

  test("rfm quintiles are balanced within segment and labels consistent") {
    val rows = WarehouseAnalytics.rfmSegments(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (seg, rs) =>
      Seq("r", "f", "m").foreach { dim =>
        val counts = rs.groupBy(_.getAs[Int](dim)).view.mapValues(_.length)
        assert(counts.keySet.subsetOf((1 to 5).toSet), s"$seg/$dim")
        if (rs.length >= 5)
          assert(counts.values.max - counts.values.min <= 1, s"$seg/$dim")
      }
    }
    rows.foreach { r =>
      val (rr, f, m) = (r.getAs[Int]("r"), r.getAs[Int]("f"), r.getAs[Int]("m"))
      val want =
        if (rr >= 4 && f >= 4 && m >= 4) "champion"
        else if (f >= 4) "loyal"
        else if (m >= 4) "big_spender"
        else if (rr <= 2 && f <= 2) "hibernating"
        else if (rr <= 2) "at_risk"
        else "regular"
      assert(r.getAs[String]("segment") == want)
    }
  }

  test("percentile normalization is a within-source uniform rank") {
    val rows = CurationQueries.percentileNormalize(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r =>
        (-r.getAs[Long]("score_ppm"), r.getAs[Long]("doc_id")))
      assert(sorted.head.getAs[Long]("pct_ppm") == 0, src)
      if (rs.length > 1) assert(sorted.last.getAs[Long]("pct_ppm") == 1000000L)
      val ps = sorted.map(_.getAs[Long]("pct_ppm"))
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, src)
    }
  }
}
