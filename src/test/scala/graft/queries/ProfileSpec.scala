package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy and exactness contracts for the table-profile tiers: the
  * exact profile is the oracle (q161); the HLL and threshold-sampled
  * profiles must agree with it within their documented error regimes. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  // 40k rows: `hi` ~10k distinct, `mid` 500 distinct, `lo` 3 distinct,
  // `gap` 25% null with 100 distinct — deterministic synthetic frame.
  private lazy val frame = (0 until 40000).map { i =>
    (i.toLong % 9973L * 7L + i / 9973L, // ~9973 distinct, non-sequential
      (i % 500).toLong,
      (i % 3).toLong,
      if (i % 4 == 0) None else Some((i % 100).toLong))
  }.toDF("hi", "mid", "lo", "gap")

  private def exactMap = ProfileAnalytics.tableProfile(frame,
      Seq("hi", "mid", "lo", "gap")).collect()
    .map(r => r.getAs[String]("column_name") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
        r.getAs[Long]("n_distinct"))).toMap

  test("HLL profile: counts exact, distinct within 3x the requested rsd") {
    val ex = exactMap
    val ap = ProfileAnalytics.tableProfileApprox(frame,
        Seq("hi", "mid", "lo", "gap"), rsd = 0.05).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct_est"))).toMap
    assert(ap.keySet === ex.keySet)
    ex.foreach { case (c, (n, nulls, d)) =>
      val (an, anulls, dEst) = ap(c)
      assert(an === n && anulls === nulls, s"$c: row/null counts must be exact")
      assert(math.abs(dEst - d) <= math.max(1L, (d * 0.15).toLong),
        s"$c: HLL estimate $dEst vs exact $d outside 15%")
    }
  }

  test("sampled profile: counts exact, high-cardinality estimates in-regime") {
    val ex = exactMap
    val canon = Seq("hi", "mid", "lo", "gap").map(c => c -> col(c).cast("long"))
    val sp = ProfileAnalytics.tableProfileSampled(frame, canon, tDiv = 16L).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_sketch_keys"), r.getAs[Long]("n_distinct_est"))).toMap
    assert(sp.keySet === ex.keySet)
    ex.foreach { case (c, (n, nulls, _)) =>
      val (sn, snulls, _, _) = sp(c)
      assert(sn === n && snulls === nulls, s"$c: row/null counts must be exact")
    }
    // rsd ≈ √(tDiv/D): ~4% at D≈10k — assert a generous 3-sigma 12%
    val (_, _, keysHi, estHi) = sp("hi")
    val dHi = ex("hi")._3
    assert(keysHi > 0, "high-cardinality column must populate the sketch")
    assert(math.abs(estHi - dHi) <= (dHi * 0.12).toLong,
      s"hi: sampled estimate $estHi vs exact $dHi outside 12%")
    // regime limit: a 3-distinct column can only report 0 or a few·tDiv —
    // the contract is "below ~tDiv²", not a point estimate
    assert(sp("lo")._4 <= 16L * 16L, "low-cardinality estimate above tDiv^2")
  }

  test("sampled profile estimate is invariant to repartitioning") {
    val canon = Seq("hi" -> col("hi").cast("long"))
    val a = ProfileAnalytics.tableProfileSampled(frame, canon).collect().head
    val b = ProfileAnalytics.tableProfileSampled(frame.repartition(13), canon)
      .collect().head
    assert(a === b, "hash-gate sketch must not depend on physical layout")
  }
}
