package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level invariants for the round-6 report queries (q102-q106) —
  * the cross-checks the DuckDB oracle can't express (it compares final
  * values; these pin the semantics the values are supposed to encode).
  */
class ReportQueriesSpec extends SparkSpec {

  test("q102 transition probabilities partition each from_type") {
    val rows = EventWindows.eventTransitions(spark, sf001).collect()
    assert(rows.nonEmpty)
    // Fixed-point floor division loses < 1e-6 per row, so each group's
    // probability mass sums to 1 from below within |group| ulps.
    rows.groupBy(_.getString(0)).foreach { case (from, grp) =>
      val mass = grp.map(_.getAs[Double]("p")).sum
      assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - grp.length * 1e-6,
        s"$from mass=$mass")
    }
    // Every user's stream of m events contributes exactly m-1 transitions.
    val ev = graft.model.Tables.events(spark, sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q103 latency report is one ordered row") {
    val r = EventWindows.conversionLatency(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_converted") > 0)
    assert(row.getAs[Double]("p50_sec") <= row.getAs[Double]("p90_sec"))
    assert(row.getAs[Double]("p90_sec") <= row.getAs[Long]("max_sec").toDouble)
  }

  test("q104 ABC classes are contiguous down the revenue order") {
    val rows = Analytics.paretoAbc(spark, sf001).collect()
    val classes = rows.map(_.getAs[String]("abc_class"))
    // Cumulative share never decreases and the class sequence is a
    // partition A* B* C* — a supplier can never out-rank its class.
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(classes.mkString.matches("A*B*C*"))
    assert(math.abs(shares.last - 1.0) < 1e-5)
    // Boundary semantics: every A row is still inside 80% + one row.
    rows.filter(_.getAs[String]("abc_class") == "A")
      .foreach(r => assert(r.getAs[Double]("cum_share") <= 0.8 + 1e-6))
  }

  test("q105 recall@3 stays above the LSH quality floor") {
    val rows = ExtQueries.annRecall(spark, sf001).collect()
    assert(rows.length == 10) // one row per query vector
    rows.foreach { r =>
      assert(r.getAs[Int]("k_eff") == 3)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= 3)
    }
    // Regression floor: the 4-plane sign-LSH tier recovers 5/30 of the
    // exact top-3 on the sf0.001 fixtures (avg recall 0.1667). A change
    // that halves the tier's quality (e.g. a broken bucket hash sending
    // queries to empty buckets) lands at <= 0.083 and fails here.
    val avg = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(avg >= 0.1, s"avg recall@3 $avg below 0.1 floor")
  }

  test("q106 flags only rows beyond 3 robust sigmas") {
    val rows = Analytics.robustAnomalies(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("robust_score")) > 3.0))
    // The detector must not flag the bulk of the distribution: flagged
    // days are a strict minority of all traded days.
    val nDays = graft.model.Tables.orders(spark, sf001)
      .select(col("o_orderdate").cast("date")).distinct().count()
    assert(rows.length < nDays / 2)
  }
}
