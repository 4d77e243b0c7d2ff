package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ClampedScanSpec extends SparkSpec {
  import spark.implicits._

  test("window linearization matches the sequential fold exactly") {
    // deterministic pseudo-random multi-key movement log
    val rows = for (k <- 0L until 7L; i <- 0L until 200L) yield {
      val d = ((k * 131 + i * 97) % 41) - 20 // deltas in [-20, 20]
      (k, i, d)
    }
    val got = ClampedScan.balanceReport(
        rows.toDF("k", "i", "d").repartition(5), "k", Seq(col("i")), "d")
      .collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[Long]("final_balance"),
        r.getAs[Long]("peak_balance"), r.getAs[Long]("n_clamps"))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, ms) =>
      var b = 0L; var peak = 0L; var clamps = 0L
      ms.sortBy(_._2).foreach { case (_, _, d) =>
        if (b + d < 0) clamps += 1
        b = math.max(0L, b + d)
        peak = math.max(peak, b)
      }
      assert(got(k) === ((b, peak, clamps)), s"key $k diverged")
    }
  }

  test("all-positive flow never clamps; all-negative pins to zero") {
    val pos = (0L until 50L).map(i => (1L, i, 5L))
    val neg = (0L until 50L).map(i => (2L, i, -5L))
    val rep = ClampedScan.balanceReport((pos ++ neg).toDF("k", "i", "d"),
        "k", Seq(col("i")), "d")
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("final_balance"), r.getAs[Long]("n_clamps")))).toMap
    assert(rep(1L) === ((250L, 0L)))
    assert(rep(2L) === ((0L, 50L)))
  }

  test("balanceReport rejects SortOrder ordering columns") {
    // a .desc ordering would be honored by the window but IGNORED by the
    // max_by final-balance key — the operator must fail fast instead of
    // silently reading the wrong end of the scan
    val df = Seq((1L, 0L, 5L)).toDF("k", "i", "d")
    val e = intercept[IllegalArgumentException] {
      ClampedScan.balanceReport(df, "k", Seq(col("i").desc), "d")
    }
    assert(e.getMessage.contains("plain ascending"))
    // plain columns still pass
    assert(ClampedScan.balanceReport(df, "k", Seq(col("i")), "d").count() == 1)
  }
}
