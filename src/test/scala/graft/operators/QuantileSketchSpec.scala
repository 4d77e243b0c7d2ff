package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates land within one cell width of the exact quantile") {
    // skewed deterministic values (quadratic growth → dense head)
    val vals = (0 until 5000).map(i => (i.toLong * i) % 100003)
    val df = vals.toDF("v").repartition(8)
    val buckets = 128
    val probes = Seq(250000L, 500000L, 900000L, 990000L)
    val got = QuantileSketch.histogramQuantiles(df, "v", buckets, probes)
      .collect().map(r => r.getAs[Long]("prob_ppm") ->
        (r.getAs[Long]("estimate"), r.getAs[Long]("cell_lo"), r.getAs[Long]("cell_hi")))
      .toMap
    assert(got.keySet === probes.toSet)
    val sorted = vals.sorted
    val width = (sorted.last - sorted.head) / buckets + 1
    probes.foreach { p =>
      val exact = sorted(((p * (sorted.size - 1)) / 1000000L).toInt)
      val (est, lo, hi) = got(p)
      assert(lo <= est && est <= hi.max(lo), s"estimate outside its cell at $p")
      assert(math.abs(est - exact) <= width,
        s"p=$p est=$est exact=$exact width=$width")
    }
  }

  test("constant column degenerates to the constant") {
    val df = Seq.fill(100)(42L).toDF("v")
    val rows = QuantileSketch.histogramQuantiles(df, "v", 64, Seq(500000L))
      .collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("estimate") === 42L)
  }

  test("grouped sketch: per-group estimates within one global-grid cell") {
    val vals = (0 until 3000).map(i => (s"g${i % 3}", ((i * 97L) % 7001) +
      (i % 3) * 2000)) // shifted distributions per group
    val df = vals.toDF("g", "v").repartition(6)
    val buckets = 128
    val got = QuantileSketch.groupedHistogramQuantiles(df, "g", "v", buckets,
        Seq(500000L))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("estimate"))
      .toMap
    val all = vals.map(_._2)
    val width = (all.max - all.min) / buckets + 1
    vals.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val exact = sorted((sorted.size - 1) / 2)
      assert(math.abs(got(g) - exact) <= width,
        s"group $g: est=${got(g)} exact=$exact width=$width")
    }
  }

  test("partitioning-invariant: cells merge by addition") {
    val df = (0 until 2000).map(i => ((i * 7919L) % 5000)).toDF("v")
    def run(parts: Int) =
      QuantileSketch.histogramQuantiles(df.repartition(parts), "v", 64)
        .collect().map(r => (r.getAs[Long]("prob_ppm"), r.getAs[Long]("estimate")))
        .toSeq
    assert(run(2) === run(13))
  }

  test("heavy tail: a 10^4x outlier blinds the equi-width sketch; the log sketch stays sharp") {
    // 4999 kB-scale docs + ONE 10^4x outlier — the r15 verdict's exact
    // failure case: the (min, max) grid stretches to the outlier, all
    // interior values share cell 0, and every percentile goes vague.
    // The log-bucket grid follows magnitude, so the outlier costs one
    // bucket and every estimate keeps ≤ 2^-subBits relative error.
    val body = (0 until 4999).map(i => 1000L + (i * 7919L) % 3000)
    val vals = body :+ 40000000L
    val df = vals.toDF("v").repartition(8)
    val sorted = vals.sorted
    def exact(p: Long) = sorted(((p * (sorted.size - 1)) / 1000000L).toInt)
    val probes = Seq(250000L, 500000L, 900000L, 990000L)
    // equi-width: cell width = (4e7 - 1000)/256 ≈ 156k >> the body's
    // whole 3k range — the estimate error exceeds the body SPREAD
    val eq = QuantileSketch.histogramQuantiles(df, "v", 256, probes)
      .collect().map(r => r.getAs[Long]("prob_ppm") -> r.getAs[Long]("estimate"))
      .toMap
    val eqWorst = probes.map(p => math.abs(eq(p) - exact(p))).max
    assert(eqWorst > 3000,
      s"expected the equi-width sketch to degrade past the body spread, " +
        s"worst error $eqWorst")
    // log sketch: every estimate within 2^-5 relative of the exact value
    val lg = QuantileSketch.logQuantiles(df, "v", subBits = 5, probes)
      .collect().map(r => r.getAs[Long]("prob_ppm") ->
        (r.getAs[Long]("estimate"), r.getAs[Long]("bucket_lo"),
          r.getAs[Long]("bucket_hi"))).toMap
    probes.foreach { p =>
      val (est, lo, hi) = lg(p)
      val ex = exact(p)
      assert(lo <= ex && ex <= hi, s"p=$p: exact $ex outside [$lo,$hi]")
      assert(math.abs(est - ex).toDouble <= ex.toDouble / 32 + 1,
        s"p=$p: est=$est exact=$ex exceeds 1/32 relative error")
    }
  }

  test("log sketch: values under 2^(subBits+1) are EXACT; grid is value-independent") {
    val df = (0 until 500).map(i => (i * 13L) % 60).toDF("v")
    val rows = QuantileSketch.logQuantiles(df, "v", subBits = 5,
      Seq(500000L)).collect()
    val sorted = (0 until 500).map(i => (i * 13L) % 60).sorted
    val exact = sorted((sorted.size - 1) / 2)
    assert(rows.head.getAs[Long]("estimate") === exact)
    assert(rows.head.getAs[Long]("bucket_lo") ===
      rows.head.getAs[Long]("bucket_hi"), "small-value bucket not exact")
    // value-independence: adding a huge value does not move small
    // buckets (the merge-without-rescan property the equi-width grid
    // cannot have — ITS cells depend on the global max)
    val df2 = ((0 until 500).map(i => (i * 13L) % 60) :+ 1000000000L).toDF("v")
    val rows2 = QuantileSketch.logQuantiles(df2, "v", subBits = 5,
      Seq(500000L)).collect()
    assert(rows2.head.getAs[Long]("estimate") === exact,
      "a planted outlier moved the small-value buckets")
  }

  test("log sketch fails loudly on negative values") {
    val df = Seq(5L, -3L, 7L).toDF("v")
    val e = intercept[Exception] {
      QuantileSketch.logQuantiles(df, "v").collect()
    }
    assert(e.getMessage != null)
  }

  test("grouped log sketch: per-group estimates within relative error on a shared grid") {
    val vals = (0 until 3000).map { i =>
      (s"g${i % 3}", 100L + (i * 97L) % 7001 + (i % 3) * 100000L)
    }
    val df = vals.toDF("g", "v").repartition(7)
    val got = QuantileSketch.groupedLogQuantiles(df, "g", "v", subBits = 5,
        Seq(500000L))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("estimate"))
      .toMap
    vals.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val exact = sorted((sorted.size - 1) / 2)
      assert(math.abs(got(g) - exact).toDouble <= exact.toDouble / 32 + 1,
        s"group $g: est=${got(g)} exact=$exact")
    }
  }
}
