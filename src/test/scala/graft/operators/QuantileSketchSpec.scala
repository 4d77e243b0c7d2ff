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
}
