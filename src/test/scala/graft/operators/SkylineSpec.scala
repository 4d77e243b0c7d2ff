package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("staircase frontier matches brute-force domination") {
    // deterministic pseudo-random points in 3 groups
    val pts = (0 until 300).map { i =>
      (s"g${i % 3}", ((i * 37) % 23).toLong, ((i * 53) % 19).toLong)
    }
    val got = Skyline.frontier2d(pts.toDF("g", "lo", "hi"), "g", "lo", "hi")
      .select("g", "lo", "hi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val distinct = pts.distinct
    val want = distinct.filter { case (g, lo, hi) =>
      !distinct.exists { case (g2, lo2, hi2) =>
        g2 == g && lo2 <= lo && hi2 >= hi && (lo2 < lo || hi2 > hi)
      }
    }.toSet
    assert(got === want)
  }

  test("identical points survive as one frontier entry with a row count") {
    val df = Seq(("a", 1L, 5L), ("a", 1L, 5L), ("a", 2L, 4L)).toDF("g", "lo", "hi")
    val rows = Skyline.frontier2d(df, "g", "lo", "hi").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_rows") === 2) // the dominated (2,4) is out
  }

  test("equal-min ties: only the best max survives; equal-max lower-min wins") {
    val df = Seq(("a", 1L, 5L), ("a", 1L, 7L), ("a", 0L, 7L)).toDF("g", "lo", "hi")
    val got = Skyline.frontier2d(df, "g", "lo", "hi")
      .select("lo", "hi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 7L)))
  }
}
