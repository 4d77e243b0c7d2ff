package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bucketized range join to the naive non-equi join on
  * boundary-heavy fixtures, and its plan to the equi-join strategy. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Points every day of Jan-Mar 2020 across 3 keys; intervals of length
  // 0, 1, exactly one bucket (7d), bucket-straddling (10d), and
  // multi-bucket (20d), with starts on and off bucket boundaries
  // (1970-01-01 is a Thursday, so week buckets roll on Thursdays).
  private lazy val points = (0 until 90).flatMap(i => Seq("a", "b", "c").map(k =>
      (k, java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)))))
    .toDF("k", "t")
  private lazy val intervals = (0 until 30).flatMap { i =>
    val start = java.time.LocalDate.of(2020, 1, 3).plusDays(i * 2)
    val len = Seq(0, 1, 7, 10, 20)(i % 5)
    Seq("a", "b").map(k => (k, i.toLong,
      java.sql.Date.valueOf(start), java.sql.Date.valueOf(start.plusDays(len))))
  }.toDF("k", "iid", "s", "e")

  private def naive = points.join(intervals,
    points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
    .select(points("k"), col("iid"), col("t"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    .toSet

  test("bucketized join equals the naive non-equi join, any bucket width") {
    for (w <- Seq(1, 3, 7, 30)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
          "t", "s", "e", bucketDays = w)
        .select(col("k"), col("iid"), col("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
      // exactly-once emission: no dedup pass hides double counting
      assert(got.length == got.toSet.size, s"w=$w emitted duplicate pairs")
      assert(got.toSet == naive, s"w=$w diverged from the naive join")
    }
  }

  test("keys isolate: no cross-key containment leaks") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "s", "e").select("k").distinct().collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b")) // intervals exist only for a and b
  }

  test("plan is an equi join — no nested loop, no cartesian product") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "s", "e").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a quadratic strategy:\n$plan")
  }

  test("overlapping non-key column names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals.withColumnRenamed("s", "t"),
        Seq("k"), "t", "t", "e")
    }
  }
}
