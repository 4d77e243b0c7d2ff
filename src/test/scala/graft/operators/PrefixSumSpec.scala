package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the distributed two-pass prefix sum to the global-window
  * reference semantics for both directions, under ties, skew, and
  * range counts from degenerate (1) to more-than-rows. The ascending
  * path is additionally pinned end-to-end by PackingSpec (q59). */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  // Heavy ties (v repeats every 7) force equal keys across would-be
  // boundaries; the tie column keeps the total order unique.
  private lazy val data = scala.util.Random.shuffle(
    (0L until 500L).toList).map(i => (i, i % 7, (i % 13) + 1))
    .toDF("id", "v", "amt")

  private def reference(descending: Boolean): Map[Long, Long] = {
    val ord = if (descending) Seq(col("v").desc, col("id"))
      else Seq(col("v").asc, col("id"))
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    data.withColumn("p", coalesce(sum(col("amt")).over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
  }

  test("ascending exclusive prefix matches the global window, any range count") {
    val ref = reference(descending = false)
    for (n <- Seq(1, 4, 32, 1000)) {
      val got = PrefixSum.exclusive(data, "v", descending = false,
          ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = n)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == ref, s"ranges=$n diverged")
    }
  }

  test("descending exclusive prefix matches the global window, any range count") {
    val ref = reference(descending = true)
    for (n <- Seq(1, 3, 32)) {
      val got = PrefixSum.exclusive(data, "v", descending = true,
          ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = n)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == ref, s"ranges=$n diverged")
    }
  }

  test("prefix window is range-keyed — no unpartitioned window in the plan") {
    val plan = PrefixSum.exclusive(data, "v", descending = false,
        ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__rng") ||
      plan.contains("hashpartitioning(_rng"),
      s"expected a range-id-keyed window exchange in:\n$plan")
  }

  test("null keys take the window's null position in both directions") {
    // Spark windows sort nulls FIRST ascending and LAST descending; the
    // range bucketing must agree or every offset shifts.
    val withNulls = (0L until 100L).map(i =>
      (i, if (i % 10 == 0) null else java.lang.Long.valueOf(i % 5), 1L))
      .toDF("id", "v", "amt")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("v").desc, col("id"))
        else Seq(col("v").asc, col("id"))
      val w = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = withNulls
        .withColumn("p", coalesce(sum(col("amt")).over(w), lit(0L)))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val got = PrefixSum.exclusive(withNulls, "v", descending = desc,
          ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == ref, s"desc=$desc diverged with null keys")
    }
  }

  test("NaN keys take the window's NaN position (greater than all)") {
    val withNaN = (0L until 60L).map(i =>
      (i, if (i % 12 == 0) Double.NaN else (i % 5).toDouble, 1L))
      .toDF("id", "v", "amt")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("v").desc, col("id"))
        else Seq(col("v").asc, col("id"))
      val w = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = withNaN
        .withColumn("p", coalesce(sum(col("amt")).over(w), lit(0L)))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val got = PrefixSum.exclusive(withNaN, "v", descending = desc,
          ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == ref, s"desc=$desc diverged with NaN keys")
    }
  }

  test("non-numeric key is rejected") {
    val df = Seq(("a", 1L)).toDF("k", "amt")
    intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df, "k", descending = false, ties = Seq.empty,
        valueCol = "amt", outCol = "p")
    }
  }
}
