package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The optimizer rule must turn NATURAL-syntax point-in-interval joins
  * into the bucketized equi plan without changing results — and must
  * leave non-matching joins alone. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = (0 until 60).flatMap(i => Seq("a", "b").map(k =>
      (k, java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(i)))))
    .toDF("k", "t")
  private lazy val intervals = (0 until 12).map { i =>
    val start = java.time.LocalDate.of(2021, 1, 2).plusDays(i * 4)
    ("a", i.toLong, java.sql.Date.valueOf(start),
      java.sql.Date.valueOf(start.plusDays(Seq(0, 3, 9, 16)(i % 4))))
  }.toDF("k", "iid", "s", "e")

  // ground truth computed in plain Scala, no Spark join involved
  private lazy val expected = {
    val ps = points.collect().map(r => (r.getString(0), r.getDate(1)))
    val ivs = intervals.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDate(2), r.getDate(3)))
    (for {
      (pk, t) <- ps
      (ik, iid, s, e) <- ivs
      if pk == ik && !t.before(s) && !t.after(e)
    } yield (pk, iid, t.toString)).toSet
  }

  test("natural BETWEEN join is rewritten to the bucketized equi plan") {
    val joined = points.join(intervals,
      points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_bkt"), s"rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"quadratic strategy survived:\n$plan")
    val got = joined.select(points("k"), col("iid"), col("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    assert(got.length == got.toSet.size, "rewrite emitted duplicate pairs")
    assert(got.toSet == expected)
  }

  test("strict bounds rewrite too and match ground truth") {
    val joined = points.join(intervals,
      points("k") === intervals("k") && col("t") > col("s") && col("t") < col("e"))
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_bkt"))
    val got = joined.select(points("k"), col("iid"), col("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2)))
    val strictExpected = expected.filterNot { case (k, iid, t) =>
      intervals.collect().exists(r => r.getString(0) == k && r.getLong(1) == iid &&
        (r.getDate(2).toString == t || r.getDate(3).toString == t))
    }
    assert(got.map(x => (x._1, x._2, x._3.toString)).toSet == strictExpected)
  }

  test("keyless range join is rewritten (no cartesian product)") {
    val joined = points.filter(col("k") === "a").drop("k")
      .join(intervals.drop("k"), col("t") >= col("s") && col("t") <= col("e"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_bkt"), s"rule did not fire:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    val got = joined.select(col("iid"), col("t")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    assert(got == expected.map(x => (x._2, x._3)))
  }

  test("reversed intervals are a no-match, not a Sequence crash") {
    // one dirty interval with e << s: the un-rewritten join returns zero
    // rows for it; the rewrite must do the same instead of throwing
    // 'Illegal sequence boundaries'
    val dirty = Seq(
      ("a", 100L, java.sql.Date.valueOf("2021-03-01"),
        java.sql.Date.valueOf("2021-01-01")),
      ("a", 101L, java.sql.Date.valueOf("2021-01-04"),
        java.sql.Date.valueOf("2021-01-06"))).toDF("k", "iid", "s", "e")
    val joined = points.join(dirty,
      points("k") === dirty("k") && col("t") >= col("s") && col("t") <= col("e"))
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_bkt"))
    val got = joined.select(col("iid"), col("t")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString))
    assert(got.forall(_._1 == 101L))
    assert(got.map(_._2).sorted.toSeq ==
      Seq("2021-01-04", "2021-01-05", "2021-01-06"))
  }

  test("one-sided inequality joins are left alone") {
    val l = Seq((1, 5), (2, 9)).toDF("id", "x")
    val r = Seq((10, 7), (20, 3)).toDF("rid", "y")
    val joined = l.join(r, col("x") <= col("y"))
    assert(!joined.queryExecution.executedPlan.toString.contains("__graft_bkt"))
    assert(joined.collect().map(x => (x.getInt(0), x.getInt(2))).toSet ==
      Set((1, 10)))
  }

  test("the enabled flag turns the rewrite off session-wide") {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val joined = points.join(intervals,
        points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
      assert(!joined.queryExecution.executedPlan.toString.contains("__graft_bkt"),
        "rule fired while disabled")
      // correctness is planner-independent: same rows either way
      val got = joined.select(points("k"), col("iid"), col("t")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString)).toSet
      assert(got == expected)
    } finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  test("skipEquiJoins leaves equi-keyed joins to the hash planner, keyless still rewrites") {
    spark.conf.set(RangeJoinRewrite.SkipEquiKey, "true")
    try {
      val keyed = points.join(intervals,
        points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
      assert(!keyed.queryExecution.executedPlan.toString.contains("__graft_bkt"),
        "equi-keyed join was rewritten despite skipEquiJoins")
      val got = keyed.select(points("k"), col("iid"), col("t")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString)).toSet
      assert(got == expected)
      val keyless = points.filter(col("k") === "a").drop("k")
        .join(intervals.drop("k"), col("t") >= col("s") && col("t") <= col("e"))
      assert(keyless.queryExecution.executedPlan.toString.contains("__graft_bkt"),
        "keyless range join lost the rewrite under skipEquiJoins")
    } finally spark.conf.unset(RangeJoinRewrite.SkipEquiKey)
  }

  test("bucketDays is tunable: wider buckets still match ground truth") {
    spark.conf.set(RangeJoinRewrite.BucketDaysKey, "30")
    try {
      val joined = points.join(intervals,
        points("k") === intervals("k") && col("t") >= col("s") && col("t") <= col("e"))
      assert(joined.queryExecution.executedPlan.toString.contains("__graft_bkt"))
      val got = joined.select(points("k"), col("iid"), col("t")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString)).toSet
      assert(got == expected)
    } finally spark.conf.unset(RangeJoinRewrite.BucketDaysKey)
  }

  test("explicit RangeJoin operator output passes through the rule untouched") {
    // the operator already buckets; the rule's marker guard must not
    // re-bucket it (exactly one __graft_bkt layer in the plan)
    val out = graft.operators.RangeJoin.pointInInterval(
      points, intervals, Seq("k"), "t", "s", "e")
    val got = out.select(col("k"), col("iid"), col("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString)).toSet
    assert(got == expected)
  }
}
