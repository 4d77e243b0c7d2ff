package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val next = Seq((2L, "beta"), (3L, "gamma-edited"), (4L, "delta")).toDF("id", "text")
    val got = Versioning.snapshotDiff(prev, next, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff hashes cover multi-column rows") {
    val prev = Seq((1L, "a", 10L)).toDF("id", "t", "n")
    val next = Seq((1L, "a", 11L)).toDF("id", "t", "n")
    val got = Versioning.snapshotDiff(prev, next, "id", Seq("t", "n")).collect()
    assert(got.length == 1 && got.head.getString(1) == "changed")
    // same content -> empty diff
    assert(Versioning.snapshotDiff(prev, prev, "id", Seq("t", "n")).count() == 0)
  }

  test("snapshotDiff distinguishes null-position and boundary-shift rows") {
    import org.apache.spark.sql.functions.{col, lit}
    // ("x", null) vs (null, "x"): concat_ws skips nulls, so without the
    // NUL sentinel both would hash to md5("x") and the change vanishes
    val prev = Seq((1L, Some("x"), Option.empty[String]),
      (2L, Some("en"), Some("gb"))).toDF("id", "a", "b")
    val next = Seq((1L, Option.empty[String], Some("x")),
      (2L, Some("eng"), Some("b"))).toDF("id", "a", "b")
    val got = Versioning.snapshotDiff(prev, next, "id", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both rows changed: null moved columns / content crossed the boundary
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("exactNewDocs flags exactly the rows whose content is absent from prev") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    // 10: repeats prev content under a new id (seen); 11: fresh; 12: seen
    val next = Seq((10L, "alpha"), (11L, "delta"), (12L, "beta"))
      .toDF("id", "text")
    val got = Versioning.exactNewDocs(prev, next, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(10L -> 0, 11L -> 1, 12L -> 0))
  }

  test("bloomNewDocs is a sound pre-pass: bloom-new is a subset of exact-new") {
    val prev = (0L until 300L).map(i => (i, s"doc body $i")).toDF("id", "text")
    val next = ((0L until 300L).map(i => (i + 1000L, s"doc body $i")) ++
      (0L until 80L).map(i => (i + 2000L, s"fresh content $i"))).toDF("id", "text")
    val bloom = Versioning.bloomNewDocs(prev, next, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = Versioning.exactNewDocs(prev, next, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Bloom has no false negatives, so anything it calls NEW is truly new:
    // bloom is_new=1 must imply exact is_new=1 on every probed row.
    bloom.foreach { case (id, isNew) =>
      if (isNew == 1) assert(exact(id) == 1, s"bloom flagged seen row $id as new")
    }
    // and the exact side agrees with ground truth by construction
    (0L until 300L).foreach(i => assert(exact(i + 1000L) == 0))
    (0L until 80L).foreach(i => assert(exact(i + 2000L) == 1))
  }

  test("bloomNewDocs never marks previously-seen content as new") {
    val prev = (0L until 200L).map(i => (i, s"doc body $i")).toDF("id", "text")
    // next repeats prev's content under new ids, plus genuinely new rows
    val next = ((0L until 200L).map(i => (i + 1000L, s"doc body $i")) ++
      (0L until 50L).map(i => (i + 2000L, s"fresh content $i"))).toDF("id", "text")
    val got = Versioning.bloomNewDocs(prev, next, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // no false negatives: every repeated-content row must probe as seen
    (0L until 200L).foreach(i => assert(got(i + 1000L) == 0))
    // the sketch is useful: most genuinely-new rows are flagged new
    val flagged = (0L until 50L).count(i => got(i + 2000L) == 1)
    assert(flagged > 40)
  }
}
