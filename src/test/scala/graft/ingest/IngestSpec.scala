package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Set-based ingest operators (SURVEY.md §2.8/§2.4/§4.2): dedup, union,
  * upsert, compaction, mutation-as-rewrite. Golden cases mirror the
  * reference's behaviors (ReplacingMergeTree last-write-wins, anti-join
  * new keys, relaxed union null-fill).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("dedupByKey keeps exactly one deterministic row per key") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 2, 5.0), ("b", 1, 1.0), ("b", 1, 2.0)
    ).toDF("k", "v", "x")
    val out = Ingest.dedupByKey(df, Seq("k"), Seq(col("v").desc, col("x").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2, 5.0), ("b", 1, 2.0)))
  }

  test("relaxedUnion aligns by name and null-fills missing columns") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 9.5)).toDF("id", "score")
    val out = Ingest.relaxedUnion(Seq(a, b)).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("name") == "x" && out(0).isNullAt(out(0).fieldIndex("score")))
    assert(out(1).getAs[Double]("score") == 9.5 && out(1).isNullAt(out(1).fieldIndex("name")))
  }

  test("newKeys returns only rows whose key is absent from existing") {
    val incoming = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val existing = Seq(("a", 99)).toDF("k", "v")
    val out = Ingest.newKeys(incoming, existing, Seq("k"))
      .select("k").as[String].collect().sorted
    assert(out.toSeq == Seq("b", "c"))
  }

  test("compactReplacing keeps the max-version row per key (last write wins)") {
    val df = Seq(
      ("s1", "2024-01-01", 1.0), ("s1", "2024-01-03", 3.0), ("s1", "2024-01-02", 2.0),
      ("s2", "2024-01-01", 9.0)
    ).toDF("k", "ver", "px")
    val out = Ingest.compactReplacing(df, Seq("k"), col("ver"), Seq(col("px").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("s1", 3.0), ("s2", 9.0)))
  }

  test("compactReplacing breaks version ties deterministically") {
    val df = Seq(("k", "v1", 1.0), ("k", "v1", 2.0)).toDF("k", "ver", "px")
    val out = Ingest.compactReplacing(df, Seq("k"), col("ver"), Seq(col("px").desc))
      .collect()
    assert(out.length == 1 && out(0).getDouble(2) == 2.0)
  }

  test("upsert = existing ∪ incoming with last write per key") {
    val existing = Seq(("a", 1, "old"), ("b", 1, "old")).toDF("k", "ver", "src")
    val incoming = Seq(("b", 2, "new"), ("c", 1, "new")).toDF("k", "ver", "src")
    val out = Ingest.upsert(existing, incoming, Seq("k"), col("ver"), Seq(col("src").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("a", "old"), ("b", "new"), ("c", "new")))
  }

  test("updateWhere rewrites only matching rows; deleteWhere drops them") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val upd = Ingest.updateWhere(df, col("k") === "a", Map("v" -> lit(0)))
      .orderBy("k").as[(String, Int)].collect()
    assert(upd.toSeq == Seq(("a", 0), ("b", 2)))
    val del = Ingest.deleteWhere(df, col("k") === "a").as[(String, Int)].collect()
    assert(del.toSeq == Seq(("b", 2)))
  }

  test("deleteWhere refuses a null predicate") {
    val df = Seq(("a", 1)).toDF("k", "v")
    assertThrows[IllegalArgumentException](Ingest.deleteWhere(df, null))
  }
}
