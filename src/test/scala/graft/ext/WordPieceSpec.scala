package graft.ext

import graft.SparkSpec

/** Pins the WordPiece trainer to its hand-computed likelihood-ratio
  * semantics — including the case where the lineage DIVERGES from
  * BPE's count-argmax (the entire point of the rule). */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // corpus: the ×50, that ×30, qz ×2 — (t,h) dominates by COUNT (80)
  // but (q,z) dominates by RATIO (2/(2·2) = 0.5 vs 80/(110·80) ≈ 0.009)
  private lazy val docs = Seq(
    (1L, ("the " * 50 + "that " * 30 + "qz " * 2).trim)
  ).toDF("doc_id", "text")

  test("round-1 pick maximizes the ratio, not the count (diverges from BPE)") {
    val wp = WordPiece.mergeTable(docs, "text", rounds = 1).collect()
    assert(wp.length == 1)
    val r = wp.head
    assert((r.getString(1), r.getString(2)) == ("q", "z"),
      s"WordPiece must pick the ratio-argmax (q,z), got $r")
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L && r.getLong(5) == 2L)
    // score = floor(2·10¹² / (2·2)) = 5·10¹¹
    assert(r.getLong(6) == 500000000000L)
    // the BPE lineage on the same corpus picks the count-argmax (t,h)
    val bpe = Bpe.bpeMergeTable(docs, "doc_id", "text", rounds = 1)
      .collect().head
    assert((bpe.getString(1), bpe.getString(2)) == ("t", "h"))
  }

  test("round-2 pick and tie-break replay the hand computation exactly") {
    // after qz merges: t=110, h=80, e=50, a=30, qz=2. Candidates:
    // (t,h) 80e12/(110·80) = 9090909090 (floor), (h,e) 50e12/(80·50) =
    // 12500000000, (h,a) 30e12/(80·30) = 12500000000 — exact TIE with
    // (h,e); (a, b) order picks (h,a).
    val wp = WordPiece.mergeTable(docs, "text", rounds = 2).collect()
      .sortBy(_.getInt(0))
    assert(wp.length == 2)
    val r2 = wp(1)
    assert((r2.getString(1), r2.getString(2)) == ("h", "a"), r2.toString)
    assert(r2.getLong(3) == 30L && r2.getLong(4) == 80L &&
      r2.getLong(5) == 30L)
    assert(r2.getLong(6) == 12500000000L)
  }

  test("merge table is non-vacuous and strictly ordered on sf0.001") {
    val rows = graft.queries.TextQueries.wordPieceMerges(spark, sf001)
      .collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 6))
    // every pick's score is positive and its pair count is >= 1
    rows.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(6) > 0L, r.toString)
    }
  }
}
