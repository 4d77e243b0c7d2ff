package graft.ext

import graft.SparkSpec

/** Unigram-LM (SentencePiece-style) tokenizer: hand-replayed seed →
  * Viterbi → usage-prune → re-estimate pipeline, plus the sf0.001
  * wrapper sanity. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // s1: "abcd" ×5 — substring counts make ab/abc/abcd the top-3 multi
  // seeds (ties break piece-ascending), but Viterbi uses ONLY "abcd"
  // (one piece beats any split), so ab/abc die in the usage prune
  // despite their maximal substring counts — the EM point.
  // s2: "xy" ×3 — "xy" is NOT seeded (c0 = 3 < the 5s), so it segments
  // as two chars throughout.
  private val docs = Seq(
    (1L, "s1", "abcd abcd abcd abcd abcd"),
    (2L, "s2", "xy xy xy")
  ).toDF("doc_id", "source", "text")

  test("trainState replays the seed, the zero-usage prune and the final " +
      "segmentation by hand") {
    val (vw, v0, u1, v1, np) =
      UnigramLm.trainState(docs, "text", seedMulti = 3, keepMulti = 3,
        maxWordLen = 12, maxPieceLen = 4)
    assert(vw.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("abcd" -> 5L, "xy" -> 3L))
    // seed = 6 chars + top-3 multi by (count desc, piece): ab, abc, abcd
    assert(v0.collect().map(_.getString(0)).toSet ===
      Set("a", "b", "c", "d", "x", "y", "ab", "abc", "abcd"))
    // round-1 Viterbi: "abcd" → one piece; "xy" → x + y
    assert(u1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("abcd" -> 5L, "x" -> 3L, "y" -> 3L))
    // prune: ab/abc had ZERO usage → dead; chars survive with usage 0
    assert(v1.collect().map(_.getString(0)).toSet ===
      Set("a", "b", "c", "d", "x", "y", "abcd"))
    // final E-step piece counts under the re-estimated scores
    assert(np.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ===
      Map("abcd" -> 1, "xy" -> 2))
  }

  test("fertilityBySource replays the per-source readout") {
    val out = UnigramLm.fertilityBySource(docs, "source", "text",
        seedMulti = 3, keepMulti = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("s1") === (5L, 5L, 5L, 20L, 1000000L, 9L, 7L))
    assert(out("s2") === (3L, 3L, 6L, 6L, 2000000L, 9L, 7L))
  }

  test("q284 wrapper at sf0.001: sane fertility, prune visible") {
    val rows = graft.queries.TextQueries.unigramLmFertility(spark, sf001)
      .collect()
    assert(rows.nonEmpty, "vacuously empty")
    rows.foreach { r =>
      val (nWords, pieces) = (r.getLong(1), r.getLong(3))
      val fert = r.getLong(5)
      assert(nWords > 0 && pieces >= nWords, s"pieces<words: $r")
      assert(fert >= 1000000L && fert <= 12000000L, s"fertility wild: $r")
      assert(r.getLong(7) <= r.getLong(6), s"vocab grew in the prune: $r")
    }
  }
}
