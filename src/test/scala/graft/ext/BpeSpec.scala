package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge application: argmax pair selection order, leftmost-first
  * non-overlapping merging, segmentation integrity on real data. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def seg(out: Array[org.apache.spark.sql.Row]): Map[String, (Long, Long, String)] =
    out.map(r => r.getAs[String]("word") ->
      (r.getAs[Long]("freq"), r.getAs[Long]("n_pieces"),
        r.getAs[String]("segmentation"))).toMap

  test("three merge rounds replay the hand-computed greedy order") {
    // freqs: aaaa x3, the x2, cat x1.
    // round 1 pair stats: (a,a)=9, (t,h)=2, (h,e)=2, (c,a)=1, (a,t)=1
    //   -> merge (a,a): aaaa => aa|aa (leftmost-first, non-overlapping)
    // round 2: (aa,aa)=3 wins -> aaaa whole
    // round 3: (h,e)=2 ties (t,h)=2, 'h' < 't' wins -> the => t|he
    val docs = Seq((1L, "aaaa aaaa aaaa the the cat")).toDF("doc_id", "text")
    val out = seg(Bpe.bpeSegment(docs, "doc_id", "text",
      rounds = 3, topWords = 10).collect())
    assert(out("aaaa") === ((3L, 1L, "aaaa")))
    assert(out("the") === ((2L, 2L, "t he")))
    assert(out("cat") === ((1L, 3L, "c a t")))
  }

  test("odd runs merge leftmost-first: aaaaa -> aa aa a") {
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val out = seg(Bpe.bpeSegment(docs, "doc_id", "text",
      rounds = 1, topWords = 10).collect())
    assert(out("aaaaa") === ((1L, 3L, "aa aa a")))
  }

  test("merges are frequency-weighted, not vocabulary-weighted") {
    // (x,y) occurs in ONE word of freq 5; (p,q) in TWO words of freq 1
    // each (2 total) — corpus weighting must pick (x,y)
    val docs = Seq((1L, "xy xy xy xy xy pq pqz")).toDF("doc_id", "text")
    val out = seg(Bpe.bpeSegment(docs, "doc_id", "text",
      rounds = 1, topWords = 10).collect())
    assert(out("xy") === ((5L, 1L, "xy")))
    assert(out("pq")._3 === "p q")
  }

  test("merge table replays the fixture's greedy picks with their counts") {
    val docs = Seq((1L, "aaaa aaaa aaaa the the cat")).toDF("doc_id", "text")
    val out = Bpe.bpeMergeTable(docs, "doc_id", "text", rounds = 3).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("pair_count")))
    assert(out.toSeq === Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L),
      (3, "h", "e", 2L)))
  }

  test("apply rate: hand-computed per-source fertility on a two-source fixture") {
    // srcA: "aa aa 42" — after 1 round (a,a merges, weight 2): aa=1
    // piece; token 42 is non-vocab -> 1 piece. srcB: "aab" -> aa|b = 2.
    val docs = Seq((1L, "srcA", "aa aa 42"), (2L, "srcB", "aab"))
      .toDF("doc_id", "source", "text")
    val out = Bpe.bpeApplyRate(docs, "source", "text", rounds = 1).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_alpha_words"),
          r.getAs[Long]("total_pieces"), r.getAs[Long]("total_chars"))).toMap
    assert(out("srcA") === ((3L, 2L, 3L, 6L)))
    assert(out("srcB") === ((1L, 1L, 2L, 3L)))
  }

  test("q238 at sf0.001: volumes consistent, every word at least one piece") {
    val out = graft.queries.TextQueries.bpeApplyReport(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, a, p, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_alpha_words"),
        r.getAs[Long]("total_pieces"), r.getAs[Long]("total_chars"))
      assert(a <= w && p >= w && c >= p,
        s"volume ordering broken: $r")
      assert(r.getAs[Long]("pieces_per_word_micro") === p * 1000000L / w)
      assert(r.getAs[Long]("chars_per_piece_micro") === c * 1000000L / p)
      // merges must compress below the char count (pieces < chars)
      assert(p < c, s"no compression at all: $r")
    }
  }

  test("q232 at sf0.001: segmentations partition their words exactly") {
    val out = graft.queries.TextQueries.bpeEncode(spark, sf001).collect()
    assert(out.nonEmpty && out.length <= 40)
    out.foreach { r =>
      val word = r.getAs[String]("word")
      val pieces = r.getAs[String]("segmentation").split(" ")
      assert(pieces.mkString("") === word,
        s"pieces must concatenate back to the word: $r")
      assert(pieces.length.toLong === r.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_chars") === word.length.toLong)
      assert(r.getAs[Long]("corpus_pieces") ===
        r.getAs[Long]("freq") * r.getAs[Long]("n_pieces"))
      assert(pieces.forall(_.nonEmpty))
    }
    // six merge rounds must actually compress: some word has a
    // multi-char piece, and no word has MORE pieces than characters
    assert(out.exists(r =>
      r.getAs[Long]("n_pieces") < r.getAs[Long]("n_chars")))
    out.foreach(r =>
      assert(r.getAs[Long]("n_pieces") <= r.getAs[Long]("n_chars")))
  }
}
