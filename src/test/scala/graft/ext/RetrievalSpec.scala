package graft.ext

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N=4 docs, T=11 tokens, avgdl=11/4; df(cat)=2, df(dog)=3, df(bird)=1
  private val corpus = Seq(
    (1L, "cat dog"),
    (2L, "cat cat cat dog"),
    (3L, "dog dog dog dog"),
    (4L, "bird")).toDF("doc_id", "text")

  private def search(qs: (Int, String)*) =
    Retrieval.bm25TopK(corpus, "doc_id", "text", qs, k = 10)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap

  test("hand-computed single-term scores: tf saturation and exact integers") {
    val hits = search(1 -> "cat")
    // idf(cat) = round(ln(1 + 2.5/2.5)·1e6) = 693147 micro-nats.
    // tf_ppm = ⌊22·tf·T·10⁶ / (10·T·tf + 3·T + 9·dl·N)⌋ with T=11, N=4:
    //   d2 (tf=3, dl=4): ⌊726e6/507⌋ = 1431952 → rank 1
    //   d1 (tf=1, dl=2): ⌊242e6/215⌋ = 1125581 → rank 2
    assert(hits.keySet === Set(1 -> 1, 1 -> 2))
    assert(hits(1 -> 1) === (2L, 693147L * 1431952L, 1))
    assert(hits(1 -> 2) === (1L, 693147L * 1125581L, 1))
  }

  test("multi-term queries sum per-term scores and count hit terms") {
    val hits = search(1 -> "cat dog")
    // d1 and d2 match both terms, d3 only dog, d4 nothing.
    assert(hits.values.map(_._1).toSet === Set(1L, 2L, 3L))
    val byDoc = hits.values.map(v => v._1 -> v._3).toMap
    assert(byDoc(1L) === 2 && byDoc(2L) === 2 && byDoc(3L) === 1)
  }

  test("rarer terms out-weigh common ones at equal tf and dl") {
    // d4 is the only 'bird' doc; idf(bird) = ln(1+3.5/1.5) > idf(dog)
    val bird = search(1 -> "bird")(1 -> 1)
    assert(bird._1 === 4L)
    // dog in d3 has tf=4 (saturated) but far lower idf; bird's single
    // occurrence in the SHORTEST doc must beat dog's rank-1 score from
    // a doc of 4× the length only if idf dominates — check both exist
    // and bird idf really is larger via the score of a tf=1,dl=1 hit.
    val dog = search(2 -> "dog")(2 -> 1)
    assert(dog._1 === 3L)
  }

  test("query terms absent from the corpus are ignored, not zero-scored") {
    val hits = search(1 -> "cat unicorn")
    assert(hits.values.forall(_._3 === 1)) // only 'cat' ever matches
    assert(hits.values.map(_._1).toSet === Set(1L, 2L))
  }

  test("k truncates per query independently") {
    val hits = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "dog", 2 -> "cat"), k = 1).collect()
    assert(hits.length === 2)
    assert(hits.map(_.getInt(1)).forall(_ === 1))
  }

  test("bm25TopKDf dedups query terms and can exclude the query doc") {
    // doc 1 as its own query: repeated 'cat' in the query text must
    // count once (term-SET semantics), and the self-hit must be absent.
    val q = Seq((1L, "cat cat dog")).toDF("query_id", "qtext")
    val hits = Retrieval.bm25TopKDf(corpus, "doc_id", "text", q, k = 10,
      excludeQueryDoc = true).collect()
    assert(!hits.exists(_.getAs[Long]("doc_id") == 1L))
    val lit = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(1 -> "cat dog"), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e12")).toMap
    // scores of the surviving docs equal the deduped literal query's
    hits.foreach { r =>
      assert(r.getAs[Long]("score_e12") === lit(r.getAs[Long]("doc_id")))
    }
  }

  test("q220 hybrid fusion replays integer RRF over its two tier lists") {
    val lexDocs = graft.model.Tables.documents(spark, sf001)
    val qdocs = lexDocs.filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .select(org.apache.spark.sql.functions.col("doc_id").as("query_id"),
        org.apache.spark.sql.functions.col("text").as("qtext"))
    val lex = Retrieval.bm25TopKDf(lexDocs, "doc_id", "text", qdocs,
        k = 10, excludeQueryDoc = true).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("rank")).toMap
    val den = graft.queries.SimilarityQueries.annBruteTopK(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    val fused = graft.queries.RetrievalQueries.hybridRrf(spark, sf001).collect()
    assert(fused.map(_.getAs[Long]("query_id")).distinct.length === 10)
    fused.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val contribs = Seq(lex.get(key), den.get(key)).flatten
        .map(rank => 1000000L / (60L + rank))
      assert(contribs.nonEmpty, s"fused hit $key in neither tier list")
      assert(r.getAs[Long]("rrf_micro") === contribs.sum, s"$key")
      assert(r.getAs[Int]("n_lists") === contribs.length, s"$key")
      assert(key._1 != key._2, "self-hit must never surface")
    }
    // the fusion is genuinely hybrid at this scale: some winner is
    // backed by both tiers somewhere in the result
    assert(fused.exists(_.getAs[Int]("n_lists") === 2))
  }

  test("q224 rerank replays the frozen bilinear form over the fused candidates") {
    import org.apache.spark.sql.functions.col
    val emb = graft.model.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding").toArray).toMap
    def proj(v: Array[Float]): Array[Double] =
      Array.tabulate(4) { k =>
        var s = 0.0; var j = 0
        while (j < 64) {
          s += v(j).toDouble * graft.ext.Multimodal.embedWeight(k, j); j += 1
        }
        s
      }
    val fused = graft.queries.RetrievalQueries.hybridRrf(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    val out = graft.queries.RetrievalQueries.rerankFused(spark, sf001).collect()
    assert(out.length === fused.size, "every fused candidate keeps a slot")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val pq = proj(emb(q))
      val want = rows.map { r =>
        val d = r.getAs[Long]("neighbor_id")
        val pd = proj(emb(d))
        val score = BigDecimal(pq(0)*pd(0) + pq(1)*pd(1) + pq(2)*pd(2) +
          pq(3)*pd(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        d -> score
      }.toMap
      rows.foreach { r =>
        val d = r.getAs[Long]("neighbor_id")
        assert(math.abs(r.getAs[Double]("rerank_score") - want(d)) < 1e-9,
          s"score q=$q d=$d")
        assert(r.getAs[Int]("rrf_rank") === fused((q, d)))
      }
      // ranks are the (score desc, id) order of the replay
      val expected = want.toSeq.sortBy { case (d, s) => (-s, d) }.map(_._1)
      val got = rows.sortBy(_.getAs[Int]("rerank_rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq
      assert(got === expected, s"order for query $q")
    }
  }

  test("dirichletQlTopK replays the Zhai–Lafferty decomposition exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple apple banana cherry"),        // tf(apple)=2, dl=4
      (1L, "apple banana banana banana melon"), // dl=5
      (2L, "cherry melon melon grape"),         // dl=4
      (3L, "grape grape grape grape grape")     // dl=5
    ).toDF("doc_id", "text")
    val mu = 3L
    val out = Retrieval.dirichletQlTopK(docs, "doc_id", "text",
        Seq(1 -> "apple banana", 2 -> "grape zzz_oov"), k = 10, mu = mu)
      .collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Long]("score_micro"))).toMap
    // independent replay
    val corpus = Map(
      0L -> Seq("apple", "apple", "banana", "cherry"),
      1L -> Seq("apple", "banana", "banana", "banana", "melon"),
      2L -> Seq("cherry", "melon", "melon", "grape"),
      3L -> Seq("grape", "grape", "grape", "grape", "grape"))
    val bigT = corpus.values.map(_.size).sum.toLong
    val ctf = corpus.values.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    def ln6(x: Double): Long = math.round(math.log(x) * 1e6)
    def score(q: Seq[String], d: Long): Option[Long] = {
      val present = q.filter(ctf.contains) // OOV dropped
      val tfs = corpus(d).groupBy(identity).map { case (w, xs) =>
        w -> xs.size.toLong }
      val matched = present.filter(tfs.contains)
      if (matched.isEmpty) None
      else Some(matched.map(w => ln6(1.0 + tfs(w).toDouble * bigT /
          (mu.toDouble * ctf(w)))).sum +
        present.size * ln6(mu.toDouble / (corpus(d).size + mu.toDouble)))
    }
    val queries = Map(1 -> Seq("apple", "banana"), 2 -> Seq("grape"))
    queries.foreach { case (qid, terms) =>
      val exp = corpus.keys.toSeq
        .flatMap(d => score(terms, d).map(d -> _))
        .sortBy { case (d, s) => (-s, d) }
      exp.zipWithIndex.foreach { case ((d, s), i) =>
        assert(out((qid, d)) === ((i + 1, s)), s"q$qid doc $d")
      }
      // only matched docs are ranked
      assert(out.keys.count(_._1 == qid) === exp.size)
    }
    // q2's OOV term must not leak into |q|: doc 3 is pure grape — its
    // match term dominates, and the doc-length term uses |q| = 1
    assert(out((2, 3L))._1 === 1)
  }

  test("rankBiasedOverlap: identical, disjoint and top-1-only fixtures") {
    import spark.implicits._
    def list(q: Int, docs: Seq[Long]): Seq[(Int, Long, Int)] =
      docs.zipWithIndex.map { case (d, i) => (q, d, i + 1) }
    // q1: identical lists; q2: disjoint; q3: agree only on the rank-1 doc
    val a = (list(1, 1L to 10L) ++ list(2, 1L to 10L) ++
      list(3, Seq(100L) ++ (1L to 9L))).toDF("query_id", "doc_id", "rank")
    val b = (list(1, 1L to 10L) ++ list(2, 11L to 20L) ++
      list(3, Seq(100L) ++ (11L to 19L))).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rankBiasedOverlap(a, b, k = 10).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // identical lists: the normalized RBO is exactly 10⁶ (the geometric
    // sum telescopes: Σ 9^{d−1}·10^{k−d} = 10^k − 9^k)
    assert(out(1) === (10L, 651321L, 1000000L))
    assert(out(2) === (0L, 0L, 0L))
    // top-1 only: X_d = 1 for every d — replay the exact rational
    val num = (1 to 10).map(d => BigInt(Retrieval.rboWeight(d, 10))).sum
    val denMin = BigInt(2520) * BigInt(10).pow(10)
    val denNorm = BigInt(2520) * (BigInt(10).pow(10) - BigInt(9).pow(10))
    assert(out(3) === (1L, (num * 1000000 / denMin).toLong,
      (num * 1000000 / denNorm).toLong))
    // rbo_min is the truncated sum: identical lists cap at 1 − 0.9^10
    assert(out(1)._2 === (BigInt(1000000) *
      (BigInt(10).pow(10) - BigInt(9).pow(10)) / BigInt(10).pow(10)).toLong)
  }

  test("q286 incremental index: merged per-half states rank identically " +
      "to the flat index") {
    // fixture: merged-path ranking ≡ flat-path ranking, value for value
    val qs = Seq(1 -> "cat", 2 -> "dog bird")
    val flat = Retrieval.bm25TopK(corpus, "doc_id", "text", qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val merged = Retrieval.bm25TopKIncremental(corpus, "doc_id", "text",
        qs, k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(merged === flat)
    assert(flat.nonEmpty)
    // and at sf0.001 against the registered q186 — the monoid proof on
    // real data (both halves non-empty there)
    val f1 = graft.queries.RetrievalQueries.bm25Search(spark, sf001)
      .collect().map(_.toSeq).toSet
    val m1 = graft.queries.RetrievalQueries
      .bm25SearchIncremental(spark, sf001).collect().map(_.toSeq).toSet
    assert(m1 === f1)
    assert(f1.size === 30, s"expected 3 full top-10 lists, got ${f1.size}")
  }

  test("q287 clarityScore replays the feedback-LM KL by hand") {
    // query "cat", fbK=2 → feedback docs d2 (rank 1) and d1; feedback
    // LM: cat 4, dog 2 over lenF 6; corpus: T=11, ctf(cat)=4, ctf(dog)=6
    val out = Retrieval.clarityScore(corpus, "doc_id", "text",
        Seq(1 -> "cat"), fbK = 2).collect()
    assert(out.length === 1)
    val r = out.head
    def lp(tff: Long, ctf: Long): Long =
      math.round(math.log((tff.toDouble * 11) / (6.0 * ctf)) * 1e6)
    val num = 4 * lp(4, 4) + 2 * lp(2, 6)
    val expected = if (num >= 0) num / 6 else -((-num) / 6)
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((1, 2L, 2L, 6L, expected)))
    // the KL is genuinely positive here: the feedback set concentrates
    // on 'cat' far above its corpus rate
    assert(expected > 0L)
    // registered wrapper: three rows, all fb lists full at sf0.001
    val reg = graft.queries.RetrievalQueries.clarityReport(spark, sf001)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(reg.keySet === Set(1, 2, 3))
    assert(reg.values.forall(_ == 5L), s"short feedback lists: $reg")
  }

  test("ndcgAtK: exact replay + a fixture where nDCG disagrees with MRR") {
    import spark.implicits._
    // one query; graded truth: doc 10 (gain 3), 11 (gain 2), 12 (gain 1)
    val rel = Seq((1, 10L, 3L), (1, 11L, 2L), (1, 12L, 1L))
      .toDF("query_id", "doc_id", "gain")
    // A finds ONLY the top item, at rank 1  → MRR(A) = 1   (best possible)
    // B finds the 2nd/3rd items high, the top item last → MRR(B) = 1/3
    val runs = Seq(
      ("A", 1, 10L, 1), ("A", 1, 90L, 2), ("A", 1, 91L, 3),
      ("B", 1, 11L, 1), ("B", 1, 12L, 2), ("B", 1, 10L, 3))
      .toDF("system", "query_id", "doc_id", "rank")
    val out = Retrieval.ndcgAtK(runs, rel, k = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val d = (1 to 3).map(Retrieval.ndcgDiscountE6)
    val idcg = 3 * d(0) + 2 * d(1) + 1 * d(2)
    val dcgA = 3 * d(0)
    val dcgB = 2 * d(0) + 1 * d(1) + 3 * d(2)
    assert(out("A") === (1L, dcgA, dcgA * 1000000L / idcg))
    assert(out("B") === (1L, dcgB, dcgB * 1000000L / idcg))
    // the disagreement that justifies the metric: MRR prefers A
    // (1 > 1/3), nDCG prefers B (it placed the whole graded set high)
    assert(out("B")._3 > out("A")._3)
    // a perfect run scores exactly 10^6
    val perfect = Seq(("P", 1, 10L, 1), ("P", 1, 11L, 2), ("P", 1, 12L, 3))
      .toDF("system", "query_id", "doc_id", "rank")
    val p = Retrieval.ndcgAtK(perfect, rel, k = 3).collect().head
    assert(p.getLong(3) === 1000000L)
  }
}
