package graft.ext

import graft.SparkSpec

/** Text analysis: token counting, quality scoring, language-ID heuristic,
  * and fingerprint stability.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats counts whitespace and BPE-ish tokens") {
    val df = Seq((1L, "Hello world, it's 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text").collect()(0)
    assert(r.getInt(1) == 4)                   // hello / world, / it's / 42!
    // bpe-ish: hello world , it ' s 4 2 !  → 9
    assert(r.getInt(2) == 9)
  }

  test("hashingVectorize: signed bucket sums, unit L2 norm, replayable hash") {
    val df = Seq(
      (1L, "cat cat dog"),
      (2L, ""),                  // no tokens -> no rows
      (3L, "cat")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.hashingVectorize(df, "doc_id", "text", dim = 32)
      .orderBy("doc_id", "bucket").collect()
    // replay the hash chain in-test: Horner 31-hash mod P, LCG sign
    def h(w: String) = w.foldLeft(0L)((a, c) => (a * 31 + c) % 2147483647L)
    def sgn(hv: Long) = 1L - 2L * (((69069L * hv + 362437L) % 2147483647L) % 2)
    val cat = h("cat"); val dog = h("dog")
    // doc 2 emits nothing
    assert(!rows.exists(_.getLong(0) == 2L))
    // doc 3: one token -> raw = sgn, weight = +-1.0 exactly
    val d3 = rows.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3.head.getInt(1) == (cat % 32).toInt &&
      d3.head.getLong(2) == sgn(cat) && math.abs(d3.head.getDouble(3)) == 1.0)
    // doc 1: cat bucket raw = 2*sgn(cat), dog raw = sgn(dog) (distinct
    // buckets here), norm = sqrt(4+1)
    val d1 = rows.filter(_.getLong(0) == 1L)
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert((cat % 32) != (dog % 32)) // fixture stays two-bucket
    assert(d1((cat % 32).toInt)._1 == 2 * sgn(cat))
    assert(d1((dog % 32).toInt)._1 == sgn(dog))
    val n = math.sqrt(5.0)
    assert(math.abs(d1((cat % 32).toInt)._2 -
      math.round(2 * sgn(cat) / n * 10000) / 10000.0) < 1e-9)
    // every document's weights are unit-L2 up to rounding
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val s = rs.map(r => r.getDouble(3) * r.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-3, s"norm drift: $s")
    }
  }

  test("q222 qualityClassifier: logits replay the W matrix, argmax and margin are consistent") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val raw = TextAnalysis.hashingVectorize(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Long]("raw")))
    def w(c: Int, b: Int): Long = ((37L * c + 11L * b + 5L) % 17L) - 8L
    val want = raw.groupBy(_._1).map { case (d, rs) =>
      d -> (0 until 3).map(c => rs.map(t => t._3 * w(c, t._2)).sum)
    }
    val out = TextAnalysis.qualityClassifier(docs, "doc_id", "text").collect()
    assert(out.length === want.size)
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val logits = (0 until 3).map(c => r.getAs[Long](s"logit_$c"))
      assert(logits === want(d), s"doc $d")
      val pred = r.getAs[Int]("predicted")
      // argmax with ties to the smallest class id
      assert(logits(pred) === logits.max)
      assert(!logits.take(pred).exists(_ === logits.max), s"tie-break $d")
      val runnerUp = logits.indices.filter(_ != pred).map(logits).max
      assert(r.getAs[Long]("margin") === logits(pred) - runnerUp)
      assert(r.getAs[Long]("margin") >= 0)
    }
    // the frozen matrix genuinely separates: all three classes appear
    assert(out.map(_.getAs[Int]("predicted")).distinct.sorted ===
      Seq(0, 1, 2))
  }

  test("q231 data card rolls up the per-doc components it is composed from") {
    import org.apache.spark.sql.functions._
    val docs = graft.model.Tables.documents(spark, sf001)
    val card = graft.queries.CurationQueries.sourceDataCard(spark, sf001)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(card.values.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // quality_ppm replays the q29 flags per source
    val qual = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("is_quality"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().groupBy(_.getAs[String]("source"))
    qual.foreach { case (s, rows) =>
      val want = rows.map(_.getAs[Int]("is_quality").toLong).sum *
        1000000L / rows.length
      assert(card(s).getAs[Long]("quality_ppm") === want, s"source $s")
    }
    // majority language replays the q30 prediction per source
    val lang = TextAnalysis.languageId(docs, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().groupBy(_.getAs[String]("source"))
    lang.foreach { case (s, rows) =>
      val counts = rows.groupBy(_.getAs[String]("predicted_lang"))
        .map { case (l, rs) => l -> rs.length }
      val topByRule = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(card(s).getAs[String]("top_lang") === topByRule._1, s"source $s")
      assert(card(s).getAs[Long]("top_lang_ppm") ===
        topByRule._2.toLong * 1000000L / rows.length)
    }
    // dup rate: every source's dup_ppm is consistent with a direct
    // within-source normalized-text group count
    val dup = docs.select(col("source"),
        md5(TextOps.normText(col("text"))).as("h"))
      .groupBy("source", "h").count()
      .collect().groupBy(_.getAs[String]("source"))
    dup.foreach { case (s, rows) =>
      val nd = rows.filter(_.getAs[Long]("count") > 1)
        .map(_.getAs[Long]("count")).sum
      val n = rows.map(_.getAs[Long]("count")).sum
      assert(card(s).getAs[Long]("dup_ppm") === nd * 1000000L / n, s"source $s")
    }
  }

  test("qualityScore computes ratios and gates on stopword presence") {
    val good = (1 to 6).map(_ => "the cat sat on a mat").mkString(" ") // 36 tokens
    val bad = "x y z !!! ???"
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Int]("is_quality") == 1)
    assert(rows(1).getAs[Int]("is_quality") == 0)
    assert(rows(0).getAs[Long]("n_tokens") == 36)
    assert(rows(1).getAs[Double]("punct_ratio") > 0.3)
  }

  test("languageId scores marker tokens and predicts with fixed tie order") {
    val df = Seq(
      (1L, "the house of and cards"),
      (2L, "der hund und die katze ist"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[String]("predicted_lang"))
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("repetitionStats flags repetitious docs and passes varied ones") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),      // one token repeated
      (2L, "buy now buy now buy now buy now buy now"),       // repeated bigrams
      (3L, "each word in this sentence appears exactly once"),
      (4L, "single"),                                        // no bigrams
      (5L, "ab xy ab xy zq")                                 // partial repetition
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("distinct_ratio") == 0.125)
    assert(got(1L).getAs[Double]("top_token_frac") == 1.0)
    assert(got(1L).getAs[Double]("dup_bigram_frac") > 0.8)
    assert(got(1L).getAs[Int]("is_repetitive") == 1)
    assert(got(2L).getAs[Int]("is_repetitive") == 1)
    assert(got(3L).getAs[Double]("distinct_ratio") == 1.0)
    assert(got(3L).getAs[Int]("is_repetitive") == 0)
    assert(got(4L).getAs[Long]("n_tokens") == 1L)
    assert(got(4L).getAs[Double]("dup_bigram_frac") == 0.0) // no bigrams → 0
    assert(got(5L).getAs[Double]("distinct_ratio") == 0.6)
  }

  test("repetition kernel counts match the explode/aggregate formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextKernelOps
    val texts = Seq("", "one", "one one", "one two one two three",
      "the quick brown fox the quick brown fox") ++
      (0 until 20).map(i => s"doc $i words repeat repeat and tail token${i % 7}")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").filter(length(col("text")) > 0)
    val t = TextOps.normText(col("text"))
    val viaKernel = docs
      .select(col("doc_id"), TextKernelOps.repetitionStats(t).as("rs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val tokCounts = docs
      .select(col("doc_id"), explode(TextKernelOps.wordNgramHashFull(t, 1)).as("hv"))
      .groupBy("doc_id", "hv").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n"), count(lit(1)).as("nd"), max("count").as("top"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val bgCounts = docs
      .select(col("doc_id"), explode(TextKernelOps.wordNgramHashFull(t, 2)).as("hv"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct("hv").as("nd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    viaKernel.foreach { case (id, rs) =>
      val (n, nd, top) = tokCounts(id)
      assert((rs(0), rs(1), rs(2)) == ((n, nd, top)), s"token stats mismatch doc $id")
      val (nBg, ndBg) = bgCounts.getOrElse(id, (0L, 0L))
      assert((rs(3), rs(4)) == ((nBg, ndBg)), s"bigram stats mismatch doc $id")
    }
  }

  test("one-pass set-hash fingerprint == array_distinct/aggregate HOF form") {
    val texts = Seq("", "short", "abcdefgh", "abcdefgh abcdefgh",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 25).map(i => s"document $i with some repeated repeated text tail$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val native = asMap(TextAnalysis.fingerprint(docs, "doc_id", "text"))
    val hof = asMap(TextAnalysis.fingerprintHof(docs, "doc_id", "text"))
    assert(native == hof) // short docs absent from BOTH
    assert(!native.contains(0L) && !native.contains(1L))
  }

  test("tokenHistogram buckets by exact 16-token widths") {
    val docs = Seq(
      (1L, (1 to 5).map(_ => "w").mkString(" ")),    // 5 tokens  -> bucket 0
      (2L, (1 to 17).map(_ => "w").mkString(" ")),   // 17 tokens -> bucket 16
      (3L, (1 to 16).map(_ => "w").mkString(" ")),   // 16 tokens -> bucket 16
      (4L, (1 to 40).map(_ => "w").mkString(" ")))   // 40 tokens -> bucket 32
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((1L, 5L, 5L)))
    assert(got(16L) == ((2L, 16L, 17L)))
    assert(got(32L) == ((1L, 40L, 40L)))
  }

  test("stratifiedSample keeps rare strata whole and downsamples dominant ones") {
    val docs = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 10, "zh" -> 100), defaultPct = 50)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("zh") == 500)          // 100% stratum keeps everything
    assert(kept("en") < 120)           // ~10% of 500
    // nested in the unstratified sample at the same rate
    val flat = Sampling.deterministicSample(docs, "doc_id", 10)
      .collect().map(_.getLong(0)).toSet
    val enKept = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 10), defaultPct = 0)
      .collect().map(_.getLong(0)).toSet
    assert(enKept.subsetOf(flat))
  }

  test("fingerprint is identical for normalization-equal texts, differs otherwise") {
    val df = Seq(
      (1L, "some document text here padded to shingle length"),
      (2L, "  SOME   Document TEXT here padded to shingle length "),
      (3L, "entirely different words occupy this other document")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("percentile_approx (the 100TB quantile path) lands near the exact report") {
    import org.apache.spark.sql.functions._
    // corpusQuantiles is the oracle-checkable exact variant; at scale the
    // same shape runs partial-aggregated percentile_approx — pin that the
    // approximate path stays within sketch tolerance of the exact one.
    val docs = graft.model.Tables.documents(spark, sf001)
    val exact = TextAnalysis.corpusQuantiles(docs, "doc_id", "text")
      .collect()(0)
    val approx = docs
      .select(size(TextOps.tokens(TextOps.normText(col("text"))))
        .cast("long").as("n_tokens"))
      .agg(expr("percentile_approx(n_tokens, array(0.25D, 0.5D, 0.9D), 10000)")
        .as("qa"))
      .collect()(0).getSeq[Long](0)
    assert(math.abs(approx(0) - exact.getDouble(0)) <= 2.0) // p25
    assert(math.abs(approx(1) - exact.getDouble(1)) <= 2.0) // p50
    assert(math.abs(approx(2) - exact.getDouble(3)) <= 2.0) // p90
  }

  test("vocabCoverage is monotone, exact at the top word, and clamps past the vocab") {
    import spark.implicits._
    // 3-word vocab with known counts: aa×7, bb×3, cc×1 (11 tokens).
    val docs = Seq((1L, "aa aa aa bb"), (2L, "aa aa bb cc"), (3L, "aa bb aa"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabCoverage(docs, "doc_id", "text",
        cutoffs = Seq(1, 2, 10))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (1, 1, 7L, 0.636364),  // top word covers 7/11
      (2, 2, 10L, 0.909091), // top 2 cover 10/11
      (10, 3, 11L, 1.0)      // cutoff past the vocab clamps to all 3 types
    ))
  }

  test("bigramLmScore: hand-checked model, tails rank gibberish above prose") {
    import spark.implicits._
    // two docs, two bigram types: "aa" and "ab"; marginal a:2, V={a,b}=2
    // P = (1+1)/(2+2) = 1/2 for both types -> lp = round(ln 2 * 1e6)
    val tiny = Seq((1L, "aa"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ln2 = math.round(math.log(2.0) * 1e6)
    assert(got(1L) === ((1L, ln2)))
    assert(got(2L) === ((1L, ln2)))
    assert(got(3L) === ((0L, 0L)))   // sub-bigram doc kept, flagged by 0
    // a repeated-common-bigram doc scores BELOW a rare-bigram doc
    val corpus = (Seq((100L, "zq jx qv wk")) ++
        (0 until 20).map(i => (i.toLong, "the then there these them")))
      .toDF("doc_id", "text")
    val s = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(100L) > s(0L),
      s"gibberish ${s(100L)} should out-score prose ${s(0L)}")
  }

  test("charEntropy: closed-form cases in exact micro-nats") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ln2 = math.round(math.log(2.0) * 1e6)
    val ln4 = math.round(math.log(4.0) * 1e6)
    assert(got(1L) === ((4L, 1L, 0L)))          // all-same -> 0
    assert(got(2L) === ((4L, 2L, ln4 - ln2)))   // two equal classes -> ln 2
    assert(got(3L) === ((4L, 4L, ln4)))         // uniform over 4 -> ln 4
    assert(got(4L) === ((0L, 0L, 0L)))          // empty doc kept
  }

  test("q235 classifier eval replays the confusion matrix flat at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val pred = TextAnalysis.qualityClassifier(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("predicted")).toMap
    val lab = TextAnalysis.ruleQualityLabel(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("label")).toMap
    // inner-join semantics: only docs the classifier scored (empty
    // texts hash to no buckets and carry no prediction)
    val joined = lab.toSeq.collect {
      case (id, l) if pred.contains(id) => (l, pred(id))
    }
    assert(joined.nonEmpty)
    val out = TextAnalysis.classifierEval(docs, "doc_id", "text").collect()
    assert(out.map(_.getAs[Int]("class")).toSeq === Seq(0, 1, 2))
    out.foreach { r =>
      val c = r.getAs[Int]("class")
      val matRow = (0 to 2).map(p =>
        joined.count { case (l, pr) => l == c && pr == p }.toLong)
      (0 to 2).foreach(p =>
        assert(r.getAs[Long](s"pred_$p") === matRow(p), s"cell ($c,$p)"))
      val nTrue = matRow.sum
      val nPred = joined.count(_._2 == c).toLong
      val tp = matRow(c)
      assert(r.getAs[Long]("n_true") === nTrue)
      assert(r.getAs[Long]("n_pred") === nPred)
      assert(r.getAs[Long]("tp") === tp)
      val prec = if (nPred == 0) 0L else tp * 1000000L / nPred
      val rec = if (nTrue == 0) 0L else tp * 1000000L / nTrue
      val f1 = if (prec + rec == 0) 0L else 2 * prec * rec / (prec + rec)
      assert(r.getAs[Long]("precision_ppm") === prec, s"precision class $c")
      assert(r.getAs[Long]("recall_ppm") === rec, s"recall class $c")
      assert(r.getAs[Long]("f1_ppm") === f1, s"f1 class $c")
    }
    // the matrix must be non-degenerate: every rule class has support
    assert(out.forall(_.getAs[Long]("n_true") > 0))
  }

  test("classifierEval zero-division convention: absent class scores 0/0/0") {
    // a fixture where rule class 2 (stop-ratio-heavy prose) never
    // occurs: recall/precision/F1 for class 2 must be 0, not a fault
    val docs = Seq.tabulate(12)(i =>
      (i.toLong, if (i % 2 == 0) "word list " * 8 else "tiny")).toDF("doc_id", "text")
    val out = TextAnalysis.classifierEval(docs, "doc_id", "text").collect()
    assert(out.length === 3)
    val c2 = out.find(_.getAs[Int]("class") == 2).get
    assert(c2.getAs[Long]("n_true") === 0L)
    assert(c2.getAs[Long]("recall_ppm") === 0L)
    assert(c2.getAs[Long]("f1_ppm") === 0L)
  }

  test("goodTuringCoverage replays hapax mass and Chao1 by hand") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s1", "a a a b b c"),       // N=6 V=3 N1=1 N2=1
      (1L, "s2", "p q r s t t")        // N=6 V=5 N1=4 N2=1
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.goodTuringCoverage(docs, "doc_id", "source",
        "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    // s1: unseen 1/6, coverage 5/6, chao1 = 3 + 1·0/(2·2) = 3
    assert(out("s1") === (6L, 3L, 1L, 1L, 166666L, 833333L, 3L))
    // s2: unseen 4/6, chao1 = 5 + 4·3 div (2·(1+1)) = 5 + 3 = 8
    assert(out("s2") === (6L, 5L, 4L, 1L, 666666L, 333333L, 8L))
  }

  test("zipfFit recovers the exponent of an exact power-law corpus") {
    import spark.implicits._
    // frequencies f(r) = round(2000 / r) for ranks 1..20 — a planted
    // Zipf corpus with exponent −1; token stream = each word repeated
    // its frequency, all in ONE doc per source so ranks are clean
    val words = (1 to 20).map(r => s"w%02d".format(r) -> (2000.0 / r).round)
    val text = words.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .mkString(" ")
    val docs = Seq((0L, "zipfy", text)).toDF("doc_id", "source", "text")
    val row = TextAnalysis.zipfFit(docs, "doc_id", "source", "text")
      .collect().head
    assert(row.getAs[Int]("n_ranks") === 20)
    // independent exact-moment replay (the operator's own quantization)
    val xy = words.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(f.toDouble) * 1e6))
    }
    val n = BigInt(xy.size)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * p._1).sum
    val sxy = xy.map(p => BigInt(p._1) * p._2).sum
    val syy = xy.map(p => BigInt(p._2) * p._2).sum
    val ca = n * sxx - sx * sx
    val cd = n * sxy - sx * sy
    val sst = n * syy - sy * sy
    def truncDiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    val slope = truncDiv(cd * 1000000, ca)
    val inum = sy * 1000000 - slope * sx
    assert(row.getAs[Long]("slope_e6") === slope.toLong)
    assert(row.getAs[Long]("intercept_e6") ===
      truncDiv(inum, n * 1000000).toLong)
    assert(row.getAs[Long]("r2_ppm") === math.round(
      (cd.toDouble * cd.toDouble) / (ca.toDouble * sst.toDouble) * 1e6))
    // the planted exponent: slope within rounding of −1, fit near-perfect
    assert(math.abs(row.getAs[Long]("slope_e6") + 1000000L) < 5000L)
    assert(row.getAs[Long]("r2_ppm") > 999000L)
  }

  test("q283 wordBigramLmScore: hand model, pruning to backoff, reorder " +
      "vs char-bigram") {
    val docs = Seq(
      (0L, "the cat sat"),  // "the cat", "cat sat" — both retained (cb=2)
      (1L, "the cat sat"),
      (2L, "the dog sat"),  // "the dog", "dog sat" — cb=1 → pruned → backoff
      (3L, "cat")           // no bigrams
    ).toDF("doc_id", "text")
    // unigrams: the 3, cat 3, sat 3, dog 1 → T=10, V=4
    // c1 marginals over ALL bigrams: the→3, cat→2, dog→1
    def micro(p: Double): Long = math.round(-math.log(p) * 1e6)
    val lpTheCat = micro(0.7 * 2.0 / 3.0 + 0.3 * (3 + 1.0) / (10 + 4))
    val lpCatSat = micro(0.7 * 2.0 / 2.0 + 0.3 * (3 + 1.0) / (10 + 4))
    val lpuDog   = micro(0.3 * (1 + 1.0) / (10 + 4))
    val lpuSat   = micro(0.3 * (3 + 1.0) / (10 + 4))
    val out = TextAnalysis.wordBigramLmScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L) === (2L, 0L, (lpTheCat + lpCatSat) / 2))
    assert(out(1L) === out(0L))
    assert(out(2L) === (2L, 2L, (lpuDog + lpuSat) / 2))
    assert(out(3L) === (0L, 0L, 0L))
    // backoff-only scores are costlier than retained interpolated ones —
    // the pruning is visible in the score, not just the counter
    assert(out(2L)._3 > out(0L)._3)
    // the reason to build it: word granularity REORDERS documents vs the
    // q181 char-bigram score on real data
    val word = graft.queries.TextQueries.wordBigramLmNll(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val char = graft.queries.TextQueries.bigramLmNll(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ids = word.keys.toSeq.sorted
    val flipped = ids.combinations(2).exists { case Seq(a, b) =>
      (word(a) - word(b)).sign * (char(a) - char(b)).sign < 0
    }
    assert(flipped, "word-LM ordering identical to char-LM — no signal")
  }

  test("perplexityBuckets: exact per-source tertile partition, ordered cuts") {
    val rows = graft.queries.TextQueries.perplexityBuckets(spark, sf001)
      .collect()
    val perSrc = rows.groupBy(_.getAs[String]("source"))
    val want = graft.model.Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { case (src, bs) =>
      val byB = bs.map(r => r.getAs[String]("bucket") -> r).toMap
      // the tertiles PARTITION the source exactly
      assert(bs.map(_.getAs[Long]("n_docs")).sum == want(src))
      // exact floor-arithmetic bucket sizes
      val n = want(src)
      val expect = (1L to n).groupBy(k => (3 * (k - 1)) / n)
        .view.mapValues(_.size.toLong).toMap
      assert(byB("head").getAs[Long]("n_docs") == expect(0L))
      assert(byB.get("middle").map(_.getAs[Long]("n_docs")).getOrElse(0L)
        == expect.getOrElse(1L, 0L))
      // nll cuts are ordered: head <= middle <= tail at the boundaries
      for (Seq(lo, hi) <- Seq("head", "middle", "tail").sliding(2)
           if byB.contains(lo) && byB.contains(hi)) {
        assert(byB(lo).getAs[Long]("max_nll_micro") <=
          byB(hi).getAs[Long]("min_nll_micro"),
          s"$src: $lo/$hi cut out of order")
      }
    }
  }

  test("filterAgreement: pooled cells sum the sources; kappa matches BigInt") {
    val rows = graft.queries.TextQueries.filterAgreement(spark, sf001)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val all = rows("__all__")
    val srcs = rows.view.filterKeys(_ != "__all__").values.toSeq
    for (c <- Seq("n_docs", "n_both_keep", "n_c4_only", "n_lm_only",
        "n_both_drop")) {
      assert(all.getAs[Long](c) == srcs.map(_.getAs[Long](c)).sum,
        s"pooled $c is not the source sum")
    }
    rows.values.foreach { r =>
      val k = r.getAs[Long]("kappa_ppm")
      assert(k >= -1000000L && k <= 1000000L, s"kappa out of range: $k")
      // independent BigInt recompute from the row's own cells
      val (n, n11, n10, n01, n00) = (BigInt(r.getAs[Long]("n_docs")),
        BigInt(r.getAs[Long]("n_both_keep")),
        BigInt(r.getAs[Long]("n_c4_only")),
        BigInt(r.getAs[Long]("n_lm_only")),
        BigInt(r.getAs[Long]("n_both_drop")))
      val a = n11 + n00
      val e = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
      val (num, den) = (n * a - e, n * n - e)
      val want =
        if (den == 0) BigInt(0)
        else if (num < 0) -((-num) * 1000000 / den)
        else num * 1000000 / den
      assert(BigInt(k) == want, s"${r.getAs[String]("source")} kappa")
      assert(r.getAs[Long]("agree_ppm") == (a * 1000000 / n).toLong)
    }
  }

  test("kneserNeyBigramScore: hand-checked micro-nats on a 1-doc corpus") {
    import spark.implicits._
    // "a b a b": bigrams "a b"(cb=2, retained), "b a"(cb=1, backoff).
    // c1: a→(c1=2, n1p=1), b→(1, 1); pcont: b→1, a→1; bt=2.
    //   p(a b) = (2−0.75)/2 + 0.75·1/2·(1/2) = 0.8125 → lp 207639
    //   p(b a) = 0.75·1/1·(1/2)              = 0.375  → lp 980829
    // doc: 3 bigram tokens, sl = 2·207639 + 980829 = 1396107 → nll 465369.
    val out = TextAnalysis.kneserNeyBigramScore(
        Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") == 3)
    assert(r.getAs[Long]("n_backoff") == 1)
    assert(r.getAs[Long]("nll_micro") == 465369L)
  }

  test("kneserNeyBigramScore: backoff accounting and ordering semantics") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"), // every bigram type now has cb = 2
      (3L, "zq xw unique rare pair"), // all-singleton bigrams: pure backoff
      (4L, "one")                     // < 2 tokens: zero row
    ).toDF("doc_id", "text")
    val m = TextAnalysis.kneserNeyBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_backoff") == 0)
    assert(m(3L).getAs[Long]("n_backoff") == m(3L).getAs[Long]("n_bigrams"))
    assert(m(4L).getAs[Long]("n_bigrams") == 0 &&
      m(4L).getAs[Long]("nll_micro") == 0)
    // the KN point: repeated collocations score far more probable than
    // one-off word pairs
    assert(m(1L).getAs[Long]("nll_micro") < m(3L).getAs[Long]("nll_micro"))
  }
}
