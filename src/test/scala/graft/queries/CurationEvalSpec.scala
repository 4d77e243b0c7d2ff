package graft.queries

import graft.SparkSpec
import graft.ext.{Similarity, TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._

/** Value-level replays for the round-10 eval/selection operators:
  * calibration bins (q241), PSI drift (q242), DSIR importance weights
  * (q243), LSH candidate eval (q244) and power iteration (q245). The
  * replays consume already-specced components (classifier, rule label,
  * bands, shingle hashes, embeddings) and re-run the NEW composition in
  * plain Scala/BigInt. */
class CurationEvalSpec extends SparkSpec {

  test("q241 calibration bins replay the margin-binned agreement at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val out = CurationQueries.calibrationReport(spark, sf001).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_agree"),
          r.getAs[Long]("agree_ppm"), r.getAs[Long]("min_margin"),
          r.getAs[Long]("max_margin"), r.getAs[Long]("mean_margin")))
      .toMap
    val pred = TextAnalysis.qualityClassifier(docs, "doc_id", "text")
      .select("doc_id", "predicted", "margin").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("predicted"), r.getAs[Long]("margin"))).toMap
    val lab = TextAnalysis.ruleQualityLabel(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("label")).toMap
    val joined = pred.toSeq.collect { case (id, (p, m)) if lab.contains(id) =>
      (m / 40, m, if (p == lab(id)) 1L else 0L) }
    assert(joined.nonEmpty)
    val exp = joined.groupBy(_._1).map { case (bin, xs) =>
      val n = xs.length.toLong
      val agree = xs.map(_._3).sum
      val margins = xs.map(_._2)
      bin -> (n, agree, agree * 1000000L / n, margins.min, margins.max,
        margins.sum / n)
    }
    assert(out === exp)
    // margins are argmax-minus-runner-up: never negative
    assert(pred.values.forall(_._2 >= 0))
    // the curve is exercised: at least two bins
    assert(out.size >= 2, s"degenerate binning: ${out.keySet}")
  }

  test("q242 PSI replays the smoothed bin arithmetic at sf0.001") {
    val out = CurationQueries.psiDriftReport(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_ref_docs"), r.getAs[Long]("n_cur_docs"),
          r.getAs[Int]("n_bins"), r.getAs[Long]("psi_micro"))).toMap
    val base = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.normText(col("text")).as("t"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("t").split(" ", -1).length.toLong))
    base.map(_._2).distinct.foreach { src =>
      val rows = base.filter(_._2 == src)
      val refC = rows.filter(_._1 % 2 == 0).groupBy(_._3 / 16)
        .map { case (b, xs) => b -> xs.length.toLong }
      val curC = rows.filter(_._1 % 2 == 1).groupBy(_._3 / 16)
        .map { case (b, xs) => b -> xs.length.toLong }
      val bins = (refC.keySet ++ curC.keySet).toSeq.sorted
      val cr1 = bins.map(b => refC.getOrElse(b, 0L) + 1)
      val cc1 = bins.map(b => curC.getOrElse(b, 0L) + 1)
      val (nr, nc) = (cr1.sum, cc1.sum)
      val s = bins.indices.map { i =>
        val p = cr1(i) * 1000000L / nr
        val q = cc1(i) * 1000000L / nc
        val l = math.round(math.log((cr1(i).toDouble / nr) /
          (cc1(i).toDouble / nc)) * 1e6)
        (p - q) * l
      }.sum
      val psi = math.max(0L, s) / 1000000L
      val (gr, gc, gb, gp) = out(src)
      assert(gr === rows.count(_._1 % 2 == 0), s"n_ref at $src")
      assert(gc === rows.count(_._1 % 2 == 1), s"n_cur at $src")
      assert(gb === bins.length, s"n_bins at $src")
      assert(gp === psi, s"psi at $src")
    }
  }

  test("q242 PSI is exactly zero when the two halves are identical") {
    import spark.implicits._
    // doc pairs (2k, 2k+1) with IDENTICAL text -> identical bin counts
    val docs = (0L until 40L)
      .map(i => (i, "s", ("tok " * (5 + (i / 2) % 7).toInt).trim))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.psiDrift(docs, "doc_id", "source", "text")
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("psi_micro") === 0L)
  }

  test("q243 DSIR weights replay and rank the target slice up at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val out = CurationQueries.dsirSelection(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_e6")))
    assert(out.length === 40)
    // replay from the raw token->bucket stream (hash via the specced kernel)
    val tokh = docs.select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).as("tgt"),
        explode(graft.ext.TextOps.tokens(
          graft.ext.TextOps.normText(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("tgt"),
        (graft.functions.TextKernelOps.wordNgramHashFull(col("w"), 1)
          .getItem(0) % 64).cast("int").as("bucket"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("tgt"),
        r.getAs[Int]("bucket")))
    val ca = Array.fill(64)(1L)
    val ct = Array.fill(64)(1L)
    tokh.foreach { case (_, tgt, b) =>
      ca(b) += 1; if (tgt == 1) ct(b) += 1
    }
    val (na, nt) = (ca.sum, ct.sum)
    val lw = (0 until 64).map(b => math.round(math.log(
      (ct(b).toDouble / nt) / (ca(b).toDouble / na)) * 1e6))
    val byDoc = tokh.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.length.toLong, xs.map(x => lw(x._3)).sum)
    }
    val expTop = byDoc.toSeq.map { case (id, (n, w)) => (id, n, w) }
      .sortBy { case (id, _, w) => (-w, id) }.take(40)
    assert(out.map(_._1).toSeq === expTop.map(_._1).toSeq, "top-40 ids")
    out.zip(expTop).foreach { case ((id, _, n, w), (eid, en, ew)) =>
      assert(id === eid && n === en && w === ew, s"weight row at $id")
    }
    // selection pressure is real: 'en' over-represented in the top-40
    // vs the corpus rate
    val corpusEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val topEn = out.count(_._2 == "en").toDouble / out.length
    assert(topEn > corpusEn, s"target lift absent: $topEn <= $corpusEn")
  }

  test("q244 LSH candidate eval replays P/R vs the exact capped tier at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val out = DedupQueries.lshCandidateReport(spark, sf001).collect()
      .map(r => r.getAs[Long]("threshold_ppm") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_cand"),
          r.getAs[Long]("n_hit"), r.getAs[Long]("precision_ppm"),
          r.getAs[Long]("recall_ppm"))).toMap
    assert(out.keySet === Set(500000L, 800000L))
    // candidates from the specced band kernel
    val bands = TextDedup.minhashBands(docs, "doc_id", "text", k = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("band_hash")))
    val cand = bands.groupBy(b => (b._2, b._3)).values
      .flatMap { g =>
        val ids = g.map(_._1).distinct.sorted.toSeq
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    // exact tier from the specced shingle-hash kernel, df-capped
    val sh = TextDedup.docShingleHashes(docs, "doc_id", "text", k = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hv")))
    val hot = sh.groupBy(_._2).collect {
      case (hv, xs) if xs.length > TextDedup.DefaultMaxDf => hv
    }.toSet
    val sets = sh.filterNot(x => hot(x._2)).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).toSet }
    val ids = sets.keys.toSeq.sorted
    val jacc = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield ((a, b),
      inter.toDouble / (sets(a).size + sets(b).size - inter))).toMap
    Seq(0.5 -> 500000L, 0.8 -> 800000L).foreach { case (th, ppm) =>
      // NB: jacc is a Map — collect straight on it would rebuild a Map
      // from the yielded (doc_a, doc_b) pairs and dedup by doc_a
      val exact = jacc.toSeq.collect { case (p, j) if j >= th => p }.toSet
      val hit = (exact & cand).size.toLong
      val (gne, gnc, gnh, gp, gr) = out(ppm)
      assert(gne === exact.size.toLong, s"n_exact at $th")
      assert(gnc === cand.size.toLong, s"n_cand at $th")
      assert(gnh === hit, s"n_hit at $th")
      assert(gp === (if (cand.isEmpty) 0L
        else hit * 1000000L / cand.size), s"precision at $th")
      assert(gr === (if (exact.isEmpty) 0L
        else hit * 1000000L / exact.size), s"recall at $th")
    }
    // the eval is non-vacuous: ground truth exists at both thresholds
    assert(out(500000L)._1 > 0, "no exact pairs at 0.5")
  }

  test("q246 retrieval eval replays MRR/hit from the tiers' own outputs") {
    val out = SimilarityQueries.retrievalEval(spark, sf001).collect()
      .map(r => r.getAs[String]("system") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_found"),
          r.getAs[Long]("hit_at3_ppm"), r.getAs[Long]("mrr_e6"),
          r.getAs[Long]("hit_se_ppm"), r.getAs[Long]("mrr_se_e6"))).toMap
    assert(out.keySet === Set("brute", "lsh", "ivf", "pq", "ivfadc"))
    // the exact tier certifies the harness: true NN is its own rank 1,
    // and when ALL queries agree the jackknife SE is zero by construction
    assert(out("brute") === (10L, 10L, 1000000L, 1000000L, 0L, 0L))
    // replay each system from its own (already-specced) output
    val truth = SimilarityQueries.annBruteTopK(spark, sf001)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    val systems = Seq(
      "lsh" -> SimilarityQueries.annLshTopK(spark, sf001),
      "ivf" -> SimilarityQueries.annIvfTopK(spark, sf001),
      "pq" -> SimilarityQueries.pqRetrieval(spark, sf001),
      "ivfadc" -> SimilarityQueries.ivfAdcRetrieval(spark, sf001))
    systems.foreach { case (nm, df) =>
      val ranks = df.filter(col("rank") <= 3).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank")))
      val hits = ranks.filter { case (q, n, _) => truth.get(q).contains(n) }
      val nFound = hits.length.toLong
      val sumRr = hits.map(h => 1000000L / h._3).sum
      val sumRr2 = hits.map { h => val rr = 1000000L / h._3; rr * rr }.sum
      val (gq, gf, gh, gm, ghse, gmse) = out(nm)
      assert(gq === truth.size.toLong, s"n_queries at $nm")
      assert(gf === nFound, s"n_found at $nm")
      assert(gh === nFound * 1000000L / truth.size, s"hit ppm at $nm")
      assert(gm === sumRr / truth.size, s"mrr at $nm")
      // jackknife SE replay: closed form sqrt((nΣx² − (Σx)²)/(n²(n−1)));
      // for the 0/1 hit indicator Σx² = Σx, and the ppm scale rides
      // inside the rounding exactly as the operator computes it
      val n = truth.size.toLong
      assert(ghse === math.round(math.sqrt(
        (n * nFound - nFound * nFound).toDouble /
          (n.toDouble * n * (n - 1))) * 1e6), s"hit se at $nm")
      assert(gmse === math.round(math.sqrt(
        (n * sumRr2 - sumRr * sumRr).toDouble /
          (n.toDouble * n * (n - 1)))), s"mrr se at $nm")
    }
    // at least one approximate tier finds at least one true NN
    assert(out.filterKeys(_ != "brute").values.exists(_._2 > 0))
  }

  test("q247 cluster eval replays purity and NMI from the q236 assignment") {
    val out = SimilarityQueries.clusterEvalReport(spark, sf001).collect()
      .map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n_members"), r.getAs[Int]("majority_label"),
          r.getAs[Long]("n_majority"), r.getAs[Long]("purity_ppm"),
          r.getAs[Long]("nmi_ppm"))).toMap
    // rebuild the contingency table from kmeansRounds' own loop output:
    // re-run the eval's building block (assignment via the shared loop)
    // is internal, so replay from first principles instead — quantize,
    // run 4 Lloyd rounds in BigInt exactly as KmeansSpec does
    val rows = graft.model.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Int]("i"), r.getAs[Float]("x").toDouble))
    val byVec = rows.groupBy(_._1).map { case (id, xs) =>
      val arr = xs.sortBy(_._3).map(_._4).toArray
      val nrm = math.sqrt(arr.map(x => x * x).sum)
      (id, xs.head._2, if (nrm > 0) arr.map(x =>
        math.round(x / nrm * 1e6)) else Array[Long]())
    }.filter(_._3.nonEmpty).toSeq
    var asg = byVec.map { case (id, lab, _) => id -> lab.toLong }.toMap
    for (_ <- 1 to 4) {
      val cents = byVec.groupBy(v => asg(v._1)).map { case (cell, vs) =>
        val n = vs.length
        cell -> (0 until 64).map { i =>
          val sx = vs.map(_._3(i)).sum
          if (sx >= 0) sx / n else -((-sx) / n)
        }.toArray
      }
      asg = byVec.map { case (id, _, xe) =>
        id -> cents.toSeq.map { case (cell, ce) =>
          val d2 = (0 until 64).map(i =>
            (xe(i) - ce(i)) * (xe(i) - ce(i))).sum
          (d2, cell)
        }.min._2
      }.toMap
    }
    val ctg = byVec.map { case (id, lab, _) => (asg(id), lab) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rt = ctg.groupBy(_._1._1).map { case (c, xs) => c -> xs.values.sum }
    val clT = ctg.groupBy(_._1._2).map { case (l, xs) => l -> xs.values.sum }
    val nn = ctg.values.sum
    val miNum = ctg.map { case ((c, l), n) =>
      n * math.round(math.log((n.toDouble * nn) /
        (rt(c).toDouble * clT(l))) * 1e6)
    }.sum
    val hcNum = -rt.values.map(n =>
      n * math.round(math.log(n.toDouble / nn) * 1e6)).sum
    val hlNum = -clT.values.map(n =>
      n * math.round(math.log(n.toDouble / nn) * 1e6)).sum
    val nmi = if (hcNum + hlNum == 0) 0L
      else math.max(0L, (BigInt(2) * miNum * 1000000 /
        (hcNum + hlNum)).toLong)
    val expClusters = rt.keySet.map(_.toInt)
    assert(out.keySet === expClusters)
    out.foreach { case (c, (nM, mL, nMaj, pur, gNmi)) =>
      val cells = ctg.collect { case ((cc, l), n) if cc == c => (l, n) }
      assert(nM === rt(c.toLong), s"members at $c")
      val best = cells.toSeq.minBy { case (l, n) => (-n, l) }
      assert(mL === best._1, s"majority label at $c")
      assert(nMaj === best._2, s"majority count at $c")
      assert(pur === best._2 * 1000000L / rt(c.toLong), s"purity at $c")
      assert(gNmi === nmi, s"nmi at $c")
    }
  }

  test("q248 dedup sweep replays drops and is monotone in the threshold") {
    val out = DedupQueries.dedupSweepReport(spark, sf001).collect()
      .map(r => r.getAs[Long]("threshold_ppm") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("dropped_tokens"), r.getAs[Long]("kept_docs"),
          r.getAs[Long]("kept_tokens"))).toMap
    assert(out.keySet === Set(300000L, 500000L, 700000L, 900000L))
    // replay from the same capped exact tier as the q244 spec
    val docs = graft.model.Tables.documents(spark, sf001)
    val sh = TextDedup.docShingleHashes(docs, "doc_id", "text", k = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hv")))
    val hot = sh.groupBy(_._2).collect {
      case (hv, xs) if xs.length > TextDedup.DefaultMaxDf => hv
    }.toSet
    val sets = sh.filterNot(x => hot(x._2)).groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(_._2).toSet }
    val toks = docs.select(col("doc_id"),
        graft.ext.TextOps.normText(col("text")).as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("t").split(" ", -1).length.toLong).toMap
    val totalDocs = toks.size.toLong
    val totalTokens = toks.values.sum
    val ids = sets.keys.toSeq.sorted
    val pairs = for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield (a, b, inter.toDouble / (sets(a).size + sets(b).size - inter))
    Seq(0.3, 0.5, 0.7, 0.9).foreach { th =>
      val sel = pairs.filter(_._3 >= th)
      val dropped = sel.map(_._2).distinct
      val dTok = dropped.map(toks).sum
      val (gp, gd, gdt, gkd, gkt) = out(math.round(th * 1e6))
      assert(gp === sel.length.toLong, s"pairs at $th")
      assert(gd === dropped.length.toLong, s"dropped at $th")
      assert(gdt === dTok, s"dropped tokens at $th")
      assert(gkd === totalDocs - dropped.length, s"kept docs at $th")
      assert(gkt === totalTokens - dTok, s"kept tokens at $th")
    }
    // the curve is monotone: a higher threshold never drops more
    val byTh = out.toSeq.sortBy(_._1).map(_._2._2)
    assert(byTh === byTh.sorted.reverse, s"non-monotone drops: $byTh")
    assert(out(300000L)._2 > 0, "sweep is vacuous: nothing dropped at 0.3")
  }

  test("q249 quality sweep replays bins and the cumulative curve") {
    val out = CurationQueries.qualityThresholdSweep(spark, sf001).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("cum_docs"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("cum_token_share_ppm"))).toMap
    val scored = graft.model.Tables.documents(spark, sf001)
      .select(graft.ext.TextOps.normText(col("text")).as("t")).collect()
      .map { r =>
        val toks = r.getAs[String]("t").split(" ", -1)
        val n = toks.length.toLong
        val stop = toks.count(graft.ext.TextAnalysis.Stopwords.contains).toLong
        (n, stop * 1000000L / math.max(n, 1L) / 50000L)
      }
    val bins = scored.groupBy(_._2).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.map(_._1).sum) }
    val tt = bins.values.map(_._2).sum
    assert(out.keySet === bins.keySet)
    bins.foreach { case (b, (nd, tk)) =>
      val cum = bins.toSeq.filter(_._1 >= b)
      val (cd, ctk) = (cum.map(_._2._1).sum, cum.map(_._2._2).sum)
      assert(out(b) === ((nd, tk, cd, ctk, ctk * 1000000L / tt)), s"bin $b")
    }
    // lowest bin's cumulative covers the whole corpus
    val minBin = bins.keySet.min
    assert(out(minBin)._5 === 1000000L)
  }

  test("q250 l-diversity replays distinct/entropy and catches homogeneity") {
    val out = ProfileAnalytics.lDiversity(spark, sf001).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("c_nationkey")) ->
        (r.getAs[Long]("class_size"), r.getAs[Int]("distinct_l"),
          r.getAs[Long]("entropy_micro"), r.getAs[Int]("is_2_diverse"))).toMap
    val rows = graft.model.Tables.customer(spark, sf001)
      .select(col("c_mktsegment"), col("c_nationkey"), col("c_acctbal"))
      .collect()
      .map { r =>
        val b = r.getAs[Double]("c_acctbal") match {
          case x if x < 0 => "neg"
          case x if x <= 5000 => "mid"
          case _ => "high"
        }
        ((r.getAs[String]("c_mktsegment"), r.getAs[Long]("c_nationkey")), b)
      }
    val classes = rows.groupBy(_._1)
    assert(out.keySet === classes.keySet)
    classes.foreach { case (k, xs) =>
      val byBand = xs.groupBy(_._2).map { case (_, ys) => ys.length.toLong }
      val n = xs.length.toLong
      val ent = -byBand.map(ns =>
        ns * math.round(math.log(ns.toDouble / n) * 1e6)).sum / n
      val (gn, gl, ge, gd) = out(k)
      assert(gn === n, s"size at $k")
      assert(gl === byBand.size, s"distinct at $k")
      assert(ge === ent, s"entropy at $k")
      assert(gd === (if (byBand.size >= 2 && ent >= 693147L) 1 else 0))
    }
    // the audit is non-vacuous in BOTH directions on real data: some
    // class is 2-diverse and the entropy spread is real
    assert(out.values.exists(_._4 == 1), "no diverse class found")
    assert(out.values.map(_._3).toSet.size > 1, "entropy is constant")
  }

  test("q251 BPE sweep is consistent with training and monotone") {
    val out = TextQueries.bpeSweepReport(spark, sf001).collect()
      .map(r => r.getAs[Int]("round") ->
        (r.getAs[Long]("n_vocab_words"), r.getAs[Long]("corpus_words"),
          r.getAs[Long]("corpus_chars"), r.getAs[Long]("corpus_pieces"),
          r.getAs[Long]("fertility_micro"),
          r.getAs[Long]("chars_per_piece_micro"))).toMap
    assert(out.keySet === (0 to 6).toSet)
    // round 0 is the character baseline: pieces == chars, fertility =
    // chars per word
    val (nv0, cw0, cc0, cp0, f0, cpp0) = out(0)
    assert(cp0 === cc0, "round-0 pieces must equal chars")
    assert(f0 === cc0 * 1000000L / cw0)
    assert(cpp0 === 1000000L, "round-0 chars per piece must be exactly 1")
    // invariants across rounds: vocab and corpus volumes constant,
    // piece volume strictly monotone non-increasing, one merge per
    // round can only reduce
    (1 to 6).foreach { r =>
      val (nv, cw, cc, cp, f, _) = out(r)
      assert((nv, cw, cc) === ((nv0, cw0, cc0)), s"volumes moved at $r")
      assert(cp <= out(r - 1)._4, s"pieces grew at round $r")
      assert(f === cp * 1000000L / cw, s"fertility arithmetic at $r")
    }
    // the merges actually bite: round 6 is strictly cheaper than chars
    assert(out(6)._4 < cp0, "six merges removed nothing")
    // cross-check round 6 against q232's per-word readout on shared words
    val seg = TextQueries.bpeEncode(spark, sf001).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("freq"), r.getAs[Long]("n_pieces"))).toMap
    seg.foreach { case (w, (fq, p)) =>
      assert(p >= 1 && p <= w.length, s"piece count out of range for $w")
      assert(fq >= 1)
    }
  }

  test("q252 embedding cross-source matrix replays from the pair tier") {
    val out = SimilarityQueries.embCrossSourceMatrix(spark, sf001).collect()
      .map(r => (r.getAs[String]("source_lo"), r.getAs[String]("source_hi")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("max_cos_e4"),
          r.getAs[Long]("example_a"), r.getAs[Long]("example_b"))).toMap
    val emb = graft.model.Tables.embeddings(spark, sf001)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        "bucket", threshold = 0.40).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.round(r.getAs[Double]("cos") * 10000)))
    val src = graft.model.Tables.documents(spark, sf001)
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val cells = pairs.map { case (a, b, c) =>
      val (sa, sb) = (src(a), src(b))
      ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa), (a, b, c))
    }.groupBy(_._1)
    assert(out.keySet === cells.keySet)
    cells.foreach { case (k, xs) =>
      val ps = xs.map(_._2)
      val ex = ps.map(p => (p._1, p._2)).min
      assert(out(k) === ((ps.length.toLong, ps.map(_._3).max, ex._1, ex._2)),
        s"cell $k")
    }
    // semantic leakage report is non-vacuous and includes a cross-source cell
    assert(out.nonEmpty)
    assert(out.keys.exists(k => k._1 != k._2), "no cross-source pair found")
  }

  // ---- q254 PRF: full integer replay of retrieve -> expand -> rescore
  private def replayPrf(docs: Seq[(Long, String)], qids: Seq[Long],
                        k: Int, kFb: Int, nExp: Int)
      : Map[(Long, Int), (Long, Long, Int, Int)] = {
    def norm(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
    val toks = docs.map { case (id, t) => id -> norm(t).split(" ", -1).toSeq }
    val tf = toks.flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (kk, xs) => kk -> xs.length.toLong }
    val dl = tf.toSeq.groupBy(_._1._1)
      .map { case (id, xs) => id -> xs.map(_._2).sum }
    val dfm = tf.keys.toSeq.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val n = dl.size.toLong
    val t = dl.values.sum
    def idf(w: String): Long =
      math.round(math.log(1.0 + (n - dfm(w) + 0.5) / (dfm(w) + 0.5)) * 1e6)
    def tfppm(f: Long, d: Long): Long =
      ((BigInt(22) * f * t * 1000000) /
        (BigInt(10) * t * f + 3 * t + 9 * d * n)).toLong
    def score(qid: Long, terms: Set[String], expSet: Set[String])
        : Seq[(Long, Long, Int, Int)] =
      dl.keys.filter(_ != qid).toSeq.flatMap { d =>
        val hits = terms.toSeq.filter(w => tf.contains((d, w)))
        if (hits.isEmpty) None
        else Some((d, hits.map(w => idf(w) * tfppm(tf((d, w)), dl(d))).sum,
          hits.length, hits.count(expSet)))
      }
    qids.flatMap { qid =>
      val qTerms = toks.find(_._1 == qid).get._2.distinct
        .filter(dfm.contains).toSet
      val fb = score(qid, qTerms, Set.empty)
        .sortBy { case (d, s, _, _) => (-s, d) }.take(kFb).map(_._1)
      val cand = fb.flatMap(d => tf.keys.filter(_._1 == d).map(_._2))
        .distinct.filterNot(qTerms)
      val exp = cand.map(w => w -> fb.map(d =>
          tf.getOrElse((d, w), 0L) * idf(w)).sum)
        .sortBy { case (w, s) => (-s, w) }.take(nExp).map(_._1).toSet
      score(qid, qTerms ++ exp, exp)
        .sortBy { case (d, s, _, _) => (-s, d) }.take(k).zipWithIndex
        .map { case ((d, s, nh, ne), i) =>
          (qid, i + 1) -> (d, s, nh, ne) }
    }.toMap
  }

  test("q254 PRF expands and rescores — fixture with hand-checkable expansion") {
    import spark.implicits._
    val fixture = Seq(
      1L -> "apple banana", 2L -> "apple banana cherry",
      3L -> "cherry durian", 4L -> "durian elderberry",
      5L -> "banana cherry durian")
    val docs = fixture.toDF("doc_id", "text")
    val out = graft.ext.Retrieval.bm25PrfTopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") === 1)
          .select(col("doc_id").as("query_id"), col("text").as("qtext")),
        k = 4, kFb = 2, nExp = 2)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_e12"),
          r.getAs[Int]("n_hit_terms"), r.getAs[Int]("n_exp_terms"))).toMap
    val exp = replayPrf(fixture, Seq(1L), k = 4, kFb = 2, nExp = 2)
    assert(out === exp)
    // the expansion is doing real work: docs with NO original query
    // term (d4: durian elderberry) are now reachable
    assert(out.values.exists { case (d, _, _, ne) => d == 4L && ne > 0 })
  }

  test("q254 PRF replays the full integer pipeline at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    val out = RetrievalQueries.bm25PrfSearch(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_e12"),
          r.getAs[Int]("n_hit_terms"), r.getAs[Int]("n_exp_terms"))).toMap
    val exp = replayPrf(docs, (0L until 10L).toSeq, k = 5, kFb = 5, nExp = 3)
    assert(out === exp)
    // expansions participate somewhere in the final lists
    assert(out.values.exists(_._4 > 0), "no expansion term ever matched")
  }

  test("q253 assortativity replays the integer Pearson at sf0.001") {
    val out = GraphAnalytics.copurchaseAssortativity(spark, sf001).collect()
    assert(out.length === 1)
    val r = out.head
    val it = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("oid"), x.getAs[Long]("item")))
    val edges = it.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct.sorted.toSeq
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).toSeq // .toSeq BEFORE collect: the Map would dedup pairs by u
      .collect { case (e, xs) if xs.size >= 2 => e }
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (nd, xs) => nd -> xs.length.toLong }
    val dd = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val m2 = BigInt(dd.length)
    val xs = dd.map(e => BigInt(deg(e._1)))
    val ys = dd.map(e => BigInt(deg(e._2)))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val num = m2 * sxy - sx * sy
    val d1 = m2 * sxx - sx * sx
    val d2 = m2 * syy - sy * sy
    assert(r.getAs[Long]("n_nodes") === deg.size.toLong)
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    assert(r.getAs[Long]("max_degree") === deg.values.max)
    val expR = if (d1 > 0 && d2 > 0)
      math.round(num.toDouble / math.sqrt(d1.toDouble * d2.toDouble) * 1e6)
    else 0L
    assert(r.getAs[Long]("assortativity_e6") === expR)
    assert(r.getAs[Int]("defined") === (if (d1 > 0 && d2 > 0) 1 else 0))
  }

  test("q255 Neyman allocation replays and is budget-feasible") {
    val out = CurationQueries.neymanAllocation(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sigma_e6"),
          r.getAs[Long]("weight_ppm"), r.getAs[Long]("neyman_n"),
          r.getAs[Long]("proportional_n"), r.getAs[Long]("budget_n"))).toMap
    val rows = graft.model.Tables.documents(spark, sf001)
      .select(col("source"),
        graft.ext.TextOps.normText(col("text")).as("t")).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[String]("t").split(" ", -1).length.toLong)
    val bySrc = rows.groupBy(_._1).map { case (s, xs) =>
      val v = xs.map(_._2)
      val nh = v.length.toLong
      val (sx, sxx) = (v.sum, v.map(x => x * x).sum)
      val s2num = BigInt(nh) * sxx - BigInt(sx) * sx
      val sigma = math.round(math.sqrt(s2num.toDouble) / nh * 1e6)
      s -> (nh, sigma, BigInt(nh) * sigma)
    }
    val ntot = bySrc.values.map(_._1).sum
    val wtot = bySrc.values.map(_._3).sum
    val budget = ntot * 100000L / 1000000L
    assert(out.keySet === bySrc.keySet)
    bySrc.foreach { case (s, (nh, sigma, wh)) =>
      val ney = (BigInt(budget) * wh / wtot).toLong min nh
      val prop = (budget * nh / ntot) min nh
      assert(out(s) === ((nh, sigma, (wh * 1000000 / wtot).toLong,
        ney, prop, budget)), s"alloc at $s")
    }
    // floor allocations never exceed the budget in total
    assert(out.values.map(_._4).sum <= budget)
    assert(out.values.map(_._5).sum <= budget)
  }

  test("q256 conformal threshold replays and orders accepted above rejected") {
    val out = CurationQueries.conformalReport(spark, sf001).collect()
      .map(r => r.getAs[Int]("predicted") ->
        (r.getAs[Long]("n_test"), r.getAs[Long]("n_accepted"),
          r.getAs[Long]("accept_ppm"), r.getAs[Long]("acc_accepted_ppm"),
          r.getAs[Long]("acc_rejected_ppm"), r.getAs[Long]("tau"),
          r.getAs[Long]("n_cal"), r.getAs[Long]("k"))).toMap
    val docs = graft.model.Tables.documents(spark, sf001)
    val pred = TextAnalysis.qualityClassifier(docs, "doc_id", "text")
      .select("doc_id", "predicted", "margin").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("predicted"), r.getAs[Long]("margin"))).toMap
    val lab = TextAnalysis.ruleQualityLabel(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("label")).toMap
    val jj = pred.toSeq.collect { case (id, (p, m)) if lab.contains(id) =>
      (id, p, m, lab(id)) }
    val cal = jj.filter(_._1 % 2 == 0)
    val k = (cal.length + 1) * 100000L / 1000000L
    val tau = if (k < 1) 0L
      else cal.map(_._3).sorted.apply((k - 1).toInt)
    val test = jj.filter(_._1 % 2 == 1)
    assert(out.keySet === test.map(_._2).toSet)
    test.groupBy(_._2).foreach { case (cls, xs) =>
      val acc = xs.filter(_._3 >= tau)
      val rej = xs.filterNot(_._3 >= tau)
      val (gn, gna, gap, gaa, gar, gt, gnc, gk) = out(cls)
      assert(gn === xs.length.toLong && gna === acc.length.toLong)
      assert(gt === tau && gnc === cal.length.toLong && gk === k)
      assert(gap === acc.length * 1000000L / xs.length)
      assert(gaa === (if (acc.isEmpty) 0L
        else acc.count(x => x._2 == x._4) * 1000000L / acc.length))
      assert(gar === (if (rej.isEmpty) 0L
        else rej.count(x => x._2 == x._4) * 1000000L / rej.length))
    }
    // the coverage guarantee's premise: at most k calibration margins
    // fall strictly below tau
    assert(cal.count(_._3 < tau) <= k)
    // selection is useful overall: pooled accepted accuracy >= pooled
    // rejected accuracy (margins are a real confidence signal here)
    val accAll = test.filter(_._3 >= tau)
    val rejAll = test.filterNot(_._3 >= tau)
    if (accAll.nonEmpty && rejAll.nonEmpty) {
      val a = accAll.count(x => x._2 == x._4).toDouble / accAll.length
      val b = rejAll.count(x => x._2 == x._4).toDouble / rejAll.length
      assert(a >= b, s"accepted acc $a below rejected $b")
    }
  }

  test("q257 Adamic-Adar replays the capped wedge scoring at sf0.001") {
    val out = GraphAnalytics.copurchaseLinkPrediction(spark, sf001).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("aa_e6"), r.getAs[Long]("n_common")))
    assert(out.length === 25)
    val it = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(x => (x.getAs[Long]("oid"), x.getAs[Long]("item")))
    val edges = it.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct.sorted.toSeq
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).toSeq
      .collect { case (e, xs) if xs.size >= 2 => e }
    val edgeSet = edges.toSet
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (z, xs) => z -> xs.map(_._2).toSeq.sorted }
    val scores = collection.mutable.Map[(Long, Long), (Long, Long)]()
    adj.foreach { case (z, nbs) =>
      val d = nbs.length
      if (d >= 2 && d <= 64) {
        val w = math.round(1e6 / math.log(d.toDouble))
        for (ai <- nbs.indices; bi <- (ai + 1) until nbs.length) {
          val p = (nbs(ai), nbs(bi))
          if (!edgeSet(p)) {
            val (s, c) = scores.getOrElse(p, (0L, 0L))
            scores(p) = (s + w, c + 1)
          }
        }
      }
    }
    val expTop = scores.toSeq
      .map { case ((a, b), (s, c)) => (a, b, s, c) }
      .sortBy { case (a, b, s, _) => (-s, a, b) }.take(25)
    assert(out.toSeq === expTop)
    // predictions are genuinely non-adjacent
    out.foreach { case (a, b, _, _) => assert(!edgeSet((a, b))) }
  }

  test("q258 recommender holdout replays hit-rates at sf0.001") {
    val out = GraphAnalytics.recommenderHoldout(spark, sf001).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_evals"), r.getAs[Long]("n_cold"),
          r.getAs[Long]("n_hits"), r.getAs[Long]("hitrate_ppm"),
          r.getAs[Long]("hit_se_ppm"))).toMap
    assert(out.keySet === Set(1, 2, 3))
    val orders = graft.model.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("oid"),
        (col("o_orderdate") >= lit("1997-01-01")).cast("int").as("t"))
      .collect().map(r => r.getAs[Long]("oid") -> r.getAs[Int]("t")).toMap
    val li = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("oid"), r.getAs[Long]("item")))
      .filter(x => orders.contains(x._1))
    val train = li.filter(x => orders(x._1) == 0)
    val test = li.filter(x => orders(x._1) == 1)
    val pairCnt = train.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct.toSeq
      for (a <- items; b <- items if a != b) yield (a, b)
    }.groupBy(identity).toSeq // dodge the Map.collect pair-dedup trap
      .map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
    val recs = pairCnt.groupBy(_._1).map { case (i, xs) =>
      i -> xs.sortBy { case (_, o, c) => (-c, o) }.take(3)
        .zipWithIndex.map { case ((_, o, _), r) => o -> (r + 1) }
    }
    val baskets = test.groupBy(_._1)
      .map { case (o, xs) => o -> xs.map(_._2).toSet }
    val evalPairs = test.filter(x => recs.contains(x._2))
    val nCold = test.count(x => !recs.contains(x._2)).toLong
    val minRanks = evalPairs.flatMap { case (o, i) =>
      val others = baskets(o) - i
      val hits = recs(i).collect { case (rec, rk) if others(rec) => rk }
      if (hits.isEmpty) None else Some(hits.min)
    }
    (1 to 3).foreach { k =>
      val (gne, gnc, gh, gr, gse) = out(k)
      val h = minRanks.count(_ <= k).toLong
      assert(gne === evalPairs.length.toLong, s"n_evals at $k")
      assert(gnc === nCold, s"n_cold at $k")
      assert(gh === h, s"hits at $k")
      assert(gr === (if (evalPairs.isEmpty) 0L
        else h * 1000000L / evalPairs.length), s"rate at $k")
      // jackknife SE of the 0/1 hit mean: sqrt((n·S − S²)/(n²(n−1)))·1e6
      val n = evalPairs.length.toLong
      val expSe = if (n <= 1) 0L else math.round(math.sqrt(
        (n * h - h * h).toDouble / (n.toDouble * n * (n - 1))) * 1e6)
      assert(gse === expSe, s"hit se at $k")
    }
    // the eval is exercised: some hit exists and hit@3 >= hit@1
    assert(out(3)._3 >= out(1)._3)
    assert(out(3)._3 > 0, "no hits at k=3 — eval vacuous")
  }

  test("q259 chunk retrieval pools the best chunk and matches chunk BM25") {
    val out = RetrievalQueries.chunkRetrieval(spark, sf001).collect()
      .map(r => (r.getAs[Int]("query_id").toLong, r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("best_chunk"),
          r.getAs[Long]("best_score_e12"), r.getAs[Long]("n_chunks_hit")))
      .toMap
    assert(out.keys.map(_._1).toSet === Set(1L, 2L, 3L))
    // replay: chunk corpus scored by the already-specced bm25Scores,
    // pooled per doc in Scala
    import spark.implicits._
    val chunks = graft.ext.Chunking.chunk(
        graft.model.Tables.documents(spark, sf001), "doc_id", "text",
        chunkTokens = 64, overlap = 16)
      .select((col("doc_id") * 1000000L + col("chunk_idx")).as("doc_id"),
        col("chunk_text").as("text"))
    val queries = Seq(1 -> "spark hash join", 2 -> "window merge sort",
      3 -> "stream batch data").toDF("query_id", "qtext")
    val scores = graft.ext.Retrieval
      .bm25Scores(chunks, "doc_id", "text", queries).collect()
      .map(r => (r.getAs[Int]("query_id").toLong, r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_e12")))
    val exp = scores.groupBy(s => (s._1, s._2 / 1000000L))
      .map { case ((q, d), xs) =>
        val best = xs.map(x => (x._3, x._2 % 1000000L))
          .minBy { case (s, c) => (-s, c) }
        (q, d, best._1, best._2, xs.length.toLong)
      }.groupBy(_._1).flatMap { case (q, docs) =>
        docs.toSeq.sortBy { case (_, d, s, _, _) => (-s, d) }.take(5)
          .zipWithIndex.map { case ((_, d, s, bc, nh), i) =>
            (q, i + 1) -> (d, bc, s, nh) }
      }
    assert(out === exp)
    // pooling is doing real work: some winning doc has its best chunk
    // beyond chunk 0 (the passage was NOT at the start)
    assert(out.values.exists(_._2 > 0), "all winners matched at chunk 0")
  }

  test("q260 repeat scrub replays the covered-position union at sf0.001") {
    val out = DedupQueries.repeatScrub(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_affected"),
          r.getAs[Long]("tokens_before"), r.getAs[Long]("tokens_after"),
          r.getAs[Long]("removed_ppm"))).toMap
    val docs = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.normText(col("text")).as("t")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("t").split(" ", -1).toSeq))
    val perDoc = docs.map { case (id, src, toks) =>
      val grams = toks.sliding(4).filter(_.length == 4)
        .map(_.mkString(" ")).toSeq
      val seen = collection.mutable.Set[String]()
      val covered = collection.mutable.Set[Int]()
      grams.zipWithIndex.foreach { case (gm, p) =>
        if (seen(gm)) (p until p + 4).foreach(covered += _)
        else seen += gm
      }
      (src, toks.length.toLong, covered.size.toLong)
    }
    perDoc.groupBy(_._1).foreach { case (src, xs) =>
      val before = xs.map(_._2).sum
      val removed = xs.map(_._3).sum
      val (gn, ga, gb, gaf, gp) = out(src)
      assert(gn === xs.length.toLong, s"docs at $src")
      assert(ga === xs.count(_._3 > 0).toLong, s"affected at $src")
      assert(gb === before, s"before at $src")
      assert(gaf === before - removed, s"after at $src")
      assert(gp === removed * 1000000L / before, s"ppm at $src")
    }
    // repetition exists in the synthetic corpus: the scrub bites
    assert(out.values.exists(_._2 > 0), "no repeated 4-gram anywhere")
  }

  test("q261 capped budget replays both prefixes and the cap binds") {
    val out = CurationQueries.cappedBudgetSelection(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("kept")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("budget_tokens"), r.getAs[Long]("src_cap_tokens")))
      .toMap
    val docs = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.normText(col("text")).as("t")).collect()
      .map { r =>
        val toks = r.getAs[String]("t").split(" ", -1)
        val nTok = toks.length.toLong
        val nStop = toks.count(graft.ext.TextAnalysis.Stopwords.contains).toLong
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), nTok,
          nStop * 1000000L / math.max(nTok, 1L))
      }
    val budget = docs.map(_._3).sum * 500000L / 1000000L
    val caps = docs.groupBy(_._2)
      .map { case (s, xs) => s -> xs.map(_._3).sum * 700000L / 1000000L }
    val ordered = docs.sortBy { case (id, _, _, s) => (-s, id) }
    var gRun = 0L
    val sRun = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val flagged = ordered.map { case (id, src, n, _) =>
      val kept = gRun + n <= budget && sRun(src) + n <= caps(src)
      gRun += n; sRun(src) += n
      (src, n, if (kept) 1 else 0)
    }
    val exp = flagged.groupBy(d => (d._1, d._3)).map { case (k, ds) =>
      k -> (ds.length.toLong, ds.map(_._2).sum)
    }
    assert(out.keySet === exp.keySet)
    exp.foreach { case (k, (nd, tk)) =>
      val (gnd, gtk, gb, gc) = out(k)
      assert(gnd === nd && gtk === tk, s"rollup at $k")
      assert(gb === budget && gc === caps(k._1), s"limits at $k")
    }
    // the source cap actually binds somewhere: some source keeps fewer
    // tokens than the pure-budget q240 rule would allow it
    assert(out.keys.exists(_._2 == 0), "nothing was dropped")
    out.foreach { case ((s, kept), (_, tk, _, cap)) =>
      if (kept == 1) assert(tk <= cap, s"cap violated at $s")
    }
  }

  test("q262 IVF probe sweep replays recall and is monotone in nprobe") {
    val out = SimilarityQueries.ivfProbeSweep(spark, sf001).collect()
      .map(r => r.getAs[Int]("nprobe") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("recall_ppm"))).toMap
    assert(out.keySet === Set(1, 2, 4))
    val emb = graft.model.Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    Seq(1, 2, 4).foreach { p =>
      val got = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          "label", k = 5, nprobe = p).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      val hits = got.count(exact).toLong
      val (gq, gh, gr) = out(p)
      assert(gq === 10L, s"n_queries at $p")
      assert(gh === hits, s"hits at $p")
      assert(gr === hits * 1000000L / 50L, s"recall at $p")
    }
    // more probes never hurt recall, and the dial moves
    assert(out(1)._3 <= out(2)._3 && out(2)._3 <= out(4)._3)
    assert(out(4)._3 > out(1)._3, "probe sweep is flat — dial is broken")
  }

  test("q245 power iteration replays the 3 integer rounds at sf0.001") {
    val out = SimilarityQueries.principalComponent(spark, sf001).collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Long]("v_prev_e4"),
        r.getAs[Long]("v_e4"), r.getAs[Long]("align_ppm")))
      .sortBy(_._1)
    assert(out.length === 64)
    val q = graft.model.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("i"),
        math.round(r.getAs[Float]("x").toDouble * 1e4)))
    val byVec = q.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => (x._2, x._3)).sortBy(_._1).map(_._2).toArray
    }
    var v = Array.fill(64)(BigInt(10000))
    var vPrev = v
    for (_ <- 1 to 3) {
      val w = Array.fill(64)(BigInt(0))
      byVec.values.foreach { row =>
        val s = row.indices.map(i => BigInt(row(i)) * v(i)).sum
        row.indices.foreach(i => w(i) += BigInt(row(i)) * s)
      }
      val m = w.map(_.abs).max
      vPrev = v
      v = w.map(x => if (x >= 0) (x.abs * 10000) / m
        else -((x.abs * 10000) / m))
    }
    val dt = (0 until 64).map(i => v(i) * vPrev(i)).sum
    val nv = v.map(x => x * x).sum
    val np = vPrev.map(x => x * x).sum
    val align = ((dt * dt * 1000000) / (nv * np)).toLong
    out.foreach { case (d, pe, ve, ap) =>
      assert(BigInt(pe) === vPrev(d), s"v_prev at dim $d")
      assert(BigInt(ve) === v(d), s"v at dim $d")
      assert(ap === align, s"align_ppm at dim $d")
    }
    // the direction is normalized: some component sits at the e4 cap
    assert(v.map(_.abs).max === BigInt(10000))
  }

  test("q282 second PC replays deflation + second loop; near-orthogonal") {
    val out = SimilarityQueries.secondComponentReport(spark, sf001).collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Long]("v1_e4"),
        r.getAs[Long]("v2_e4"), r.getAs[Long]("align2_ppm"),
        r.getAs[Long]("ortho_ppm")))
      .sortBy(_._1)
    assert(out.length === 64)
    val q = graft.model.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("i"),
        math.round(r.getAs[Float]("x").toDouble * 1e4)))
    val byVec = q.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => (x._2, BigInt(x._3))).sortBy(_._1).map(_._2).toArray
    }
    def loop(rows: Iterable[Array[BigInt]]): (Array[BigInt], Array[BigInt]) = {
      var v = Array.fill(64)(BigInt(10000))
      var vPrev = v
      for (_ <- 1 to 3) {
        val w = Array.fill(64)(BigInt(0))
        rows.foreach { row =>
          val s = row.indices.map(i => row(i) * v(i)).sum
          row.indices.foreach(i => w(i) += row(i) * s)
        }
        val m = w.map(_.abs).max
        vPrev = v
        v = w.map(x => if (x >= 0) (x.abs * 10000) / m
          else -((x.abs * 10000) / m))
      }
      (v, vPrev)
    }
    val (v1, _) = loop(byVec.values)
    val nv1 = v1.map(x => x * x).sum
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b)
    val deflated = byVec.values.map { row =>
      val s = row.indices.map(i => row(i) * v1(i)).sum
      row.indices.map(i => row(i) - sdiv(s * v1(i), nv1)).toArray
    }
    val (v2, v2p) = loop(deflated)
    val dt2 = (0 until 64).map(i => v2(i) * v2p(i)).sum
    val align2 = ((dt2 * dt2 * 1000000) /
      (v2.map(x => x * x).sum * v2p.map(x => x * x).sum)).toLong
    val dto = (0 until 64).map(i => v1(i) * v2(i)).sum
    val ortho = ((dto * dto * 1000000) /
      (nv1 * v2.map(x => x * x).sum)).toLong
    out.foreach { case (d, g1, g2, ga, go) =>
      assert(BigInt(g1) === v1(d), s"v1 at dim $d")
      assert(BigInt(g2) === v2(d), s"v2 at dim $d")
      assert(ga === align2, s"align2_ppm at dim $d")
      assert(go === ortho, s"ortho_ppm at dim $d")
    }
    // the deflation's point: the two directions are near-orthogonal
    // (cos² under 1% — quantization residue only) and genuinely distinct
    assert(ortho < 10000L, s"ortho_ppm $ortho not near zero")
    assert(out.exists { case (_, g1, g2, _, _) => g1 != g2 })
  }

  test("q265 t-closeness replays the ordered EMD and catches skew") {
    val out = ProfileAnalytics.tCloseness(spark, sf001).collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("c_nationkey")) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("emd_ppm"),
          r.getAs[Int]("is_t_close"))).toMap
    val rows = graft.model.Tables.customer(spark, sf001)
      .select(col("c_mktsegment"), col("c_nationkey"), col("c_acctbal"))
      .collect()
      .map { r =>
        val b = r.getAs[Double]("c_acctbal") match {
          case x if x < 0 => 1
          case x if x <= 5000 => 2
          case _ => 3
        }
        ((r.getAs[String]("c_mktsegment"), r.getAs[Long]("c_nationkey")), b)
      }
    val n = BigInt(rows.length)
    val global = (1 to 3).map(b => BigInt(rows.count(_._2 == b)))
    val classes = rows.groupBy(_._1)
    assert(out.keySet === classes.keySet)
    classes.foreach { case (k, xs) =>
      val ng = BigInt(xs.length)
      val cnt = (1 to 3).map(b => BigInt(xs.count(_._2 == b)))
      // cumulative cross-multiplied diffs over the first m−1 bands
      val cums = (0 to 1).map(i =>
        (0 to i).map(j => cnt(j) * n - global(j) * ng).sum.abs)
      val emd = cums.sum * 1000000 / (2 * ng * n)
      val (gn, gemd, gflag) = out(k)
      assert(gn === xs.length.toLong, s"size at $k")
      assert(gemd === emd.toLong, s"emd at $k")
      assert(gflag === (if (emd <= 200000) 1 else 0), s"flag at $k")
    }
    // non-vacuous on real data: distances spread, and the audit FIRES —
    // some class sits far from the global distribution (at sf0.001 most
    // classes are near-singletons, i.e. point masses, which ordered EMD
    // correctly scores as far; the flag's positive arm is exercised by
    // construction whenever any EMD ≤ 0.2 appears at larger sf)
    assert(out.values.map(_._2).toSet.size > 1, "EMD is constant")
    assert(out.values.exists(_._3 == 0), "audit never fires")
  }
}
