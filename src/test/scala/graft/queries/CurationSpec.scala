package graft.queries

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Value-level replays for the round-10 curation operators: label
  * spreading over the near-dup graph (q239) and token-budget greedy
  * selection (q240). */
class CurationSpec extends SparkSpec {

  test("q239 label spreading replays the 3 frontier rounds at sf0.001") {
    val out = SimilarityQueries.labelSpreading(spark, sf001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("is_seed"),
          Option(r.getAs[Any]("label")).map(_.asInstanceOf[Int]),
          Option(r.getAs[Any]("assigned_round")).map(_.asInstanceOf[Int])))
      .toMap
    assert(out.size === 500)
    // replay: same bucketed 0.30 graph, 3 rounds in plain Scala
    val emb = graft.model.Tables.embeddings(spark, sf001)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        "bucket", threshold = 0.30).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.round(r.getAs[Double]("cos") * 10000)))
    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val trueLabel = emb.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    var labeled = trueLabel.keys.filter(_ % 5 == 0)
      .map(v => v -> (trueLabel(v), 0)).toMap
    for (r <- 1 to 3) {
      val cand = edges.filter { case (u, v, _) =>
        !labeled.contains(u) && labeled.contains(v) }
      val newly = cand.groupBy(_._1).map { case (u, es) =>
        val byLabel = es.groupBy(e => labeled(e._2)._1)
          .map { case (l, xs) => l -> xs.map(_._3).sum }
        val best = byLabel.toSeq.minBy { case (l, s) => (-s, l) }._1
        u -> (best, r)
      }
      labeled = labeled ++ newly
    }
    (0L until 500L).foreach { v =>
      val exp = labeled.get(v)
      val (isSeed, lab, ar) = out(v)
      assert(isSeed === (if (v % 5 == 0) 1 else 0), s"seed flag at $v")
      assert(lab === exp.map(_._1), s"label at $v")
      assert(ar === exp.map(_._2), s"round at $v")
    }
    // the spread is exercised: some non-seed node is assigned in every round
    (1 to 3).foreach(r =>
      assert(labeled.values.exists(_._2 == r), s"round $r assigned nobody"))
    // seeds keep their own label, always
    labeled.collect { case (v, (l, 0)) => assert(l === trueLabel(v)) }
  }

  test("q240 token budget replays the greedy prefix selection at sf0.001") {
    val out = CurationQueries.tokenBudgetSelection(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("kept")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("budget_tokens"))).toMap
    // replay: score every doc, exact greedy prefix in Scala
    val docs = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.normText(col("text")).as("t"))
      .collect()
      .map { r =>
        val toks = r.getAs[String]("t").split(" ", -1)
        val nTok = toks.length.toLong
        val nStop = toks.count(graft.ext.TextAnalysis.Stopwords.contains).toLong
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), nTok,
          nStop * 1000000L / math.max(nTok, 1L))
      }
    val budget = docs.map(_._3).sum / 2
    var run = 0L
    val kept = docs.sortBy { case (id, _, _, s) => (-s, id) }.map {
      case (id, src, n, s) =>
        val k = if (run + n <= budget) 1 else 0
        run += n
        (id, src, n, k)
    }
    // NOTE the replay keeps accumulating run over dropped docs too —
    // mirror the operator: prefix is positional, not kept-conditional
    val exp = kept.groupBy(d => (d._2, d._4)).map { case (k, ds) =>
      k -> (ds.length.toLong, ds.map(_._3).sum)
    }
    assert(out.keySet === exp.keySet)
    exp.foreach { case (k, (nd, tk)) =>
      val (gnd, gtk, gb) = out(k)
      assert(gnd === nd && gtk === tk, s"rollup at $k")
      assert(gb === budget)
    }
    // both sides of the cut are populated
    assert(out.keys.exists(_._2 == 1) && out.keys.exists(_._2 == 0))
  }

  test("q297 source ablation: __all__ is the un-ablated fit and one " +
    "source's refit matches an independent exact recompute") {
    val rows = CurationQueries.sourceAblationOls(spark, sf001).collect()
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    val all = bySrc("__all__")
    assert(all.getAs[Long]("delta_beta_micro") == 0L)
    rows.foreach { r =>
      val r2 = r.getAs[Long]("r2_ppm")
      assert(r2 >= 0 && r2 <= 1000000, s"r2 out of range: $r2")
    }
    // independent exact recompute of one ablated fit from doc-level
    // (x, y) sufficient statistics in BigInt arithmetic
    val docs = graft.model.Tables.documents(spark, sf001)
    val t = graft.ext.TextOps.normText(col("text"))
    val toks = graft.ext.TextOps.tokens(t)
    val xy = docs.select(col("source"),
        size(toks).cast("long").as("x"),
        size(array_distinct(toks)).cast("long").as("y"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)),
        BigInt(r.getLong(2))))
    val victim = bySrc.keys.filter(_ != "__all__").min
    val keep = xy.filter(_._1 != victim)
    val n = BigInt(keep.length)
    val sx = keep.map(_._2).sum; val sy = keep.map(_._3).sum
    val sxx = keep.map(c => c._2 * c._2).sum
    val sxy = keep.map(c => c._2 * c._3).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val beta = math.round(num.toDouble / den.toDouble * 1e6)
    assert(bySrc(victim).getAs[Long]("beta_micro") == beta)
    assert(bySrc(victim).getAs[Long]("n_docs_wo") == keep.length.toLong)
  }

  test("q308 sorted batching: sorted never wastes more than the shuffle, " +
      "volumes conserved, replayed by hand") {
    val rows = graft.queries.CurationQueries
      .sortedBatchingReport(spark, sf001).collect()
    assert(rows.length == 6) // 2 strategies x 3 batch sizes
    val byKey = rows.map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val nDocs = byKey.values.head.getAs[Long]("n_docs")
    byKey.values.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs) // every config sees all docs
      assert(r.getAs[Long]("slot_tokens") >= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_batches") ==
        (nDocs + r.getInt(1) - 1) / r.getInt(1))
    }
    // the point of the operator: length-sorted batching wastes no more
    // padding than hash-shuffled batching at every batch size
    Seq(16, 64, 256).foreach { b =>
      val s = byKey(("sorted", b)).getAs[Long]("waste_ppm")
      val h = byKey(("hash_shuffled", b)).getAs[Long]("waste_ppm")
      assert(s <= h, s"sorted waste $s > shuffled $h at batch size $b")
    }
    // independent replay at one batch size from collected lengths
    val lens = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), size(graft.ext.TextOps.tokens(
        graft.ext.TextOps.normText(col("text")))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val sorted = lens.sortBy { case (id, n) => (n, id) }.map(_._2)
    val exp = sorted.grouped(64).map(g => g.max * g.length - g.sum).sum
    val slot = sorted.grouped(64).map(g => g.max * g.length).sum
    val got = byKey(("sorted", 64))
    assert(got.getAs[Long]("slot_tokens") == slot)
    assert(got.getAs[Long]("slot_tokens") - got.getAs[Long]("total_tokens")
      == exp)
  }

  test("q309 domain reweighting: hard sources gain mass, shares " +
      "renormalize, factor replayed by hand") {
    val rows = graft.queries.CurationQueries
      .domainReweighting(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val excess = r.getAs[Long]("excess_micro")
      val factor = r.getAs[Long]("factor_micro")
      assert(factor == math.max(1L, 1000000L + excess)) // the MW rule
      // monotone up to quantization: the normalizer is the share-
      // weighted mean factor, which sits at 1e6 ± flooring slack
      // (nll_bar IS the share-weighted mean), so a positive-excess
      // source gains mass up to a few-ppm floor distortion
      val oldS = r.getAs[Long]("share_ppm")
      val newS = r.getAs[Long]("new_share_ppm")
      if (excess > 0) assert(newS >= oldS - 50,
        s"hard source lost mass: $r")
    }
    // shares renormalize: both columns sum to ~1e6 (floor remainder
    // strictly less than the number of sources)
    val oldTot = rows.map(_.getAs[Long]("share_ppm")).sum
    val newTot = rows.map(_.getAs[Long]("new_share_ppm")).sum
    assert(oldTot > 1000000L - rows.length && oldTot <= 1000000L)
    assert(newTot > 1000000L - rows.length && newTot <= 1000000L)
    // the signal is real on this corpus: at least one source on each
    // side of the corpus mean
    assert(rows.exists(_.getAs[Long]("excess_micro") > 0))
    assert(rows.exists(_.getAs[Long]("excess_micro") < 0))
  }
}
