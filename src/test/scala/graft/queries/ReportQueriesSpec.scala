package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level invariants for the round-6 report queries (q102-q106) —
  * the cross-checks the DuckDB oracle can't express (it compares final
  * values; these pin the semantics the values are supposed to encode).
  */
class ReportQueriesSpec extends SparkSpec {

  test("q102 transition probabilities partition each from_type") {
    val rows = EventWindows.eventTransitions(spark, sf001).collect()
    assert(rows.nonEmpty)
    // Fixed-point floor division loses < 1e-6 per row, so each group's
    // probability mass sums to 1 from below within |group| ulps.
    rows.groupBy(_.getString(0)).foreach { case (from, grp) =>
      val mass = grp.map(_.getAs[Double]("p")).sum
      assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - grp.length * 1e-6,
        s"$from mass=$mass")
    }
    // Every user's stream of m events contributes exactly m-1 transitions.
    val ev = graft.model.Tables.events(spark, sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q183 attribution: hand fixture and model-mass invariants") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "click", 0.0, "{}"),
      (3L, ts(3), 1L, "purchase", 10.0, "{}"),
      (4L, ts(4), 1L, "click", 0.0, "{}"),
      (5L, ts(5), 1L, "purchase", 20.0, "{}"),
      (6L, ts(1), 2L, "purchase", 5.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventWindows.touchAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_journeys"), r.getAs[Double]("attributed_value"))))
      .toMap
    assert(got(("first_touch", "view")) === ((1L, 10.0)))
    assert(got(("first_touch", "click")) === ((1L, 20.0)))
    assert(got(("first_touch", "direct")) === ((1L, 5.0)))
    assert(got(("last_touch", "click")) === ((2L, 30.0)))
    assert(got(("last_touch", "direct")) === ((1L, 5.0)))
    // invariants on the real table: each model credits every purchase
    // exactly once — equal journey counts and equal total value
    val rows = EventWindows.touchAttribution(spark, sf001).collect()
    val models = rows.groupBy(_.getString(0))
    val sums = models.map { case (m, rs) =>
      m -> ((rs.map(_.getAs[Long]("n_journeys")).sum,
        rs.map(_.getAs[Double]("attributed_value")).sum))
    }
    assert(sums("first_touch")._1 == sums("last_touch")._1)
    assert(math.abs(sums("first_touch")._2 - sums("last_touch")._2) < 1e-6)
  }

  test("q184 keep-best agrees with q47 clusters and keeps the longest member") {
    val clusters = DedupQueries.dedupClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val docs = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        length(graft.ext.TextOps.normText(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kb = DedupQueries.dedupKeepBest(spark, sf001).collect()
    assert(kb.map(_.getLong(0)).toSet == byCluster.keySet)
    kb.foreach { r =>
      val members = byCluster(r.getLong(0))
      val kept = r.getAs[Long]("kept_doc")
      assert(members.contains(kept))
      assert(r.getAs[Long]("n_members") == members.size && members.size >= 2)
      val maxLen = members.map(docs).max
      assert(r.getAs[Long]("kept_chars") == maxLen)
      // ties to the SMALLEST doc_id among max-length members
      assert(kept == members.filter(docs(_) == maxLen).min)
      assert(r.getAs[Long]("dropped_chars") ==
        members.map(docs).sum - maxLen)
    }
  }

  test("q289 cluster-size histogram replays from q47 clusters and covers " +
      "the corpus exactly once") {
    val clusters = DedupQueries.dedupClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val toks = graft.model.Tables.documents(spark, sf001)
      .select(col("doc_id"), size(graft.ext.TextOps.tokens(
        graft.ext.TextOps.normText(col("text")))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = DedupQueries.dedupClusterSizes(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // replay every multi-member size row from the cluster membership
    val expect = byCluster.values.toSeq.groupBy(_.size).map { case (s, cs) =>
      s.toLong -> (cs.size.toLong, (s * cs.size).toLong,
        ((s - 1) * cs.size).toLong,
        cs.map(m => m.map(toks).sum - toks(m.min)).sum)
    }
    expect.foreach { case (s, e) => assert(out(s) === e, s"size $s") }
    // singleton row: the corpus spine minus the clustered docs, drops 0
    val nCorpus = toks.size.toLong
    val nClustered = clusters.length.toLong
    assert(out(1L) === ((nCorpus - nClustered, nCorpus - nClustered, 0L, 0L)))
    // partition: every doc counted exactly once across all size rows
    assert(out.values.map(_._2).sum === nCorpus)
    assert(out.keySet === expect.keySet + 1L)
  }

  test("q103 latency report is one ordered row") {
    val r = EventWindows.conversionLatency(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_converted") > 0)
    assert(row.getAs[Double]("p50_sec") <= row.getAs[Double]("p90_sec"))
    assert(row.getAs[Double]("p90_sec") <= row.getAs[Long]("max_sec").toDouble)
  }

  test("q104 ABC classes are contiguous down the revenue order") {
    val rows = WarehouseAnalytics.paretoAbc(spark, sf001).collect()
    val classes = rows.map(_.getAs[String]("abc_class"))
    // Cumulative share never decreases and the class sequence is a
    // partition A* B* C* — a supplier can never out-rank its class.
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(classes.mkString.matches("A*B*C*"))
    assert(math.abs(shares.last - 1.0) < 1e-5)
    // Boundary semantics: every A row is still inside 80% + one row.
    rows.filter(_.getAs[String]("abc_class") == "A")
      .foreach(r => assert(r.getAs[Double]("cum_share") <= 0.8 + 1e-6))
  }

  test("q105 recall@3 stays above the LSH quality floor") {
    val rows = SimilarityQueries.annRecall(spark, sf001).collect()
    assert(rows.length == 10) // one row per query vector
    rows.foreach { r =>
      assert(r.getAs[Int]("k_eff") == 3)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= 3)
    }
    // Regression floor: the 4-plane sign-LSH tier recovers 5/30 of the
    // exact top-3 on the sf0.001 fixtures (avg recall 0.1667). A change
    // that halves the tier's quality (e.g. a broken bucket hash sending
    // queries to empty buckets) lands at <= 0.083 and fails here.
    val avg = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(avg >= 0.1, s"avg recall@3 $avg below 0.1 floor")
  }

  test("q107 %K stays inside the channel it measures") {
    val rows = MarketAnalytics.stochasticOscillator(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi, k) = (r.getAs[Double]("o_totalprice"),
        r.getAs[Double]("low_n"), r.getAs[Double]("high_n"),
        r.getAs[Double]("pct_k"))
      assert(lo <= p + 1e-9 && p <= hi + 1e-9)
      assert(k >= 0.0 && k <= 100.0)
      if (p == hi && hi > lo) assert(k == 100.0)
      if (p == lo && hi > lo) assert(k == 0.0)
    }
  }

  test("q108 OBV steps by exactly the row's quantity or holds") {
    val rows = MarketAnalytics.onBalanceVolume(spark, sf001).collect()
      .groupBy(_.getAs[Long]("l_suppkey"))
    rows.values.foreach { grp =>
      // collected rows keep the query's (date, orderkey, linenumber) order
      grp.sliding(2).foreach {
        case Array(a, b) =>
          val step = math.abs(b.getAs[Double]("obv") - a.getAs[Double]("obv"))
          val qty = b.getAs[Double]("l_quantity")
          assert(math.abs(step) < 1e-9 || math.abs(step - qty) < 1e-9,
            s"obv stepped $step against qty $qty")
        case _ =>
      }
    }
  }

  test("q109 weekday report partitions the order count") {
    val rows = MarketAnalytics.weekdaySeasonality(spark, sf001).collect()
    assert(rows.map(_.getAs[Int]("iso_dow")).toSeq.sorted == (1 to 7))
    val total = graft.model.Tables.orders(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
  }

  test("q110 novelty counts the df=1 shingles exactly") {
    val rows = DedupQueries.shingleNovelty(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, s) = (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))
      assert(novel >= 0 && novel <= n)
      assert(s >= 0.0 && s <= 1.0)
    }
    // global cross-check: Σ n_novel = number of shingles with df = 1
    val sh = graft.ext.TextDedup.docWordShingleHashes(
      graft.model.Tables.documents(spark, sf001), "doc_id", "text")
    val singletons = sh.groupBy("hv").count().filter(col("count") === 1).count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == singletons)
  }

  test("q111 shares partition each source; q112 fertility >= 1") {
    val mix = TextQueries.langSourceMix(spark, sf001).collect()
    mix.groupBy(_.getAs[String]("source")).foreach { case (src, grp) =>
      val mass = grp.map(_.getAs[Double]("share")).sum
      assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - grp.length * 1e-6,
        s"$src mass=$mass")
    }
    assert(mix.map(_.getAs[Long]("n_docs")).sum ==
      graft.model.Tables.documents(spark, sf001).count())
    // the BPE-ish pattern emits at least one piece per whitespace token
    TextQueries.tokenFertility(spark, sf001).collect().foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("q113 autocorr is a single bounded scalar") {
    val r = WarehouseAnalytics.revenueAutocorr(spark, sf001).collect()
    assert(r.length == 1)
    val ac = r.head.getAs[Double]("autocorr")
    assert(ac >= -1.0 && ac <= 1.0)
    assert(r.head.getAs[Long]("n_pairs") > 0)
  }

  test("q114 transit windows are bounded and counts positive") {
    val rows = WarehouseAnalytics.transitOverlap(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val days = (r.getDate(4).toLocalDate.toEpochDay
        - r.getDate(3).toLocalDate.toEpochDay).toInt
      assert(days >= 1 && days <= 14, s"window length $days out of range")
      assert(r.getAs[Long]("n_in_window") >= 1)
    }
  }

  test("q115 SCD2 intervals chain and exactly one current row per key") {
    val rows = MarketAnalytics.scd2History(spark, sf001).collect()
    assert(rows.length == graft.model.Tables.orders(spark, sf001).count())
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { grp =>
      assert(grp.count(_.getAs[Int]("is_current") == 1) == 1)
      // collected rows keep (valid_from, orderkey) order: each row's
      // valid_to is the next row's valid_from, last is open-ended
      grp.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Date]("valid_to") ==
            b.getAs[java.sql.Date]("valid_from"))
        case _ =>
      }
      assert(grp.last.getAs[java.sql.Date]("valid_to") == null)
    }
  }

  test("q116 propagation conserves mass up to floor losses") {
    val rows = GraphAnalytics.copurchaseRank(spark, sf001).collect()
    assert(rows.nonEmpty)
    val units = rows.map(_.getAs[Long]("score_units"))
    // every supplier injects 1e6 micro-units; two floor-division hops
    // only ever LOSE mass, never create it
    assert(units.sum <= rows.length * 1000000L)
    assert(units.sum > rows.length * 1000000L / 2, "over half the mass vanished")
    assert(units.zip(units.tail).forall { case (a, b) => a >= b })
  }

  test("q117 CMS never underestimates and ranks the exact head") {
    val rows = TextQueries.cmsHeavyHitters(spark, sf001).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    rows.foreach { r =>
      // the count-min guarantee: estimate >= exact count, always
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"))
      assert(r.getAs[Long]("over") == r.getAs[Long]("est") - r.getAs[Long]("n"))
    }
    // exact counts are non-increasing down the rank order
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q118 decay never exceeds lifetime and newest orders keep full value") {
    val rows = WarehouseAnalytics.decayedRevenue(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (life, dec) = (r.getAs[Double]("lifetime_rev"),
        r.getAs[Double]("decayed_rev"))
      assert(dec <= life + 1e-9)
      assert(dec > 0.0) // cap at age 9 keeps >= 1/512 of every order
    }
    val scores = rows.map(_.getAs[Double]("decayed_rev"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q119 fuzzy pairs: similarity bounds and zero-distance identity") {
    val rows = DedupQueries.fuzzyPairs(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, s) = (r.getAs[Int]("dist"), r.getAs[Double]("similarity"))
      assert(d >= 0 && s >= 0.0 && s <= 1.0)
      if (d == 0) assert(s == 1.0)
      if (s == 1.0) assert(d == 0)
    }
  }

  test("q120 session paths partition the session count") {
    val rows = EventWindows.sessionPaths(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    rows.foreach(r => assert(r.getAs[String]("path").nonEmpty))
    // the top paths can never hold more sessions than exist
    val totalSessions = EventWindows.sessionize(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum <= totalSessions)
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q121 same-nation revenue is a subset of total revenue") {
    val rows = WarehouseAnalytics.localSupplierVolume(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_items") > 0)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
    val regions = rows.map(_.getAs[String]("r_name")).toSet
    val allRegions = graft.model.Tables.region(spark, sf001)
      .select("r_name").collect().map(_.getString(0)).toSet
    assert(regions.subsetOf(allRegions))
  }

  test("q122 sole-blame counts stay within each supplier's late orders") {
    val rows = WarehouseAnalytics.soleBlameSuppliers(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_sole_blame_orders") >= 1))
  }

  test("q123 each grouping set re-aggregates to the grand total") {
    val rows = WarehouseAnalytics.segmentPrioritySets(spark, sf001).collect()
    val grand = rows.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_orders")
    // both one-dimension marginals partition the same order count; the
    // 2-D cell a cube would add is deliberately absent
    Seq(1, 2).foreach { gid =>
      assert(rows.filter(_.getAs[Int]("gid") == gid)
        .map(_.getAs[Long]("n_orders")).sum == total, s"gid=$gid")
    }
    assert(rows.map(_.getAs[Int]("gid")).toSet == Set(1, 2, 3))
  }

  test("q162 curation funnel is monotone and its bins cover the token mass") {
    val rows = graft.queries.CurationQueries.curationPipeline(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (in, q, d, f) = (r.getAs[Long]("n_input"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_dedup"), r.getAs[Long]("n_final"))
      assert(in >= q && q >= d && d >= f && f >= 0,
        s"funnel not monotone for ${r.getAs[String]("source")}: $in/$q/$d/$f")
    }
    // the packed bins must cover the final token mass at 2048/bin
    val totTok = rows.map(_.getAs[Long]("sum_tokens_final")).sum
    val bins = rows.head.getAs[Long]("n_bins_global")
    assert(bins >= (totTok + 2048 - 1) / 2048 - 1 || totTok == 0,
      s"bins=$bins cannot hold $totTok tokens")
  }

  test("q158 weighted median sits inside each supplier's price range; q159 shares bounded") {
    val med = WarehouseAnalytics.weightedMedianPrice(spark, sf001).collect()
    assert(med.nonEmpty)
    med.foreach(r => assert(r.getAs[Double]("weighted_median_price") > 0))
    val modal = WarehouseAnalytics.modalPriority(spark, sf001).collect()
    assert(modal.nonEmpty)
    modal.foreach { r =>
      val bp = r.getAs[Int]("share_bp")
      // 5 priorities: the mode holds at least 1/5 and never everything
      assert(bp >= 2000 - 1500 && bp <= 10000, s"share_bp=$bp")
      assert(r.getAs[Long]("n_top") * 5 + 5 >= r.getAs[Long]("n_orders"),
        "mode smaller than a uniform split allows")
    }
  }

  test("q106 flags only rows beyond 3 robust sigmas") {
    val rows = WarehouseAnalytics.robustAnomalies(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("robust_score")) > 3.0))
    // The detector must not flag the bulk of the distribution: flagged
    // days are a strict minority of all traded days.
    val nDays = graft.model.Tables.orders(spark, sf001)
      .select(col("o_orderdate").cast("date")).distinct().count()
    assert(rows.length < nDays / 2)
  }

  test("q190 rolling MAD: window stats bound the row and anomalies are rare") {
    val rows = WarehouseAnalytics.revenueAnomaly(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, px, med, mad) = (r.getAs[Int]("n_window"), r.getAs[Long]("px"),
        r.getAs[Long]("med"), r.getAs[Long]("mad"))
      assert(n >= 7 && n <= 15)
      assert(mad >= 0 && med > 0)
      // the flag must agree with its own reported statistics
      val flagged = r.getAs[Int]("is_anomaly") == 1
      assert(flagged == (math.abs(px - med) > 5 * mad))
    }
    // 5 MADs is a rare-event threshold: flags are a small minority
    val flagged = rows.count(_.getAs[Int]("is_anomaly") == 1)
    assert(flagged < rows.length / 10)
  }

  test("q194 scd2 runs: versions partition the stream, ranges chain, one current") {
    val rows = MarketAnalytics.scd2RunHistory(spark, sf001).collect()
    assert(rows.nonEmpty)
    // runs partition the order stream exactly
    val nOrders = graft.model.Tables.orders(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (ck, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      // versions are contiguous from 1
      assert(sorted.map(_.getAs[Int]("version")).toSeq ==
        (1 to sorted.length).toSeq, s"cust $ck versions not contiguous")
      // exactly one open (current) range, and it is the last
      assert(sorted.count(_.getAs[Int]("is_current") == 1) == 1)
      assert(sorted.last.getAs[Int]("is_current") == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // adjacent runs differ in value (else they'd be one run) and
          // each range closes at its successor's start
          assert(a.getAs[String]("priority") != b.getAs[String]("priority"))
          assert(a.getAs[java.sql.Date]("valid_to") ==
            b.getAs[java.sql.Date]("valid_from"))
        case _ => ()
      }
    }
  }

  test("q195 frequent triples: supports bounded by item supports, ranks contiguous") {
    val rows = WarehouseAnalytics.frequentTriples(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    // every member item must itself clear the A-priori support prune,
    // and a triple can never be more frequent than its rarest item
    val itemSupport = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val items = Seq(r.getAs[Long]("i1"), r.getAs[Long]("i2"), r.getAs[Long]("i3"))
      assert(items == items.sorted && items.distinct.size == 3)
      val s = r.getAs[Long]("support")
      items.foreach { i =>
        assert(itemSupport(i) >= 2, s"item $i below the prune in output")
        assert(s <= itemSupport(i), s"triple support $s exceeds item $i's")
      }
    }
    // supports are reported in non-increasing rank order
    val supports = rows.map(_.getAs[Long]("support")).toSeq
    assert(supports.zip(supports.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q193 rolling actives: WAU dominates DAU and window arithmetic holds") {
    val rows = EventWindows.rollingActiveUsers(spark, sf001).collect()
    assert(rows.nonEmpty)
    val dau = rows.map(r => r.getAs[java.sql.Date]("day").toLocalDate ->
      r.getAs[Long]("dau")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val (dv, wv) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      // a user active today is active this window; a window user count
      // can never exceed the sum of its days' counts
      assert(wv >= dv)
      val windowSum = (0 until 7).map(i => dau.getOrElse(d.minusDays(i), 0L)).sum
      assert(wv <= windowSum, s"$d: wau=$wv > Σdau=$windowSum")
    }
    // exact cross-check on one day against a direct distinct count
    val last = rows.last
    val d = last.getAs[java.sql.Date]("day").toLocalDate
    val direct = graft.model.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .filter(col("day") > lit(java.sql.Date.valueOf(d.minusDays(7))) &&
        col("day") <= lit(java.sql.Date.valueOf(d)))
      .select("user_id").distinct().count()
    assert(last.getAs[Long]("wau") == direct)
  }
}
