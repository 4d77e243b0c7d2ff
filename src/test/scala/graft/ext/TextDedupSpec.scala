package graft.ext

import graft.SparkSpec

/** Dedup tiers against a corpus with known structure: exact copies, a
  * near-dup pair (one word changed), and unrelated documents. Every tier
  * must find the planted structure and nothing else.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches the " +
      "birds fly south for winter and the river runs cold past the old mill"
  private val nearDup = base.replace("cold", "warm")
  private val unrelated =
    "completely different content about database engines columnar storage " +
      "vectorized execution query optimizers and distributed shuffle joins"

  private def corpus = Seq(
    (0L, base), (1L, "  " + base.toUpperCase + "  "), // exact dup after normalize
    (2L, nearDup), (3L, unrelated)
  ).toDF("doc_id", "text")

  test("exactGroups merges normalization-equal docs") {
    val out = TextDedup.exactGroups(corpus, "doc_id", "text")
      .orderBy("rep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngramJaccardPairs finds the near-dup pair and the exact pair only") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.5)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("containment catches a subset document that Jaccard misses") {
    // Doc 11 is a strict prefix (about a third) of doc 10: its shingles
    // are fully contained, so contain(B) ≈ 1 — but the union is
    // dominated by the long side, so Jaccard stays far below any
    // near-dup threshold. The asymmetric tier must emit the pair; the
    // symmetric tier must not.
    val filler = "meanwhile distant mountains echo with ancient songs of " +
      "travelers crossing frozen passes under pale morning light"
    val long = base + " " + filler + " " + base.replace("fox", "hare")
    val short = long.split(" ").take(long.split(" ").length / 3).mkString(" ")
    val docs = Seq((10L, long), (11L, short), (12L, unrelated)).toDF("doc_id", "text")
    val cont = TextDedup.ngramContainmentPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(6)))
    assert(cont.map(p => (p._1, p._2)).toSeq == Seq((10L, 11L)))
    assert(cont.head._3 == 1.0) // contain_b: every short-side shingle is in the long doc
    val jac = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) == 10L && r.getLong(1) == 11L))
  }

  test("crossSourceLeakage rolls near-dup pairs up per source pair") {
    // Near-dups planted across (web, books) and inside web; only the
    // cross-source pair may appear, keyed by the ordered source pair.
    val docs = Seq(
      (0L, base, "web"), (1L, nearDup, "books"),        // cross-source near-dup
      (2L, unrelated, "web"), (3L, unrelated + " x", "web"), // same-source near-dup
      (4L, "entirely disjoint text about gardens and bees and hives", "forums")
    ).toDF("doc_id", "text", "source")
    val out = TextDedup.crossSourceLeakage(docs, "doc_id", "text", "source",
        k = 8, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("books", "web", 1L, 0L, 1L)))
  }

  test("minhashLshPairs surfaces the same near-dup structure") {
    val pairs = TextDedup.minhashLshPairs(corpus, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))          // identical → always collides
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never
  }

  test("identical docs have identical minhash band hashes") {
    val bands = TextDedup.minhashBands(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach { b =>
      assert(bands((0L, b)) == bands((1L, b)))
    }
  }

  test("scan-side minhash bands == groupBy-min signature over the index") {
    val texts = Seq("", "abc", "abcdefgh", "abcdefghi",
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa") ++
      (0 until 30).map(i => s"doc $i body with shared words and tail token$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val native = asMap(TextDedup.minhashBands(docs, "doc_id", "text"))
    val viaAgg = asMap(TextDedup.minhashBandsFromIndex(
      TextDedup.docShingleHashes(docs, "doc_id", "text")))
    assert(native == viaAgg)
  }

  test("scan-side simhash fingerprints == vote-aggregation formulation") {
    val texts = Seq("", "one", "one two", "one two three",
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 30).map(i => s"doc $i body with shared words and tail token$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = asMap(TextDedup.simhashFingerprints(docs, "doc_id", "text"))
    val viaAgg = asMap(TextDedup.simhashFingerprintsAgg(docs, "doc_id", "text"))
    assert(native == viaAgg) // docs with <2 tokens absent from BOTH
    assert(!native.contains(0L) && !native.contains(1L))
  }

  test("df-cap drops hot shingles from sizes AND intersections") {
    // Six docs share only a boilerplate phrase (its two trigrams reach
    // df=8 > maxDf=4); docs 10/11 are true near-dups that ALSO carry the
    // boilerplate. The cap must (a) kill the boilerplate-only pairs
    // entirely and (b) change the surviving pair's jaccard, because both
    // its size and intersection shrink by the two hot shingles.
    val docs = ((0 until 6).map(i => (i.toLong, s"alpha beta gamma delta filler$i")) ++
      Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
          (11L, "alpha beta gamma delta epsilon zeta eta iota"))).toDF("doc_id", "text")
    val uncapped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncapped.size == 16)              // C(6,2) boilerplate pairs + (10,11)
    assert(uncapped((10L, 11L)) == 0.7143)   // 5 shared / 7 union trigrams
    val capped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped == Map((10L, 11L) -> 0.6)) // 3 shared / 5 union after the cap
  }

  test("LSH pairs == exact char-8-gram tier at threshold 0.8 (driver fixture)") {
    // The cluster operator (q47) sources edges from the LSH candidate
    // tier; this pins the claim that at threshold 0.8 (above the 4×4
    // banding s-curve midpoint ≈0.7) candidate recall against the exact
    // inverted-index tier is total on the driver corpus.
    val docs = graft.model.Tables.documents(spark, sf001)
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text", k = 8,
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextDedup.jaccardPairs(
        TextDedup.docShingleHashes(docs, "doc_id", "text", k = 8), "hv",
        threshold = 0.8, maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("incremental exact dedup assigns known hashes and groups fresh ones") {
    val state0 = TextDedup.exactState(corpus, "doc_id", "text")
    val batch = Seq(
      (10L, base),                // exact copy of doc 0 → joins its group
      (11L, "brand new text one"), (12L, "brand new text one"), // new group
      (13L, "another singleton")
    ).toDF("doc_id", "text")
    val (asg, state1) = TextDedup.exactGroupsIncremental(state0, batch,
      "doc_id", "text")
    val m = asg.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(m(10L) == ((0L, 0)))   // existing group, rep stays doc 0
    assert(m(11L) == ((11L, 1)))  // new group headed by min batch id
    assert(m(12L) == ((11L, 0)))
    assert(m(13L) == ((13L, 1)))
    // extended state now resolves a copy of the NEW group's text
    val (asg2, _) = TextDedup.exactGroupsIncremental(state1,
      Seq((20L, "brand new text one")).toDF("doc_id", "text"), "doc_id", "text")
    assert(asg2.collect()(0).getLong(1) == 11L)
  }

  test("incremental minhash == full run restricted to batch-touching pairs") {
    val batch = Seq(
      (10L, base),                       // near-dups doc 0/1/2 from the corpus
      (11L, "totally fresh content about streaming watermarks and state stores")
    ).toDF("doc_id", "text")
    val union = corpus.unionByName(batch)
    val full = TextDedup.minhashLshPairs(union, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = full.filter { case ((a, b), _) => a >= 10L || b >= 10L }

    val state0 = TextDedup.minhashState(corpus, "doc_id", "text")
    val (pairs, state1) = TextDedup.minhashLshIncremental(state0, batch,
      "doc_id", "text", threshold = 0.5)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.contains((0L, 10L)))      // batch doc linked into the corpus

    // second increment from the extended state: an exact copy of doc 10
    val batch2 = Seq((20L, base)).toDF("doc_id", "text")
    val (pairs2, _) = TextDedup.minhashLshIncremental(state1, batch2,
      "doc_id", "text", threshold = 0.5)
    val got2 = pairs2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2.contains((10L, 20L)) && got2.contains((0L, 20L)))
    assert(got2.forall { case (a, b) => a == 20L || b == 20L })
  }

  test("contaminationReport scores train docs by benchmark shingle overlap") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),       // verbatim copy
      (2L, "the quick brown fox went somewhere else entirely"),  // partial overlap
      (3L, "completely unrelated words about cooking pasta")     // none
    ).toDF("doc_id", "text")
    val got = TextDedup.contaminationReport(train, bench, "doc_id", "text",
        k = 8, flagFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    val (n1, c1, f1, flag1) = got(1L)
    assert(n1 == c1 && f1 == 1.0 && flag1 == 1)   // full contamination
    val (_, c2, f2, flag2) = got(2L)
    assert(c2 > 0 && f2 > 0.0 && f2 < 0.5 && flag2 == 0)
    assert(got(3L)._2 == 0L && got(3L)._4 == 0)
  }

  test("dupPassages finds a boilerplate span embedded in distinct docs") {
    val boiler = (1 to 6).map(i => s"common$i").mkString(" ") // 6-token span
    val docs = Seq(
      (1L, s"intro one $boiler outro alpha"),
      (2L, s"different opening here $boiler and a tail"),
      (3L, "no shared span in this document at all whatsoever truly")
    ).toDF("doc_id", "text")
    val got = TextDedup.dupPassages(docs, "doc_id", "text", n = 6, minDocs = 2)
      .collect()
    assert(got.length == 1)                      // exactly the boilerplate span
    assert(got(0).getAs[Long]("n_docs") == 2L)
    assert(got(0).getAs[Long]("first_doc") == 1L)
  }

  test("kmv set-ops: exact below k, estimates near truth above k") {
    // two sources sharing exactly half their documents' content: A holds
    // docs 0..59, B holds 30..89 — the shingle sets overlap substantially
    def txt(i: Int) = s"document body number $i with some shared words " +
      s"and unique tail ${i * 31} ${i * 17} filler filler"
    val docs = ((0 until 60).map(i => (i.toLong, "A", txt(i))) ++
        (30 until 90).map(i => (i.toLong + 1000, "B", txt(i))))
      .toDF("doc_id", "source", "text")
    val got = TextDedup.kmvSourceSetOps(docs, "source", "text", k = 128)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    // ground truth from the exact distinct shingle sets
    def shingles(lo: Int, hi: Int): Set[String] = (lo until hi).flatMap { i =>
      val t = txt(i).toLowerCase.trim.replaceAll("\\s+", " ")
      (0 to t.length - 8).map(j => t.substring(j, j + 8))
    }.toSet
    val (sa, sb) = (shingles(0, 60), shingles(30, 90))
    val (u, ix) = (sa ++ sb, sa intersect sb)
    def close(est: Long, truth: Int): Unit =
      assert(math.abs(est - truth) <= truth / 4 + 10,
        s"estimate $est too far from $truth")
    close(r.getAs[Long]("est_distinct_a"), sa.size)
    close(r.getAs[Long]("est_distinct_b"), sb.size)
    close(r.getAs[Long]("est_union"), u.size)
    close(r.getAs[Long]("est_inter"), ix.size)
    // small-source regime: fewer distinct shingles than k => EXACT
    val tiny = Seq((1L, "X", "abcdefghij"), (2L, "Y", "abcdefghij klm"))
      .toDF("doc_id", "source", "text")
    val t = TextDedup.kmvSourceSetOps(tiny, "source", "text", k = 128)
      .collect()(0)
    assert(t.getAs[Long]("est_distinct_a") == 3L)  // 10 chars -> 3 shingles
    assert(t.getAs[Long]("est_union") == t.getAs[Long]("est_distinct_b"))
    assert(t.getAs[Long]("est_inter") == 3L)       // X's shingles all in Y
  }

  test("simhash: exact dup at Hamming 0; unrelated far away") {
    val fps = TextDedup.simhashFingerprints(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(1L))
    assert(java.lang.Long.bitCount(fps(0L) ^ fps(3L)) > 3)
    val pairs = TextDedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("sorted-neighborhood finds the planted structure, rejects the unrelated") {
    // exact dups share a fingerprint (adjacent in any sort order), the
    // near-dup differs by one vote — the planted cluster sits inside a
    // window of 4 whenever its docs land in one block
    val pairs = TextDedup.sortedNeighborhoodPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0)
    assert(pairs.keySet.forall { case (a, b) => a < b && b != 3L && a != 3L })
  }

  test("sorted-neighborhood candidate volume is flat in cluster size") {
    // m identical docs: banding schemes generate C(m,2) candidates;
    // SNM must emit only the (window-1)-bounded neighbor pairs per doc.
    val m = 40
    val clones = (0L until m.toLong).map(i => (i, base)).toDF("doc_id", "text")
    val n = TextDedup.sortedNeighborhoodPairs(clones, "doc_id", "text",
      window = 4).count()
    // identical fingerprints sort by doc_id: each doc pairs with its
    // next 3 ids, clipped at the tail: 3m - 6 pairs, never C(m,2)
    assert(n == 3 * m - 6, s"expected ${3 * m - 6} flat candidates, got $n")
  }

  test("dedupTierMatrix: exact dup hits all tiers, near-dup the fuzzy two") {
    val docs = Seq(
      (0L, base), (1L, "  " + base.toUpperCase + "  "), // exact dup of 0
      (2L, nearDup),                                    // near-dup of 0/1
      (3L, unrelated)                                   // clean
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupTierMatrix(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // doc 1 (the exact copy, higher id) is dropped by every tier: the
    // identical text shares all shingles (J = 1) and the fingerprint
    assert(out((1, 1, 1)) === ((1L, 1L)))
    // doc 2 (one word changed): never an exact drop; the fuzzy tiers
    // both catch it (J ≈ 0.9 > 0.8; one-feature fingerprint flip ≤ 3)
    assert(out((0, 1, 1)) === ((1L, 2L)))
    // docs 0 and 3 are kept by every tier
    assert(out((0, 0, 0))._1 === 2L)
    assert(out.values.map(_._1).sum === 4L)
  }

  private def normToks(s: String): Array[String] =
    s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")

  test("lineDedup replays the CCNet line scrub positionally") {
    // Lines are stride-4 token windows. Planted structure: "a b c d"
    // shared by docs 0/1 and twice within doc 3 (df counts DISTINCT
    // docs; removal counts occurrences); "e f g h" shared by 0/2;
    // everything else unique. Doc 4 (source t) is untouched.
    val docs = Seq(
      (0L, "a b c d e f g h x", "s"),
      (1L, "a b c d q r s t", "s"),
      (2L, "z z z z e f g h", "s"),
      (3L, "a b c d a b c d", "s"),
      (4L, "p q r s t u v w", "t")
    ).toDF("doc_id", "text", "source")
    // Independent Scala replay of the definition.
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(2), normToks(r.getString(1))))
    val lineOcc = rows.flatMap { case (id, src, ts) =>
      (0 to ts.length - 4 by 4).map(i =>
        (id, src, ts.slice(i, i + 4).mkString(" ")))
    }
    val boiler = lineOcc.map { case (id, _, l) => (l, id) }.distinct
      .groupBy(_._1).filter(_._2.length >= 2).keySet
    val expected = rows.map { case (id, src, ts) =>
      val mine = lineOcc.filter(_._1 == id)
      val removed = mine.count(o => boiler(o._3))
      (id, src, ts.length.toLong, mine.length.toLong, removed.toLong)
    }
    val expBySrc = expected.groupBy(_._2).map { case (src, ds) =>
      src -> (ds.length.toLong, ds.count(_._5 > 0).toLong,
        ds.map(_._4).sum, ds.map(_._5).sum, ds.map(_._3).sum,
        ds.map(d => d._3 - d._5 * 4).sum)
    }
    val out = TextDedup.lineDedup(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == expBySrc.keySet)
    expBySrc.foreach { case (src, e) => assert(out(src) == e, s"src=$src") }
    // Sanity on the planted values: boiler lines are exactly the two.
    assert(boiler == Set("a b c d", "e f g h"))
    assert(out("s") == (4L, 4L, 8L, 6L, 33L, 9L))
    assert(out("t") == (1L, 0L, 2L, 0L, 8L, 8L))
  }

  test("crossDocSpanScrub replays the Lee-style covered-position union") {
    // Pair tier from the operator's own LSH machinery (the replay takes
    // the emitted pairs as given and recomputes the positional cover
    // exactly): exact dup 0/1 → full cover; 2 = one word changed → all
    // positions except those ONLY coverable by a 4-gram containing the
    // changed token; 3 unrelated → untouched.
    val docs = Seq(
      (0L, base, "s"), (1L, base, "s"), (2L, nearDup, "s"),
      (3L, unrelated, "s")
    ).toDF("doc_id", "text", "source")
    val pairs = TextDedup
      .minhashLshPairs(docs, "doc_id", "text", k = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), "exact pair must be in the tier")
    val toks = docs.collect()
      .map(r => r.getLong(0) -> normToks(r.getString(1))).toMap
    def grams(ts: Array[String]): IndexedSeq[String] =
      (0 to ts.length - 4).map(i => ts.slice(i, i + 4).mkString(" "))
    val directed = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val removed: Map[Long, Long] = directed.groupBy(_._1).map {
      case (victim, ps) =>
        val g = grams(toks(victim))
        val cover = ps.map(_._2).flatMap { partner =>
          val pg = grams(toks(partner)).toSet
          g.indices.filter(i => pg(g(i))).flatMap(i => i to i + 3)
        }.toSet
        victim -> cover.size.toLong
    }
    val expTokens = toks.values.map(_.length.toLong).sum
    val expRemoved = removed.values.sum
    val out = TextDedup
      .crossDocSpanScrub(docs, "doc_id", "text", "source", n = 4, k = 8,
        threshold = 0.5)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 4L) // n_docs
    assert(r.getLong(2) == directed.map(_._1).distinct.length.toLong)
    assert(r.getLong(3) == removed.count(_._2 > 0).toLong)
    assert(r.getLong(4) == expTokens)
    assert(r.getLong(5) == expTokens - expRemoved)
    assert(r.getLong(6) == (expRemoved * 1000000L) / expTokens)
    // The exact-dup docs are fully covered: the scrub sees the whole doc.
    assert(removed(0L) == toks(0L).length.toLong)
  }

  test("exactSubstringScrub: covered-position union at the minLen contract") {
    // Planted structure at minLen = 5 (the operator's 50 shrunk so short
    // fixtures exercise every branch; the contract is length-generic):
    //  - docs 0/1 share the 6-token run "a b c d e f" → two duplicated
    //    5-grams; union covers positions 0..5 in doc 0 and 2..7 in doc 1
    //    (6 tokens each, OVERLAPPING gram spans must not double-count).
    //  - doc 2 is unique → zero removed.
    //  - doc 3 repeats its own leading 5-gram at position 5 → WITHIN-doc
    //    duplication counts (Lee et al. dedup both): all 10 positions.
    val docs = Seq(
      (0L, "a b c d e f g h i j", "sa"),
      (1L, "x y a b c d e f q r", "sa"),
      (2L, "u v w t y z k l", "sb"),
      (3L, "m n o p q m n o p q", "sb")
    ).toDF("doc_id", "text", "source")
    val out = TextDedup
      .exactSubstringScrub(docs, "doc_id", "text", "source", minLen = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // sa: 2 docs, both affected, 20 tokens, 6+6 covered → 8 survive.
    assert(out("sa") === ((2L, 2L, 20L, 8L, 600000L)))
    // sb: 2 docs, only doc 3 affected (all 10 positions), 18 before.
    assert(out("sb") === ((2L, 1L, 18L, 8L, (10L * 1000000L) / 18L)))
  }

  test("exactSubstringScrub: docs shorter than minLen are never covered") {
    // Every doc is under the 50-token contract length → the position
    // stream is empty and nothing can be marked, even exact duplicates.
    val docs = Seq(
      (0L, base, "s"), (1L, base, "s"), (2L, unrelated, "s")
    ).toDF("doc_id", "text", "source")
    val r = TextDedup
      .exactSubstringScrub(docs, "doc_id", "text", "source", minLen = 50)
      .collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) == 0L)                    // n_affected
    assert(r.head.getLong(3) == r.head.getLong(4))     // before == after
    assert(r.head.getLong(5) == 0L)                    // removed_ppm
  }

  test("exactSubstringKeepFirst: exactly one keeper per span group, " +
      "union accounting conserved vs remove-all") {
    // Same planted structure as the remove-all spec (minLen = 5):
    //  - docs 0/1 share "a b c d e f": keep-first retains doc 0's two
    //    gram occurrences (positions 0,1 — smallest (doc_id, pos)),
    //    scrubs doc 1's (positions 2,3 → covered 2..7).
    //  - doc 3 self-repeats its leading 5-gram: the position-5
    //    occurrence is scrubbed (covers 5..9), position 0 kept.
    val docs = Seq(
      (0L, "a b c d e f g h i j", "sa"),
      (1L, "x y a b c d e f q r", "sa"),
      (2L, "u v w t y z k l", "sb"),
      (3L, "m n o p q m n o p q", "sb")
    ).toDF("doc_id", "text", "source")
    val out = TextDedup
      .exactSubstringKeepFirst(docs, "doc_id", "text", "source", minLen = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // sa: only doc 1 affected; 6 positions covered; doc 0 keeps both
    // duplicated grams (2 keepers), doc 1 contributes 2 scrubbed occs.
    assert(out("sa") === ((2L, 1L, 20L, 14L, 300000L, 2L, 2L)))
    // sb: doc 3's second occurrence scrubbed (5 positions), 1 keeper.
    assert(out("sb") === ((2L, 1L, 18L, 13L, (5L * 1000000L) / 18L, 1L, 1L)))
    // remove-all comparison: keep-first always retains at least as much
    val all = TextDedup
      .exactSubstringScrub(docs, "doc_id", "text", "source", minLen = 5)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    out.foreach { case (s, v) =>
      assert(v._4 >= all(s), s"source $s: keep-first retained less " +
        s"than remove-all (${v._4} < ${all(s)})")
    }
  }

  test("exactSubstringKeepFirst at sf0.001: conservation vs q290 and " +
      "one keeper per group") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val keep = TextDedup.exactSubstringKeepFirst(docs, "doc_id", "text",
        "source", minLen = 50).collect()
      .map(r => r.getString(0) -> r).toMap
    val all = TextDedup.exactSubstringScrub(docs, "doc_id", "text",
        "source", minLen = 50).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(keep.keySet == all.keySet)
    keep.foreach { case (s, kr) =>
      val ar = all(s)
      assert(kr.getAs[Long]("tokens_before") ==
        ar.getAs[Long]("tokens_before"))
      assert(kr.getAs[Long]("tokens_after") >= ar.getAs[Long]("tokens_after"),
        s"source $s: keep-first removed more than remove-all")
      assert(kr.getAs[Long]("n_affected") <= ar.getAs[Long]("n_affected"))
    }
    // occurrence accounting: every duplicated span group has >= 1
    // scrubbed occurrence for its 1 keeper, corpus-wide
    val kept = keep.values.map(_.getAs[Long]("n_kept_occ")).sum
    val dup = keep.values.map(_.getAs[Long]("n_dup_occ")).sum
    assert(kept > 0 && dup >= kept,
      s"occurrence accounting broken: kept=$kept dup=$dup")
  }

  test("q302 split-leakage cells equal a brute recombination of q34 + q52") {
    val rows = graft.queries.DedupQueries.splitLeakageAudit(spark, sf001)
      .collect()
    assert(rows.length == 6, "the 6-cell split-pair spine must be complete")
    // brute: recombine the registered pair tier with the registered split
    val pairs = graft.queries.DedupQueries.dedupMinhashLsh(spark, sf001)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val split = graft.ext.Sampling.hashSplit(
        graft.model.Tables.documents(spark, sf001).select("doc_id"),
        "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    val brute = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (Seq(sa, sb).min, Seq(sa, sb).max)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("split_lo"), r.getAs[String]("split_hi"))
      assert(r.getAs[Long]("n_pairs") == brute.getOrElse(key, 0L),
        s"cell $key disagrees with brute recombination")
      assert(r.getAs[Int]("is_leak") == (if (key._1 != key._2) 1 else 0))
    }
    val total = brute.values.sum
    val crossShare = rows.filter(_.getAs[Int]("is_leak") == 1)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(total > 0 && crossShare >= 0)
  }
}
