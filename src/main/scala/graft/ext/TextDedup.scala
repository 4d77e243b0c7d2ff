package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Tables.fanOut

/** Near-duplicate detection for a training-data pipeline: exact
  * (normalized-hash) dedup, n-gram Jaccard, MinHash+LSH, and SimHash.
  * Extension surface beyond the reference (BASELINE.json north star) over
  * the `documents` table.
  *
  * Scale posture — the four tiers trade exactness for join volume:
  *  - exact: one hash aggregation on the normalized text. O(N).
  *  - n-gram Jaccard: inverted-index self-join on shingles; cost is
  *    Σ_shingle n_s², so it is reserved for verification of candidate
  *    pairs or low-frequency shingle spaces.
  *  - MinHash+LSH: the 100 TB path — shingles are hashed to longs at the
  *    scan (the shuffle carries 16-byte rows, never strings), the whole
  *    16-hash signature is computed in ONE doc-keyed aggregation (16
  *    `min` aggregates — no row multiplication), banding shrinks the
  *    self-join to signature collisions, and exact Jaccard verifies just
  *    the candidates.
  *  - SimHash: constant per-doc state (one 32-bit fingerprint over word
  *    bigram features), candidate pairs from byte-band collisions,
  *    Hamming-distance verify.
  *
  * All hashing is integer arithmetic from [[TextOps]] — deterministic
  * across engines and shuffle orders, so every operator is oracle-checked
  * value-for-value, not just row-counted.
  */
object TextDedup {
  import TextOps._

  /** Fixed MinHash permutations `h_j(x) = (a_j·x + b_j) mod 2^31-1`,
    * 16 hashes banded 4×4 (b=4 bands, r=4 rows → s-curve threshold ≈0.7).
    * Constants are fixed so signatures are reproducible run-to-run (and in
    * the DuckDB oracle); (band, slot, weight) are materialized explicitly
    * to keep band assembly identical on both engines. */
  val Perms: Seq[(Int, Int, Int, Long, Long, Long)] =
    // (j, band, slot, a, b, weight = 31^slot)
    Seq(
      (0, 0, 0, 1000003L, 12345L, 1L), (1, 0, 1, 1000033L, 54321L, 31L),
      (2, 0, 2, 1000037L, 7777L, 961L), (3, 0, 3, 1000039L, 3333L, 29791L),
      (4, 1, 0, 1000081L, 999L, 1L), (5, 1, 1, 1000099L, 111L, 31L),
      (6, 1, 2, 1000117L, 2025L, 961L), (7, 1, 3, 1000121L, 4242L, 29791L),
      (8, 2, 0, 1000133L, 8888L, 1L), (9, 2, 1, 1000151L, 606L, 31L),
      (10, 2, 2, 1000159L, 909L, 961L), (11, 2, 3, 1000171L, 13579L, 29791L),
      (12, 3, 0, 1000183L, 24680L, 1L), (13, 3, 1, 1000187L, 97531L, 31L),
      (14, 3, 2, 1000193L, 86420L, 961L), (15, 3, 3, 1000199L, 55555L, 29791L))

  /** Exact dedup: group documents by `xxhash64` of the normalized text,
    * keep the minimum id as the canonical representative. The shuffle
    * carries an 8-byte key + 12 bytes of aggregation state instead of the
    * whole document — the difference between shuffling ~20 B/doc and
    * shuffling the corpus at 100 TB. A 64-bit collision merging two
    * distinct documents needs ~2³² docs for even-odds (birthday bound);
    * the normalized length rides along as aggregation state, not as a
    * group key. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = normText(col(textCol))
    fanOut(docs)
      .select(col(idCol).as("id"), xxhash64(norm).as("h"), length(norm).as("len"))
      .groupBy("h")
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_copies"),
        min(col("len")).as("n_chars_norm"))
      .select(col("rep_id"), col("n_copies"), col("n_chars_norm"))
  }

  /** Distinct (doc, char-k-gram shingle HASH) pairs — the inverted-index
    * input shared by MinHash and its Jaccard verification. Shingles are
    * hashed to longs BEFORE the distinct so the shuffle carries fixed
    * 16-byte rows; set semantics are over hash values on both engines
    * (collisions, p≈2⁻³¹ per doc-pair, affect Spark and the oracle
    * identically). */
  def docShingleHashes(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8): DataFrame =
    fanOut(docs).select(col(idCol).as("doc_id"),
        explode(charShingles(normText(col(textCol)), k)).as("sh"))
      .select(col("doc_id"), hash8(col("sh")).as("hv"))
      .distinct()

  /** Distinct (doc, word-n-gram shingle) pairs. */
  def docWordShingles(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
    fanOut(docs).select(col(idCol).as("doc_id"),
        explode(wordShingles(tokens(normText(col(textCol))), n)).as("sh"))
      .distinct()

  /** Default document-frequency cap for the exact inverted-index tier: a
    * shingle present in more documents than this is dropped from the
    * shingle space on BOTH sides of the comparison (sizes and
    * intersections). Without a cap the self-join cost is Σ_shingle n_s² —
    * one hot shingle (a boilerplate phrase) creates a quadratic posting
    * join that no amount of cluster buys back at 100 TB. Hot shingles
    * also carry no dedup signal (they match everything), so df-capping is
    * standard corpus-dedup practice. The oracle SQL mirrors the cap. */
  val DefaultMaxDf = 64

  /** Drop shingles whose document frequency exceeds `maxDf`. The hot set
    * is tiny by definition (only shingles with > maxDf postings), so it
    * broadcasts and the cap costs one partial-aggregated pass + a
    * broadcast anti-join at the scan — no extra shuffle of the index. */
  private def dfCapped(shingles: DataFrame, shCol: String, maxDf: Int): DataFrame = {
    val hot = shingles.groupBy(shCol).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(shCol)
    shingles.join(broadcast(hot), Seq(shCol), "left_anti")
  }

  /** Pairwise Jaccard ≥ threshold over a (doc_id, sh) shingle relation:
    * df-cap the shingle space, inverted-index self-join on the shingle,
    * intersection counts, set sizes, `|A∩B| / (|A|+|B|-|A∩B|)`. Emits
    * (doc_a < doc_b, jaccard). Jaccard is computed over the CAPPED
    * shingle space (sizes and intersections both exclude hot shingles),
    * so the definition stays internally consistent. */
  def jaccardPairs(shingles: DataFrame, shCol: String, threshold: Double,
                   maxDf: Int = DefaultMaxDf): DataFrame = {
    // The raw index feeds the hot-shingle aggregation and the capped
    // index; the capped index feeds three plan branches (sizes + both
    // join sides). Stage both once instead of re-exploding the corpus
    // per branch (at warehouse scale this materialization is a staging
    // table). `staged` (localCheckpoint) rather than persist(): blocks
    // are reclaimed by the ContextCleaner when the plan is GC'd, so a
    // long-lived session doesn't accumulate pinned cache per call.
    val raw = staged(shingles)
    val sh = staged(dfCapped(raw, shCol, maxDf))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col(shCol))
    val b = sh.select(col("doc_id").as("doc_b"), col(shCol))
    val inter = a.join(b, Seq(shCol))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    finishJaccard(inter, sizes, threshold)
  }

  /** Stage-once wrapper: materialize a multiply-consumed relation.
    * `localCheckpoint` (not `persist`) — it cuts lineage, and its blocks
    * are released by the ContextCleaner once the DataFrame is garbage
    * collected, where `persist` pins an entry in the CacheManager until
    * an explicit `unpersist` that a lazily-returned plan can never
    * schedule. */
  private def staged(df: DataFrame): DataFrame = df.localCheckpoint()

  private def finishJaccard(inter: DataFrame, sizes: DataFrame,
                            threshold: Double): DataFrame = {
    val jac = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
  }

  /** Word-n-gram Jaccard near-dup pairs (direct inverted-index join — the
    * exact tier, df-capped so no posting list exceeds `maxDf`; word
    * n-gram spaces are high-cardinality so the cap rarely bites, but it
    * bounds the worst case at any scale). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDf: Int = DefaultMaxDf): DataFrame =
    jaccardPairs(docWordShingles(docs, idCol, textCol, n), "sh", threshold, maxDf)

  /** MinHash band hashes: (doc_id, band, band_hash), one row per doc per
    * band. The full 16-hash signature is computed in a single doc-keyed
    * aggregation (16 `min` columns over the same shingle-hash rows — no
    * perm × shingle row explosion), then the 4 band hashes are assembled
    * per row and exploded. Exact integer arithmetic, order-independent. */
  def minhashBands(hashed: DataFrame): DataFrame = {
    val minCols = Perms.map { case (j, _, _, a, b, _) =>
      min((col("hv") * lit(a) + lit(b)) % lit(HashP)).as(s"mh_$j")
    }
    val sig = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandStructs = Perms.groupBy(_._2).toSeq.sortBy(_._1).map { case (band, ps) =>
      val bandHash = ps.map { case (j, _, _, _, _, w) => col(s"mh_$j") * lit(w) }
        .reduce(_ + _)
      struct(lit(band).as("band"), bandHash.as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** MinHash+LSH near-dup pairs: band-collision candidates, verified with
    * exact Jaccard on the candidates only. The self-join touches band
    * hashes (4 rows/doc), never the shingle index — that join is deferred
    * to the (tiny) candidate set. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, threshold: Double = 0.8): DataFrame = {
    // Consumed by signatures, sizes, and both verify branches — stage it.
    val shingles = staged(docShingleHashes(docs, idCol, textCol, k))
    val bands = minhashBands(shingles)
    val cands = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cands, shingles, threshold)
  }

  /** Exact Jaccard restricted to candidate pairs (over shingle hashes). */
  private def verifyJaccard(cands: DataFrame, shingles: DataFrame,
                            threshold: Double): DataFrame = {
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(shingles.select(col("doc_id").as("doc_a"), col("hv")), Seq("doc_a"))
      .join(shingles.select(col("doc_id").as("doc_b"), col("hv")), Seq("doc_b", "hv"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    finishJaccard(inter, sizes, threshold)
  }

  /** Near-dup CLUSTERS: MinHash+LSH candidate pairs (exact-Jaccard
    * verified over char-k-gram shingle hashes) grouped into connected
    * components; cluster id = min doc_id, which doubles as the kept
    * representative. The pairs → groups step every corpus dedup ends
    * with. Edges come from the LSH tier, never the full inverted-index
    * self-join: at corpus scale the candidate path is the only viable
    * pair source, and at threshold 0.8 — well above the 4×4 banding
    * s-curve midpoint ≈0.7 — LSH recall against the exact tier is
    * near-total (candidate-miss probability (1-0.8⁴)⁴ ≈ 3.6% per pair,
    * and missed pairs are overwhelmingly re-linked transitively inside
    * their cluster). */
  def dedupClusters(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, threshold: Double = 0.8): DataFrame =
    graft.operators.ConnectedComponents.labelPropagation(
        minhashLshPairs(docs, idCol, textCol, k, threshold),
        "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        when(col("node") === col("label"), 1).otherwise(0).as("is_rep"))

  /** 32-bit SimHash fingerprints over word-BIGRAM features: per-feature
    * hash, ±1 vote per bit position, sign → bit. Bigrams (not unigrams)
    * carry enough entropy that unrelated docs land ~16 bits apart even on
    * a small vocabulary, so Hamming ≤ 3 selects only true near-dups.
    * ONE doc-keyed aggregation with 32 conditional-sum columns — no row
    * multiplication anywhere: the shuffle carries one (doc_id, feature
    * hash) row per feature in, and 32 ints of aggregation state per doc
    * out. The fingerprint is assembled from the 32 vote columns in a
    * final projection. */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val voteCols = (0 until 32).map { b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
        .as(s"v_$b")
    }
    val votes = fanOut(docs).select(col(idCol).as("doc_id"),
        explode(wordShingles(tokens(normText(col(textCol))), 2)).as("f"))
      .select(col("doc_id"), hash8(rpad(col("f"), 8, " ")).as("hv"))
      .groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
    val fp = (0 until 32)
      .map(b => when(col(s"v_$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dup pairs: candidates share at least one of the four
    * fingerprint bytes (the standard rotate-and-block trick collapsed to
    * byte bands), verified by Hamming distance ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = simhashFingerprints(docs, idCol, textCol)
    val shifts = Seq(0, 8, 16, 24).toDF("shift")
    val banded = fps.crossJoin(broadcast(shifts))
      .select(col("doc_id"), col("fp"), col("shift"),
        expr("(fp >> shift) & 255").as("bv"))
    val cands = banded.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"),
        col("shift"), col("bv"))
      .join(banded.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"),
        col("shift"), col("bv")), Seq("shift", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "fp_a", "fp_b").distinct()
    cands
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }
}
