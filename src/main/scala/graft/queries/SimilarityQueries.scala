package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Multimodal, Retrieval, Sampling, Similarity, TextAnalysis, TextClean, TextDedup, TextOps}
import graft.model.Tables

/** Oracle-checked wrappers — similarity tier (ANN brute/LSH/IVF/PQ,
  * k-means, silhouette, spectral probes, k-NN graph, drift) over the
  * `embeddings` table. Round-12 split of the former `ExtQueries`
  * object — values unchanged. */
object SimilarityQueries {
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
        "label", threshold = 0.35)
      .orderBy("id_a", "id_b")


  /** Query set: the first 10 vectors (vec_id < 10) against the whole
    * corpus. */
  def annBruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  def annLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 3)
      .orderBy("query_id", "rank")
  }

  /** Hard-negative mining (q129): per query, top-5 most-similar vectors
    * with a DIFFERENT label — exact over the full corpus, |Q|-bounded. */
  def annHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", "label", k = 5)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed hard negatives (q130): the candidate-restricted scale
    * path — same-bucket, different-label, exact rank. */
  def annHardNegativesLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.hardNegativesLsh(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", "label", k = 3)
      .orderBy("query_id", "rank")
  }

  def annIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", "label", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** One k-means refinement step (q76) over the embeddings corpus,
    * seeded by the label cells: per-cell reassignment counts and
    * old-vs-new centroid cosine. */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansStep(Tables.embeddings(spark, dir), "vec_id",
        "embedding", "label")

  /** ANN recall evaluation (q105): recall@3 of the sign-LSH tier (q38)
    * against the brute-force exact top-3 (q37) per query — the quality
    * harness an ANN deployment reads before trading exactness for the
    * bucketed plan. Both sides are the already-bounded top-k relations
    * (|Q|·k rows), so the join and the report cost nothing at any corpus
    * size; recall divides exact counts with the tie-proof fixed-point
    * floor division of q90/q101. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val brute = annBruteTopK(spark, dir).filter(col("rank") <= 3)
      .select("query_id", "neighbor_id")
    val lsh = annLshTopK(spark, dir).select("query_id", "neighbor_id")
    val hits = brute.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    brute.groupBy("query_id").agg(count(lit(1)).as("k_eff"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .select(col("query_id"), col("k_eff").cast("int").as("k_eff"),
        col("n_hit"),
        expr("CAST((n_hit * 1000000) div k_eff AS DOUBLE) / 1000000.0")
          .as("recall"))
      .orderBy("query_id")
  }


  /** Int8 scalar-quantized retrieval (q187): the same |Q|=10 query set
    * as q37, ranked by exact integer dot products of per-dimension
    * min/max-scaled 8-bit codes, each hit flagged against the float32
    * exact top-5 — the compression/recall readout. */
  def quantizedRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 5)
  }

  /** Margin-based cross-source alignment mining (q298):
    * [[graft.ext.Similarity.marginAlignment]] — the Artetxe–Schwenk
    * mutual-kNN + ratio-margin criterion (the CCMatrix/LASER bitext
    * recipe) applied across corpus sources over the label-bucketed
    * candidate graph: per source pair, candidate volume, mutual-NN1
    * count, margin-qualified alignments, and the best-margin pair. */
  def marginAlignmentReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.marginAlignment(
      Tables.embeddings(spark, dir)
        .join(Tables.documents(spark, dir)
          .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id")),
      "vec_id", "embedding", "label", "source")

  /** Embedding-cluster silhouette report (q226): per-label silhouette
    * of the embeddings table's own label clustering via
    * [[graft.ext.Similarity.silhouetteByLabel]] — the clustering-quality
    * gate an embedding-space curation step (IVF cells, SemDeDup
    * buckets, class-balanced sampling) should publish. */
  def embeddingSilhouette(spark: SparkSession, dir: String): DataFrame =
    Similarity.silhouetteByLabel(Tables.embeddings(spark, dir),
      "vec_id", "embedding", "label")

  /** Product-quantization retrieval (q227): the q37 query set ranked by
    * PQ asymmetric-distance scores ([[graft.ext.Similarity.pqTopK]] —
    * 32 subspaces × 64-entry deterministic codebook = 32 one-byte codes
    * per vector stored, 8× smaller than float32), each hit flagged
    * against the exact float top-5. */
  def pqRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 5)
  }

  /** Embedding-space source similarity matrix (q230): pairwise centroid
    * cosine between the sources' embedding clouds
    * ([[graft.ext.Similarity.centroidSimilarity]], embeddings joined to
    * their id-aligned documents for the source key) — the SEMANTIC
    * companion to q165's lexical MinHash matrix: shingle overlap sees
    * shared strings, centroid cosine sees shared meaning-direction with
    * zero verbatim overlap. */
  def sourceEmbeddingSimilarity(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidSimilarity(
      Tables.embeddings(spark, dir)
        .join(Tables.documents(spark, dir)
          .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id")),
      "source", "embedding")

  /** Multi-probe LSH retrieval (q192): the q38 sign-LSH tier probing
    * each query's bucket plus its 4 Hamming-1 neighbors, recall-flagged
    * against the exact top-3. */
  def multiProbeLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.multiProbeLshTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 3)
  }

  /** IVFADC retrieval (q233): the q227 PQ asymmetric-distance scoring
    * run INSIDE the q49-style IVF cell restriction
    * ([[graft.ext.Similarity.ivfPqTopK]]) — the billion-vector serving
    * composition, each hit recall-flagged against the unrestricted
    * exact top-5. */
  def ivfAdcRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
      "embedding", "label", k = 5, nprobe = 2)
  }

  /** IVFADC with residual encoding (q292): the published Jégou et al.
    * form — PQ codes quantize x − c(cell) against the coarse centroid
    * ([[graft.ext.Similarity.ivfAdcResidualTopK]]); same probe and
    * candidate sets as q233, so the recall delta isolates residual vs
    * raw coding. */
  def ivfAdcResidualRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfAdcResidualTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", "label", k = 5, nprobe = 2)
  }

  /** SEMI-SUPERVISED label spreading over the embedding near-dup graph
    * (q239, the Zhu–Ghahramani archetype made fixed-round): 20% of the
    * corpus (vec_id % 5 = 0) arrives LABELED (the persisted
    * human/rule-labeled slice); three frontier rounds spread labels
    * through the q221-style bucketed cosine graph (threshold 0.30 —
    * denser than the 0.40 dedup gate; spreading wants neighborhoods,
    * dedup wants near-identity): each round, every still-unlabeled node
    * with ≥1 labeled neighbor takes the cosine-weight-argmax label
    * (Σ e4-integer edge weights per label, ties to the smallest label),
    * and once assigned a node is FIXED (the BFS-layer contract — each
    * round is exactly replayable, no oscillation). Output: every node
    * with its seed flag, final label (NULL = unreached) and the round
    * it was assigned — the "propagate the expensive labels to the
    * cheap neighbors" step of weak supervision at corpus scale.
    *
    * Scale shape: pair volume is bucket-bounded (scan-side LSH); each
    * round is one edge⋈labels keyed join + an anti join on the labeled
    * set + a node-keyed argmax — frontier-sized, lineage cut per
    * round. */
  def labelSpreading(spark: SparkSession, dir: String,
                     threshold: Double = 0.30, rounds: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        "bucket", threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cos") * 10000, 0).cast("long").as("w"))
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"), col("w"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v"), col("w")))
      .localCheckpoint() // read every round
    val all = emb.select(col("vec_id"), col("label"))
    // Each round checkpoints only its INCREMENT; `labeled` stays a lazy
    // union over the per-round checkpointed layers (the
    // Bfs.hopDistancesAdj posture). The pre-r17 shape re-materialized
    // the ENTIRE labeled set every round — O(rounds·|labeled|) rows
    // rewritten across rounds·partitions tiny tasks, which is exactly
    // the per-round scheduling overhead that made this query run
    // FASTER on 8 cores than 32 at bench scale (r16 verdict §3).
    var layers = Vector(all.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("label"), lit(0).as("assigned_round"))
      .localCheckpoint())
    def labeled: DataFrame = layers.reduce(_ unionAll _)
    for (r <- 1 to rounds) {
      val newly = edges
        .join(labeled.select(col("vec_id").as("v"), col("label")), Seq("v"))
        .join(labeled.select(col("vec_id").as("u")), Seq("u"), "left_anti")
        .groupBy(col("u"), col("label")).agg(sum("w").as("s"))
        .groupBy("u")
        .agg(min_by(col("label"), struct(-col("s"), col("label"))).as("label"))
        .select(col("u").as("vec_id"), col("label"),
          lit(r).as("assigned_round"))
        .localCheckpoint()
      layers = layers :+ newly
    }
    all.select("vec_id")
      .join(labeled, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("assigned_round") === 0, 1).otherwise(0).cast("int")
          .as("is_seed"),
        col("label"), col("assigned_round"))
      .orderBy("vec_id")
  }

  /** Multi-round k-means with convergence certificate (q236):
    * [[graft.ext.Similarity.kmeansRounds]] — four fixed Lloyd rounds
    * over the embeddings corpus seeded by the label cells, per-cluster
    * membership/arrival/inertia report with the q223-style `converged`
    * fixpoint flag. Finishes the clustering primitive q76 started. */
  def kmeansConverged(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansRounds(Tables.embeddings(spark, dir), "vec_id",
      "embedding", "label", rounds = 4)

  /** UNIFIED RETRIEVAL EVALUATION (q246) — MRR@3 and hit@3 of every
    * ANN tier in the suite (sign-LSH q38, IVF q49, PQ q227, IVFADC
    * q233, plus the exact tier itself as the sanity row) against the
    * brute-force true nearest neighbor: per system, was the true NN
    * retrieved in the top 3, and at what reciprocal rank. Extends the
    * q105 recall readout (LSH-only, set overlap) to the rank-aware
    * metrics a retrieval deployment actually compares systems on, in
    * exact integers: rr = 10⁶ div rank (0 when absent), means by floor
    * division over the query count. The exact tier scoring 10⁶
    * certifies the harness itself.
    *
    * Scale shape: every input is an already-bounded |Q|·k top-k
    * relation — the eval joins and aggregates nothing corpus-sized;
    * the 5-row system spine is driver metadata. */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brute = annBruteTopK(spark, dir)
    val truth = brute.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("true_nn"))
      .localCheckpoint() // read by the join + the query count
    val systems: Seq[(String, DataFrame)] = Seq(
      "brute"  -> brute,
      "lsh"    -> annLshTopK(spark, dir),
      "ivf"    -> annIvfTopK(spark, dir),
      "pq"     -> pqRetrieval(spark, dir),
      "ivfadc" -> ivfAdcRetrieval(spark, dir))
    val ranked = systems.map { case (nm, df) =>
      df.select(col("query_id"), col("neighbor_id"), col("rank"))
        .filter(col("rank") <= 3).withColumn("system", lit(nm))
    }.reduce(_ unionAll _)
    val nQ = truth.agg(count(lit(1)).as("n_queries"))
    val found = ranked
      .join(truth.withColumnRenamed("true_nn", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("system")
      .agg(count(lit(1)).as("n_found"),
        sum(expr("1000000 div rank")).as("sum_rr"),
        // Σ rr² for the jackknife; missing queries contribute rr = 0 to
        // both Σrr and Σrr², so the per-query spine never materializes.
        sum(expr("(1000000 div rank) * (1000000 div rank)")).as("sum_rr2"))
    // Jackknife error bars: the leave-one-query-out jackknife SE of a
    // mean reduces in closed form to sqrt((n·Σx² − (Σx)²) / (n²(n−1)))
    // — exact integer numerator/denominator (DECIMAL(38,0) ↔ DuckDB
    // HUGEINT), one shared sqrt over the same integers on both engines,
    // rounded once. hit x ∈ {0,1} (so Σx² = Σx); rr already in e6
    // units. Zero by construction when every query agrees (the brute
    // sanity row: all hits at rank 1).
    systems.map(_._1).toDF("system")
      .join(found, Seq("system"), "left")
      .na.fill(0L, Seq("n_found", "sum_rr", "sum_rr2"))
      .crossJoin(broadcast(nQ))
      .select(col("system"),
        col("n_queries").cast("long").as("n_queries"),
        col("n_found").cast("long").as("n_found"),
        expr("n_found * 1000000 div n_queries").as("hit_at3_ppm"),
        expr("sum_rr div n_queries").as("mrr_e6"),
        expr("""CASE WHEN n_queries > 1 THEN CAST(ROUND(SQRT(
          |  CAST(CAST(n_queries AS DECIMAL(38,0)) * n_found
          |       - CAST(n_found AS DECIMAL(38,0)) * n_found AS DOUBLE) /
          |  CAST(CAST(n_queries AS DECIMAL(38,0)) * n_queries
          |       * (n_queries - 1) AS DOUBLE)) * 1000000, 0) AS BIGINT)
          |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("hit_se_ppm"),
        expr("""CASE WHEN n_queries > 1 THEN CAST(ROUND(SQRT(
          |  CAST(CAST(n_queries AS DECIMAL(38,0)) * sum_rr2
          |       - CAST(sum_rr AS DECIMAL(38,0)) * sum_rr AS DOUBLE) /
          |  CAST(CAST(n_queries AS DECIMAL(38,0)) * n_queries
          |       * (n_queries - 1) AS DOUBLE)), 0) AS BIGINT)
          |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("mrr_se_e6"))
      .orderBy("system")
  }

  /** nDCG@3 with graded relevance across the ANN tiers (q281):
    * [[graft.ext.Retrieval.ndcgAtK]]. Graded relevance is DERIVED
    * DETERMINISTICALLY from the exact brute-force ranking — gain =
    * 4 − brute_rank for the true top-3 (3/2/1), the exact-rank-based
    * gain scheme — so the readout measures how much of the graded
    * exact neighborhood each approximate tier preserves, not just the
    * single true-NN that MRR (q246) sees. `brute` scores a perfect
    * 10⁶ by construction — the sanity anchor. The two heaviest tiers
    * (pq, ivfadc) are deliberately not re-run here; q246 already
    * carries their top-3 behavior and this query's point is the
    * metric, not a fifth rebuild of the PQ codebook. */
  def ndcgReport(spark: SparkSession, dir: String): DataFrame = {
    val brute = annBruteTopK(spark, dir)
      .localCheckpoint() // read as the rel source + the brute system run
    val rel = brute.filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        (lit(4) - col("rank")).cast("long").as("gain"))
    val runs = Seq(
      "brute" -> brute,
      "lsh"   -> annLshTopK(spark, dir),
      "ivf"   -> annIvfTopK(spark, dir))
      .map { case (nm, df) =>
        df.select(lit(nm).as("system"), col("query_id"),
          col("neighbor_id").as("doc_id"), col("rank"))
      }.reduce(_ unionAll _)
    Retrieval.ndcgAtK(runs, rel, k = 3)
  }

  /** Clustering quality vs labels (q247):
    * [[graft.ext.Similarity.kmeansClusterEval]] — per-cluster purity
    * and global NMI of the q236 final assignment against the label
    * column. */
  def clusterEvalReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansClusterEval(Tables.embeddings(spark, dir), "vec_id",
      "embedding", "label", rounds = 4)

  /** IVF PROBE SWEEP (q262) — the recall-vs-cost dial of the IVF tier
    * measured (the q105 eval idea swept across the operating range):
    * [[graft.ext.Similarity.ivfTopK]] at nprobe ∈ {1, 2, 4} against
    * the exact float top-5, one row per setting with the recall in
    * exact floor ppm — the curve a deployment reads to pick its probe
    * count. Every per-setting relation is the |Q|·k bounded list; the
    * corpus-side work per setting is the celled candidate join the
    * IVF tier already bounds.
    *
    * Output rows: (nprobe, n_queries, n_hits, recall_ppm). */
  def ivfProbeSweep(spark: SparkSession, dir: String,
                    probes: Seq[Int] = Seq(1, 2, 4), k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
      .localCheckpoint() // read per probe setting
    val nQ = exact.select("query_id").distinct()
      .agg(count(lit(1)).as("n_queries"))
    probes.sorted.map { p =>
      val hits = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          "label", k = k, nprobe = p)
        .select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      hits.crossJoin(broadcast(nQ))
        .select(lit(p).as("nprobe"), col("n_queries"), col("n_hits"))
    }.reduce(_ unionAll _)
      .select(col("nprobe").cast("int").as("nprobe"),
        col("n_queries").cast("long").as("n_queries"),
        col("n_hits").cast("long").as("n_hits"),
        expr(s"n_hits * 1000000 div (n_queries * $k)").as("recall_ppm"))
      .orderBy("nprobe")
  }

  /** EMBEDDING-LEVEL cross-source near-duplicate matrix (q252) — the
    * semantic counterpart of q94's n-gram leakage report: verified
    * cosine ≥ 0.40 pairs from the q221 bucketed tier, attributed to
    * their source labels via the suite's vec_id = doc_id convention,
    * rolled up per unordered source pair (diagonal rows = intra-source
    * near-dup density, off-diagonal = semantic contamination between
    * crawls that n-gram overlap misses — paraphrases, translations,
    * templated rewrites). Per cell: pair count, the strongest cosine
    * (e4 integer), and the lexicographically-first example pair for
    * triage.
    *
    * Scale shape: pair volume is the q221 bucket-bounded sliver; the
    * source lookup joins the 2-column id→source projection against
    * that sliver (AQE broadcasts the pair side); the rollup is keyed
    * by ≤ |sources|² cells. */
  def embCrossSourceMatrix(spark: SparkSession, dir: String,
                           threshold: Double = 0.40): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        "bucket", threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cos") * 10000, 0).cast("long").as("cos_e4"))
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"),
        col("source").as("src_a")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"),
        col("source").as("src_b")), Seq("id_b"))
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"),
        col("id_a"), col("id_b"), col("cos_e4"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs"), max("cos_e4").as("max_cos_e4"),
        min(struct(col("id_a"), col("id_b"))).as("ex"))
      .select(col("source_lo"), col("source_hi"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("max_cos_e4").cast("long").as("max_cos_e4"),
        col("ex.id_a").as("example_a"), col("ex.id_b").as("example_b"))
      .orderBy("source_lo", "source_hi")
  }

  /** Top principal component by power iteration (q245):
    * [[graft.ext.Similarity.powerIteration]] — three fixed integer
    * rounds of v ← normalize(AᵀAv) over the embeddings corpus with the
    * cos²-alignment convergence certificate. */
  def principalComponent(spark: SparkSession, dir: String): DataFrame =
    Similarity.powerIteration(Tables.embeddings(spark, dir), "vec_id",
      "embedding", rounds = 3)

  /** Second principal component by deflation (q282):
    * [[graft.ext.Similarity.secondComponent]] — Gram–Schmidt-deflate the
    * q245 top direction out of the quantized matrix, re-run the power
    * loop; alignment + orthogonality certificates in ppm. */
  def secondComponentReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.secondComponent(Tables.embeddings(spark, dir), "vec_id",
      "embedding", rounds = 3)

  /** Label-noise by k-NN disagreement (q276):
    * [[graft.ext.Similarity.labelNoiseByKnn]] — per-label mislabel
    * suspects from the q267 descent graph's neighbor-majority vote.
    * The synthetic corpus reads ~90% suspects — honest: its labels are
    * near-independent of embedding geometry (the q236 near-uniform
    * convention), which is exactly the "this label set is not learnable
    * from these features" signal the probe exists to raise; the
    * planted-mislabel fixture in SimilaritySpec shows the discriminating
    * case. */
  def labelNoiseReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelNoiseByKnn(Tables.embeddings(spark, dir), "vec_id",
      "embedding", "label", k = 5)

  /** k-NN graph + NN-descent (q267):
    * [[graft.ext.Similarity.knnGraphDescent]] — sign-LSH-seeded 5-NN
    * graph over the embeddings, one neighbors-of-neighbors round,
    * measured recall vs the exact graph on the vec_id < 64 probes. */
  def knnGraphReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnGraphDescent(Tables.embeddings(spark, dir), "vec_id",
      "embedding", k = 5)

  /** NN-descent run to a convergence certificate (q280):
    * [[graft.ext.Similarity.knnDescentConverged]] — the q267 seed graph
    * iterated 3 fixed descent rounds, per-round recall trajectory +
    * n_new_edges fixpoint flag. */
  def knnDescentReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnDescentConverged(Tables.embeddings(spark, dir), "vec_id",
      "embedding", k = 5, rounds = 3)

  /** Graph-ANN serving (q304):
    * [[graft.ext.Similarity.graphAnnBeamSearch]] — beam search over the
    * q280 3-round NN-descent graph for the q262 query set (vec_id < 10):
    * HIERARCHICAL entry (r15 — each query probes its 2 nearest q49
    * IVF centroids and enters at each probed cell's 2 best-scored
    * members for that query, 4 entries total, same walk budget as the
    * r14 fixed-id entry; spec-pinned recall ≥ both the legacy entry
    * and the IVF tier), 3 beam-4 hops over the undirected
    * degree-capped serve edges, top-5 answers with exact-tier hit flags
    * (the recall readout comparable to the q262 IVF curve) and the
    * per-query visited-set size (the candidate-volume cost). */
  def graphAnnServeReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.graphAnnBeamSearch(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), k = 5, beam = 4, hops = 3,
      nEntry = 4, graphRounds = 3, entryCellCol = Some("label"))
  }

  /** Graph-ANN beam-width sweep (q310):
    * [[graft.ext.Similarity.graphAnnBeamSweep]] — the q304 walk at
    * beam ∈ {1, 2, 8} over the same query set: per width, visited-set
    * volume (the serving cost) and exact-tier recall in floor ppm —
    * the recall-vs-cost curve of the graph serving path (the q262
    * probe-sweep readout for the graph tier). */
  def graphAnnBeamSweepReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.graphAnnBeamSweep(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), k = 5, beams = Seq(1, 2, 8),
      hops = 3, nEntry = 4, graphRounds = 3, entryCellCol = Some("label"))
  }

  /** Embedding-space drift (q269): [[graft.ext.Drift.embeddingDrift]]
    * — per-dim centroid shift + value-distribution PSI between the
    * even/odd vec_id halves (the q242 snapshot convention). */
  def embeddingDriftReport(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.embeddingDrift(Tables.embeddings(spark, dir),
      "vec_id", "embedding")
}
