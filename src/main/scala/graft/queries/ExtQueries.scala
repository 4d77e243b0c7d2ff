package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Multimodal, Retrieval, Sampling, Similarity, TextAnalysis, TextClean, TextDedup, TextOps}
import graft.model.Tables

/** Oracle-checked query wrappers for the LLM-data-pipeline extension
  * operators (`graft.ext`): dedup, similarity search, text analysis and
  * multimodal plumbing pinned to the driver `documents` / `embeddings`
  * tables. The ops themselves are generic (`DataFrame` in/out); these
  * bind concrete columns, thresholds and deterministic output orders so
  * the DuckDB gate can hash-compare values.
  */
object ExtQueries {

  // ---- text analysis -----------------------------------------------------

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  def languageId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  // ---- dedup -------------------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    TextDedup.exactGroups(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("rep_id")

  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    TextDedup.ngramContainmentPairs(Tables.documents(spark, dir), "doc_id",
        "text", n = 3, threshold = 0.6)
      .orderBy("doc_a", "doc_b")

  def crossSourceLeakage(spark: SparkSession, dir: String): DataFrame =
    TextDedup.crossSourceLeakage(Tables.documents(spark, dir), "doc_id",
        "text", "source", k = 8, threshold = 0.8)

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    TextDedup.ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, threshold = 0.8)
      .orderBy("doc_a", "doc_b")

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    TextDedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 8, threshold = 0.8)
      .orderBy("doc_a", "doc_b")

  /** Incremental exact dedup (q124): persisted state built from the
    * even-id half of the corpus, the odd half arriving as the daily
    * batch — the state-probe shape a 100 TB ingest actually runs
    * (sign/hash only the batch, probe the persisted group index, group
    * the leftovers batch-internally). The oracle recomputes the merged
    * assignment from scratch, so the differential path is value-checked
    * against a full re-run, not just row-counted. */
  def dedupExactIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val state = TextDedup.exactState(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    TextDedup.exactGroupsIncremental(state,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      ._1.orderBy("doc_id")
  }

  /** Incremental MinHash+LSH near-dup detection (q125): same
    * even-state / odd-batch split as q124 over the persisted band +
    * shingle state — only the batch is signed; candidates are band
    * collisions touching the batch; verification reads candidate
    * shingle sets only. Oracle = the full-corpus q34 pair run
    * restricted to pairs touching the batch. */
  def dedupMinhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val state = TextDedup.minhashState(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 8)
    TextDedup.minhashLshIncremental(state,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        k = 8, threshold = 0.8)
      ._1.orderBy("doc_a", "doc_b")
  }

  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dedupClusters(Tables.documents(spark, dir), "doc_id", "text",
        k = 8, threshold = 0.8)
      .orderBy("doc_id")

  /** Keep-best dedup selection (q184): the step AFTER clustering that
    * every production dedup actually ships — pick ONE survivor per
    * near-dup cluster (here: the longest normalized text, ties to the
    * smallest doc_id — "keep the most complete copy") and report the
    * bytes the drop saves. Composition: the q47 cluster labels joined
    * to a zero-shuffle length projection, one cluster-keyed aggregation
    * with the survivor carried as `max_by` over a (length, −doc_id)
    * key — no rank window, no second join. Cluster count ≪ corpus, so
    * everything after the label join is metadata-scale. */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cl = TextDedup.dedupClusters(docs, "doc_id", "text",
      k = 8, threshold = 0.8)
    val len = docs.select(col("doc_id"),
      length(graft.ext.TextOps.normText(col("text"))).cast("long")
        .as("n_chars"))
    cl.join(len, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max_by(struct(col("doc_id").as("d"), col("n_chars").as("c")),
          struct(col("n_chars"), -col("doc_id"))).as("kept"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("cluster_id"), col("kept.d").as("kept_doc"),
        col("n_members"), col("kept.c").as("kept_chars"),
        (col("total_chars") - col("kept.c")).as("dropped_chars"))
      .orderBy("cluster_id")
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    TextDedup.simhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
        "label", threshold = 0.35)
      .orderBy("id_a", "id_b")

  // ---- similarity search -------------------------------------------------

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

  /** Corpus report — the summary every training-data pipeline run ends
    * with: per (predicted language, quality gate) document counts,
    * unique-text counts (exact-dedup representatives), and mean token
    * counts. Composes languageId + qualityScore (both zero-shuffle
    * per-row projections over ONE scan) with the exact-dedup tier; the
    * whole report costs the dedup aggregation plus one group-by. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lang = TextAnalysis.languageId(docs, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang"))
    val qual = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("is_quality"))
    val reps = TextDedup.exactGroups(docs, "doc_id", "text")
      .select(col("rep_id").as("doc_id"), lit(1).as("is_rep"))
    lang.join(qual, "doc_id")
      .join(reps, Seq("doc_id"), "left")
      .groupBy("predicted_lang", "is_quality")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_rep"), lit(0))).cast("long").as("n_unique"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 4).as("avg_tokens"))
      .orderBy("predicted_lang", "is_quality")
  }

  /** Within-document repetition profile per doc (q53) — Gopher-style
    * repetition filtering over the corpus. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Deterministic 90/5/5 hash-split stats (q52): per-split doc counts,
    * id ranges, char volume, and how many of each split's docs the
    * deterministic 10% subsample keeps. Split assignment is affine-mod
    * arithmetic on doc_id — stable under corpus appends, reproducible in
    * the oracle. */
  def splitStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Sampling.hashSplit(docs, "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .withColumn("in_sample",
        when(Sampling.bucket100(col("doc_id")) < 10, 1L).otherwise(0L))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        sum(col("in_sample")).as("n_in_10pct_sample"))
      .orderBy("split")
  }

  /** PII scrub (q54) over normalized text AUGMENTED with synthetic
    * doc_id-derived PII (the corpus is word-soup with none of its own) —
    * the augmentation runs identically in the oracle, so the redaction
    * regexes are exercised value-for-value on every row rather than
    * no-op'ing to a trivially green pass-through. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val aug = concat(TextOps.normText(col("text")),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or https://ex.org/d/"), col("doc_id").cast("string"),
      lit("?ref=a call 010-1234-5678"))
    TextClean.piiScrub(docs.select(col("doc_id"), aug.as("aug_text")),
        "doc_id", "aug_text")
      .orderBy("doc_id")
  }

  /** Corpus token-length histogram (q55): 16-token fixed-width buckets. */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenHistogram(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("bucket_lo")

  /** Exact corpus length quantiles (q56): one-row token/char percentile
    * report. */
  def corpusQuantiles(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusQuantiles(Tables.documents(spark, dir), "doc_id", "text")

  /** Stratified mixture rebalance (q57): downsample dominant languages
    * (en → 25%), keep rare ones whole (zh → 100%), 60% default —
    * deterministic per-language sample, reported as per-language
    * total/kept/rate. */
  def stratifiedMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 25, "zh" -> 100), defaultPct = 60)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_total"), 4)
          .as("kept_rate"))
      .orderBy("lang")
  }

  /** Benchmark decontamination (q58): docs 0-4 stand in for a held-out
    * eval suite; every other doc is scored by its distinct char-8-gram
    * overlap with that suite. */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    TextDedup.contaminationReport(
        docs.filter(col("doc_id") >= 5), docs.filter(col("doc_id") < 5),
        "doc_id", "text", k = 8, flagFrac = 0.35)
      .orderBy("doc_id")
  }

  /** Sequence packing report (q59): 2048-token bins over doc_id order. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.packingReport(Tables.documents(spark, dir),
        "doc_id", "text", budget = 2048)
      .orderBy("bin")

  /** Temperature-scaled mixture report (q138): √-proportional source
    * rebalancing targeting 40% of the corpus — per-source weights,
    * keep rates (ppm) and deterministic hash-gated kept counts. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMixReport(Tables.documents(spark, dir), "source",
        "doc_id", targetPct = 40)
      .orderBy("source")

  /** Token-length KS drift (q139): exact two-sample Kolmogorov–Smirnov
    * distance between the token-count distributions of the even- and
    * odd-id corpus halves — the snapshot-drift monitor, integer-exact
    * via the distributed prefix sum. */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(TextOps.normText(col("text")))).cast("long")
        .as("n_tokens"))
    graft.ext.Drift.ksReport(
      toks.filter(col("doc_id") % 2 === 0),
      toks.filter(col("doc_id") % 2 === 1), "n_tokens")
  }

  /** Per-language packing report (q141): independent 2048-token bin
    * sequences per language over doc_id order — per-group shards from
    * ONE global prefix sum (no per-group window, so a dominant
    * language can't serialize its slice). */
  def groupedPacking(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.packingReportGrouped(Tables.documents(spark, dir),
        "lang", "doc_id", "text", budget = 2048)
      .orderBy("lang", "bin")

  /** Weighted systematic PPS sample (q144): 100 draws proportional to
    * document length — the deterministic no-RNG sampler
    * ([[graft.ext.Sampling.systematicSample]]) whose exclusive prefix
    * rides the distributed two-pass prefix sum, so the layout-line scan
    * never plans an unpartitioned window. Long docs can be drawn more
    * than once (`multiplicity`). */
  def systematicSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.systematicSample(Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "n_chars", k = 100)
      .orderBy("doc_id")

  /** End-to-end curation pipeline (q162): the full LLM-data flow —
    * C4-style quality gate → exact dedup (smallest id per normalized
    * text) → temperature-scaled source rebalance → 2048-token packing —
    * composed as ONE declarative plan from the operators the suite
    * already oracles individually (q62, q32, q138, q59). The report is
    * the per-source funnel (input → quality → dedup → final, with final
    * token mass) plus the global packed-bin count. Scale posture: each
    * stage reuses its operator's shape (zero-shuffle scoring, text-keyed
    * dedup agg, broadcast rate gate, two-pass prefix packing); the
    * funnel counts are source-keyed partial aggs of each stage's
    * survivor projection. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keptIds = graft.ext.QualityFilters.c4Filter(docs, "doc_id", "text")
      .filter(col("keep") === 1).select("doc_id")
    val q = docs.join(keptIds, Seq("doc_id"))
    val repIds = q.select(col("doc_id"), TextOps.normText(col("text")).as("t"))
      .groupBy("t").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val dd = q.join(repIds, Seq("doc_id"))
    val fin = Sampling.temperatureMixFilter(dd, "source", "doc_id",
        targetPct = 40)
      .localCheckpoint() // funnel count, token mass and packing re-read it
    val c0 = docs.groupBy("source").agg(count(lit(1)).as("n_input"))
    val c1 = q.groupBy("source").agg(count(lit(1)).as("n_quality"))
    val c2 = dd.groupBy("source").agg(count(lit(1)).as("n_dedup"))
    val c3 = fin.groupBy("source").agg(count(lit(1)).as("n_final"),
      sum(size(TextOps.tokens(TextOps.normText(col("text")))).cast("long"))
        .as("sum_tokens_final"))
    val bins = graft.ext.Packing.packingReport(fin, "doc_id", "text", 2048)
      .agg(count(lit(1)).as("n_bins_global"))
    c0.join(c1, Seq("source"), "left")
      .join(c2, Seq("source"), "left")
      .join(c3, Seq("source"), "left")
      .crossJoin(broadcast(bins))
      .select(col("source"), col("n_input"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("sum_tokens_final"), lit(0L)).as("sum_tokens_final"),
        col("n_bins_global"))
      .orderBy("source")
  }

  /** Content growth curve (q164): Heaps'-law shingle discovery per
    * 50-doc slice with the cumulative riding the distributed prefix
    * sum. */
  def contentGrowth(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.contentGrowth(Tables.documents(spark, dir), "doc_id", "text")

  /** Source-level MinHash similarity matrix (q165): per-source 16-hash
    * union signatures, pairwise matching-hash Jaccard estimates. */
  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame =
    TextDedup.sourceMinhashSimilarity(Tables.documents(spark, dir),
      "source", "text")

  /** Pairwise source SET-OPERATION estimates via KMV sketches (q180):
    * estimated distinct-shingle counts, union and intersection sizes in
    * absolute counts, per source pair — the capacity-planning numbers
    * ("how much NEW content does source B add over A?") that the q165
    * Jaccard matrix can't answer. Integer-exact estimator, so
    * oracle-checked value-for-value. */
  def sourceSetOps(spark: SparkSession, dir: String): DataFrame =
    TextDedup.kmvSourceSetOps(Tables.documents(spark, dir), "source", "text")

  /** Character-bigram LM perplexity scoring (q181): per-doc average
    * negative log-likelihood in integer micro-nats under the corpus's
    * own add-one-smoothed bigram model — the CCNet-style quality signal
    * whose tails hold gibberish and boilerplate. */
  def bigramLmNll(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScore(Tables.documents(spark, dir), "doc_id", "text")

  /** Quality-funnel matrix by source (q185): which sources lose what
    * fraction of documents to which C4-cascade rule — the audit view a
    * data team reads before re-crawling or re-weighting a source. One
    * zero-shuffle scoring pass (the q62 cascade with `source` carried
    * through), one (source, reason) count, and per-source shares from a
    * metadata-scale window over the aggregated grid. */
  def qualityFunnelBySource(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.ext.QualityFilters.c4Filter(Tables.documents(spark, dir),
      "doc_id", "text", carry = Seq("source"))
    f.groupBy("source", "reject_reason")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_ppm",
        expr("(n_docs * 1000000) div sum(n_docs) over (partition by source)"))
      .orderBy("source", "reject_reason")
  }

  /** Character-entropy report (q182): per-doc Shannon entropy of the
    * character distribution in integer micro-nats — low tail = repeated
    * filler, high tail = random noise; no model table, no joins. */
  def charEntropyReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(Tables.documents(spark, dir), "doc_id", "text")

  /** Per-source language diversity (q160): inverse Simpson effective
    * language count over the declared `lang` column, exact milli. */
  def sourceDiversity(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDiversity(Tables.documents(spark, dir), "source", "lang")

  /** Vocabulary top-20 (q60): the corpus Zipf head with occurrence and
    * doc frequencies. */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabTopK(Tables.documents(spark, dir), "doc_id", "text", k = 20)
      .orderBy("rank")

  /** Corpus TF-IDF head per source (q88): top-10 terms of each source
    * slice, integer-ranked by term frequency, weighted by corpus-wide
    * IDF. */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text",
        "source", k = 10)
      .orderBy("source", "rank")

  /** Duplicated 20-token passages across documents (q61) — span-level
    * dedup report. */
  def dupPassages(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dupPassages(Tables.documents(spark, dir), "doc_id", "text",
        n = 20, minDocs = 2)
      .orderBy("passage_hash")

  /** C4/Gopher rule-cascade quality filter (q62): per-doc metrics, the
    * 0/1 keep gate, and the first-failing-rule reject reason. Default
    * thresholds — calibrated so every rule fires on the driver corpus. */
  def c4Filter(spark: SparkSession, dir: String): DataFrame =
    graft.ext.QualityFilters.c4Filter(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Per-source quota (q63): keep at most 15 docs per source,
    * deterministic hash-order winners — the per-origin cap against
    * boilerplate-heavy domains. Runs the salted two-level form because
    * `source` is low-cardinality (the skewed-window case at scale);
    * output is provably identical to the single-window
    * `Sampling.perKeyQuota`, which SamplingSpec pins on a synthetic
    * hot key. */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    Sampling.perKeyQuotaSalted(Tables.documents(spark, dir), "source", "doc_id",
        cap = 15, salts = 16)
      .select("source", "doc_id", "n_chars")
      .orderBy("source", "doc_id")

  /** Deterministic corpus shuffle (q64): 8 shards, hash-ordered
    * positions — the reproducible global training order. */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardShuffle(Tables.documents(spark, dir), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")

  /** Snapshot diff (q65): documents vs a deterministically mutated v2
    * (every 17th doc removed, every 13th's text edited, every 29th
    * re-keyed as an append) — added/removed/changed rows only. The
    * mutation runs identically in the oracle, so every change_type and
    * both content hashes are value-checked. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = base.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 1, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.ext.Versioning.snapshotDiff(base, v2, "doc_id", Seq("text"))
      .orderBy("doc_id")
  }

  /** Token-rarity scoring (q67): per-doc mean unigram rank + OOV rate
    * against the corpus top-20 vocabulary — the integer-exact perplexity
    * proxy. */
  def rarityScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.rarityScore(Tables.documents(spark, dir), "doc_id", "text",
        vocabK = 20)
      .orderBy("doc_id")

  /** Exact new-content detection (q68): docs 0-399 are the previous
    * snapshot; every doc's md5 content hash is anti-probed against
    * theirs (left join marker on the hash — the same fixed-width-key
    * idiom as q65's snapshot diff, and oracle-checkable because DuckDB
    * has the identical md5). `Versioning.bloomNewDocs` is the documented
    * probabilistic scale pre-pass for this query (no false negatives;
    * spec-verified bloom-new ⊆ exact-new). */
  def exactNewDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ext.Versioning.exactNewDocs(
        docs.filter(col("doc_id") < 400), docs, "doc_id", Seq("text"))
      .orderBy("doc_id")
  }

  /** Document chunking (q75): 64-token windows with 16-token overlap,
    * provenance-keyed — the context-window shaping pass before sequence
    * training or embedding. */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Chunking.chunk(Tables.documents(spark, dir), "doc_id", "text",
        chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  /** One k-means refinement step (q76) over the embeddings corpus,
    * seeded by the label cells: per-cell reassignment counts and
    * old-vs-new centroid cosine. */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansStep(Tables.embeddings(spark, dir), "vec_id",
        "embedding", "label")

  /** BPE merge candidates (q77): top-20 adjacent token pairs — the
    * first-iteration merge table of byte-pair vocabulary training. */
  def bpeMergePairs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMergePairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 20)
      .orderBy("rank")

  /** Quality-weighted deterministic sampling (q78): keep rate depends on
    * the q29 quality gate (80% for quality docs, 20% otherwise) via the
    * same affine-mod bucket as every other sampling op — the
    * quality-aware mixture step between scoring and training. Reported
    * per (is_quality): totals, kept, rate. */
  def qualityWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("is_quality"))
    val keepPct = lit(20) + col("is_quality") * 60
    scored
      .withColumn("kept",
        when(Sampling.bucket100(col("doc_id")) < keepPct, 1L).otherwise(0L))
      .groupBy("is_quality")
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
        round(sum(col("kept")).cast("double") / count(lit(1)), 4).as("kept_rate"))
      .orderBy("is_quality")
  }

  // ---- multimodal --------------------------------------------------------

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("width"), col("height"), col("n_frames"),
        col("sample_rate"), col("n_channels"))
      .orderBy("doc_id")

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.decodeMeta(
          Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text")),
        stride = 5)
      .orderBy("doc_id", "frame_idx")

  /** GIF pixel statistics (q126): LZW-expand every video payload's
    * frames and aggregate the decoded palette indices — the oracle
    * replays the payload-generation arithmetic (pixels = text bytes
    * & 0x7f, cycled across frames), so the whole container walk + LZW
    * decode is value-checked per document. */
  def gifPixelStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.gifPixelStats(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .withColumn("mean_px", graft.model.Parity.r4(
        col("sum_px").cast("double") / col("n_pixels")))
      .orderBy("doc_id")

  /** WAV audio sample statistics (q127): deinterleave every audio
    * payload's 8-bit PCM stream and aggregate per (doc, channel) — the
    * oracle replays the payload-generation arithmetic (samples = text
    * bytes, zero-padded to channel alignment), so container parse +
    * deinterleave + exact integer aggregation are value-checked end to
    * end. mean/RMS derive from the exact integer sums (no fp
    * accumulation on either side). */
  def wavAudioStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavSampleStats(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .withColumn("mean_amp", graft.model.Parity.r4(
        col("sum_amp").cast("double") / col("n_samples")))
      .withColumn("rms", graft.model.Parity.r4(
        sqrt(col("sum_sq").cast("double") / col("n_samples"))))
      .orderBy("doc_id", "channel")

  /** WAV autocorrelation (q128): per-channel lag-{1,2,4,8}
    * autocorrelation over the decoded amplitude sequence, normalized by
    * the exact integer energy R(0) — the classical periodicity feature,
    * integer-exact up to the final rounded ratio. */
  def wavAudioAutocorr(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavAutocorr(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .orderBy("doc_id", "channel")

  /** Feature-hashing vectorizer (q131): train-free signed-hashing text
    * vectors in long form, exact integer bucket sums, L2-normalized at
    * the final rounded ratio. */
  def hashingVectorize(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashingVectorize(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id", "bucket")

  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cmsHeavyHitters(Tables.documents(spark, dir), "doc_id", "text")

  def fuzzyPairs(spark: SparkSession, dir: String): DataFrame =
    TextDedup.fuzzyPairs(Tables.documents(spark, dir), "doc_id", "text")

  def shingleNovelty(spark: SparkSession, dir: String): DataFrame =
    TextDedup.shingleNovelty(Tables.documents(spark, dir), "doc_id", "text")

  def langSourceMix(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langSourceMix(Tables.documents(spark, dir), "source", "text")

  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenFertility(Tables.documents(spark, dir), "doc_id", "text")

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(Tables.documents(spark, dir), "doc_id", "text")

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

  // ---- end-to-end multimodal retrieval -----------------------------------

  /** Decoded features for the multimodal retrieval tier: attach real
    * container payloads, LZW-expand the video rows' pixels, and build
    * the exact integer-ppm pixel histogram — ONE declarative plan from
    * raw documents to a `(doc_id, Array[Long])` feature relation. */
  private def videoFeatures(spark: SparkSession, dir: String,
                            dim: Int): DataFrame =
    Multimodal.gifPixelHistogramPpm(
      Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"),
      dim)

  /** End-to-end multimodal retrieval, exact tier (q177): decode → pixel
    * histogram feature → brute-force top-k by integer dot product, all
    * one plan (the q162 composition idea applied to multimodal). The
    * probe set (video docs with id < 30) broadcasts by |Q|-bounded
    * contract; scores are exact longs (ppm·ppm ≤ 10¹² per term, dim
    * terms), so ranking has no float drift and ties break on
    * neighbor_id. Scale: candidates never shuffle — the only wide
    * stages are the narrow per-partition decode and the query-keyed
    * top-k window; [[multimodalRetrievalCelled]] is the
    * candidate-restricted scale path. */
  def multimodalRetrieval(spark: SparkSession, dir: String,
                          k: Int = 3, dim: Int = 8): DataFrame = {
    val feats = videoFeatures(spark, dir, dim)
    val queries = feats.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id"), col("features_ppm").as("qf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    feats.select(col("doc_id").as("neighbor_id"), col("features_ppm").as("cf"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qf, cf, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
      .orderBy("query_id", "rank")
  }

  /** Multimodal retrieval, celled tier (q178): IVF-style candidate
    * restriction — every vector's cell is its DOMINANT histogram bucket
    * (first argmax, a deterministic integer), and each query scores only
    * same-cell candidates via an equi join on the cell id. The bucketed
    * analogue of q38/q130: no cross product anywhere, the per-cell
    * candidate lists shuffle once on the cell key, and the oracle
    * recomputes the identical restriction (cells are exact integers, so
    * celled results hash-compare — recall vs the exact tier is specced,
    * not oracled). */
  def multimodalRetrievalCelled(spark: SparkSession, dir: String,
                                k: Int = 3, dim: Int = 8): DataFrame = {
    val cell = expr("CAST(array_position(features_ppm, array_max(features_ppm)) AS INT)")
    val feats = videoFeatures(spark, dir, dim).withColumn("cell", cell)
    val queries = feats.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id"), col("features_ppm").as("qf"),
        col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    feats.select(col("doc_id").as("neighbor_id"), col("features_ppm").as("cf"),
        col("cell"))
      .join(broadcast(queries), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qf, cf, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("score"),
        col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Multimodal retrieval through the LEARNED-EMBEDDING STAND-IN (q179):
    * decode → pixel-histogram feature → frozen-weight projection
    * ([[graft.ext.Multimodal.projectEmbedding]]) → brute top-k in the
    * EMBEDDED space — the full shape of model-based multimodal
    * retrieval (embed once, score in the low-dimensional space) with a
    * deterministic matrix standing in for trained weights, so the whole
    * chain is value-checked by the oracle rather than trusted. Scores
    * are exact longs (|emb| ≤ 8·10⁶ ⇒ dot ≤ dOut·6.4·10¹³); ties break
    * on neighbor_id. Scale: identical posture to
    * [[multimodalRetrieval]] — the probe set broadcasts, candidates
    * never shuffle, and scoring now touches dOut=4 longs per pair
    * instead of dim=8 (the embedding is the compression). */
  def multimodalEmbedRetrieval(spark: SparkSession, dir: String,
                               k: Int = 3, dIn: Int = 8,
                               dOut: Int = 4): DataFrame = {
    val emb = Multimodal.projectEmbedding(
      videoFeatures(spark, dir, dIn), "features_ppm", dIn, dOut)
    val eCols = (0 until dOut).map(i => s"e$i")
    val queries = emb.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id") +:
        eCols.map(c => col(c).as(s"q_$c")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    emb.select(col("doc_id").as("neighbor_id") +:
        eCols.map(c => col(c).as(s"c_$c")): _*)
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        eCols.map(c => col(s"q_$c") * col(s"c_$c")).reduce(_ + _))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
      .orderBy("query_id", "rank")
  }

  /** BM25 lexical search (q186): three fixed keyword queries ranked over
    * the documents corpus by the integer-exact Okapi BM25 of
    * [[graft.ext.Retrieval.bm25TopK]]. The query strings hit the
    * corpus's core vocabulary so every query retrieves a full top-10 at
    * every scale factor. */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
      Seq(1 -> "spark hash join", 2 -> "window merge sort",
        3 -> "stream batch data"), k = 10)

  /** Reciprocal-rank fusion (q189): the standard hybrid-retrieval
    * ensemble (Cormack–Clarke–Buettcher RRF) over the suite's three
    * dense rankers — exact brute (q37), sign-LSH (q38) and IVF (q49) —
    * per query:  rrf(d) = Σ_lists 1/(60 + rank_list(d)).  Scored in
    * exact integer micro-units (⌊10⁶/(60+rank)⌋ — ranks are small
    * integers, so the floor loses nothing that changes an ordering) and
    * summed as plain longs, the fused winner set is reproducible
    * value-for-value with no float anywhere. A doc missing from a list
    * simply contributes nothing (the union is the outer join); n_lists
    * reports how many rankers surfaced each hit.
    *
    * Scale shape: the inputs are the ALREADY-BOUNDED top-k relations
    * (|Q|·k rows each), so the union, the (query, doc) rollup and the
    * final rank window all cost nothing at any corpus size — fusion
    * adds zero corpus passes beyond what the three tiers already do. */
  def rrfFusion(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rrf_micro").desc, col("neighbor_id"))
    Seq(annBruteTopK(spark, dir), annLshTopK(spark, dir), annIvfTopK(spark, dir))
      .map(_.select(col("query_id"), col("neighbor_id"),
        expr("1000000 div (60 + rank)").as("c")))
      .reduce(_ unionAll _)
      .groupBy("query_id", "neighbor_id")
      .agg(sum("c").as("rrf_micro"), count(lit(1)).cast("int").as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "rrf_micro", "n_lists")
      .orderBy("query_id", "rank")
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

  /** HYBRID lexical+dense retrieval fusion (q220) — the shape every
    * RAG/curation pipeline actually runs: BM25 over the text index and
    * cosine over the embedding index answer the SAME query set, and
    * reciprocal-rank fusion merges the two rankings. Query-by-example:
    * the ten query documents (doc_id < 10 — the q37 query contract;
    * documents and embeddings are id-aligned) supply their TEXT to the
    * lexical tier ([[graft.ext.Retrieval.bm25TopKDf]], query terms
    * deduplicated, self-hit excluded, top-10) and their VECTOR to the
    * dense tier (the q37 exact brute top-5), and each hit scores
    * Σ_lists ⌊10⁶/(60+rank)⌋ — the q189 integer micro-unit RRF, no
    * float anywhere; n_lists says which hits both tiers agree on.
    *
    * Scale shape: the two tiers' own contracts (inverted-index partial
    * aggs; broadcast query side) bound the work; fusion itself touches
    * only the two ALREADY-BOUNDED |Q|·k relations — zero extra corpus
    * passes, the q189 guarantee extended across modalities. */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val qdocs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val lex = Retrieval.bm25TopKDf(docs, "doc_id", "text", qdocs, k = 10,
        excludeQueryDoc = true)
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rank"))
    val dense = annBruteTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("neighbor_id"))
    Seq(lex, dense)
      .map(_.select(col("query_id"), col("neighbor_id"),
        expr("1000000 div (60 + rank)").as("c")))
      .reduce(_ unionAll _)
      .groupBy("query_id", "neighbor_id")
      .agg(sum("c").as("rrf_micro"), count(lit(1)).cast("int").as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "rrf_micro", "n_lists")
      .orderBy("query_id", "rank")
  }

  /** SEMANTIC dedup end-to-end (q221) — the SemDeDup shape (Abbas et
    * al. 2023): near-duplicates by embedding-space similarity rather
    * than lexical shingles, composed from the suite's own tiers:
    * sign-LSH buckets over the embedding column → within-bucket
    * cosine-verified pairs ([[graft.ext.Similarity.nearDupPairs]],
    * threshold 0.40 on the 4-dp rounded cosine — splits the bucketed
    * pair population's heavy tail at every scale factor) → connected
    * components → keep-best. The survivor per cluster is the most
    * CENTRAL member — the one with the largest sum of verified-pair
    * cosines to other members (exact e4 integers; ties to the smallest
    * vec_id) — the "keep the representative" rule, where the lexical
    * q184 kept the longest text.
    *
    * Scale shape: pair volume is bucket-bounded (Σ per-bucket n², never
    * corpus²) with the bucket computed scan-side; label propagation is
    * per-round keyed joins over the pair edges only; the centrality and
    * survivor aggregations touch |pairs| and |cluster members| rows —
    * everything after verification is metadata-scale. */
  def semanticDedup(spark: SparkSession, dir: String,
                    threshold: Double = 0.40): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        "bucket", threshold)
      .localCheckpoint() // read 2×: component edges + centrality rollup
    val cc = graft.operators.ConnectedComponents.labelPropagation(
      pairs, "id_a", "id_b")
    val cent = pairs
      .select(col("id_a").as("node"),
        round(col("cos") * 10000, 0).cast("long").as("c"))
      .unionAll(pairs.select(col("id_b").as("node"),
        round(col("cos") * 10000, 0).cast("long").as("c")))
      .groupBy("node").agg(sum("c").as("cent_e4"))
    cc.join(cent, Seq("node"))
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        max_by(struct(col("node").as("d"), col("cent_e4").as("s")),
          struct(col("cent_e4"), -col("node"))).as("kept"),
        sum("cent_e4").as("total_cent_e4"))
      .select(col("cluster_id"), col("n_members"),
        col("kept.d").as("kept_vec"), col("kept.s").as("kept_cent_e4"),
        (col("n_members") - 1).cast("long").as("n_dropped"))
      .orderBy("cluster_id")
  }

  /** Frozen-weight RERANKER over the hybrid candidates (q224) — the
    * second stage of the retrieve→rerank pipeline every production
    * search/RAG stack runs: the cheap first stage (q220's hybrid RRF)
    * nominates a small candidate set, and a LEARNED scorer re-orders
    * it. The scorer here is a low-rank bilinear form in the q179
    * stand-in contract: score(q, d) = (P·q)·(P·d) with P the 4×64
    * deterministic integer matrix W(k,j) (the `embedWeight` closed
    * form) — exactly the execution shape of a late-interaction /
    * two-tower reranker (project both sides through frozen weights,
    * dot the projections), with the trained matrix swapped for a
    * literal one so the whole chain stays oracle-checked. Ranking key
    * is the 4-dp rounded score (reproducible, the cosine-tier
    * contract), ties to the smallest neighbor id; `rrf_rank` rides
    * along so rank movement is visible.
    *
    * Scale shape: candidates are the ALREADY-BOUNDED |Q|·k fused rows;
    * the two projection joins are id-keyed against the embeddings
    * relation (candidate side broadcast by AQE at any corpus size), and
    * the 4-component projections are scan-side dot products against
    * literal weight arrays — reranking adds zero corpus shuffles. */
  def rerankFused(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val fused = hybridRrf(spark, dir, k)
      .select(col("query_id"), col("rank").as("rrf_rank"), col("neighbor_id"))
    def wRow(kk: Int) = array((0 until 64).map(j =>
      lit(Multimodal.embedWeight(kk, j).toFloat)): _*)
    def projected(idAlias: String, prefix: String) =
      Tables.embeddings(spark, dir).select(
        col("vec_id").as(idAlias) +:
          (0 until 4).map(kk =>
            Similarity.dot(col("embedding"), wRow(kk)).as(s"$prefix$kk")): _*)
    // LEFT join on the candidate side: a lexical hit with no embedding
    // row (the corpora need not be 1:1) cannot be scored, but silently
    // dropping a nominated candidate would shrink the result — it keeps
    // its slot at the tail of the list instead (NULL score, ranked
    // after every scored candidate, ties by id). Query docs always have
    // vectors by the q37 contract, so that side stays inner.
    fused
      .join(projected("neighbor_id", "d"), Seq("neighbor_id"), "left_outer")
      .join(projected("query_id", "q"), Seq("query_id"))
      .withColumn("rerank_score", round(
        (0 until 4).map(kk => col(s"q$kk") * col(s"d$kk")).reduce(_ + _), 4))
      .withColumn("rerank_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("rerank_score").desc_nulls_last,
            col("neighbor_id"))).cast("int"))
      .select(col("query_id"), col("rerank_rank"), col("neighbor_id"),
        col("rerank_score"), col("rrf_rank").cast("int").as("rrf_rank"))
      .orderBy("query_id", "rerank_rank")
  }

  /** Frozen-weight quality classifier over the corpus (q222): the q131
    * hashed features scored by
    * [[graft.ext.TextAnalysis.qualityClassifier]] — per-doc integer
    * logits, argmax class, margin. Closes the model-scored-filter
    * archetype under the q179 stand-in contract. */
  def qualityClassify(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityClassifier(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy("doc_id")

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

  /** MMR-DIVERSIFIED top-k (q228) — maximal marginal relevance
    * (Carbonell–Goldstein 1998), the de-dup-at-selection step RAG and
    * search stacks run so the final k hits aren't k copies of the same
    * answer: greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)
    * with λ=0.7, five unrolled selection rounds (both engines run the
    * SAME five — the fixed-round contract), relevance = exact-cosine
    * rank scores over the q37 query set's top-10 candidates, all
    * similarities quantized once to e4 integers so every objective is
    * exact integer arithmetic (7·rel_e4 − 3·maxsim_e4) with ties to
    * the smallest id.
    *
    * Scale shape: candidates are the bounded |Q|·10 relation; the
    * pairwise-sim table is |Q|·10·9 rows (selection needs
    * candidate-candidate sims — bounded by the CANDIDATE count, never
    * the corpus); each greedy round is an anti join + a keyed max —
    * metadata-scale after the one corpus pass the brute tier already
    * pays. */
  def mmrDiversified(spark: SparkSession, dir: String, kCand: Int = 10,
                     kOut: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cands = Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", kCand)
      .select(col("query_id"), col("neighbor_id").as("cid"),
        round(col("score") * 10000, 0).cast("long").as("rel_e4"))
      .localCheckpoint() // read every greedy round
    val ce = cands.join(
      emb.select(col("vec_id").as("cid"), col("embedding").as("e"),
        Similarity.l2norm(col("embedding")).as("n")), Seq("cid"))
    val a = ce.select(col("query_id"), col("cid").as("a"),
      col("e").as("ea"), col("n").as("na"))
    val b = ce.select(col("query_id"), col("cid").as("b"),
      col("e").as("eb"), col("n").as("nb"))
    val sims = a.join(b, Seq("query_id")).filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(Similarity.dot(col("ea"), col("eb")) /
          (col("na") * col("nb")) * 10000, 0).cast("long").as("sim_e4"))
      .localCheckpoint() // read every greedy round
    var sel = cands.groupBy("query_id")
      .agg(max_by(col("cid"), struct(col("rel_e4"), -col("cid"))).as("cid"))
      .withColumn("mmr_rank", lit(1))
    for (t <- 2 to kOut) {
      val remaining = cands
        .join(sel.select("query_id", "cid"), Seq("query_id", "cid"),
          "left_anti")
      val ms = remaining
        .join(sims.select(col("query_id"), col("a").as("cid"),
          col("b").as("scid"), col("sim_e4")), Seq("query_id", "cid"))
        .join(sel.select(col("query_id"), col("cid").as("scid")),
          Seq("query_id", "scid"))
        .groupBy("query_id", "cid").agg(max("sim_e4").as("maxsim"))
      val pick = remaining.join(ms, Seq("query_id", "cid"), "left_outer")
        .withColumn("obj_e4",
          col("rel_e4") * 7 - lit(3L) * coalesce(col("maxsim"), lit(0L)))
        .groupBy("query_id")
        .agg(max_by(col("cid"), struct(col("obj_e4"), -col("cid"))).as("cid"))
        .withColumn("mmr_rank", lit(t))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.join(cands, Seq("query_id", "cid"))
      .select(col("query_id"), col("mmr_rank").cast("int").as("mmr_rank"),
        col("cid").as("neighbor_id"), col("rel_e4"))
      .orderBy("query_id", "mmr_rank")
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

  /** Per-source DATA CARD (q231) — the datasheet row a corpus release
    * publishes per source (Gebru et al.'s "Datasheets for Datasets",
    * operationalized): document count, token volume, tokens/doc,
    * heuristic-quality rate, exact-duplicate rate (md5 of normalized
    * text, WITHIN source), and the majority predicted language with
    * its share — one governance-ready row per source, composed from
    * the suite's own per-doc components (q28 tokens, q29 quality, q30
    * langid, q32's dedup idea) rather than re-derived.
    *
    * Scale shape: each component is a zero-shuffle scored projection;
    * the compositions join on the doc key, the rollups on the source
    * key, and every post-aggregation relation is |sources|-sized. All
    * rates are exact floor-ppm integers. */
  def sourceDataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perDoc = docs.select(col("doc_id"), col("source"))
      .join(TextAnalysis.tokenStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_ws_tokens")), Seq("doc_id"))
      .join(TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("is_quality")), Seq("doc_id"))
      .join(TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang")), Seq("doc_id"))
      .localCheckpoint() // read 2x: base rollup + language mix
    val base = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_ws_tokens").cast("long")).as("total_tokens"),
      sum(col("is_quality").cast("long")).as("nq"))
    val lang = perDoc.groupBy("source", "predicted_lang")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("c").desc, col("predicted_lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("predicted_lang").as("top_lang"),
        col("c").as("top_n"))
    val dup = docs
      .select(col("source"), md5(TextOps.normText(col("text"))).as("h"))
      .groupBy("source", "h").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_dup"))
    base.join(lang, Seq("source")).join(dup, Seq("source"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("total_tokens"),
        expr("total_tokens * 1000000 div n_docs").as("tokens_per_doc_micro"),
        expr("nq * 1000000 div n_docs").as("quality_ppm"),
        expr("n_dup * 1000000 div n_docs").as("dup_ppm"),
        col("top_lang"),
        expr("top_n * 1000000 div n_docs").as("top_lang_ppm"))
      .orderBy("source")
  }

  /** Sorted-neighborhood dedup (q191): SimHash-sorted blocked windows
    * generate a flat 3N candidate set, exact 3-gram Jaccard verifies;
    * 0.5 splits the sharply bimodal candidate population (background
    * ~0.01, true near-dups ~0.95) at every scale factor. */
  def snmPairs(spark: SparkSession, dir: String): DataFrame =
    TextDedup.sortedNeighborhoodPairs(Tables.documents(spark, dir),
      "doc_id", "text")

  /** Jensen–Shannon divergence matrix (q196): pairwise JSD between the
    * sources' token distributions in exact integer micro-nats — the
    * symmetric bounded drift statistic data-mixing reports lead with. */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.jsDivergenceMatrix(Tables.documents(spark, dir),
      "source", "text")

  /** Multi-probe LSH retrieval (q192): the q38 sign-LSH tier probing
    * each query's bucket plus its 4 Hamming-1 neighbors, recall-flagged
    * against the exact top-3. */
  def multiProbeLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.multiProbeLshTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 3)
  }

  /** Token-budget waterfilling (q204): allocate 50% of the corpus's
    * whitespace tokens across sources, no source above 30% of the
    * budget, excess redistributed proportionally —
    * [[graft.ext.Sampling.waterfillBudget]] over per-source token
    * counts. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.ext.TextOps.tokens(
          graft.ext.TextOps.normText(col("text")))).cast("long").as("tk"))
      .groupBy("source").agg(sum("tk").as("tk"))
    Sampling.waterfillBudget(counts, "source", "tk")
  }

  /** Curriculum quartile bins (q205): per-source equi-depth quality
    * quartiles (stopword-ratio score) with token budgets —
    * [[graft.ext.TextAnalysis.curriculumBins]]. */
  def curriculumBins(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.curriculumBins(Tables.documents(spark, dir),
      "source", "doc_id", "text")

  /** PMI collocations (q206): top adjacent word pairs by pointwise
    * mutual information in micro-nats —
    * [[graft.ext.TextAnalysis.pmiCollocations]]. */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(Tables.documents(spark, dir),
      "doc_id", "text")

  /** Percentile-rank quality normalization (q208) — the feature
    * transform that makes per-source quality scores COMPARABLE across
    * sources whose raw score distributions differ (a web crawl and a
    * books corpus don't share a stopword-ratio scale): each document's
    * score becomes its exact within-source percentile rank
    * (rank−1)·10⁶ div (n−1) — 0 for the best-ranked, 10⁶ for the worst
    * — over the (score desc, doc_id) total order, so ranks are unique
    * and both engines floor the identical rational. One scored scan
    * projection + one source-partitioned window; single-document
    * sources pin to 0 rather than divide by zero. */
  def percentileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = graft.ext.TextOps.normText(col("text"))
    val toks = graft.ext.TextOps.tokens(t)
    val nTokens = size(toks).cast("long")
    val nStop = size(org.apache.spark.sql.functions.filter(toks,
      w => w.isInCollection(TextAnalysis.Stopwords))).cast("long")
    val w = Window.partitionBy("source")
      .orderBy(col("score_ppm").desc, col("doc_id"))
    val cw = Window.partitionBy("source")
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), nTokens.as("n_tokens"),
        nStop.as("n_stop"))
      .withColumn("score_ppm",
        expr("n_stop * 1000000 div greatest(n_tokens, 1)"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .select(col("source"), col("doc_id"),
        col("score_ppm").cast("long").as("score_ppm"),
        expr("CAST((rk - 1) * 1000000 div greatest(n - 1, 1) AS BIGINT)")
          .as("pct_ppm"))
      .orderBy("source", "doc_id")
  }

  /** Leakage-free eval split (q219): the composition every benchmark
    * pipeline needs and the pieces alone don't give — an 80/20
    * train/eval hash split (q44/q63's append-stable affine buckets)
    * where any eval document sharing a MinHash LSH band bucket with ANY
    * train document is EXCLUDED from eval. A hash split alone guarantees
    * disjoint doc_ids, not disjoint CONTENT: near-duplicates straddle
    * the split boundary and leak training text into the benchmark
    * (the q58 decontamination problem, applied at split time instead of
    * after the fact). Band buckets are the q34 scan-side kernel
    * signatures — no pair enumeration at all here; a candidate
    * COLLISION is grounds for exclusion (recall over precision: evicting
    * a false-positive eval doc costs a row, keeping a false-negative
    * poisons the benchmark).
    *
    * Scale shape: one kernel projection to (doc, band, band_hash), two
    * split-filtered semi/anti joins keyed on the band bucket — the only
    * shuffles carry 16-byte band rows, never documents. Docs too short
    * to shingle emit no bands and can never collide; they stay in eval
    * by construction (stated, not accidental). */
  def leakFreeEvalSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bucket = Sampling.bucket100(col("doc_id"))
    val bands = TextDedup.minhashBands(docs, "doc_id", "text")
      .withColumn("bucket", Sampling.bucket100(col("doc_id")))
    val trainBuckets = bands.filter(col("bucket") < 80)
      .select("band", "band_hash").distinct()
    val leaky = bands.filter(col("bucket") >= 80)
      .join(trainBuckets, Seq("band", "band_hash"), "left_semi")
      .select("doc_id").distinct()
    docs.filter(bucket >= 80)
      .join(leaky, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Classifier evaluation harness (q235): confusion matrix and
    * per-class precision/recall/F1 (exact floor ppm) of the q222
    * frozen-weight classifier against the 3-class
    * [[graft.ext.TextAnalysis.ruleQualityLabel]] rule gate — the eval
    * loop that turns "the classifier produces classes" into "and here
    * is how well they track the rule labels". */
  def classifierEvalReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.classifierEval(Tables.documents(spark, dir), "doc_id", "text")

  /** BPE encode (q232): six fixed merge rounds over the corpus word
    * vocabulary via [[graft.ext.Bpe.bpeSegment]] — the top-40 words by
    * frequency with their learned segmentations and corpus-weighted
    * piece counts. Closes the tokenizer archetype q112 only proxies. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    Bpe.bpeSegment(Tables.documents(spark, dir), "doc_id", "text",
      rounds = 6, topWords = 40)

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

  /** INCREMENTAL semantic dedup (q234) — the q124/q125 differential
    * pattern applied to q221's SemDeDup: the even-id half of the
    * embeddings table is the PERSISTED bucketed state, the odd half
    * arrives as the daily batch, and only batch buckets are probed —
    * against the state (any state match dedups the new doc) and
    * batch-internally (the earlier-arriving, smaller-id doc wins, the
    * q124 keep-first rule). Per NEW doc: state/batch duplicate counts,
    * the best match (highest verified cosine, ties to the smallest id)
    * and the drop decision — the operating readout of a daily delta at
    * 100 TB, where full-corpus reclustering (q221) is the weekly job
    * and this is the per-batch one.
    *
    * Scale shape: buckets are computed scan-side on the BATCH only
    * (the state's are persisted); pair volume is Σ per-bucket
    * |batch|·|state| + |batch|² — bucket-bounded, never corpus²; the
    * rollup is batch-doc-keyed. */
  def semanticDedupIncremental(spark: SparkSession, dir: String,
                               threshold: Double = 0.40): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket",
        Similarity.bucketCol(col("embedding"), nPlanes = 4, dim = 64))
      .withColumn("nrm", Similarity.l2norm(col("embedding")))
      .localCheckpoint() // read 3x: state leg, batch leg x2
    val state = emb.filter(col("vec_id") % 2 === 0)
      .select(col("bucket"), col("vec_id").as("other"),
        col("embedding").as("o_emb"), col("nrm").as("o_nrm"))
    val batch = emb.filter(col("vec_id") % 2 === 1)
      .select(col("bucket"), col("vec_id").as("vid"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    def verified(pairs: DataFrame, fromState: Int) = pairs
      .withColumn("cos", round(
        Similarity.dot(col("b_emb"), col("o_emb")) /
          (col("b_nrm") * col("o_nrm")), 4))
      .filter(col("cos") >= threshold)
      .select(col("vid"), col("other"),
        round(col("cos") * 10000, 0).cast("long").as("cos_e4"),
        lit(fromState).as("from_state"))
    val sb = verified(batch.join(state, Seq("bucket")), 1)
    val batchEarlier = batch.select(col("bucket"), col("vid").as("other"),
      col("b_emb").as("o_emb"), col("b_nrm").as("o_nrm"))
    val bb = verified(
      batch.join(batchEarlier, Seq("bucket"))
        .filter(col("other") < col("vid")), 0)
    val matches = sb.unionAll(bb).localCheckpoint() // counts + best
    val agg = matches.groupBy("vid")
      .agg(sum(col("from_state")).as("n_dup_state"),
        sum(lit(1L) - col("from_state")).as("n_dup_batch"),
        max_by(struct(col("other").as("m"), col("cos_e4").as("c")),
          struct(col("cos_e4"), -col("other"))).as("best"))
    batch.select(col("vid"))
      .join(agg, Seq("vid"), "left")
      .select(col("vid").as("vec_id"),
        coalesce(col("n_dup_state"), lit(0L)).as("n_dup_state"),
        coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"),
        col("best.m").as("best_match"), col("best.c").as("best_cos_e4"),
        when(col("best").isNotNull, 1).otherwise(0).cast("int").as("dropped"))
      .orderBy("vec_id")
  }

  /** BPE ordered merge table (q237): the frozen merge list q232's
    * training produces — per round the argmax adjacent symbol pair with
    * its weighted count ([[graft.ext.Bpe.bpeMergeTable]]). */
  def bpeMergeList(spark: SparkSession, dir: String): DataFrame =
    Bpe.bpeMergeTable(Tables.documents(spark, dir), "doc_id", "text",
      rounds = 6)

  /** Corpus-wide BPE application rate per source (q238):
    * [[graft.ext.Bpe.bpeApplyRate]] — the word→pieces map broadcast
    * onto the token stream, fertility + chars-per-piece per source. */
  def bpeApplyReport(spark: SparkSession, dir: String): DataFrame =
    Bpe.bpeApplyRate(Tables.documents(spark, dir), "source", "text",
      rounds = 6)

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
    var labeled = all.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("label"), lit(0).as("assigned_round"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val newly = edges
        .join(labeled.select(col("vec_id").as("v"), col("label")), Seq("v"))
        .join(labeled.select(col("vec_id").as("u")), Seq("u"), "left_anti")
        .groupBy(col("u"), col("label")).agg(sum("w").as("s"))
        .groupBy("u")
        .agg(min_by(col("label"), struct(-col("s"), col("label"))).as("label"))
        .select(col("u").as("vec_id"), col("label"),
          lit(r).as("assigned_round"))
      labeled = labeled.unionAll(newly).localCheckpoint()
    }
    all.select("vec_id")
      .join(labeled, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("assigned_round") === 0, 1).otherwise(0).cast("int")
          .as("is_seed"),
        col("label"), col("assigned_round"))
      .orderBy("vec_id")
  }

  /** TOKEN-BUDGET greedy selection (q240) — "fill half the training
    * budget with the best documents": every doc scored by the q205
    * stopword-ratio quality proxy (exact floor ppm), globally ordered
    * by (score desc, doc_id), and kept while the running token total
    * stays within a POPULATION-RELATIVE budget (half the corpus's
    * tokens — non-vacuous at every scale factor, the q155 lesson). The
    * running total is the q59 two-pass [[graft.operators.PrefixSum]],
    * NOT an unpartitioned window — the plan survives any corpus size.
    * Output: per (source, kept) — docs, tokens, and the budget the
    * selection ran under, the mixture readout a data-budget report
    * leads with. */
  def tokenBudgetSelection(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = TextOps.normText(col("text"))
    val toks = TextOps.tokens(t)
    val scored = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        size(org.apache.spark.sql.functions.filter(toks,
          w => w.isInCollection(TextAnalysis.Stopwords))).cast("long")
          .as("n_stop"))
      .withColumn("score_ppm",
        expr("n_stop * 1000000 div greatest(n_tokens, 1)"))
    val withPrefix = graft.operators.PrefixSum.exclusive(scored,
      "score_ppm", descending = true, ties = Seq(col("doc_id")),
      valueCol = "n_tokens", outCol = "prefix_tokens")
    val budget = scored.agg(expr("sum(n_tokens) div 2").as("budget"))
    withPrefix.crossJoin(broadcast(budget))
      .withColumn("kept",
        when(col("prefix_tokens") + col("n_tokens") <= col("budget"), 1)
          .otherwise(0).cast("int"))
      .groupBy("source", "kept")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
        min("score_ppm").as("min_score_ppm"),
        max("score_ppm").as("max_score_ppm"),
        max("budget").as("budget_tokens"))
      .select(col("source"), col("kept"),
        col("n_docs").cast("long").as("n_docs"),
        col("tokens").cast("long").as("tokens"),
        col("min_score_ppm").cast("long").as("min_score_ppm"),
        col("max_score_ppm").cast("long").as("max_score_ppm"),
        col("budget_tokens").cast("long").as("budget_tokens"))
      .orderBy("source", "kept")
  }

  /** Multi-round k-means with convergence certificate (q236):
    * [[graft.ext.Similarity.kmeansRounds]] — four fixed Lloyd rounds
    * over the embeddings corpus seeded by the label cells, per-cluster
    * membership/arrival/inertia report with the q223-style `converged`
    * fixpoint flag. Finishes the clustering primitive q76 started. */
  def kmeansConverged(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansRounds(Tables.embeddings(spark, dir), "vec_id",
      "embedding", "label", rounds = 4)

  /** Classifier calibration bins (q241):
    * [[graft.ext.TextAnalysis.calibrationBins]] — the q222 frozen
    * classifier's margin-binned agreement curve against the q235 rule
    * labels, the reliability diagram behind a margin cutoff. */
  def calibrationReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.calibrationBins(Tables.documents(spark, dir), "doc_id",
      "text", binWidth = 40L)

  /** PSI drift per source (q242):
    * [[graft.ext.TextAnalysis.psiDrift]] — population stability index
    * of the token-count distribution, even-id reference half vs odd-id
    * current half, completing the drift triad with q139 (KS) and q196
    * (JSD). */
  def psiDriftReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.psiDrift(Tables.documents(spark, dir), "doc_id",
      "source", "text", binTokens = 16L)

  /** DSIR importance selection (q243):
    * [[graft.ext.TextAnalysis.dsirWeights]] — hashed-unigram importance
    * weights toward the `lang = 'en'` target slice, top-40 most
    * target-like docs (Xie et al. 2023). */
  def dsirSelection(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeights(Tables.documents(spark, dir), "doc_id",
      "source", "lang", "text", dim = 64, topK = 40)

  /** LSH candidate eval (q244):
    * [[graft.ext.TextDedup.lshCandidateEval]] — precision/recall of the
    * MinHash band-collision candidate tier vs the exact df-capped
    * char-8-gram Jaccard ground truth at thresholds 0.5 / 0.8 (the
    * banding S-curve, measured). */
  def lshCandidateReport(spark: SparkSession, dir: String): DataFrame =
    TextDedup.lshCandidateEval(Tables.documents(spark, dir), "doc_id",
      "text", k = 8, thresholds = Seq(0.5, 0.8))

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

  /** Clustering quality vs labels (q247):
    * [[graft.ext.Similarity.kmeansClusterEval]] — per-cluster purity
    * and global NMI of the q236 final assignment against the label
    * column. */
  def clusterEvalReport(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansClusterEval(Tables.embeddings(spark, dir), "vec_id",
      "embedding", "label", rounds = 4)

  /** QUALITY THRESHOLD SWEEP (q249) — the filter-tuning curve: docs
    * binned by the q240 stopword-ratio score (fixed width 50k ppm, so
    * ≤ 21 bins at ANY corpus size), per bin the doc/token volumes plus
    * the CUMULATIVE volumes retained if the quality gate were set at
    * that bin's lower edge (keep score ≥ bin·50k) — "which threshold
    * hits my token budget", the dual of q240's budget-first selection.
    * The cumulative sums come from a nonequi self-join of the BIN
    * relation against itself — bounded 21×21 by construction (the bin
    * count is fixed by the ppm width, independent of the corpus), so
    * the broadcast nested-loop is metadata work, never a window over
    * data.
    *
    * Scale shape: one scan-side score projection, one bin-keyed count;
    * everything after runs on ≤ 21 rows. */
  def qualityThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = TextOps.normText(col("text"))
    val toks = TextOps.tokens(t)
    val scored = docs.select(
        size(toks).cast("long").as("n_tokens"),
        size(org.apache.spark.sql.functions.filter(toks,
          w => w.isInCollection(TextAnalysis.Stopwords))).cast("long")
          .as("n_stop"))
      .withColumn("score_ppm",
        expr("n_stop * 1000000 div greatest(n_tokens, 1)"))
      .withColumn("bin", expr("score_ppm div 50000"))
    val bins = scored.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .localCheckpoint() // <= 21 rows; read by cum join (both sides) + total
    val tot = bins.agg(sum("tokens").as("tt"))
    val cum = bins.select(col("bin"))
      .join(bins.select(col("bin").as("b2"), col("n_docs").as("nd2"),
        col("tokens").as("tk2")), col("b2") >= col("bin"))
      .groupBy("bin")
      .agg(sum("nd2").as("cum_docs"), sum("tk2").as("cum_tokens"))
    bins.join(cum, Seq("bin")).crossJoin(broadcast(tot))
      .select(col("bin").cast("long").as("bin"),
        (col("bin") * 50000).cast("long").as("threshold_ppm"),
        col("n_docs").cast("long").as("n_docs"),
        col("tokens").cast("long").as("tokens"),
        col("cum_docs").cast("long").as("cum_docs"),
        col("cum_tokens").cast("long").as("cum_tokens"),
        expr("cum_tokens * 1000000 div tt").as("cum_token_share_ppm"))
      .orderBy("bin")
  }

  /** CAPPED TOKEN-BUDGET selection (q261) — q240's greedy budget with
    * a FAIRNESS constraint: fill half the corpus's tokens with the
    * best-scoring documents, but no source may contribute more than
    * 70% of ITS OWN tokens (the anti-capture rule a mixture curator
    * actually runs — pure greedy lets one verbose source eat the
    * budget). A doc is kept iff BOTH its global positional prefix fits
    * the budget AND its within-source positional prefix fits the
    * source cap — the q240 positional-prefix convention on both
    * constraints (prefixes accumulate over dropped docs too; stated,
    * exactly replayable). Global prefix = the two-pass
    * [[graft.operators.PrefixSum]]; source prefix = a SOURCE-KEYED
    * window (bounded per-key state) — no unpartitioned window
    * anywhere. Per (source, kept): volumes plus both binding limits,
    * so the readout shows WHICH constraint bit.
    *
    * Scale shape: one scan-side score projection, the q59 two-pass
    * prefix, one source-keyed window sharing the same sort order, a
    * 1-row budget broadcast and a |sources|-row cap join. */
  def cappedBudgetSelection(spark: SparkSession, dir: String,
                            budgetPpm: Long = 500000L,
                            srcCapPpm: Long = 700000L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = TextOps.normText(col("text"))
    val toks = TextOps.tokens(t)
    val scored = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        size(org.apache.spark.sql.functions.filter(toks,
          w => w.isInCollection(TextAnalysis.Stopwords))).cast("long")
          .as("n_stop"))
      .withColumn("score_ppm",
        expr("n_stop * 1000000 div greatest(n_tokens, 1)"))
    val withGlobal = graft.operators.PrefixSum.exclusive(scored,
      "score_ppm", descending = true, ties = Seq(col("doc_id")),
      valueCol = "n_tokens", outCol = "g_prefix")
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withSrc = withGlobal.withColumn("s_prefix",
      coalesce(sum("n_tokens").over(sw), lit(0L)))
    val budget = scored.agg(
      expr(s"sum(n_tokens) * $budgetPpm div 1000000").as("budget"))
    val caps = scored.groupBy("source")
      .agg(expr(s"sum(n_tokens) * $srcCapPpm div 1000000").as("src_cap"))
    withSrc.crossJoin(broadcast(budget))
      .join(broadcast(caps), Seq("source"))
      .withColumn("kept",
        when(col("g_prefix") + col("n_tokens") <= col("budget") &&
          col("s_prefix") + col("n_tokens") <= col("src_cap"), 1)
          .otherwise(0).cast("int"))
      .groupBy("source", "kept")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
        max("budget").as("budget_tokens"), max("src_cap").as("src_cap_tokens"))
      .select(col("source"), col("kept"),
        col("n_docs").cast("long").as("n_docs"),
        col("tokens").cast("long").as("tokens"),
        col("budget_tokens").cast("long").as("budget_tokens"),
        col("src_cap_tokens").cast("long").as("src_cap_tokens"))
      .orderBy("source", "kept")
  }

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

  /** CHUNK RETRIEVAL with document max-pooling (q259) — the RAG-stack
    * passage search: documents split into the q75 sliding chunks
    * (64 tokens, stride 48), BM25 scored AT CHUNK GRANULARITY against
    * the q186 queries, then max-pooled to documents — rank by the best
    * chunk's score (ties smaller doc), reporting WHICH chunk won and
    * how many of the doc's chunks matched at all. Long documents stop
    * burying their relevant passage in their length normalization
    * (chunk dl ≤ 64 regardless of doc size) — the reason RAG stacks
    * index passages, made measurable. Chunk ids pack as
    * doc_id·10⁶ + chunk_idx (stated bound: < 10⁶ chunks per doc).
    *
    * Scale shape: the chunk relation is the corpus × (1/stride)
    * fan-out the chunking tier already pays; the BM25 shapes are
    * q186's on that relation; pooling is one (query, doc)-keyed agg of
    * the scored sliver; the final rank is a per-query keyed window. */
  def chunkRetrieval(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val chunks = graft.ext.Chunking.chunk(Tables.documents(spark, dir),
        "doc_id", "text", chunkTokens = 64, overlap = 16)
      .select((col("doc_id") * 1000000L + col("chunk_idx")).as("doc_id"),
        col("chunk_text").as("text"))
    val queries = Seq(1 -> "spark hash join", 2 -> "window merge sort",
      3 -> "stream batch data").toDF("query_id", "qtext")
    val pooled = Retrieval.bm25Scores(chunks, "doc_id", "text", queries)
      .select(col("query_id"), expr("doc_id div 1000000").as("doc"),
        expr("doc_id % 1000000").as("chunk_idx"), col("score_e12"))
      .groupBy("query_id", "doc")
      .agg(max("score_e12").as("best_score_e12"),
        min_by(col("chunk_idx"),
          org.apache.spark.sql.functions.struct(-col("score_e12"),
            col("chunk_idx"))).as("best_chunk"),
        count(lit(1)).as("n_chunks_hit"))
    pooled.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("best_score_e12").desc, col("doc"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc").as("doc_id"),
        col("best_chunk").cast("long").as("best_chunk"),
        col("best_score_e12").cast("long").as("best_score_e12"),
        col("n_chunks_hit").cast("long").as("n_chunks_hit"))
      .orderBy("query_id", "rank")
  }

  /** GOPHER-STYLE REPEATED-SPAN SCRUB accounting (q260, the Rae et al.
    * within-document repetition filter made exact): per document,
    * every 4-gram occurrence AFTER the first occurrence of that same
    * 4-gram (by position, within the document) is a repeated span; the
    * scrub drops the union of their token positions. Reported per
    * source: docs affected, token volumes before/after, and the
    * reduction in exact floor ppm — the dedup-inside-the-document
    * counterpart of the across-document tiers (q32..), which they
    * cannot see by construction.
    *
    * Scale shape: the position stream is a scan-side kernel projection
    * (per-position 4-gram hashes); first-occurrence marking is one
    * doc+hash-keyed window (per-key state bounded by within-doc
    * repeats); covered positions explode 4 rows per repeated
    * occurrence and collapse by (doc, pos); all rollups doc- then
    * source-keyed. */
  def repeatScrub(spark: SparkSession, dir: String, n: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = TextOps.tokens(TextOps.normText(col("text")))
    val base = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.TextKernelOps.wordNgramHashFull(
          TextOps.normText(col("text")), n).as("hs"))
      .localCheckpoint() // read by the span leg + the per-doc rollup
    val occ = base.select(col("doc_id"),
      posexplode(col("hs")).as(Seq("pos", "h")))
    val rep = occ.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id", "h").orderBy("pos")))
      .filter(col("rn") >= 2)
    val covered = rep.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
    base.select(col("doc_id"), col("source"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_removed"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("n_affected"),
        sum("n_tokens").as("tokens_before"),
        sum(col("n_tokens") - col("n_removed")).as("tokens_after"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("n_affected").cast("long").as("n_affected"),
        col("tokens_before").cast("long").as("tokens_before"),
        col("tokens_after").cast("long").as("tokens_after"),
        expr("(tokens_before - tokens_after) * 1000000 div tokens_before")
          .as("removed_ppm"))
      .orderBy("source")
  }

  /** Conformal selective prediction (q256):
    * [[graft.ext.TextAnalysis.conformalSelective]] — even-half
    * calibrated margin threshold (α = 10%), odd-half accept/abstain
    * readout per predicted class. */
  def conformalReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.conformalSelective(Tables.documents(spark, dir),
      "doc_id", "text")

  /** PRF retrieval (q254): [[graft.ext.Retrieval.bm25PrfTopK]] —
    * query-by-example (doc_id < 10) BM25 with pseudo-relevance
    * feedback: top-5 feedback docs, 3 expansion terms, rescored
    * top-5. */
  def bm25PrfSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Retrieval.bm25PrfTopK(docs, "doc_id", "text",
      docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text").as("qtext")),
      k = 5, kFb = 5, nExp = 3)
  }

  /** NEYMAN ALLOCATION (q255) — variance-optimal stratified sampling
    * design (Neyman 1934): given a total sample budget (10% of the
    * corpus), allocate per-source sample sizes n_h ∝ N_h·σ_h (σ = the
    * population SD of the token-count metric within the stratum) —
    * the design that minimizes the estimator variance for a fixed
    * budget, vs the proportional allocation (n_h ∝ N_h) also reported
    * for contrast. Exact-integer contract: per stratum the sufficient
    * statistics (N, Σx, Σx²) are exact longs; σ quantizes once to
    * round-e6 via the identical-doubles idiom (sqrt of the SAME
    * integer variance numerator on both engines); every allocation is
    * a floor division of integer products, clamped to the stratum
    * size.
    *
    * Scale shape: one scan-side projection + one source-keyed
    * aggregation; everything after runs on |sources| rows. */
  def neymanAllocation(spark: SparkSession, dir: String,
                       budgetPpm: Long = 100000L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = TextOps.normText(col("text"))
    val st = docs.select(col("source"),
        size(TextOps.tokens(t)).cast("long").as("x"))
      .groupBy("source")
      .agg(count(lit(1)).as("nh"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      // population variance numerator: N·Σx² − (Σx)² (exact, ≥ 0);
      // σ_e6 = round(sqrt(num)/N · 1e6) — sqrt of identical integers.
      .withColumn("s2num", col("nh") * col("sxx") - col("sx") * col("sx"))
      .withColumn("sigma_e6",
        round(sqrt(col("s2num").cast("double")) / col("nh") * 1e6, 0)
          .cast("long"))
      .withColumn("wh", col("nh") * col("sigma_e6"))
      .localCheckpoint() // |sources| rows; read by totals + output
    val tot = st.agg(sum("nh").as("ntot"), sum("wh").as("wtot"))
    st.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"ntot * $budgetPpm div 1000000"))
      .select(col("source"), col("nh").cast("long").as("n_docs"),
        col("sigma_e6"),
        expr("CAST(wh AS DECIMAL(38,0)) * 1000000 div wtot").as("weight_ppm"),
        expr("least(nh, CAST(budget AS DECIMAL(38,0)) * wh div wtot)")
          .cast("long").as("neyman_n"),
        expr("least(nh, CAST(budget AS DECIMAL(38,0)) * nh div ntot)")
          .cast("long").as("proportional_n"),
        col("budget").cast("long").as("budget_n"))
      .orderBy("source")
  }

  /** BPE vocab-size sweep (q251): [[graft.ext.Bpe.bpeRoundSweep]] —
    * one training, read out after every merge round; fertility and
    * compression vs merge budget. */
  def bpeSweepReport(spark: SparkSession, dir: String): DataFrame =
    Bpe.bpeRoundSweep(Tables.documents(spark, dir), "doc_id", "text",
      rounds = 6)

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

  /** Dedup threshold sweep (q248):
    * [[graft.ext.TextDedup.dedupThresholdSweep]] — pairs, docs dropped
    * (keep-first rule) and token volumes at Jaccard 0.3/0.5/0.7/0.9,
    * all from one staged inverted-index pass. */
  def dedupSweepReport(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dedupThresholdSweep(Tables.documents(spark, dir), "doc_id",
      "text", k = 8)

  /** Top principal component by power iteration (q245):
    * [[graft.ext.Similarity.powerIteration]] — three fixed integer
    * rounds of v ← normalize(AᵀAv) over the embeddings corpus with the
    * cos²-alignment convergence certificate. */
  def principalComponent(spark: SparkSession, dir: String): DataFrame =
    Similarity.powerIteration(Tables.embeddings(spark, dir), "vec_id",
      "embedding", rounds = 3)

  /** Dirichlet query-likelihood search (q270):
    * [[graft.ext.Retrieval.dirichletQlTopK]] — the language-modeling
    * ranker over the q186 query set, μ = 50 sized to this corpus's
    * ~54-token documents. */
  def dirichletQlSearch(spark: SparkSession, dir: String): DataFrame =
    Retrieval.dirichletQlTopK(Tables.documents(spark, dir), "doc_id",
      "text", Seq(1 -> "spark hash join", 2 -> "window merge sort",
        3 -> "stream batch data"), k = 10)

  /** Zipf rank-frequency fit (q271):
    * [[graft.ext.TextAnalysis.zipfFit]] — per-source OLS of ln(freq)
    * on ln(rank) over the top-100 vocabulary; slope ≈ −10⁶ (e6 units)
    * for natural text. The synthetic word-soup corpus measures
    * ≈ −0.3·10⁶ with low R² — honest: its vocabulary is deliberately
    * near-uniform, which is exactly what this probe is built to flag. */
  def zipfFitReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfFit(Tables.documents(spark, dir), "doc_id",
      "source", "text")

  /** Good–Turing coverage + Chao1 richness (q272):
    * [[graft.ext.TextAnalysis.goodTuringCoverage]] — per-source unseen
    * probability mass, sample coverage, and the bias-corrected Chao1
    * estimate of the true vocabulary size. */
  def goodTuringReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.goodTuringCoverage(Tables.documents(spark, dir),
      "doc_id", "source", "text")

  /** Ranker agreement by RBO (q273):
    * [[graft.ext.Retrieval.rankBiasedOverlap]] — rank-biased overlap
    * (p = 0.9) between the BM25 (q186) and Dirichlet-QL (q270) top-10
    * lists on the shared query set. */
  def rankerAgreement(spark: SparkSession, dir: String): DataFrame =
    Retrieval.rankBiasedOverlap(
      bm25Search(spark, dir).select("query_id", "doc_id", "rank"),
      dirichletQlSearch(spark, dir).select("query_id", "doc_id", "rank"),
      k = 10)

  /** Packing-efficiency frontier (q277):
    * [[graft.ext.Packing.packingSweep]] — bins, fill and overhang at
    * budgets 256/512/1024/2048 from ONE shared prefix pass; the
    * choose-max_seq_len curve. */
  def packingSweepReport(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.packingSweep(Tables.documents(spark, dir),
      "doc_id", "text")

  /** Dedup tier agreement (q278):
    * [[graft.ext.TextDedup.dedupTierMatrix]] — the exact/minhash/
    * simhash drop-set Venn under the shared keep-first rule. */
  def dedupTierReport(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dedupTierMatrix(Tables.documents(spark, dir), "doc_id",
      "text")

  /** Distinct-n diversity (q275):
    * [[graft.ext.TextAnalysis.distinctNgramDiversity]] — per-source
    * distinct-1/2/3 word n-gram ratios (Li et al. 2016), the lexical-
    * diversity and boilerplate-flood probe. */
  def diversityReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.distinctNgramDiversity(Tables.documents(spark, dir),
      "doc_id", "source", "text")

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

  /** Embedding-space drift (q269): [[graft.ext.Drift.embeddingDrift]]
    * — per-dim centroid shift + value-distribution PSI between the
    * even/odd vec_id halves (the q242 snapshot convention). */
  def embeddingDriftReport(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.embeddingDrift(Tables.embeddings(spark, dir),
      "vec_id", "embedding")

  /** CCNet-style line dedup (q266): [[graft.ext.TextDedup.lineDedup]] —
    * 4-token normalized lines, scrub lines seen in ≥ 2 distinct docs,
    * per-source docs-affected + token volumes (the q260 readout). */
  def lineDedupReport(spark: SparkSession, dir: String): DataFrame =
    TextDedup.lineDedup(Tables.documents(spark, dir), "doc_id", "text",
      "source", width = 4, minDf = 2)

  /** Cross-doc span scrub (q268):
    * [[graft.ext.TextDedup.crossDocSpanScrub]] — Lee et al. covered-
    * position accounting over the LSH-verified pair tier at Jaccard
    * ≥ 0.5, word-4-gram spans, per-source removable token volume. */
  def spanScrubReport(spark: SparkSession, dir: String): DataFrame =
    TextDedup.crossDocSpanScrub(Tables.documents(spark, dir), "doc_id",
      "text", "source", n = 4, k = 8, threshold = 0.5)
}
