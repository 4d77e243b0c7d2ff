#!/usr/bin/env python3
"""One-shot mechanical splitter for Analytics.scala / ExtQueries.scala.

Parses top-level members (def/val with their doc comments), reassigns them
to per-domain objects, writes the new files, and emits a sed script for
call-site updates. Pure text transformation - `sbt test` is the referee.
"""
import re, sys, os

ROOT = "/root/repo/src/main/scala/graft/queries"

def parse(path):
    lines = open(path).read().split("\n")
    # file header: everything up to and including the `object X {` line
    obj_ix = next(i for i, l in enumerate(lines) if re.match(r"^object \w+ \{", l))
    header = lines[: obj_ix + 1]
    # body members: scan for member-start lines at indent 2
    start_re = re.compile(r"^  (private(\[\w+\])? )?(def|val) (\w+)")
    members = []  # (name, start, end) inclusive line idxs
    starts = []
    for i in range(obj_ix + 1, len(lines)):
        m = start_re.match(lines[i])
        if m:
            starts.append((i, m.group(4)))
    # locate the closing brace of the object (last non-empty line == "}")
    close_ix = max(i for i, l in enumerate(lines) if l.strip() == "}")
    for j, (i, name) in enumerate(starts):
        # walk back over doc comment / blank / section-divider lines
        s = i
        k = i - 1
        # attach a contiguous doc comment immediately above
        while k > obj_ix and (lines[k].strip().startswith("*") or
                              lines[k].strip().startswith("/**") or
                              lines[k].strip().startswith("*/") or
                              lines[k].strip().startswith("//")):
            s = k
            k -= 1
        e = (starts[j + 1][0] - 1) if j + 1 < len(starts) else close_ix - 1
        # trim the NEXT member's doc comment off our tail
        if j + 1 < len(starts):
            t = e
            while t > i and (lines[t].strip().startswith("*") or
                             lines[t].strip().startswith("/**") or
                             lines[t].strip().startswith("*/") or
                             lines[t].strip().startswith("//")):
                t -= 1
            e = t
        members.append((name, s, e))
    # dedupe: only the FIRST start line of a multi-line signature counts;
    # nested defs are indented deeper so the regex (col-2 anchored) skips them
    return lines, header, members

ANALYTICS_MAP = {}
for n in ("topPerformers marketSummary dailySummary condCounts distinctCounts "
          "minMaxDates correlationMatrix correlationPanel backtestUniverse "
          "latestPerKey returns pointLookupLatest topK distribution keyInRange "
          "distinctCountsApprox runningTotal dataQuality asofLargeOrder "
          "globalStats maxDrawdown returnVolatility movingAverage "
          "bollingerBands betaVsMarket rsi vwap weeklyOhlc marketBreadth "
          "longestUpStreak asofWithinTolerance twap stochasticOscillator "
          "onBalanceVolume weekdaySeasonality scd2History scd2RunHistory "
          "pointInTimeJoin gapFillDaily").split():
    ANALYTICS_MAP[n] = "MarketAnalytics"
for n in ("topSuppliersPerNation topSuppliersPerNationSalted supplierRevenue "
          "activityOverlap cubeSummary segmentPrioritySets unpivotMetrics "
          "statusPivot revenueRollup revenueQuartiles monthlyRollup "
          "monthlyGapFill hhiConcentration rankShift percentileReport "
          "paretoAbc robustAnomalies transitOverlap revenueAnomaly "
          "decayedRevenue localSupplierVolume soleBlameSuppliers "
          "revenueAutocorr orderValueSketch priorityValueSketch "
          "supplierBalance weightedMedianPrice modalPriority "
          "shipIntervalCoverage brandSkyline seasonalForecast supplierOls "
          "giniBySegment benfordPrices robustMeans frequentTriples "
          "basketRules incrementalAgg rfmSegments abcPareto cusumShift "
          "sequentialRules kaplanMeier spearmanSegments").split():
    ANALYTICS_MAP[n] = "WarehouseAnalytics"
for n in ("copurchaseRank copurchasePageRank copurchaseHops "
          "copurchaseTriangles copurchaseTrianglesSampled copurchaseKCore "
          "brandAffinityPpr copurchaseCoreness copurchaseLinkPrediction "
          "recommenderHoldout copurchaseAssortativity copurchaseCommunities "
          "copurchaseConductance copurchaseBetweenness copurchaseLcc "
          "purchaseHits").split():
    ANALYTICS_MAP[n] = "GraphAnalytics"
for n in ("tableProfile lineitemProfile tableProfileApprox "
          "tableProfileSampled LineitemCanon lineitemProfileSampled "
          "constraintAudit kAnonymity lDiversity tCloseness").split():
    ANALYTICS_MAP[n] = "ProfileAnalytics"

EXT_MAP = {}
for n in ("tokenStats qualityScore languageId fingerprint repetitionStats "
          "piiScrub tokenHistogram corpusQuantiles corpusReport vocabTopK "
          "tfidfTopTerms c4Filter bigramLmNll charEntropyReport "
          "sourceDiversity langSourceMix tokenFertility vocabCoverage "
          "hashingVectorize cmsHeavyHitters pmiCollocations bpeMergePairs "
          "bpeEncode bpeMergeList bpeApplyReport bpeSweepReport "
          "zipfFitReport goodTuringReport diversityReport qualityClassify "
          "qualityFunnelBySource contentGrowth sourceSimilarity "
          "sourceSetOps jsDivergence chunk").split():
    EXT_MAP[n] = "TextQueries"
for n in ("dedupExact dedupContainment crossSourceLeakage dedupNgramJaccard "
          "dedupMinhashLsh dedupExactIncremental dedupMinhashIncremental "
          "dedupClusters dedupKeepBest dedupSimhash dupPassages "
          "shingleNovelty fuzzyPairs snmPairs decontamination exactNewDocs "
          "snapshotDiff semanticDedup semanticDedupIncremental "
          "lshCandidateReport dedupSweepReport dedupTierReport "
          "lineDedupReport spanScrubReport repeatScrub").split():
    EXT_MAP[n] = "DedupQueries"
for n in ("embeddingNearDup annBruteTopK annLshTopK annHardNegatives "
          "annHardNegativesLsh annIvfTopK annRecall kmeansStep "
          "quantizedRetrieval multiProbeLsh embeddingSilhouette pqRetrieval "
          "sourceEmbeddingSimilarity ivfAdcRetrieval kmeansConverged "
          "clusterEvalReport ivfProbeSweep embCrossSourceMatrix "
          "principalComponent knnGraphReport labelNoiseReport "
          "embeddingDriftReport retrievalEval labelSpreading").split():
    EXT_MAP[n] = "SimilarityQueries"
for n in ("bm25Search rrfFusion hybridRrf rerankFused chunkRetrieval "
          "bm25PrfSearch dirichletQlSearch rankerAgreement "
          "mmrDiversified").split():
    EXT_MAP[n] = "RetrievalQueries"
for n in ("splitStats stratifiedMixture sequencePacking temperatureMix "
          "tokenDrift groupedPacking systematicSample curationPipeline "
          "shardShuffle sourceQuota rarityScore qualityWeightedSample "
          "tokenBudget curriculumBins percentileNormalize leakFreeEvalSplit "
          "classifierEvalReport tokenBudgetSelection calibrationReport "
          "psiDriftReport dsirSelection neymanAllocation "
          "cappedBudgetSelection packingSweepReport qualityThresholdSweep "
          "conformalReport sourceDataCard").split():
    EXT_MAP[n] = "CurationQueries"
for n in ("multimodalMeta frameSample gifPixelStats wavAudioStats "
          "wavAudioAutocorr multimodalRetrieval multimodalRetrievalCelled "
          "multimodalEmbedRetrieval videoFeatures").split():
    EXT_MAP[n] = "MultimodalQueries"

DOC = {
  "MarketAnalytics": """/** The market/time-series half of the reference analytics surface
  * (SURVEY.md §2.4–§2.7): the ClickHouse SQL query API of
  * `/root/reference/src/clickhouse/client.py` plus the derived views of
  * `/root/reference/src/setup/setup_clickhouse.py:247-295`, re-expressed
  * as Catalyst-planned DataFrame transformations over the driver test
  * tables (role mapping in FIXTURES.md §C: `orders`/`lineitem` stand in
  * for `stock_price`, `customer`⋈`nation`⋈`region` for `stock_master`).
  * Round-12 split of the former `Analytics` object — values unchanged.
  *
  * Scale posture (100 TB): dimension joins broadcast; windows partition
  * by high-cardinality keys (custkey/suppkey) so per-key state is
  * bounded; grouped aggregates rely on partial aggregation, kept exact
  * under any merge order by the integer-cents measures of
  * [[graft.model.Parity]]; top-k plans as `TakeOrderedAndProject`. */""",
  "WarehouseAnalytics": """/** Warehouse / TPC-H-shaped analytics over orders⋈lineitem⋈part⋈
  * supplier: revenue rollups, distribution reports, robust statistics,
  * basket mining and behavioral readouts. Round-12 split of the former
  * `Analytics` object — values unchanged. Scale posture as in
  * [[MarketAnalytics]]: broadcast dims, partial-agg'd exact integer
  * measures, keyed windows, top-k via TakeOrderedAndProject. */""",
  "GraphAnalytics": """/** Graph analytics over the co-purchase projection of orders⋈lineitem
  * (PageRank/HITS/PPR, triangles, k-core, LPA communities + conductance,
  * link prediction, sampled betweenness, recommender holdout). Thin
  * oracle-facing bindings; the iterative kernels live in
  * [[graft.operators.Graph]]. Round-12 split of the former `Analytics`
  * object — values unchanged. */""",
  "ProfileAnalytics": """/** Data-profiling, constraint-audit and privacy queries (k-anonymity,
  * l-diversity, t-closeness, table profiles exact/approx/sampled).
  * Round-12 split of the former `Analytics` object — values
  * unchanged. */""",
  "TextQueries": """/** Oracle-checked wrappers — text-analysis tier (token stats, quality,
  * language id, LM scores, BPE tokenizer family, vocabulary/corpus
  * statistics) over the `documents` table. Round-12 split of the former
  * `ExtQueries` object — values unchanged. */""",
  "DedupQueries": """/** Oracle-checked wrappers — deduplication tier (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, semantic, incremental, span scrub, sweep
  * reports) over the `documents` table. Round-12 split of the former
  * `ExtQueries` object — values unchanged. */""",
  "SimilarityQueries": """/** Oracle-checked wrappers — similarity tier (ANN brute/LSH/IVF/PQ,
  * k-means, silhouette, spectral probes, k-NN graph, drift) over the
  * `embeddings` table. Round-12 split of the former `ExtQueries`
  * object — values unchanged. */""",
  "RetrievalQueries": """/** Oracle-checked wrappers — lexical/hybrid retrieval tier (BM25,
  * Dirichlet QL, PRF, RRF fusion, rerank, chunk retrieval, ranker
  * agreement) over the `documents` table. Round-12 split of the former
  * `ExtQueries` object — values unchanged. */""",
  "CurationQueries": """/** Oracle-checked wrappers — curation tier (splits, sampling, packing,
  * token budgets, mixtures, drift, calibration, data cards) over the
  * driver test tables. Round-12 split of the former `ExtQueries`
  * object — values unchanged. */""",
  "MultimodalQueries": """/** Oracle-checked wrappers — multimodal tier (typed binary decode
  * plumbing: GIF/WAV stats, frame sampling, multimodal retrieval).
  * Round-12 split of the former `ExtQueries` object — values
  * unchanged. */""",
}

HEADERS = {
  "Analytics": """package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{Parity, Tables}
""",
  "ExtQueries": """package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Multimodal, Retrieval, Sampling, Similarity, TextAnalysis, TextClean, TextDedup, TextOps}
import graft.model.Tables
""",
}
NEEDS_PARITY = {"MarketAnalytics", "WarehouseAnalytics", "GraphAnalytics",
                "ProfileAnalytics"}

def split(src, mapping, header_key):
    lines, header, members = parse(src)
    names = {n for n, _, _ in members}
    missing = names - set(mapping)
    extra = set(mapping) - names
    if missing:
        print(f"UNMAPPED in {src}: {sorted(missing)}"); sys.exit(1)
    if extra:
        print(f"MAPPED-BUT-ABSENT for {src}: {sorted(extra)}")
    out = {}
    for n, s, e in members:
        tgt = mapping[n]
        chunk = "\n".join(lines[s:e + 1]).rstrip()
        # drop section-divider comment lines
        chunk = "\n".join(l for l in chunk.split("\n")
                          if not re.match(r"^  // ----", l))
        out.setdefault(tgt, []).append(chunk)
    for tgt, chunks in out.items():
        body = "\n\n".join(chunks)
        imp = HEADERS[header_key]
        par = "  import Parity._\n\n" if tgt in NEEDS_PARITY else ""
        text = f"{imp}\n{DOC[tgt]}\nobject {tgt} {{\n{par}{body}\n}}\n"
        path = os.path.join(ROOT, f"{tgt}.scala")
        open(path, "w").write(text)
        print(f"wrote {path}: {len(text.splitlines())} lines, {len(chunks)} members")
    return mapping

m1 = split(os.path.join(ROOT, "Analytics.scala"), ANALYTICS_MAP, "Analytics")
m2 = split(os.path.join(ROOT, "ExtQueries.scala"), EXT_MAP, "ExtQueries")
os.remove(os.path.join(ROOT, "Analytics.scala"))
os.remove(os.path.join(ROOT, "ExtQueries.scala"))

# emit sed script for call sites (longest names first to avoid prefix hits)
with open("/root/repo/tools/split_rename.sed", "w") as f:
    for old, mapping in (("Analytics", m1), ("ExtQueries", m2)):
        for name in sorted(mapping, key=len, reverse=True):
            f.write(f"s/\\b{old}\\.{name}\\b/{mapping[name]}.{name}/g\n")
print("sed script at tools/split_rename.sed")
