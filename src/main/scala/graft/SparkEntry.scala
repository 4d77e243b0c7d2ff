package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Correlated, EventWindows, ExtQueries, IngestQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here twice: a Spark
  * implementation in [[queries]] and (where SQL-expressible) a DuckDB
  * oracle in [[oracleSql]]. Column names/aliases are kept identical on both
  * sides (the driver sorts columns by name before hashing), every query
  * carries a deterministic total ORDER BY, and float aggregation uses the
  * exact integer-cents idiom of [[graft.model.Parity]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topPerformers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_top_performers"   -> ((s, d) => Analytics.topPerformers(s, d)),
    "q02_market_summary"   -> ((s, d) => Analytics.marketSummary(s, d)),
    "q03_daily_summary"    -> ((s, d) => Analytics.dailySummary(s, d)),
    "q04_cond_counts"      -> ((s, d) => Analytics.condCounts(s, d)),
    "q05_distinct_counts"  -> ((s, d) => Analytics.distinctCounts(s, d)),
    "q06_minmax_dates"     -> ((s, d) => Analytics.minMaxDates(s, d)),
    "q07_correlation"      -> ((s, d) => Analytics.correlationMatrix(s, d)),
    "q08_backtest_universe"-> ((s, d) => Analytics.backtestUniverse(s, d)),
    "q09_latest_per_key"   -> ((s, d) => Analytics.latestPerKey(s, d)),
    "q10_returns"          -> ((s, d) => Analytics.returns(s, d)),
    "q11_point_lookup"     -> ((s, d) => Analytics.pointLookupLatest(s, d)),
    "q12_topk_revenue"     -> ((s, d) => Analytics.topK(s, d)),
    "q13_distribution"     -> ((s, d) => Analytics.distribution(s, d)),
    "q14_global_stats"     -> ((s, d) => Analytics.globalStats(s, d)),
    "q15_normalize"        -> ((s, d) => IngestQueries.normalize(s, d)),
    "q16_validate"         -> ((s, d) => IngestQueries.validate(s, d)),
    "q17_dedup_by_key"     -> ((s, d) => IngestQueries.dedupByKey(s, d)),
    "q18_relaxed_union"    -> ((s, d) => IngestQueries.relaxedUnion(s, d)),
    "q19_anti_new_keys"    -> ((s, d) => IngestQueries.antiJoinNewKeys(s, d)),
    "q20_upsert"           -> ((s, d) => IngestQueries.upsert(s, d)),
    "q21_compact_replacing"-> ((s, d) => IngestQueries.compactReplacing(s, d)),
    "q22_update_where"     -> ((s, d) => IngestQueries.updateWhere(s, d)),
    "q23_delete_where"     -> ((s, d) => IngestQueries.deleteWhere(s, d)),
    "q24_tumbling_window"  -> ((s, d) => EventWindows.tumbling(s, d)),
    "q25_sliding_window"   -> ((s, d) => EventWindows.sliding(s, d)),
    "q26_sessionize"       -> ((s, d) => EventWindows.sessionize(s, d)),
    "q27_json_extract"     -> ((s, d) => EventWindows.jsonExtract(s, d)),
    "q28_token_stats"      -> ((s, d) => ExtQueries.tokenStats(s, d)),
    "q29_quality_score"    -> ((s, d) => ExtQueries.qualityScore(s, d)),
    "q30_langid"           -> ((s, d) => ExtQueries.languageId(s, d)),
    "q31_fingerprint"      -> ((s, d) => ExtQueries.fingerprint(s, d)),
    "q32_dedup_exact"      -> ((s, d) => ExtQueries.dedupExact(s, d)),
    "q33_dedup_ngram_jaccard" -> ((s, d) => ExtQueries.dedupNgramJaccard(s, d)),
    "q34_dedup_minhash_lsh"   -> ((s, d) => ExtQueries.dedupMinhashLsh(s, d)),
    "q35_dedup_simhash"    -> ((s, d) => ExtQueries.dedupSimhash(s, d)),
    "q36_embed_near_dup"   -> ((s, d) => ExtQueries.embeddingNearDup(s, d)),
    "q37_ann_brute_topk"   -> ((s, d) => ExtQueries.annBruteTopK(s, d)),
    "q38_ann_lsh_topk"     -> ((s, d) => ExtQueries.annLshTopK(s, d)),
    "q39_multimodal_meta"  -> ((s, d) => ExtQueries.multimodalMeta(s, d)),
    "q40_frame_sample"     -> ((s, d) => ExtQueries.frameSample(s, d)),
    "q41_session_window"   -> ((s, d) => EventWindows.sessionWindowNative(s, d)),
    "q42_key_in_range"     -> ((s, d) => Analytics.keyInRange(s, d)),
    "q43_running_total"    -> ((s, d) => Analytics.runningTotal(s, d)),
    "q44_monthly_rollup"   -> ((s, d) => Analytics.monthlyRollup(s, d)),
    "q45_data_quality"     -> ((s, d) => Analytics.dataQuality(s, d)),
    "q46_asof_join"        -> ((s, d) => Analytics.asofLargeOrder(s, d)),
    "q47_dedup_clusters"   -> ((s, d) => ExtQueries.dedupClusters(s, d)),
    "q48_csv_roundtrip"    -> ((s, d) => IngestQueries.csvRoundtrip(s, d)),
    "q49_ann_ivf_topk"     -> ((s, d) => ExtQueries.annIvfTopK(s, d)),
    "q50_corpus_report"    -> ((s, d) => ExtQueries.corpusReport(s, d)),
    "q51_json_roundtrip"   -> ((s, d) => IngestQueries.jsonRoundtrip(s, d)),
    "q52_hash_split"       -> ((s, d) => ExtQueries.splitStats(s, d)),
    "q53_repetition"       -> ((s, d) => ExtQueries.repetitionStats(s, d)),
    "q54_pii_scrub"        -> ((s, d) => ExtQueries.piiScrub(s, d)),
    "q55_token_histogram"  -> ((s, d) => ExtQueries.tokenHistogram(s, d)),
    "q56_corpus_quantiles" -> ((s, d) => ExtQueries.corpusQuantiles(s, d)),
    "q57_stratified_mix"   -> ((s, d) => ExtQueries.stratifiedMixture(s, d)),
    "q58_decontamination"  -> ((s, d) => ExtQueries.decontamination(s, d)),
    "q59_sequence_packing" -> ((s, d) => ExtQueries.sequencePacking(s, d)),
    "q60_vocab_topk"       -> ((s, d) => ExtQueries.vocabTopK(s, d)),
    "q61_dup_passages"     -> ((s, d) => ExtQueries.dupPassages(s, d)),
    "q62_c4_filter"        -> ((s, d) => ExtQueries.c4Filter(s, d)),
    "q63_source_quota"     -> ((s, d) => ExtQueries.sourceQuota(s, d)),
    "q64_shard_shuffle"    -> ((s, d) => ExtQueries.shardShuffle(s, d)),
    "q65_snapshot_diff"    -> ((s, d) => ExtQueries.snapshotDiff(s, d)),
    "q66_orc_roundtrip"    -> ((s, d) => IngestQueries.orcRoundtrip(s, d)),
    "q67_rarity_score"     -> ((s, d) => ExtQueries.rarityScore(s, d)),
    "q68_exact_new_docs"   -> ((s, d) => ExtQueries.exactNewDocs(s, d)),
    "q69_status_pivot"     -> ((s, d) => Analytics.statusPivot(s, d)),
    "q70_revenue_rollup"   -> ((s, d) => Analytics.revenueRollup(s, d)),
    "q71_revenue_quartiles" -> ((s, d) => Analytics.revenueQuartiles(s, d)),
    "q72_gap_fill"         -> ((s, d) => Analytics.monthlyGapFill(s, d)),
    "q73_event_funnel"     -> ((s, d) => EventWindows.eventFunnel(s, d)),
    "q74_cohort_retention" -> ((s, d) => EventWindows.cohortRetention(s, d)),
    "q75_chunking"         -> ((s, d) => ExtQueries.chunk(s, d)),
    "q76_kmeans_step"      -> ((s, d) => ExtQueries.kmeansStep(s, d)),
    "q77_bpe_merge_pairs"  -> ((s, d) => ExtQueries.bpeMergePairs(s, d)),
    "q78_quality_sample"   -> ((s, d) => ExtQueries.qualityWeightedSample(s, d)),
    "q79_max_drawdown"     -> ((s, d) => Analytics.maxDrawdown(s, d)),
    "q80_volatility"       -> ((s, d) => Analytics.returnVolatility(s, d)),
    "q81_top_per_group"    -> ((s, d) => Analytics.topSuppliersPerNation(s, d)),
    "q82_set_ops"          -> ((s, d) => Analytics.activityOverlap(s, d)),
    "q83_moving_average"   -> ((s, d) => Analytics.movingAverage(s, d)),
    "q84_bollinger_bands"  -> ((s, d) => Analytics.bollingerBands(s, d)),
    "q85_beta_vs_market"   -> ((s, d) => Analytics.betaVsMarket(s, d)),
    "q86_cube_summary"     -> ((s, d) => Analytics.cubeSummary(s, d)),
    "q87_unpivot_metrics"  -> ((s, d) => Analytics.unpivotMetrics(s, d)),
    "q88_tfidf_top_terms"  -> ((s, d) => ExtQueries.tfidfTopTerms(s, d)),
    "q89_rsi"              -> ((s, d) => Analytics.rsi(s, d)),
    "q90_vwap"             -> ((s, d) => Analytics.vwap(s, d)),
    "q91_weekly_ohlc"      -> ((s, d) => Analytics.weeklyOhlc(s, d)),
    "q92_market_breadth"   -> ((s, d) => Analytics.marketBreadth(s, d)),
    "q93_up_streaks"       -> ((s, d) => Analytics.longestUpStreak(s, d)),
    "q94_cross_source_leak" -> ((s, d) => ExtQueries.crossSourceLeakage(s, d)),
    "q95_dedup_containment" -> ((s, d) => ExtQueries.dedupContainment(s, d)),
    "q96_vocab_coverage"   -> ((s, d) => ExtQueries.vocabCoverage(s, d)),
    "q97_asof_tolerance"   -> ((s, d) => Analytics.asofWithinTolerance(s, d)),
    "q98_hhi_concentration" -> ((s, d) => Analytics.hhiConcentration(s, d)),
    "q99_rank_shift"       -> ((s, d) => Analytics.rankShift(s, d)),
    "q100_percentile_report" -> ((s, d) => Analytics.percentileReport(s, d)),
    "q101_twap"            -> ((s, d) => Analytics.twap(s, d)),
    "q102_event_transitions" -> ((s, d) => EventWindows.eventTransitions(s, d)),
    "q103_conversion_latency" -> ((s, d) => EventWindows.conversionLatency(s, d)),
    "q104_pareto_abc"      -> ((s, d) => Analytics.paretoAbc(s, d)),
    "q105_ann_recall"      -> ((s, d) => ExtQueries.annRecall(s, d)),
    "q106_robust_anomalies" -> ((s, d) => Analytics.robustAnomalies(s, d)),
    "q107_stochastic_k"    -> ((s, d) => Analytics.stochasticOscillator(s, d)),
    "q108_obv"             -> ((s, d) => Analytics.onBalanceVolume(s, d)),
    "q109_weekday_seasonality" -> ((s, d) => Analytics.weekdaySeasonality(s, d)),
    "q110_shingle_novelty" -> ((s, d) => ExtQueries.shingleNovelty(s, d)),
    "q111_lang_source_mix" -> ((s, d) => ExtQueries.langSourceMix(s, d)),
    "q112_token_fertility" -> ((s, d) => ExtQueries.tokenFertility(s, d)),
    "q113_revenue_autocorr" -> ((s, d) => Analytics.revenueAutocorr(s, d)),
    "q114_transit_overlap" -> ((s, d) => Analytics.transitOverlap(s, d)),
    "q115_scd2_history"    -> ((s, d) => Analytics.scd2History(s, d)),
    "q116_copurchase_rank" -> ((s, d) => Analytics.copurchaseRank(s, d)),
    "q117_cms_heavy_hitters" -> ((s, d) => ExtQueries.cmsHeavyHitters(s, d)),
    "q118_decayed_revenue" -> ((s, d) => Analytics.decayedRevenue(s, d)),
    "q119_fuzzy_pairs"     -> ((s, d) => ExtQueries.fuzzyPairs(s, d)),
    "q120_session_paths"   -> ((s, d) => EventWindows.sessionPaths(s, d)),
    "q121_local_supplier_volume" -> ((s, d) => Analytics.localSupplierVolume(s, d)),
    "q122_sole_blame"      -> ((s, d) => Analytics.soleBlameSuppliers(s, d)),
    "q123_grouping_sets"   -> ((s, d) => Analytics.segmentPrioritySets(s, d)),
    "q124_dedup_exact_incr"   -> ((s, d) => ExtQueries.dedupExactIncremental(s, d)),
    "q125_dedup_minhash_incr" -> ((s, d) => ExtQueries.dedupMinhashIncremental(s, d)),
    "q126_gif_pixel_stats"    -> ((s, d) => ExtQueries.gifPixelStats(s, d)),
    "q127_wav_audio_stats"    -> ((s, d) => ExtQueries.wavAudioStats(s, d)),
    "q128_wav_autocorr"       -> ((s, d) => ExtQueries.wavAudioAutocorr(s, d)),
    "q129_hard_negatives"     -> ((s, d) => ExtQueries.annHardNegatives(s, d)),
    "q130_hard_negatives_lsh" -> ((s, d) => ExtQueries.annHardNegativesLsh(s, d)),
    "q131_hashing_vectorize"  -> ((s, d) => ExtQueries.hashingVectorize(s, d)),
    "q132_small_qty_revenue"  -> ((s, d) => Correlated.smallQtyRevenue(s, d)),
    "q133_large_orders"       -> ((s, d) => Correlated.largeOrders(s, d)),
    "q134_idle_rich_customers" -> ((s, d) => Correlated.idleRichCustomers(s, d)),
    "q135_min_cost_supplier"  -> ((s, d) => Correlated.minCostSupplier(s, d)),
    "q136_promo_share"        -> ((s, d) => Correlated.promoShare(s, d)),
    "q137_top_supplier"       -> ((s, d) => Correlated.topSupplier(s, d)),
    "q138_temperature_mix"    -> ((s, d) => ExtQueries.temperatureMix(s, d)),
    "q139_token_ks_drift"     -> ((s, d) => ExtQueries.tokenDrift(s, d)),
    "q140_copurchase_pagerank" -> ((s, d) => Analytics.copurchasePageRank(s, d)),
    "q141_grouped_packing"    -> ((s, d) => ExtQueries.groupedPacking(s, d)),
    "q142_triangle_census"    -> ((s, d) => Analytics.copurchaseTriangles(s, d)),
    "q143_ship_coverage"      -> ((s, d) => Analytics.shipIntervalCoverage(s, d)),
    "q144_systematic_sample"  -> ((s, d) => ExtQueries.systematicSample(s, d)),
    "q145_event_chi_square"   -> ((s, d) => EventWindows.eventChiSquare(s, d)),
    "q146_brand_skyline"      -> ((s, d) => Analytics.brandSkyline(s, d)),
    "q147_seasonal_forecast"  -> ((s, d) => Analytics.seasonalForecast(s, d)),
    "q148_supplier_ols"       -> ((s, d) => Analytics.supplierOls(s, d)),
    "q149_transition_gini"    -> ((s, d) => EventWindows.transitionGini(s, d)),
    "q150_session_trigrams"   -> ((s, d) => EventWindows.sessionTrigrams(s, d)),
    "q151_volume_shipping"    -> ((s, d) => Correlated.volumeShipping(s, d)),
    "q152_market_share"       -> ((s, d) => Correlated.marketShare(s, d)),
    "q153_supplier_diversity" -> ((s, d) => Correlated.supplierDiversity(s, d)),
    "q154_concentrated_ship"  -> ((s, d) => Correlated.concentratedShipments(s, d)),
    "q155_important_parts"    -> ((s, d) => Correlated.importantParts(s, d)),
    "q156_value_sketch"       -> ((s, d) => Analytics.orderValueSketch(s, d)),
    "q157_priority_sketch"    -> ((s, d) => Analytics.priorityValueSketch(s, d)),
    "q158_weighted_median"    -> ((s, d) => Analytics.weightedMedianPrice(s, d)),
    "q159_modal_priority"     -> ((s, d) => Analytics.modalPriority(s, d)),
    "q160_source_diversity"   -> ((s, d) => ExtQueries.sourceDiversity(s, d)),
    "q161_table_profile"      -> ((s, d) => Analytics.lineitemProfile(s, d)),
    "q162_curation_pipeline"  -> ((s, d) => ExtQueries.curationPipeline(s, d)),
    "q163_clamped_balance"    -> ((s, d) => Analytics.supplierBalance(s, d)),
    "q164_content_growth"     -> ((s, d) => ExtQueries.contentGrowth(s, d)),
    "q165_source_similarity"  -> ((s, d) => ExtQueries.sourceSimilarity(s, d)),
    "q166_bracket_revenue"    -> ((s, d) => Correlated.bracketRevenue(s, d)),
    "q167_returned_items"     -> ((s, d) => Correlated.returnedItemReport(s, d)),
    "q168_late_priority_mix"  -> ((s, d) => Correlated.latePriorityMix(s, d)),
    "q169_priority_check"     -> ((s, d) => Correlated.orderPriorityCheck(s, d)),
    "q170_pricing_summary"    -> ((s, d) => Correlated.pricingSummary(s, d)),
    "q171_ship_priority"      -> ((s, d) => Correlated.shippingPriority(s, d)),
    "q172_revenue_delta"      -> ((s, d) => Correlated.revenueDelta(s, d)),
    "q173_product_profit"     -> ((s, d) => Correlated.productTypeProfit(s, d)),
    "q174_order_count_dist"   -> ((s, d) => Correlated.orderCountDistribution(s, d)),
    "q175_triangle_sampled"   -> ((s, d) => Analytics.copurchaseTrianglesSampled(s, d)),
    "q176_profile_sampled"    -> ((s, d) => Analytics.lineitemProfileSampled(s, d)),
    "q177_mm_retrieval"       -> ((s, d) => ExtQueries.multimodalRetrieval(s, d)),
    "q178_mm_retrieval_cells" -> ((s, d) => ExtQueries.multimodalRetrievalCelled(s, d)),
    "q179_mm_embed_topk"      -> ((s, d) => ExtQueries.multimodalEmbedRetrieval(s, d)),
    "q180_source_set_ops"     -> ((s, d) => ExtQueries.sourceSetOps(s, d)),
    "q181_bigram_lm_nll"      -> ((s, d) => ExtQueries.bigramLmNll(s, d)),
    "q182_char_entropy"       -> ((s, d) => ExtQueries.charEntropyReport(s, d)),
    "q183_touch_attribution"  -> ((s, d) => EventWindows.touchAttribution(s, d)),
    "q184_dedup_keep_best"    -> ((s, d) => ExtQueries.dedupKeepBest(s, d)),
    "q185_quality_funnel"     -> ((s, d) => ExtQueries.qualityFunnelBySource(s, d)),
    "q186_bm25_search"        -> ((s, d) => ExtQueries.bm25Search(s, d)),
    "q187_quantized_topk"     -> ((s, d) => ExtQueries.quantizedRetrieval(s, d)),
    "q188_graph_hops"         -> ((s, d) => Analytics.copurchaseHops(s, d)),
    "q189_rrf_fusion"         -> ((s, d) => ExtQueries.rrfFusion(s, d)),
    "q190_revenue_anomaly"    -> ((s, d) => Analytics.revenueAnomaly(s, d)),
    "q191_snm_dedup"          -> ((s, d) => ExtQueries.snmPairs(s, d)),
    "q192_multiprobe_lsh"     -> ((s, d) => ExtQueries.multiProbeLsh(s, d)),
    "q193_rolling_actives"    -> ((s, d) => EventWindows.rollingActiveUsers(s, d)),
    "q194_scd2_runs"          -> ((s, d) => Analytics.scd2RunHistory(s, d)),
    "q195_frequent_triples"   -> ((s, d) => Analytics.frequentTriples(s, d)),
    "q196_js_divergence"      -> ((s, d) => ExtQueries.jsDivergence(s, d)),
    "q197_gini_segment"       -> ((s, d) => Analytics.giniBySegment(s, d)),
    "q198_benford_prices"     -> ((s, d) => Analytics.benfordPrices(s, d)),
    "q199_robust_means"       -> ((s, d) => Analytics.robustMeans(s, d)),
    "q200_abc_pareto"         -> ((s, d) => Analytics.abcPareto(s, d)),
    "q201_point_in_time"      -> ((s, d) => Analytics.pointInTimeJoin(s, d)),
    "q202_kcore"              -> ((s, d) => Analytics.copurchaseKCore(s, d)),
    "q203_basket_rules"       -> ((s, d) => Analytics.basketRules(s, d)),
    "q204_token_budget"       -> ((s, d) => ExtQueries.tokenBudget(s, d)),
    "q205_curriculum_bins"    -> ((s, d) => ExtQueries.curriculumBins(s, d)),
    "q206_pmi_collocations"   -> ((s, d) => ExtQueries.pmiCollocations(s, d)),
    "q207_constraint_audit"   -> ((s, d) => Analytics.constraintAudit(s, d)),
    "q208_pct_normalize"      -> ((s, d) => ExtQueries.percentileNormalize(s, d)),
    "q209_incremental_agg"    -> ((s, d) => Analytics.incrementalAgg(s, d)),
    "q210_k_anonymity"        -> ((s, d) => Analytics.kAnonymity(s, d)),
    "q211_rfm_segments"       -> ((s, d) => Analytics.rfmSegments(s, d)),
    "q212_cusum_shift"        -> ((s, d) => Analytics.cusumShift(s, d)),
    "q213_gap_fill"           -> ((s, d) => Analytics.gapFillDaily(s, d)),
    "q214_session_patterns"   -> ((s, d) => EventWindows.sessionPatternClasses(s, d)),
    "q215_spearman_segments"  -> ((s, d) => Analytics.spearmanSegments(s, d)),
    "q216_event_combos"       -> ((s, d) => EventWindows.eventTypeCombos(s, d)),
    "q217_sequential_rules"   -> ((s, d) => Analytics.sequentialRules(s, d)),
    "q218_kaplan_meier"       -> ((s, d) => Analytics.kaplanMeier(s, d)),
    "q219_eval_split"         -> ((s, d) => ExtQueries.leakFreeEvalSplit(s, d)),
    "q220_hybrid_rrf"         -> ((s, d) => ExtQueries.hybridRrf(s, d)),
    "q221_semantic_dedup"     -> ((s, d) => ExtQueries.semanticDedup(s, d)),
    "q222_quality_classifier" -> ((s, d) => ExtQueries.qualityClassify(s, d)),
    "q223_coreness"           -> ((s, d) => Analytics.copurchaseCoreness(s, d)),
    "q224_rerank"             -> ((s, d) => ExtQueries.rerankFused(s, d)),
    "q225_brand_ppr"          -> ((s, d) => Analytics.brandAffinityPpr(s, d)),
    "q226_silhouette"         -> ((s, d) => ExtQueries.embeddingSilhouette(s, d)),
    "q227_pq_topk"            -> ((s, d) => ExtQueries.pqRetrieval(s, d)),
    "q228_mmr_topk"           -> ((s, d) => ExtQueries.mmrDiversified(s, d)),
    "q229_local_clustering"   -> ((s, d) => Analytics.copurchaseLcc(s, d)),
    "q230_source_emb_sim"     -> ((s, d) => ExtQueries.sourceEmbeddingSimilarity(s, d)),
    "q231_source_data_card"   -> ((s, d) => ExtQueries.sourceDataCard(s, d)),
    "q232_bpe_encode"         -> ((s, d) => ExtQueries.bpeEncode(s, d)),
    "q233_ivf_pq_topk"        -> ((s, d) => ExtQueries.ivfAdcRetrieval(s, d)),
    "q234_semantic_dedup_incr" -> ((s, d) => ExtQueries.semanticDedupIncremental(s, d)),
    "q235_classifier_eval"    -> ((s, d) => ExtQueries.classifierEvalReport(s, d)),
    "q236_kmeans_rounds"      -> ((s, d) => ExtQueries.kmeansConverged(s, d)),
    "q237_bpe_merge_table"    -> ((s, d) => ExtQueries.bpeMergeList(s, d)),
    "q238_bpe_apply_rate"     -> ((s, d) => ExtQueries.bpeApplyReport(s, d)),
    "q239_label_spreading"    -> ((s, d) => ExtQueries.labelSpreading(s, d)),
    "q240_token_budget"       -> ((s, d) => ExtQueries.tokenBudgetSelection(s, d)),
    "q241_calibration_bins"   -> ((s, d) => ExtQueries.calibrationReport(s, d)),
    "q242_psi_drift"          -> ((s, d) => ExtQueries.psiDriftReport(s, d)),
    "q243_dsir_weights"       -> ((s, d) => ExtQueries.dsirSelection(s, d)),
    "q244_lsh_candidate_eval" -> ((s, d) => ExtQueries.lshCandidateReport(s, d)),
    "q245_power_iteration"    -> ((s, d) => ExtQueries.principalComponent(s, d)),
    "q246_retrieval_eval"     -> ((s, d) => ExtQueries.retrievalEval(s, d)),
    "q247_cluster_eval"       -> ((s, d) => ExtQueries.clusterEvalReport(s, d)),
    "q248_dedup_sweep"        -> ((s, d) => ExtQueries.dedupSweepReport(s, d)),
    "q249_quality_sweep"      -> ((s, d) => ExtQueries.qualityThresholdSweep(s, d)),
    "q250_l_diversity"        -> ((s, d) => Analytics.lDiversity(s, d)),
    "q251_bpe_sweep"          -> ((s, d) => ExtQueries.bpeSweepReport(s, d)),
    "q252_emb_cross_source"   -> ((s, d) => ExtQueries.embCrossSourceMatrix(s, d)),
    "q253_assortativity"      -> ((s, d) => Analytics.copurchaseAssortativity(s, d)),
    "q254_prf_search"         -> ((s, d) => ExtQueries.bm25PrfSearch(s, d)),
    "q255_neyman_alloc"       -> ((s, d) => ExtQueries.neymanAllocation(s, d)),
    "q256_conformal"          -> ((s, d) => ExtQueries.conformalReport(s, d)),
    "q257_link_prediction"    -> ((s, d) => Analytics.copurchaseLinkPrediction(s, d)),
    "q258_rec_holdout"        -> ((s, d) => Analytics.recommenderHoldout(s, d)),
    "q259_chunk_retrieval"    -> ((s, d) => ExtQueries.chunkRetrieval(s, d)),
    "q260_repeat_scrub"       -> ((s, d) => ExtQueries.repeatScrub(s, d)),
    "q261_capped_budget"      -> ((s, d) => ExtQueries.cappedBudgetSelection(s, d)),
    "q262_ivf_probe_sweep"    -> ((s, d) => ExtQueries.ivfProbeSweep(s, d)),
    "q263_lpa_communities"    -> ((s, d) => Analytics.copurchaseCommunities(s, d)),
    "q264_hits"               -> ((s, d) => Analytics.purchaseHits(s, d)),
    "q265_t_closeness"        -> ((s, d) => Analytics.tCloseness(s, d)),
  )

  // Shared SQL fragments for the exact money-sum idiom (Parity.scala).
  private def cents(c: String) = s"CAST(ROUND($c*100,0) AS BIGINT)"
  private def moneySum(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0"
  private def moneyAvg(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0/COUNT($c)"

  // Shared SQL fragments for the graft.ext text/similarity operators.
  // These mirror graft.ext.TextOps/TextDedup/Similarity exactly: same
  // normalization, same integer hash constants (generated from the same
  // Scala values), so Spark and DuckDB compute identical integers.
  /** lower+trim+collapse-whitespace — TextOps.normText. */
  private val nCte =
    """n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)"""
  private val tokCte =
    "tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM n)"
  /** distinct char-8-gram shingle HASHES — TextDedup.docShingleHashes:
    * hash first, distinct over the hash values (set semantics over hv on
    * both engines). `unnest(range(...))` rather than a lateral
    * `generate_series`, which DuckDB's binder rejects with correlated
    * arguments. */
  private def char8HashCte =
    "h AS (SELECT DISTINCT doc_id, " + hv8("substr(t, g, 8)") + " AS hv " +
      "FROM (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n) z)"
  /** TextOps.hash8 over an 8-char column: polynomial ord-hash mod 2^31-1.
    * ord() is INT32 in DuckDB — cast before multiplying. */
  private def hv8(c: String): String = {
    val terms = graft.ext.TextOps.Pow31.zipWithIndex.map { case (w, i) =>
      s"CAST(ord(substr($c,${i + 1},1)) AS BIGINT)*$w"
    }
    s"(${terms.mkString(" + ")}) % ${graft.ext.TextOps.HashP}"
  }
  /** TextDedup.Perms as a VALUES relation. */
  private val permValues = graft.ext.TextDedup.Perms
    .map { case (j, band, slot, a, b, w) => s"($j,$band,$slot,$a,$b,$w)" }
    .mkString(",")
  /** Shared CTE chain for the MinHash+LSH tier — q34 (pairs) and q47
    * (cluster edges) both consume it: char-8-gram shingle hashes →
    * one-aggregation 16-min signature → band hashes → band-collision
    * candidates → exact-Jaccard sizes (`sz`) and intersections (`iv`).
    * Mirrors TextDedup.minhashLshPairs. */
  private def minhashCtes =
    s"""$char8HashCte,
       |perm AS (SELECT * FROM (VALUES $permValues) AS p(j, band, slot, a, b, w)),
       |sig AS (SELECT doc_id, j, band, w,
       |               MIN((hv*a + b) % ${graft.ext.TextOps.HashP}) AS mh
       |        FROM h CROSS JOIN perm GROUP BY doc_id, j, band, w),
       |bh AS (SELECT doc_id, band, CAST(SUM(mh*w) AS BIGINT) AS band_hash
       |       FROM sig GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bh x JOIN bh y
       |           ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
       |iv AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |       FROM cand c
       |       JOIN h sa ON sa.doc_id = c.doc_a
       |       JOIN h sb ON sb.doc_id = c.doc_b AND sb.hv = sa.hv
       |       GROUP BY 1, 2)""".stripMargin
  /** q223's h-index coreness oracle, the 24 fixed rounds UNROLLED —
    * machine-generated CTE chain (round t: neighbor values ranked
    * descending per node, h = max(least(rank, value))), every stage
    * MATERIALIZED because `ed` is referenced by all 24 rounds and each
    * c_t by the next (inlining would nest the plan exponentially). */
  private lazy val corenessSql: String = {
    val rounds = 24
    val roundCtes = (0 until rounds).map { t =>
      s"""r$t AS MATERIALIZED (SELECT e.u AS node, c.c AS nc,
         |  row_number() OVER (PARTITION BY e.u ORDER BY c.c DESC) AS rk
         |  FROM ed e JOIN c$t c ON c.node = e.v),
         |c${t + 1} AS MATERIALIZED (SELECT node,
         |  CAST(MAX(LEAST(rk, nc)) AS BIGINT) AS c
         |  FROM r$t GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
       |         l_partkey AS item FROM lineitem),
       |pr AS MATERIALIZED (SELECT a.item AS u, b.item AS v
       |  FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |ed AS MATERIALIZED (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr),
       |c0 AS MATERIALIZED (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ed GROUP BY 1),
       |$roundCtes,
       |chg AS (SELECT CAST(SUM(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_changed
       |        FROM c$rounds a JOIN c${rounds - 1} b ON a.node = b.node)
       |SELECT CAST(a.node AS BIGINT) AS part, d.c AS degree,
       |       a.c AS coreness,
       |       CAST(CASE WHEN n_changed = 0 THEN 1 ELSE 0 END AS INT)
       |         AS converged
       |FROM c$rounds a JOIN c0 d ON a.node = d.node CROSS JOIN chg
       |ORDER BY part""".stripMargin
  }

  /** q228's MMR oracle: candidates = exact top-10 per q37 query, pair
    * sims quantized to e4 integers, then FIVE greedy selection rounds
    * unrolled (pick 1 by relevance; each later round is an anti join
    * against the selected set, a max-sim rollup over it, and an argmax
    * of the integer objective 7·rel − 3·maxsim with ties to the
    * smallest id) — generated, like corenessSql, so both engines run
    * the identical fixed schedule. */
  private lazy val mmrSql: String = {
    val steps = (2 to 5).map { t =>
      val prev = s"sall${t - 1}"
      s"""r$t AS (SELECT c.qid, c.cid, c.rel_e4, MAX(s.sim_e4) AS ms
         |  FROM cand c
         |  LEFT JOIN $prev x ON c.qid = x.qid AND c.cid = x.cid
         |  JOIN $prev p ON c.qid = p.qid
         |  JOIN sims s ON s.qid = c.qid AND s.a = c.cid AND s.b = p.cid
         |  WHERE x.cid IS NULL
         |  GROUP BY 1, 2, 3),
         |s$t AS (SELECT qid, cid, $t AS mmr_rank FROM (
         |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |    ORDER BY 7*rel_e4 - 3*ms DESC, cid) AS rn FROM r$t) z
         |  WHERE rn = 1),
         |sall$t AS (SELECT qid, cid, mmr_rank FROM sall${t - 1}
         |  UNION ALL SELECT qid, cid, mmr_rank FROM s$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCte,
       |qv AS (SELECT * FROM nm WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4)
       |           AS score
       |       FROM nm c CROSS JOIN qv q WHERE c.vec_id <> q.vec_id),
       |cand AS (SELECT qid, cid,
       |           CAST(round(score*10000, 0) AS BIGINT) AS rel_e4,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY score DESC, cid) AS rnk
       |         FROM sc QUALIFY rnk <= 10),
       |ce AS (SELECT cand.qid, cand.cid, nm.emb, nm.nrm
       |       FROM cand JOIN nm ON cand.cid = nm.vec_id),
       |sims AS (SELECT a.qid, a.cid AS a, b.cid AS b,
       |           CAST(round(list_dot_product(a.emb, b.emb)
       |                /(a.nrm*b.nrm)*10000, 0) AS BIGINT) AS sim_e4
       |         FROM ce a JOIN ce b ON a.qid = b.qid AND a.cid <> b.cid),
       |s1 AS (SELECT qid, cid, 1 AS mmr_rank FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |    ORDER BY rel_e4 DESC, cid) AS rn FROM cand) z WHERE rn = 1),
       |sall1 AS (SELECT qid, cid, mmr_rank FROM s1),
       |$steps
       |SELECT s.qid AS query_id, CAST(s.mmr_rank AS INT) AS mmr_rank,
       |       s.cid AS neighbor_id, cand.rel_e4
       |FROM sall5 s JOIN cand ON s.qid = cand.qid AND s.cid = cand.cid
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Multimodal.embedWeight row k over 64 columns as a DuckDB DOUBLE[]
    * literal — the q224 reranker's frozen projection matrix. */
  private def wLit(k: Int): String =
    (0 until 64).map(j => s"${graft.ext.Multimodal.embedWeight(k, j)}.0")
      .mkString("[", ",", "]")

  /** Similarity.planes(4, 64) as DuckDB DOUBLE[] literals. */
  private def planeLit(m: Int): String =
    graft.ext.Similarity.planes(4, 64)(m).map(x => s"$x.0").mkString("[", ",", "]")
  /** TextDedup.simhashFingerprints' 32 conditional-sum vote columns — the
    * same single-aggregation shape as the Spark side (no bit cross join). */
  private val simhashVoteCols = (0 until 32)
    .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b")
    .mkString(", ")
  private val simhashFpExpr = (0 until 32)
    .map(b => s"(CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END)")
    .mkString(" + ")
  /** Full-length 31-Horner rolling hash mod 2³¹-1 of a string expression —
    * GraftTextKernels.wordNgramHashFull's per-span math (token identity
    * for the repetition stats). */
  private def fullHash(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($c)+1),
       |    i -> CAST(ord(substr($c, i, 1)) AS BIGINT))),
       |  (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP})""".stripMargin
  /** Sampling.bucket100 over doc_id (same mod-P-before-multiply
    * reduction as the Scala side — identical values for keys < P, no
    * overflow beyond). */
  private val bucketExpr =
    s"(((doc_id % ${graft.ext.TextOps.HashP}) * 1000003 + 12345) % ${graft.ext.TextOps.HashP}) % 100"
  /** Multimodal retrieval feature CTEs (q177/q178): per VIDEO doc, the
    * 8-bucket exact integer-ppm histogram of the LZW-expanded pixels.
    * Mirrors Multimodal.gifPayload's fill arithmetic (pixels = text
    * bytes mod 128 cycled across npx = frames·w·h pixels, k never
    * resetting between frames) and gifPixelHistogramPpm's bucketing
    * ((v mod 128) div 16) + scaling (count·10⁶ div npx). Empty text →
    * all-zero pixels → bucket 0 holds every count. */
  private def mmFeatureCtes =
    """v AS (SELECT doc_id, text,
      |             CAST(1 + doc_id % 32 AS INT) AS vw,
      |             CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
      |             CAST(1 + doc_id % 10 AS INT) AS vf,
      |             length(text) AS len
      |      FROM documents WHERE doc_id % 3 = 2),
      |g AS (SELECT doc_id, text, len, CAST(vf AS BIGINT)*vw*vh AS npx FROM v),
      |bb AS (SELECT doc_id, gi,
      |              (ord(substr(text, CAST(gi + 1 AS INT), 1)) % 128) // 16 AS bk
      |       FROM (SELECT doc_id, text, unnest(range(len)) AS gi FROM g) z),
      |ball AS (SELECT doc_id, bk, COUNT(*) AS c_all FROM bb GROUP BY doc_id, bk),
      |bpre AS (SELECT bb.doc_id, bb.bk, COUNT(*) AS c_pre
      |         FROM bb JOIN g ON bb.doc_id = g.doc_id
      |         WHERE bb.gi < g.npx % g.len GROUP BY bb.doc_id, bb.bk),
      |spine AS (SELECT g.doc_id, CAST(u.b AS INT) AS bk, g.npx, g.len
      |          FROM g CROSS JOIN (SELECT unnest(range(8)) AS b) u),
      |hist AS (SELECT s.doc_id, s.bk,
      |                CASE WHEN s.len = 0
      |                     THEN CASE WHEN s.bk = 0 THEN s.npx ELSE 0 END
      |                     ELSE (s.npx // s.len) * COALESCE(a.c_all, 0)
      |                          + COALESCE(p.c_pre, 0) END AS cnt,
      |                s.npx
      |         FROM spine s
      |         LEFT JOIN ball a ON a.doc_id = s.doc_id AND a.bk = s.bk
      |         LEFT JOIN bpre p ON p.doc_id = s.doc_id AND p.bk = s.bk),
      |f AS (SELECT doc_id,
      |             list(CAST(cnt * 1000000 // npx AS BIGINT) ORDER BY bk) AS fv
      |      FROM hist GROUP BY doc_id)""".stripMargin
  /** Exact integer dot product of the two 8-long feature lists. */
  private def mmDotExpr =
    (1 to 8).map(i => s"q.qf[$i]*c.fv[$i]").mkString(" + ")
  /** One output row of the frozen-weight embedding stand-in
    * (Multimodal.embedWeight: W(k,j) = ((37k+11j+5) mod 17) − 8),
    * inlined as literal integer coefficients over the 8-long ppm
    * feature list. */
  private def mmEmbCol(k: Int): String =
    (0 until 8).map { j =>
      val w = ((37 * k + 11 * j + 5) % 17) - 8
      s"($w)*fv[${j + 1}]"
    }.mkString(" + ")
  /** Normalized double-precision embeddings with L2 norm. */
  private val embCte =
    "nm AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb, " +
      "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings)"

  private lazy val hybridRrfSql: String =
    s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |q AS (SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 10),
         |qi AS (SELECT q.query_id, q.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM q JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       WHERE tf.doc_id <> qi.query_id
         |       GROUP BY qi.query_id, tf.doc_id),
         |lex AS (SELECT query_id, doc_id AS neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY score_e12 DESC, doc_id) AS rank
         |        FROM sc QUALIFY rank <= 10),
         |den AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) zd),
         |u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM lex
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM den),
         |f AS (SELECT query_id, neighbor_id,
         |             CAST(SUM(c) AS BIGINT) AS rrf_micro,
         |             CAST(COUNT(*) AS INT) AS n_lists
         |      FROM u GROUP BY query_id, neighbor_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY rrf_micro DESC, neighbor_id) AS rnk FROM f)
         |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, rrf_micro,
         |       n_lists
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin

  private lazy val annBruteSql: String =
    s"""WITH $embCte,
       |q AS (SELECT * FROM nm WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
       |       FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
       |rk AS (SELECT query_id, neighbor_id, score,
       |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM sc)
       |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
       |FROM rk WHERE rnk <= 5
       |ORDER BY query_id, rank""".stripMargin

  private lazy val annLshSql: String =
    s"""WITH $embCte,
       |bk AS (SELECT vec_id, emb, nrm,
       |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
       |  FROM nm),
       |q AS (SELECT * FROM bk WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.bucket,
       |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
       |       FROM bk c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |rk AS (SELECT query_id, neighbor_id, bucket, score,
       |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM sc)
       |SELECT query_id, neighbor_id, bucket, score, CAST(rnk AS INT) AS rank
       |FROM rk WHERE rnk <= 3
       |ORDER BY query_id, rank""".stripMargin

  private lazy val annIvfSql: String =
      s"""WITH $embCte,
         |ex AS (SELECT label AS cell, g AS pos, CAST(embedding[g] AS DOUBLE) AS v
         |       FROM (SELECT label, embedding, unnest(range(1, len(embedding)+1)) AS g
         |             FROM embeddings) z),
         |cs AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
         |              COUNT(*) AS n
         |       FROM ex GROUP BY cell, pos),
         |cent AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS centroid
         |         FROM cs GROUP BY cell),
         |cn AS (SELECT cell, centroid, sqrt(list_dot_product(centroid, centroid)) AS cnrm
         |       FROM cent),
         |q AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
         |pr AS (SELECT q.vec_id AS query_id, cn.cell,
         |              row_number() OVER (PARTITION BY q.vec_id
         |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
         |                         cn.cell) AS prk
         |       FROM q CROSS JOIN cn),
         |probed AS (SELECT query_id, cell FROM pr WHERE prk <= 2),
         |sc AS (SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS cell,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM probed p
         |       JOIN nm c ON c.label = p.cell
         |       JOIN nm q ON q.vec_id = p.query_id
         |       WHERE c.vec_id <> p.query_id),
         |rk AS (SELECT query_id, neighbor_id, cell, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, cell, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin

  /** q232 BPE encode: 6 unrolled merge rounds (generated). Each round
    * picks the current frequency-weighted argmax adjacent symbol pair
    * (ties by pair text) and merges leftmost-first non-overlapping via
    * the run trick — a running match count splits runs, the run-min
    * anchors even offsets. Mirrors graft.ext.Bpe.bpeSegment exactly. */
  private lazy val bpeSql: String =
    s"""WITH ${bpeChainCtes(6)},
       |seg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces,
       |          string_agg(sym, ' ' ORDER BY pos) AS segmentation
       |        FROM s6 GROUP BY w)
       |SELECT v.w AS word, v.freq, CAST(length(v.w) AS BIGINT) AS n_chars,
       |       seg.n_pieces, CAST(v.freq * seg.n_pieces AS BIGINT) AS corpus_pieces,
       |       seg.segmentation
       |FROM bvocab v JOIN seg USING (w)
       |ORDER BY freq DESC, word LIMIT 40""".stripMargin

  /** The shared BPE training CTE chain (vocab, char state, `rounds`
    * unrolled merge rounds) used by q232/q237/q238 — bf$$r carries each
    * round's argmax pair with its weighted count, s$$r the post-merge
    * symbol state. */
  private def bpeChainCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""p$r AS (SELECT w, pos, sym,
         |         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |       FROM $prev),
         |bf$r AS (SELECT a, b, cnt FROM (
         |    SELECT p.sym AS a, p.nxt AS b, CAST(SUM(v.freq) AS BIGINT) AS cnt
         |    FROM p$r p JOIN bvocab v USING (w)
         |    WHERE p.nxt IS NOT NULL GROUP BY 1, 2) z
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |b$r AS (SELECT a, b FROM bf$r),
         |m$r AS (SELECT p.w, p.pos, p.sym, p.nxt,
         |          COALESCE(p.sym = b.a AND p.nxt = b.b, false) AS is_match
         |        FROM p$r p CROSS JOIN b$r b),
         |m2$r AS (SELECT *, SUM(CASE WHEN is_match THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY w ORDER BY pos) AS mk FROM m$r),
         |m3$r AS (SELECT *, pos - mk AS grp FROM m2$r),
         |m4$r AS (SELECT *, MIN(CASE WHEN is_match THEN pos END)
         |           OVER (PARTITION BY w, grp) AS rs FROM m3$r),
         |m5$r AS (SELECT *, (is_match AND (pos - rs) % 2 = 0) AS applied
         |         FROM m4$r),
         |m6$r AS (SELECT *, COALESCE(lag(applied)
         |           OVER (PARTITION BY w ORDER BY pos), false) AS absorbed
         |         FROM m5$r),
         |s$r AS (SELECT w,
         |          row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
         |          CASE WHEN applied THEN sym || nxt ELSE sym END AS sym
         |        FROM m6$r WHERE NOT absorbed)""".stripMargin
    }.mkString(",\n")
    s"""$nCte,
       |bvocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(t, ' ')) AS w FROM n) z
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |s0 AS (SELECT w, CAST(g AS BIGINT) AS pos,
       |         substr(w, CAST(g + 1 AS INT), 1) AS sym
       |       FROM (SELECT w, unnest(range(0, length(w))) AS g FROM bvocab) z),
       |$roundCtes""".stripMargin
  }

  /** Exact char-8-gram Jaccard pair CTEs over the df-capped space
    * (needs `h` from [[char8HashCte]] in scope) — shared by the q244
    * candidate eval and the q248 threshold sweep. Mirrors
    * TextDedup.jaccardJoined. */
  private def exactJaccardCtes: String =
    s"""hot AS (SELECT hv FROM h GROUP BY hv
       |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
       |hc AS (SELECT * FROM h WHERE hv NOT IN (SELECT hv FROM hot)),
       |szc AS (SELECT doc_id, COUNT(*) AS n FROM hc GROUP BY doc_id),
       |ivc AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |          COUNT(*) AS n_inter
       |        FROM hc a JOIN hc b ON a.hv = b.hv AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |jp AS (SELECT doc_a, doc_b, n_inter, za.n + zb.n - n_inter AS u
       |       FROM ivc JOIN szc za ON za.doc_id = ivc.doc_a
       |            JOIN szc zb ON zb.doc_id = ivc.doc_b)""".stripMargin

  /** q263 LPA-communities oracle (generated): 4 synchronous label-
    * propagation rounds unrolled as CTEs (each round votes over the
    * previous round's labels, argmax by count desc then smallest
    * label), then Newman modularity of the final partition in exact
    * HUGEINT up to the one-row e6 rounding. */
  private lazy val lpaSql: String = {
    val rounds = 4
    val roundCtes = (1 to rounds).map { t =>
      s"""v$t AS (SELECT dd.u AS node, l.lab, COUNT(*) AS c
         |       FROM dd JOIN l${t - 1} l ON dd.v = l.node GROUP BY 1, 2),
         |l$t AS (SELECT node, lab FROM (SELECT node, lab,
         |         row_number() OVER (PARTITION BY node
         |           ORDER BY c DESC, lab) AS rk FROM v$t) z
         |       WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
       |            FROM lineitem),
       |prx AS (SELECT a.item AS u, b.item AS v
       |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
       |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |dd AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
       |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM dd),
       |$roundCtes,
       |dg AS (SELECT u AS node, COUNT(*) AS deg FROM dd GROUP BY 1),
       |mem AS (SELECT l$rounds.lab, COUNT(*) AS n_nodes,
       |          SUM(CAST(dg.deg AS HUGEINT)) AS dsum
       |        FROM l$rounds JOIN dg USING (node) GROUP BY 1),
       |intra AS (SELECT lu.lab, COUNT(*) AS ec
       |          FROM prx JOIN l$rounds lu ON prx.u = lu.node
       |               JOIN l$rounds lv ON prx.v = lv.node
       |          WHERE lu.lab = lv.lab GROUP BY 1),
       |mm AS (SELECT COUNT(*) AS m FROM prx),
       |comm AS (SELECT mem.lab, mem.n_nodes, mem.dsum,
       |           COALESCE(intra.ec, 0) AS ec
       |         FROM mem LEFT JOIN intra USING (lab)),
       |qn AS (SELECT SUM(CAST(4 AS HUGEINT) * mm.m * ec - dsum * dsum)
       |           AS qnum,
       |         COUNT(*) AS n_communities
       |       FROM comm CROSS JOIN mm),
       |chg AS (SELECT SUM(CASE WHEN l$rounds.lab <> l${rounds - 1}.lab
       |             THEN 1 ELSE 0 END) AS n_changed_last
       |        FROM l$rounds JOIN l${rounds - 1} USING (node))
       |SELECT CAST(comm.lab AS BIGINT) AS community,
       |       CAST(n_nodes AS BIGINT) AS n_nodes,
       |       CAST(ec AS BIGINT) AS intra_edges,
       |       CAST(dsum AS BIGINT) AS deg_sum,
       |       CAST(n_communities AS BIGINT) AS n_communities,
       |       CAST(CASE WHEN mm.m = 0 THEN 0 ELSE
       |           round(CAST(qnum AS DOUBLE)
       |             / (4.0 * mm.m * mm.m) * 1e6, 0) END AS BIGINT)
       |         AS modularity_e6,
       |       CAST(COALESCE(n_changed_last, 0) AS BIGINT)
       |         AS n_changed_last
       |FROM comm CROSS JOIN mm CROSS JOIN qn CROSS JOIN chg
       |ORDER BY n_nodes DESC, community
       |LIMIT 20""".stripMargin
  }

  /** q264 HITS oracle (generated): 3 hub/authority rounds unrolled as
    * CTEs — each round sums the opposite side's previous scores over
    * the bipartite purchase edges and rescales by ⌊·10⁶ / max⌋ in
    * HUGEINT, matching the operator's ∞-norm integer contract. */
  private lazy val hitsSql: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { t =>
      s"""h${t}r AS (SELECT c, SUM(a) AS h FROM ed JOIN a${t - 1} USING (p)
         |        GROUP BY c),
         |h${t}m AS (SELECT MAX(h) AS mx FROM h${t}r),
         |h$t AS (SELECT c, h * 1000000 // mx AS h
         |       FROM h${t}r CROSS JOIN h${t}m),
         |a${t}r AS (SELECT p, SUM(h) AS a FROM ed JOIN h$t USING (c)
         |        GROUP BY p),
         |a${t}m AS (SELECT MAX(a) AS mx FROM a${t}r),
         |a$t AS (SELECT p, a * 1000000 // mx AS a
         |       FROM a${t}r CROSS JOIN a${t}m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |a0 AS (SELECT DISTINCT p, CAST(1000000 AS HUGEINT) AS a FROM ed),
       |$roundCtes,
       |hd AS (SELECT c, COUNT(*) AS deg FROM ed GROUP BY c),
       |ad AS (SELECT p, COUNT(*) AS deg FROM ed GROUP BY p),
       |un AS (SELECT 'hub' AS side, c AS node, hd.deg AS deg,
       |         h$rounds.h AS score
       |       FROM h$rounds JOIN hd USING (c)
       |       UNION ALL
       |       SELECT 'auth', p, ad.deg, a$rounds.a
       |       FROM a$rounds JOIN ad USING (p)),
       |rk AS (SELECT side, node, deg, score,
       |         row_number() OVER (PARTITION BY side
       |           ORDER BY score DESC, node) AS rk
       |       FROM un)
       |SELECT side, CAST(node AS BIGINT) AS node,
       |       CAST(deg AS BIGINT) AS degree,
       |       CAST(score AS BIGINT) AS score_e6
       |FROM rk WHERE rk <= 10
       |ORDER BY side, score_e6 DESC, node""".stripMargin
  }

  /** q262 IVF probe sweep oracle (generated): the q49 centroid-probe
    * chain at k = 5 for nprobe ∈ {1, 2, 4}, each setting's hits counted
    * against the brute top-5. */
  private lazy val ivfSweepSql: String = {
    val probes = Seq(1, 2, 4)
    val per = probes.map { p =>
      s"""pb$p AS (SELECT query_id, cell FROM pr WHERE prk <= $p),
         |sc$p AS (SELECT p2.query_id, c.vec_id AS neighbor_id,
         |          ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |        FROM pb$p p2
         |        JOIN nm c ON c.label = p2.cell
         |        JOIN nm q ON q.vec_id = p2.query_id
         |        WHERE c.vec_id <> p2.query_id),
         |rk$p AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |    FROM sc$p) z WHERE rnk <= 5),
         |h$p AS (SELECT COUNT(*) AS n_hits
         |        FROM rk$p JOIN bx USING (query_id, neighbor_id))""".stripMargin
    }.mkString(",\n")
    val rows = probes.map(p =>
      s"""SELECT CAST($p AS INT) AS nprobe,
         |  (SELECT n_queries FROM nq) AS n_queries,
         |  (SELECT n_hits FROM h$p) AS n_hits""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH $embCte,
       |ex AS (SELECT label AS cell, g AS pos, CAST(embedding[g] AS DOUBLE) AS v
       |       FROM (SELECT label, embedding, unnest(range(1, len(embedding)+1)) AS g
       |             FROM embeddings) z),
       |cs AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
       |              COUNT(*) AS n
       |       FROM ex GROUP BY cell, pos),
       |cent AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS centroid
       |         FROM cs GROUP BY cell),
       |cn AS (SELECT cell, centroid, sqrt(list_dot_product(centroid, centroid)) AS cnrm
       |       FROM cent),
       |q AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
       |nq AS (SELECT COUNT(*) AS n_queries FROM q),
       |pr AS (SELECT q.vec_id AS query_id, cn.cell,
       |              row_number() OVER (PARTITION BY q.vec_id
       |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
       |                         cn.cell) AS prk
       |       FROM q CROSS JOIN cn),
       |bx AS (SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) DESC,
       |                      c.vec_id) AS rnk
       |    FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id) z
       |  WHERE rnk <= 5),
       |$per
       |SELECT nprobe, CAST(n_queries AS BIGINT) AS n_queries,
       |       CAST(n_hits AS BIGINT) AS n_hits,
       |       CAST(n_hits * 1000000 // (n_queries * 5) AS BIGINT) AS recall_ppm
       |FROM ($rows) u ORDER BY nprobe""".stripMargin
  }

  /** q227 product-quantization oracle: deterministic seed-slice
    * codebook + one Lloyd refinement, integer coding/LUT/ADC joins —
    * extracted to a val so q246's retrieval-eval oracle can nest it
    * verbatim. Mirrors graft.ext.Similarity.pqTopK. */
  private lazy val pqTopKSql: String =
    s"""WITH $embCte,
       |ux AS (SELECT vec_id, unnest(emb) AS x,
       |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |u6 AS (SELECT vec_id, CAST(i // 2 AS INT) AS m,
       |         CAST(i % 2 AS INT) AS j,
       |         CASE WHEN nrm = 0.0 THEN 0
       |              ELSE CAST(round(x / nrm * 1000000, 0) AS BIGINT)
       |         END AS xe6
       |       FROM ux),
       |b0 AS (SELECT CAST(vec_id AS INT) AS aid, m, j, xe6 AS ce6
       |       FROM u6 WHERE vec_id < 64),
       |d1 AS (SELECT u6.vec_id AS nid, u6.m, b0.aid,
       |         CAST(SUM((u6.xe6 - b0.ce6)*(u6.xe6 - b0.ce6))
       |           AS BIGINT) AS d2
       |       FROM u6 JOIN b0 ON u6.m = b0.m AND u6.j = b0.j
       |       GROUP BY 1, 2, 3),
       |a1 AS (SELECT nid, m, aid FROM (
       |    SELECT nid, m, aid, row_number() OVER (
       |      PARTITION BY nid, m ORDER BY d2, aid) AS rn
       |    FROM d1) z WHERE rn = 1),
       |book AS (SELECT a1.aid, a1.m, u6.j,
       |           CAST(CASE WHEN SUM(u6.xe6) >= 0
       |                THEN SUM(u6.xe6) // COUNT(*)
       |                ELSE -((-SUM(u6.xe6)) // COUNT(*)) END
       |             AS BIGINT) AS ce6
       |         FROM a1 JOIN u6 ON a1.nid = u6.vec_id AND a1.m = u6.m
       |         GROUP BY 1, 2, 3),
       |dist AS (SELECT u6.vec_id AS neighbor_id, u6.m, book.aid,
       |           CAST(SUM((u6.xe6 - book.ce6)*(u6.xe6 - book.ce6))
       |             AS BIGINT) AS d2
       |         FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |         GROUP BY 1, 2, 3),
       |codes AS (SELECT neighbor_id, m, aid FROM (
       |    SELECT neighbor_id, m, aid, row_number() OVER (
       |      PARTITION BY neighbor_id, m ORDER BY d2, aid) AS rn
       |    FROM dist) z WHERE rn = 1),
       |lut AS (SELECT u6.vec_id AS query_id, u6.m, book.aid,
       |          CAST(SUM(u6.xe6 * book.ce6) AS BIGINT) AS pdot
       |        FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |        WHERE u6.vec_id < 10
       |        GROUP BY 1, 2, 3),
       |sc AS (SELECT lut.query_id, codes.neighbor_id,
       |         CAST(SUM(lut.pdot) AS BIGINT) AS pq_dot
       |       FROM codes JOIN lut
       |         ON codes.m = lut.m AND codes.aid = lut.aid
       |       WHERE codes.neighbor_id <> lut.query_id
       |       GROUP BY 1, 2),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY pq_dot DESC, neighbor_id) AS rnk FROM sc),
       |eq AS (SELECT * FROM nm WHERE vec_id < 10),
       |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          CASE WHEN eq.nrm * c.nrm = 0.0 THEN 0.0
       |               ELSE ROUND(list_dot_product(eq.emb, c.emb)
       |                          /(eq.nrm*c.nrm), 4) END AS score
       |        FROM nm c CROSS JOIN eq WHERE c.vec_id <> eq.vec_id),
       |erk AS (SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY score DESC, neighbor_id) AS rnk
       |        FROM esc)
       |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
       |       rk.pq_dot,
       |       CAST(CASE WHEN erk.neighbor_id IS NULL THEN 0 ELSE 1 END
       |         AS INT) AS in_exact_topk
       |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) erk
       |  ON rk.query_id = erk.query_id AND rk.neighbor_id = erk.neighbor_id
       |WHERE rk.rnk <= 5
       |ORDER BY rk.query_id, rank""".stripMargin

  /** q233 IVFADC oracle: the IVF centroid probe restricting the q227
    * ADC scoring to 2 cells; extracted to a val for q246's nesting.
    * Mirrors graft.ext.Similarity.ivfPqTopK. */
  private lazy val ivfAdcSql: String =
    s"""WITH $embCte,
       |ex AS (SELECT label AS cell, g AS pos, CAST(embedding[g] AS DOUBLE) AS v
       |       FROM (SELECT label, embedding, unnest(range(1, len(embedding)+1)) AS g
       |             FROM embeddings) z),
       |cs AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
       |              COUNT(*) AS n
       |       FROM ex GROUP BY cell, pos),
       |cent AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS centroid
       |         FROM cs GROUP BY cell),
       |cn AS (SELECT cell, centroid, sqrt(list_dot_product(centroid, centroid)) AS cnrm
       |       FROM cent),
       |qq AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
       |pr AS (SELECT q.vec_id AS query_id, cn.cell,
       |              row_number() OVER (PARTITION BY q.vec_id
       |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
       |                         cn.cell) AS prk
       |       FROM qq q CROSS JOIN cn),
       |probed AS (SELECT query_id, cell FROM pr WHERE prk <= 2),
       |ux AS (SELECT vec_id, unnest(emb) AS x,
       |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |u6 AS (SELECT vec_id, CAST(i // 2 AS INT) AS m,
       |         CAST(i % 2 AS INT) AS j,
       |         CASE WHEN nrm = 0.0 THEN 0
       |              ELSE CAST(round(x / nrm * 1000000, 0) AS BIGINT)
       |         END AS xe6
       |       FROM ux),
       |b0 AS (SELECT CAST(vec_id AS INT) AS aid, m, j, xe6 AS ce6
       |       FROM u6 WHERE vec_id < 64),
       |d1 AS (SELECT u6.vec_id AS nid, u6.m, b0.aid,
       |         CAST(SUM((u6.xe6 - b0.ce6)*(u6.xe6 - b0.ce6))
       |           AS BIGINT) AS d2
       |       FROM u6 JOIN b0 ON u6.m = b0.m AND u6.j = b0.j
       |       GROUP BY 1, 2, 3),
       |a1 AS (SELECT nid, m, aid FROM (
       |    SELECT nid, m, aid, row_number() OVER (
       |      PARTITION BY nid, m ORDER BY d2, aid) AS rn
       |    FROM d1) z WHERE rn = 1),
       |book AS (SELECT a1.aid, a1.m, u6.j,
       |           CAST(CASE WHEN SUM(u6.xe6) >= 0
       |                THEN SUM(u6.xe6) // COUNT(*)
       |                ELSE -((-SUM(u6.xe6)) // COUNT(*)) END
       |             AS BIGINT) AS ce6
       |         FROM a1 JOIN u6 ON a1.nid = u6.vec_id AND a1.m = u6.m
       |         GROUP BY 1, 2, 3),
       |dist AS (SELECT u6.vec_id AS neighbor_id, u6.m, book.aid,
       |           CAST(SUM((u6.xe6 - book.ce6)*(u6.xe6 - book.ce6))
       |             AS BIGINT) AS d2
       |         FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |         GROUP BY 1, 2, 3),
       |codes AS (SELECT neighbor_id, m, aid FROM (
       |    SELECT neighbor_id, m, aid, row_number() OVER (
       |      PARTITION BY neighbor_id, m ORDER BY d2, aid) AS rn
       |    FROM dist) z WHERE rn = 1),
       |lut AS (SELECT u6.vec_id AS query_id, u6.m, book.aid,
       |          CAST(SUM(u6.xe6 * book.ce6) AS BIGINT) AS pdot
       |        FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |        WHERE u6.vec_id < 10
       |        GROUP BY 1, 2, 3),
       |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS cell
       |         FROM probed p JOIN nm c ON c.label = p.cell
       |         WHERE c.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id, cand.cell,
       |         CAST(SUM(lut.pdot) AS BIGINT) AS pq_dot
       |       FROM cand JOIN codes ON codes.neighbor_id = cand.neighbor_id
       |            JOIN lut ON lut.query_id = cand.query_id
       |                    AND lut.m = codes.m AND lut.aid = codes.aid
       |       GROUP BY 1, 2, 3),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY pq_dot DESC, neighbor_id) AS rnk FROM sc),
       |eq AS (SELECT * FROM nm WHERE vec_id < 10),
       |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          CASE WHEN eq.nrm * c.nrm = 0.0 THEN 0.0
       |               ELSE ROUND(list_dot_product(eq.emb, c.emb)
       |                          /(eq.nrm*c.nrm), 4) END AS score
       |        FROM nm c CROSS JOIN eq WHERE c.vec_id <> eq.vec_id),
       |erk AS (SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY score DESC, neighbor_id) AS rnk
       |        FROM esc)
       |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
       |       rk.cell, rk.pq_dot,
       |       CAST(CASE WHEN erk.neighbor_id IS NULL THEN 0 ELSE 1 END
       |         AS INT) AS in_exact_topk
       |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) erk
       |  ON rk.query_id = erk.query_id AND rk.neighbor_id = erk.neighbor_id
       |WHERE rk.rnk <= 5
       |ORDER BY rk.query_id, rank""".stripMargin

  /** q236 multi-round k-means: 4 unrolled Lloyd rounds (generated) in
    * the q227 integer contract — e6 unit components, sign-split
    * floor-mean recentering, exact-integer argmin reassignment; the
    * `converged` flag compares the last two rounds' assignments.
    * Mirrors graft.ext.Similarity.kmeansRounds exactly. */
  /** The k-means CTE prefix through the round-`rounds` assignment
    * `a<rounds>` — shared by the q236 report and q247's cluster-eval
    * oracle (both consume the same unrolled Lloyd recursion). */
  private def kmeansAssignCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""c$r AS (SELECT a.cell, u.i,
         |          CAST(CASE WHEN SUM(u.xe6) >= 0
         |               THEN SUM(u.xe6) // COUNT(*)
         |               ELSE -((-SUM(u.xe6)) // COUNT(*)) END AS BIGINT) AS ce6
         |        FROM a${r - 1} a JOIN ku6 u ON a.vec_id = u.vec_id
         |        GROUP BY 1, 2),
         |d$r AS (SELECT u.vec_id, c.cell,
         |          CAST(SUM((u.xe6 - c.ce6)*(u.xe6 - c.ce6)) AS BIGINT) AS d2
         |        FROM ku6 u JOIN c$r c ON u.i = c.i GROUP BY 1, 2),
         |a$r AS (SELECT vec_id, cell, d2 FROM (
         |    SELECT vec_id, cell, d2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d$r) z
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$embCte,
       |kux AS (SELECT vec_id, label, unnest(emb) AS x,
       |          unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |ku6 AS (SELECT vec_id, label, CAST(i AS INT) AS i,
       |          CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6
       |        FROM kux WHERE nrm > 0),
       |a0 AS (SELECT DISTINCT vec_id, label AS cell FROM ku6),
       |$roundCtes""".stripMargin
  }

  private lazy val kmeansRoundsSql: String = {
    val rounds = 4
    s"""WITH ${kmeansAssignCtes(rounds)},
       |mv AS (SELECT CAST(SUM(CASE WHEN p.cell <> a.cell THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_moved
       |       FROM a${rounds - 1} p JOIN a$rounds a USING (vec_id))
       |SELECT a.cell AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
       |       CAST(SUM(CASE WHEN p.cell <> a.cell THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_arrived,
       |       CAST(SUM(a.d2) AS BIGINT) AS total_d2,
       |       CAST(CASE WHEN mv.n_moved = 0 THEN 1 ELSE 0 END AS INT)
       |         AS converged
       |FROM a$rounds a JOIN a${rounds - 1} p USING (vec_id) CROSS JOIN mv
       |GROUP BY a.cell, mv.n_moved
       |ORDER BY cluster""".stripMargin
  }

  /** q239 label spreading: 3 unrolled frontier rounds (generated) over
    * the bucketed 0.30-cosine graph; assigned nodes are fixed, each
    * round is one edge⋈labels join + weighted argmax. Mirrors
    * ExtQueries.labelSpreading exactly. */
  private lazy val labelSpreadingSql: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { r =>
      s"""n$r AS (SELECT e.u, l.label, CAST(SUM(e.w) AS BIGINT) AS s
         |       FROM ed e JOIN l${r - 1} l ON e.v = l.vec_id
         |       WHERE e.u NOT IN (SELECT vec_id FROM l${r - 1})
         |       GROUP BY 1, 2),
         |w$r AS (SELECT u, label FROM (
         |    SELECT u, label, row_number() OVER (PARTITION BY u
         |      ORDER BY s DESC, label) AS rn FROM n$r) z WHERE rn = 1),
         |l$r AS (SELECT * FROM l${r - 1}
         |        UNION ALL SELECT u, label, $r FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCte,
       |bk AS (SELECT vec_id, emb, nrm,
       |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
       |  FROM nm),
       |pr0 AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |          ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
       |        FROM bk a JOIN bk b
       |          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pw AS (SELECT ia, ib, CAST(round(cos*10000, 0) AS BIGINT) AS w
       |       FROM pr0 WHERE cos >= 0.30),
       |ed AS (SELECT ia AS u, ib AS v, w FROM pw
       |       UNION ALL SELECT ib, ia, w FROM pw),
       |l0 AS (SELECT vec_id, label, 0 AS ar FROM embeddings
       |       WHERE vec_id % 5 = 0),
       |$roundCtes
       |SELECT e.vec_id,
       |       CAST(CASE WHEN l.ar = 0 THEN 1 ELSE 0 END AS INT) AS is_seed,
       |       l.label, CAST(l.ar AS INT) AS assigned_round
       |FROM embeddings e LEFT JOIN l$rounds l USING (vec_id)
       |ORDER BY vec_id""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_top_performers" ->
      s"""WITH priced AS (
         |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         |         lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
         |  FROM orders)
         |SELECT c.c_custkey, c.c_name, p.o_orderkey,
         |       CAST(p.o_orderdate AS DATE) AS order_date,
         |       p.o_totalprice, p.prev_price,
         |       ROUND((p.o_totalprice - p.prev_price)/p.prev_price*100, 6) AS change_pct
         |FROM priced p JOIN customer c ON p.o_custkey = c.c_custkey
         |WHERE p.prev_price > 0
         |ORDER BY change_pct DESC, p.o_orderkey
         |LIMIT 20""".stripMargin,
    "q02_market_summary" ->
      s"""SELECT r.r_name AS market,
         |       COUNT(*) AS n_items,
         |       ${moneyAvg("l.l_extendedprice")} AS avg_price,
         |       CAST(SUM(CAST(ROUND(l.l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty,
         |       ${moneySum("l.l_extendedprice")} AS total_amount
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name
         |ORDER BY total_amount DESC, market""".stripMargin,
    "q03_daily_summary" ->
      s"""SELECT CAST(o_orderdate AS DATE) AS order_date,
         |       COUNT(*) AS n_orders,
         |       ${moneyAvg("o_totalprice")} AS avg_price,
         |       ${moneySum("o_totalprice")} AS total_amount
         |FROM orders
         |GROUP BY CAST(o_orderdate AS DATE)
         |ORDER BY order_date""".stripMargin,
    "q04_cond_counts" ->
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_distinct_counts" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q06_minmax_dates" ->
      """SELECT l_suppkey,
        |       MIN(CAST(l_shipdate AS DATE)) AS first_ship,
        |       MAX(CAST(l_shipdate AS DATE)) AS last_ship,
        |       COUNT(*) AS n_ship
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    "q07_correlation" ->
      s"""WITH dim AS (
         |  SELECT s.s_suppkey, n.n_name
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
         |daily AS (
         |  SELECT d.n_name, CAST(l.l_shipdate AS DATE) AS d,
         |         ${moneySum("l.l_extendedprice")} AS rev
         |  FROM lineitem l JOIN dim d ON l.l_suppkey = d.s_suppkey
         |  GROUP BY 1, 2)
         |SELECT a.n_name AS key_a, b.n_name AS key_b,
         |       ROUND(corr(a.rev, b.rev), 4) AS correlation,
         |       COUNT(*) AS n_days
         |FROM daily a JOIN daily b ON a.d = b.d
         |WHERE a.n_name < b.n_name
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    "q08_backtest_universe" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment
        |FROM customer c
        |WHERE (c.c_acctbal IS NULL OR c.c_acctbal > 0)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderdate >= TIMESTAMP '1998-01-01'
        |                AND o.o_orderdate <  TIMESTAMP '1999-01-01'
        |                AND o.o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,
    "q09_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q10_returns" ->
      """WITH w AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |    first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS base_price
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       ROUND(o_totalprice/prev_price - 1, 6) AS daily_return,
        |       ROUND(o_totalprice/base_price - 1, 6) AS cum_return
        |FROM w
        |WHERE prev_price IS NOT NULL AND prev_price > 0
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q11_point_lookup" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders
        |WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey DESC
        |LIMIT 1""".stripMargin,
    "q12_topk_revenue" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "q13_distribution" ->
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q14_global_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |       MIN(CAST(l_shipdate AS DATE)) AS min_date,
        |       MAX(CAST(l_shipdate AS DATE)) AS max_date
        |FROM lineitem""".stripMargin,
    "q15_normalize" ->
      """SELECT c_custkey,
        |       TRY_CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS code,
        |       substr(regexp_replace(c_name, '[^0-9]', '', 'g'), 1, 6) AS code6,
        |       NULLIF(trim(c_mktsegment), '') AS segment
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q16_validate" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE regexp_full_match(event_type, '[a-z]+')
        |  AND event_type IS NOT NULL AND length(event_type) > 0
        |  AND value IS NOT NULL AND value >= 0 AND value <= 1000
        |  AND user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q17_dedup_by_key" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_extendedprice DESC, l_partkey DESC,
        |                 l_suppkey DESC, l_quantity DESC, l_discount DESC,
        |                 l_tax DESC, l_shipdate DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q18_relaxed_union" ->
      """SELECT c_custkey AS entity_key, c_name AS name, 'customer' AS kind,
        |       c_acctbal AS acctbal, c_mktsegment AS segment
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, 'supplier', s_acctbal, NULL
        |FROM supplier
        |ORDER BY kind, entity_key""".stripMargin,
    "q19_anti_new_keys" ->
      """SELECT DISTINCT o_custkey
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = o.o_custkey
        |                    AND o2.o_orderdate < TIMESTAMP '1998-01-01')
        |ORDER BY o_custkey""".stripMargin,
    "q20_upsert" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q21_compact_replacing" ->
      """SELECT user_id, event_type, event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q22_update_where" ->
      """SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY o_orderstatus""".stripMargin,
    "q23_delete_where" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING')
        |ORDER BY c_custkey""".stripMargin,
    "q24_tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         |       event_type, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "q25_sliding_window" ->
      s"""SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
         |         - k.k * INTERVAL '30 minutes' AS window_start,
         |       event_type, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "q26_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id,
         |       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) AS TIMESTAMP) AS session_end,
         |       COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "q27_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q28_token_stats" ->
      s"""WITH $nCte
         |SELECT doc_id,
         |       len(string_split(t, ' ')) AS n_ws_tokens,
         |       len(regexp_extract_all(t, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpe_tokens,
         |       length(t) AS n_chars_norm
         |FROM n
         |ORDER BY doc_id""".stripMargin,
    "q29_quality_score" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(length(w)) AS tok_chars,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |base AS (SELECT doc_id, length(t) AS n_chars,
         |                length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS n_punct
         |         FROM n)
         |SELECT b.doc_id AS doc_id, st.n_tokens,
         |       ROUND(CAST(st.tok_chars AS DOUBLE)/st.n_tokens, 4) AS mean_tok_len,
         |       ROUND(CAST(b.n_punct AS DOUBLE)/b.n_chars, 4) AS punct_ratio,
         |       ROUND(CAST(st.n_stop AS DOUBLE)/st.n_tokens, 4) AS stop_ratio,
         |       CASE WHEN st.n_tokens BETWEEN 10 AND 1000
         |                 AND CAST(st.n_stop AS DOUBLE)/st.n_tokens >= 0.05
         |            THEN 1 ELSE 0 END AS is_quality
         |FROM base b JOIN st ON st.doc_id = b.doc_id
         |ORDER BY 1""".stripMargin,
    "q30_langid" ->
      s"""WITH $nCte,
         |$tokCte,
         |sc AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |       FROM tok GROUP BY doc_id)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS predicted_lang
         |FROM sc
         |ORDER BY doc_id""".stripMargin,
    "q31_fingerprint" ->
      s"""WITH $nCte,
         |$char8HashCte
         |SELECT doc_id,
         |       CAST(SUM(hv) % ${graft.ext.TextOps.HashP} AS BIGINT) AS fingerprint,
         |       COUNT(*) AS n_shingles
         |FROM h
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q32_dedup_exact" ->
      s"""WITH $nCte
         |SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies, length(t) AS n_chars_norm
         |FROM n
         |GROUP BY t
         |ORDER BY rep_id""".stripMargin,
    "q33_dedup_ngram_jaccard" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |hot AS (SELECT sh FROM sh0 GROUP BY sh
         |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
         |sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q34_dedup_minhash_lsh" ->
      s"""WITH $nCte,
         |$minhashCtes
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q35_dedup_simhash" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS f
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |th AS (SELECT doc_id, ${hv8("rpad(f, 8, ' ')")} AS hv FROM bg),
         |votes AS (SELECT doc_id, $simhashVoteCols FROM th GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($simhashFpExpr AS BIGINT) AS fp FROM votes),
         |bnd AS (SELECT doc_id, fp, shift, (fp >> shift) & 255 AS bv
         |        FROM fp CROSS JOIN (VALUES (0),(8),(16),(24)) AS s(shift)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.fp AS fp_a, y.fp AS fp_b
         |         FROM bnd x JOIN bnd y
         |           ON x.shift = y.shift AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(fp_a, fp_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q36_embed_near_dup" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS bucket,
         |       ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |FROM nm a JOIN nm b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_ann_brute_topk" -> annBruteSql,
    "q38_ann_lsh_topk" -> annLshSql,
    // Mirrors the payload builders' integer arithmetic — every modality
    // is a real container decode of a deterministically-built file: BMP
    // byte layout (54-byte headers + 4-byte-padded pixel rows) for image
    // rows, canonical PCM WAV layout (44-byte header, zero-pad to block
    // align) for audio rows, animated GIF layout (13+6 header/GCT bytes,
    // per frame 8-byte GCE + 10-byte descriptor + LZW-size byte + data
    // split into <=255-byte length-prefixed sub-blocks + terminator,
    // 1-byte trailer) for video rows.
    "q39_multimodal_meta" ->
      """WITH m AS (SELECT doc_id,
        |                  CAST(doc_id % 3 AS INT) AS m3,
        |                  CAST(1 + doc_id % 64 AS INT) AS bw,
        |                  CAST(1 + (doc_id * 7) % 64 AS INT) AS bh,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sr,
        |                  CAST(1 + doc_id % 32 AS INT) AS vw,
        |                  CAST(1 + (doc_id * 3) % 32 AS INT) AS vh,
        |                  CAST(1 + doc_id % 10 AS INT) AS vf,
        |                  length(text) AS tlen
        |           FROM documents),
        |m2 AS (SELECT *, tlen + CASE WHEN tlen % ch = 0 THEN 0 ELSE 1 END AS adata,
        |              vw*vh + (vw*vh + 124)//125 + 1 AS lz
        |       FROM m)
        |SELECT doc_id,
        |       CASE m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(CASE WHEN m3 = 0 THEN 54 + ((bw*3+3)//4)*4*bh
        |                 WHEN m3 = 1 THEN 44 + adata
        |                 ELSE 398 + vf*(20 + lz + (lz + 254)//255) END AS BIGINT) AS byte_len,
        |       CAST(CASE WHEN m3 = 0 THEN bw WHEN m3 = 1 THEN 0
        |                 ELSE vw END AS INT) AS width,
        |       CAST(CASE WHEN m3 = 0 THEN bh WHEN m3 = 1 THEN 0
        |                 ELSE vh END AS INT) AS height,
        |       CAST(CASE WHEN m3 = 2 THEN vf
        |                 WHEN m3 = 1 THEN adata // ch
        |                 ELSE 1 END AS INT) AS n_frames,
        |       CAST(CASE WHEN m3 = 1 THEN sr ELSE 0 END AS INT) AS sample_rate,
        |       CAST(CASE WHEN m3 = 1 THEN ch ELSE 0 END AS INT) AS n_channels
        |FROM m2
        |ORDER BY doc_id""".stripMargin,
    "q40_frame_sample" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 10 AS n_frames
        |           FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
        |FROM (SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx FROM m) z
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q41_session_window" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged)
         |SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
         |       user_id, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_start""".stripMargin,
    "q42_key_in_range" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (1, 7, 42, 99, 123)
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND o_totalprice > 0
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q43_running_total" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT))
        |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
        |         AS cum_total
        |FROM orders
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q44_monthly_rollup" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total_amount
         |FROM orders
         |GROUP BY 1
         |ORDER BY month""".stripMargin,
    "q45_data_quality" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_acctbal,
        |       CAST(SUM(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive,
        |       CAST(SUM(CASE WHEN length(trim(c_name)) = 0 OR c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_name,
        |       ROUND(CAST(SUM(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*), 4) AS nonpositive_share
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q46_asof_join" ->
      """WITH refs AS (
        |  SELECT o_custkey, o_orderdate AS ref_ts, o_orderkey AS ref_orderkey,
        |         o_totalprice AS ref_price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn
        |        FROM orders WHERE o_totalprice > 200000)
        |  WHERE rn = 1)
        |SELECT l.o_custkey, l.o_orderkey, CAST(l.o_orderdate AS DATE) AS order_date,
        |       l.o_totalprice, r.ref_orderkey, r.ref_price
        |FROM orders l
        |ASOF LEFT JOIN refs r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.ref_ts
        |ORDER BY l.o_custkey, order_date, l.o_orderkey""".stripMargin,
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE $nCte,
         |$minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |          WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label FROM reach r JOIN edges e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(label) AS cluster_id,
         |       CAST(CASE WHEN node = MIN(label) THEN 1 ELSE 0 END AS INT) AS is_rep
         |FROM reach
         |GROUP BY node
         |ORDER BY doc_id""".stripMargin,
    // Keep-best dedup: the q47 reachability labels extended with a
    // longest-text survivor per cluster (ties to smallest doc_id).
    "q184_dedup_keep_best" ->
      s"""WITH RECURSIVE $nCte,
         |$minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |          WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label FROM reach r JOIN edges e ON e.src = r.node),
         |mem AS (SELECT node AS doc_id, MIN(label) AS cluster_id
         |        FROM reach GROUP BY node),
         |ln AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars FROM n),
         |j AS (SELECT m.cluster_id, m.doc_id, ln.n_chars
         |      FROM mem m JOIN ln ON m.doc_id = ln.doc_id),
         |r AS (SELECT cluster_id, doc_id, n_chars,
         |             row_number() OVER (PARTITION BY cluster_id
         |               ORDER BY n_chars DESC, doc_id) AS rk
         |      FROM j)
         |SELECT cluster_id,
         |       MIN(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc,
         |       COUNT(*) AS n_members,
         |       MIN(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
         |       CAST(SUM(n_chars) - MIN(CASE WHEN rk = 1 THEN n_chars END)
         |            AS BIGINT) AS dropped_chars
         |FROM r GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,
    // Oracled against the ORIGINAL parquet table, not the CSV files: the
    // operator's contract is a lossless write→parse→typed-scan round
    // trip, and reading the source table keeps the gate independent of
    // when the fixed drop directory is rewritten at another scale factor
    // (e.g. a bench run between Verify and the DuckDB compare).
    "q48_csv_roundtrip" ->
      s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment
         |FROM customer
         |ORDER BY c_custkey""".stripMargin,
    "q49_ann_ivf_topk" -> annIvfSql,
    "q50_corpus_report" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |        SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |       FROM tok GROUP BY doc_id),
         |pd AS (SELECT doc_id, n_tokens,
         |        CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                  AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |             THEN 1 ELSE 0 END AS is_quality,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM st),
         |rep AS (SELECT MIN(doc_id) AS doc_id FROM n GROUP BY t)
         |SELECT pd.predicted_lang, pd.is_quality,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |       ROUND(CAST(SUM(pd.n_tokens) AS DOUBLE)/COUNT(*), 4) AS avg_tokens
         |FROM pd LEFT JOIN rep r ON r.doc_id = pd.doc_id
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    // Lossless-round-trip invariant against the ORIGINAL table (same
    // rationale as q48).
    "q51_json_roundtrip" ->
      s"""SELECT doc_id, text, lang, source, n_chars
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q52_hash_split" ->
      s"""WITH b AS (SELECT doc_id, length(text) AS len, $bucketExpr AS bucket
         |           FROM documents)
         |SELECT CASE WHEN bucket < 90 THEN 'train'
         |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
         |       CAST(SUM(len) AS BIGINT) AS sum_chars,
         |       CAST(SUM(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_in_10pct_sample
         |FROM b GROUP BY 1
         |ORDER BY split""".stripMargin,
    // Token/bigram identity = the same full-length rolling hash the
    // kernel computes, so distinct/frequency semantics (collisions
    // included) are engine-identical.
    "q53_repetition" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n WHERE t <> ''),
         |th AS (SELECT doc_id, ${fullHash("w")} AS hv
         |       FROM (SELECT doc_id, unnest(toks) AS w FROM tk) z),
         |tc AS (SELECT doc_id, hv, COUNT(*) AS c FROM th GROUP BY 1, 2),
         |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |              COUNT(*) AS n_distinct, MAX(c) AS top
         |       FROM tc GROUP BY 1),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS sg
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |bh AS (SELECT doc_id, ${fullHash("sg")} AS hv FROM bg),
         |bs AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT hv) AS nd_bg
         |       FROM bh GROUP BY 1)
         |SELECT ts.doc_id, ts.n_tokens,
         |       ROUND(CAST(n_distinct AS DOUBLE)/n_tokens, 4) AS distinct_ratio,
         |       ROUND(CAST(top AS DOUBLE)/n_tokens, 4) AS top_token_frac,
         |       COALESCE(ROUND(1.0 - CAST(nd_bg AS DOUBLE)/n_bg, 4), 0.0)
         |         AS dup_bigram_frac,
         |       CASE WHEN ROUND(CAST(n_distinct AS DOUBLE)/n_tokens, 4) < 0.5
         |              OR ROUND(CAST(top AS DOUBLE)/n_tokens, 4) > 0.2
         |              OR COALESCE(ROUND(1.0 - CAST(nd_bg AS DOUBLE)/n_bg, 4), 0.0) > 0.5
         |            THEN 1 ELSE 0 END AS is_repetitive
         |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
         |ORDER BY ts.doc_id""".stripMargin,
    // Augmentation (same expression as ExtQueries.piiScrub) injects
    // doc_id-derived PII so the redaction regexes bite on every row;
    // counts are against the augmented original, replacements cascade
    // URL -> EMAIL -> PHONE.
    "q54_pii_scrub" ->
      s"""WITH $nCte,
         |a AS (SELECT doc_id,
         |        t || ' contact user' || CAST(doc_id AS VARCHAR)
         |          || '@mail.example.com or https://ex.org/d/'
         |          || CAST(doc_id AS VARCHAR)
         |          || '?ref=a call 010-1234-5678' AS t
         |      FROM n)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.EmailPattern}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.UrlPattern}')) AS BIGINT) AS n_urls,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.PhonePattern}')) AS BIGINT) AS n_phones,
         |       regexp_replace(regexp_replace(regexp_replace(t,
         |         '${graft.ext.TextClean.UrlPattern}', '<URL>', 'g'),
         |         '${graft.ext.TextClean.EmailPattern}', '<EMAIL>', 'g'),
         |         '${graft.ext.TextClean.PhonePattern}', '<PHONE>', 'g') AS clean_text
         |FROM a
         |ORDER BY doc_id""".stripMargin,
    "q55_token_histogram" ->
      s"""WITH $nCte,
         |c AS (SELECT CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens FROM n)
         |SELECT n_tokens - (n_tokens % 16) AS bucket_lo,
         |       COUNT(*) AS n_docs,
         |       MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
         |FROM c GROUP BY 1
         |ORDER BY bucket_lo""".stripMargin,
    "q56_corpus_quantiles" ->
      s"""WITH $nCte,
         |c AS (SELECT CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
         |             CAST(length(t) AS BIGINT) AS n_chars
         |      FROM n),
         |q AS (SELECT quantile_cont(n_tokens, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qt,
         |             quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qc
         |      FROM c)
         |SELECT ROUND(qt[1], 4) AS tok_p25, ROUND(qt[2], 4) AS tok_p50,
         |       ROUND(qt[3], 4) AS tok_p75, ROUND(qt[4], 4) AS tok_p90,
         |       ROUND(qt[5], 4) AS tok_p99,
         |       ROUND(qc[1], 4) AS chr_p25, ROUND(qc[2], 4) AS chr_p50,
         |       ROUND(qc[3], 4) AS chr_p75, ROUND(qc[4], 4) AS chr_p90,
         |       ROUND(qc[5], 4) AS chr_p99
         |FROM q""".stripMargin,
    "q60_vocab_topk" ->
      s"""WITH $nCte,
         |$tokCte,
         |agg AS (SELECT w, COUNT(*) AS n_occurrences,
         |               COUNT(DISTINCT doc_id) AS n_docs
         |        FROM tok GROUP BY w),
         |rk AS (SELECT w, n_occurrences, n_docs,
         |              row_number() OVER (ORDER BY n_occurrences DESC, w) AS rnk
         |       FROM agg)
         |SELECT w, n_occurrences, n_docs, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 20
         |ORDER BY rank""".stripMargin,
    // Span strings are rebuilt with list-slice + array_to_string — the
    // same characters (tokens joined by single spaces) the kernel hashes.
    "q61_dup_passages" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |pg AS (SELECT doc_id, array_to_string(toks[g:g+19], ' ') AS sg
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-18)) AS g FROM tk) z),
         |ph AS (SELECT DISTINCT doc_id, ${fullHash("sg")} AS hv FROM pg)
         |SELECT hv AS passage_hash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
         |FROM ph GROUP BY hv
         |HAVING COUNT(*) >= 2
         |ORDER BY passage_hash""".stripMargin,
    "q58_decontamination" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |bh AS (SELECT DISTINCT hv FROM h WHERE doc_id < 5),
         |sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM h
         |       WHERE doc_id >= 5 GROUP BY 1),
         |ov AS (SELECT doc_id, COUNT(*) AS n_contam FROM h
         |       WHERE doc_id >= 5 AND hv IN (SELECT hv FROM bh) GROUP BY 1)
         |SELECT sz.doc_id, sz.n_shingles,
         |       COALESCE(ov.n_contam, 0) AS n_contam,
         |       ROUND(CAST(COALESCE(ov.n_contam, 0) AS DOUBLE)/sz.n_shingles, 4)
         |         AS contam_frac,
         |       CASE WHEN ROUND(CAST(COALESCE(ov.n_contam, 0) AS DOUBLE)/sz.n_shingles, 4) >= 0.35
         |            THEN 1 ELSE 0 END AS flagged
         |FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
         |ORDER BY sz.doc_id""".stripMargin,
    "q59_sequence_packing" ->
      s"""WITH $nCte,
         |c AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |      FROM n),
         |p AS (SELECT doc_id, n_tokens,
         |             CAST(floor(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |               / 2048.0) AS BIGINT) AS bin
         |      FROM c)
         |SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         |FROM p GROUP BY bin
         |ORDER BY bin""".stripMargin,
    "q57_stratified_mix" ->
      s"""WITH b AS (SELECT lang, $bucketExpr AS bucket FROM documents),
         |k AS (SELECT lang, COUNT(*) AS n_kept FROM b
         |      WHERE bucket < (CASE lang WHEN 'en' THEN 25
         |                                WHEN 'zh' THEN 100 ELSE 60 END)
         |      GROUP BY lang),
         |t AS (SELECT lang, COUNT(*) AS n_total FROM b GROUP BY lang)
         |SELECT t.lang, t.n_total, COALESCE(k.n_kept, 0) AS n_kept,
         |       ROUND(CAST(COALESCE(k.n_kept, 0) AS DOUBLE)/t.n_total, 4) AS kept_rate
         |FROM t LEFT JOIN k ON t.lang = k.lang
         |ORDER BY t.lang""".stripMargin,
    "q62_c4_filter" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT)))*1.0
         |          / len(toks) AS ml,
         |        len(list_filter(toks, w -> length(w) >= 7))*1.0 / len(toks) AS lf,
         |        CAST(len(list_filter(toks,
         |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS ns
         |      FROM tk),
         |r AS (SELECT *, CASE WHEN n_tokens < 50 THEN 'too_short'
         |                     WHEN ml < 4.2 OR ml > 4.8 THEN 'word_len'
         |                     WHEN lf > 0.06 THEN 'long_token_frac'
         |                     WHEN ns < 2 THEN 'no_stopwords'
         |                     ELSE 'kept' END AS reject_reason
         |      FROM m)
         |SELECT doc_id, n_tokens, ROUND(ml, 4) AS mean_tok_len,
         |       ROUND(lf, 4) AS long_frac, ns AS n_stopwords,
         |       CASE WHEN reject_reason = 'kept' THEN 1 ELSE 0 END AS keep,
         |       reject_reason
         |FROM r
         |ORDER BY doc_id""".stripMargin,
    "q185_quality_funnel" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT)))*1.0
         |          / len(toks) AS ml,
         |        len(list_filter(toks, w -> length(w) >= 7))*1.0 / len(toks) AS lf,
         |        CAST(len(list_filter(toks,
         |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS ns
         |      FROM tk),
         |r AS (SELECT doc_id, CASE WHEN n_tokens < 50 THEN 'too_short'
         |                     WHEN ml < 4.2 OR ml > 4.8 THEN 'word_len'
         |                     WHEN lf > 0.06 THEN 'long_token_frac'
         |                     WHEN ns < 2 THEN 'no_stopwords'
         |                     ELSE 'kept' END AS reject_reason
         |      FROM m),
         |g AS (SELECT d.source, r.reject_reason, COUNT(*) AS n_docs
         |      FROM r JOIN documents d ON r.doc_id = d.doc_id
         |      GROUP BY d.source, r.reject_reason)
         |SELECT source, reject_reason, n_docs,
         |       CAST((n_docs * 1000000) // SUM(n_docs) OVER (PARTITION BY source)
         |            AS BIGINT) AS share_ppm
         |FROM g ORDER BY source, reject_reason""".stripMargin,
    "q63_source_quota" ->
      s"""WITH ranked AS (
         |  SELECT source, doc_id, n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY $bucketExpr, doc_id) AS qrank
         |  FROM documents)
         |SELECT source, doc_id, n_chars
         |FROM ranked WHERE qrank <= 15
         |ORDER BY source, doc_id""".stripMargin,
    "q64_shard_shuffle" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |         CAST((((doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |           % ${graft.ext.TextOps.HashP}) % 8 AS INT) AS shard
         |  FROM documents)
         |SELECT doc_id, shard,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY shard
         |         ORDER BY $bucketExpr, doc_id) AS BIGINT) AS pos
         |FROM s
         |ORDER BY shard, pos""".stripMargin,
    "q65_snapshot_diff" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |v2 AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 13 = 1 THEN text || ' v2' ELSE text END AS text
         |  FROM base WHERE doc_id % 17 <> 3
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM base WHERE doc_id % 29 = 0),
         |a AS (SELECT doc_id AS k, md5(text) AS old_hash FROM base),
         |b AS (SELECT doc_id AS k, md5(text) AS new_hash FROM v2),
         |j AS (SELECT COALESCE(a.k, b.k) AS doc_id, a.old_hash, b.new_hash
         |      FROM a FULL OUTER JOIN b ON a.k = b.k)
         |SELECT doc_id,
         |       CASE WHEN old_hash IS NULL THEN 'added'
         |            WHEN new_hash IS NULL THEN 'removed'
         |            WHEN old_hash <> new_hash THEN 'changed' END AS change_type,
         |       COALESCE(old_hash, '') AS old_hash,
         |       COALESCE(new_hash, '') AS new_hash
         |FROM j
         |WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
         |ORDER BY doc_id""".stripMargin,
    "q66_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q67_rarity_score" ->
      s"""WITH $nCte,
         |$tokCte,
         |v AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |r AS (SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
         |      FROM v QUALIFY rank <= 20)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       ROUND(CAST(SUM(r.rank) AS DOUBLE) / COUNT(r.rank), 4) AS mean_rank,
         |       ROUND(CAST(SUM(CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |         / COUNT(*), 4) AS oov_rate
         |FROM tok t LEFT JOIN r ON t.w = r.w
         |GROUP BY t.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // Mirrors Versioning.exactNewDocs: md5 content hash of the prev
    // snapshot (doc_id < 400), left-join marker probe over every doc.
    // md5(text) == rowHash(Seq("text")) because documents.text is
    // non-null in the corpus (same simplification as q65's oracle).
    "q68_exact_new_docs" ->
      """WITH ph AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400)
        |SELECT d.doc_id,
        |       CASE WHEN ph.h IS NULL THEN 1 ELSE 0 END AS is_new
        |FROM (SELECT doc_id, md5(text) AS h FROM documents) d
        |LEFT JOIN ph ON d.h = ph.h
        |ORDER BY d.doc_id""".stripMargin,
    "q69_status_pivot" -> {
      def n(s: String, a: String) =
        s"CAST(SUM(CASE WHEN o_orderstatus = '$s' THEN 1 ELSE 0 END) AS BIGINT) AS $a"
      def amt(s: String, a: String) =
        s"CAST(SUM(CASE WHEN o_orderstatus = '$s' THEN ${cents("o_totalprice")} ELSE 0 END) AS DOUBLE)/100.0 AS $a"
      s"""SELECT o_orderpriority,
         |       ${n("F", "f_n")}, ${amt("F", "f_amt")},
         |       ${n("O", "o_n")}, ${amt("O", "o_amt")},
         |       ${n("P", "p_n")}, ${amt("P", "p_amt")}
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
    },
    "q70_revenue_rollup" ->
      s"""SELECT COALESCE(r.r_name, 'ALL') AS market,
         |       COALESCE(n.n_name, 'ALL') AS nation,
         |       CASE WHEN r.r_name IS NULL AND n.n_name IS NULL THEN 2
         |            WHEN n.n_name IS NULL THEN 1 ELSE 0 END AS lvl,
         |       COUNT(*) AS n_items,
         |       ${moneySum("l.l_extendedprice")} AS total
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY ROLLUP(r.r_name, n.n_name)
         |ORDER BY lvl, market, nation""".stripMargin,
    "q71_revenue_quartiles" ->
      s"""WITH totals AS (
         |  SELECT o_custkey, ${moneySum("o_totalprice")} AS total
         |  FROM orders GROUP BY o_custkey),
         |j AS (
         |  SELECT c.c_mktsegment, t.o_custkey, t.total,
         |         NTILE(4) OVER (PARTITION BY c.c_mktsegment
         |           ORDER BY t.total DESC, t.o_custkey) AS quartile
         |  FROM totals t JOIN customer c ON t.o_custkey = c.c_custkey)
         |SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
         |       ${moneySum("total")} AS sum_total,
         |       MIN(total) AS min_total, MAX(total) AS max_total
         |FROM j
         |GROUP BY c_mktsegment, quartile
         |ORDER BY c_mktsegment, quartile""".stripMargin,
    "q72_gap_fill" ->
      s"""WITH b AS (
         |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
         |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
         |  FROM orders),
         |spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS month FROM b),
         |monthly AS (
         |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         ${moneySum("o_totalprice")} AS amt
         |  FROM orders WHERE o_custkey < 20
         |  GROUP BY 1, 2),
         |keys AS (SELECT DISTINCT o_custkey FROM monthly),
         |g AS (SELECT k.o_custkey, s.month, m.amt
         |      FROM keys k CROSS JOIN spine s
         |      LEFT JOIN monthly m ON k.o_custkey = m.o_custkey AND s.month = m.month)
         |SELECT o_custkey, month,
         |       COALESCE(last_value(amt IGNORE NULLS) OVER (
         |         PARTITION BY o_custkey ORDER BY month
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS amt_filled,
         |       CASE WHEN amt IS NULL THEN 1 ELSE 0 END AS is_gap
         |FROM g
         |ORDER BY o_custkey, month""".stripMargin,
    "q73_event_funnel" ->
      s"""WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts) AS tc
         |      FROM events e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.ts > v.tv
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts) AS tp
         |      FROM events e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.ts > c.tc
         |      GROUP BY e.user_id)
         |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
         |UNION ALL SELECT '2_click', COUNT(*) FROM c
         |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
         |ORDER BY stage""".stripMargin,
    "q74_cohort_retention" ->
      s"""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |coh AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id)
         |SELECT c.cohort_day,
         |       date_diff('day', c.cohort_day, a.d) AS day_offset,
         |       COUNT(DISTINCT a.user_id) AS n_users
         |FROM act a JOIN coh c ON a.user_id = c.user_id
         |WHERE date_diff('day', c.cohort_day, a.d) <= 7
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    "q75_chunking" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id, toks,
         |        GREATEST((CAST(len(toks) AS BIGINT) - 16 + 47) // 48, 1) AS n_chunks
         |      FROM tk),
         |g AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM m)
         |SELECT doc_id, chunk_idx,
         |       chunk_idx * 48 AS tok_start,
         |       CAST(len(list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64)) AS BIGINT)
         |         AS n_tok_chunk,
         |       array_to_string(list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
         |         AS chunk_text
         |FROM g
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q76_kmeans_step" ->
      s"""WITH $embCte,
         |ex AS (SELECT label AS cell, g AS pos, CAST(embedding[g] AS DOUBLE) AS v
         |       FROM (SELECT label, embedding, unnest(range(1, len(embedding)+1)) AS g
         |             FROM embeddings) z),
         |cs AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
         |              COUNT(*) AS n
         |       FROM ex GROUP BY cell, pos),
         |cent AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS centroid
         |         FROM cs GROUP BY cell),
         |cn AS (SELECT cell, centroid, sqrt(list_dot_product(centroid, centroid)) AS cnrm
         |       FROM cent),
         |sc AS (SELECT v.vec_id, v.emb, v.label AS old_cell, cn.cell,
         |              ROUND(list_dot_product(v.emb, cn.centroid)/(v.nrm*cn.cnrm), 4) AS score
         |       FROM nm v CROSS JOIN cn),
         |asg AS (SELECT vec_id, emb, old_cell, cell FROM sc
         |        QUALIFY row_number() OVER (PARTITION BY vec_id
         |          ORDER BY score DESC, cell) = 1),
         |ex2 AS (SELECT cell, g AS pos, emb[g] AS v
         |        FROM (SELECT cell, emb, unnest(range(1, len(emb)+1)) AS g FROM asg) z),
         |cs2 AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
         |               COUNT(*) AS n
         |        FROM ex2 GROUP BY cell, pos),
         |cent2 AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS nc
         |          FROM cs2 GROUP BY cell),
         |sz AS (SELECT cell, COUNT(*) AS n_assigned,
         |              CAST(SUM(CASE WHEN old_cell = cell THEN 1 ELSE 0 END) AS BIGINT)
         |                AS n_stayed
         |       FROM asg GROUP BY cell)
         |SELECT cn.cell, sz.n_assigned, sz.n_stayed,
         |       ROUND(list_dot_product(cn.centroid, c2.nc) /
         |         (sqrt(list_dot_product(cn.centroid, cn.centroid)) *
         |          sqrt(list_dot_product(c2.nc, c2.nc))), 4) AS centroid_cos
         |FROM cn
         |JOIN cent2 c2 ON cn.cell = c2.cell
         |JOIN sz ON sz.cell = cn.cell
         |ORDER BY cn.cell""".stripMargin,
    "q77_bpe_merge_pairs" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS pair
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |agg AS (SELECT pair, COUNT(*) AS n_occurrences,
         |               COUNT(DISTINCT doc_id) AS n_docs
         |        FROM bg GROUP BY pair),
         |rk AS (SELECT pair, n_occurrences, n_docs,
         |              CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair) AS INT)
         |                AS rank
         |       FROM agg)
         |SELECT pair, n_occurrences, n_docs, rank
         |FROM rk WHERE rank <= 20
         |ORDER BY rank""".stripMargin,
    "q78_quality_sample" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id,
         |             CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                       AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |                  THEN 1 ELSE 0 END AS is_quality
         |      FROM st),
         |k AS (SELECT is_quality,
         |             CASE WHEN $bucketExpr < 20 + is_quality * 60 THEN 1 ELSE 0 END AS kept
         |      FROM q)
         |SELECT is_quality, COUNT(*) AS n_total,
         |       CAST(SUM(kept) AS BIGINT) AS n_kept,
         |       ROUND(CAST(SUM(kept) AS DOUBLE)/COUNT(*), 4) AS kept_rate
         |FROM k GROUP BY is_quality
         |ORDER BY is_quality""".stripMargin,
    "q79_max_drawdown" ->
      """WITH p AS (
        |  SELECT o_custkey, o_totalprice,
        |         MAX(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |       MAX(o_totalprice) AS peak_price,
        |       ROUND(MIN(o_totalprice / peak - 1), 4) AS max_drawdown
        |FROM p
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q80_volatility" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |         o_totalprice / lag(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) - 1 AS ret,
        |         lag(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev_price
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_returns,
        |       ROUND(AVG(ret), 4) AS mean_return,
        |       ROUND(STDDEV_SAMP(ret), 4) AS volatility
        |FROM r
        |WHERE prev_price IS NOT NULL AND prev_price > 0
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 2
        |ORDER BY o_custkey""".stripMargin,
    "q81_top_per_group" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${moneySum("l_extendedprice")} AS revenue
         |  FROM lineitem GROUP BY l_suppkey),
         |j AS (
         |  SELECT n.n_name, s.s_suppkey, s.s_name, r.revenue,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
         |           ORDER BY r.revenue DESC, s.s_suppkey) AS INT) AS rank
         |  FROM rev r
         |  JOIN supplier s ON r.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
         |SELECT n_name, rank, s_suppkey, s_name, revenue
         |FROM j WHERE rank <= 5
         |ORDER BY n_name, rank""".stripMargin,
    "q82_set_ops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders
        |        WHERE year(o_orderdate) = 1996)
        |SELECT 'both_years' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96) a
        |UNION ALL
        |SELECT 'only_1995' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96) b
        |ORDER BY cohort, o_custkey""".stripMargin,
    // Frame sums accumulate integer cents (the windowed moneySum idiom) so
    // both engines divide identical exact integers — no rounding needed.
    "q83_moving_average" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |         o_totalprice,
        |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CAST(COUNT(*) OVER w AS INT) AS n_in_frame,
        |       CAST(SUM(cents) OVER w AS DOUBLE)/100.0/(COUNT(*) OVER w) AS ma_price
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // σ from the exact integer identity n·Σx²−(Σx)² over frame cents; the
    // breakout comparisons run on unrounded IEEE-identical values, display
    // columns rounded after.
    "q84_bollinger_bands" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |         o_totalprice,
        |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |  FROM orders),
        |f AS (
        |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |         SUM(cents) OVER w AS s1,
        |         SUM(cents*cents) OVER w AS s2,
        |         COUNT(*) OVER w AS nf
        |  FROM c
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT *, CAST(s1 AS DOUBLE)/100.0/nf AS ma,
        |         sqrt(CAST(nf*s2 - s1*s1 AS DOUBLE) /
        |              CAST(nf*(nf-1) AS DOUBLE))/100.0 AS sd
        |  FROM f WHERE nf >= 2)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CAST(nf AS INT) AS n_in_frame,
        |       ma AS ma_price, ROUND(sd, 4) AS band_sd,
        |       CAST(o_totalprice > ma + 2*sd AS INT) AS breakout_up,
        |       CAST(o_totalprice < ma - 2*sd AS INT) AS breakout_down
        |FROM b
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Series reduce to exact cents-sum revenues before any window/join;
    // covar_pop/var_pop are order-dependent O(1) accumulations → final
    // ratio rounded, the q07 corr contract.
    "q85_beta_vs_market" ->
      s"""WITH li AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, l_extendedprice
         |  FROM lineitem),
         |daily AS (
         |  SELECT l_suppkey, d, ${moneySum("l_extendedprice")} AS rev
         |  FROM li GROUP BY 1, 2),
         |market AS (
         |  SELECT d, ${moneySum("l_extendedprice")} AS mkt_rev
         |  FROM li GROUP BY 1),
         |rets AS (
         |  SELECT l_suppkey, d,
         |         lag(d) OVER (PARTITION BY l_suppkey ORDER BY d) AS prev_d,
         |         lag(rev) OVER (PARTITION BY l_suppkey ORDER BY d) AS prev_rev,
         |         rev
         |  FROM daily),
         |j AS (
         |  SELECT r.l_suppkey,
         |         r.rev / r.prev_rev - 1 AS ret_s,
         |         m1.mkt_rev / m2.mkt_rev - 1 AS ret_m
         |  FROM rets r
         |  JOIN market m1 ON r.d = m1.d
         |  JOIN market m2 ON r.prev_d = m2.d
         |  WHERE r.prev_rev IS NOT NULL AND r.prev_rev > 0 AND m2.mkt_rev > 0)
         |SELECT l_suppkey, COUNT(*) AS n_days,
         |       ROUND(covar_pop(ret_s, ret_m) / var_pop(ret_m), 4) AS beta,
         |       ROUND(corr(ret_s, ret_m), 4) AS mkt_corr
         |FROM j
         |GROUP BY l_suppkey
         |HAVING COUNT(*) >= 10
         |ORDER BY l_suppkey""".stripMargin,
    // GROUPING(a, b) bit order (first arg = MSB) matches Spark's
    // grouping_id() over the same column list.
    "q86_cube_summary" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
         |       COUNT(*) AS n_items,
         |       ${moneySum("l_quantity")} AS sum_qty,
         |       ${moneySum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q87_unpivot_metrics" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |         CAST(COUNT(*) AS DOUBLE) AS n_items,
         |         ${moneySum("l_quantity")} AS sum_qty,
         |         ${moneySum("l_extendedprice")} AS sum_price,
         |         ${moneySum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, value FROM (
         |  SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_qty', sum_qty FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
         |ORDER BY l_returnflag, metric""".stripMargin,
    // Winner set is all-integer (tf desc, term); the IDF weight is the
    // only float and is display-rounded. ln = natural log both sides.
    "q88_tfidf_top_terms" ->
      """WITH ns AS (
        |  SELECT doc_id, source,
        |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS w
        |         FROM ns),
        |tot AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM documents),
        |dft AS (SELECT w, COUNT(DISTINCT doc_id) AS n_docs FROM toks GROUP BY w),
        |tf AS (SELECT source, w, COUNT(*) AS tf FROM toks GROUP BY source, w),
        |j AS (
        |  SELECT tf.source, tf.w, tf.tf, dft.n_docs,
        |         ROUND(tf.tf * ln(CAST(n_total AS DOUBLE)/n_docs), 4) AS tfidf,
        |         row_number() OVER (PARTITION BY tf.source
        |           ORDER BY tf.tf DESC, tf.w) AS rnk
        |  FROM tf JOIN dft USING (w) CROSS JOIN tot)
        |SELECT source, CAST(rnk AS INT) AS rank, w, tf, n_docs, tfidf
        |FROM j WHERE rnk <= 10
        |ORDER BY source, rank""".stripMargin,
    // Gains/losses are integer cents; the count terms of avg-gain /
    // avg-loss cancel, so RSI = 100·Σgain/(Σgain+Σloss) divides two
    // exact integers (flat frame → neutral 50 by convention).
    "q89_rsi" ->
      s"""WITH c AS (
         |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |         o_totalprice, ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, px - lag(px) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey) AS chg
         |  FROM c),
         |g AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |         CASE WHEN chg > 0 THEN chg ELSE 0 END AS gain,
         |         CASE WHEN chg < 0 THEN -chg ELSE 0 END AS loss
         |  FROM l WHERE chg IS NOT NULL),
         |f AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |         CAST(SUM(gain) OVER w AS BIGINT) AS sg,
         |         CAST(SUM(loss) OVER w AS BIGINT) AS sl,
         |         COUNT(*) OVER w AS nc
         |  FROM g
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |       CASE WHEN sg + sl = 0 THEN 50.0
         |            ELSE CAST((sg * 1000000) // (sg + sl) AS DOUBLE)/10000.0
         |       END AS rsi
         |FROM f WHERE nc = 14
         |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Numerator and denominator both accumulate integer centi-units; the
    // VWAP is fixed-point floor(p·10⁴/q)/10⁴ — all-integer until one
    // exact final division, immune to the ROUND(p/q) half-tie where the
    // shortest-decimal (Spark HALF_UP) and binary-double (DuckDB)
    // roundings disagree.
    "q90_vwap" ->
      s"""SELECT l_suppkey,
         |       date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |       COUNT(*) AS n_items,
         |       CAST(SUM(${cents("l_quantity")}) AS DOUBLE)/100.0 AS total_qty,
         |       ${moneySum("l_extendedprice")} AS total_notional,
         |       CAST((CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) * 10000) //
         |            CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS DOUBLE)/10000.0
         |         AS vwap
         |FROM lineitem
         |GROUP BY 1, 2
         |ORDER BY l_suppkey, month""".stripMargin,
    // Open/close = price at the (date, orderkey) extremes of the week;
    // both engines truncate weeks to the ISO Monday.
    "q91_weekly_ohlc" ->
      s"""WITH c AS (
         |  SELECT o_custkey, date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
         |         CAST(o_orderdate AS DATE) AS d, o_orderkey, o_totalprice
         |  FROM orders),
         |r AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY o_custkey, week
         |           ORDER BY d, o_orderkey) AS rn_a,
         |         row_number() OVER (PARTITION BY o_custkey, week
         |           ORDER BY d DESC, o_orderkey DESC) AS rn_d
         |  FROM c)
         |SELECT o_custkey, week,
         |       MAX(CASE WHEN rn_a = 1 THEN o_totalprice END) AS open,
         |       MAX(o_totalprice) AS high,
         |       MIN(o_totalprice) AS low,
         |       MAX(CASE WHEN rn_d = 1 THEN o_totalprice END) AS close,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS volume
         |FROM r
         |GROUP BY o_custkey, week
         |ORDER BY o_custkey, week""".stripMargin,
    // Change sign is an exact integer-cents compare; breadth divides two
    // exact counts.
    "q92_market_breadth" ->
      s"""WITH c AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, px - lag(px) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey) AS chg
         |  FROM c)
         |SELECT order_date,
         |       CAST(SUM(CASE WHEN chg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |       CAST(SUM(CASE WHEN chg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |       CAST(SUM(CASE WHEN chg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
         |       ROUND(CAST(SUM(CASE WHEN chg > 0 THEN 1 ELSE 0 END) -
         |                  SUM(CASE WHEN chg < 0 THEN 1 ELSE 0 END) AS DOUBLE) /
         |             COUNT(*), 6) AS breadth
         |FROM l WHERE chg IS NOT NULL
         |GROUP BY order_date
         |ORDER BY order_date""".stripMargin,
    // Gaps-and-islands: island id = running count of non-up rows, so a
    // maximal run of strictly-increasing prices shares one island; the
    // NULL first-row compare falls to the ELSE 0 branch on both engines.
    "q93_up_streaks" ->
      s"""WITH c AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, CASE WHEN px > lag(px) OVER (PARTITION BY o_custkey
         |              ORDER BY order_date, o_orderkey) THEN 1 ELSE 0 END AS up
         |  FROM c),
         |i AS (
         |  SELECT *, SUM(1 - up) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM l),
         |g AS (SELECT o_custkey, island, SUM(up) AS run_len, COUNT(*) AS n_rows
         |      FROM i GROUP BY 1, 2)
         |SELECT o_custkey, CAST(MAX(run_len) AS INT) AS longest_up_streak,
         |       CAST(SUM(n_rows) AS INT) AS n_orders
         |FROM g GROUP BY o_custkey
         |ORDER BY o_custkey""".stripMargin,
    // The verified near-dup pairs of the q34 tier, joined to their
    // source labels and rolled up per unordered source pair.
    "q94_cross_source_leak" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |p AS (SELECT doc_a, doc_b
         |      FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |              JOIN sz zb ON zb.doc_id = iv.doc_b
         |      WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |x AS (SELECT LEAST(sa.source, sb.source) AS source_lo,
         |             GREATEST(sa.source, sb.source) AS source_hi,
         |             doc_a, doc_b
         |      FROM p JOIN documents sa ON sa.doc_id = p.doc_a
         |             JOIN documents sb ON sb.doc_id = p.doc_b
         |      WHERE sa.source <> sb.source),
         |y AS (SELECT *, row_number() OVER (PARTITION BY source_lo, source_hi
         |             ORDER BY doc_a, doc_b) AS rn
         |      FROM x)
         |SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
         |       MAX(CASE WHEN rn = 1 THEN doc_a END) AS example_doc_a,
         |       MAX(CASE WHEN rn = 1 THEN doc_b END) AS example_doc_b
         |FROM y GROUP BY source_lo, source_hi
         |ORDER BY source_lo, source_hi""".stripMargin,
    // Same capped shingle space as q33; asymmetric |A∩B|/|A| instead of
    // Jaccard, pair kept when EITHER direction clears the threshold.
    // Ratios are fixed-point floor division (q90 idiom) — the exact
    // integer ratio can land on a rounding half-tie that ROUND splits
    // differently across engines.
    "q95_dedup_containment" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |hot AS (SELECT sh FROM sh0 GROUP BY sh
         |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
         |sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, za.n AS n_a, zb.n AS n_b, n_inter,
         |       CAST((n_inter * 10000) // za.n AS DOUBLE)/10000.0 AS contain_a,
         |       CAST((n_inter * 10000) // zb.n AS DOUBLE)/10000.0 AS contain_b
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |        JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE GREATEST(CAST(n_inter AS DOUBLE)/za.n,
         |               CAST(n_inter AS DOUBLE)/zb.n) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Integer token counts; cumulative sums compared at the same
    // (count desc, word) total order on both engines.
    "q96_vocab_coverage" ->
      s"""WITH $nCte,
         |tok AS (SELECT unnest(string_split(t, ' ')) AS w FROM n),
         |freq AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
         |               COUNT(*) AS n_vocab FROM freq),
         |top AS (SELECT w, n,
         |               row_number() OVER (ORDER BY n DESC, w) AS rank,
         |               CAST(SUM(n) OVER (ORDER BY n DESC, w
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                 AS BIGINT) AS cum
         |        FROM freq),
         |cuts AS (SELECT * FROM (VALUES (5),(10),(20),(50)) AS c(cutoff)),
         |j AS (SELECT cutoff, CAST(MAX(rank) AS INT) AS n_vocab_used,
         |             MAX(cum) AS covered_tokens
         |      FROM cuts JOIN top ON top.rank <= cuts.cutoff
         |      GROUP BY cutoff)
         |SELECT cutoff, n_vocab_used, covered_tokens, n_vocab, total_tokens,
         |       ROUND(CAST(covered_tokens AS DOUBLE)/total_tokens, 6) AS coverage
         |FROM j CROSS JOIN tot
         |ORDER BY cutoff""".stripMargin,
    // DuckDB's native ASOF finds the latest at-or-before match; the
    // staleness bound then nulls out matches older than 7 days — the
    // same post-match projection semantics as AsOfJoin.asOfWithin.
    "q97_asof_tolerance" ->
      """WITH refs AS (
        |  SELECT o_custkey, o_orderdate AS ref_ts, o_orderkey AS ref_orderkey,
        |         o_totalprice AS ref_price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn
        |        FROM orders WHERE o_totalprice > 200000)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT l.o_custkey, l.o_orderkey, CAST(l.o_orderdate AS DATE) AS order_date,
        |         l.o_totalprice, r.ref_orderkey, r.ref_price,
        |         date_diff('day', CAST(r.ref_ts AS DATE), CAST(l.o_orderdate AS DATE)) AS age
        |  FROM orders l
        |  ASOF LEFT JOIN refs r
        |    ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.ref_ts)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CASE WHEN age <= 7 THEN ref_orderkey END AS ref_orderkey,
        |       CASE WHEN age <= 7 THEN ref_price END AS ref_price,
        |       CAST(CASE WHEN age <= 7 THEN age END AS INT) AS staleness_days
        |FROM m
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // HHI = Σc²/(Σc)² over integer cents; squares accumulate in HUGEINT
    // (Spark mirrors with DECIMAL(38)) so the ratio divides exact
    // integers converted once to double.
    "q98_hhi_concentration" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |         CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT month, CAST(COUNT(*) AS INT) AS n_suppliers,
         |       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)/100.0 AS total_rev,
         |       ROUND(CAST(MAX(c) AS DOUBLE)/CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 6) AS top_share,
         |       ROUND(CAST(SUM(CAST(c AS HUGEINT)*c) AS DOUBLE) /
         |             (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)*CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)), 6) AS hhi
         |FROM monthly
         |GROUP BY month
         |ORDER BY month""".stripMargin,
    // Ranks are dense integers over the unique (cents desc, suppkey)
    // order; the shift compares a supplier's consecutive ACTIVE months.
    "q99_rank_shift" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |         CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY month
         |              ORDER BY c DESC, l_suppkey) AS rnk
         |  FROM monthly),
         |shifted AS (
         |  SELECT *, lag(rnk) OVER (PARTITION BY l_suppkey ORDER BY month) AS prev_rnk
         |  FROM ranked)
         |SELECT l_suppkey, month, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       CAST(rnk AS INT) AS rnk, CAST(prev_rnk AS INT) AS prev_rnk,
         |       CAST(prev_rnk - rnk AS INT) AS shift
         |FROM shifted WHERE prev_rnk IS NOT NULL
         |ORDER BY l_suppkey, month""".stripMargin,
    // percent_rank/cume_dist over the unique (cents, custkey) order —
    // both engines divide the same small integers.
    "q100_percentile_report" ->
      s"""WITH rev AS (
         |  SELECT o_custkey, CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY o_custkey),
         |seg AS (
         |  SELECT c_mktsegment, o_custkey, c
         |  FROM rev JOIN customer ON o_custkey = c_custkey)
         |SELECT c_mktsegment, o_custkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       ROUND(percent_rank() OVER w, 6) AS pct_rank,
         |       ROUND(cume_dist() OVER w, 6) AS cume
         |FROM seg
         |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c ASC, o_custkey ASC)
         |ORDER BY c_mktsegment, o_custkey""".stripMargin,
    // Day-close price (highest (orderkey, linenumber) row of the day)
    // weighted by calendar days current, last price carried to month
    // end; fixed-point floor division as in q90.
    "q101_twap" ->
      s"""WITH daily AS (
         |  SELECT l_suppkey, d, px, date_trunc('month', d) AS month FROM (
         |    SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
         |           ${cents("l_extendedprice")} AS px,
         |           row_number() OVER (PARTITION BY l_suppkey, CAST(l_shipdate AS DATE)
         |             ORDER BY l_orderkey DESC, l_linenumber DESC, ${cents("l_extendedprice")} DESC) AS rn
         |    FROM lineitem) z
         |  WHERE rn = 1),
         |spans AS (
         |  SELECT *, lead(d) OVER (PARTITION BY l_suppkey, month ORDER BY d) AS next_d
         |  FROM daily),
         |wtd AS (
         |  SELECT l_suppkey, month,
         |         date_diff('day', d, COALESCE(next_d, last_day(d) + 1)) AS w_days, px
         |  FROM spans)
         |SELECT l_suppkey, month, CAST(COUNT(*) AS INT) AS n_price_days,
         |       CAST(SUM(w_days) AS INT) AS span_days,
         |       CAST((CAST(SUM(w_days * px) AS BIGINT) * 100) //
         |            CAST(SUM(w_days) AS BIGINT) AS DOUBLE)/10000.0 AS twap
         |FROM wtd
         |GROUP BY l_suppkey, month
         |ORDER BY l_suppkey, month""".stripMargin,
    // Lag ordering compares microsecond epochs on both sides (Spark's ts
    // is already micros; epoch_us truncates DuckDB's TIMESTAMP_NS the
    // same way), tie-broken by unique event_id. Probabilities use the
    // fixed-point floor-division idiom (q90/q101) — all-integer, no
    // rounding tie possible.
    "q102_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS from_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tots AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM pairs GROUP BY from_type)
        |SELECT pr.from_type, pr.to_type, pr.n,
        |       CAST((pr.n * 1000000) // t.tot AS DOUBLE)/1000000.0 AS p
        |FROM pairs pr JOIN tots t ON pr.from_type = t.from_type
        |ORDER BY pr.from_type, pr.to_type""".stripMargin,
    // First-view/first-subsequent-purchase epochs are exact integer
    // micros on both engines; latency is floor-divided to whole seconds
    // BEFORE the percentiles, so quantile_cont interpolates the same
    // integer set as Spark's type-7 `percentile`.
    "q103_conversion_latency" ->
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS uv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, v.uv, MIN(epoch_us(e.ts)) AS up
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.uv
        |      GROUP BY e.user_id, v.uv),
        |lat AS (SELECT (up - uv) // 1000000 AS latency_sec FROM p)
        |SELECT COUNT(*) AS n_converted,
        |       ROUND(quantile_cont(latency_sec, 0.5), 4) AS p50_sec,
        |       ROUND(quantile_cont(latency_sec, 0.9), 4) AS p90_sec,
        |       MAX(latency_sec) AS max_sec
        |FROM lat""".stripMargin,
    // Class boundaries are all-integer compares over exact cents
    // (cum·5 ≤ total·4, cum·20 ≤ total·19); the display share is
    // fixed-point floor division — no float threshold anywhere.
    "q104_pareto_abc" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY l_suppkey),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM rev),
         |cm AS (
         |  SELECT l_suppkey, c,
         |         CAST(SUM(c) OVER (ORDER BY c DESC, l_suppkey
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM rev)
         |SELECT l_suppkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       CAST(CAST((CAST(cum AS HUGEINT) * 1000000) // total AS BIGINT)
         |            AS DOUBLE)/1000000.0 AS cum_share,
         |       CASE WHEN cum * 5 <= total * 4 THEN 'A'
         |            WHEN cum * 20 <= total * 19 THEN 'B'
         |            ELSE 'C' END AS abc_class
         |FROM cm CROSS JOIN tot
         |ORDER BY revenue DESC, l_suppkey""".stripMargin,
    // Both sides are the q37/q38 CTEs verbatim (rounded score is the
    // ranking key on both engines) cut to top-3; recall divides exact
    // hit counts with fixed-point floor division.
    "q105_ann_recall" ->
      s"""WITH $embCte,
         |q AS (SELECT * FROM nm WHERE vec_id < 10),
         |bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |               ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |        FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
         |br AS (SELECT query_id, neighbor_id FROM (
         |         SELECT query_id, neighbor_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY score DESC, neighbor_id) AS rnk
         |         FROM bsc) WHERE rnk <= 3),
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |lq AS (SELECT * FROM bk WHERE vec_id < 10),
         |lsc AS (SELECT lq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |               ROUND(list_dot_product(lq.emb, c.emb)/(lq.nrm*c.nrm), 4) AS score
         |        FROM bk c JOIN lq ON c.bucket = lq.bucket AND c.vec_id <> lq.vec_id),
         |ls AS (SELECT query_id, neighbor_id FROM (
         |         SELECT query_id, neighbor_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY score DESC, neighbor_id) AS rnk
         |         FROM lsc) WHERE rnk <= 3),
         |hits AS (SELECT b.query_id, COUNT(*) AS n_hit FROM br b
         |         WHERE EXISTS (SELECT 1 FROM ls l
         |                       WHERE l.query_id = b.query_id
         |                         AND l.neighbor_id = b.neighbor_id)
         |         GROUP BY b.query_id),
         |ke AS (SELECT query_id, COUNT(*) AS k_eff FROM br GROUP BY query_id)
         |SELECT ke.query_id, CAST(ke.k_eff AS INT) AS k_eff,
         |       COALESCE(h.n_hit, 0) AS n_hit,
         |       CAST((COALESCE(h.n_hit, 0) * 1000000) // ke.k_eff AS DOUBLE)/1000000.0 AS recall
         |FROM ke LEFT JOIN hits h ON ke.query_id = h.query_id
         |ORDER BY ke.query_id""".stripMargin,
    // Median and MAD are type-7 percentiles over exact integer cents
    // (quantile_cont ≡ Spark `percentile`), so both engines score with
    // the identical doubles; only the display score is rounded.
    "q106_robust_anomalies" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |med AS (SELECT quantile_cont(c, 0.5) AS med FROM daily),
         |mad AS (SELECT quantile_cont(ABS(c - med), 0.5) AS mad
         |        FROM daily CROSS JOIN med)
         |SELECT d, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       med/100.0 AS median_rev, mad/100.0 AS mad_rev,
         |       ROUND((c - med)/(mad*1.4826), 4) AS robust_score
         |FROM daily CROSS JOIN med CROSS JOIN mad
         |WHERE ABS((c - med)/(mad*1.4826)) > 3.0
         |ORDER BY d""".stripMargin,
    // Rolling min/max of exact cents; %K is fixed-point floor division
    // with 50.0 on a flat channel (the q89 convention).
    "q107_stochastic_k" ->
      s"""WITH c AS (
         |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |         o_totalprice, ${cents("o_totalprice")} AS px
         |  FROM orders),
         |f AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice, px,
         |         CAST(MIN(px) OVER w AS BIGINT) AS lo,
         |         CAST(MAX(px) OVER w AS BIGINT) AS hi,
         |         COUNT(*) OVER w AS nw
         |  FROM c
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |       CAST(lo AS DOUBLE)/100.0 AS low_n,
         |       CAST(hi AS DOUBLE)/100.0 AS high_n,
         |       CASE WHEN hi = lo THEN 50.0
         |            ELSE CAST((px - lo) * 1000000 // (hi - lo) AS DOUBLE)/10000.0
         |       END AS pct_k
         |FROM f WHERE nw = 14
         |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Signed centi-quantities under an integer-cents price tick; the
    // running sum is per-supplier (both engines see the same unique
    // (shipdate, orderkey, linenumber) order).
    "q108_obv" ->
      s"""WITH l AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber,
         |         CAST(l_shipdate AS DATE) AS ship_date, l_quantity,
         |         ${cents("l_extendedprice")} AS px,
         |         ${cents("l_quantity")} AS qc
         |  FROM lineitem),
         |s AS (
         |  SELECT *, px - lag(px) OVER w AS chg
         |  FROM l
         |  WINDOW w AS (PARTITION BY l_suppkey
         |               ORDER BY ship_date, l_orderkey, l_linenumber, qc, px)),
         |v AS (
         |  SELECT *, CASE WHEN chg > 0 THEN qc
         |                 WHEN chg < 0 THEN -qc
         |                 ELSE 0 END AS sv
         |  FROM s)
         |SELECT l_suppkey, l_orderkey, l_linenumber, ship_date, l_quantity,
         |       CAST(CAST(SUM(sv) OVER (PARTITION BY l_suppkey
         |              ORDER BY ship_date, l_orderkey, l_linenumber, qc, px
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |            AS DOUBLE)/100.0 AS obv
         |FROM v
         |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin,
    // ISO weekday (1 = Monday) on both engines; money columns use the
    // exact integer-cents idiom.
    "q109_weekday_seasonality" ->
      s"""SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total_rev,
         |       ${moneyAvg("o_totalprice")} AS avg_rev
         |FROM orders
         |GROUP BY 1
         |ORDER BY iso_dow""".stripMargin,
    // Same hashed word-3-gram space as q95 (NO df cap — novelty needs
    // the full df spectrum; the df join is 1:1 per (doc, shingle) row,
    // linear at any scale); novelty is fixed-point floor division.
    "q110_shingle_novelty" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |df AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY sh)
         |SELECT s.doc_id, COUNT(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST((CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |            // COUNT(*) AS DOUBLE)/1000000.0 AS novelty
         |FROM sh0 s JOIN df d ON s.sh = d.sh
         |GROUP BY s.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    // Marker scoring identical to q30; shares divide exact counts
    // fixed-point within each source slice.
    "q111_lang_source_mix" ->
      s"""WITH nn AS (SELECT source, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |            FROM documents),
         |sc AS (SELECT source,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS s_en,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('der','und','die','ist'))) AS BIGINT) AS s_de,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('le','et','les','une'))) AS BIGINT) AS s_fr,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('el','y','los','las'))) AS BIGINT) AS s_es
         |       FROM nn),
         |pr AS (SELECT source,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM sc),
         |cnt AS (SELECT source, predicted_lang, COUNT(*) AS n_docs
         |        FROM pr GROUP BY 1, 2),
         |tots AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS tot
         |         FROM cnt GROUP BY source)
         |SELECT c.source, c.predicted_lang, c.n_docs,
         |       CAST((c.n_docs * 1000000) // t.tot AS DOUBLE)/1000000.0 AS share
         |FROM cnt c JOIN tots t ON c.source = t.source
         |ORDER BY c.source, c.predicted_lang""".stripMargin,
    // One scored projection (marker counts + both tokenizations), then a
    // language-keyed aggregation of exact integers; fertility is
    // fixed-point floor division.
    "q112_token_fertility" ->
      s"""WITH $nCte,
         |sc AS (SELECT doc_id,
         |        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_ws,
         |        CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS s_en,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('der','und','die','ist'))) AS BIGINT) AS s_de,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('le','et','les','une'))) AS BIGINT) AS s_fr,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('el','y','los','las'))) AS BIGINT) AS s_es
         |       FROM n),
         |pr AS (SELECT n_ws, n_bpe,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM sc)
         |SELECT predicted_lang, COUNT(*) AS n_docs,
         |       CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
         |       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
         |       CAST((CAST(SUM(n_bpe) AS BIGINT) * 10000) // CAST(SUM(n_ws) AS BIGINT)
         |            AS DOUBLE)/10000.0 AS fertility
         |FROM pr
         |GROUP BY predicted_lang
         |ORDER BY predicted_lang""".stripMargin,
    // The fact reduces to |days| integer-cents rows; adjacency is an
    // equi join on d+1 (gap days drop); corr is display-rounded (r4).
    "q113_revenue_autocorr" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY 1)
         |SELECT COUNT(*) AS n_pairs,
         |       ROUND(corr(CAST(a.c AS DOUBLE), CAST(b.c AS DOUBLE)), 4) AS autocorr
         |FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY""".stripMargin,
    // The oracle runs the NAIVE inequality join (DuckDB handles it as an
    // IEJoin); the Spark side must produce identical pairs through the
    // bucketized equi-join plan. Inclusive BETWEEN on both engines;
    // synthetic transit duration is all-integer.
    "q114_transit_overlap" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |         CAST(l_shipdate AS DATE) AS ship
        |  FROM lineitem),
        |iv AS (
        |  SELECT l_suppkey, l_orderkey AS i_orderkey,
        |         l_linenumber AS i_linenumber, ship AS t_start,
        |         ship + CAST(1 + (l_orderkey + l_linenumber) % 14 AS INT) AS t_end
        |  FROM li WHERE l_quantity > 45)
        |SELECT iv.l_suppkey AS l_suppkey, i_orderkey, i_linenumber, t_start, t_end,
        |       COUNT(*) AS n_in_window
        |FROM iv JOIN li p
        |  ON p.l_suppkey = iv.l_suppkey
        | AND p.ship BETWEEN iv.t_start AND iv.t_end
        | AND NOT (p.l_orderkey = i_orderkey AND p.l_linenumber = i_linenumber)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY 1, 2, 3""".stripMargin,
    // One lead window per key on both engines; zero-length validity
    // (same-day revisions) is deterministic via the orderkey tiebreak.
    "q115_scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(o_orderdate AS DATE) AS valid_from, o_totalprice
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, valid_from, o_totalprice,
        |       lead(valid_from) OVER w AS valid_to,
        |       CAST(CASE WHEN lead(valid_from) OVER w IS NULL
        |            THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    // Two hops of integer micro-unit mass; every per-edge contribution
    // floors BEFORE the sum, so aggregation order cannot matter and
    // both engines land on identical longs.
    "q116_copurchase_rank" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sd AS (SELECT s, COUNT(*) AS sdeg FROM e GROUP BY s),
        |cd AS (SELECT c, COUNT(*) AS cdeg FROM e GROUP BY c),
        |m1 AS (SELECT e.c, CAST(SUM(1000000 // sd.sdeg) AS BIGINT) AS m1
        |       FROM e JOIN sd ON e.s = sd.s GROUP BY e.c),
        |r2 AS (SELECT e.s, COUNT(*) AS n_customers,
        |              CAST(SUM(m1.m1 // cd.cdeg) AS BIGINT) AS score_units
        |       FROM e JOIN m1 ON e.c = m1.c JOIN cd ON e.c = cd.c
        |       GROUP BY e.s)
        |SELECT s AS l_suppkey, CAST(n_customers AS INT) AS n_customers,
        |       score_units,
        |       CAST(score_units AS DOUBLE)/1000000.0 AS score
        |FROM r2
        |ORDER BY score_units DESC, l_suppkey""".stripMargin,
    // The sketch replayed relationally: same 31-Horner token hash, same
    // LCG row constants, 4×512 integer bucket sums, estimate = MIN over
    // the token's buckets. All integers — the oracle builds the
    // IDENTICAL sketch.
    "q117_cms_heavy_hitters" ->
      s"""WITH $nCte,
         |$tokCte,
         |vocab AS (SELECT w, COUNT(*) AS n FROM tok WHERE w <> '' GROUP BY w),
         |hv AS (SELECT w, n, ${fullHash("w")} AS h FROM vocab),
         |bk AS (SELECT w, n, t.i,
         |         ((CASE t.i WHEN 0 THEN 1103515245*h + 12345
         |                    WHEN 1 THEN 69069*h + 362437
         |                    WHEN 2 THEN 1664525*h + 1013904223
         |                    ELSE 22695477*h + 1 END)
         |          % ${graft.ext.TextOps.HashP}) % 512 AS bucket
         |       FROM hv CROSS JOIN (VALUES (0),(1),(2),(3)) t(i)),
         |cms AS (SELECT i, bucket, CAST(SUM(n) AS BIGINT) AS bsum
         |        FROM bk GROUP BY 1, 2),
         |top AS (SELECT w, n,
         |          CAST(row_number() OVER (ORDER BY n DESC, w) AS INT) AS rank
         |        FROM vocab ORDER BY n DESC, w LIMIT 10)
         |SELECT t.rank, t.w, t.n, MIN(c.bsum) AS est,
         |       MIN(c.bsum) - t.n AS over
         |FROM top t
         |JOIN bk ON bk.w = t.w
         |JOIN cms c ON c.i = bk.i AND c.bucket = bk.bucket
         |GROUP BY t.rank, t.w, t.n
         |ORDER BY t.rank""".stripMargin,
    // Power-of-two decay by calendar-year age (capped at 9) — integer
    // floor division on both engines; the anchor is the newest order.
    "q118_decayed_revenue" ->
      s"""WITH base AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |anch AS (SELECT MAX(d) AS dmax FROM base),
         |aged AS (
         |  SELECT o_custkey, d, px,
         |         LEAST(year(dmax) - year(d), 9) AS age
         |  FROM base CROSS JOIN anch)
         |SELECT o_custkey, CAST(COUNT(*) AS INT) AS n_orders,
         |       MAX(d) AS last_order,
         |       CAST(CAST(SUM(px) AS BIGINT) AS DOUBLE)/100.0 AS lifetime_rev,
         |       CAST(CAST(SUM(px // ([1,2,4,8,16,32,64,128,256,512][age + 1])) AS BIGINT)
         |            AS DOUBLE)/100.0 AS decayed_rev
         |FROM aged
         |GROUP BY o_custkey
         |ORDER BY decayed_rev DESC, o_custkey""".stripMargin,
    // Candidates are q34's band collisions verbatim; edit distance runs
    // on the printable-ASCII projection of the normalized text (DuckDB's
    // levenshtein counts bytes, Spark counts chars — ASCII makes them
    // agree); similarity is fixed-point floor division.
    "q119_fuzzy_pairs" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |tt AS (SELECT doc_id, regexp_replace(t, '[^ -~]', '', 'g') AS ta FROM n),
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |         CAST(levenshtein(x.ta, y.ta) AS INT) AS dist,
         |         GREATEST(length(x.ta), length(y.ta)) AS maxlen
         |  FROM cand c
         |  JOIN tt x ON x.doc_id = c.doc_a
         |  JOIN tt y ON y.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, dist,
         |       CASE WHEN maxlen = 0 THEN 1.0
         |            ELSE CAST(((maxlen - dist) * 10000) // maxlen AS DOUBLE)/10000.0
         |       END AS similarity
         |FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q26's session assignment verbatim (strict > gap on micros), then
    // per-session paths via ordered string_agg — the same (micros,
    // event_id) order as Spark's struct sort.
    "q120_session_paths" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_id,
        |         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |  FROM sess GROUP BY user_id, session_id),
        |pc AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
        |SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT) AS rank,
        |       path, n_sessions
        |FROM pc
        |ORDER BY n_sessions DESC, path
        |LIMIT 10""".stripMargin,
    // TPC-H Q5 shape: same-nation customer/supplier revenue by region ×
    // nation; exact integer cents.
    "q121_local_supplier_volume" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_items,
         |       CAST(SUM(${cents("l_extendedprice")}) AS DOUBLE)/100.0 AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY r_name, revenue DESC, n_name""".stripMargin,
    // TPC-H Q21 correlation shape over per-(order, supplier) lateness
    // flags: late supplier, some co-supplier, no late co-supplier.
    "q122_sole_blame" ->
      """WITH pairs AS (
        |  SELECT l_orderkey AS okey, l_suppkey AS skey,
        |         MAX(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                                 CAST(l_shipdate AS DATE)) > 60
        |                  THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |blame AS (
        |  SELECT l.okey, l.skey,
        |         COUNT(*) AS n_others,
        |         CAST(SUM(o.late) AS BIGINT) AS n_other_late
        |  FROM pairs l
        |  JOIN pairs o ON o.okey = l.okey AND o.skey <> l.skey
        |  WHERE l.late = 1
        |  GROUP BY l.okey, l.skey)
        |SELECT skey AS l_suppkey, COUNT(*) AS n_sole_blame_orders
        |FROM blame
        |WHERE n_other_late = 0
        |GROUP BY skey
        |ORDER BY n_sole_blame_orders DESC, l_suppkey""".stripMargin,
    // Explicit set list (both marginals + grand total, no 2-D cell);
    // GROUPING_ID bit semantics match Spark's grouping_id().
    "q123_grouping_sets" ->
      s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
         |       COALESCE(o_orderpriority, 'ALL') AS priority,
         |       CAST(GROUPING_ID(c_mktsegment, o_orderpriority) AS INT) AS gid,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
         |ORDER BY gid, segment, priority""".stripMargin,
    // Incremental exact dedup: the oracle recomputes the merged
    // assignment from scratch (state = even ids, batch = odd), so the
    // engine's differential state-probe path must equal a full re-run.
    // Text equality stands in for the engine's xxhash64 group key (the
    // q32 contract).
    "q124_dedup_exact_incr" ->
      s"""WITH $nCte,
         |st AS (SELECT t, MIN(doc_id) AS rep_id FROM n
         |       WHERE doc_id % 2 = 0 GROUP BY t),
         |b AS (SELECT doc_id, t FROM n WHERE doc_id % 2 = 1),
         |newg AS (SELECT t, MIN(doc_id) AS rep_id FROM b
         |         WHERE NOT EXISTS (SELECT 1 FROM st WHERE st.t = b.t)
         |         GROUP BY t)
         |SELECT b.doc_id,
         |       COALESCE(st.rep_id, ng.rep_id) AS rep_id,
         |       CASE WHEN st.rep_id IS NULL AND b.doc_id = ng.rep_id
         |            THEN 1 ELSE 0 END AS is_new_group
         |FROM b LEFT JOIN st ON b.t = st.t
         |       LEFT JOIN newg ng ON b.t = ng.t
         |ORDER BY b.doc_id""".stripMargin,
    // Incremental MinHash+LSH: the engine signs only the odd-id batch
    // and probes the persisted even-id band/shingle state; the oracle is
    // the FULL-corpus q34 pair run restricted to pairs touching the
    // batch — differential semantics checked against a from-scratch run.
    "q125_dedup_minhash_incr" ->
      s"""WITH $nCte,
         |$minhashCtes
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |  AND (doc_a % 2 = 1 OR doc_b % 2 = 1)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // GIF pixel stats: the oracle replays the payload-generation
    // arithmetic — pixels are text bytes & 0x7f cycled globally across
    // vf frames of vw×vh — as cycle-count × whole-text sum plus a
    // prefix remainder, so the engine's REAL container walk + LZW
    // decode must reproduce the exact integers. (documents text is
    // ASCII, the standing q39 contract, so ord() IS the byte.)
    "q126_gif_pixel_stats" ->
      """WITH v AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 32 AS INT) AS vw,
        |                  CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
        |                  CAST(1 + doc_id % 10 AS INT) AS vf,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 2),
        |g AS (SELECT doc_id, text, len, vf,
        |             CAST(vf AS BIGINT)*vw*vh AS npx FROM v),
        |b AS (SELECT doc_id, gi,
        |             ord(substr(text, CAST(gi + 1 AS INT), 1)) % 128 AS bv
        |      FROM (SELECT doc_id, text, unnest(range(len)) AS gi FROM g) z),
        |agg AS (SELECT doc_id, SUM(bv) AS s_all FROM b GROUP BY doc_id),
        |pre AS (SELECT b.doc_id, SUM(bv) AS s_pre
        |        FROM b JOIN g ON b.doc_id = g.doc_id
        |        WHERE b.gi < g.npx % g.len GROUP BY b.doc_id),
        |mx AS (SELECT b.doc_id, MAX(bv) AS m
        |       FROM b JOIN g ON b.doc_id = g.doc_id
        |       WHERE b.gi < LEAST(g.npx, CAST(g.len AS BIGINT))
        |       GROUP BY b.doc_id)
        |SELECT g.doc_id, vf AS n_frames, npx AS n_pixels,
        |       CAST(CASE WHEN len = 0 THEN 0
        |            ELSE (npx // len) * a.s_all + COALESCE(p.s_pre, 0)
        |            END AS BIGINT) AS sum_px,
        |       CAST(COALESCE(m.m, 0) AS INT) AS max_px,
        |       ROUND(CAST(CASE WHEN len = 0 THEN 0
        |            ELSE (npx // len) * a.s_all + COALESCE(p.s_pre, 0)
        |            END AS DOUBLE) / npx, 4) AS mean_px
        |FROM g LEFT JOIN agg a ON g.doc_id = a.doc_id
        |       LEFT JOIN pre p ON g.doc_id = p.doc_id
        |       LEFT JOIN mx m ON g.doc_id = m.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    // WAV audio stats: the oracle replays the payload-generation
    // arithmetic — 8-bit PCM samples are the text bytes zero-padded to
    // channel alignment, deinterleaved by `gi % ch` — so the engine's
    // REAL RIFF parse + deinterleave + integer aggregation must
    // reproduce the exact sums. Crossings compare the exact integer
    // deviation `amp·n − Σamp` (mean-crossing without any division).
    "q127_wav_audio_stats" ->
      """WITH a AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT doc_id, ch, len, text,
        |             len + CASE WHEN len % ch = 0 THEN 0 ELSE 1 END AS dlen
        |      FROM a),
        |s AS (SELECT doc_id, CAST(gi % ch AS INT) AS channel, gi,
        |             (CASE WHEN gi < len
        |                   THEN ord(substr(text, CAST(gi + 1 AS INT), 1))
        |                   ELSE 0 END) - 128 AS amp
        |      FROM (SELECT doc_id, ch, len, text,
        |                   unnest(range(dlen)) AS gi FROM d) z),
        |g AS (SELECT doc_id, channel, COUNT(*) AS n,
        |             SUM(amp) AS sum_amp, SUM(amp*amp) AS sum_sq,
        |             MAX(ABS(amp)) AS peak
        |      FROM s GROUP BY doc_id, channel),
        |x AS (SELECT s.doc_id, s.channel,
        |             s.amp * g.n - g.sum_amp AS dev,
        |             LEAD(s.amp * g.n - g.sum_amp)
        |               OVER (PARTITION BY s.doc_id, s.channel
        |                     ORDER BY s.gi) AS ndev
        |      FROM s JOIN g ON s.doc_id = g.doc_id AND s.channel = g.channel),
        |c AS (SELECT doc_id, channel,
        |             SUM(CASE WHEN (dev > 0 AND ndev < 0)
        |                        OR (dev < 0 AND ndev > 0)
        |                      THEN 1 ELSE 0 END) AS n_crossings
        |      FROM x GROUP BY doc_id, channel)
        |SELECT g.doc_id, g.channel,
        |       CAST(g.n AS BIGINT) AS n_samples,
        |       CAST(g.sum_amp AS BIGINT) AS sum_amp,
        |       CAST(g.sum_sq AS BIGINT) AS sum_sq,
        |       CAST(g.peak AS INT) AS peak,
        |       CAST(COALESCE(c.n_crossings, 0) AS BIGINT) AS n_crossings,
        |       ROUND(CAST(g.sum_amp AS DOUBLE) / g.n, 4) AS mean_amp,
        |       ROUND(SQRT(CAST(g.sum_sq AS DOUBLE) / g.n), 4) AS rms
        |FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.channel = c.channel
        |ORDER BY g.doc_id, g.channel""".stripMargin,
    // WAV autocorrelation: R(L) = Σ amp_i·amp_{i+L} within each channel
    // (LEAD skips nulls past the end, COALESCE handles n ≤ L), exact
    // integers normalized by R(0) only at the final rounded ratio.
    "q128_wav_autocorr" ->
      """WITH a AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT doc_id, ch, len, text,
        |             len + CASE WHEN len % ch = 0 THEN 0 ELSE 1 END AS dlen
        |      FROM a),
        |s AS (SELECT doc_id, CAST(gi % ch AS INT) AS channel, gi,
        |             (CASE WHEN gi < len
        |                   THEN ord(substr(text, CAST(gi + 1 AS INT), 1))
        |                   ELSE 0 END) - 128 AS amp
        |      FROM (SELECT doc_id, ch, len, text,
        |                   unnest(range(dlen)) AS gi FROM d) z),
        |w AS (SELECT doc_id, channel, amp,
        |             LEAD(amp, 1) OVER win AS a1,
        |             LEAD(amp, 2) OVER win AS a2,
        |             LEAD(amp, 4) OVER win AS a4,
        |             LEAD(amp, 8) OVER win AS a8
        |      FROM s WINDOW win AS (PARTITION BY doc_id, channel
        |                            ORDER BY gi))
        |SELECT doc_id, channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(SUM(amp*amp) AS BIGINT) AS r0,
        |       ROUND(CAST(COALESCE(SUM(amp*a1), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac1,
        |       ROUND(CAST(COALESCE(SUM(amp*a2), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac2,
        |       ROUND(CAST(COALESCE(SUM(amp*a4), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac4,
        |       ROUND(CAST(COALESCE(SUM(amp*a8), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac8
        |FROM w GROUP BY doc_id, channel
        |ORDER BY doc_id, channel""".stripMargin,
    // Hard negatives: q37's exact ranking with the label inequality on
    // the JOIN (per-query predicate, not a corpus pre-filter).
    "q129_hard_negatives" ->
      s"""WITH $embCte,
         |q AS (SELECT * FROM nm WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              c.label AS n_label,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM nm c CROSS JOIN q
         |       WHERE c.vec_id <> q.vec_id AND c.label <> q.label),
         |rk AS (SELECT query_id, neighbor_id, n_label, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, n_label, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "q130_hard_negatives_lsh" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, label, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |q AS (SELECT * FROM bk WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              c.label AS n_label,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM bk c JOIN q ON c.bucket = q.bucket
         |        AND c.vec_id <> q.vec_id AND c.label <> q.label),
         |rk AS (SELECT query_id, neighbor_id, n_label, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, n_label, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Feature-hashing vectorizer: token hash -> bucket h%32, sign from
    // an independent LCG of the same hash; integer bucket sums
    // normalized only at the final rounded ratio.
    "q131_hashing_vectorize" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |nrm AS (SELECT doc_id, SQRT(CAST(SUM(raw*raw) AS DOUBLE)) AS nr
         |        FROM rawb GROUP BY doc_id)
         |SELECT r.doc_id, r.bucket, r.raw, ROUND(r.raw / n.nr, 4) AS weight
         |FROM rawb r JOIN nrm n ON r.doc_id = n.doc_id
         |ORDER BY r.doc_id, r.bucket""".stripMargin,
    // TPC-H Q17 correlation: qty below 20% of the part's own average,
    // exact integer form 5*qty*cnt < sum_qty over cents.
    "q132_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, ${cents("l_quantity")} AS qc,
         |         ${cents("l_extendedprice")} AS c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#12'),
         |pp AS (SELECT l_partkey, CAST(SUM(qc) AS BIGINT) AS sum_qc,
         |              COUNT(*) AS cnt
         |       FROM li GROUP BY l_partkey)
         |SELECT COUNT(*) AS n_small_qty_items,
         |       CAST(SUM(li.c) AS DOUBLE)/100.0 AS revenue
         |FROM li JOIN pp ON li.l_partkey = pp.l_partkey
         |WHERE li.qc * pp.cnt * 5 < pp.sum_qc""".stripMargin,
    // TPC-H Q18 HAVING shape: orders over 300 total qty, customer join
    // after the group-filter.
    "q133_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS qty_cents
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(${cents("l_quantity")}) > 30000)
         |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |       o_totalprice, CAST(qty_cents AS DOUBLE)/100.0 AS total_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 100""".stripMargin,
    // TPC-H Q22 shape: above-average positive balance, no order since the
    // cutoff; bal*n > sum is the exact integer form of bal > avg.
    "q134_idle_rich_customers" ->
      s"""WITH cu AS (SELECT c_custkey, c_nationkey, ${cents("c_acctbal")} AS bc
         |            FROM customer),
         |pa AS (SELECT CAST(SUM(bc) AS BIGINT) AS sum_pos, COUNT(*) AS n_pos
         |       FROM cu WHERE bc > 0)
         |SELECT c_nationkey, COUNT(*) AS n_customers,
         |       CAST(SUM(bc) AS DOUBLE)/100.0 AS total_acctbal
         |FROM cu CROSS JOIN pa
         |WHERE bc * n_pos > sum_pos
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin,
    // TPC-H Q2 min-subquery shape: per part the cheapest supplier, ties
    // to the lowest suppkey (row_number mirrors the struct-min argmin).
    "q135_min_cost_supplier" ->
      s"""WITH cost AS (
         |  SELECT l_partkey, l_suppkey, CAST(MIN(${cents("l_extendedprice")}) AS BIGINT) AS mc
         |  FROM lineitem GROUP BY l_partkey, l_suppkey),
         |best AS (
         |  SELECT l_partkey, l_suppkey, mc,
         |         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY mc, l_suppkey) AS rn
         |  FROM cost)
         |SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name, n_name,
         |       CAST(mc AS DOUBLE)/100.0 AS best_price
         |FROM best JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE rn = 1
         |ORDER BY best_price DESC, p_partkey
         |LIMIT 50""".stripMargin,
    // TPC-H Q14 CASE-share shape: monthly PROMO revenue share in exact
    // integer basis points (floor division on both engines).
    "q136_promo_share" ->
      s"""WITH li AS (
         |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         |         ${cents("l_extendedprice")} AS c,
         |         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |m AS (SELECT month,
         |             CAST(SUM(CASE WHEN is_promo = 1 THEN c ELSE 0 END) AS BIGINT) AS pc,
         |             CAST(SUM(c) AS BIGINT) AS tc
         |      FROM li GROUP BY month)
         |SELECT month, CAST(pc AS DOUBLE)/100.0 AS promo_revenue,
         |       CAST(tc AS DOUBLE)/100.0 AS total_revenue,
         |       CAST((pc * 10000) // tc AS INT) AS promo_share_bp
         |FROM m ORDER BY month""".stripMargin,
    // TPC-H Q15 view-max shape: suppliers achieving the quarter's maximum
    // revenue (ties survive).
    "q137_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS rc
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(rc AS DOUBLE)/100.0 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rc = (SELECT MAX(rc) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    // Temperature-scaled mixture: ⌊1e6·√n⌋ weights (IEEE sqrt is
    // correctly rounded — engine-identical), exact HUGEINT floor
    // division for the ppm rates, independent affine hash gate.
    "q138_temperature_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
         |w AS (SELECT source, n_total,
         |             CAST(floor(1000000*sqrt(n_total)) AS BIGINT) AS weight
         |      FROM c),
         |t AS (SELECT SUM(n_total) AS corpus_n, SUM(weight) AS sum_w FROM w),
         |r AS (SELECT source, n_total, weight,
         |             LEAST(1000000, CAST((CAST(1000000 AS HUGEINT) * (corpus_n*40//100) * weight)
         |               // (CAST(sum_w AS HUGEINT) * n_total) AS BIGINT)) AS rate_ppm
         |      FROM w CROSS JOIN t),
         |k AS (SELECT d.source, COUNT(*) AS n_kept
         |      FROM documents d JOIN r ON d.source = r.source
         |      WHERE (((d.doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |             % ${graft.ext.TextOps.HashP}) % 1000000 < r.rate_ppm
         |      GROUP BY d.source)
         |SELECT r.source, r.n_total, r.weight, r.rate_ppm,
         |       COALESCE(k.n_kept, 0) AS n_kept
         |FROM r LEFT JOIN k ON r.source = k.source
         |ORDER BY r.source""".stripMargin,
    // Exact two-sample KS over token counts, even vs odd doc ids:
    // D's numerator |cum_a·N_b − cum_b·N_a| in HUGEINT, argmax at the
    // smallest attaining value.
    "q139_token_ks_drift" ->
      s"""WITH $nCte,
         |c AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS v FROM n),
         |a AS (SELECT v, COUNT(*) AS ca FROM c WHERE doc_id % 2 = 0 GROUP BY v),
         |b AS (SELECT v, COUNT(*) AS cb FROM c WHERE doc_id % 2 = 1 GROUP BY v),
         |s AS (SELECT COALESCE(a.v, b.v) AS v, COALESCE(ca, 0) AS ca,
         |             COALESCE(cb, 0) AS cb
         |      FROM a FULL OUTER JOIN b ON a.v = b.v),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |             CAST(SUM(cb) AS BIGINT) AS n_b FROM s),
         |p AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
         |             SUM(cb) OVER (ORDER BY v) AS cum_b FROM s),
         |d AS (SELECT v, abs(CAST(cum_a AS HUGEINT)*n_b - CAST(cum_b AS HUGEINT)*n_a) AS dnum,
         |             n_a, n_b
         |      FROM p CROSS JOIN t)
         |SELECT v AS at_value,
         |       CAST(dnum*1000000 // (CAST(n_a AS HUGEINT)*n_b) AS BIGINT) AS ks_ppm,
         |       n_a, n_b
         |FROM d ORDER BY dnum DESC, v LIMIT 1""".stripMargin,
    // 2-iteration integer PageRank over the undirected customer–supplier
    // graph; per-edge floor division exactly as the Spark operator.
    "q140_copurchase_pagerank" ->
      s"""WITH ed AS (SELECT DISTINCT l_suppkey*2 AS sn, o_custkey*2+1 AS cn
         |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |ud AS (SELECT sn AS u, cn AS v FROM ed UNION ALL SELECT cn, sn FROM ed),
         |deg AS (SELECT u, COUNT(*) AS deg FROM ud GROUP BY u),
         |r1 AS (SELECT ud.v AS u,
         |              150000000000 + SUM((CAST(1000000000000 AS BIGINT)*85) // (100*deg.deg)) AS r
         |       FROM ud JOIN deg ON ud.u = deg.u GROUP BY ud.v),
         |r2 AS (SELECT ud.v AS u, 150000000000 + SUM((r1.r*85) // (100*deg.deg)) AS r
         |       FROM ud JOIN r1 ON ud.u = r1.u JOIN deg ON ud.u = deg.u
         |       GROUP BY ud.v)
         |SELECT CASE WHEN d.u % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
         |       d.u // 2 AS node_key, CAST(d.deg AS BIGINT) AS degree,
         |       CAST(r2.r AS BIGINT) AS rank_units
         |FROM deg d JOIN r2 ON d.u = r2.u
         |ORDER BY rank_units DESC, node_type, node_key
         |LIMIT 25""".stripMargin,
    // Per-language 2048-token packing: independent bin sequences per
    // lang (the partitioned window IS the oracle semantics; the engine
    // recovers it from one global prefix sum).
    "q141_grouped_packing" ->
      s"""WITH nl AS (SELECT doc_id, lang,
         |                   lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |            FROM documents),
         |c AS (SELECT doc_id, lang,
         |             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |      FROM nl),
         |p AS (SELECT lang, doc_id, n_tokens,
         |             COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |      FROM c)
         |SELECT lang, CAST(pre // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         |FROM p GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin,
    // Degree-oriented triangle census: orientation by (deg, id) row
    // comparison, wedges at the minimum node, EXISTS closing probe —
    // the oracle states the same oriented algorithm (each triangle
    // generated exactly once), with DuckDB row-value comparisons.
    "q142_triangle_census" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p),
        |deg AS (SELECT node, COUNT(*) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
        |        GROUP BY node),
        |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
        |      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
        |cand AS (SELECT o1.t AS u, o2.t AS v
        |         FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
        |tri AS (SELECT COUNT(*) AS n_triangles FROM cand
        |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = cand.u AND e.v = cand.v)),
        |ds AS (SELECT COUNT(*) AS n_nodes,
        |              CAST(SUM((deg*(deg-1))//2) AS BIGINT) AS n_wedges FROM deg),
        |es AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |       CASE WHEN n_wedges = 0 THEN 0
        |            ELSE (3*n_triangles*1000000)//n_wedges END AS clustering_ppm
        |FROM ds CROSS JOIN es CROSS JOIN tri""".stripMargin,
    // End-to-end multimodal retrieval (exact tier): rebuild the decoded
    // pixel histogram from the payload-generation arithmetic (q126's
    // cyclic-fill model: pixels = text bytes mod 128 cycled over
    // npx = frames*w*h), exact integer-ppm features, integer dot-product
    // brute top-k.
    "q177_mm_retrieval" ->
      s"""WITH $mmFeatureCtes,
         |q AS (SELECT doc_id AS query_id, fv AS qf FROM f WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id,
         |              CAST($mmDotExpr AS BIGINT) AS score
         |       FROM f c CROSS JOIN q WHERE c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Celled tier: same features, candidates restricted to the query's
    // dominant-bucket cell (first argmax — a deterministic integer).
    "q178_mm_retrieval_cells" ->
      s"""WITH $mmFeatureCtes,
         |fc AS (SELECT doc_id, fv,
         |              CAST(list_position(fv, list_max(fv)) AS INT) AS cell
         |       FROM f),
         |q AS (SELECT doc_id AS query_id, fv AS qf, cell
         |      FROM fc WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id, c.cell,
         |              CAST($mmDotExpr AS BIGINT) AS score
         |       FROM fc c JOIN q ON c.cell = q.cell AND c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, cell, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, cell, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Learned-embedding stand-in tier: project the same decoded ppm
    // histogram through the frozen integer weight matrix
    // W(k,j) = ((37k+11j+5) mod 17) - 8, then brute top-k by exact
    // integer dot product in the 4-dim embedded space.
    "q179_mm_embed_topk" ->
      s"""WITH $mmFeatureCtes,
         |emb AS (SELECT doc_id, ${mmEmbCol(0)} AS e0, ${mmEmbCol(1)} AS e1,
         |               ${mmEmbCol(2)} AS e2, ${mmEmbCol(3)} AS e3 FROM f),
         |q AS (SELECT doc_id AS query_id, e0 AS q0, e1 AS q1, e2 AS q2,
         |             e3 AS q3 FROM emb WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id,
         |              CAST(q.q0*c.e0 + q.q1*c.e1 + q.q2*c.e2 + q.q3*c.e3
         |                   AS BIGINT) AS score
         |       FROM emb c CROSS JOIN q WHERE c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Doulion edge-sampled triangle census: the same oriented-wedge
    // algorithm on the hash-gated edge subset, estimate scaled by 1/p^3
    // in exact integer floor division.
    "q175_triangle_sampled" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p),
         |tot AS (SELECT COUNT(*) AS n_edges_total FROM e0),
         |e AS (SELECT u, v FROM e0
         |      WHERE ((((u*1000003 + v) % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |             % ${graft.ext.TextOps.HashP}) % 1000000 < 250000),
         |deg AS (SELECT node, COUNT(*) AS deg FROM (
         |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
         |        GROUP BY node),
         |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
         |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
         |      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
         |cand AS (SELECT o1.t AS u, o2.t AS v
         |         FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
         |tri AS (SELECT COUNT(*) AS n_triangles FROM cand
         |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = cand.u AND e.v = cand.v)),
         |es AS (SELECT COUNT(*) AS n_edges_sampled FROM e)
         |SELECT n_edges_total, n_edges_sampled, CAST(250000 AS BIGINT) AS p_ppm,
         |       n_triangles AS n_triangles_sampled,
         |       CAST(CAST(n_triangles AS HUGEINT) * 1000000000000000000
         |            // ${java.math.BigInteger.valueOf(250000L).pow(3)} AS BIGINT) AS est_triangles
         |FROM tot CROSS JOIN es CROSS JOIN tri""".stripMargin,
    // Gaps-and-islands interval union: running max of prior ends cuts
    // islands; all arithmetic in exact epoch days.
    "q143_ship_coverage" ->
      """WITH iv AS (SELECT DISTINCT l_suppkey,
        |              CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day_start
        |            FROM lineitem),
        |iv2 AS (SELECT l_suppkey, day_start, day_start + 7 AS day_end FROM iv),
        |m AS (SELECT l_suppkey, day_start, day_end,
        |             CASE WHEN max(day_end) OVER wp IS NULL
        |                    OR day_start > max(day_end) OVER wp
        |                  THEN 1 ELSE 0 END AS cut
        |      FROM iv2
        |      WINDOW wp AS (PARTITION BY l_suppkey ORDER BY day_start, day_end
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |i AS (SELECT *, SUM(cut) OVER (PARTITION BY l_suppkey
        |         ORDER BY day_start, day_end
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM m),
        |isl AS (SELECT l_suppkey, island, MIN(day_start) AS s, MAX(day_end) AS e,
        |               COUNT(*) AS n
        |        FROM i GROUP BY l_suppkey, island)
        |SELECT l_suppkey, CAST(SUM(n) AS BIGINT) AS n_intervals,
        |       COUNT(*) AS n_islands,
        |       CAST(SUM(e - s) AS BIGINT) AS covered_days,
        |       CAST(MAX(e) - MIN(s) AS BIGINT) AS span_days
        |FROM isl GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    // Systematic PPS sampling: exclusive prefix over doc_id order, k=100
    // pointers, multiplicity = difference of exact integer ceils.
    "q144_systematic_sample" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |                  GREATEST(CAST(n_chars AS BIGINT), 1) AS w FROM documents),
        |p AS (SELECT *,
        |             COALESCE(SUM(w) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |             SUM(w) OVER () AS total
        |      FROM d),
        |m AS (SELECT doc_id, source, n_chars,
        |             CAST(((CAST(pre + w AS HUGEINT) * 100 + total - 1) // total)
        |                - ((CAST(pre AS HUGEINT) * 100 + total - 1) // total)
        |               AS BIGINT) AS multiplicity
        |      FROM p)
        |SELECT * FROM m WHERE multiplicity > 0
        |ORDER BY doc_id""".stripMargin,
    // Chi-square contingency over the FULL zero-filled grid; one floor
    // division of exact integers per cell (HUGEINT ≡ Spark decimal(38)).
    "q145_event_chi_square" ->
      """WITH cells AS (SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS obs
        |               FROM events GROUP BY event_type, cohort),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_n FROM cells GROUP BY event_type),
        |c AS (SELECT cohort, CAST(SUM(obs) AS BIGINT) AS col_n FROM cells GROUP BY cohort),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
        |g AS (SELECT r.event_type, c.cohort, r.row_n, c.col_n, t.n
        |      FROM r CROSS JOIN c CROSS JOIN t),
        |j AS (SELECT g.event_type, g.cohort, g.row_n, g.col_n, g.n,
        |             COALESCE(cells.obs, 0) AS obs
        |      FROM g LEFT JOIN cells ON g.event_type = cells.event_type
        |                            AND g.cohort = cells.cohort)
        |SELECT event_type, cohort, obs,
        |       CAST(CAST(row_n AS HUGEINT) * col_n * 1000 // n AS BIGINT) AS expected_milli,
        |       CAST((CAST(obs AS HUGEINT)*n - CAST(row_n AS HUGEINT)*col_n)
        |            * (CAST(obs AS HUGEINT)*n - CAST(row_n AS HUGEINT)*col_n)
        |            * 1000000 // (CAST(n AS HUGEINT) * row_n * col_n)
        |           AS BIGINT) AS contrib_ppm
        |FROM j ORDER BY event_type, cohort""".stripMargin,
    // Skyline stated as the textbook NOT-EXISTS domination predicate —
    // deliberately a DIFFERENT formulation from the engine's staircase
    // window, so the oracle checks the algorithm, not the plan.
    "q146_brand_skyline" ->
      """WITH pts AS (SELECT p_brand,
        |               CAST(ROUND(p_retailprice*100,0) AS BIGINT) AS pc,
        |               p_size, COUNT(*) AS n_parts
        |             FROM part GROUP BY p_brand, pc, p_size)
        |SELECT p_brand, CAST(pc AS DOUBLE)/100.0 AS price, p_size, n_parts
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts o
        |  WHERE o.p_brand = p.p_brand AND o.pc <= p.pc AND o.p_size >= p.p_size
        |    AND (o.pc < p.pc OR o.p_size > p.p_size))
        |ORDER BY p_brand, price""".stripMargin,
    // Seasonal-naive backtest: lag over (nation, iso weekday) = Spark's
    // weekday() partition; exact integer cents, truncating division on
    // both engines (DuckDB // truncates toward zero like Spark div).
    "q147_seasonal_forecast" ->
      s"""WITH dim AS (SELECT s_suppkey, n_name
         |            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |daily AS (SELECT n_name, CAST(l_shipdate AS DATE) AS d,
         |                 CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |          FROM lineitem JOIN dim ON l_suppkey = s_suppkey
         |          GROUP BY n_name, d),
         |f AS (SELECT n_name, c,
         |             LAG(c, 1) OVER (PARTITION BY n_name, isodow(d) ORDER BY d) AS forecast
         |      FROM daily)
         |SELECT n_name, COUNT(*) AS n_forecasts,
         |       CAST(SUM(ABS(c - forecast)) // COUNT(*) AS BIGINT) AS mae_cents,
         |       CAST(SUM(c - forecast) // COUNT(*) AS BIGINT) AS bias_cents
         |FROM f WHERE forecast IS NOT NULL
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // Closed-form 2-feature OLS from exact integer moments; one floor
    // per milli coefficient, R² from the same moments (HUGEINT mirror
    // of the engine's decimal(38) arithmetic).
    "q148_supplier_ols" ->
      s"""WITH li AS (SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS x1,
         |                  CAST(ROUND(l_discount*10000,0) AS BIGINT) AS x2,
         |                  ${cents("l_extendedprice")} AS y
         |           FROM lineitem),
         |g AS (SELECT l_suppkey, COUNT(*) AS n,
         |             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |             CAST(SUM(y) AS BIGINT) AS sy,
         |             CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |             CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |             CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |             CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |             CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |             SUM(CAST(y AS HUGEINT)*y) AS syy
         |      FROM li GROUP BY l_suppkey),
         |m AS (SELECT l_suppkey, n,
         |             CAST(n AS HUGEINT)*s11 - CAST(s1 AS HUGEINT)*s1 AS ca,
         |             CAST(n AS HUGEINT)*s12 - CAST(s1 AS HUGEINT)*s2 AS cb,
         |             CAST(n AS HUGEINT)*s22 - CAST(s2 AS HUGEINT)*s2 AS cc,
         |             CAST(n AS HUGEINT)*s1y - CAST(s1 AS HUGEINT)*sy AS cd,
         |             CAST(n AS HUGEINT)*s2y - CAST(s2 AS HUGEINT)*sy AS ce,
         |             CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS sst
         |      FROM g),
         |s AS (SELECT l_suppkey, n, cd, ce, sst,
         |             (cc*cd - cb*ce) * 1000 // (ca*cc - cb*cb) AS b1,
         |             (ca*ce - cb*cd) * 1000 // (ca*cc - cb*cb) AS b2
         |      FROM m WHERE ca*cc - cb*cb > 0 AND sst > 0)
         |SELECT l_suppkey, CAST(n AS INT) AS n_lines,
         |       CAST(b1 AS BIGINT) AS qty_slope_milli,
         |       CAST(b2 AS BIGINT) AS discount_slope_milli,
         |       CAST((cd*b1 + ce*b2) * 1000 // sst AS BIGINT) AS r2_ppm
         |FROM s ORDER BY l_suppkey""".stripMargin,
    // Next-event Gini impurity over the q102 transition counts; exact
    // floored ppm.
    "q149_transition_gini" ->
      """WITH pr AS (SELECT user_id, event_type,
        |              LAG(event_type) OVER (PARTITION BY user_id
        |                ORDER BY epoch_us(ts), event_id) AS from_type
        |            FROM events),
        |c AS (SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |      FROM pr WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
        |g AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out,
        |             CAST(COUNT(*) AS INT) AS n_next_types,
        |             CAST(SUM(n*n) AS BIGINT) AS sq
        |      FROM c GROUP BY from_type)
        |SELECT from_type, n_out, n_next_types,
        |       CAST((CAST(n_out AS HUGEINT)*n_out - sq) * 1000000
        |            // (CAST(n_out AS HUGEINT)*n_out) AS BIGINT) AS gini_ppm
        |FROM g ORDER BY from_type""".stripMargin,
    // Session trigrams: q120's session assignment verbatim, two leads
    // inside the (user, session) window, top-15 with contractual rank.
    "q150_session_trigrams" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |tg AS (
        |  SELECT event_type || '>' || LEAD(event_type, 1) OVER ws
        |           || '>' || LEAD(event_type, 2) OVER ws AS trigram,
        |         LEAD(event_type, 2) OVER ws AS t3
        |  FROM sess
        |  WINDOW ws AS (PARTITION BY user_id, session_id
        |                ORDER BY epoch_us(ts), event_id)),
        |c AS (SELECT trigram, COUNT(*) AS n_occurrences FROM tg
        |      WHERE t3 IS NOT NULL GROUP BY trigram),
        |k AS (SELECT * FROM c ORDER BY n_occurrences DESC, trigram LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, trigram) AS INT) AS rank,
        |       trigram, n_occurrences
        |FROM k ORDER BY n_occurrences DESC, trigram""".stripMargin,
    // TPC-H Q7 shape: both directions of the nation pair; exact cents.
    "q151_volume_shipping" ->
      s"""WITH nat AS (SELECT n_nationkey, n_name FROM nation
         |             WHERE n_name IN ('NATION_3', 'NATION_7')),
         |s AS (SELECT s_suppkey, n_name AS supp_nation
         |      FROM supplier JOIN nat ON s_nationkey = n_nationkey),
         |c AS (SELECT c_custkey, n_name AS cust_nation
         |      FROM customer JOIN nat ON c_nationkey = n_nationkey)
         |SELECT supp_nation, cust_nation,
         |       CAST(year(l_shipdate) AS INT) AS ship_year,
         |       COUNT(*) AS n_items, ${moneySum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN s ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN c ON o_custkey = c_custkey
         |WHERE supp_nation <> cust_nation
         |GROUP BY supp_nation, cust_nation, ship_year
         |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    // TPC-H Q8 shape: one nation's share of a region market per year,
    // exact integer basis points.
    "q152_market_share" ->
      s"""WITH mkt AS (SELECT n_nationkey FROM nation
         |             JOIN region ON n_regionkey = r_regionkey
         |             WHERE r_name = 'EUROPE'),
         |s AS (SELECT s_suppkey,
         |             CASE WHEN n_name = 'NATION_8' THEN 1 ELSE 0 END AS is_target
         |      FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |li AS (SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
         |              ${cents("l_extendedprice")} AS c, s.is_target
         |       FROM lineitem JOIN s ON l_suppkey = s.s_suppkey
         |       JOIN orders ON l_orderkey = o_orderkey
         |       WHERE o_custkey IN (SELECT c_custkey FROM customer
         |                           WHERE c_nationkey IN (SELECT n_nationkey FROM mkt))),
         |g AS (SELECT ship_year,
         |             CAST(SUM(CASE WHEN is_target = 1 THEN c ELSE 0 END) AS BIGINT) AS tc,
         |             CAST(SUM(c) AS BIGINT) AS mc
         |      FROM li GROUP BY ship_year)
         |SELECT ship_year, CAST(tc AS DOUBLE)/100.0 AS target_revenue,
         |       CAST(mc AS DOUBLE)/100.0 AS market_revenue,
         |       CAST((tc * 10000) // mc AS INT) AS share_bp
         |FROM g ORDER BY ship_year""".stripMargin,
    // TPC-H Q16 shape: distinct suppliers per (brand, size), NOT IN a
    // disqualified set.
    "q153_supplier_diversity" ->
      """WITH bad AS (SELECT l_suppkey FROM lineitem
        |             GROUP BY l_suppkey
        |             HAVING COUNT(*) FILTER (WHERE l_returnflag = 'R'
        |                                       AND l_discount >= 0.09) * 20
        |                    > COUNT(*))
        |SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT l_suppkey FROM bad)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // TPC-H Q20 shape: one year dominates a (supplier, part) shipping
    // history; suppliers with >= 3 such parts.
    "q154_concentrated_ship" ->
      s"""WITH g AS (SELECT l_suppkey, l_partkey,
         |             CAST(SUM(CASE WHEN year(l_shipdate) = 1997
         |                           THEN ${cents("l_quantity")} ELSE 0 END) AS BIGINT) AS q_year,
         |             CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS q_total
         |           FROM lineitem GROUP BY l_suppkey, l_partkey),
         |f AS (SELECT l_suppkey, COUNT(*) AS n_concentrated_parts
         |      FROM g WHERE q_year * 2 > q_total
         |      GROUP BY l_suppkey HAVING COUNT(*) >= 3)
         |SELECT s_suppkey, s_name, n_name, n_concentrated_parts
         |FROM f JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY n_concentrated_parts DESC, s_suppkey""".stripMargin,
    // TPC-H Q11 shape: parts whose corpus revenue share clears a
    // POPULATION-RELATIVE floor (1.4x the mean share 10^6/n ppm — a
    // fixed ppm floor goes vacuous as soon as the part count grows).
    "q155_important_parts" ->
      s"""WITH pp AS (SELECT l_partkey,
         |              CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |            FROM lineitem GROUP BY l_partkey),
         |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
         |             COUNT(*) AS n_parts FROM pp),
         |m AS (SELECT l_partkey, c,
         |             CAST(CAST(c AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm,
         |             greatest(1, 14000000 // (10 * n_parts)) AS thr
         |      FROM pp CROSS JOIN t)
         |SELECT l_partkey AS p_partkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       share_ppm
         |FROM m WHERE share_ppm >= thr
         |ORDER BY share_ppm DESC, p_partkey""".stripMargin,
    // One-pass equi-width histogram quantile sketch: 256 cells, rank
    // ⌊p·(n−1)⌋, deterministic within-cell interpolation — every number
    // an exact integer on both engines.
    "q156_value_sketch" ->
      s"""WITH v AS (SELECT ${cents("o_totalprice")} AS v FROM orders
         |           WHERE o_totalprice IS NOT NULL),
         |st AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n FROM v),
         |cells AS (SELECT ((v - vmin) * 256) // (vmax - vmin + 1) AS cell,
         |                 COUNT(*) AS cnt
         |          FROM v CROSS JOIN st GROUP BY cell),
         |cum AS (SELECT cell, cnt,
         |               COALESCE(SUM(cnt) OVER (ORDER BY cell
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
         |        FROM cells),
         |probs AS (SELECT CAST(unnest([250000, 500000, 900000, 990000]) AS BIGINT) AS prob_ppm),
         |j AS (SELECT prob_ppm, cell, cnt, cum_excl, vmin, vmax, n,
         |             (prob_ppm * (n - 1)) // 1000000 AS rk
         |      FROM cum CROSS JOIN st CROSS JOIN probs),
         |hit AS (SELECT * FROM j WHERE cum_excl <= rk AND rk < cum_excl + cnt),
         |o AS (SELECT prob_ppm,
         |             vmin + (cell * (vmax - vmin + 1)) // 256 AS cell_lo,
         |             vmin + ((cell + 1) * (vmax - vmin + 1)) // 256 - 1 AS cell_hi,
         |             cnt AS cell_count, n, rk, cum_excl
         |      FROM hit)
         |SELECT prob_ppm, cell_lo, cell_hi,
         |       CAST(cell_count AS BIGINT) AS cell_count, n,
         |       CAST(cell_lo + ((rk - cum_excl) * GREATEST(cell_hi - cell_lo, 0)) // cell_count
         |            AS BIGINT) AS estimate
         |FROM o ORDER BY prob_ppm""".stripMargin,
    // Grouped histogram sketch: shared global grid, per-group cumulative
    // counts, same exact integer interpolation.
    "q157_priority_sketch" ->
      s"""WITH v AS (SELECT o_orderpriority AS g, ${cents("o_totalprice")} AS v
         |           FROM orders WHERE o_totalprice IS NOT NULL),
         |st AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM v),
         |cells AS (SELECT g, ((v - vmin) * 256) // (vmax - vmin + 1) AS cell,
         |                 COUNT(*) AS cnt
         |          FROM v CROSS JOIN st GROUP BY g, cell),
         |cum AS (SELECT g, cell, cnt,
         |               COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY cell
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
         |               SUM(cnt) OVER (PARTITION BY g) AS n
         |        FROM cells),
         |probs AS (SELECT CAST(unnest([250000, 500000, 900000, 990000]) AS BIGINT) AS prob_ppm),
         |j AS (SELECT g, prob_ppm, cell, cnt, cum_excl, n, vmin, vmax,
         |             (prob_ppm * (n - 1)) // 1000000 AS rk
         |      FROM cum CROSS JOIN st CROSS JOIN probs),
         |hit AS (SELECT * FROM j WHERE cum_excl <= rk AND rk < cum_excl + cnt),
         |o AS (SELECT g, prob_ppm,
         |             vmin + (cell * (vmax - vmin + 1)) // 256 AS cell_lo,
         |             vmin + ((cell + 1) * (vmax - vmin + 1)) // 256 - 1 AS cell_hi,
         |             cnt AS cell_count, CAST(n AS BIGINT) AS n, rk, cum_excl
         |      FROM hit)
         |SELECT g AS o_orderpriority, prob_ppm, cell_lo, cell_hi,
         |       CAST(cell_count AS BIGINT) AS cell_count, n,
         |       CAST(cell_lo + ((rk - cum_excl) * GREATEST(cell_hi - cell_lo, 0)) // cell_count
         |            AS BIGINT) AS estimate
         |FROM o ORDER BY o_orderpriority, prob_ppm""".stripMargin,
    // Quantity-weighted lower median price per supplier: collapsed
    // (supplier, price) weights, cumulative window, smallest price whose
    // doubled cumulative weight reaches the total.
    "q158_weighted_median" ->
      s"""WITH pw AS (SELECT l_suppkey, ${cents("l_extendedprice")} AS price_c,
         |                   CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS w
         |            FROM lineitem GROUP BY l_suppkey, price_c),
         |c AS (SELECT l_suppkey, price_c, w,
         |             SUM(w) OVER (PARTITION BY l_suppkey ORDER BY price_c
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |             SUM(w) OVER (PARTITION BY l_suppkey) AS tot
         |      FROM pw)
         |SELECT l_suppkey, CAST(MAX(tot) AS BIGINT) AS total_weight,
         |       CAST(MIN(CASE WHEN cum * 2 >= tot THEN price_c END) AS DOUBLE)/100.0
         |         AS weighted_median_price
         |FROM c GROUP BY l_suppkey
         |ORDER BY l_suppkey""".stripMargin,
    // Modal order priority per segment. The engine carries the argmax
    // through partial aggregation as min(struct(-n, priority)); the
    // oracle deliberately states the rank-window form instead, so the
    // comparison checks the tie rule (smallest priority wins), not the
    // implementation.
    "q159_modal_priority" ->
      """WITH c AS (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |           GROUP BY c_mktsegment, o_orderpriority),
        |r AS (SELECT c_mktsegment, o_orderpriority, n,
        |             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |               ORDER BY n DESC, o_orderpriority) AS rn,
        |             SUM(n) OVER (PARTITION BY c_mktsegment) AS n_orders
        |      FROM c)
        |SELECT c_mktsegment, o_orderpriority AS top_priority,
        |       CAST(n AS BIGINT) AS n_top, CAST(n_orders AS BIGINT) AS n_orders,
        |       CAST((n * 10000) // n_orders AS INT) AS share_bp
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    // End-to-end curation funnel: the q62 quality cascade, the q32
    // exact-dedup winner, the q138 temperature gate and the q59 packing
    // prefix, chained verbatim — per-source funnel + global bin count.
    "q162_curation_pipeline" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT)))*1.0
         |          / len(toks) AS ml,
         |        len(list_filter(toks, w -> length(w) >= 7))*1.0 / len(toks) AS lf,
         |        CAST(len(list_filter(toks,
         |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS ns
         |      FROM tk),
         |qd AS (SELECT doc_id FROM m
         |       WHERE NOT (n_tokens < 50) AND NOT (ml < 4.2 OR ml > 4.8)
         |         AND NOT (lf > 0.06) AND NOT (ns < 2)),
         |qn AS (SELECT n.doc_id, n.t FROM n JOIN qd ON n.doc_id = qd.doc_id),
         |rep AS (SELECT MIN(doc_id) AS doc_id FROM qn GROUP BY t),
         |dd AS (SELECT d.doc_id, d.source FROM documents d
         |       JOIN rep ON d.doc_id = rep.doc_id),
         |c AS (SELECT source, COUNT(*) AS n_total FROM dd GROUP BY source),
         |w AS (SELECT source, n_total,
         |             CAST(floor(1000000*sqrt(n_total)) AS BIGINT) AS weight
         |      FROM c),
         |t2 AS (SELECT SUM(n_total) AS corpus_n, SUM(weight) AS sum_w FROM w),
         |rt AS (SELECT source,
         |              LEAST(1000000, CAST((CAST(1000000 AS HUGEINT) * (corpus_n*40//100) * weight)
         |                // (CAST(sum_w AS HUGEINT) * n_total) AS BIGINT)) AS rate_ppm
         |       FROM w CROSS JOIN t2),
         |fin AS (SELECT dd.doc_id, dd.source FROM dd JOIN rt ON dd.source = rt.source
         |        WHERE (((dd.doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |               % ${graft.ext.TextOps.HashP}) % 1000000 < rt.rate_ppm),
         |ft AS (SELECT f.doc_id, f.source,
         |              CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM fin f JOIN n ON f.doc_id = n.doc_id),
         |pre AS (SELECT doc_id,
         |               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |        FROM ft),
         |nb AS (SELECT COUNT(DISTINCT pre // 2048) AS n_bins_global FROM pre),
         |c0 AS (SELECT source, COUNT(*) AS n_input FROM documents GROUP BY source),
         |c1 AS (SELECT d.source, COUNT(*) AS n_quality FROM documents d
         |       JOIN qd ON d.doc_id = qd.doc_id GROUP BY d.source),
         |c2 AS (SELECT source, COUNT(*) AS n_dedup FROM dd GROUP BY source),
         |c3 AS (SELECT source, COUNT(*) AS n_final,
         |              CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens_final
         |       FROM ft GROUP BY source)
         |SELECT c0.source, c0.n_input,
         |       COALESCE(n_quality, 0) AS n_quality,
         |       COALESCE(n_dedup, 0) AS n_dedup,
         |       COALESCE(n_final, 0) AS n_final,
         |       COALESCE(sum_tokens_final, 0) AS sum_tokens_final,
         |       nb.n_bins_global
         |FROM c0 LEFT JOIN c1 USING (source) LEFT JOIN c2 USING (source)
         |LEFT JOIN c3 USING (source) CROSS JOIN nb
         |ORDER BY c0.source""".stripMargin,
    // Clamped running balance via the prefix-sum/running-floor
    // linearization: balance = S − min(0, min S); a clamp fires iff the
    // prefix sum digs a new low.
    "q163_clamped_balance" ->
      s"""WITH mv AS (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         |              CASE WHEN l_returnflag = 'R' THEN -${cents("l_quantity")}
         |                   ELSE ${cents("l_quantity")} END AS delta
         |            FROM lineitem),
         |s AS (SELECT *, SUM(delta) OVER wk AS ps FROM mv
         |      WINDOW wk AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |b AS (SELECT *, ps - LEAST(0, MIN(ps) OVER wk) AS balance,
         |             CASE WHEN ps < LEAST(0, COALESCE(MIN(ps) OVER wp, 0))
         |                  THEN 1 ELSE 0 END AS clamped
         |      FROM s
         |      WINDOW wk AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |      wp AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT l_suppkey, COUNT(*) AS n_moves,
         |       CAST(SUM(delta) AS BIGINT) AS net_delta,
         |       CAST(SUM(delta) - LEAST(0, MIN(ps)) AS BIGINT) AS final_balance,
         |       CAST(MAX(balance) AS BIGINT) AS peak_balance,
         |       CAST(SUM(clamped) AS BIGINT) AS n_clamps
         |FROM b GROUP BY l_suppkey
         |ORDER BY l_suppkey""".stripMargin,
    // Heaps'-law content growth: first-doc per distinct char-8-gram
    // shingle hash, 50-doc slices, cumulative shingle vocabulary.
    "q164_content_growth" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |f AS (SELECT hv, MIN(doc_id) AS first_doc FROM h GROUP BY hv),
         |b AS (SELECT first_doc // 50 AS bucket, COUNT(*) AS n_new_shingles
         |      FROM f GROUP BY bucket)
         |SELECT bucket, n_new_shingles,
         |       CAST(SUM(n_new_shingles) OVER (ORDER BY bucket
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_shingles
         |FROM b ORDER BY bucket""".stripMargin,
    // Source-level MinHash: per-source union signatures from the same
    // Perms table, pairwise matching-hash counts.
    "q165_source_similarity" ->
      s"""WITH $nCte,
         |z AS (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n),
         |sh AS (SELECT d.source, ${hv8("substr(z.t, z.g, 8)")} AS hv
         |       FROM z JOIN documents d ON z.doc_id = d.doc_id),
         |perms AS (SELECT * FROM (VALUES $permValues) AS p(j, band, slot, a, b, w)),
         |m AS (SELECT source, j, MIN((hv * a + b) % ${graft.ext.TextOps.HashP}) AS mh
         |      FROM sh CROSS JOIN perms GROUP BY source, j),
         |pr AS (SELECT x.source AS source_a, y.source AS source_b,
         |              CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS INT)
         |                AS n_matching
         |       FROM m x JOIN m y ON x.j = y.j AND x.source < y.source
         |       GROUP BY x.source, y.source)
         |SELECT source_a, source_b, n_matching,
         |       CAST(n_matching AS DOUBLE)/16.0 AS est_similarity
         |FROM pr ORDER BY source_a, source_b""".stripMargin,
    // KMV set-operation sketches: k smallest full-range affine hashes of
    // each source's distinct shingle set; D-hat = (k-1)*P div m_k, union
    // by sort-and-truncate merge, intersection via the sketch-overlap
    // fraction of the union estimate. All-integer, value-reproducible.
    "q180_source_set_ops" ->
      s"""WITH $nCte,
         |z AS (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n),
         |sh AS (SELECT DISTINCT d.source,
         |              (((${hv8("substr(z.t, z.g, 8)")}) * 2654435761 + 97)
         |               % ${graft.ext.TextOps.HashP}) AS h
         |       FROM z JOIN documents d ON z.doc_id = d.doc_id),
         |r AS (SELECT source, h,
         |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM sh),
         |sk AS (SELECT source, list(h ORDER BY h) AS sk
         |       FROM r WHERE rn <= 128 GROUP BY source),
         |e AS (SELECT source, sk,
         |             CASE WHEN len(sk) < 128 THEN CAST(len(sk) AS BIGINT)
         |                  ELSE ${127L * graft.ext.TextOps.HashP} // sk[128]
         |             END AS est
         |      FROM sk),
         |pr AS (SELECT a.source AS source_a, b.source AS source_b,
         |              a.sk AS sa, b.sk AS sb,
         |              a.est AS est_distinct_a, b.est AS est_distinct_b
         |       FROM e a JOIN e b ON a.source < b.source),
         |uu AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))[1:128]
         |                 AS u FROM pr),
         |u2 AS (SELECT *, CAST(len(u) AS BIGINT) AS nu,
         |              CASE WHEN len(u) < 128 THEN CAST(len(u) AS BIGINT)
         |                   ELSE ${127L * graft.ext.TextOps.HashP} // u[128]
         |              END AS est_union,
         |              CAST(len(list_intersect(list_intersect(u, sa), sb))
         |                   AS BIGINT) AS inter_in_u
         |       FROM uu)
         |SELECT source_a, source_b, est_distinct_a, est_distinct_b, est_union,
         |       (inter_in_u * est_union) // nu AS est_inter,
         |       (inter_in_u * 1000) // nu AS jaccard_milli
         |FROM u2 ORDER BY source_a, source_b""".stripMargin,
    // Char-bigram LM scoring: each distinct bigram type's -ln P(c2|c1)
    // quantized once to integer micro-nats; per-doc aggregates are then
    // exact integers (order-independent across engines).
    "q181_bigram_lm_nll" ->
      s"""WITH $nCte,
         |b AS (SELECT doc_id, substr(t, CAST(g AS INT), 2) AS bg
         |      FROM (SELECT doc_id, t, unnest(range(1, length(t))) AS g
         |            FROM n) z),
         |dc AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg),
         |m AS (SELECT bg, SUM(c) AS cnt FROM dc GROUP BY bg),
         |mar AS (SELECT substr(bg, 1, 1) AS c1, SUM(cnt) AS tot
         |        FROM m GROUP BY c1),
         |v AS (SELECT COUNT(DISTINCT substr(bg, 2, 1)) AS vv FROM m),
         |lp AS (SELECT m.bg,
         |              CAST(ROUND(-ln((m.cnt + 1.0)/(mar.tot + v.vv))
         |                         * 1000000, 0) AS BIGINT) AS lp
         |       FROM m JOIN mar ON substr(m.bg, 1, 1) = mar.c1 CROSS JOIN v),
         |s AS (SELECT dc.doc_id, SUM(dc.c) AS nb, SUM(dc.c * lp.lp) AS sl
         |      FROM dc JOIN lp ON dc.bg = lp.bg GROUP BY dc.doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.nb AS BIGINT), 0) AS n_bigrams,
         |       COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // First/last-touch attribution: journeys cut at purchases by a
    // running prior-purchase count; touch extremes via rank windows.
    "q183_touch_attribution" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type,
        |                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
        |                 CAST(ROUND(value*100, 0) AS BIGINT) AS vc
        |          FROM events),
        |w AS (SELECT *, COALESCE(SUM(is_p) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
        |      FROM e),
        |t AS (SELECT user_id, jid, event_type,
        |             row_number() OVER (PARTITION BY user_id, jid
        |               ORDER BY ts, event_id) AS rn_a,
        |             row_number() OVER (PARTITION BY user_id, jid
        |               ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM w WHERE event_type IN ('click', 'view')),
        |ft AS (SELECT user_id, jid,
        |              MIN(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
        |              MIN(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch
        |       FROM t GROUP BY user_id, jid),
        |p AS (SELECT user_id, jid, CAST(SUM(vc) AS BIGINT) AS vc
        |      FROM w WHERE is_p = 1 GROUP BY user_id, jid),
        |b AS (SELECT p.vc, COALESCE(ft.first_touch, 'direct') AS first_touch,
        |             COALESCE(ft.last_touch, 'direct') AS last_touch
        |      FROM p LEFT JOIN ft ON p.user_id = ft.user_id AND p.jid = ft.jid)
        |SELECT model, touch_type, n_journeys, attributed_value FROM (
        |  SELECT 'first_touch' AS model, first_touch AS touch_type,
        |         COUNT(*) AS n_journeys,
        |         CAST(SUM(vc) AS DOUBLE)/100.0 AS attributed_value
        |  FROM b GROUP BY first_touch
        |  UNION ALL
        |  SELECT 'last_touch' AS model, last_touch AS touch_type,
        |         COUNT(*) AS n_journeys,
        |         CAST(SUM(vc) AS DOUBLE)/100.0 AS attributed_value
        |  FROM b GROUP BY last_touch) z
        |ORDER BY model, touch_type""".stripMargin,
    // Character entropy: H = ln n - (1/n) sum c*ln c, every ln quantized
    // once on an integer count, aggregates exact integers after that.
    "q182_char_entropy" ->
      s"""WITH $nCte,
         |ch AS (SELECT doc_id, substr(t, CAST(g AS INT), 1) AS ch
         |       FROM (SELECT doc_id, t, unnest(range(1, length(t)+1)) AS g
         |             FROM n) z),
         |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
         |s AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k,
         |             SUM(c * CAST(ROUND(ln(c) * 1000000, 0) AS BIGINT)) AS scl
         |      FROM c GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.n AS BIGINT), 0) AS n_chars,
         |       COALESCE(CAST(s.k AS BIGINT), 0) AS distinct_chars,
         |       COALESCE(CAST(ROUND(ln(s.n) * 1000000, 0) AS BIGINT)
         |                 - CAST(s.scl // s.n AS BIGINT), 0) AS entropy_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // TPC-H Q19 shape: one fact pass under an OR-of-ANDs bracket.
    "q166_bracket_revenue" ->
      s"""WITH li AS (SELECT l_partkey, ${cents("l_quantity")} AS qc,
         |                  ${cents("l_extendedprice")} AS c FROM lineitem)
         |SELECT COUNT(*) AS n_items, CAST(SUM(c) AS DOUBLE)/100.0 AS revenue
         |FROM li JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND qc BETWEEN 100 AND 1100)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND qc BETWEEN 1000 AND 2000)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |       AND qc BETWEEN 2000 AND 3000)""".stripMargin,
    // TPC-H Q10 shape: quarterly returned revenue per customer, top 20.
    "q167_returned_items" ->
      s"""WITH li AS (SELECT l_orderkey, ${cents("l_extendedprice")} AS c
         |            FROM lineitem
         |            WHERE l_returnflag = 'R'
         |              AND l_shipdate >= TIMESTAMP '1996-01-01'
         |              AND l_shipdate <  TIMESTAMP '1996-04-01'),
         |g AS (SELECT o_custkey, COUNT(*) AS n_returned_items,
         |             CAST(SUM(c) AS BIGINT) AS rc
         |      FROM li JOIN orders ON l_orderkey = o_orderkey
         |      GROUP BY o_custkey)
         |SELECT c_custkey, c_name, n_name, n_returned_items,
         |       CAST(rc AS DOUBLE)/100.0 AS returned_revenue
         |FROM g JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY returned_revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    // TPC-H Q12 shape: late shipments split by order priority.
    "q168_late_priority_mix" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_priority,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS n_low_priority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', CAST(o_orderdate AS DATE),
        |                CAST(l_shipdate AS DATE)) > 60
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // TPC-H Q4 shape: EXISTS a late lineitem, counted per priority.
    "q169_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND date_diff('day', CAST(o.o_orderdate AS DATE),
        |                              CAST(l.l_shipdate AS DATE)) > 30)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // TPC-H Q1 shape: the canonical pricing-summary scan. All sums are
    // exact integers (cents × integer percent) until the final division.
    "q170_pricing_summary" ->
      s"""WITH li AS (SELECT l_returnflag, l_linestatus,
         |                  ${cents("l_quantity")} AS qc,
         |                  ${cents("l_extendedprice")} AS c,
         |                  ${cents("l_discount")} AS dc,
         |                  ${cents("l_tax")} AS tc
         |            FROM lineitem
         |            WHERE l_shipdate <= TIMESTAMP '2000-12-01')
         |SELECT l_returnflag, l_linestatus,
         |       CAST(SUM(qc) AS DOUBLE)/100.0 AS sum_qty,
         |       CAST(SUM(c) AS DOUBLE)/100.0 AS sum_base_price,
         |       CAST(SUM(c*(100-dc)) AS DOUBLE)/10000.0 AS sum_disc_price,
         |       CAST(SUM(c*(100-dc)*(100+tc)) AS DOUBLE)/1000000.0 AS sum_charge,
         |       CAST(SUM(qc) AS DOUBLE)/COUNT(*)/100.0 AS avg_qty,
         |       CAST(SUM(c) AS DOUBLE)/COUNT(*)/100.0 AS avg_price,
         |       CAST(SUM(dc) AS DOUBLE)/COUNT(*)/100.0 AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM li GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // TPC-H Q3 shape: unshipped revenue of one segment's orders, top 10.
    "q171_ship_priority" ->
      s"""WITH li AS (SELECT l_orderkey, ${cents("l_extendedprice")} AS c,
         |                  ${cents("l_discount")} AS dc
         |            FROM lineitem
         |            WHERE l_shipdate > TIMESTAMP '1996-06-01'),
         |ord AS (SELECT o_orderkey, o_orderdate, o_orderpriority
         |        FROM orders JOIN customer ON o_custkey = c_custkey
         |        WHERE o_orderdate < TIMESTAMP '1996-06-01'
         |          AND c_mktsegment = 'BUILDING')
         |SELECT l_orderkey,
         |       CAST(SUM(c*(100-dc)) AS DOUBLE)/10000.0 AS revenue,
         |       CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
         |FROM li JOIN ord ON l_orderkey = o_orderkey
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, order_date, l_orderkey
         |LIMIT 10""".stripMargin,
    // TPC-H Q6 shape: pure scan-side conditional aggregate; every
    // predicate is a raw-column comparison (pushdown showcase).
    "q172_revenue_delta" ->
      s"""SELECT CAST(SUM(c*dc) AS DOUBLE)/10000.0 AS forecast_revenue,
         |       COUNT(*) AS n_items
         |FROM (SELECT ${cents("l_extendedprice")} AS c,
         |             ${cents("l_discount")} AS dc
         |      FROM lineitem
         |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |        AND l_shipdate <  TIMESTAMP '1997-01-01'
         |        AND l_discount >= CAST(0.05 AS DOUBLE)
         |        AND l_discount <= CAST(0.07 AS DOUBLE)
         |        AND l_quantity < 24)""".stripMargin,
    // TPC-H Q9 shape: nation×year margin on LIKE-pruned parts (retail
    // price proxies the missing partsupp supply cost).
    "q173_product_profit" ->
      s"""WITH p AS (SELECT p_partkey, ${cents("p_retailprice")} AS rc
         |           FROM part WHERE p_name LIKE '%red%'),
         |sn AS (SELECT s_suppkey, n_name
         |       FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |li AS (SELECT l_orderkey, ${cents("l_quantity")} AS qc,
         |              ${cents("l_extendedprice")} AS c,
         |              ${cents("l_discount")} AS dc, rc, n_name
         |       FROM lineitem JOIN p ON l_partkey = p_partkey
         |       JOIN sn ON l_suppkey = s_suppkey)
         |SELECT n_name AS nation,
         |       CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
         |       CAST(SUM(c*(100-dc) - rc*qc) AS DOUBLE)/10000.0 AS profit,
         |       COUNT(*) AS n_items
         |FROM li JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,
    // TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    // customers (the left-outer-join shape).
    "q174_order_count_dist" ->
      """WITH pc AS (SELECT o_custkey, COUNT(*) AS n FROM orders
        |            WHERE o_orderpriority <> '1-URGENT'
        |            GROUP BY o_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT COALESCE(n, 0) AS c_count
        |      FROM customer LEFT JOIN pc ON c_custkey = o_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Threshold-sampled distinct profile: one UNION ALL branch per
    // column, each recomputing the SAME affine-hash slice estimator —
    // canonicalizations mirror Analytics.LineitemCanon exactly.
    "q176_profile_sampled" -> {
      val P = graft.ext.TextOps.HashP
      val tDiv = 16L
      val thresh = P / tDiv
      val canonSql: Seq[(String, String)] =
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
          .map(c => c -> s"CAST($c AS BIGINT)") ++
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(c => c -> s"CAST(ROUND($c*10000,0) AS BIGINT)") ++
        Seq("l_returnflag", "l_linestatus")
          .map(c => c -> hv8(s"rpad($c, 8, '#')")) ++
        Seq("l_shipdate" ->
          "CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)")
      canonSql.map { case (name, canon) =>
        s"""SELECT '$name' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT(canon) AS n_nulls,
           |  COUNT(DISTINCT CASE WHEN h < $thresh THEN h END) AS n_sketch_keys,
           |  COUNT(DISTINCT CASE WHEN h < $thresh THEN h END) * $tDiv AS n_distinct_est
           |FROM (SELECT canon, ((canon % $P) * 2654435761 + 97) % $P AS h
           |      FROM (SELECT $canon AS canon FROM lineitem) z0) z1""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // Per-column profile: one UNION ALL branch per lineitem column —
    // generated from the same static column list the engine profiles.
    "q161_table_profile" -> {
      val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      liCols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // Inverse Simpson effective language count per source, exact milli.
    "q160_source_diversity" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents
        |           GROUP BY source, lang),
        |g AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |             CAST(COUNT(*) AS INT) AS n_langs,
        |             CAST(SUM(n*n) AS BIGINT) AS sq
        |      FROM c GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |       CAST(CAST(n_docs AS HUGEINT) * n_docs * 1000 // sq AS BIGINT)
        |         AS inv_simpson_milli
        |FROM g ORDER BY source""".stripMargin,
    // Okapi BM25, integer-exact: idf quantized once per query term to
    // micro-nats (the q181 contract), the tf saturation term cleared of
    // decimals (k1=1.2, b=0.75, avgdl=T/N; multiply num and den by 10T)
    // and floored to exact ppm in HUGEINT — Σ idf·tf_ppm is then pure
    // integer arithmetic, reproducible value-for-value.
    "q186_bm25_search" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |q(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qi AS (SELECT q.query_id, q.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM q JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12,
         |         CAST(COUNT(*) AS INT) AS n_hit_terms
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       GROUP BY qi.query_id, tf.doc_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc)
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score_e12,
         |       n_hit_terms
         |FROM rk WHERE rnk <= 10
         |ORDER BY query_id, rank""".stripMargin,
    // Int8 scalar quantization: L2-normalize (the same sequential
    // double dot the engine's norm computes), one symmetric corpus-wide
    // scale, codes floor(127·x̂/scale) — IEEE double ops in a fixed
    // order, no transcendentals, so both engines code identically; the
    // ranking key is an exact integer dot product. The exact float
    // top-5 (the q37 shape) feeds the per-hit recall flag.
    "q187_quantized_topk" ->
      s"""WITH $embCte,
         |ux AS (SELECT vec_id, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
         |nx AS (SELECT vec_id, i,
         |         CASE WHEN nrm = 0.0 THEN 0.0 ELSE x / nrm END AS xn
         |       FROM ux),
         |sc0 AS (SELECT max(abs(xn)) AS scale FROM nx),
         |qz AS (SELECT vec_id, i,
         |         CAST(CASE WHEN scale = 0.0 THEN 0.0
         |              ELSE floor(127.0 * xn / scale) END AS BIGINT) AS qx
         |       FROM nx CROSS JOIN sc0),
         |q AS (SELECT * FROM qz WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              CAST(SUM(q.qx * c.qx) AS BIGINT) AS qdot
         |       FROM qz c JOIN q ON c.i = q.i AND c.vec_id <> q.vec_id
         |       GROUP BY q.vec_id, c.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY qdot DESC, neighbor_id) AS rnk FROM sc),
         |eq AS (SELECT * FROM nm WHERE vec_id < 10),
         |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          CASE WHEN eq.nrm * c.nrm = 0.0 THEN 0.0
         |               ELSE ROUND(list_dot_product(eq.emb, c.emb)
         |                          /(eq.nrm*c.nrm), 4) END AS score
         |        FROM nm c CROSS JOIN eq WHERE c.vec_id <> eq.vec_id),
         |erk AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY score DESC, neighbor_id) AS rnk
         |        FROM esc)
         |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
         |       rk.qdot,
         |       CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS in_exact_topk
         |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) e
         |  ON rk.query_id = e.query_id AND rk.neighbor_id = e.neighbor_id
         |WHERE rk.rnk <= 5
         |ORDER BY rk.query_id, rank""".stripMargin,
    // BFS hop distances as a depth-bounded recursive CTE: UNION dedups
    // (seed, node, dist) walk triples each level, MIN(dist) collapses
    // longer walks to the true shortest hop count — the declarative
    // restatement of the engine's frontier/anti-join expansion.
    "q188_graph_hops" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT l.l_suppkey * 2 AS u, o.o_custkey * 2 + 1 AS v
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |adj AS (SELECT u AS src, v AS dst FROM pairs
        |        UNION ALL SELECT v, u FROM pairs),
        |bfs(seed, node, dist) AS (
        |  SELECT seed, seed, 0 FROM (VALUES (2), (3), (4)) s(seed)
        |  UNION
        |  SELECT b.seed, a.dst, b.dist + 1
        |  FROM bfs b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 3),
        |d AS (SELECT seed, node, MIN(dist) AS dist FROM bfs GROUP BY seed, node)
        |SELECT CAST(seed AS BIGINT) AS seed,
        |       CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
        |         AS node_type,
        |       CAST(node // 2 AS BIGINT) AS node_key,
        |       CAST(dist AS INT) AS dist
        |FROM d
        |ORDER BY seed, dist, node_type, node_key""".stripMargin,
    // RRF over the three dense rankers, each embedded as a subquery of
    // its own oracled SQL (annBruteSql/annLshSql/annIvfSql — the q37/
    // q38/q49 definitions verbatim). ⌊10⁶/(60+rank)⌋ summed as exact
    // integers.
    "q189_rrf_fusion" ->
      s"""WITH b AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) z1),
         |l AS (SELECT query_id, neighbor_id, rank FROM ($annLshSql) z2),
         |i AS (SELECT query_id, neighbor_id, rank FROM ($annIvfSql) z3),
         |u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM b
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM l
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM i),
         |f AS (SELECT query_id, neighbor_id,
         |             CAST(SUM(c) AS BIGINT) AS rrf_micro,
         |             CAST(COUNT(*) AS INT) AS n_lists
         |      FROM u GROUP BY query_id, neighbor_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY rrf_micro DESC, neighbor_id) AS rnk FROM f)
         |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, rrf_micro,
         |       n_lists
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,
    // Rolling lower-median / MAD over a bounded ROWS frame: list() is
    // frame-ordered on both engines, medians are sorted-array elements,
    // everything integer cents.
    "q190_revenue_anomaly" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |a AS (SELECT *, list(px) OVER (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS arr FROM d),
         |m AS (SELECT priority, day, px, len(arr) AS n, arr,
         |             list_sort(arr)[(len(arr)+1)//2] AS med
         |      FROM a),
         |m2 AS (SELECT priority, day, px, n, med,
         |              list_sort(list_transform(arr, v -> abs(v - med)))[(n+1)//2]
         |                AS mad
         |       FROM m)
         |SELECT priority, day, CAST(n AS INT) AS n_window, px, med, mad,
         |       CASE WHEN abs(px - med) > 5*mad THEN 1 ELSE 0 END AS is_anomaly
         |FROM m2 WHERE n >= 7
         |ORDER BY priority, day""".stripMargin,
    // Blocked sorted-neighborhood: the q35 SimHash fingerprint chain,
    // row-numbered inside each 8-bit fp block, candidates = rank gaps
    // 1..3 (window 4), verified by the q33 word-3-gram Jaccard over the
    // UNCAPPED shingle space restricted to candidate pairs.
    "q191_snm_dedup" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS f
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |th AS (SELECT doc_id, ${hv8("rpad(f, 8, ' ')")} AS hv FROM bg),
         |votes AS (SELECT doc_id, $simhashVoteCols FROM th GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($simhashFpExpr AS BIGINT) AS fp FROM votes),
         |rk AS (SELECT doc_id, fp, row_number() OVER (PARTITION BY fp >> 24
         |         ORDER BY fp, doc_id) AS rn, fp >> 24 AS block FROM fp),
         |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
         |                greatest(x.doc_id, y.doc_id) AS doc_b
         |         FROM rk x JOIN rk y ON x.block = y.block
         |           AND y.rn > x.rn AND y.rn <= x.rn + 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
         |       FROM cand c
         |       JOIN sh a ON a.doc_id = c.doc_a
         |       JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |        JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Multi-probe sign-LSH: the q38 bucket chain, query side fanned to
    // its bucket plus the 4 Hamming-1 neighbors; recall flag from the
    // q37 exact top-k embedded verbatim.
    "q192_multiprobe_lsh" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |q AS (SELECT * FROM bk WHERE vec_id < 10),
         |pq AS (SELECT q.vec_id, q.emb, q.nrm, xor(q.bucket, m.mask) AS bucket
         |       FROM q CROSS JOIN (VALUES (0),(1),(2),(4),(8)) m(mask)),
         |sc AS (SELECT pq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              ROUND(list_dot_product(pq.emb, c.emb)/(pq.nrm*c.nrm), 4) AS score
         |       FROM bk c JOIN pq ON c.bucket = pq.bucket AND c.vec_id <> pq.vec_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score DESC, neighbor_id) AS rnk FROM sc),
         |eb AS (SELECT query_id, neighbor_id FROM ($annBruteSql) z
         |       WHERE rank <= 3)
         |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
         |       rk.score,
         |       CASE WHEN eb.neighbor_id IS NULL THEN 0 ELSE 1 END AS in_exact_topk
         |FROM rk LEFT JOIN eb
         |  ON rk.query_id = eb.query_id AND rk.neighbor_id = eb.neighbor_id
         |WHERE rk.rnk <= 3
         |ORDER BY rk.query_id, rank""".stripMargin,
    // Sliding distinct via bounded fan-out: each (user, day) pair
    // supports the 7 window-end days; ghost days past the last activity
    // clipped by the max-day scalar.
    "q193_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT max(day) AS dmax FROM ud),
        |w AS (SELECT user_id, day + o AS day
        |      FROM ud CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) z(o)),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau
        |        FROM w CROSS JOIN b WHERE day <= dmax GROUP BY day),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day)
        |SELECT wau.day, COALESCE(dau.dau, 0) AS dau, wau.wau
        |FROM wau LEFT JOIN dau ON dau.day = wau.day
        |ORDER BY wau.day""".stripMargin,
    // SCD2 run collapse: lag change flag -> running-sum run ids -> one
    // aggregation per run -> lead closes each range.
    "q194_scd2_runs" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |                  o_orderkey, o_orderpriority AS priority FROM orders),
        |r AS (SELECT *, CASE WHEN lag(priority) OVER w IS NULL
        |                       OR priority <> lag(priority) OVER w
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
        |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
        |        ORDER BY d, o_orderkey ROWS UNBOUNDED PRECEDING) AS INT) AS version
        |      FROM r),
        |g AS (SELECT o_custkey, version, priority, min(d) AS valid_from,
        |             COUNT(*) AS n_orders
        |      FROM v GROUP BY 1, 2, 3),
        |f AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey
        |        ORDER BY version) AS valid_to FROM g)
        |SELECT o_custkey, version, priority, valid_from, valid_to,
        |       CAST(n_orders AS BIGINT) AS n_orders,
        |       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM f ORDER BY o_custkey, version""".stripMargin,
    // A-priori level-3: item-support prune, then the bounded in-basket
    // triple enumeration; top-k under a total tie-break order.
    "q195_frequent_triples" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |f1 AS (SELECT item FROM it GROUP BY item HAVING COUNT(*) >= 2),
        |p AS (SELECT * FROM it WHERE item IN (SELECT item FROM f1)),
        |t AS (SELECT a.i1, b.i2, c.i3, COUNT(*) AS support
        |      FROM (SELECT oid, item AS i1 FROM p) a
        |      JOIN (SELECT oid, item AS i2 FROM p) b USING (oid)
        |      JOIN (SELECT oid, item AS i3 FROM p) c USING (oid)
        |      WHERE a.i1 < b.i2 AND b.i2 < c.i3
        |      GROUP BY 1, 2, 3),
        |top AS (SELECT * FROM t ORDER BY support DESC, i1, i2, i3 LIMIT 25)
        |SELECT CAST(row_number() OVER (ORDER BY support DESC, i1, i2, i3) AS INT)
        |         AS rank,
        |       i1, i2, i3, CAST(support AS BIGINT) AS support
        |FROM top
        |ORDER BY rank""".stripMargin,
    // Pairwise JSD: probabilities floored to exact ppb, each log ratio
    // vs the mixture quantized once per (pair, term) to micro-nats
    // (the q181 contract), one-sided mass in closed form via the ln 2
    // constant; numerator clamped >= 0 before the floor division
    // (truncate-vs-floor divergence on negatives).
    "q196_js_divergence" ->
      """WITH n2 AS (SELECT source,
        |             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |           FROM documents),
        |tk AS (SELECT source, unnest(string_split(t, ' ')) AS w FROM n2),
        |cnt AS (SELECT source, w, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source),
        |p AS (SELECT source, w,
        |        CAST(CAST(c AS HUGEINT) * 1000000000 // n AS BIGINT) AS ppb,
        |        CAST(c AS DOUBLE) / n AS pr
        |      FROM cnt JOIN tot USING (source)),
        |j AS (SELECT a.source AS src_a, b.source AS src_b,
        |        a.ppb AS pa, b.ppb AS pb,
        |        CAST(round(ln(a.pr / ((a.pr + b.pr) / 2)) * 1e6, 0) AS BIGINT) AS la,
        |        CAST(round(ln(b.pr / ((a.pr + b.pr) / 2)) * 1e6, 0) AS BIGINT) AS lb
        |      FROM p a JOIN p b ON a.w = b.w AND a.source < b.source),
        |g AS (SELECT src_a, src_b, CAST(COUNT(*) AS INT) AS n_common_terms,
        |        CAST(SUM(pa * la + pb * lb) AS BIGINT) AS s_common,
        |        CAST(SUM(pa) AS BIGINT) AS mass_a,
        |        CAST(SUM(pb) AS BIGINT) AS mass_b
        |      FROM j GROUP BY 1, 2),
        |f AS (SELECT src_a, src_b, n_common_terms,
        |        greatest(CAST(0 AS BIGINT), s_common + 693147 *
        |          ((1000000000 - mass_a) + (1000000000 - mass_b)))
        |          // 2000000000 AS jsd_micro
        |      FROM g)
        |SELECT src_a, src_b, n_common_terms,
        |       CAST(jsd_micro AS BIGINT) AS jsd_micro,
        |       CAST(jsd_micro AS DOUBLE) / 1e6 AS jsd
        |FROM f ORDER BY src_a, src_b""".stripMargin,

    "q197_gini_segment" ->
      """WITH rev AS (SELECT o_custkey,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, o_custkey, cents
        |      FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, cents,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY cents, o_custkey) AS rk
        |      FROM j),
        |g AS (SELECT c_mktsegment, COUNT(*) AS n,
        |        SUM(CAST(cents AS HUGEINT)) AS s,
        |        SUM(CAST(rk AS HUGEINT) * cents) AS t
        |      FROM r GROUP BY 1)
        |SELECT c_mktsegment, CAST(n AS INT) AS n_cust,
        |       CAST(s AS DOUBLE)/100.0 AS revenue,
        |       CAST((2*t - (n+1)*s) * 1000000 // (n*s) AS BIGINT) AS gini_ppm,
        |       CAST(CAST((2*t - (n+1)*s) * 1000000 // (n*s) AS BIGINT)
        |            AS DOUBLE)/1e6 AS gini
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "q198_benford_prices" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice*100,0)
        |             AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |           FROM orders
        |           WHERE CAST(round(o_totalprice*100,0) AS BIGINT) > 0),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT SUM(CAST(n AS HUGEINT)) AS nt FROM c)
        |SELECT digit, CAST(n AS BIGINT) AS n_orders,
        |       CAST(CAST(n AS HUGEINT) * 1000000 // nt AS BIGINT) AS obs_ppm,
        |       CAST(round(log10(1.0 + 1.0/digit) * 1e6, 0) AS BIGINT)
        |         AS exp_ppm,
        |       CAST(CAST(n AS HUGEINT) * 1000000 // nt AS BIGINT)
        |         - CAST(round(log10(1.0 + 1.0/digit) * 1e6, 0) AS BIGINT)
        |         AS dev_ppm
        |FROM c, t ORDER BY digit""".stripMargin,

    "q199_robust_means" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey,
        |             CAST(round(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |r AS (SELECT o_orderpriority, cents,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY cents, o_orderkey) AS rk,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) // 20 AS k
        |      FROM b),
        |g AS (SELECT o_orderpriority, MAX(n) AS n, MAX(k) AS k,
        |        SUM(cents) AS s_all,
        |        SUM(CASE WHEN rk > k AND rk <= n - k THEN cents END) AS s_trim,
        |        SUM(CASE WHEN rk > k AND rk <= n - k THEN 1 ELSE 0 END)
        |          AS n_trim,
        |        MAX(CASE WHEN rk = k + 1 THEN cents END) AS lo,
        |        MAX(CASE WHEN rk = n - k THEN cents END) AS hi
        |      FROM r GROUP BY 1)
        |SELECT o_orderpriority, CAST(n AS INT) AS n_orders,
        |       CAST(k AS INT) AS k_trim,
        |       CAST(s_all AS DOUBLE)/100.0/n AS mean,
        |       CAST(s_trim AS DOUBLE)/100.0/n_trim AS trimmed_mean,
        |       CAST(s_trim + k*(lo + hi) AS DOUBLE)/100.0/n AS winsor_mean,
        |       CAST(lo AS DOUBLE)/100.0 AS lo_bound,
        |       CAST(hi AS DOUBLE)/100.0 AS hi_bound
        |FROM g ORDER BY o_orderpriority""".stripMargin,

    "q200_abc_pareto" ->
      """WITH pr AS (SELECT l_partkey,
        |              SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS rev
        |            FROM lineitem GROUP BY 1),
        |w AS (SELECT l_partkey, rev,
        |        COALESCE(SUM(CAST(rev AS HUGEINT)) OVER (
        |          ORDER BY rev DESC, l_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          0) AS prior
        |      FROM pr),
        |t AS (SELECT SUM(CAST(rev AS HUGEINT)) AS total FROM pr),
        |c AS (SELECT CASE WHEN prior * 1000000 // total < 800000 THEN 'A'
        |               WHEN prior * 1000000 // total < 950000 THEN 'B'
        |               ELSE 'C' END AS abc_class, rev
        |      FROM w, t)
        |SELECT abc_class, CAST(COUNT(*) AS INT) AS n_parts,
        |       CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE)/100.0 AS revenue,
        |       CAST(SUM(CAST(rev AS HUGEINT)) * 1000000 //
        |            (SELECT total FROM t) AS BIGINT) AS share_ppm
        |FROM c GROUP BY 1 ORDER BY abc_class""".stripMargin,

    // SCD2 runs (the q194 CTEs) joined point-in-time by lineitem ship
    // date: each fact matches the version interval covering it.
    "q201_point_in_time" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |                  o_orderkey, o_orderpriority AS prio FROM orders),
        |r AS (SELECT *, CASE WHEN lag(prio) OVER w IS NULL
        |                       OR prio <> lag(prio) OVER w
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
        |v AS (SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
        |        ORDER BY d, o_orderkey ROWS UNBOUNDED PRECEDING) AS version
        |      FROM r),
        |g AS (SELECT o_custkey AS rc_custkey, version, prio,
        |             min(d) AS valid_from
        |      FROM v GROUP BY 1, 2, 3),
        |runs AS (SELECT rc_custkey, prio, valid_from,
        |           lead(valid_from) OVER (PARTITION BY rc_custkey
        |             ORDER BY version) AS valid_to FROM g),
        |f AS (SELECT l.l_orderkey, CAST(l.l_shipdate AS DATE) AS ship_d,
        |             oo.o_custkey, oo.o_orderpriority
        |      FROM lineitem l JOIN orders oo ON l.l_orderkey = oo.o_orderkey)
        |SELECT o_orderpriority AS order_priority, prio AS active_priority,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM f JOIN runs ON f.o_custkey = runs.rc_custkey
        |  AND f.ship_d >= runs.valid_from
        |  AND (runs.valid_to IS NULL OR f.ship_d < runs.valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Six fixed peel rounds with k = max(2, m div n) — both engines run
    // exactly the same six rounds; convergence is spec-checked.
    "q202_kcore" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
        |              l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        |       FROM it a JOIN it b ON a.oid = b.oid AND a.p < b.p),
        |kk AS (SELECT greatest(2, (2 * (SELECT COUNT(*) FROM e0) //
        |         (SELECT COUNT(*) FROM (SELECT u AS x FROM e0
        |          UNION SELECT v FROM e0) q)) * 11 // 16) AS k),
        |d0 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0) q
        |  GROUP BY 1),
        |n0 AS MATERIALIZED (SELECT node FROM d0, kk WHERE deg >= k),
        |e1 AS MATERIALIZED (SELECT u, v FROM e0
        |  WHERE u IN (SELECT node FROM n0)
        |    AND v IN (SELECT node FROM n0)),
        |d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e1 UNION ALL SELECT v AS node FROM e1) q
        |  GROUP BY 1),
        |n1 AS MATERIALIZED (SELECT node FROM d1, kk WHERE deg >= k),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1
        |  WHERE u IN (SELECT node FROM n1)
        |    AND v IN (SELECT node FROM n1)),
        |d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e2 UNION ALL SELECT v AS node FROM e2) q
        |  GROUP BY 1),
        |n2 AS MATERIALIZED (SELECT node FROM d2, kk WHERE deg >= k),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2
        |  WHERE u IN (SELECT node FROM n2)
        |    AND v IN (SELECT node FROM n2)),
        |d3 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3) q
        |  GROUP BY 1),
        |n3 AS MATERIALIZED (SELECT node FROM d3, kk WHERE deg >= k),
        |e4 AS MATERIALIZED (SELECT u, v FROM e3
        |  WHERE u IN (SELECT node FROM n3)
        |    AND v IN (SELECT node FROM n3)),
        |d4 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e4 UNION ALL SELECT v AS node FROM e4) q
        |  GROUP BY 1),
        |n4 AS MATERIALIZED (SELECT node FROM d4, kk WHERE deg >= k),
        |e5 AS MATERIALIZED (SELECT u, v FROM e4
        |  WHERE u IN (SELECT node FROM n4)
        |    AND v IN (SELECT node FROM n4)),
        |d5 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e5 UNION ALL SELECT v AS node FROM e5) q
        |  GROUP BY 1),
        |n5 AS MATERIALIZED (SELECT node FROM d5, kk WHERE deg >= k),
        |e6 AS MATERIALIZED (SELECT u, v FROM e5
        |  WHERE u IN (SELECT node FROM n5)
        |    AND v IN (SELECT node FROM n5)),
        |d6 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e6 UNION ALL SELECT v AS node FROM e6) q
        |  GROUP BY 1),
        |stats AS (
        |  SELECT 0 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d0) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d0), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d0), 0) AS max_deg
        |  UNION ALL
        |  SELECT 1 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e1) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d1), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d1), 0) AS max_deg
        |  UNION ALL
        |  SELECT 2 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d2) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e2) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d2), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d2), 0) AS max_deg
        |  UNION ALL
        |  SELECT 3 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d3) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e3) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d3), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d3), 0) AS max_deg
        |  UNION ALL
        |  SELECT 4 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d4) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e4) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d4), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d4), 0) AS max_deg
        |  UNION ALL
        |  SELECT 5 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d5) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e5) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d5), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d5), 0) AS max_deg
        |  UNION ALL
        |  SELECT 6 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d6) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e6) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d6), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d6), 0) AS max_deg
        |)
        |SELECT round, n_nodes, n_edges, min_deg, max_deg,
        |       (SELECT CAST(k AS INT) FROM kk) AS k
        |FROM stats ORDER BY round""".stripMargin,

    "q203_basket_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |nn AS (SELECT COUNT(DISTINCT oid) AS n_orders FROM it),
        |isup AS (SELECT item, COUNT(*) AS s_i FROM it GROUP BY 1),
        |pr AS (SELECT a.item AS i1, b.item AS i2, COUNT(*) AS s_ab
        |       FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dirs AS (SELECT i1 AS antecedent, i2 AS consequent, s_ab FROM pr
        |         UNION ALL
        |         SELECT i2 AS antecedent, i1 AS consequent, s_ab FROM pr),
        |j AS (SELECT d.antecedent, d.consequent, d.s_ab,
        |        sa.s_i AS s_a, sc.s_i AS s_c, nn.n_orders
        |      FROM dirs d
        |      JOIN isup sa ON d.antecedent = sa.item
        |      JOIN isup sc ON d.consequent = sc.item, nn)
        |SELECT antecedent, consequent,
        |       CAST(s_ab AS BIGINT) AS pair_supp,
        |       CAST(s_a AS BIGINT) AS ante_supp,
        |       CAST(s_c AS BIGINT) AS cons_supp,
        |       CAST(s_ab * 1000000 // s_a AS BIGINT) AS conf_ppm,
        |       CAST(CAST(s_ab AS HUGEINT) * n_orders * 1000000 //
        |            (CAST(s_a AS HUGEINT) * s_c) AS BIGINT) AS lift_ppm
        |FROM j
        |ORDER BY lift_ppm DESC, antecedent, consequent
        |LIMIT 25""".stripMargin,

    // Waterfilling: sorted-desc prefix state, the sequential cap test on
    // the maximal all-true prefix, then two scalar aggregates set the
    // water level.
    "q204_token_budget" ->
      """WITH n2 AS (SELECT source,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |c AS (SELECT source, SUM(len(string_split(t, ' '))) AS tokens
        |      FROM n2 GROUP BY 1),
        |tt AS (SELECT CAST(SUM(tokens) AS HUGEINT) AS totc FROM c),
        |r AS (SELECT source, CAST(tokens AS HUGEINT) AS tokens, totc,
        |        totc * 50 // 100 AS b,
        |        (totc * 50 // 100) * 30 // 100 AS cap,
        |        row_number() OVER (ORDER BY tokens DESC, source) AS rk,
        |        SUM(CAST(tokens AS HUGEINT)) OVER (
        |          ORDER BY tokens DESC, source
        |          ROWS UNBOUNDED PRECEDING) AS pref
        |      FROM c, tt),
        |ct AS (SELECT *, CASE WHEN (b - (rk-1)*cap) * tokens
        |                        > cap * (totc - (pref - tokens))
        |                 THEN 1 ELSE 0 END AS cap_test FROM r),
        |cp AS (SELECT *, CASE WHEN min(cap_test) OVER (
        |          ORDER BY tokens DESC, source ROWS UNBOUNDED PRECEDING) = 1
        |        THEN 1 ELSE 0 END AS capped FROM ct),
        |sel AS (SELECT SUM(capped) AS jstar,
        |          COALESCE(SUM(CASE WHEN capped = 1 THEN tokens END), 0)
        |            AS cap_pref
        |        FROM cp),
        |f AS (SELECT cp.*, sel.jstar, sel.cap_pref,
        |        cp.b - sel.jstar * cp.cap AS rem,
        |        cp.totc - sel.cap_pref AS restc
        |      FROM cp, sel)
        |SELECT source, CAST(tokens AS BIGINT) AS tokens,
        |       CAST(CASE WHEN capped = 1 THEN cap
        |            ELSE tokens * rem // greatest(restc, 1) END AS BIGINT)
        |         AS alloc_tokens,
        |       CAST(capped AS INT) AS capped,
        |       CAST(CASE WHEN capped = 1 THEN cap
        |              ELSE tokens * rem // greatest(restc, 1) END
        |            * 1000000 // tokens AS BIGINT) AS epochs_ppm
        |FROM f ORDER BY tokens DESC, source""".stripMargin,

    "q205_curriculum_bins" ->
      """WITH n2 AS (SELECT source, doc_id,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |tk AS (SELECT source, doc_id, unnest(string_split(t, ' ')) AS w
        |       FROM n2),
        |st AS (SELECT source, doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CASE WHEN w IN ('the','a','of','and','to','in')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |       FROM tk GROUP BY 1, 2),
        |sc AS (SELECT source, doc_id, n_tokens,
        |         n_stop * 1000000 // greatest(n_tokens, 1) AS score_ppm
        |       FROM st),
        |b AS (SELECT source, n_tokens, score_ppm,
        |        ntile(4) OVER (PARTITION BY source
        |                       ORDER BY score_ppm DESC, doc_id) AS bin
        |      FROM sc)
        |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
        |       CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm
        |FROM b GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    "q206_pmi_collocations" ->
      """WITH n2 AS (SELECT doc_id,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |tkl AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n2),
        |bg AS (SELECT toks[g] || ' ' || toks[g+1] AS pair
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g
        |             FROM tkl) z),
        |tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_bg FROM bg),
        |pc AS (SELECT pair, COUNT(*) AS c_ab FROM bg GROUP BY 1
        |       HAVING COUNT(*) >= 5),
        |uni AS (SELECT w, COUNT(*) AS c_w
        |        FROM (SELECT unnest(string_split(t, ' ')) AS w FROM n2) q
        |        GROUP BY 1),
        |j AS (SELECT string_split(pc.pair, ' ')[1] AS w1,
        |        string_split(pc.pair, ' ')[2] AS w2, pc.c_ab, tb.t_bg
        |      FROM pc, tb),
        |f AS (SELECT j.w1, j.w2, j.c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
        |        CAST(round(ln(CAST(j.c_ab AS DOUBLE) * j.t_bg
        |          / ua.c_w / ub.c_w) * 1e6, 0) AS BIGINT) AS pmi_micro
        |      FROM j JOIN uni ua ON j.w1 = ua.w
        |             JOIN uni ub ON j.w2 = ub.w)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS pair_n,
        |       CAST(c_a AS BIGINT) AS w1_n, CAST(c_b AS BIGINT) AS w2_n,
        |       pmi_micro
        |FROM f ORDER BY pmi_micro DESC, w1, w2 LIMIT 25""".stripMargin,

    // 10 PK + 7 FK legs; anti-join semantics via NOT EXISTS (a parent
    // with duplicate keys must not multiply the child count).
    "q207_constraint_audit" ->
      """WITH legs AS (
        |  SELECT 'pk_region' AS constraint_name, 'pk' AS kind,
        |    (SELECT COUNT(*) FROM region) AS n_rows,
        |    (SELECT COUNT(*) - COUNT(DISTINCT r_regionkey) FROM region)
        |      AS n_violations
        |  UNION ALL SELECT 'pk_nation', 'pk',
        |    (SELECT COUNT(*) FROM nation),
        |    (SELECT COUNT(*) - COUNT(DISTINCT n_nationkey) FROM nation)
        |  UNION ALL SELECT 'pk_customer', 'pk',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
        |  UNION ALL SELECT 'pk_supplier', 'pk',
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier)
        |  UNION ALL SELECT 'pk_part', 'pk',
        |    (SELECT COUNT(*) FROM part),
        |    (SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part)
        |  UNION ALL SELECT 'pk_orders', 'pk',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL SELECT 'pk_lineitem', 'pk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |     FROM lineitem)
        |  UNION ALL SELECT 'pk_events', 'pk',
        |    (SELECT COUNT(*) FROM events),
        |    (SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events)
        |  UNION ALL SELECT 'pk_documents', 'pk',
        |    (SELECT COUNT(*) FROM documents),
        |    (SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
        |  UNION ALL SELECT 'pk_embeddings', 'pk',
        |    (SELECT COUNT(*) FROM embeddings),
        |    (SELECT COUNT(*) - COUNT(DISTINCT vec_id) FROM embeddings)
        |  UNION ALL SELECT 'fk_lineitem_orders', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'fk_lineitem_part', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL SELECT 'fk_lineitem_supplier', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL SELECT 'fk_orders_customer', 'fk',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'fk_customer_nation', 'fk',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |  UNION ALL SELECT 'fk_supplier_nation', 'fk',
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        |  UNION ALL SELECT 'fk_nation_region', 'fk',
        |    (SELECT COUNT(*) FROM nation),
        |    (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)))
        |SELECT constraint_name, kind, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(n_violations * 1000000 // greatest(n_rows, 1) AS BIGINT)
        |         AS violation_ppm
        |FROM legs ORDER BY constraint_name""".stripMargin,

    "q208_pct_normalize" ->
      """WITH n2 AS (SELECT source, doc_id,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |tk AS (SELECT source, doc_id, unnest(string_split(t, ' ')) AS w
        |       FROM n2),
        |st AS (SELECT source, doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CASE WHEN w IN ('the','a','of','and','to','in')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |       FROM tk GROUP BY 1, 2),
        |sc AS (SELECT source, doc_id,
        |         n_stop * 1000000 // greatest(n_tokens, 1) AS score_ppm
        |       FROM st),
        |r AS (SELECT source, doc_id, score_ppm,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY score_ppm DESC, doc_id) AS rk,
        |        COUNT(*) OVER (PARTITION BY source) AS n
        |      FROM sc)
        |SELECT source, doc_id, CAST(score_ppm AS BIGINT) AS score_ppm,
        |       CAST((rk - 1) * 1000000 // greatest(n - 1, 1) AS BIGINT)
        |         AS pct_ppm
        |FROM r ORDER BY source, doc_id""".stripMargin,

    // Flat recompute — the Spark side merges two partial-aggregate
    // states, so a green row proves the merge identity.
    "q209_incremental_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT))
        |            AS DOUBLE)/100.0 AS revenue,
        |       MAX(CAST(o_orderdate AS DATE)) AS last_order
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q210_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey,
        |       CAST(COUNT(*) AS BIGINT) AS class_size,
        |       CASE WHEN COUNT(*) >= 5 THEN 1 ELSE 0 END AS is_k_anonymous
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q211_rfm_segments" ->
      """WITH per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS lastd,
        |               COUNT(*) AS freq,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |a AS (SELECT MAX(lastd) AS anchor FROM per),
        |j AS (SELECT per.o_custkey, per.freq, per.cents, c.c_mktsegment,
        |        datediff('day', per.lastd, a.anchor) AS recency_days
        |      FROM per JOIN customer c ON per.o_custkey = c.c_custkey, a),
        |s AS (SELECT *,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY recency_days, o_custkey) AS r,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY freq DESC, o_custkey) AS f,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY cents DESC, o_custkey) AS m
        |      FROM j)
        |SELECT o_custkey, c_mktsegment,
        |       CAST(recency_days AS BIGINT) AS recency_days,
        |       CAST(freq AS BIGINT) AS n_orders,
        |       CAST(cents AS DOUBLE)/100.0 AS revenue,
        |       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
        |       CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
        |            WHEN f >= 4 THEN 'loyal'
        |            WHEN m >= 4 THEN 'big_spender'
        |            WHEN r <= 2 AND f <= 2 THEN 'hibernating'
        |            WHEN r <= 2 THEN 'at_risk'
        |            ELSE 'regular' END AS segment
        |FROM s ORDER BY o_custkey""".stripMargin,

    // CUSUM linearized: S⁺_t = P_t − min(0, min_{j≤t} P_j) turns Page's
    // max(0, ·) recursion into two prefix windows; all integer cents.
    "q212_cusum_shift" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |m AS (SELECT priority, CAST(SUM(px) // COUNT(*) AS BIGINT) AS mu
         |      FROM d GROUP BY 1),
         |j AS (SELECT d.priority, d.day, d.px, m.mu,
         |             m.mu // 50 AS k, m.mu // 2 AS h
         |      FROM d JOIN m ON d.priority = m.priority),
         |p AS (SELECT *, CAST(SUM(px - mu - k) OVER w AS BIGINT) AS p_up,
         |               CAST(SUM(mu - px - k) OVER w AS BIGINT) AS p_dn
         |      FROM j WINDOW w AS (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT *, p_up - least(0, MIN(p_up) OVER w) AS s_up,
         |               p_dn - least(0, MIN(p_dn) OVER w) AS s_dn
         |      FROM p WINDOW w AS (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT priority, day, px, mu, s_up, s_dn,
         |       CASE WHEN s_up > h THEN 1 ELSE 0 END AS alarm_up,
         |       CASE WHEN s_dn > h THEN 1 ELSE 0 END AS alarm_dn
         |FROM s ORDER BY priority, day""".stripMargin,

    // Interpolation via the nonneg weighted-sum form so the floor
    // division never sees a negative numerator (engines disagree there).
    "q213_gap_fill" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |b AS (SELECT priority, MIN(day) AS d0, MAX(day) AS d1
         |      FROM d GROUP BY 1),
         |sp AS (SELECT priority,
         |         CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |           AS day
         |       FROM b),
         |j AS (SELECT sp.priority, sp.day, d.px
         |      FROM sp LEFT JOIN d ON d.priority = sp.priority
         |                         AND d.day = sp.day),
         |f AS (SELECT priority, day, px,
         |        last_value(px IGNORE NULLS) OVER wb AS prev_px,
         |        last_value(CASE WHEN px IS NOT NULL THEN day END IGNORE NULLS)
         |          OVER wb AS prev_d,
         |        first_value(px IGNORE NULLS) OVER wf AS next_px,
         |        first_value(CASE WHEN px IS NOT NULL THEN day END IGNORE NULLS)
         |          OVER wf AS next_d
         |      FROM j
         |      WINDOW wb AS (PARTITION BY priority ORDER BY day
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             wf AS (PARTITION BY priority ORDER BY day
         |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT priority, day,
         |       CASE WHEN px IS NOT NULL THEN px
         |            ELSE (prev_px * date_diff('day', day, next_d)
         |                  + next_px * date_diff('day', prev_d, day))
         |                 // date_diff('day', prev_d, next_d) END AS px_filled,
         |       CASE WHEN px IS NOT NULL THEN 1 ELSE 0 END AS is_observed
         |FROM f ORDER BY priority, day""".stripMargin,

    // The q120 session CTEs, classified by a first-match-wins LIKE
    // cascade (no event-type name is a substring of another).
    "q214_session_patterns" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |  FROM sess GROUP BY user_id, session_id),
        |c AS (SELECT CASE WHEN path LIKE '%view%purchase%' THEN 'view_to_purchase'
        |                  WHEN path LIKE '%purchase%' THEN 'blind_purchase'
        |                  WHEN path LIKE '%error' THEN 'error_exit'
        |                  WHEN n_events = 1 THEN 'bounce'
        |                  WHEN n_events >= 5 THEN 'engaged_browse'
        |                  ELSE 'browse' END AS class,
        |             n_events
        |      FROM paths)
        |SELECT class, COUNT(*) AS n_sessions,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events_total,
        |       CAST(SUM(n_events) * 1000000 // COUNT(*) AS BIGINT)
        |         AS avg_events_ppm
        |FROM c GROUP BY 1 ORDER BY class""".stripMargin,

    // Spearman with DETERMINISTIC tie-break ranks (value, custkey) on
    // both axes, so the no-ties identity is exact on both engines; the
    // floor division's numerator is nonnegative by construction.
    "q215_spearman_segments" ->
      """WITH rev AS (SELECT o_custkey,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, o_custkey, CAST(cents AS BIGINT) AS cents,
        |             CAST(round(c_acctbal*100,0) AS BIGINT) AS bal
        |      FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY bal, o_custkey) AS rx,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY cents, o_custkey) AS ry
        |      FROM j),
        |g AS (SELECT c_mktsegment, COUNT(*) AS n,
        |             SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS sd2
        |      FROM r GROUP BY 1 HAVING COUNT(*) > 1)
        |SELECT c_mktsegment, CAST(n AS INT) AS n_cust,
        |       CAST(sd2 AS BIGINT) AS sum_d2,
        |       CAST(1000000 - 6 * sd2 * 1000000
        |            // (CAST(n AS HUGEINT) * (n*n - 1)) AS BIGINT) AS rho_ppm,
        |       CAST(CAST(1000000 - 6 * sd2 * 1000000
        |            // (CAST(n AS HUGEINT) * (n*n - 1)) AS BIGINT) AS DOUBLE)/1e6
        |         AS rho
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    // Sum over DISTINCT powers of two IS bitwise OR; decode by integer
    // div/mod so neither engine's bit functions are load-bearing.
    "q216_event_combos" ->
      """WITH b AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', ts) AS DATE) AS wk,
        |             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |                  WHEN 'view' THEN 16
        |                  ELSE CAST(error('unknown event_type') AS BIGINT)
        |             END AS bv
        |           FROM events),
        |m AS (SELECT user_id, wk, CAST(SUM(bv) AS BIGINT) AS mask
        |      FROM b GROUP BY 1, 2),
        |c AS (SELECT mask, COUNT(*) AS n_user_weeks FROM m GROUP BY 1)
        |SELECT CAST(mask AS INT) AS mask,
        |       CAST((mask // 1) % 2 + (mask // 2) % 2 + (mask // 4) % 2
        |            + (mask // 8) % 2 + (mask // 16) % 2 AS INT) AS n_types,
        |       concat_ws('+',
        |         CASE WHEN (mask // 1) % 2 = 1 THEN 'click' END,
        |         CASE WHEN (mask // 2) % 2 = 1 THEN 'error' END,
        |         CASE WHEN (mask // 4) % 2 = 1 THEN 'purchase' END,
        |         CASE WHEN (mask // 8) % 2 = 1 THEN 'signup' END,
        |         CASE WHEN (mask // 16) % 2 = 1 THEN 'view' END) AS combo,
        |       n_user_weeks
        |FROM c ORDER BY mask""".stripMargin,

    // AprioriAll level 2: first-purchase collapse, support prune BEFORE
    // the per-customer ordered pair join, confidence in floor ppm.
    "q217_sequential_rules" ->
      """WITH f AS (SELECT o_custkey, l_partkey,
        |             MIN(CAST(o_orderdate AS DATE)) AS first_d
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           GROUP BY 1, 2),
        |fr AS (SELECT l_partkey, COUNT(*) AS n_cust_part
        |       FROM f GROUP BY 1 HAVING COUNT(*) >= 5),
        |p AS (SELECT f.o_custkey, f.l_partkey, f.first_d, fr.n_cust_part
        |      FROM f JOIN fr ON f.l_partkey = fr.l_partkey),
        |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |              COUNT(*) AS n_cust, MAX(a.n_cust_part) AS n_ante
        |       FROM p a JOIN p b ON a.o_custkey = b.o_custkey
        |                        AND a.first_d < b.first_d
        |       GROUP BY 1, 2)
        |SELECT part_a, part_b, CAST(n_cust AS BIGINT) AS n_cust,
        |       CAST(n_ante AS BIGINT) AS n_ante,
        |       CAST(n_cust * 1000000 // n_ante AS BIGINT) AS conf_ppm
        |FROM pr ORDER BY n_cust DESC, part_a, part_b
        |LIMIT 25""".stripMargin,

    // Product-limit survival in integer micro-nats: each ln factor
    // quantized once (the q181 contract); running risk/log-survival
    // restated as plain prefix windows (the Spark side rides PrefixSum).
    "q218_kaplan_meier" ->
      """WITH per AS (SELECT o_custkey,
        |               MIN(year(o_orderdate)*12 + month(o_orderdate)) AS m0,
        |               MAX(year(o_orderdate)*12 + month(o_orderdate)) AS m1
        |             FROM orders GROUP BY 1),
        |a AS (SELECT MAX(m1) AS mmax FROM per),
        |h AS (SELECT m1 - m0 AS t, COUNT(*) AS n_at_t,
        |             CAST(SUM(CASE WHEN m1 >= a.mmax - 3 THEN 0 ELSE 1 END)
        |               AS BIGINT) AS d
        |      FROM per, a GROUP BY 1, a.mmax),
        |r AS (SELECT *, CAST(SUM(n_at_t) OVER (ORDER BY t DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS n_risk
        |      FROM h),
        |s AS (SELECT *, CAST(ROUND(ln(greatest(n_risk - d, 1)) * 1000000, 0)
        |          AS BIGINT)
        |        - CAST(ROUND(ln(n_risk) * 1000000, 0) AS BIGINT) AS term
        |      FROM r)
        |SELECT CAST(t AS INT) AS t_months, n_risk,
        |       CAST(n_at_t AS BIGINT) AS n_at_t, d AS n_churn,
        |       CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
        |       CAST(SUM(term) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS log_surv_micro
        |FROM s ORDER BY t_months""".stripMargin,

    // 80/20 affine hash split; eval docs colliding with ANY train band
    // bucket (the q34 LSH signatures) are evicted via NOT EXISTS.
    "q219_eval_split" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |tr AS (SELECT DISTINCT band, band_hash FROM bh
         |       WHERE $bucketExpr < 80),
         |lk AS (SELECT DISTINCT doc_id FROM bh
         |       JOIN tr ON bh.band = tr.band AND bh.band_hash = tr.band_hash
         |       WHERE $bucketExpr >= 80)
         |SELECT doc_id, lang, source, n_chars
         |FROM documents
         |WHERE $bucketExpr >= 80
         |  AND NOT EXISTS (SELECT 1 FROM lk WHERE lk.doc_id = documents.doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Hybrid lexical+dense RRF: the q186 BM25 chain run query-by-example
    // (query docs' own DISTINCT terms, self-hit excluded, top-10) fused
    // with the q37 dense brute top-5 by the q189 integer micro-unit RRF.
    "q220_hybrid_rrf" -> hybridRrfSql,

    // SemDeDup: sign-LSH buckets (the q38 plane literals), within-bucket
    // 4-dp cosine pairs at 0.40, q47-style reachability components,
    // most-central survivor (max Σ pair cosines e4, ties to smallest id).
    "q221_semantic_dedup" ->
      s"""WITH RECURSIVE $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |       FROM bk a JOIN bk b
         |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT * FROM pr WHERE cos >= 0.40),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label
         |  FROM reach r JOIN edges e ON e.src = r.node),
         |mem AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
         |cent AS (SELECT node, CAST(SUM(c) AS BIGINT) AS cent_e4 FROM (
         |    SELECT id_a AS node, CAST(round(cos*10000, 0) AS BIGINT) AS c
         |    FROM pairs
         |    UNION ALL
         |    SELECT id_b, CAST(round(cos*10000, 0) AS BIGINT) FROM pairs) z
         |  GROUP BY node),
         |j AS (SELECT m.cluster_id, m.node, c.cent_e4
         |      FROM mem m JOIN cent c ON m.node = c.node),
         |r AS (SELECT cluster_id, node, cent_e4,
         |             row_number() OVER (PARTITION BY cluster_id
         |               ORDER BY cent_e4 DESC, node) AS rk
         |      FROM j)
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       MIN(CASE WHEN rk = 1 THEN node END) AS kept_vec,
         |       MIN(CASE WHEN rk = 1 THEN cent_e4 END) AS kept_cent_e4,
         |       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
         |FROM r GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,

    // Frozen-weight classifier: the q131 signed-hash bucket counts scored
    // by the literal integer matrix W(c,b) = ((37c+11b+5) mod 17) - 8;
    // argmax ties to the smallest class id, margin = winner - runner-up.
    "q222_quality_classifier" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |sc AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT *,
         |        CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |             WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |      FROM sc)
         |SELECT doc_id, logit_0, logit_1, logit_2,
         |       CAST(predicted AS INT) AS predicted,
         |       CAST(CASE predicted
         |            WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |            WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |            ELSE logit_2 - greatest(logit_0, logit_1) END
         |         AS BIGINT) AS margin
         |FROM p ORDER BY doc_id""".stripMargin,

    // Per-node coreness: the h-index iteration unrolled to the same 24
    // fixed rounds the Spark side runs (fixpoint certified by the
    // c24 = c23 comparison) over the support-2 co-purchase graph.
    "q223_coreness" -> corenessSql,

    // Frozen-weight reranker: the q220 fused candidates rescored by the
    // low-rank bilinear form (P·q)·(P·d), P = the 4x64 embedWeight
    // integer matrix as literal DOUBLE[] rows; 4-dp rounded ranking key.
    "q224_rerank" ->
      s"""WITH f AS (SELECT query_id, rank AS rrf_rank, neighbor_id
         |           FROM ($hybridRrfSql) zf),
         |$embCte,
         |pj AS (SELECT vec_id,
         |         list_dot_product(emb, ${wLit(0)}::DOUBLE[]) AS p0,
         |         list_dot_product(emb, ${wLit(1)}::DOUBLE[]) AS p1,
         |         list_dot_product(emb, ${wLit(2)}::DOUBLE[]) AS p2,
         |         list_dot_product(emb, ${wLit(3)}::DOUBLE[]) AS p3
         |       FROM nm),
         |s AS (SELECT f.query_id, f.rrf_rank, f.neighbor_id,
         |        ROUND(q.p0*d.p0 + q.p1*d.p1 + q.p2*d.p2 + q.p3*d.p3, 4)
         |          AS rerank_score
         |      FROM f JOIN pj q ON q.vec_id = f.query_id
         |             LEFT JOIN pj d ON d.vec_id = f.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rerank_score DESC NULLS LAST, neighbor_id) AS rr
         |      FROM s)
         |SELECT query_id, CAST(rr AS INT) AS rerank_rank, neighbor_id,
         |       rerank_score, CAST(rrf_rank AS INT) AS rrf_rank
         |FROM r ORDER BY query_id, rerank_rank""".stripMargin,

    // Personalized PageRank: 3 unrolled damped rounds, teleport mass
    // only on the seed brand's parts, per-edge floor division exactly
    // as the operator; top 25 non-seed parts.
    "q225_brand_ppr" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey,
        |         l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM it a JOIN it b ON a.okey = b.okey AND a.p < b.p),
        |ud AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM ud GROUP BY u),
        |sd AS (SELECT p_partkey AS u FROM part WHERE p_brand = 'Brand#13'),
        |base AS MATERIALIZED (SELECT deg.u,
        |         CASE WHEN sd.u IS NULL THEN 0 ELSE 1 END AS is_seed
        |       FROM deg LEFT JOIN sd ON deg.u = sd.u),
        |r0 AS MATERIALIZED (SELECT u, CAST(is_seed AS BIGINT) * 1000000000000 AS r
        |  FROM base),
        |r1 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r0.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r0 ON ud.u = r0.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u),
        |r2 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r1.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r1 ON ud.u = r1.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u),
        |r3 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r2.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r2 ON ud.u = r2.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u)
        |SELECT CAST(b.u AS BIGINT) AS part, CAST(deg.deg AS BIGINT) AS degree,
        |       CAST(r3.r AS BIGINT) AS rank_units
        |FROM base b JOIN deg ON b.u = deg.u JOIN r3 ON b.u = r3.u
        |WHERE b.is_seed = 0
        |ORDER BY rank_units DESC, part
        |LIMIT 25""".stripMargin,

    // Silhouette: unit vectors quantized once to integer e6 components,
    // label sum vectors, linear mean-similarity identity, sign-split
    // floor divisions throughout (round toward zero on both engines).
    "q226_silhouette" ->
      s"""WITH $embCte,
         |ux AS (SELECT vec_id, label, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm
         |       FROM nm WHERE nrm > 0),
         |u6 AS (SELECT vec_id, label, i,
         |         CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6 FROM ux),
         |sums AS (SELECT label AS l2, i, CAST(SUM(xe6) AS BIGINT) AS s
         |         FROM u6 GROUP BY 1, 2),
         |nl AS (SELECT label AS l2, COUNT(*) AS n_l
         |       FROM nm WHERE nrm > 0 GROUP BY 1),
         |sdot AS (SELECT vec_id, CAST(SUM(xe6*xe6) AS BIGINT) AS sd
         |         FROM u6 GROUP BY 1),
         |dots AS (SELECT u6.vec_id, u6.label, sums.l2,
         |           CAST(SUM(u6.xe6 * sums.s) AS BIGINT) AS dot
         |         FROM u6 JOIN sums ON u6.i = sums.i GROUP BY 1, 2, 3),
         |m AS (SELECT d.vec_id, d.label, d.l2,
         |        CASE WHEN d.label = d.l2 THEN d.dot - sdot.sd
         |             ELSE d.dot END AS num,
         |        CASE WHEN d.label = d.l2 THEN greatest(nl.n_l - 1, 1)
         |             ELSE nl.n_l END AS den
         |      FROM dots d JOIN sdot ON d.vec_id = sdot.vec_id
         |                  JOIN nl ON d.l2 = nl.l2),
         |me AS (SELECT vec_id, label, l2,
         |         CASE WHEN num >= 0 THEN num // den
         |              ELSE -((-num) // den) END AS mean_e12 FROM m),
         |ab AS (SELECT vec_id, label,
         |         MAX(CASE WHEN label = l2 THEN mean_e12 END) AS a_e12,
         |         MAX(CASE WHEN label <> l2 THEN mean_e12 END) AS b_e12
         |       FROM me GROUP BY 1, 2),
         |sil AS (SELECT vec_id, label, a_e12, b_e12,
         |          greatest(1000000000000 - a_e12, 1000000000000 - b_e12, 1)
         |            AS d
         |        FROM ab),
         |sp AS (SELECT vec_id, label,
         |         CASE WHEN a_e12 >= b_e12
         |              THEN CAST((a_e12 - b_e12) * 1000000 // d AS BIGINT)
         |              ELSE -CAST((b_e12 - a_e12) * 1000000 // d AS BIGINT)
         |         END AS s_ppm
         |       FROM sil),
         |g AS (SELECT label, COUNT(*) AS n_vecs,
         |             CAST(SUM(s_ppm) AS BIGINT) AS ssum,
         |             CAST(SUM(CASE WHEN s_ppm > 0 THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_well_placed
         |      FROM sp GROUP BY label)
         |SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
         |       CASE WHEN ssum >= 0 THEN ssum // n_vecs
         |            ELSE -((-ssum) // n_vecs) END AS mean_sil_ppm,
         |       n_well_placed
         |FROM g ORDER BY label""".stripMargin,

    // Product quantization: unit vectors in e6 integers, 32 subspaces
    // of 2 dims, 64-entry codebooks seeded from vec_id 0..63 and
    // refined by ONE Lloyd step (sign-split floor-mean recenter), codes
    // by exact integer argmin distance (ties to smallest id), ADC
    // scores = sums of LUT integer dots; exact float top-5 feeds the
    // recall flag (measured 0.78 at sf0.01).
    "q227_pq_topk" -> pqTopKSql,

    // MMR diversified top-k: five unrolled greedy rounds (generated).
    "q228_mmr_topk" -> mmrSql,

    // Per-node local clustering over the support-2 co-purchase graph:
    // the q142 oriented census with each surviving triangle exploded to
    // its three members before a node-keyed count; exact floor ppm.
    "q229_local_clustering" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
        |         l_partkey AS item FROM lineitem),
        |e AS MATERIALIZED (SELECT a.item AS u, b.item AS v
        |  FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
        |  GROUP BY node),
        |o AS (SELECT
        |        CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v
        |        END AS s,
        |        CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u
        |        END AS t
        |      FROM e JOIN deg du ON e.u = du.node
        |             JOIN deg dv ON e.v = dv.node),
        |tri AS (SELECT o1.s AS s, o1.t AS u, o2.t AS v
        |        FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
        |        WHERE EXISTS (SELECT 1 FROM e
        |                      WHERE e.u = o1.t AND e.v = o2.t)),
        |pn AS (SELECT node, COUNT(*) AS t FROM (
        |    SELECT s AS node FROM tri UNION ALL SELECT u FROM tri
        |    UNION ALL SELECT v FROM tri) z GROUP BY node)
        |SELECT CAST(deg.node AS BIGINT) AS part,
        |       CAST(deg.deg AS BIGINT) AS degree,
        |       CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN deg.deg < 2 THEN 0
        |            ELSE 2 * COALESCE(pn.t, 0) * 1000000
        |                 // (deg.deg * (deg.deg - 1)) END AS BIGINT)
        |         AS lcc_ppm
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY part""".stripMargin,

    // Embedding-space source similarity: per-source unit-vector sums in
    // exact e6 integers, pairwise centroid cosine from exact integer
    // dots/norms, one double division rounded to 4 dp.
    "q230_source_emb_sim" ->
      s"""WITH $embCte,
         |sj AS (SELECT d.source AS g, nm.vec_id, nm.emb, nm.nrm
         |       FROM nm JOIN documents d ON nm.vec_id = d.doc_id
         |       WHERE nm.nrm > 0),
         |ux AS (SELECT g, vec_id, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm FROM sj),
         |u6 AS (SELECT g, i,
         |         CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6
         |       FROM ux),
         |sums AS (SELECT g, i, CAST(SUM(xe6) AS BIGINT) AS s
         |         FROM u6 GROUP BY 1, 2),
         |nc AS (SELECT g, COUNT(*) AS n FROM sj GROUP BY 1),
         |norms AS (SELECT g, SUM(CAST(s AS HUGEINT) * s) AS d2
         |          FROM sums GROUP BY 1),
         |p AS (SELECT a.g AS ga, b.g AS gb,
         |        SUM(CAST(a.s AS HUGEINT) * b.s) AS dot
         |      FROM sums a JOIN sums b ON a.i = b.i AND a.g < b.g
         |      GROUP BY 1, 2)
         |SELECT p.ga AS source_a, p.gb AS source_b,
         |       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
         |       ROUND(CAST(p.dot AS DOUBLE) /
         |         (sqrt(CAST(da.d2 AS DOUBLE)) * sqrt(CAST(db.d2 AS DOUBLE))),
         |         4) AS cos_centroid
         |FROM p JOIN norms da ON p.ga = da.g JOIN norms db ON p.gb = db.g
         |       JOIN nc na ON p.ga = na.g JOIN nc nb ON p.gb = nb.g
         |ORDER BY source_a, source_b""".stripMargin,

    // Per-source data card: the q28/q29/q30/q32 per-doc components
    // rolled up per source; majority language ties to the smallest
    // lang code; all rates exact floor ppm.
    "q231_source_data_card" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in')
         |                  THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id,
         |        CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                  AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |             THEN 1 ELSE 0 END AS is_quality
         |      FROM st),
         |lsc AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |        FROM tok GROUP BY doc_id),
         |lg AS (SELECT doc_id,
         |         CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |              WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |              WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |              WHEN s_fr >= s_es THEN 'fr'
         |              ELSE 'es' END AS predicted_lang
         |       FROM lsc),
         |tk AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS ws
         |       FROM n),
         |pd AS (SELECT d.source, d.doc_id, tk.ws, q.is_quality,
         |              lg.predicted_lang
         |       FROM documents d JOIN tk ON d.doc_id = tk.doc_id
         |            JOIN q ON d.doc_id = q.doc_id
         |            JOIN lg ON d.doc_id = lg.doc_id),
         |base AS (SELECT source, COUNT(*) AS n_docs,
         |                CAST(SUM(ws) AS BIGINT) AS total_tokens,
         |                CAST(SUM(is_quality) AS BIGINT) AS nq
         |         FROM pd GROUP BY 1),
         |lcnt AS (SELECT source, predicted_lang, COUNT(*) AS c
         |         FROM pd GROUP BY 1, 2),
         |ltop AS (SELECT source, predicted_lang AS top_lang, c AS top_n
         |         FROM (SELECT *, row_number() OVER (PARTITION BY source
         |                 ORDER BY c DESC, predicted_lang) AS rn FROM lcnt) z
         |         WHERE rn = 1),
         |dh AS (SELECT d.source, md5(n.t) AS h
         |       FROM documents d JOIN n ON d.doc_id = n.doc_id),
         |dg AS (SELECT source, h, COUNT(*) AS cnt FROM dh GROUP BY 1, 2),
         |dup AS (SELECT source,
         |          CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
         |            AS n_dup
         |        FROM dg GROUP BY 1)
         |SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs, b.total_tokens,
         |       b.total_tokens * 1000000 // b.n_docs AS tokens_per_doc_micro,
         |       b.nq * 1000000 // b.n_docs AS quality_ppm,
         |       dup.n_dup * 1000000 // b.n_docs AS dup_ppm,
         |       ltop.top_lang,
         |       ltop.top_n * 1000000 // b.n_docs AS top_lang_ppm
         |FROM base b JOIN ltop ON b.source = ltop.source
         |     JOIN dup ON b.source = dup.source
         |ORDER BY b.source""".stripMargin,

    // Classifier eval harness: the q222 frozen-classifier chain joined
    // against the 3-class integer rule label (fail-gate / passable /
    // stop-ratio >= 0.12 prose); full confusion-matrix rows on a 3-row
    // spine, P/R/F1 as exact floor ppm with the zero_division=0
    // convention.
    "q235_classifier_eval" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |             WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |      FROM scq),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS class
         |        FROM st),
         |cells AS (SELECT lab.class, p.predicted, COUNT(*) AS cn
         |          FROM lab JOIN p USING (doc_id) GROUP BY 1, 2),
         |spine AS (SELECT CAST(unnest(range(0, 3)) AS INT) AS class),
         |mrow AS (SELECT class,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 0), 0) AS BIGINT) AS pred_0,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 1), 0) AS BIGINT) AS pred_1,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 2), 0) AS BIGINT) AS pred_2
         |         FROM cells GROUP BY class),
         |pt AS (SELECT predicted AS class, CAST(SUM(cn) AS BIGINT) AS n_pred
         |       FROM cells GROUP BY predicted),
         |r2 AS (SELECT s.class,
         |         COALESCE(pred_0, 0) AS pred_0, COALESCE(pred_1, 0) AS pred_1,
         |         COALESCE(pred_2, 0) AS pred_2,
         |         COALESCE(pred_0, 0) + COALESCE(pred_1, 0)
         |           + COALESCE(pred_2, 0) AS n_true,
         |         COALESCE(n_pred, 0) AS n_pred
         |       FROM spine s LEFT JOIN mrow USING (class)
         |            LEFT JOIN pt USING (class)),
         |r3 AS (SELECT *, CASE class WHEN 0 THEN pred_0 WHEN 1 THEN pred_1
         |                 ELSE pred_2 END AS tp FROM r2),
         |r4 AS (SELECT *,
         |         CASE WHEN n_pred = 0 THEN 0
         |              ELSE tp*1000000//n_pred END AS precision_ppm,
         |         CASE WHEN n_true = 0 THEN 0
         |              ELSE tp*1000000//n_true END AS recall_ppm
         |       FROM r3)
         |SELECT class, pred_0, pred_1, pred_2, n_true, n_pred,
         |       CAST(tp AS BIGINT) AS tp,
         |       CAST(precision_ppm AS BIGINT) AS precision_ppm,
         |       CAST(recall_ppm AS BIGINT) AS recall_ppm,
         |       CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |            ELSE 2*precision_ppm*recall_ppm
         |                 //(precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
         |FROM r4 ORDER BY class""".stripMargin,

    // BPE encode: 6 unrolled merge rounds over the word vocabulary
    // (generated — see bpeSql).
    "q232_bpe_encode" -> bpeSql,

    // IVFADC: the q49 IVF centroid probe restricting the q227 PQ ADC
    // scoring to each query's 2 nearest cells; full-corpus exact top-5
    // recall flag.
    "q233_ivf_pq_topk" -> ivfAdcSql,

    // Incremental semantic dedup: even-id persisted state, odd-id
    // batch; q221's buckets + 4-dp verified cosine, batch-side probes
    // only, keep-first within the batch.
    "q234_semantic_dedup_incr" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |sts AS (SELECT * FROM bk WHERE vec_id % 2 = 0),
         |bat AS (SELECT * FROM bk WHERE vec_id % 2 = 1),
         |sb AS (SELECT * FROM (
         |    SELECT b.vec_id AS vid, s.vec_id AS other,
         |           ROUND(list_dot_product(b.emb, s.emb)/(b.nrm*s.nrm), 4) AS cos,
         |           1 AS from_state
         |    FROM bat b JOIN sts s ON b.bucket = s.bucket) z
         |  WHERE cos >= 0.40),
         |bb AS (SELECT * FROM (
         |    SELECT b.vec_id AS vid, o.vec_id AS other,
         |           ROUND(list_dot_product(b.emb, o.emb)/(b.nrm*o.nrm), 4) AS cos,
         |           0 AS from_state
         |    FROM bat b JOIN bat o ON b.bucket = o.bucket
         |                         AND o.vec_id < b.vec_id) z
         |  WHERE cos >= 0.40),
         |m AS (SELECT vid, other, CAST(round(cos*10000, 0) AS BIGINT) AS cos_e4,
         |             from_state
         |      FROM sb
         |      UNION ALL
         |      SELECT vid, other, CAST(round(cos*10000, 0) AS BIGINT), from_state
         |      FROM bb),
         |ag AS (SELECT vid, CAST(SUM(from_state) AS BIGINT) AS n_dup_state,
         |              CAST(SUM(1 - from_state) AS BIGINT) AS n_dup_batch
         |       FROM m GROUP BY vid),
         |best AS (SELECT vid, other AS best_match, cos_e4 AS best_cos_e4 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vid
         |      ORDER BY cos_e4 DESC, other) AS rn FROM m) z
         |  WHERE rn = 1)
         |SELECT b.vec_id,
         |       COALESCE(ag.n_dup_state, 0) AS n_dup_state,
         |       COALESCE(ag.n_dup_batch, 0) AS n_dup_batch,
         |       best.best_match, best.best_cos_e4,
         |       CAST(CASE WHEN best.vid IS NULL THEN 0 ELSE 1 END AS INT)
         |         AS dropped
         |FROM bat b LEFT JOIN ag ON ag.vid = b.vec_id
         |     LEFT JOIN best ON best.vid = b.vec_id
         |ORDER BY vec_id""".stripMargin,

    // Multi-round k-means: 4 unrolled Lloyd rounds with convergence
    // certificate (generated — see kmeansRoundsSql).
    "q236_kmeans_rounds" -> kmeansRoundsSql,

    // BPE ordered merge table: each round's argmax pair + weighted count
    // from the shared training chain.
    "q237_bpe_merge_table" ->
      (s"""WITH ${bpeChainCtes(6)}
         |""".stripMargin +
        (1 to 6).map(r =>
          s"""SELECT CAST($r AS INT) AS merge_rank, a AS left_sym,
             |       b AS right_sym, cnt AS pair_count FROM bf$r""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank")),

    // Corpus-wide BPE application: word->pieces map joined onto the
    // token stream, per-source fertility/compression rollup.
    "q238_bpe_apply_rate" ->
      s"""WITH ${bpeChainCtes(6)},
         |seg2 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
         |         FROM s6 GROUP BY w),
         |tw AS (SELECT source, w FROM (
         |    SELECT d.source,
         |           unnest(string_split(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))), ' ')) AS w
         |    FROM documents d) z
         |  WHERE w <> '')
         |SELECT tw.source,
         |       CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(CASE WHEN seg2.n_pieces IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_alpha_words,
         |       CAST(SUM(COALESCE(seg2.n_pieces, 1)) AS BIGINT) AS total_pieces,
         |       CAST(SUM(length(tw.w)) AS BIGINT) AS total_chars,
         |       CAST(SUM(COALESCE(seg2.n_pieces, 1)) * 1000000
         |            // COUNT(*) AS BIGINT) AS pieces_per_word_micro,
         |       CAST(SUM(length(tw.w)) * 1000000
         |            // SUM(COALESCE(seg2.n_pieces, 1)) AS BIGINT)
         |         AS chars_per_piece_micro
         |FROM tw LEFT JOIN seg2 USING (w)
         |GROUP BY tw.source
         |ORDER BY tw.source""".stripMargin,

    // Label spreading: 3 unrolled frontier rounds over the bucketed
    // cosine graph (generated — see labelSpreadingSql).
    "q239_label_spreading" -> labelSpreadingSql,

    // Token-budget greedy selection: exclusive running token total over
    // the (score desc, doc_id) order, kept while within half the
    // corpus's tokens; per-(source, kept) rollup.
    "q240_token_budget" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT d.doc_id, d.source,
         |         CAST(st.n_tokens AS BIGINT) AS n_tokens,
         |         st.n_stop * 1000000 // greatest(st.n_tokens, 1) AS score_ppm
         |       FROM st JOIN documents d USING (doc_id)),
         |pf AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS prefix_tokens
         |       FROM sc),
         |bu AS (SELECT SUM(n_tokens) // 2 AS budget FROM sc),
         |kp AS (SELECT pf.*, bu.budget,
         |         CAST(CASE WHEN pf.prefix_tokens + pf.n_tokens <= bu.budget
         |              THEN 1 ELSE 0 END AS INT) AS kept
         |       FROM pf CROSS JOIN bu)
         |SELECT source, kept, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         |       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
         |       CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm,
         |       CAST(MAX(budget) AS BIGINT) AS budget_tokens
         |FROM kp GROUP BY source, kept
         |ORDER BY source, kept""".stripMargin,

    // Classifier calibration: the q235 logit/rule-label chain, margin =
    // predicted logit minus runner-up, fixed-width margin bins,
    // per-bin agreement with the rule label in floor ppm.
    "q241_calibration_bins" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id, predicted,
         |        CASE predicted
         |          WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |          WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |          ELSE logit_2 - greatest(logit_0, logit_1) END AS margin
         |      FROM (SELECT *,
         |              CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |                   WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |            FROM scq) z),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS label
         |        FROM st),
         |jb AS (SELECT p.margin // 40 AS bin, p.margin,
         |         CASE WHEN p.predicted = lab.label THEN 1 ELSE 0 END AS agree
         |       FROM p JOIN lab USING (doc_id))
         |SELECT CAST(bin AS BIGINT) AS bin,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(agree) AS BIGINT) AS n_agree,
         |       CAST(SUM(agree) * 1000000 // COUNT(*) AS BIGINT) AS agree_ppm,
         |       CAST(MIN(margin) AS BIGINT) AS min_margin,
         |       CAST(MAX(margin) AS BIGINT) AS max_margin,
         |       CAST(SUM(margin) // COUNT(*) AS BIGINT) AS mean_margin
         |FROM jb GROUP BY bin
         |ORDER BY bin""".stripMargin,

    // PSI drift: token-count bins (width 16), even-id reference half vs
    // odd-id current half per source, add-one smoothing over the joint
    // bin spine, ln terms via the q196 round-e6 cross-engine idiom,
    // sum clamped >= 0 before the e6 floor division.
    "q242_psi_drift" ->
      s"""WITH $nCte,
         |tk AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id)),
         |c0 AS (SELECT source, doc_id % 2 AS half, n_tokens // 16 AS bin FROM tk),
         |cnt AS (SELECT source, half, bin, COUNT(*) AS c
         |        FROM c0 GROUP BY 1, 2, 3),
         |r AS (SELECT source, bin, c AS cr FROM cnt WHERE half = 0),
         |cu AS (SELECT source, bin, c AS cc FROM cnt WHERE half = 1),
         |sp AS (SELECT COALESCE(r.source, cu.source) AS source,
         |         COALESCE(r.bin, cu.bin) AS bin,
         |         COALESCE(cr, 0) AS cr, COALESCE(cc, 0) AS cc
         |       FROM r FULL OUTER JOIN cu
         |         ON r.source = cu.source AND r.bin = cu.bin),
         |s2 AS (SELECT *, cr + 1 AS cr1, cc + 1 AS cc1 FROM sp),
         |tt AS (SELECT source, CAST(SUM(cr) AS BIGINT) AS n_ref,
         |         CAST(SUM(cc) AS BIGINT) AS n_cur,
         |         CAST(SUM(cr1) AS BIGINT) AS nr,
         |         CAST(SUM(cc1) AS BIGINT) AS nc,
         |         COUNT(*) AS n_bins
         |       FROM s2 GROUP BY source),
         |tm AS (SELECT s2.source,
         |         cr1 * 1000000 // nr - cc1 * 1000000 // nc AS dppm,
         |         CAST(round(ln((CAST(cr1 AS DOUBLE)/nr)
         |           / (CAST(cc1 AS DOUBLE)/nc)) * 1e6, 0) AS BIGINT) AS l_e6
         |       FROM s2 JOIN tt USING (source))
         |SELECT tt.source, tt.n_ref AS n_ref_docs, tt.n_cur AS n_cur_docs,
         |       CAST(tt.n_bins AS INT) AS n_bins,
         |       CAST(greatest(0, SUM(dppm * l_e6)) // 1000000 AS BIGINT)
         |         AS psi_micro
         |FROM tm JOIN tt ON tm.source = tt.source
         |GROUP BY tt.source, tt.n_ref, tt.n_cur, tt.n_bins
         |ORDER BY tt.source""".stripMargin,

    // DSIR importance weights: hashed unigram buckets (dim 64), target
    // = lang 'en' slice, add-one-smoothed per-bucket log importance in
    // round-e6 micro-nats, per-doc token-summed weight, top-40.
    "q243_dsir_weights" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 64 AS INT) AS bucket FROM hv),
         |pd AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bw GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt
         |       FROM documents),
         |bb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS ca,
         |         CAST(SUM(CASE WHEN tgt = 1 THEN c ELSE 0 END) AS BIGINT) AS ct
         |       FROM pd JOIN dl USING (doc_id) GROUP BY bucket),
         |spn AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS bucket),
         |sp2 AS (SELECT spn.bucket, COALESCE(ca, 0) + 1 AS ca1,
         |          COALESCE(ct, 0) + 1 AS ct1
         |        FROM spn LEFT JOIN bb USING (bucket)),
         |tts AS (SELECT CAST(SUM(ca1) AS BIGINT) AS na,
         |          CAST(SUM(ct1) AS BIGINT) AS nt FROM sp2),
         |wt AS (SELECT bucket,
         |         CAST(round(ln((CAST(ct1 AS DOUBLE)/nt)
         |           / (CAST(ca1 AS DOUBLE)/na)) * 1e6, 0) AS BIGINT) AS lw
         |       FROM sp2 CROSS JOIN tts),
         |dw AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |         CAST(SUM(c * lw) AS BIGINT) AS w
         |       FROM pd JOIN wt USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id, d.source, d.lang, dw.n_tokens,
         |       dw.w AS weight_e6
         |FROM dw JOIN documents d USING (doc_id)
         |ORDER BY weight_e6 DESC, d.doc_id
         |LIMIT 40""".stripMargin,

    // LSH candidate-tier eval: band-collision candidates (the q34 cand
    // CTE) vs df-capped exact char-8-gram Jaccard ground truth at
    // thresholds 0.5/0.8; P/R/F1 floor ppm, zero_division = 0.
    "q244_lsh_candidate_eval" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |$exactJaccardCtes,
         |nc AS (SELECT COUNT(*) AS n_cand FROM cand),
         |ex5 AS (SELECT doc_a, doc_b FROM jp
         |        WHERE CAST(n_inter AS DOUBLE)/u >= 0.5),
         |ex8 AS (SELECT doc_a, doc_b FROM jp
         |        WHERE CAST(n_inter AS DOUBLE)/u >= 0.8),
         |f5 AS (SELECT CAST(500000 AS BIGINT) AS threshold_ppm,
         |         (SELECT COUNT(*) FROM ex5) AS n_exact,
         |         (SELECT n_cand FROM nc) AS n_cand,
         |         (SELECT COUNT(*) FROM ex5 JOIN cand USING (doc_a, doc_b))
         |           AS n_hit),
         |f8 AS (SELECT CAST(800000 AS BIGINT) AS threshold_ppm,
         |         (SELECT COUNT(*) FROM ex8) AS n_exact,
         |         (SELECT n_cand FROM nc) AS n_cand,
         |         (SELECT COUNT(*) FROM ex8 JOIN cand USING (doc_a, doc_b))
         |           AS n_hit),
         |fin AS (SELECT * FROM f5 UNION ALL SELECT * FROM f8),
         |mt AS (SELECT *,
         |         CASE WHEN n_cand = 0 THEN 0
         |              ELSE n_hit * 1000000 // n_cand END AS precision_ppm,
         |         CASE WHEN n_exact = 0 THEN 0
         |              ELSE n_hit * 1000000 // n_exact END AS recall_ppm
         |       FROM fin)
         |SELECT threshold_ppm, CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(n_cand AS BIGINT) AS n_cand,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       CAST(precision_ppm AS BIGINT) AS precision_ppm,
         |       CAST(recall_ppm AS BIGINT) AS recall_ppm,
         |       CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |            ELSE 2*precision_ppm*recall_ppm
         |                 //(precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
         |FROM mt ORDER BY threshold_ppm""".stripMargin,

    // Power iteration: e4-quantized embedding matrix, three unrolled
    // v <- normalize(A^T A v) rounds (all-ones e4 start), max-component
    // renormalization with sign-split floor division, cos^2 alignment
    // certificate between the last two rounds in exact ppm.
    "q245_power_iteration" ->
      """WITH qv AS (SELECT vec_id, CAST(g - 1 AS INT) AS i,
        |         CAST(ROUND(CAST(embedding[g] AS DOUBLE)*10000, 0) AS BIGINT) AS q
        |       FROM (SELECT vec_id, embedding,
        |               unnest(range(1, len(embedding)+1)) AS g
        |             FROM embeddings) z),
        |v0 AS (SELECT DISTINCT i, CAST(10000 AS BIGINT) AS v FROM qv),
        |s1 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v0 USING (i) GROUP BY vec_id),
        |w1 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s1 USING (vec_id) GROUP BY i),
        |m1 AS (SELECT MAX(abs(w)) AS m FROM w1),
        |v1 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w1 CROSS JOIN m1),
        |s2 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v1 USING (i) GROUP BY vec_id),
        |w2 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s2 USING (vec_id) GROUP BY i),
        |m2 AS (SELECT MAX(abs(w)) AS m FROM w2),
        |v2 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w2 CROSS JOIN m2),
        |s3 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v2 USING (i) GROUP BY vec_id),
        |w3 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s3 USING (vec_id) GROUP BY i),
        |m3 AS (SELECT MAX(abs(w)) AS m FROM w3),
        |v3 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w3 CROSS JOIN m3),
        |ct AS (SELECT SUM(CAST(a.v AS HUGEINT) * b.v) AS dt,
        |              SUM(CAST(b.v AS HUGEINT) * b.v) AS nv,
        |              SUM(CAST(a.v AS HUGEINT) * a.v) AS np
        |       FROM v2 a JOIN v3 b USING (i))
        |SELECT CAST(v3.i AS INT) AS dim,
        |       CAST(v2.v AS BIGINT) AS v_prev_e4,
        |       CAST(v3.v AS BIGINT) AS v_e4,
        |       CAST((dt*dt*1000000)//(nv*np) AS BIGINT) AS align_ppm
        |FROM v3 JOIN v2 USING (i) CROSS JOIN ct
        |ORDER BY dim""".stripMargin,

    // Unified retrieval eval: every ANN tier's top-3 vs the brute-force
    // true NN; MRR@3 + hit@3 in exact floor integers. Nests the four
    // tiers' own oracled SQL verbatim.
    "q246_retrieval_eval" ->
      s"""WITH b AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) z1),
         |t AS (SELECT query_id, neighbor_id AS true_nn FROM b WHERE rank = 1),
         |u AS (SELECT 'brute' AS system, query_id, neighbor_id, rank
         |        FROM b WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'lsh', query_id, neighbor_id, rank
         |        FROM ($annLshSql) z2 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'ivf', query_id, neighbor_id, rank
         |        FROM ($annIvfSql) z3 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'pq', query_id, neighbor_id, rank
         |        FROM ($pqTopKSql) z4 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'ivfadc', query_id, neighbor_id, rank
         |        FROM ($ivfAdcSql) z5 WHERE rank <= 3),
         |nq AS (SELECT COUNT(*) AS n_queries FROM t),
         |f AS (SELECT u.system, u.rank FROM u
         |      JOIN t ON u.query_id = t.query_id AND u.neighbor_id = t.true_nn),
         |g AS (SELECT system, COUNT(*) AS n_found,
         |        CAST(SUM(1000000 // rank) AS BIGINT) AS sum_rr
         |      FROM f GROUP BY system),
         |sp AS (SELECT unnest(['brute','lsh','ivf','pq','ivfadc']) AS system)
         |SELECT sp.system, CAST(nq.n_queries AS BIGINT) AS n_queries,
         |       CAST(COALESCE(g.n_found, 0) AS BIGINT) AS n_found,
         |       CAST(COALESCE(g.n_found, 0) * 1000000 // nq.n_queries
         |         AS BIGINT) AS hit_at3_ppm,
         |       CAST(COALESCE(g.sum_rr, 0) // nq.n_queries AS BIGINT) AS mrr_e6
         |FROM sp LEFT JOIN g USING (system) CROSS JOIN nq
         |ORDER BY system""".stripMargin,

    // Cluster eval: the q236 unrolled assignment vs the label column —
    // per-cluster purity + global NMI (2·MI/(Hc+Hl), round-e6 ln terms,
    // the shared N·1e6 denominator cancels; clamped >= 0).
    "q247_cluster_eval" ->
      s"""WITH ${kmeansAssignCtes(4)},
         |lb AS (SELECT DISTINCT vec_id, label FROM ku6),
         |ctg AS (SELECT a.cell, lb.label, COUNT(*) AS n
         |        FROM a4 a JOIN lb USING (vec_id) GROUP BY 1, 2),
         |rt AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS ncl FROM ctg GROUP BY cell),
         |cl AS (SELECT label, CAST(SUM(n) AS BIGINT) AS nlb FROM ctg GROUP BY label),
         |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM ctg),
         |mi AS (SELECT CAST(SUM(n * CAST(round(ln(
         |           (CAST(n AS DOUBLE) * nn) / (CAST(ncl AS DOUBLE) * nlb))
         |           * 1e6, 0) AS BIGINT)) AS HUGEINT) AS mi_num
         |       FROM ctg JOIN rt USING (cell) JOIN cl USING (label)
         |            CROSS JOIN tt),
         |hcn AS (SELECT -CAST(SUM(ncl * CAST(round(ln(
         |            CAST(ncl AS DOUBLE) / nn) * 1e6, 0) AS BIGINT))
         |          AS HUGEINT) AS hc_num
         |        FROM rt CROSS JOIN tt),
         |hln AS (SELECT -CAST(SUM(nlb * CAST(round(ln(
         |            CAST(nlb AS DOUBLE) / nn) * 1e6, 0) AS BIGINT))
         |          AS HUGEINT) AS hl_num
         |        FROM cl CROSS JOIN tt),
         |nm2 AS (SELECT CAST(CASE WHEN hc_num + hl_num = 0 THEN 0
         |          ELSE greatest(0, 2 * mi_num * 1000000
         |               // (hc_num + hl_num)) END AS BIGINT) AS nmi_ppm
         |        FROM mi CROSS JOIN hcn CROSS JOIN hln),
         |pu AS (SELECT cell, label, n,
         |         row_number() OVER (PARTITION BY cell
         |           ORDER BY n DESC, label) AS rk,
         |         SUM(n) OVER (PARTITION BY cell) AS n_members
         |       FROM ctg),
         |pr AS (SELECT cell, label AS majority_label, n AS n_majority,
         |         n_members
         |       FROM pu WHERE rk = 1)
         |SELECT CAST(cell AS INT) AS cluster,
         |       CAST(n_members AS BIGINT) AS n_members,
         |       CAST(majority_label AS INT) AS majority_label,
         |       CAST(n_majority AS BIGINT) AS n_majority,
         |       CAST(n_majority * 1000000 // n_members AS BIGINT) AS purity_ppm,
         |       nm2.nmi_ppm
         |FROM pr CROSS JOIN nm2
         |ORDER BY cluster""".stripMargin,

    // Dedup threshold sweep: the exact char-8-gram pair tier filtered
    // at 4 thresholds; drop = doc_b of any >= t pair (keep-first rule);
    // token volumes from one doc-keyed projection.
    "q248_dedup_sweep" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |$exactJaccardCtes,
         |tk AS (SELECT doc_id,
         |         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |       FROM n),
         |tot AS (SELECT COUNT(*) AS total_docs,
         |          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM tk),
         |th AS (SELECT unnest([300000, 500000, 700000, 900000]) AS threshold_ppm),
         |pp AS (SELECT th.threshold_ppm, jp.doc_a, jp.doc_b
         |       FROM th JOIN jp
         |         ON CAST(jp.n_inter AS DOUBLE)/jp.u >= th.threshold_ppm/1e6),
         |np AS (SELECT threshold_ppm, COUNT(*) AS n_pairs
         |       FROM pp GROUP BY threshold_ppm),
         |dr AS (SELECT DISTINCT threshold_ppm, doc_b AS doc_id FROM pp),
         |ds AS (SELECT threshold_ppm, COUNT(*) AS n_dropped,
         |         CAST(SUM(n_tokens) AS BIGINT) AS dropped_tokens
         |       FROM dr JOIN tk USING (doc_id) GROUP BY threshold_ppm)
         |SELECT CAST(th.threshold_ppm AS BIGINT) AS threshold_ppm,
         |       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       CAST(COALESCE(ds.n_dropped, 0) AS BIGINT) AS n_dropped,
         |       CAST(COALESCE(ds.dropped_tokens, 0) AS BIGINT) AS dropped_tokens,
         |       CAST(tot.total_docs - COALESCE(ds.n_dropped, 0) AS BIGINT)
         |         AS kept_docs,
         |       CAST(tot.total_tokens - COALESCE(ds.dropped_tokens, 0) AS BIGINT)
         |         AS kept_tokens
         |FROM th LEFT JOIN np USING (threshold_ppm)
         |     LEFT JOIN ds USING (threshold_ppm) CROSS JOIN tot
         |ORDER BY threshold_ppm""".stripMargin,

    // Quality threshold sweep: stopword-ppm score bins (width 50k),
    // cumulative keep-above volumes, token share in floor ppm.
    "q249_quality_sweep" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
         |         (n_stop * 1000000 // greatest(n_tokens, 1)) // 50000 AS bin
         |       FROM st),
         |bn AS (SELECT bin, COUNT(*) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS tokens
         |       FROM sc GROUP BY bin),
         |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM bn),
         |cm AS (SELECT a.bin, CAST(SUM(b.n_docs) AS BIGINT) AS cum_docs,
         |         CAST(SUM(b.tokens) AS BIGINT) AS cum_tokens
         |       FROM bn a JOIN bn b ON b.bin >= a.bin GROUP BY a.bin)
         |SELECT CAST(bn.bin AS BIGINT) AS bin,
         |       CAST(bn.bin * 50000 AS BIGINT) AS threshold_ppm,
         |       CAST(bn.n_docs AS BIGINT) AS n_docs, bn.tokens,
         |       cm.cum_docs, cm.cum_tokens,
         |       CAST(cm.cum_tokens * 1000000 // tot.tt AS BIGINT)
         |         AS cum_token_share_ppm
         |FROM bn JOIN cm USING (bin) CROSS JOIN tot
         |ORDER BY bin""".stripMargin,

    // l-diversity: QI class = (mktsegment, nationkey), sensitive band =
    // acctbal tier; distinct-l + entropy-l (floor micro-nats) + the
    // 2-diverse flag.
    "q250_l_diversity" ->
      """WITH cells AS (SELECT c_mktsegment, c_nationkey,
        |         CASE WHEN c_acctbal < 0 THEN 'neg'
        |              WHEN c_acctbal <= 5000 THEN 'mid'
        |              ELSE 'high' END AS band,
        |         COUNT(*) AS ns
        |       FROM customer GROUP BY 1, 2, 3),
        |tt AS (SELECT c_mktsegment, c_nationkey,
        |         CAST(SUM(ns) AS BIGINT) AS class_size
        |       FROM cells GROUP BY 1, 2),
        |tm AS (SELECT cells.c_mktsegment, cells.c_nationkey, ns, class_size,
        |         ns * CAST(round(ln(CAST(ns AS DOUBLE) / class_size) * 1e6, 0)
        |              AS BIGINT) AS term
        |       FROM cells JOIN tt USING (c_mktsegment, c_nationkey)),
        |ag AS (SELECT c_mktsegment, c_nationkey,
        |         MAX(class_size) AS class_size,
        |         CAST(COUNT(*) AS INT) AS distinct_l,
        |         CAST((-SUM(term)) // MAX(class_size) AS BIGINT)
        |           AS entropy_micro
        |       FROM tm GROUP BY 1, 2)
        |SELECT c_mktsegment, c_nationkey,
        |       CAST(class_size AS BIGINT) AS class_size, distinct_l,
        |       entropy_micro,
        |       CAST(CASE WHEN distinct_l >= 2 AND entropy_micro >= 693147
        |            THEN 1 ELSE 0 END AS INT) AS is_2_diverse
        |FROM ag
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // BPE vocab-size sweep: the one training's per-round states s0..s6
    // aggregated into the fertility/compression curve.
    "q251_bpe_sweep" ->
      (s"""WITH ${bpeChainCtes(6)}
         |""".stripMargin +
        (0 to 6).map(r =>
          s"""SELECT CAST($r AS INT) AS round,
             |       CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
             |       CAST(SUM(freq) AS BIGINT) AS corpus_words,
             |       CAST(SUM(freq * length(w)) AS BIGINT) AS corpus_chars,
             |       CAST(SUM(freq * p) AS BIGINT) AS corpus_pieces,
             |       CAST(SUM(freq * p) * 1000000 // SUM(freq) AS BIGINT)
             |         AS fertility_micro,
             |       CAST(SUM(freq * length(w)) * 1000000 // SUM(freq * p)
             |         AS BIGINT) AS chars_per_piece_micro
             |FROM (SELECT w, COUNT(*) AS p FROM s$r GROUP BY w) seg
             |     JOIN bvocab USING (w)""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY round")),

    // Embedding cross-source near-dup matrix: the q221 bucketed pair
    // tier attributed to sources (vec_id = doc_id), per unordered pair
    // the count, max cosine (e4) and lexicographically-first example.
    "q252_emb_cross_source" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |pr2 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |          ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |        FROM bk a JOIN bk b
         |          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT id_a, id_b,
         |            CAST(round(cos * 10000, 0) AS BIGINT) AS cos_e4
         |          FROM pr2 WHERE cos >= 0.40),
         |at AS (SELECT least(sa.source, sb.source) AS source_lo,
         |         greatest(sa.source, sb.source) AS source_hi,
         |         p.id_a, p.id_b, p.cos_e4
         |       FROM pairs p
         |       JOIN documents sa ON sa.doc_id = p.id_a
         |       JOIN documents sb ON sb.doc_id = p.id_b),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY source_lo, source_hi
         |         ORDER BY id_a, id_b) AS rn FROM at),
         |ag AS (SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
         |         CAST(MAX(cos_e4) AS BIGINT) AS max_cos_e4
         |       FROM at GROUP BY 1, 2)
         |SELECT ag.source_lo, ag.source_hi,
         |       CAST(ag.n_pairs AS BIGINT) AS n_pairs, ag.max_cos_e4,
         |       rk.id_a AS example_a, rk.id_b AS example_b
         |FROM ag JOIN rk ON rk.source_lo = ag.source_lo
         |     AND rk.source_hi = ag.source_hi AND rk.rn = 1
         |ORDER BY ag.source_lo, ag.source_hi""".stripMargin,

    // Degree assortativity over the support->=2 co-purchase graph:
    // exact integer sufficient statistics, one double sqrt on the
    // 1-row relation, round-e6.
    "q253_assortativity" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |prx AS (SELECT a.item AS u, b.item AS v
        |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT u AS n FROM prx UNION ALL SELECT v FROM prx) z
        |  GROUP BY n),
        |nn AS (SELECT COUNT(*) AS n_nodes, MAX(d) AS max_degree FROM dg),
        |dd AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
        |sums AS (SELECT COUNT(*) AS m2,
        |    SUM(CAST(dx.d AS HUGEINT)) AS sx,
        |    SUM(CAST(dy.d AS HUGEINT)) AS sy,
        |    SUM(CAST(dx.d AS HUGEINT) * dy.d) AS sxy,
        |    SUM(CAST(dx.d AS HUGEINT) * dx.d) AS sxx,
        |    SUM(CAST(dy.d AS HUGEINT) * dy.d) AS syy
        |  FROM dd JOIN dg dx ON dd.u = dx.n JOIN dg dy ON dd.v = dy.n),
        |fin AS (SELECT *, m2 * sxy - sx * sy AS num,
        |          m2 * sxx - sx * sx AS d1, m2 * syy - sy * sy AS d2
        |        FROM sums CROSS JOIN nn)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(m2 // 2 AS BIGINT) AS n_edges,
        |       CAST(max_degree AS BIGINT) AS max_degree,
        |       CAST(CASE WHEN d1 > 0 AND d2 > 0
        |            THEN round(CAST(num AS DOUBLE)
        |              / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE))
        |              * 1e6, 0)
        |            ELSE 0 END AS BIGINT) AS assortativity_e6,
        |       CAST(CASE WHEN d1 > 0 AND d2 > 0 THEN 1 ELSE 0 END AS INT)
        |         AS defined
        |FROM fin""".stripMargin,

    // PRF search: stage-1 BM25 (query-by-example, self excluded) ->
    // top-5 feedback docs -> 3 expansion terms (tf*idf over feedback,
    // anti original terms) -> rescore with the expanded set.
    "q254_prf_search" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |qx AS (SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 10),
         |qi AS (SELECT qx.query_id, qx.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM qx JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       WHERE tf.doc_id <> qi.query_id
         |       GROUP BY qi.query_id, tf.doc_id),
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc) z
         |  WHERE rnk <= 5),
         |ia AS (SELECT w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM dft CROSS JOIN tot),
         |ex0 AS (SELECT fb.query_id, tf.w,
         |          CAST(SUM(tf.tf * ia.idf_micro) AS BIGINT) AS escore
         |        FROM fb JOIN tf USING (doc_id) JOIN ia USING (w)
         |        GROUP BY 1, 2),
         |ex1 AS (SELECT e.query_id, e.w, e.escore
         |        FROM ex0 e LEFT JOIN qx
         |          ON qx.query_id = e.query_id AND qx.w = e.w
         |        WHERE qx.w IS NULL),
         |ex2 AS (SELECT query_id, w FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY escore DESC, w) AS erk FROM ex1) z
         |  WHERE erk <= 3),
         |qe AS (SELECT query_id, w FROM qx
         |       UNION SELECT query_id, w FROM ex2),
         |qi2 AS (SELECT qe.query_id, qe.w,
         |          CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |               AS BIGINT) AS idf_micro
         |        FROM qe JOIN dft USING (w) CROSS JOIN tot),
         |sc2 AS (SELECT qi2.query_id, tf.doc_id,
         |          CAST(SUM(qi2.idf_micro *
         |            CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                 (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                 AS BIGINT)) AS BIGINT) AS score_e12,
         |          CAST(COUNT(*) AS INT) AS n_hit_terms,
         |          CAST(SUM(CASE WHEN ex2.w IS NOT NULL THEN 1 ELSE 0 END)
         |            AS INT) AS n_exp_terms
         |        FROM qi2 JOIN tf USING (w) JOIN dl USING (doc_id)
         |             CROSS JOIN tot
         |             LEFT JOIN ex2 ON ex2.query_id = qi2.query_id
         |               AND ex2.w = qi2.w
         |        WHERE tf.doc_id <> qi2.query_id
         |        GROUP BY qi2.query_id, tf.doc_id)
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score_e12,
         |       n_hit_terms, n_exp_terms
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc2) z
         |WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Neyman allocation: per-source (N, Sx, Sxx) exact, sigma via one
    // sqrt of identical integers, floor-division allocations clamped
    // to the stratum size; proportional allocation for contrast.
    "q255_neyman_alloc" ->
      s"""WITH $nCte,
         |tk AS (SELECT d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS x
         |       FROM documents d JOIN n USING (doc_id)),
         |st AS (SELECT source, COUNT(*) AS nh,
         |         CAST(SUM(x) AS BIGINT) AS sx,
         |         CAST(SUM(x*x) AS BIGINT) AS sxx
         |       FROM tk GROUP BY source),
         |s2 AS (SELECT *, nh * sxx - sx * sx AS s2num FROM st),
         |s3 AS (SELECT *, CAST(round(sqrt(CAST(s2num AS DOUBLE)) / nh * 1e6, 0)
         |         AS BIGINT) AS sigma_e6 FROM s2),
         |s4 AS (SELECT *, nh * sigma_e6 AS wh FROM s3),
         |tt AS (SELECT CAST(SUM(nh) AS BIGINT) AS ntot,
         |         CAST(SUM(wh) AS HUGEINT) AS wtot FROM s4),
         |f AS (SELECT s4.*, tt.ntot, tt.wtot,
         |        ntot * 100000 // 1000000 AS budget
         |      FROM s4 CROSS JOIN tt)
         |SELECT source, CAST(nh AS BIGINT) AS n_docs, sigma_e6,
         |       CAST(CAST(wh AS HUGEINT) * 1000000 // wtot AS BIGINT)
         |         AS weight_ppm,
         |       CAST(least(CAST(nh AS HUGEINT),
         |            CAST(budget AS HUGEINT) * wh // wtot) AS BIGINT)
         |         AS neyman_n,
         |       CAST(least(CAST(nh AS HUGEINT),
         |            CAST(budget AS HUGEINT) * nh // ntot) AS BIGINT)
         |         AS proportional_n,
         |       CAST(budget AS BIGINT) AS budget_n
         |FROM f ORDER BY source""".stripMargin,

    // Split-conformal selective prediction: even-half margin threshold
    // (k-th order statistic over the distinct-margin spine), odd-half
    // accept/abstain accuracy per predicted class.
    "q256_conformal" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id, predicted,
         |        CASE predicted
         |          WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |          WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |          ELSE logit_2 - greatest(logit_0, logit_1) END AS margin
         |      FROM (SELECT *,
         |              CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |                   WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |            FROM scq) z),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS label
         |        FROM st),
         |jj AS (SELECT p.doc_id, p.predicted, p.margin, lab.label,
         |         CAST(p.doc_id % 2 AS INT) AS half
         |       FROM p JOIN lab USING (doc_id)),
         |cal AS (SELECT * FROM jj WHERE half = 0),
         |nc AS (SELECT COUNT(*) AS n_cal,
         |         (COUNT(*) + 1) * 100000 // 1000000 AS k FROM cal),
         |mc AS (SELECT margin, COUNT(*) AS c FROM cal GROUP BY margin),
         |pf AS (SELECT margin, c,
         |         COALESCE(SUM(c) OVER (ORDER BY margin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS before
         |       FROM mc),
         |tu AS (SELECT COALESCE(MIN(margin), 0) AS tau
         |       FROM pf CROSS JOIN nc WHERE before + c >= k),
         |te AS (SELECT jj.*,
         |         CASE WHEN margin >= tau THEN 1 ELSE 0 END AS acc,
         |         CASE WHEN predicted = label THEN 1 ELSE 0 END AS ok
         |       FROM jj CROSS JOIN tu WHERE half = 1),
         |ag AS (SELECT predicted, COUNT(*) AS n_test,
         |         CAST(SUM(acc) AS BIGINT) AS n_accepted,
         |         CAST(SUM(acc*ok) AS BIGINT) AS n_acc_ok,
         |         CAST(SUM((1-acc)*ok) AS BIGINT) AS n_rej_ok
         |       FROM te GROUP BY predicted)
         |SELECT predicted, CAST(n_test AS BIGINT) AS n_test, n_accepted,
         |       CAST(n_accepted * 1000000 // n_test AS BIGINT) AS accept_ppm,
         |       CAST(CASE WHEN n_accepted = 0 THEN 0
         |            ELSE n_acc_ok * 1000000 // n_accepted END AS BIGINT)
         |         AS acc_accepted_ppm,
         |       CAST(CASE WHEN n_test = n_accepted THEN 0
         |            ELSE n_rej_ok * 1000000 // (n_test - n_accepted) END
         |         AS BIGINT) AS acc_rejected_ppm,
         |       CAST(tau AS BIGINT) AS tau,
         |       CAST(n_cal AS BIGINT) AS n_cal, CAST(k AS BIGINT) AS k
         |FROM ag CROSS JOIN tu CROSS JOIN nc
         |ORDER BY predicted""".stripMargin,

    // Adamic-Adar link prediction: hub-capped common-neighbor pairs,
    // round-e6 1/ln(deg) weights, anti join on existing edges, top-25.
    "q257_link_prediction" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |prx AS (SELECT a.item AS u, b.item AS v
        |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dirx AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
        |dg AS (SELECT u AS z, COUNT(*) AS d FROM dirx GROUP BY u),
        |ctr AS (SELECT z, CAST(round(1e6 / ln(CAST(d AS DOUBLE)), 0)
        |          AS BIGINT) AS w_e6
        |        FROM dg WHERE d BETWEEN 2 AND 64),
        |adjx AS (SELECT d2.u AS z, d2.v AS nb, ctr.w_e6
        |         FROM dirx d2 JOIN ctr ON ctr.z = d2.u),
        |prs AS (SELECT x.z, x.nb AS a, y.nb AS b, x.w_e6
        |        FROM adjx x JOIN adjx y ON x.z = y.z AND x.nb < y.nb),
        |nonadj AS (SELECT prs.* FROM prs
        |           LEFT JOIN prx e ON e.u = prs.a AND e.v = prs.b
        |           WHERE e.u IS NULL),
        |sc AS (SELECT a, b, CAST(SUM(w_e6) AS BIGINT) AS aa_e6,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM nonadj GROUP BY a, b)
        |SELECT a, b, aa_e6, n_common
        |FROM sc ORDER BY aa_e6 DESC, a, b LIMIT 25""".stripMargin,

    // Temporal-holdout recommender eval: pre-pivot top-3 co-purchase
    // recs, post-pivot baskets, hit-rate@k with cold-start reported.
    "q258_rec_holdout" ->
      """WITH ito AS (SELECT o_orderkey AS oid,
        |         CASE WHEN o_orderdate >= DATE '1997-01-01' THEN 1 ELSE 0 END
        |           AS is_test
        |       FROM orders),
        |li AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |       FROM lineitem),
        |itx AS (SELECT li.oid, li.item, ito.is_test FROM li JOIN ito USING (oid)),
        |tr AS (SELECT oid, item FROM itx WHERE is_test = 0),
        |te AS (SELECT oid, item FROM itx WHERE is_test = 1),
        |pc AS (SELECT a.item, b.item AS other, COUNT(*) AS cnt
        |       FROM tr a JOIN tr b ON a.oid = b.oid AND a.item <> b.item
        |       GROUP BY 1, 2),
        |rc AS (SELECT item, other, rnk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item
        |      ORDER BY cnt DESC, other) AS rnk FROM pc) z
        |  WHERE rnk <= 3),
        |sn AS (SELECT DISTINCT item FROM rc),
        |eb AS (SELECT te.oid, te.item FROM te JOIN sn USING (item)),
        |ne AS (SELECT COUNT(*) AS n_evals FROM eb),
        |ncold AS (SELECT COUNT(*) AS n_cold FROM te
        |          LEFT JOIN sn ON sn.item = te.item WHERE sn.item IS NULL),
        |mt AS (SELECT eb.oid, eb.item, MIN(rc.rnk) AS min_rank
        |       FROM eb JOIN rc USING (item)
        |       JOIN te t2 ON t2.oid = eb.oid AND t2.item = rc.other
        |       GROUP BY 1, 2),
        |ha AS (SELECT
        |    COALESCE(SUM(CASE WHEN min_rank <= 1 THEN 1 ELSE 0 END), 0) AS h1,
        |    COALESCE(SUM(CASE WHEN min_rank <= 2 THEN 1 ELSE 0 END), 0) AS h2,
        |    COALESCE(SUM(CASE WHEN min_rank <= 3 THEN 1 ELSE 0 END), 0) AS h3
        |  FROM mt),
        |ks AS (SELECT CAST(unnest([1, 2, 3]) AS INT) AS k)
        |SELECT ks.k, CAST(ne.n_evals AS BIGINT) AS n_evals,
        |       CAST(ncold.n_cold AS BIGINT) AS n_cold,
        |       CAST(CASE ks.k WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END
        |         AS BIGINT) AS n_hits,
        |       CAST(CASE WHEN ne.n_evals = 0 THEN 0
        |            ELSE (CASE ks.k WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END)
        |                 * 1000000 // ne.n_evals END AS BIGINT) AS hitrate_ppm
        |FROM ks CROSS JOIN ha CROSS JOIN ne CROSS JOIN ncold
        |ORDER BY ks.k""".stripMargin,

    // Chunk retrieval with doc max-pooling: q75 chunks as BM25 units,
    // best-chunk pooling, per-query doc ranking.
    "q259_chunk_retrieval" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id, toks,
         |        GREATEST((CAST(len(toks) AS BIGINT) - 16 + 47) // 48, 1) AS n_chunks
         |      FROM tk),
         |g AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM m),
         |ck AS (SELECT doc_id*1000000 + chunk_idx AS cid,
         |         list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64) AS ctoks
         |       FROM g),
         |ctok AS (SELECT cid, unnest(ctoks) AS w FROM ck),
         |tf AS (SELECT cid, w, COUNT(*) AS tf FROM ctok GROUP BY 1, 2),
         |dl AS (SELECT cid, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY cid),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |qv(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qi AS (SELECT qv.query_id, qv.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM qv JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.cid,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (cid)
         |            CROSS JOIN tot
         |       GROUP BY qi.query_id, tf.cid),
         |pl AS (SELECT query_id, cid // 1000000 AS doc_id,
         |         cid % 1000000 AS chunk_idx, score_e12 FROM sc),
         |ag AS (SELECT query_id, doc_id,
         |         CAST(MAX(score_e12) AS BIGINT) AS best_score_e12,
         |         CAST(COUNT(*) AS BIGINT) AS n_chunks_hit
         |       FROM pl GROUP BY 1, 2),
         |bc AS (SELECT query_id, doc_id,
         |         CAST(chunk_idx AS BIGINT) AS best_chunk
         |       FROM (SELECT *, row_number() OVER (
         |           PARTITION BY query_id, doc_id
         |           ORDER BY score_e12 DESC, chunk_idx) AS rn FROM pl) z
         |       WHERE rn = 1),
         |rk AS (SELECT ag.query_id, ag.doc_id, bc.best_chunk,
         |         ag.best_score_e12, ag.n_chunks_hit,
         |         row_number() OVER (PARTITION BY ag.query_id
         |           ORDER BY ag.best_score_e12 DESC, ag.doc_id) AS rnk
         |       FROM ag JOIN bc USING (query_id, doc_id))
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, best_chunk,
         |       best_score_e12, n_chunks_hit
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Gopher-style repeated-4-gram scrub accounting: per doc the union
    // of positions covered by second+ occurrences, per-source volumes.
    "q260_repeat_scrub" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |oc AS (SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos,
         |         ${fullHash("(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] || ' ' || toks[g+3])")} AS h
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 2)) AS g FROM tk) z),
         |rp AS (SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, row_number() OVER (
         |      PARTITION BY doc_id, h ORDER BY pos) AS rn FROM oc) z
         |  WHERE rn >= 2),
         |cv AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p FROM (
         |    SELECT doc_id, unnest(range(pos, pos + 4)) AS p FROM rp) z),
         |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cv GROUP BY doc_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_affected,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(n_removed, 0)) AS BIGINT)
         |         AS tokens_after,
         |       CAST(SUM(COALESCE(n_removed, 0)) * 1000000 // SUM(n_tokens)
         |         AS BIGINT) AS removed_ppm
         |FROM sz LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    // Capped budget selection: q240's global positional prefix PLUS a
    // per-source positional prefix, kept iff both fit.
    "q261_capped_budget" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT d.doc_id, d.source,
         |         CAST(st.n_tokens AS BIGINT) AS n_tokens,
         |         st.n_stop * 1000000 // greatest(st.n_tokens, 1) AS score_ppm
         |       FROM st JOIN documents d USING (doc_id)),
         |gp AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS g_prefix
         |       FROM sc),
         |sp AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           PARTITION BY source ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS s_prefix
         |       FROM gp),
         |bu AS (SELECT SUM(n_tokens) * 500000 // 1000000 AS budget FROM sc),
         |cp AS (SELECT source, SUM(n_tokens) * 700000 // 1000000 AS src_cap
         |       FROM sc GROUP BY source),
         |kp AS (SELECT sp.*, bu.budget, cp.src_cap,
         |         CAST(CASE WHEN sp.g_prefix + sp.n_tokens <= bu.budget
         |                    AND sp.s_prefix + sp.n_tokens <= cp.src_cap
         |              THEN 1 ELSE 0 END AS INT) AS kept
         |       FROM sp CROSS JOIN bu JOIN cp USING (source))
         |SELECT source, kept, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         |       CAST(MAX(budget) AS BIGINT) AS budget_tokens,
         |       CAST(MAX(src_cap) AS BIGINT) AS src_cap_tokens
         |FROM kp GROUP BY source, kept
         |ORDER BY source, kept""".stripMargin,

    // IVF probe sweep (generated — see ivfSweepSql).
    "q262_ivf_probe_sweep" -> ivfSweepSql,

    // LPA communities + modularity (generated — see lpaSql).
    "q263_lpa_communities" -> lpaSql,

    // HITS hubs/authorities (generated — see hitsSql).
    "q264_hits" -> hitsSql,

    // t-closeness: ordered-EMD between each QI class's sensitive-band
    // distribution and the global one, exact cross-multiplied integers.
    "q265_t_closeness" ->
      """WITH cells AS (SELECT c_mktsegment, c_nationkey,
        |    CASE WHEN c_acctbal < 0 THEN 1
        |         WHEN c_acctbal <= 5000 THEN 2 ELSE 3 END AS band,
        |    COUNT(*) AS ns
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT c_mktsegment, c_nationkey, SUM(ns) AS class_size
        |        FROM cells GROUP BY 1, 2),
        |gl AS (SELECT band, SUM(ns) AS gs FROM cells GROUP BY band),
        |nt AS (SELECT SUM(ns) AS n_total FROM cells),
        |spine AS (SELECT t.c_mktsegment, t.c_nationkey, t.class_size,
        |            b.band
        |          FROM tot t CROSS JOIN
        |            (SELECT UNNEST([1, 2, 3]) AS band) b),
        |filled AS (SELECT s.c_mktsegment, s.c_nationkey, s.band,
        |             s.class_size,
        |             CAST(COALESCE(c.ns, 0) AS HUGEINT) * nt.n_total
        |               - CAST(gl.gs AS HUGEINT) * s.class_size AS dnum,
        |             CAST(s.class_size AS HUGEINT) * nt.n_total AS den
        |           FROM spine s
        |           LEFT JOIN cells c
        |             USING (c_mktsegment, c_nationkey, band)
        |           JOIN gl USING (band) CROSS JOIN nt),
        |cm AS (SELECT *, SUM(dnum) OVER (
        |           PARTITION BY c_mktsegment, c_nationkey ORDER BY band
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS cum
        |       FROM filled)
        |SELECT c_mktsegment, c_nationkey,
        |       CAST(MAX(class_size) AS BIGINT) AS class_size,
        |       CAST(SUM(ABS(cum)) * 1000000 // (2 * MAX(den)) AS BIGINT)
        |         AS emd_ppm,
        |       CAST(CASE WHEN SUM(ABS(cum)) * 1000000 // (2 * MAX(den))
        |              <= 200000 THEN 1 ELSE 0 END AS INT) AS is_t_close
        |FROM cm WHERE band < 3
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
