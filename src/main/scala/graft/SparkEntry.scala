package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions) exposed as a named query with a DuckDB oracle.
  *
  * Parity conventions between `queries` (Spark) and `oracleSql` (DuckDB):
  *  - identical output column NAMES (driver sorts columns by name, then
  *    hashes values);
  *  - double aggregates rounded to 4 decimals on both sides (canonicalizes
  *    FP accumulation-order noise across engines/partitionings);
  *  - counts/ranks as BIGINT on both sides; timestamps rendered as strings;
  *  - identical total ORDER BY (with unique tiebreak) on both sides;
  *  - md5 as the shared hash primitive (identical hex in both engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  /** ETL-parity transform (reference transform.py:55-63 semantics) applied
    * to the events table, with a FIXED run timestamp for determinism.
    */
  private def etlTransform(s: SparkSession, dir: String): DataFrame = {
    val runTs = Timestamp.valueOf("2026-01-01 00:00:00")
    // exercise T1 (mixed-case names), T2 (already-timestamp passthrough),
    // T4 (run-constant literal), T8 (projection) as one lazy plan
    val src = sources.Tables.events(s, dir)
      .select(col("event_id").as("row_id"), col("ts").as("TIME"),
        col("value").as("Traffic"))
    val named = TrafficTransform.normalizeColumnNames(src)
    val parsed = TrafficTransform.parseTimeColumn(named)
    val enriched = TrafficTransform.addCreatedAt(parsed, runTs)
    TrafficTransform.requireNumeric(enriched, "traffic")
    enriched.select(
      col("row_id"),
      date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("time"),
      col("traffic"),
      date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss").as("created_at"))
      .orderBy(col("row_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference ETL parity ----
    "q_etl_transform" -> (etlTransform(_, _)),
    // ---- relational analytics (the reference's BigQuery-delegated surface) ----
    "q_agg_pricing_summary" -> (Analytics.pricingSummary(_, _)),
    "q_join_shipping_priority" -> (Analytics.shippingPriority(_, _)),
    "q_join_region_revenue" -> (Analytics.regionRevenue(_, _)),
    "q_outer_join_order_counts" -> (Analytics.customerOrderCounts(_, _)),
    "q_semi_join_urgent_customers" -> (Analytics.customersWithUrgentOrders(_, _)),
    "q_anti_join_orderless_customers" -> (Analytics.customersWithoutOrders(_, _)),
    "q_distinct_agg_supplier_parts" -> (Analytics.supplierPartBreadth(_, _)),
    "q_rollup_orders" -> (Analytics.orderRollup(_, _)),
    "q_cube_events" -> (Analytics.eventCube(_, _)),
    "q_grouping_sets_orders" -> (Analytics.orderGroupingSets(_, _)),
    "q_upsert_orders" -> (Analytics.upsertOrders(_, _)),
    "q_window_rolling_hour" -> (Analytics.rollingHourValue(_, _)),
    "q_window_first_last" -> (Analytics.userEventEndpoints(_, _)),
    "q_window_top_customers" -> (Analytics.topCustomersPerNation(_, _)),
    "q_window_moving_avg" -> (Analytics.movingAverage(_, _)),
    "q_window_event_gaps" -> (Analytics.eventGaps(_, _)),
    "q_topk_orders" -> (Analytics.topOrders(_, _)),
    "q_setops_nations" -> (Analytics.nationSetOps(_, _)),
    "q_having_frequent_buyers" -> (Analytics.frequentBuyers(_, _)),
    "q_scalar_subquery_big_orders" -> (Analytics.bigTicketOrders(_, _)),
    "q_distribution_order_counts" -> (Analytics.orderCountDistribution(_, _)),
    "q_percentiles_order_price" -> (Analytics.pricePercentiles(_, _)),
    "q_heavy_values_approx" ->
      (Analytics.approxPercentileBounds(_, _, ApproxPct.accuracy)),
    "q_distinct_users_approx" ->
      (Sketches.approxDistinctUsers(_, _, Sketch.rsd)),
    "q_hll_sketch_rollup" -> (Sketches.hllSketchRollup(_, _, Sketch.lgK)),
    "q_hll_rollup_incremental" ->
      (Sketches.hllSketchRollupIncremental(_, _, Sketch.lgK)),
    "q_quantile_rollup" -> (Sketches.quantileRollup(_, _, Sketch.kllK)),
    "q_quantile_rollup_incremental" ->
      (Sketches.quantileRollupIncremental(_, _, Sketch.kllK)),
    "q_hll_overlap" -> (Sketches.hllOverlap(_, _, Sketch.lgK)),
    "q_theta_set_ops" -> (Sketches.thetaSetOps(_, _)),
    "q_bitmap_distinct_users" -> (Sketches.bitmapDistinctUsers(_, _)),
    "q_bitmap_overlap" -> (Sketches.bitmapOverlap(_, _)),
    "q_cms_point_queries" ->
      (Sketches.cmsPointQueries(_, _, Sketch.cmsEps, Sketch.cmsConfidence)),
    "q_correlated_above_own_avg" -> (Analytics.aboveOwnAverage(_, _)),
    "q_json_extract_props" -> (Analytics.jsonPropsAgg(_, _)),
    "q_time_bucket_events" -> (Analytics.hourlyEventRollup(_, _)),
    "q_sessionize_batch" -> (Analytics.sessionizeBatch(_, _)),
    "q_session_quality" -> (Analytics.sessionQualityByDay(_, _)),
    "q_conversion_window" -> (Analytics.conversionWindow(_, _)),
    "q_event_transitions" -> (Analytics.eventTransitions(_, _)),
    "q_session_paths" -> (Analytics.sessionPaths(_, _)),
    "q_interval_union_time" -> (Analytics.intervalUnionTime(_, _)),
    "q_dow_profile" -> (Analytics.dowProfile(_, _)),
    "q_rfm_segments" -> (Analytics.rfmSegments(_, _)),
    "q_value_outliers" -> (Analytics.valueOutliers(_, _)),
    "q_mad_outliers" -> (Analytics.madOutliers(_, _)),
    "q_behavior_overlap" -> (Analytics.behaviorOverlap(_, _)),
    "q_new_vs_returning" -> (Analytics.newVsReturning(_, _)),
    "q_key_skew_audit" -> (Analytics.keySkewAudit(_, _)),
    "q_scd2_intervals" -> (Analytics.scd2Intervals(_, _)),
    "q_scd2_point_lookup" -> (Analytics.scd2PointLookup(_, _)),
    "q_attribution_last_touch" -> (Analytics.lastTouchAttribution(_, _)),
    "q_attribution_first_touch" -> (Analytics.firstTouchAttribution(_, _)),
    "q_ewma_user_value" -> (Analytics.ewmaUserValue(_, _)),
    "q_time_weighted_value" -> (Analytics.timeWeightedValue(_, _)),
    "q_throttle_dedup" ->
      ((s, d) => Analytics.throttleDedup(s, d, Throttle.windowHours)),
    "q_scd2_incremental" -> ((s, d) => {
      // "dimension already built, a delta of change records arrives":
      // the prior 4/5 of event time is the snapshot, the last 1/5 the
      // delta; merge must equal the from-scratch build the oracle runs
      val r = sources.Tables.events(s, d)
        .agg(min(expr("unix_micros(ts)")), max(expr("unix_micros(ts)"))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val split = lo + (hi - lo) * 4 / 5
      Analytics.scd2Merge(
        Analytics.scd2Slice(s, d, Long.MinValue, split),
        sources.Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("unix_micros(ts)").as("t_us"))
          .filter(col("t_us") >= split))
    }),
    "q_profile_columns" -> (Quality.profileOrders(_, _)),
    "q_corr_matrix" -> (Quality.corrMatrix(_, _)),
    "q_corr_matrix_incremental" -> (Quality.corrMatrixIncremental(_, _)),
    "q_moment_profile" -> (Quality.momentProfile(_, _)),
    "q_ab_power_audit" -> (Quality.abPowerAudit(_, _)),
    "q_quantile_uplift" -> (Quality.quantileUplift(_, _)),
    "q_mannwhitney_value" -> (Quality.mannWhitneyValue(_, _)),
    "q_hodges_lehmann_value" -> (Quality.hodgesLehmannValue(_, _)),
    "q_qn_scale_value" -> (Quality.qnScaleValue(_, _)),
    "q_wilcoxon_signed_rank" -> (Quality.wilcoxonSignedRank(_, _)),
    "q_mcnemar_conversion" -> (Quality.mcnemarConversion(_, _)),
    "q_bootstrap_ci_revenue" -> (Quality.bootstrapRevenueCi(_, _)),
    "q_bootstrap_ci_incremental" -> (Quality.bootstrapRevenueCiIncremental(_, _)),
    "q_freshness_audit" -> (Quality.freshnessAudit(_, _)),
    "q_shrunken_rates" -> (Quality.shrunkenRates(_, _)),
    "q_moment_profile_incremental" ->
      (Quality.momentProfileIncremental(_, _)),
    "q_load_reconciliation" -> (Quality.loadReconciliation(_, _)),
    "q_chi2_source_lang" -> (Quality.chi2SourceLang(_, _)),
    "q_type_drift_hourly" -> (Quality.typeDriftHourly(_, _)),
    "q_basket_triples" ->
      (Mining.basketTriples(_, _, Basket.maxItems, Basket.topK)),
    "q_market_basket" ->
      (Mining.marketBasket(_, _, Basket.maxItems, Basket.topK)),
    "q_pareto_frontier" ->
      (Mining.paretoFrontier(_, _, Basket.paretoBandCents)),
    "q_pagerank_copurchase" ->
      (Mining.pagerankCopurchase(_, _, Basket.maxItems, Basket.pagerankIters)),
    "q_join_size_estimate" ->
      (Quality.joinSizeEstimate(_, _, Basket.joinEstBuckets)),
    "q_triangle_count" ->
      (Mining.triangleCount(_, _, Basket.maxItems, Basket.topK)),
    "q_assoc_rules" ->
      (Mining.assocRules(_, _, Basket.maxItems, 5, Basket.topK)),
    "q_seasonal_anomaly" -> (Quality.seasonalAnomaly(_, _)),
    "q_fd_discovery" -> (Quality.fdDiscovery(_, _)),
    "q_ab_test_readout" -> (Quality.abTestReadout(_, _)),
    "q_cusum_changepoint" -> (Analytics.cusumChangepoint(_, _)),
    "q_holt_forecast" -> (Analytics.holtForecast(_, _)),
    "q_trend_audit" -> (Analytics.trendAudit(_, _)),
    "q_seq_pair_support" -> (Mining.seqPairSupport(_, _)),
    "q_daily_value_bands" -> (Analytics.dailyValueBands(_, _)),
    "q_revenue_lorenz" -> (Analytics.revenueLorenz(_, _)),
    "q_interleave_mix" -> (Curation.interleaveMix(_, _)),
    "q_bloom_semi_join" -> (Analytics.bloomSemiOrderMix(_, _)),
    "q_mom_revenue" -> (Analytics.momRevenue(_, _)),
    "q_survival_signup_purchase" -> (Analytics.survivalSignupPurchase(_, _)),
    "q_funnel_ordered" -> (Analytics.funnelOrdered(_, _)),
    "q_token_log2_hist" -> (TextAnalysis.tokenLog2Histogram(_, _)),
    "q_salted_join_revenue" -> (Analytics.saltedPurchaseRevenue(_, _)),
    "q_vocab_coverage" -> (TextAnalysis.vocabCoverage(_, _)),
    "q_encode_docs" -> (TextAnalysis.encodeDocs(_, _)),
    "q_bpe_train" -> (TextAnalysis.bpeTrain(_, _, Bpe.merges)),
    "q_bpe_encode" -> (TextAnalysis.bpeEncode(_, _, Bpe.merges)),
    "q_importance_weights" ->
      (TextAnalysis.importanceWeights(_, _, Dsir.target, Dsir.k)),
    "q_snapshot_diff" -> (Curation.snapshotDiff(_, _)),
    "q_bfs_levels" ->
      (Mining.bfsLevels(_, _, Basket.maxItems, Basket.bfsHops)),
    "q_closeness_centrality" ->
      (Mining.closenessCentrality(_, _, Basket.maxItems,
        Basket.closenessSources, Basket.bfsHops)),
    "q_shortest_paths" ->
      (Mining.shortestPaths(_, _, Basket.maxItems, Basket.spRounds,
        Basket.topK)),
    "q_item_neighbor_jaccard" ->
      (Mining.itemNeighborJaccard(_, _, Basket.maxItems,
        Basket.jaccardMinCo, Basket.jaccardTopN)),
    "q_k_anonymity" -> (Quality.kAnonymity(_, _)),
    "q_vocab_growth" -> (TextAnalysis.vocabGrowth(_, _)),
    "q_novelty_scores" -> (TextAnalysis.noveltyScores(_, _)),
    "q_encode_docs_incremental" -> ((s, d) => {
      // frozen-tokenizer contract: vocab staged from the first 80% of the
      // corpus, ONLY delta docs (doc_id >= split) tokenized and encoded
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      val vdir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_vocab_" + Integer.toHexString(d.hashCode)).toString
      TextAnalysis.buildVocabIndex(s, d, vdir, maxDocIdExclusive = split)
      TextAnalysis.encodeDocsIncremental(s, d, vdir, split)
    }),
    "q_bigram_lm_score" ->
      (TextAnalysis.bigramLmScore(_, _, BigramLm.refLang)),
    "q_top_tokens_per_source" -> (TextAnalysis.topTokensPerSource(_, _)),
    "q_heavy_hitters" -> (TextAnalysis.heavyTokens(_, _, Heavy.k)),
    "q_collocations" ->
      (TextAnalysis.collocations(_, _, Colloc.minCount, Colloc.topK)),
    "q_bpe_pair_counts" -> (TextAnalysis.bpePairCounts(_, _)),
    "q_domain_affinity" ->
      (TextAnalysis.domainAffinity(_, _, Affinity.targetSource)),
    "q_asof_join_events_orders" -> (AsofJoin.eventsAsofOrders(_, _)),
    "q_join_bucketed_revenue" -> (Bucketing.bucketedOrderRevenue(_, _)),
    "q_pivot_order_status" -> (Reshape.orderStatusPivot(_, _)),
    "q_unpivot_order_status" -> (Reshape.orderStatusUnpivot(_, _)),
    "q_range_join_value_bands" -> (RangeJoin.eventValueBands(_, _)),
    "q_interval_overlaps" -> (RangeJoin.intervalOverlaps(_, _)),
    "q_event_funnel" -> (Analytics.eventFunnel(_, _)),
    "q_forward_fill" -> (Analytics.forwardFillValues(_, _)),
    "q_dense_daily_counts" -> (Analytics.denseDailyCounts(_, _)),
    "q_revenue_share" -> (Analytics.nationRevenueShare(_, _)),
    "q_contract_audit" -> (Quality.contractAudit(_, _)),
    "q_histogram_order_price" -> (Analytics.orderPriceHistogram(_, _)),
    "q_equal_freq_binning" -> (Analytics.equalFreqBins(_, _)),
    "q_setops_all_nationkeys" -> (Analytics.nationKeyMultisets(_, _)),
    "q_cohort_retention" -> (Analytics.cohortRetention(_, _)),
    "q_cohort_ltv" -> (Analytics.cohortLtv(_, _)),
    "q_rolling_active_users" -> (Analytics.rollingActiveUsers(_, _)),
    "q_interp_residuals" -> (Analytics.valueVsLocalTrend(_, _)),
    "q_window_rank_family" -> (Analytics.orderPriceRanks(_, _)),
    "q_date_parts_orders" -> (Analytics.orderDateParts(_, _)),
    "q_regr_slope_price_qty" -> (Analytics.priceQuantitySlope(_, _)),
    "q_mode_order_priority" -> (Analytics.orderPriorityMode(_, _)),
    "q_string_funcs" -> (Analytics.customerStringShapes(_, _)),
    "q_array_funcs" -> (Analytics.embeddingArrayShapes(_, _)),
    "q_join_brand_revenue" -> (Analytics.brandRevenue(_, _)),
    "q_volume_shipping" -> (Analytics.volumeShipping(_, _)),
    "q_market_share" -> (Analytics.marketShare(_, _)),
    "q_promotion_effect" -> (Analytics.promotionEffect(_, _)),
    "q_top_supplier" -> (Analytics.topSupplier(_, _)),
    "q_small_qty_revenue" -> (Analytics.smallQtyRevenue(_, _)),
    "q_returned_item_report" -> (Analytics.returnedItemReport(_, _)),
    "q_forecast_revenue" -> (Analytics.forecastRevenue(_, _)),
    "q_disjunctive_revenue" -> (Analytics.disjunctiveRevenue(_, _)),
    "q_min_cost_supplier" -> (Analytics.minCostSupplier(_, _)),
    "q_acf_daily_value" -> (Analytics.acfDailyValue(_, _)),
    "q_ccf_click_purchase" -> (Analytics.ccfDailyValue(_, _)),
    "q_theil_sen_trend" -> (Analytics.theilSenTrend(_, _)),
    "q_kendall_tau_daily" -> (Analytics.kendallTauDaily(_, _)),
    "q_spearman_daily" -> (Analytics.spearmanDaily(_, _)),
    "q_mann_kendall_seasonal" -> (Analytics.mannKendallSeasonal(_, _)),
    "q_siegel_slope" -> (Analytics.siegelSlope(_, _)),
    "q_runs_test_daily" -> (Analytics.runsTestDaily(_, _)),
    "q_ljung_box_daily" -> (Analytics.ljungBoxDaily(_, _)),
    "q_pacf_daily" -> (Analytics.pacfDaily(_, _)),
    "q_seasonal_decompose" -> (Analytics.seasonalDecompose(_, _)),
    "q_bot_likeness" -> (Analytics.botLikeness(_, _)),
    "q_traffic_kpi_report" -> (Analytics.trafficKpiReport(_, _)),
    // ---- text analysis ----
    "q_text_stats" -> (TextAnalysis.textStats(_, _)),
    "q_token_estimate" -> (TextAnalysis.tokenEstimate(_, _)),
    "q_text_quality" -> (TextAnalysis.qualityScore(_, _)),
    "q_text_clean" -> (TextAnalysis.cleanText(_, _)),
    "q_lang_id" -> (TextAnalysis.langId(_, _)),
    "q_fingerprints" -> (TextAnalysis.fingerprints(_, _)),
    "q_winnow_fingerprints" -> (TextAnalysis.winnowFingerprints(_, _)),
    "q_repetition_stats" -> (TextAnalysis.repetitionStats(_, _)),
    "q_tfidf_top_terms" -> (TextAnalysis.tfidfTopTerms(_, _)),
    "q_chunk_docs" -> (TextAnalysis.chunkDocs(_, _)),
    "q_chunk_dedup" -> (TextAnalysis.chunkDedup(_, _)),
    "q_pii_redact" -> (TextAnalysis.piiRedact(_, _)),
    "q_corpus_funnel" -> (TextAnalysis.corpusFunnel(_, _)),
    "q_corpus_report" -> (TextAnalysis.corpusReport(_, _)),
    "q_corpus_report_incremental" -> ((s, d) => {
      // incremental curation: per-slice report cards merged exactly —
      // the oracle recomputes from scratch, proving merge == rescan
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      TextAnalysis.mergeCorpusReports(
        TextAnalysis.corpusReportSlice(s, d, 0L, split),
        TextAnalysis.corpusReportSlice(s, d, split))
    }),
    "q_corpus_funnel_incremental" -> ((s, d) => {
      // the scenario IS "corpus curated and indexed, delta arrives": the
      // prefix funnel is the past run's snapshot, the delta funnel screens
      // only the delta against the staged band index, and the merged
      // totals must equal the from-scratch funnel the oracle computes
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_lsh_funnel_" + Integer.toHexString(d.hashCode)).toString
      Dedup.buildLshBandIndex(s, d, idx, maxDocIdExclusive = split)
      TextAnalysis.mergeFunnels(
        TextAnalysis.corpusFunnelSlice(s, d, split),
        TextAnalysis.corpusFunnelDelta(s, d, idx, split))
    }),
    // ---- deduplication ----
    "q_dedup_exact" -> (Dedup.exact(_, _)),
    "q_substring_spans" -> (Dedup.substringSpans(_, _)),
    "q_dedup_ngram_jaccard" -> (Dedup.ngramJaccard(_, _)),
    "q_dedup_winnow" -> (Dedup.winnowPairs(_, _)),
    "q_dedup_substring" -> (Dedup.substringDedup(_, _)),
    "q_dedup_substring_incremental" -> ((s, d) => {
      // "corpus already gram-indexed, delta arrives": stage the index for
      // the older 80% of doc_ids, then screen only the delta against it
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_gram_inc_" + Integer.toHexString(d.hashCode)).toString
      Dedup.buildGramIndex(s, d, idx, maxDocIdExclusive = split)
      Dedup.substringDedupIncremental(s, d, idx, split)
    }),
    "q_substring_dup_profile" -> (Dedup.substringDupProfile(_, _)),
    "q_dedup_substring_rewrite" -> (Dedup.substringDedupRewrite(_, _)),
    "q_dedup_prefix_filter" -> (Dedup.prefixFilterJaccard(_, _)),
    "q_dedup_containment" -> (Dedup.containment(_, _)),
    "q_fuzzy_join_names" -> (Dedup.fuzzyMatchNames(_, _)),
    "q_source_overlap" -> (Dedup.sourceOverlap(_, _)),
    "q_bloom_screen" -> (Dedup.bloomScreen(_, _)),
    "q_lsh_band_stats" -> (Dedup.lshBandStats(_, _)),
    "q_dedup_minhash_lsh" -> (Dedup.minHashLsh(_, _)),
    "q_dedup_recall_report" -> (Dedup.dedupRecallReport(_, _)),
    "q_dedup_apply" -> (Dedup.dedupCorpus(_, _)),
    "q_dup_clusters" -> (Dedup.dupClusters(_, _)),
    "q_dup_clusters_incremental" -> ((s, d) => {
      // "corpus already clustered + indexed, delta arrives": new pairs
      // from the staged band index fold into the prior labeling via
      // contracted-graph propagation; the oracle recomputes from scratch
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      val idx = Similarity.appScratchDir(s, "graft_lsh_clusters", d)
      Dedup.buildLshBandIndex(s, d, idx, maxDocIdExclusive = split)
      Dedup.dupClustersIncremental(s, d, idx, split)
    }),
    "q_dedup_simhash" -> (Dedup.simHash(_, _)),
    "q_dedup_simhash_pairs" -> (Dedup.simHashPairs(_, _)),
    "q_dedup_sorted_neighborhood" -> (Dedup.sortedNeighborhoodPairs(_, _)),
    "q_dedup_incremental" -> ((s, d) => {
      // the scenario IS "corpus already indexed, delta arrives": the
      // wrapper stages the band index for the older 80% of doc_ids, then
      // runs only the delta against it
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      // deterministic per-(app, sfDir) staging path, rewritten in place
      // (overwrite) — repeated runs within an application reuse the
      // location; the appScratchDir naming (configurable root + corpus
      // MD5 + applicationId) keeps it executor-visible off local mode,
      // collision-free across corpora, and race-free across apps
      val idx = Similarity.appScratchDir(s, "graft_lsh_inc", d)
      Dedup.buildLshBandIndex(s, d, idx, maxDocIdExclusive = split)
      Dedup.minHashLshIncremental(s, d, idx, split)
    }),
    // ---- similarity search ----
    "q_ann_bruteforce_topk" -> (Similarity.bruteForceTopK(_, _)),
    "q_bitext_margin" -> (Similarity.bitextMarginMine(_, _)),
    "q_bitext_margin_index" -> (Similarity.bitextMarginIndexed(_, _)),
    "q_semantic_decontaminate" -> (Similarity.semanticDecontaminate(_, _)),
    "q_semantic_decontaminate_incremental" -> ((s, d) => {
      // "corpus already indexed, an embedding delta arrives": rebuild the
      // prefix index (overwrite — keeps the entry idempotent across
      // reruns), APPEND the newest 20% through the r14 boundary guard,
      // then screen from the grown index. The frozen first-N quantizer
      // (centroids = vec_id < 16 < split) makes every assignment
      // identical to the one-shot build, so the parent's oracle text is
      // exact — the incremental face moves index maintenance, never the
      // verdict arithmetic.
      val maxId = s.read.parquet(s"$d/embeddings.parquet")
        .agg(max(col("vec_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      // the frozen-quantizer invariant below (centroids = vec_id < 16 <
      // split) is what makes the incremental face equal the one-shot
      // build — enforce it instead of assuming it on tiny corpora
      require(split > 16,
        s"q_semantic_decontaminate_incremental needs maxId >= 21 so the " +
          s"80% prefix (split=$split) covers the 16 first-N centroids")
      val idx = Similarity.appScratchDir(s, "graft_decon_inc", d)
      Similarity.buildIvfIndex(s, d, idx, nLists = 16,
        maxVecIdExclusive = split)
      Similarity.appendToIvfIndex(s, d, idx, minVecId = split, nLists = 16)
      Similarity.semanticDecontaminateFromIndex(s, d, idx)
    }),
    "q_mmr_rerank" -> (Similarity.mmrRerank(_, _)),
    "q_embed_drift" -> (Similarity.embedDrift(_, _)),
    "q_hard_negatives" -> (Similarity.hardNegatives(_, _)),
    "q_ann_lsh_topk" -> (Similarity.annLshTopK(_, _)),
    "q_ann_ivf_topk" -> (Similarity.ivfTopK(_, _)),
    "q_kmeans_cluster_report" -> ((s, d) => Similarity.clusterReport(s, d,
      TrainedIvf.nLists, TrainedIvf.iters)),
    "q_ann_recall_report" -> ((s, d) => Similarity.recallReport(s, d,
      TrainedIvf.nQueries, TrainedIvf.k, TrainedIvf.nLists, TrainedIvf.nProbe,
      TrainedIvf.iters)),
    "q_ann_ivf_trained_topk" -> ((s, d) => Similarity.ivfTopKTrained(s, d,
      nQueries = TrainedIvf.nQueries, k = TrainedIvf.k, nLists = TrainedIvf.nLists,
      nProbe = TrainedIvf.nProbe, iters = TrainedIvf.iters)),
    "q_ann_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d,
      nQueries = PqAnn.nQueries, k = PqAnn.k, m = PqAnn.m,
      subDim = PqAnn.subDim, ksub = PqAnn.ksub, iters = PqAnn.iters)),
    "q_ann_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d,
      nQueries = IvfPq.nQueries, k = IvfPq.k, nLists = IvfPq.nLists,
      nProbe = IvfPq.nProbe, coarseIters = IvfPq.coarseIters, m = IvfPq.m,
      subDim = IvfPq.subDim, ksub = IvfPq.ksub, pqIters = IvfPq.pqIters)),
    // nLists rides the AutoNLists derivation (max(16, n/320)): at every
    // oracle-checked SF (500/500/2000 vectors) it resolves to exactly
    // SemDedup.nLists = 16, so the static DuckDB oracle and the front-door
    // twin are untouched — the lever only engages past 5120 vectors
    // (sf1 fixture: 20k -> 62, the probed U-shape minimum), where no
    // oracle runs and bench time is the contract
    "q_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d,
      nLists = Similarity.AutoNLists, iters = SemDedup.iters,
      thresholdMicros = SemDedup.thresholdMicros)),
    "q_semantic_dedup_incremental" -> ((s, d) => {
      // "corpus already semantically deduped, delta arrives": the frozen
      // prefix-trained quantizer is staged, the prior labeling stands in
      // for the previous run's persisted output, and only the delta is
      // quantized and compared (against touched clusters). The oracle
      // recomputes from scratch with the same frozen training bound.
      val maxId = sources.Tables.spread(s, d, "embeddings")
        .agg(max(col("vec_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      val qdir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_semdedup_q_" + Integer.toHexString(d.hashCode)).toString
      Similarity.stageIvfQuantizer(s, d, qdir, nLists = SemDedup.nLists,
        iters = SemDedup.iters, trainMaxVecIdExclusive = split)
      val prior = Similarity.semanticDedup(s, d, nLists = SemDedup.nLists,
        iters = SemDedup.iters, thresholdMicros = SemDedup.thresholdMicros,
        maxVecIdExclusive = split, trainMaxVecIdExclusive = split)
      Similarity.semanticDedupIncremental(s, d, qdir, split, prior,
        thresholdMicros = SemDedup.thresholdMicros)
    }),
    "q_hybrid_search" -> ((s, d) => Retrieval.hybridTopK(s, d,
      nQueries = Hybrid.nQueries, candK = Hybrid.candK, k = Hybrid.k,
      rrfK = Hybrid.rrfK, maxDf = Hybrid.maxDf)),
    "q_bm25_search" -> ((s, d) => Retrieval.bm25TopK(s, d,
      nQueries = Bm25.nQueries, k = Bm25.k, maxDfPermille = Bm25.maxDfPermille,
      k1Milli = Bm25.k1Milli, bMilli = Bm25.bMilli)),
    "q_phrase_search" -> ((s, d) => Retrieval.phraseSearch(s, d, Phrase.tokens)),
    "q_ann_dim_ablation" -> ((s, d) => Similarity.dimAblation(s, d,
      dims = Ablation.dims, nQueries = Ablation.nQueries, k = Ablation.k)),
    "q_cluster_sample" -> ((s, d) => Similarity.clusterBalancedSample(s, d,
      nLists = SemDedup.nLists, iters = SemDedup.iters,
      perCluster = ClusterSample.perCluster)),
    "q_embed_nearest_in_label" -> (Similarity.nearestInLabel(_, _)),
    "q_embed_lsh_pairs" -> (Similarity.embeddingLshPairs(_, _)),
    "q_centroid_affinity" -> (Similarity.labelCentroidAffinity(_, _)),
    "q_embed_dim_stats" -> (Similarity.dimStats(_, _)),
    "q_label_separability" ->
      (Similarity.labelSeparability(_, _, 0, 1)),
    "q_embed_gram" -> (Similarity.gramMatrix(_, _)),
    // ---- multimodal ----
    "q_multimodal_features" -> (Multimodal.assetFeatures(_, _)),
    "q_image_dedup" -> (Multimodal.imageDedup(_, _)),
    "q_image_near_dup" -> (Multimodal.imageNearDup(_, _, ImageTol.tol)),
    "q_frame_features" -> (Multimodal.frameFeatures(_, _)),
    "q_audio_features" -> (Multimodal.audioFeatures(_, _)),
    // ---- deterministic sampling / dataset mixing ----
    "q_sample_hash_docs" -> (Sampling.sampledDocs(_, _)),
    "q_sample_weighted_mix" -> (Sampling.weightedMix(_, _)),
    "q_temperature_mix" -> (Sampling.temperatureMix(_, _)),
    "q_sample_token_budget" -> (Sampling.tokenBudgetMix(_, _)),
    "q_sample_exact_n" -> (Sampling.exactNPerSource(_, _)),
    // ---- embedding quantization ----
    "q_embed_quantize" -> (Quantize.int8Summary(_, _)),
    // ---- corpus curation / layout ----
    "q_boilerplate" -> (TextAnalysis.boilerplate(_, _)),
    "q_quality_calibrated" -> (TextAnalysis.calibrateQuality(_, _)),
    "q_quantile_normalize" -> (TextAnalysis.quantileNormalize(_, _)),
    "q_length_filter_impact" -> (TextAnalysis.lengthFilterImpact(_, _)),
    "q_dedup_threshold_sweep" -> (Dedup.thresholdSweep(_, _)),
    "q_dup_cluster_sizes" -> (Dedup.dupClusterSizes(_, _)),
    "q_dedup_keep_best" -> (Curation.keepBestPerCluster(_, _)),
    "q_mix_apportion" -> (Curation.apportionBudget(_, _)),
    "q_decontaminate" -> (Curation.decontaminate(_, _)),
    "q_contamination_report" -> (Curation.contaminationReport(_, _)),
    "q_pack_sequences" -> (Curation.packSequences(_, _)),
    "q_split_stratified" -> (Curation.stratifiedSplit(_, _)),
    "q_pack_sequences_incremental" -> ((s, d) => {
      // "prefix already packed, delta arrives": the delta continues each
      // source's token stream from the carried offsets; the oracle packs
      // from scratch, proving merge == rescan
      val maxId = sources.Tables.documents(s, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId * 4 / 5
      Curation.mergePacked(
        Curation.packSequencesSlice(s, d, 512, 0L, split),
        Curation.packSequencesSlice(s, d, 512, split, Long.MaxValue,
          Some(Curation.packOffsets(s, d, split))))
    }),
    "q_pack_efficiency" -> (Curation.packEfficiency(_, _)),
    "q_zorder_layout" -> (Layout.zorderCells(_, _)),
    "q_zone_prune_audit" -> (Layout.zonePruneAudit(_, _)),
    "q_ks_drift" -> (Quality.ksDrift(_, _)),
    "q_benford_audit" -> (Quality.benfordAudit(_, _)),
    "q_column_hhi" -> (Quality.columnHhi(_, _)),
    "q_balanced_downsample" -> (Sampling.balancedDownsample(_, _)),
    "q_attribution_position" -> (Analytics.positionAttribution(_, _)),
    "q_markov_attribution" ->
      (Analytics.markovAttribution(_, _, Markov.rounds)),
    "q_attribution_time_decay" ->
      (Analytics.timeDecayAttribution(_, _)),
    "q_readability" -> (TextAnalysis.readability(_, _)),
    "q_decode_roundtrip" -> (TextAnalysis.decodeRoundtrip(_, _)),
    "q_connected_components" ->
      (Mining.connectedComponents(_, _, Basket.maxItems, Basket.ccMinCo,
        Basket.ccRounds, Basket.topK)),
    "q_clustering_coeff" ->
      (Mining.clusteringCoeff(_, _, Basket.maxItems, Basket.coeffMinDeg,
        Basket.topK)),
    "q_zipf_profile" -> (TextAnalysis.zipfProfile(_, _)),
    "q_winsorized_stats" -> (Analytics.winsorizedStats(_, _)),
    "q_retrieval_eval" -> (Retrieval.retrievalEval(_, _)),
    "q_dup_flow" -> (Dedup.dupFlow(_, _)),
    "q_split_leakage" -> (Curation.splitLeakage(_, _)),
    "q_selection_gain" -> (Curation.selectionGain(_, _)),
    "q_lang_confusion" -> (TextAnalysis.langConfusion(_, _)),
    "q_lang_diversity" -> (TextAnalysis.langDiversity(_, _)),
    "q_source_mix_diversity" ->
      (TextAnalysis.sourceMixDiversity(_, _)),
    "q_weighted_len_pctl" ->
      (TextAnalysis.weightedLengthPercentiles(_, _)),
    "q_vocab_drift" -> (TextAnalysis.vocabDrift(_, _)),
    "q_journey_trigrams" -> (Analytics.journeyTrigrams(_, _)),
    "q_shot_boundaries" -> (Multimodal.shotBoundaries(_, _)),
    "q_token_burstiness" -> (TextAnalysis.tokenBurstiness(_, _)),
    "q_dup_rate_trend" -> (Dedup.dupRateTrend(_, _)),
    "q_sample_pps" -> (Sampling.ppsSample(_, _)),
    "q_degree_histogram" -> (Mining.degreeHistogram(_, _, Basket.maxItems)),
    "q_tokenizer_fertility" -> (TextAnalysis.tokenizerFertility(_, _)),
    "q_kcore_membership" ->
      (Mining.kcoreMembership(_, _, Basket.maxItems, Basket.ccMinCo,
        Basket.kcoreK, Basket.kcoreRounds))
  )

  // ------------------------------------------------------------------
  // DuckDB oracles. Table names resolve to {sfDir}/{name}.parquet.
  // ------------------------------------------------------------------

  // twin of TextAnalysis.TokensExpr (incl. the null-text -> empty-list
  // coalesce)
  private val Toks = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')"

  /** Twin of TextAnalysis.chunkDocs (size 40 / stride 30). */
  private def chunkCtes: String =
    s"""d AS (SELECT doc_id, $Toks AS ws FROM documents),
       st AS (SELECT doc_id, ws, unnest(range(0, len(ws), 30)) AS start
              FROM d WHERE len(ws) >= 1),
       ch AS (SELECT doc_id, CAST(start // 30 AS BIGINT) AS chunk_idx,
              list_slice(ws, start + 1, least(start + 40, len(ws))) AS chunk
              FROM st)"""

  private val ShinglesCte =
    s"""d AS (SELECT doc_id, $Toks AS ws FROM documents),
        shd AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
                FROM d WHERE len(ws) >= 3)"""

  /** Left-to-right double dot product with pinned evaluation order.
    * Deliberately NOT list_dot_product: a builtin is free to change its
    * accumulation order/precision between DuckDB releases, while this
    * explicit fold is bit-identical to Spark's dot_f on every engine
    * that implements IEEE-754 doubles.
    */
  private def dotSql(a: String, b: String): String =
    // CASE guard: list_reduce errors on an empty list (where Spark's dot_f
    // returns 0.0), so a zero-length embedding in a future fixture would
    // fail the oracle query instead of comparing. CAST(0 AS DOUBLE), not
    // 0.0 — newer DuckDB types decimal literals as DECIMAL.
    s"CASE WHEN len($a) = 0 THEN CAST(0 AS DOUBLE) ELSE " +
      s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y) END"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** DuckDB twins of Similarity.scoreMicrosExpr / Micro4 (integer-exact
    * score handling — see that scaladoc for why). floor(x + 0.5) instead of
    * round(): engines disagree on round()'s tie-breaking and result type
    * across versions, while floor on an explicit DOUBLE is universal.
    */
  private def cosMicrosSql(a: String, b: String): String =
    s"CAST(floor((${cosSql(a, b)}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
  private val micro4Sql =
    "CAST(CASE WHEN m >= 0 THEN (m + 50) // 100 ELSE -((-m + 50) // 100) END AS BIGINT)"

  /** DuckDB twin of Similarity.ivfTopKTrained: fixed-iteration Lloyd's
    * k-means over BIGINT quantization codes, unrolled as one CTE chain
    * per iteration (assign -> component-sum -> centroid list), then the
    * standard IVF probe/candidate/re-rank tail. Centroids are exact
    * integer component SUMS (order-free on both engines); every double
    * is a pinned-order fold of CAST(int AS DOUBLE) products, so the
    * trained centroids — and therefore the search result — are
    * bit-identical to Spark's without embedding any data-derived literal.
    */
  /** The single source of the q_ann_ivf_trained_topk parameters: the
    * registry query calls Similarity.ivfTopKTrained with exactly these and
    * the oracle builder below takes the same values, so operator call and
    * oracle cannot drift (the dim is never hardcoded — the oracle derives
    * it from len(code)).
    */
  /** Collocation-mining parameters shared by operator, oracle, and twin. */
  private[graft] object Colloc {
    val minCount = 5L; val topK = 25
  }

  /** Domain-affinity target feed, shared by operator, oracle, and twin. */
  private[graft] object Affinity {
    val targetSource = "src0"
  }

  /** Bigram-LM reference slice, shared by operator, oracle, and twin. */
  private[graft] object BigramLm {
    val refLang = "en"
  }

  /** Heavy-hitter sketch capacity / share threshold (an item qualifies
    * when count * k > n), shared by operator, oracle, and twin. The MG
    * guarantee makes the sketch's candidate set a superset of exactly
    * this threshold's answer, so one constant serves both roles.
    */
  private[graft] object Heavy {
    val k = 64
  }

  /** Phrase-search query phrase, shared by operator, oracle, and twin.
    * Chosen to occur at every fixture SF (46/46/293 matches at
    * sf0.001/0.01/0.1) so the query never degenerates to empty.
    */
  private[graft] object Phrase {
    val tokens = Seq("part", "filter")
  }

  /** Matryoshka dim-ablation parameters (prefix dims / query set / k),
    * shared by operator, oracle, and twin.
    */
  private[graft] object Ablation {
    val dims = Seq(8, 16, 32); val nQueries = 10; val k = 5
  }

  /** approx_percentile sketch accuracy (rank error <= n/accuracy),
    * shared by operator and twin (the oracle pins the exact percentiles
    * and the expected all-within-bound flags; DuckDB never sees the
    * sketch value, which is legitimately partitioning-dependent).
    */
  private[graft] object ApproxPct {
    val accuracy = 1000
  }

  /** Image near-dup gray tolerance (generator gray levels are multiples
    * of 4 in [0, 252], so tol=8 groups up to two steps of brightness).
    */
  private[graft] object ImageTol {
    val tol = 8
  }

  /** Market-basket / skyline parameters shared by operator, oracle, and
    * spec. maxItems = 8 comfortably clears every TPC-H-style order (<= 7
    * lineitems) while making the whale-basket guard a real, exercised
    * code path; the Pareto band is $50 of price per bucket so every SF
    * produces a multi-bucket frontier.
    */
  /** BPE training depth, shared by operator, oracle, and twin — each
    * merge is one unrolled CTE round in the SQL surfaces (the pagerank
    * pattern), so the count stays modest there while the operator loop
    * scales to any depth.
    */
  private[graft] object Bpe {
    val merges = 8
  }

  /** DSIR-style importance selection: target domain + kept-pool size,
    * shared by operator, oracle, and twin.
    */
  private[graft] object Dsir {
    val target = "src0"
    val k = 50
  }

  /** Markov removal-effect attribution: fixed value-iteration rounds
    * shared by operator, oracle, and twin (bounded-round semantics is the
    * contract — both engines run identical rounds over the catalog-sized
    * scenario x state frame; 12 comfortably exceeds the fixtures' journey
    * mixing depth).
    */
  private[graft] object Markov {
    val rounds = 12
  }

  private[graft] object Basket {
    val maxItems = 8
    val topK = 25
    val paretoBandCents = 5000L
    val pagerankIters = 10
    val joinEstBuckets = 32
    val bfsHops = 4
    val closenessSources = 8 // the panel: smallest node ids, deterministic
    val spRounds = 4 // Bellman-Ford relaxations; matches the BFS horizon
    val jaccardMinCo = 2
    val jaccardTopN = 100
    val ccRounds = 12 // comfortably past the observed radius at sf0.01/0.1
    val ccMinCo = 2 // repeat-support edges only; the raw graph is one blob
    val coeffMinDeg = 2
    // k = 2 (the cycle core: peeling degree-1 nodes removes every tree)
    // keeps the output non-degenerate ACROSS scales: repeat-support
    // co-purchase edges get relatively sparser as the part catalog grows,
    // and the k = 3 core is already empty at sf0.1 (236 nodes at sf0.01)
    val kcoreK = 2
    val kcoreRounds = 8 // fixed peels; fixture fixed point is ~3 rounds
  }

  /** Sketch parameters shared by operators, twins, and specs. The oracles
    * pin the exact answers plus all-pass bound flags; DuckDB never runs
    * the sketches themselves (see Sketches.scala for each bound's
    * derivation).
    */
  private[graft] object Sketch {
    val rsd = 0.05            // approx_count_distinct relative std-dev
    val lgK = 12              // DataSketches HLL log2(registers)
    val cmsEps = 0.001        // CMS overcount bound: est <= exact + eps*N
    val cmsConfidence = 0.999 // probability the eps bound holds
    val kllK = 200            // KLL quantile-sketch size parameter
  }

  /** Throttle-dedup window, shared by operator, oracle, and twin. The
    * fixtures span 30 days, so 24h bounds the kept chain (= recursion
    * depth in the SQL surfaces) at ~31 — safely inside Spark's default
    * 100-level recursive-CTE limit.
    */
  private[graft] object Throttle {
    val windowHours = 24
    val windowUs: Long = windowHours * 3600L * 1000000L
  }

  private[graft] object TrainedIvf {
    val iters = 2; val nLists = 16; val nQueries = 10; val nProbe = 3; val k = 5
  }

  /** DuckDB left-to-right double dot of two BIGINT lists (shared by the
    * trained-quantizer oracles).
    */
  private def dotCodesDuck(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** The shared trained-quantizer CTE chain (DuckDB dialect): codes →
    * fixed-iteration k-means → final scoredF/assignF. Both the trained-IVF
    * oracle and the semantic-dedup oracle build on exactly this prefix, so
    * the quantizer is defined once.
    */
  /** The WITH header shared by every trained-quantizer oracle: embeddings
    * as doubles, BIGINT quantization codes, code-space norms.
    */
  private def codesHeaderCtes: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         codes AS (SELECT vec_id,
           list_transform(v, x -> CAST(floor(x * CAST(1048576 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS code FROM e),
         codes_n AS (SELECT vec_id, code, sqrt(${dotCodesDuck("code", "code")}) AS vqn
                     FROM codes)"""

  /** @param trainFilterSql optional predicate bounding the TRAINING rows
    *        (the k-means iterations); the final assignment still covers
    *        every vector — the frozen-prefix-quantizer shape the
    *        incremental paths rely on. Empty = train on everything.
    */
  private def trainedAssignCtes(iters: Int, nLists: Int,
                                trainFilterSql: String = ""): String = {
    def dotc(a: String, b: String): String = dotCodesDuck(a, b)
    def cmOf(a: String, b: String, na: String, nb: String): String =
      s"CAST(floor((${dotc(a, b)} / ($na * $nb)) " +
        "* CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val trainSrc = if (trainFilterSql.isEmpty) "codes_n" else "codes_t"
    val sb = new StringBuilder
    sb.append(codesHeaderCtes)
    if (trainFilterSql.nonEmpty) sb.append(
      s""",
         codes_t AS (SELECT * FROM codes_n WHERE $trainFilterSql)""")
    sb.append(
      s""",
         cent0 AS (SELECT vec_id AS centroid_id, code AS csum
                   FROM codes WHERE vec_id < $nLists),""")
    for (t <- 1 to iters) {
      val p = t - 1
      sb.append(
        s"""
         cn$p AS (SELECT centroid_id, csum, sqrt(${dotc("csum", "csum")}) AS cqn
                  FROM cent$p),
         scored$t AS (SELECT c.vec_id, c.code, k.centroid_id,
                      ${cmOf("c.code", "k.csum", "c.vqn", "k.cqn")} AS cm
                      FROM $trainSrc c CROSS JOIN cn$p k),
         assign$t AS (SELECT vec_id, code, centroid_id FROM (
                      SELECT vec_id, code, centroid_id,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY cm DESC, centroid_id) AS rn
                      FROM scored$t) s WHERE rn = 1),
         sums$t AS (SELECT centroid_id, i, SUM(c) AS s FROM (
                      SELECT centroid_id,
                             unnest(range(1, len(code) + 1)) AS i,
                             unnest(code) AS c
                      FROM assign$t) z$t
                    GROUP BY centroid_id, i),
         cent$t AS (SELECT centroid_id, list(s ORDER BY i) AS csum
                    FROM sums$t GROUP BY centroid_id),""")
    }
    sb.append(
      s"""
         cnF AS (SELECT centroid_id, csum, sqrt(${dotc("csum", "csum")}) AS cqn
                 FROM cent$iters),
         scoredF AS (SELECT c.vec_id, k.centroid_id,
                     ${cmOf("c.code", "k.csum", "c.vqn", "k.cqn")} AS cm
                     FROM codes_n c CROSS JOIN cnF k),
         assignF AS (SELECT vec_id, centroid_id FROM (
                     SELECT vec_id, centroid_id,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cm DESC, centroid_id) AS rn
                     FROM scoredF) s WHERE rn = 1)""")
    sb.toString
  }

  private def trainedIvfSql(iters: Int, nLists: Int, nQueries: Int,
                            nProbe: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(trainedAssignCtes(iters, nLists))
    sb.append(
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < $nQueries) s WHERE rn <= $nProbe),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assignF a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries) q
                  ON q.qid = cand.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM rr)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= $k ORDER BY query_id, rank""")
    sb.toString
  }

  /** Recall@k of the trained-IVF chain against the exhaustive scan —
    * approx and exact sides share the `e` CTE, the overlap count and the
    * fixed-point recall are pure integers.
    */
  private def recallReportSql(iters: Int, nLists: Int, nQueries: Int,
                              nProbe: Int, k: Int): String =
    trainedAssignCtes(iters, nLists) +
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < $nQueries) s WHERE rn <= $nProbe),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assignF a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $nQueries) q
                  ON q.qid = cand.query_id),
         approx AS (SELECT query_id, vec_id FROM (
                    SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY m DESC, vec_id) AS rank
                    FROM rr) r WHERE rank <= $k),
         scoredX AS (SELECT q.qid AS query_id, e.vec_id,
                     ${cosMicrosSql("q.qv", "e.v")} AS m
                     FROM e CROSS JOIN (SELECT vec_id AS qid, v AS qv FROM e
                                        WHERE vec_id < $nQueries) q
                     WHERE e.vec_id <> q.qid),
         exact AS (SELECT query_id, vec_id FROM (
                   SELECT query_id, vec_id,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY m DESC, vec_id) AS rank
                   FROM scoredX) r WHERE rank <= $k),
         mt AS (SELECT x.query_id, CAST(count(a.vec_id) AS BIGINT) AS n_match
                FROM exact x LEFT JOIN approx a
                  ON a.query_id = x.query_id AND a.vec_id = x.vec_id
                GROUP BY x.query_id)
         SELECT query_id, n_match,
                CAST((20000 * n_match + $k) // (2 * $k) AS BIGINT) AS recall_1e4
         FROM mt ORDER BY query_id"""

  /** Single parameter source for q_semantic_dedup (operator call, oracle,
    * and front-door twin all read these).
    */
  private[graft] object SemDedup {
    // 0.40 cosine: on the driver fixture's random-ish embeddings the
    // nearest-neighbor cosine tops out near 0.5-0.6, so this threshold
    // exercises real drops at every SF while staying a high-similarity
    // bar for the data's distribution (a production corpus with true
    // near-dups would run 0.9+)
    val iters = 2; val nLists = 16; val thresholdMicros = 400000L
  }

  /** Cluster-balanced sampling quota — shared by the operator call, the
    * DuckDB oracle, and the SqlFrontDoor twin (one parameter source, per
    * the round-6 advisory on the trained-IVF twin).
    */
  private[graft] object ClusterSample {
    val perCluster = 12
  }

  /** Hybrid-retrieval parameters — one source for operator, oracle, and
    * front-door twin.
    */
  private[graft] object Hybrid {
    val nQueries = 10; val candK = 20; val k = 10; val rrfK = 60
    val maxDf = 100
  }

  /** BM25 parameters — one source for operator, oracle, and front-door
    * twin. k1/b are the Okapi defaults in milli-scale.
    */
  private[graft] object Bm25 {
    val nQueries = 10; val k = 10; val maxDfPermille = 800
    val k1Milli = 1200; val bMilli = 750
  }

  /** DuckDB twin of Similarity.semanticDedup: the shared trained-quantizer
    * chain assigns every vector to a cluster, then a vector is dropped iff
    * some SMALLER-id vector in the same cluster clears the exact float
    * cosine threshold.
    */
  private def semanticDedupSql(iters: Int, nLists: Int,
                               thresholdMicros: Long,
                               trainFilterSql: String = ""): String =
    trainedAssignCtes(iters, nLists, trainFilterSql) +
      s""",
         drops AS (SELECT DISTINCT a.vec_id
                   FROM assignF a
                   JOIN assignF b ON a.centroid_id = b.centroid_id
                                 AND b.vec_id < a.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id
                   WHERE ${cosMicrosSql("ea.v", "eb.v")} >= $thresholdMicros)
         SELECT a.vec_id, a.centroid_id AS cluster_id,
                d.vec_id IS NULL AS kept
         FROM assignF a LEFT JOIN drops d ON d.vec_id = a.vec_id
         ORDER BY a.vec_id"""

  /** Single parameter source for q_ann_pq_topk. dim = m * subDim must
    * equal the embedding dimension (64).
    */
  private[graft] object PqAnn {
    val m = 8; val subDim = 8; val ksub = 16; val iters = 2
    val nQueries = 10; val k = 5
  }

  /** DuckDB twin of Similarity.pqTopK: per-subspace k-means (the trained
    * chain with sub_id as an extra key), PQ encoding, then ADC scoring —
    * per (query, vector) the m lut values fold in pinned sub order, and
    * the approximate cosine divides by |q| and the reconstruction norm
    * exactly as the operator does.
    */
  /** The PQ codebook CTE chain (DuckDB dialect), composable after any
    * block that defines codes/codes_n: per-subspace k-means → final
    * per-(vec, sub) assignment (passignF), reconstruction norms (xs), and
    * per-query lut rows (plut). All names are p-prefixed so the chain
    * coexists with the coarse trained chain in one WITH.
    */
  private def pqCodebookCtes(m: Int, subDim: Int, ksub: Int, iters: Int,
                             nQueries: Int): String = {
    def dotc(a: String, b: String): String = dotCodesDuck(a, b)
    def cmOf(a: String, b: String, na: String, nb: String): String =
      s"CAST(floor((${dotc(a, b)} / ($na * $nb)) " +
        "* CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val sb = new StringBuilder
    sb.append(
      s"""subc AS (SELECT vec_id, s.sub_id,
                  code[s.sub_id * $subDim + 1 : s.sub_id * $subDim + $subDim] AS scode
                  FROM codes, (SELECT unnest(range(0, $m)) AS sub_id) s),
         subc_n AS (SELECT vec_id, sub_id, scode, sqrt(${dotc("scode", "scode")}) AS sqn
                    FROM subc),
         pcent0 AS (SELECT sub_id, vec_id AS centroid_id, scode AS csum,
                    CAST(1 AS BIGINT) AS cnt
                    FROM subc WHERE vec_id < $ksub),""")
    for (t <- 1 to iters) {
      val p = t - 1
      sb.append(
        s"""
         pcn$p AS (SELECT sub_id, centroid_id, csum,
                   sqrt(${dotc("csum", "csum")}) AS cqn
                   FROM pcent$p),
         pscored$t AS (SELECT c.vec_id, c.sub_id, c.scode, k.centroid_id,
                       ${cmOf("c.scode", "k.csum", "c.sqn", "k.cqn")} AS cm
                       FROM subc_n c JOIN pcn$p k ON c.sub_id = k.sub_id),
         passign$t AS (SELECT vec_id, sub_id, scode, centroid_id FROM (
                       SELECT vec_id, sub_id, scode, centroid_id,
                              row_number() OVER (PARTITION BY vec_id, sub_id
                                                 ORDER BY cm DESC, centroid_id) AS rn
                       FROM pscored$t) s WHERE rn = 1),
         psums$t AS (SELECT sub_id, centroid_id, i, SUM(c) AS s, COUNT(*) AS n FROM (
                       SELECT sub_id, centroid_id,
                              unnest(range(1, len(scode) + 1)) AS i,
                              unnest(scode) AS c
                       FROM passign$t) z$t
                     GROUP BY sub_id, centroid_id, i),
         pcent$t AS (SELECT sub_id, centroid_id, list(s ORDER BY i) AS csum,
                     MAX(n) AS cnt
                     FROM psums$t GROUP BY sub_id, centroid_id),""")
    }
    sb.append(
      s"""
         pcnFn AS (SELECT sub_id, centroid_id, csum, cnt,
                   sqrt(${dotc("csum", "csum")}) AS cqn
                   FROM pcent$iters),
         pscoredF AS (SELECT c.vec_id, c.sub_id, k.centroid_id,
                      ${cmOf("c.scode", "k.csum", "c.sqn", "k.cqn")} AS cm
                      FROM subc_n c JOIN pcnFn k ON c.sub_id = k.sub_id),
         passignF AS (SELECT vec_id, sub_id, centroid_id FROM (
                      SELECT vec_id, sub_id, centroid_id,
                             row_number() OVER (PARTITION BY vec_id, sub_id
                                                ORDER BY cm DESC, centroid_id) AS rn
                      FROM pscoredF) s WHERE rn = 1),
         nsq AS (SELECT sub_id, centroid_id,
                 ${dotc("csum", "csum")} / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS nsq
                 FROM pcnFn),
         xs AS (SELECT a.vec_id,
                sqrt(list_reduce(list(n.nsq ORDER BY a.sub_id), (x, y) -> x + y)) AS xn
                FROM passignF a
                JOIN nsq n ON n.sub_id = a.sub_id AND n.centroid_id = a.centroid_id
                GROUP BY a.vec_id),
         plut AS (SELECT q.vec_id AS query_id, c.sub_id, c.centroid_id,
                  ${dotc("q.scode", "c.csum")} / CAST(c.cnt AS DOUBLE) AS lv
                  FROM subc_n q JOIN pcnFn c ON q.sub_id = c.sub_id
                  WHERE q.vec_id < $nQueries)""")
    sb.toString
  }

  /** The ADC scoring tail (DuckDB dialect) after pqCodebookCtes. With
    * `candidateCte` set, only (query, vec) pairs in that CTE are scored —
    * the IVF-PQ composition; empty scores the full corpus per query.
    */
  private def pqAdcTail(k: Int, candidateCte: String = ""): String = {
    val candJoin =
      if (candidateCte.isEmpty) ""
      else s"JOIN $candidateCte c ON c.query_id = p.query_id AND c.vec_id = a.vec_id"
    s""",
         padc AS (SELECT p.query_id, a.vec_id,
                  list_reduce(list(p.lv ORDER BY a.sub_id), (x, y) -> x + y) AS adc
                  FROM passignF a
                  JOIN plut p ON p.sub_id = a.sub_id AND p.centroid_id = a.centroid_id
                  $candJoin
                  WHERE a.vec_id <> p.query_id
                  GROUP BY p.query_id, a.vec_id),
         pqscored AS (SELECT d.query_id, d.vec_id,
                    CAST(floor((d.adc / (q.vqn * x.xn)) * CAST(1000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
                    FROM padc d
                    JOIN codes_n q ON q.vec_id = d.query_id
                    JOIN xs x ON x.vec_id = d.vec_id),
         pqranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM pqscored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM pqranked WHERE rank <= $k ORDER BY query_id, rank"""
  }

  private def pqSql(m: Int, subDim: Int, ksub: Int, iters: Int,
                    nQueries: Int, k: Int): String =
    codesHeaderCtes + ",\n         " +
      pqCodebookCtes(m, subDim, ksub, iters, nQueries) + pqAdcTail(k)

  /** Single parameter source for q_ann_ivfpq_topk — coarse routing params
    * (TrainedIvf shapes) + PQ compression params (PqAnn shapes).
    */
  private[graft] object IvfPq {
    val nLists = 16; val nProbe = 3; val coarseIters = 2
    val m = 8; val subDim = 8; val ksub = 16; val pqIters = 2
    val nQueries = 10; val k = 5
  }

  /** DuckDB twin of Similarity.ivfPqTopK: the coarse trained chain routes
    * (probes/cand), the PQ chain compresses, and the ADC tail scores only
    * the candidates.
    */
  private def ivfPqSql(p: IvfPq.type): String =
    trainedAssignCtes(p.coarseIters, p.nLists) + ",\n         " +
      pqCodebookCtes(p.m, p.subDim, p.ksub, p.pqIters, p.nQueries) +
      s""",
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scoredF WHERE vec_id < ${p.nQueries}) s WHERE rn <= ${p.nProbe}),
         cand AS (SELECT DISTINCT pr.query_id, a.vec_id
                  FROM assignF a JOIN probes pr ON a.centroid_id = pr.centroid_id
                  WHERE a.vec_id <> pr.query_id)""" +
      pqAdcTail(p.k, candidateCte = "cand")

  /** The LSH hyperplanes as SQL literals (Double.toString round-trips
    * exactly, so the oracle computes the same signatures bit-for-bit).
    */
  private val planesValuesSql: String =
    Similarity.planeData().map { case (p, arr) =>
      s"($p, CAST([${arr.mkString(", ")}] AS DOUBLE[]))"
    }.mkString(", ")

  private val minhashSigs = (0 until Dedup.NumHashes).map(j =>
    s"list_aggregate(list_transform(sh, t -> substr(md5(t || ':${j / 4}'), ${(j % 4) * 8 + 1}, 8)), 'min') AS sig_$j")
    .mkString(", ")
  private val minhashBands = (0 until Dedup.Bands).map { b =>
    val parts = (0 until Dedup.RowsPerBand).map(r => s"sig_${b * Dedup.RowsPerBand + r}")
    s"md5(${parts.mkString(" || ")}) AS band_$b"
  }.mkString(", ")
  private val minhashBandRows = (0 until Dedup.Bands).map(b =>
    s"SELECT doc_id, $b AS band_idx, band_$b AS band_val FROM bands").mkString(" UNION ALL ")

  /** Shared CTE chain: shingles -> signatures -> bands -> LSH candidates ->
    * verified jaccard pairs (used by the pair query and the apply query).
    */
  private def minhashVerifyCtes: String =
    s"""$ShinglesCte,
       sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
       bands AS (SELECT doc_id, $minhashBands FROM sigs),
       br AS ($minhashBandRows),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM br a JOIN br b
                  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                     AND a.doc_id < b.doc_id),
       verify AS (
         SELECT doc_a, doc_b,
                (20000 * len(list_intersect(sa.sh, sb.sh))
                 + len(list_distinct(sa.sh || sb.sh)))
                // (2 * len(list_distinct(sa.sh || sb.sh))) AS jaccard_1e4
         FROM cand
         JOIN shd sa ON sa.doc_id = cand.doc_a
         JOIN shd sb ON sb.doc_id = cand.doc_b)"""

  /** DuckDB twin of Dedup.simhashExpr as a relational pipeline (unnest ->
    * one md5 per shingle -> 32-way vote sum -> bit assembly); results are
    * identical to Spark's HOF fold.
    */
  private val simhashSimsCte =
    """ex AS (SELECT doc_id, md5(unnest(sh)) AS hh FROM shd),
       votes AS (SELECT doc_id, p,
                 sum(CASE WHEN substr(hh, p + 1, 1) IN ('8','9','a','b','c','d','e','f')
                     THEN 1 ELSE -1 END) AS v
                 FROM ex CROSS JOIN range(0, 32) r(p) GROUP BY doc_id, p),
       sims AS (SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS simhash
                FROM votes GROUP BY doc_id)"""

  private val simhashBandRows = (0 until 4).map(b =>
    s"SELECT doc_id, simhash, $b AS band_idx, (simhash >> ${b * 8}) & 255 AS band_val FROM sims")
    .mkString(" UNION ALL ")

  /** KLL rollup surfaces: both paths answer to the same exact-column
    * text (DuckDB runs no sketch; flags are all-pass by the audited
    * bound).
    */
  private val quantileRollupOracle: String =
    """WITH e AS (SELECT event_type,
              CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
              CAST(count(value) AS BIGINT) AS n
            FROM events GROUP BY event_type)
       SELECT event_type, CAST(p AS DOUBLE) AS pct, n_days, n,
              CAST(1 AS INT) AS within_bound
       FROM e CROSS JOIN (VALUES (0.5), (0.9), (0.99)) pv(p)
       ORDER BY event_type, pct"""

  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // the incremental-curation oracles ARE the from-scratch recomputes:
    // merge(slice reports) must equal a full rescan, exactly
    "q_corpus_report_incremental" -> oracleSqlBase("q_corpus_report"),
    "q_corpus_funnel_incremental" -> oracleSqlBase("q_corpus_funnel"),
    "q_dup_clusters_incremental" -> oracleSqlBase("q_dup_clusters"),
    "q_pack_sequences_incremental" -> oracleSqlBase("q_pack_sequences"),
    "q_scd2_incremental" -> oracleSqlBase("q_scd2_intervals"))

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q_etl_transform" ->
      """SELECT event_id AS row_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS time,
         value AS traffic, '2026-01-01 00:00:00' AS created_at
         FROM events ORDER BY row_id""",

    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_join_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY l_orderkey, orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q_join_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         GROUP BY n_name ORDER BY n_name""",

    "q_outer_join_order_counts" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS order_count
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "q_semi_join_urgent_customers" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q_anti_join_orderless_customers" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q_distinct_agg_supplier_parts" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS distinct_parts,
         count(*) AS lineitems
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",

    "q_rollup_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n_orders, round(sum(o_totalprice), 4) AS total_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",

    "q_cube_events" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
         coalesce(hour, 'ALL') AS hour,
         count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM (SELECT event_type, strftime(ts, '%H') AS hour, value FROM events)
         GROUP BY CUBE(event_type, hour)
         ORDER BY event_type, hour""",

    "q_window_top_customers" ->
      """WITH revenue AS (
           SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue
           FROM orders GROUP BY o_custkey)
         SELECT c_nationkey, CAST(rk AS BIGINT) AS rk, c_custkey, revenue FROM (
           SELECT c_nationkey, c_custkey, revenue,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY revenue DESC, c_custkey) AS rk
           FROM revenue JOIN customer ON o_custkey = c_custkey) t
         WHERE rk <= 3 ORDER BY c_nationkey, rk""",

    "q_window_moving_avg" ->
      """WITH c AS (SELECT user_id, event_id, ts, value,
                    CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM events),
         f AS (SELECT user_id, event_id, value,
               CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS mv_cents,
               count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS mv_n
               FROM c)
         SELECT user_id, event_id, value,
                CAST(CASE WHEN mv_cents >= 0 THEN (200 * mv_cents + mv_n) // (2 * mv_n)
                     ELSE -((200 * -mv_cents + mv_n) // (2 * mv_n)) END AS BIGINT) AS moving_avg_1e4
         FROM f ORDER BY user_id, event_id""",

    "q_upsert_orders" ->
      s"""WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
         u AS (SELECT o_orderkey, o_orderpriority,
                      o_totalprice + CAST(1 AS DOUBLE) AS o_totalprice
               FROM o
               WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(0.1)}'),
         m AS (SELECT * FROM u
               UNION ALL
               SELECT * FROM o
               WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u))
         SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
             AS total_cents
         FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_grouping_sets_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""",

    "q_window_rolling_hour" ->
      """WITH c AS (SELECT user_id, event_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_sec,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             FROM events)
         SELECT user_id, event_id, ts_sec,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_sec
                RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents
         FROM c ORDER BY user_id, event_id""",

    "q_window_first_last" ->
      """WITH w AS (SELECT user_id, event_id,
           first_value(event_id) OVER win AS first_event,
           last_value(event_id) OVER win AS last_event,
           nth_value(event_id, 2) OVER win AS second_event
           FROM events
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         SELECT user_id, first_event, last_event, second_event,
                count(*) AS n_events
         FROM w GROUP BY 1, 2, 3, 4 ORDER BY user_id""",

    "q_window_event_gaps" ->
      """SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id) AS gap_us
         FROM events ORDER BY user_id, event_id""",

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    "q_join_bucketed_revenue" ->
      """SELECT o_orderkey, o_custkey,
         CAST(sum(CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
              * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS revenue_1e4
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderkey, o_custkey ORDER BY o_orderkey""",

    "q_pivot_order_status" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_unpivot_order_status" ->
      """WITH p AS (SELECT o_orderpriority,
              count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
              count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
              count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
              FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, 'F' AS status, n_f AS n FROM p
         UNION ALL SELECT o_orderpriority, 'O', n_o FROM p
         UNION ALL SELECT o_orderpriority, 'P', n_p FROM p
         ORDER BY o_orderpriority, status""",

    "q_range_join_value_bands" ->
      """WITH bands(band, lo, hi) AS (VALUES
           ('p00_low',  CAST(0   AS DOUBLE), CAST(10   AS DOUBLE)),
           ('p10_mid',  CAST(10  AS DOUBLE), CAST(50   AS DOUBLE)),
           ('p50_high', CAST(50  AS DOUBLE), CAST(100  AS DOUBLE)),
           ('p90_peak', CAST(100 AS DOUBLE), CAST(1000 AS DOUBLE)))
         SELECT band, event_type, count(*) AS n_events
         FROM events JOIN bands ON value >= lo AND value < hi
         GROUP BY band, event_type ORDER BY band, event_type""",

    "q_window_rank_family" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""",

    "q_setops_nations" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
              s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
         SELECT 'union' AS tag, CAST(nationkey AS BIGINT) AS nationkey
           FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s) u
         UNION ALL
         SELECT 'intersect', CAST(nationkey AS BIGINT)
           FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s) i
         UNION ALL
         SELECT 'except', CAST(nationkey AS BIGINT)
           FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s) e
         ORDER BY tag, nationkey""",

    "q_having_frequent_buyers" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 4) AS total_spent
         FROM orders GROUP BY o_custkey HAVING count(*) > 12
         ORDER BY o_custkey""",

    "q_scalar_subquery_big_orders" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice,
              CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
              FROM orders),
         g AS (SELECT sum(cents) AS sum_cents, count(*) AS n FROM o)
         SELECT o_orderkey, o_totalprice FROM o, g
         WHERE cents * 2 * n > sum_cents * 3
         ORDER BY o_orderkey""",

    "q_distribution_order_counts" ->
      """SELECT order_count, count(*) AS n_customers FROM (
           SELECT c_custkey, count(o_orderkey) AS order_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey) t
         GROUP BY order_count ORDER BY order_count""",

    "q_percentiles_order_price" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
         round(quantile_cont(o_totalprice, 0.99), 4) AS p99
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the sketch value is partitioning-dependent and never compared;
    // the oracle pins the exact percentiles plus the expected
    // all-within-bound flags the Spark side actually computes
    "q_heavy_values_approx" ->
      """SELECT CAST(0.5 AS DOUBLE) AS pct,
                round(quantile_cont(o_totalprice, 0.5), 4) AS exact_px,
                CAST(1 AS INT) AS within_bound FROM orders
         UNION ALL
         SELECT CAST(0.9 AS DOUBLE), round(quantile_cont(o_totalprice, 0.9), 4),
                CAST(1 AS INT) FROM orders
         UNION ALL
         SELECT CAST(0.99 AS DOUBLE), round(quantile_cont(o_totalprice, 0.99), 4),
                CAST(1 AS INT) FROM orders
         ORDER BY pct""",

    // audited sketches: deterministic exact columns + pass flags the
    // bounds in Sketches.scala guarantee (DuckDB runs no sketch)
    "q_distinct_users_approx" ->
      """SELECT event_type,
                CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                CAST(1 AS INT) AS within_bound
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_hll_sketch_rollup" ->
      """SELECT event_type,
                CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
                CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                CAST(1 AS INT) AS within_bound
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_cms_point_queries" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n,
                CAST(1 AS INT) AS ge_exact, CAST(1 AS INT) AS within_eps
         FROM events GROUP BY event_type ORDER BY event_type""",

    // KLL quantile cube: exact deterministic columns + all-pass rank-
    // audit flags (DuckDB runs no sketch; the flag bound lives in
    // Sketches.quantileReadout)
    "q_quantile_rollup" -> quantileRollupOracle,
    // merge keeps the rank bound under any merge tree, so the
    // incremental path answers to the from-scratch oracle verbatim
    "q_quantile_rollup_incremental" -> quantileRollupOracle,

    // inclusion-exclusion overlap: only pairs with a non-empty exact
    // intersection emit (inner join on both sides)
    "q_hll_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                CAST(count(*) AS BIGINT) AS exact_overlap,
                CAST(1 AS INT) AS within_bound
         FROM tu a JOIN tu b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY type_a, type_b ORDER BY type_a, type_b""",

    // theta set algebra: exact intersections/differences + all-pass
    // 3σ-interval flags (DuckDB runs no sketch); portable text
    "q_theta_set_ops" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         card AS (SELECT event_type, CAST(count(*) AS BIGINT) AS card
                  FROM tu GROUP BY event_type),
         x AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      CAST(count(*) AS BIGINT) AS exact_and
               FROM tu a JOIN tu b
                 ON a.user_id = b.user_id AND a.event_type < b.event_type
               GROUP BY a.event_type, b.event_type)
         SELECT x.type_a, x.type_b, exact_and,
                c.card - exact_and AS exact_anotb,
                CAST(1 AS INT) AS within_bound_and,
                CAST(1 AS INT) AS within_bound_anotb
         FROM x JOIN card c ON c.event_type = x.type_a
         ORDER BY type_a, type_b""",

    // merge == rescan (lossless cell-wise HLL union), so the incremental
    // maintenance path answers to the from-scratch oracle verbatim
    "q_hll_rollup_incremental" ->
      """SELECT event_type,
                CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
                CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                CAST(1 AS INT) AS within_bound
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_correlated_above_own_avg" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice,
              CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
              FROM orders),
         g AS (SELECT o_custkey AS k, sum(cents) AS sum_cents, count(*) AS n
               FROM o GROUP BY o_custkey)
         SELECT o_orderkey, o_custkey, o_totalprice
         FROM o JOIN g ON o_custkey = k
         WHERE cents * 5 * n > sum_cents * 6
         ORDER BY o_orderkey""",

    "q_json_extract_props" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_time_bucket_events" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS bucket,
         count(*) AS n_events, round(sum(value), 4) AS sum_value,
         round(avg(value), 4) AS avg_value
         FROM events GROUP BY bucket ORDER BY bucket""",

    // top-K heaviest join keys with share and ratio-to-mean
    "q_key_skew_audit" ->
      """WITH k AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total,
                      CAST(count(*) AS BIGINT) AS n_keys FROM k),
         r AS (SELECT user_id, n_events,
               row_number() OVER (ORDER BY n_events DESC, user_id) AS rank FROM k),
         d AS (SELECT rank, user_id, n_events, total, n_keys,
                      CAST(20000 AS DECIMAL(38,0)) * n_events * n_keys
                        + total AS rnum,
                      CAST(2 AS DECIMAL(38,0)) * total AS rden
               FROM r CROSS JOIN t WHERE rank <= 5)
         SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events,
                CAST((20000 * n_events + total) // (2 * total) AS BIGINT) AS share_1e4,
                CAST((rnum - rnum % rden) / rden AS BIGINT) AS ratio_to_avg_1e4
         FROM d ORDER BY rank""",

    // per-source token coverage of the global top-N vocabulary
    "q_vocab_coverage" ->
      s"""WITH t AS (SELECT source, unnest($Toks) AS w FROM documents),
         vc AS (SELECT w FROM (SELECT w, count(*) AS c FROM t
                               GROUP BY 1 ORDER BY c DESC, w LIMIT 10)),
         j AS (SELECT t.source, CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END AS cov
               FROM t LEFT JOIN vc v ON t.w = v.w)
         SELECT source, count(*) AS n_tokens, CAST(sum(cov) AS BIGINT) AS n_covered,
                CAST((20000 * CAST(sum(cov) AS BIGINT) + count(*))
                     // (2 * count(*)) AS BIGINT) AS coverage_1e4
         FROM j GROUP BY 1 ORDER BY 1""",

    // BPE merge learning: the unrolled-iteration template (pagerank
    // pattern), DuckDB list dialect
    "q_bpe_train" ->
      operators.TextAnalysis.bpeTrainSql(duck = true, Bpe.merges),
    "q_bpe_encode" ->
      operators.TextAnalysis.bpeEncodeSql(duck = true, Bpe.merges),

    // DSIR-style importance selection: integer-exact LM-ratio scoring
    "q_importance_weights" ->
      operators.TextAnalysis.importanceWeightsSql(duck = true,
        Dsir.target, Dsir.k),

    // corpus snapshot diff: portable text (fabricated-prior discipline)
    "q_snapshot_diff" -> operators.Curation.snapshotDiffSql,

    // BFS level histogram: unrolled reach sets, portable text
    "q_bfs_levels" ->
      operators.Mining.bfsLevelsSql(Basket.maxItems, Basket.bfsHops),

    // panel closeness: unrolled per-source reach sets; // the dialect point
    "q_closeness_centrality" ->
      operators.Mining.closenessCentralitySql("//", Basket.maxItems,
        Basket.closenessSources, Basket.bfsHops),

    // bounded Bellman-Ford: relaxations unrolled; // the only dialect point
    "q_shortest_paths" ->
      operators.Mining.shortestPathsSql("//", Basket.maxItems,
        Basket.spRounds, Basket.topK),

    // item-item neighbor Jaccard: portable text modulo // vs DIV
    "q_item_neighbor_jaccard" ->
      operators.Mining.itemNeighborJaccardSql("//", Basket.maxItems,
        Basket.jaccardMinCo, Basket.jaccardTopN),

    // k-anonymity generalization ladder: portable text modulo // vs DIV
    "q_k_anonymity" -> operators.Quality.kAnonymitySql("//"),

    // vocabulary growth curve via the (token -> min doc_id)
    // first-occurrence aggregate — distinct vocab at checkpoint c is the
    // count of tokens first seen at doc_id <= c, so one corpus shuffle
    // serves every checkpoint
    "q_vocab_growth" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         mx AS (SELECT max(doc_id) AS max_id FROM documents),
         cp AS (SELECT unnest([13, 25, 50, 100]) AS pct),
         cpt AS (SELECT pct, (max_id * pct) // 100 AS thr
                 FROM cp CROSS JOIN mx),
         tok AS (SELECT doc_id, unnest(ws) AS tok FROM d),
         fo AS (SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok),
         dv AS (SELECT pct, CAST(count(*) AS BIGINT) AS distinct_tokens
                FROM fo JOIN cpt ON first_doc <= thr GROUP BY pct),
         dc AS (SELECT pct, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(len(ws)) AS BIGINT) AS total_tokens
                FROM d JOIN cpt ON doc_id <= thr GROUP BY pct)
         SELECT pct, n_docs, total_tokens, distinct_tokens
         FROM dc JOIN dv USING (pct) ORDER BY pct""",

    // per-doc novelty: shingles first seen in this doc / doc's shingles,
    // same first-occurrence trick (min doc_id per shingle)
    "q_novelty_scores" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
                       unnest(sh) AS shingle FROM shd),
         fo AS (SELECT shingle, min(doc_id) AS first_doc
                FROM ex GROUP BY shingle),
         j AS (SELECT e.doc_id, e.n_sh,
                      CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END AS nv
               FROM ex e JOIN fo f ON f.shingle = e.shingle)
         SELECT doc_id, n_sh, CAST(sum(nv) AS BIGINT) AS n_novel,
                CAST((20000 * sum(nv) + n_sh) // (2 * n_sh) AS BIGINT)
                  AS novelty_1e4
         FROM j GROUP BY doc_id, n_sh ORDER BY doc_id""",

    // token-ID encoding: vocab rank + ordered id sequence per doc; the
    // sequence crosses the compare as an md5 digest (engine-portable)
    "q_encode_docs" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         tk AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM d),
         tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                        ws[CAST(pos AS INT)] AS w FROM tk),
         cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
         vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w)
                      AS BIGINT) AS vid
                   FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16) t),
         enc AS (SELECT t.doc_id, t.pos, coalesce(v.vid, 0) AS id
                 FROM tok t LEFT JOIN vocab v ON v.w = t.w)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                md5(string_agg(CAST(id AS STRING), ',' ORDER BY pos))
                  AS ids_md5
         FROM enc GROUP BY doc_id ORDER BY doc_id""",

    // incremental encode: vocab from the reference slice (doc_id < split),
    // encoded rows restricted to the delta — the frozen-tokenizer contract
    "q_encode_docs_incremental" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         mx AS (SELECT max(doc_id) * 4 // 5 AS split FROM documents),
         tk AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM d),
         tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                        ws[CAST(pos AS INT)] AS w FROM tk),
         cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                 FROM tok, mx WHERE tok.doc_id < mx.split GROUP BY w),
         vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w)
                      AS BIGINT) AS vid
                   FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 16) t),
         enc AS (SELECT t.doc_id, t.pos, coalesce(v.vid, 0) AS id
                 FROM tok t CROSS JOIN mx
                 LEFT JOIN vocab v ON v.w = t.w
                 WHERE t.doc_id >= mx.split)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                md5(string_agg(CAST(id AS STRING), ',' ORDER BY pos))
                  AS ids_md5
         FROM enc GROUP BY doc_id ORDER BY doc_id""",

    // Tukey-fence outliers over integerized values; exact quarter-fraction
    // interpolation makes the fences bit-identical across engines
    "q_value_outliers" ->
      """WITH ev AS (SELECT event_type,
              CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v4 FROM events),
         th AS (SELECT event_type, quantile_cont(v4, [0.25, 0.75]) AS p
                FROM ev GROUP BY 1),
         j AS (SELECT e.event_type, e.v4, p[1] AS p25, p[2] AS p75
               FROM ev e JOIN th t ON e.event_type = t.event_type),
         f AS (SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN CAST(v4 AS DOUBLE) < p25 - 1.5 * (p75 - p25)
                              OR CAST(v4 AS DOUBLE) > p75 + 1.5 * (p75 - p25)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
               FROM j GROUP BY 1)
         SELECT event_type, n_events, n_outliers,
                (20000 * n_outliers + n_events) // (2 * n_events) AS outlier_1e4
         FROM f ORDER BY event_type""",

    // RFM quartile-score segment matrix; quantile_cont == Spark percentile
    "q_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
              date_diff('day', DATE '1970-01-01', CAST(max(o_orderdate) AS DATE)) AS rec_days,
              count(*) AS freq,
              CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1),
         th AS (SELECT quantile_cont(rec_days, [0.25, 0.5, 0.75]) AS tr,
                       quantile_cont(freq, [0.25, 0.5, 0.75]) AS tf,
                       quantile_cont(cents, [0.25, 0.5, 0.75]) AS tm FROM per),
         sc AS (SELECT p.cents,
                CAST(1 + CAST(p.rec_days > tr[1] AS INT) + CAST(p.rec_days > tr[2] AS INT)
                       + CAST(p.rec_days > tr[3] AS INT) AS BIGINT) AS r_score,
                CAST(1 + CAST(p.freq > tf[1] AS INT) + CAST(p.freq > tf[2] AS INT)
                       + CAST(p.freq > tf[3] AS INT) AS BIGINT) AS f_score,
                CAST(1 + CAST(p.cents > tm[1] AS INT) + CAST(p.cents > tm[2] AS INT)
                       + CAST(p.cents > tm[3] AS INT) AS BIGINT) AS m_score
                FROM per p CROSS JOIN th)
         SELECT r_score, f_score, m_score, count(*) AS n_customers,
                CAST(sum(cents) AS BIGINT) AS cell_cents
         FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // first-order Markov transition matrix of per-user event flows
    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
              FROM events),
         tr AS (SELECT event_type AS from_type, to_type, count(*) AS n_transitions
                FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
         wt AS (SELECT from_type, to_type, n_transitions,
                CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS BIGINT) AS from_total
                FROM tr)
         SELECT from_type, to_type, n_transitions,
                (20000 * n_transitions + from_total) // (2 * from_total) AS share_1e4
         FROM wt ORDER BY from_type, to_type""",

    // session path mining: 30-min-gap sessions truncated to their first 5
    // event types, top 20 paths by session count with fixed-point share
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, event_type, ts_us,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, event_id, event_type, ts_us,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         numbered AS (SELECT user_id, session_id, event_type, ts_us, event_id,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts_us, event_id) AS rn
           FROM sessions),
         paths AS (SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY rn) AS path
           FROM numbered WHERE rn <= 5 GROUP BY user_id, session_id),
         counts AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY path),
         tot AS (SELECT sum(n_sessions) AS t FROM counts),
         ranked AS (SELECT path, n_sessions,
           (20000 * n_sessions + t) // (2 * t) AS share_1e4,
           row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
           FROM counts CROSS JOIN tot)
         SELECT CAST(rk AS BIGINT) AS rk, path,
                CAST(n_sessions AS BIGINT) AS n_sessions,
                CAST(share_1e4 AS BIGINT) AS share_1e4
         FROM ranked WHERE rk <= 20 ORDER BY rk""",

    // sweep-line interval union: 5-min activity intervals merged per user;
    // covered micros, merged-block count, covered/span density
    "q_interval_union_time" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                    epoch_us(ts) + 300000000 AS end_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us, end_us,
           CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR ts_us > max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_block
           FROM e),
         blocks AS (SELECT user_id, ts_us, end_us,
           CAST(sum(new_block) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS block_id
           FROM flagged),
         merged AS (SELECT user_id, block_id, min(ts_us) AS b_start, max(end_us) AS b_end
                    FROM blocks GROUP BY user_id, block_id),
         per_user AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_blocks,
                      CAST(sum(b_end - b_start) AS BIGINT) AS covered_us,
                      CAST(max(b_end) - min(b_start) AS BIGINT) AS span_us
                      FROM merged GROUP BY user_id)
         SELECT user_id, n_blocks, covered_us, span_us,
                CAST((20000 * covered_us + span_us) // (2 * span_us) AS BIGINT) AS density_1e4
         FROM per_user ORDER BY user_id""",

    // MAD robust outliers: doubled medians keep every threshold integer
    // (interpolating adjacent even integers lands on an integer), so the
    // flag rule 2*|2c - med_x2| > 3*mad_x4 is BIGINT-exact on both engines
    "q_mad_outliers" ->
      """WITH ev AS (SELECT event_type,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
             FROM events),
         med AS (SELECT event_type,
                 CAST(quantile_cont(2 * cents, 0.5) AS BIGINT) AS med_x2
                 FROM ev GROUP BY event_type),
         dev AS (SELECT ev.event_type, cents, med_x2,
                 abs(2 * cents - med_x2) AS d2
                 FROM ev JOIN med USING (event_type)),
         mad AS (SELECT event_type,
                 CAST(quantile_cont(2 * d2, 0.5) AS BIGINT) AS mad_x4
                 FROM dev GROUP BY event_type),
         agg AS (SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(max(med_x2) AS BIGINT) AS med_x2,
                 CAST(max(mad_x4) AS BIGINT) AS mad_x4,
                 CAST(sum(CASE WHEN 2 * d2 > 3 * mad_x4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
                 FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type)
         SELECT event_type, n_events, med_x2, mad_x4, n_outliers,
                CAST((20000 * n_outliers + n_events) // (2 * n_events) AS BIGINT) AS outlier_1e4
         FROM agg ORDER BY event_type""",

    // audience-overlap Jaccard between event-type user sets (the exact
    // answer q_hll_overlap's sketch approximates)
    "q_behavior_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
                 FROM ut GROUP BY event_type),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
                   FROM ut a JOIN ut b ON a.user_id = b.user_id
                   WHERE a.event_type < b.event_type
                   GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.n_both,
                pa.n_users AS n_a, pb.n_users AS n_b,
                CAST((20000 * p.n_both + (pa.n_users + pb.n_users - p.n_both))
                     // (2 * (pa.n_users + pb.n_users - p.n_both)) AS BIGINT) AS jaccard_1e4
         FROM pairs p
         JOIN per pa ON pa.event_type = p.type_a
         JOIN per pb ON pb.event_type = p.type_b
         ORDER BY type_a, type_b""",

    // daily new-vs-returning user split over the (user, day) active matrix
    "q_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
         f AS (SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS first_day FROM ud),
         agg AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                 CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new
                 FROM f GROUP BY day)
         SELECT day, n_active, n_new, n_active - n_new AS n_returning,
                CAST((20000 * n_new + n_active) // (2 * n_active) AS BIGINT) AS new_share_1e4
         FROM agg ORDER BY day""",

    // day-of-week traffic/value profile: dow 0 = Sunday in BOTH engines
    // (DuckDB dayofweek is already 0-based; Spark subtracts 1)
    "q_dow_profile" ->
      """WITH e AS (SELECT event_type, dayofweek(ts) AS dow,
                    CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM events),
         cell AS (SELECT event_type, CAST(dow AS BIGINT) AS dow,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(cents) AS BIGINT) AS cents_sum
                  FROM e GROUP BY event_type, dow),
         wt AS (SELECT event_type, dow, n_events, cents_sum,
                CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS type_n,
                CAST(sum(cents_sum) OVER (PARTITION BY event_type) AS BIGINT) AS type_cents
                FROM cell)
         SELECT event_type, dow, n_events, cents_sum,
                CAST((20000 * n_events + type_n) // (2 * type_n) AS BIGINT) AS traffic_share_1e4,
                CAST((20000 * cents_sum + type_cents) // (2 * type_cents) AS BIGINT) AS value_share_1e4
         FROM wt ORDER BY event_type, dow""",

    // SCD2 build: event_type runs collapse to [valid_from, valid_to)
    // validity intervals per user, exact micros, version + is_current
    "q_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
         runs AS (SELECT user_id, event_id, event_type, t_us,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
                  FROM e),
         heads AS (SELECT user_id, event_id, event_type, t_us FROM runs
                   WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type, t_us AS valid_from_us,
                lead(t_us) OVER w AS valid_to_us,
                CAST(row_number() OVER w AS BIGINT) AS version,
                (lead(t_us) OVER w IS NULL) AS is_current
         FROM heads
         WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
         ORDER BY user_id, version""",

    // point-in-time lookup: the oracle states the declarative BETWEEN
    // form; the operator runs the equivalent as-of carry (see
    // Analytics.scd2PointLookup for the equivalence argument)
    "q_scd2_point_lookup" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
         d AS (SELECT user_id, event_id, event_type, t_us,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_type
               FROM e WHERE event_type <> 'purchase'),
         heads AS (SELECT user_id, event_id, event_type, t_us FROM d
                   WHERE prev_type IS NULL OR prev_type <> event_type),
         dim AS (SELECT user_id, event_type AS state, t_us AS valid_from_us,
                        lead(t_us) OVER w AS valid_to_us,
                        CAST(row_number() OVER w AS BIGINT) AS state_version
                 FROM heads WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
         f AS (SELECT user_id, event_id, t_us FROM e WHERE event_type = 'purchase')
         SELECT f.event_id, f.user_id,
                coalesce(dim.state, '(none)') AS state,
                CAST(coalesce(dim.state_version, 0) AS BIGINT) AS state_version
         FROM f LEFT JOIN dim
           ON f.user_id = dim.user_id AND f.t_us >= dim.valid_from_us
           AND (dim.valid_to_us IS NULL OR f.t_us < dim.valid_to_us)
         ORDER BY f.event_id""",

    // masked min over the FOLLOWING frame (min skips NULLs in every
    // engine — no IGNORE NULLS vendor syntax needed)
    "q_conversion_window" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
         n AS (SELECT user_id, event_type, t_us,
               min(CASE WHEN event_type = 'purchase' THEN t_us END) OVER
                 (PARTITION BY user_id ORDER BY t_us, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_us
               FROM e),
         s AS (SELECT strftime(make_timestamp(t_us), '%Y-%m-%d') AS day,
                      CAST(count(*) AS BIGINT) AS n_signups,
                      CAST(sum(CASE WHEN next_purchase_us IS NOT NULL
                                     AND next_purchase_us - t_us <= 604800000000
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
               FROM n WHERE event_type = 'signup' GROUP BY day)
         SELECT day, n_signups, n_converted,
                CAST((20000 * n_converted + n_signups) // (2 * n_signups) AS BIGINT) AS conv_1e4
         FROM s ORDER BY day""",

    // last-touch attribution: the running last(ignoreNulls) carry is
    // rewritten with the portable count-group trick (cf. q_forward_fill):
    // the non-null channel at inclusive-count k is unique per (user, k),
    // so a purchase with exclusive-count k joins exactly that touch row
    "q_attribution_last_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t_us,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS chan
           FROM events),
         g AS (SELECT *,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_incl,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS grp_excl
           FROM e),
         touches AS (SELECT user_id, grp_incl AS grp, chan FROM g WHERE chan IS NOT NULL),
         p AS (SELECT g.user_id, g.value, t.chan
               FROM g LEFT JOIN touches t ON g.user_id = t.user_id AND g.grp_excl = t.grp
               WHERE g.event_type = 'purchase')
         SELECT coalesce(chan, '(none)') AS channel,
                count(*) AS n_purchases,
                CAST(sum(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM p GROUP BY 1 ORDER BY channel""",

    // first-touch: same portable carry rewrite; the credited touch is the
    // user's FIRST channel event (running count 1) when any precedes
    "q_attribution_first_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t_us,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS chan
           FROM events),
         g AS (SELECT *,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_incl,
             count(chan) OVER (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS grp_excl
           FROM e),
         touches AS (SELECT user_id, grp_incl AS grp, chan FROM g WHERE chan IS NOT NULL),
         p AS (SELECT g.user_id, g.value,
                      CASE WHEN g.grp_excl >= 1 THEN t.chan END AS chan
               FROM g LEFT JOIN touches t ON g.user_id = t.user_id AND t.grp = 1
               WHERE g.event_type = 'purchase')
         SELECT coalesce(chan, '(none)') AS channel,
                count(*) AS n_purchases,
                CAST(sum(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM p GROUP BY 1 ORDER BY channel""",

    // EWMA decay 1/2 over the trailing 6 events: exact power-of-two
    // weights over half-up cents, half-up 1e-4 quotient. DuckDB's `//`
    // on BIGINT truncates toward zero exactly like Spark DIV and Java
    // Long division, so the quotient agrees for any sign of cents.
    // TWAP: step-function holds in whole seconds, half-up 1e-4 quotient;
    // // + epoch_us are the only dialect points
    "q_time_weighted_value" ->
      operators.Analytics.timeWeightedValueSql("//", "epoch_us(ts)"),

    "q_ewma_user_value" ->
      """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
           FROM events),
         l AS (SELECT user_id, event_id, cents,
             lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
             lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
             lag(cents, 5) OVER w AS c5
           FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
         t AS (SELECT user_id, event_id, cents,
             32 * cents + coalesce(16 * c1, 0) + coalesce(8 * c2, 0)
               + coalesce(4 * c3, 0) + coalesce(2 * c4, 0) + coalesce(c5, 0) AS num,
             32 + CASE WHEN c1 IS NULL THEN 0 ELSE 16 END
                + CASE WHEN c2 IS NULL THEN 0 ELSE 8 END
                + CASE WHEN c3 IS NULL THEN 0 ELSE 4 END
                + CASE WHEN c4 IS NULL THEN 0 ELSE 2 END
                + CASE WHEN c5 IS NULL THEN 0 ELSE 1 END AS den
           FROM l)
         SELECT user_id, event_id, cents,
                CAST((20000 * num + den) // (2 * den) AS BIGINT) AS ewma_1e4
         FROM t ORDER BY user_id, event_id""",

    // throttle/rate-limiter dedup: kept = greedy chain per (user, type);
    // the recursive CTE walks a precomputed next-beyond-window pointer
    // table, so the recursive member is a plain join (Spark-shape-safe)
    "q_throttle_dedup" ->
      s"""WITH RECURSIVE e AS (
           SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
         nxt AS (SELECT a.user_id, a.event_type, a.rn, min(b.rn) AS next_rn
                 FROM e a JOIN e b ON b.user_id = a.user_id AND b.event_type = a.event_type
                   AND b.t_us > a.t_us + ${Throttle.windowUs}
                 GROUP BY a.user_id, a.event_type, a.rn),
         kept AS (
           SELECT user_id, event_type, rn FROM e WHERE rn = 1
           UNION ALL
           SELECT n.user_id, n.event_type, n.next_rn
           FROM kept k JOIN nxt n ON n.user_id = k.user_id
             AND n.event_type = k.event_type AND n.rn = k.rn)
         SELECT e.user_id, e.event_type, e.event_id, e.t_us
         FROM e JOIN kept ON e.user_id = kept.user_id
           AND e.event_type = kept.event_type AND e.rn = kept.rn
         ORDER BY e.user_id, e.event_type, e.t_us, e.event_id""",

    // the oracle states the PLAIN join — salting must be invisible
    "q_salted_join_revenue" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                  AS revenue_cents
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         WHERE e.event_type = 'purchase'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // bucketed checksum reconciliation: Spark conv(h,16,10) == DuckDB
    // ('0x'||h)::BIGINT on the 15-hex-char digest (verified identical)
    "q_load_reconciliation" ->
      """WITH rows_h AS (SELECT o_orderkey % 16 AS bucket, o_orderkey,
             ('0x' || substr(md5(concat_ws('|',
                CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
                CAST(o_orderdate AS VARCHAR))), 1, 15))::BIGINT AS h
           FROM orders),
         a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_src,
                      bit_xor(h) AS x_src
               FROM rows_h GROUP BY bucket),
         b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_dst,
                      bit_xor(h) AS x_dst
               FROM rows_h WHERE o_orderkey % 997 <> 0 GROUP BY bucket)
         SELECT a.bucket, n_src, coalesce(n_dst, CAST(0 AS BIGINT)) AS n_dst,
                n_src - coalesce(n_dst, CAST(0 AS BIGINT)) AS rows_missing,
                CAST(CASE WHEN n_dst IS NOT NULL AND n_src = n_dst
                           AND x_src = x_dst THEN 1 ELSE 0 END AS INT)
                  AS checksum_match
         FROM a LEFT JOIN b ON a.bucket = b.bucket
         ORDER BY a.bucket""",

    // chi-squared source x lang drift audit: exact-integer fixed point,
    // identical truncated division on both engines
    "q_chi2_source_lang" ->
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
                        FROM documents GROUP BY source, lang),
         rt AS (SELECT source, CAST(sum(obs) AS BIGINT) AS row_tot
                FROM cells GROUP BY source),
         ct AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS col_tot
                FROM cells GROUP BY lang),
         t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
         e AS (SELECT c.source, c.lang, c.obs, rt.row_tot, ct.col_tot,
                      (rt.row_tot * ct.col_tot * 10000) // t.n AS expected_1e4
               FROM cells c JOIN rt USING (source) JOIN ct USING (lang)
               CROSS JOIN t)
         SELECT source, lang, obs, row_tot, col_tot, expected_1e4,
                (abs(obs * 10000 - expected_1e4) * abs(obs * 10000 - expected_1e4))
                // (greatest(expected_1e4, 1) * 10000) AS chi2c_1e4
         FROM e ORDER BY source, lang""",

    // hour x type drift: the chi2 audit with time as the row axis
    "q_type_drift_hourly" ->
      """WITH cells AS (SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour,
                               event_type, CAST(count(*) AS BIGINT) AS obs
                        FROM events GROUP BY 1, 2),
         rt AS (SELECT hour, CAST(sum(obs) AS BIGINT) AS row_tot
                FROM cells GROUP BY hour),
         ct AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS col_tot
                FROM cells GROUP BY event_type),
         t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
         e AS (SELECT c.hour, c.event_type, c.obs, rt.row_tot, ct.col_tot,
                      (rt.row_tot * ct.col_tot * 10000) // t.n AS expected_1e4
               FROM cells c JOIN rt USING (hour) JOIN ct USING (event_type)
               CROSS JOIN t)
         SELECT hour, event_type, obs, row_tot, col_tot, expected_1e4,
                (abs(obs * 10000 - expected_1e4) * abs(obs * 10000 - expected_1e4))
                // (greatest(expected_1e4, 1) * 10000) AS chi2c_1e4
         FROM e ORDER BY hour, event_type""",

    // size-3 itemsets: the naive three-way join cross-checks the
    // operator's bounded array explode
    "q_basket_triples" ->
      operators.Mining.basketTriplesSql(Basket.maxItems, Basket.topK),

    // market-basket pair mining: distinct incidence, whale-basket guard,
    // then the pair self-join — identical semantics to the operator
    "q_market_basket" ->
      """WITH inc AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                      FROM lineitem),
         ok AS (SELECT basket FROM inc GROUP BY basket HAVING count(*) <= 8),
         kept AS (SELECT inc.basket, inc.item FROM inc JOIN ok USING (basket)),
         pairs AS (SELECT a.item AS part_a, b.item AS part_b,
                          CAST(count(*) AS BIGINT) AS n_orders
                   FROM kept a JOIN kept b
                     ON a.basket = b.basket AND a.item < b.item
                   GROUP BY 1, 2)
         SELECT part_a, part_b, n_orders FROM pairs
         ORDER BY n_orders DESC, part_a, part_b LIMIT 25""",

    // 2D Pareto frontier: the NOT EXISTS dominance definition IS the
    // spec; the operator's bucketed two-level plan must reproduce it
    "q_pareto_frontier" ->
      """WITH pts AS (SELECT p_partkey,
                CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
                CAST(p_size AS BIGINT) AS p_size FROM part)
         SELECT p_partkey, price_cents, p_size FROM pts p
         WHERE NOT EXISTS (SELECT 1 FROM pts q
                WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
                  AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))
         ORDER BY price_cents, p_partkey""",

    // month-over-month revenue momentum; // and DIV both truncate toward
    // zero on BIGINT, deltas may be negative, first month NULLs through
    "q_mom_revenue" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                  AS rev_cents
           FROM orders GROUP BY 1),
         l AS (SELECT month, rev_cents,
                      lag(rev_cents) OVER (ORDER BY month) AS prev_cents
               FROM m)
         SELECT month, rev_cents, prev_cents,
                rev_cents - prev_cents AS delta_cents,
                ((rev_cents - prev_cents) * 10000) // prev_cents AS pct_1e4
         FROM l ORDER BY month""",

    // higher-order array-function suite: doubles only inside pinned-order
    // folds, emitted as half-up 1e-4 fixed point (the dot_f convention)
    "q_array_funcs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings)
         SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           CAST(len(list_filter(v, x -> x > CAST(0 AS DOUBLE))) AS BIGINT)
             AS n_pos,
           CAST(floor((CASE WHEN len(v) = 0 THEN CAST(0 AS DOUBLE)
                  ELSE list_reduce(list_transform(v, x -> abs(x)),
                       (a, b) -> a + b) END)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS l1_1e4,
           CAST(floor(list_aggregate(v, 'max') * CAST(10000 AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) AS BIGINT) AS max_1e4,
           CASE WHEN len(v) = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(floor(list_sort(v)[len(v) // 2 + 1]
                     * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                END AS med_1e4,
           CAST(floor((CASE WHEN len(v) = 0 THEN CAST(0 AS DOUBLE)
                  ELSE list_reduce(list_transform(range(1, len(v) + 1),
                       i -> v[i] * list_reverse(v)[i]), (a, b) -> a + b) END)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS revdot_1e4,
           CAST(floor((CASE WHEN len(v) = 0 THEN CAST(0 AS DOUBLE)
                  ELSE list_reduce(list_slice(v, 1, 3), (a, b) -> a + b) END)
                * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS head3_sum_1e4
         FROM e ORDER BY vec_id""",

    // exact bitmap distinct: the oracle is plain COUNT(DISTINCT) —
    // equality proves the bit_or/bit_count path exact, not nearly-right
    "q_bitmap_distinct_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",

    // exact bitmap audience overlap: oracle is the user-level pair join
    "q_bitmap_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                CAST(count(*) AS BIGINT) AS n_common
         FROM tu a JOIN tu b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2 ORDER BY type_a, type_b""",

    // Kaplan-Meier signup->purchase survival with right-censoring: the
    // recursive product-limit recurrence, generated from the same
    // template as the Spark twin
    "q_survival_signup_purchase" ->
      operators.Analytics.survivalSql("//", "epoch_us"),

    // strictly-ordered funnel: the oracle is the min-after JOIN-CHAIN,
    // a deliberately different algorithm than the operator's one-pass
    // sorted-group tracker — equality is an algorithmic cross-check
    "q_funnel_ordered" ->
      operators.Analytics.funnelSql("//", "epoch_us"),

    // power-of-two token-length histogram: bit-length bucket (bin() in
    // both engines), windowed cumulative fixed-point shares
    "q_token_log2_hist" ->
      s"""WITH d AS (SELECT CAST(len($Toks) AS BIGINT) AS nt FROM documents),
         b AS (SELECT CASE WHEN nt = 0 THEN CAST(-1 AS BIGINT)
                           ELSE CAST(length(bin(nt)) - 1 AS BIGINT) END AS bucket,
                      nt FROM d),
         g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(nt) AS BIGINT) AS n_tokens
               FROM b GROUP BY bucket),
         t AS (SELECT CAST(count(*) AS BIGINT) AS tot_docs,
                      CAST(coalesce(sum(nt), 0) AS BIGINT) AS tot_tokens FROM d)
         SELECT bucket,
                CASE WHEN bucket < 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) << bucket END AS lo,
                n_docs, n_tokens,
                (CAST(sum(n_docs) OVER w AS BIGINT) * 10000) // tot_docs
                  AS cum_docs_1e4,
                (CAST(sum(n_tokens) OVER w AS BIGINT) * 10000)
                  // greatest(tot_tokens, 1) AS cum_tokens_1e4
         FROM g CROSS JOIN t
         WINDOW w AS (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY bucket""",

    // weighted PageRank over the co-purchase graph: the ten iterations
    // unrolled as chained CTEs, generated from the same template as the
    // Spark twin (// vs DIV is the only difference)
    "q_pagerank_copurchase" ->
      operators.Mining.pagerankSql("//", Basket.maxItems, Basket.pagerankIters),

    // exact triangle count: the oracle is the NAIVE id-ordered three-way
    // join; the operator runs degree-ordered orientation — equality is an
    // algorithmic cross-check (portable SQL, shared verbatim)
    "q_triangle_count" ->
      operators.Mining.triangleSql(Basket.maxItems, Basket.topK),

    // association-rule pricing (support/confidence/lift) from the shared
    // template; // vs DIV is the only dialect point
    "q_assoc_rules" ->
      operators.Mining.assocRulesSql("//", Basket.maxItems, 5, Basket.topK),

    // hour-of-week seasonal anomaly: dense grid + cross-multiplied
    // baseline comparison; dialect points are strftime/dayofweek/range
    "q_seasonal_anomaly" ->
      operators.Quality.seasonalSql("strftime(ts, '%Y-%m-%d')",
        "dayofweek(ts)",
        "(SELECT CAST(range AS BIGINT) AS hour FROM range(0, 24))"),

    // functional-dependency audit: five two-level distinct blocks (the
    // operator runs ONE stacked scan with multi-distinct — different
    // algorithm, equality is the cross-check)
    "q_fd_discovery" -> operators.Quality.fdDiscoverySql,

    // A/B readout from the shared template (// vs DIV only)
    "q_ab_test_readout" -> operators.Quality.abTestSql("//"),

    // two-sided CUSUM: the prefix recurrence as a recursive CTE from the
    // shared template (strftime is the only dialect point)
    "q_cusum_changepoint" ->
      operators.Analytics.cusumSql("strftime(ts, '%Y-%m-%d')"),

    // Holt double-exponential smoothing: the same recursive-CTE pattern
    // (dialect points: strftime + truncating integer division spelling)
    "q_holt_forecast" ->
      operators.Analytics.holtSql("strftime(ts, '%Y-%m-%d')", "//"),

    // Mann-Kendall + Theil-Sen trend audit (dialect: strftime, DuckDB
    // date_diff arg order, //)
    "q_trend_audit" ->
      operators.Analytics.trendAuditSql("strftime(ts, '%Y-%m-%d')",
        "CAST(date_diff('day', CAST(a.day AS DATE), CAST(b.day AS DATE)) AS BIGINT)",
        "//"),

    // pairwise Pearson matrix; UNION ALL arms (no stack) — portable text
    // that also algorithmically cross-checks the operator's Expand path
    "q_corr_matrix" -> operators.Quality.corrMatrixSql,
    // merge == rescan: the oracle runs the one-shot statement
    "q_corr_matrix_incremental" -> operators.Quality.corrMatrixSql,
    // skew/kurtosis from exact decimal power sums, final-double readout
    "q_moment_profile" -> operators.Quality.momentProfileSql,
    // per-arm sample size for 1%/5% mean shifts: pure power-sum ratios
    "q_ab_power_audit" -> operators.Quality.abPowerAuditSql,
    // exact max-rank per-decile order statistics, urgent minus other
    "q_quantile_uplift" -> operators.Quality.quantileUpliftSql,
    "q_mannwhitney_value" -> operators.Quality.mannWhitneyValueSql,
    "q_bootstrap_ci_revenue" ->
      operators.Quality.bootstrapRevenueCiSql(duck = true),
    // merge == rescan: the incremental face's oracle IS the one-shot text
    "q_bootstrap_ci_incremental" ->
      operators.Quality.bootstrapRevenueCiSql(duck = true),
    // staleness per type behind the feed head; // + epoch_us dialect
    "q_freshness_audit" ->
      operators.Quality.freshnessAuditSql("//", "epoch_us(ts)"),
    // empirical-Bayes shrinkage; // is the only dialect point
    "q_shrunken_rates" -> operators.Quality.shrunkenRatesSql("//", 20, 50),
    // merge == rescan: the oracle runs the one-shot statement
    "q_moment_profile_incremental" -> operators.Quality.momentProfileSql,

    // gapped sequential pairs: the oracle is the NAIVE EXISTS-over-raw-
    // row-pairs statement (no order-statistic collapse) — equality is an
    // algorithmic cross-check of the first/last-occurrence reduction
    "q_seq_pair_support" -> operators.Mining.seqPairSupportSql("//", 2),

    // daily P50/P90 bands (doubled-median + discrete rank quantile)
    "q_daily_value_bands" ->
      operators.Analytics.dailyBandsSql("strftime(ts, '%Y-%m-%d')",
        "quantile_cont(2 * cents, 0.5)", "//"),

    // Lorenz/Gini: the oracle's naive global row_number vs the operator's
    // range-partitioned distributed rank — equality proves the execution
    // strategy result-invisible
    "q_revenue_lorenz" -> operators.Analytics.lorenzSql("//"),

    // proportional interleave audit: stride-keyed schedule deciles
    "q_interleave_mix" -> operators.Curation.interleaveSql("//"),

    // Bloom-screened semi join: the oracle is the PLAIN IN-subquery semi
    // join (portable), so equality proves the screen result-invisible
    "q_bloom_semi_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS revenue_cents
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'AUTOMOBILE')
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    // bucketed-histogram join-size estimator next to the exact per-bucket
    // join count; est >= exact is a mathematical guarantee the oracle pins
    "q_join_size_estimate" ->
      """WITH l AS (SELECT o_orderkey % 32 AS bucket, o_orderkey AS key
                    FROM orders),
         r AS (SELECT l_orderkey % 32 AS bucket, l_orderkey AS key
               FROM lineitem),
         nl AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_left
                FROM l GROUP BY bucket),
         nr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_right
                FROM r GROUP BY bucket),
         lk AS (SELECT bucket, key, CAST(count(*) AS BIGINT) AS cl
                FROM l GROUP BY 1, 2),
         rk AS (SELECT bucket, key, CAST(count(*) AS BIGINT) AS cr
                FROM r GROUP BY 1, 2),
         ex AS (SELECT lk.bucket, CAST(sum(cl * cr) AS BIGINT) AS exact_rows
                FROM lk JOIN rk ON lk.bucket = rk.bucket AND lk.key = rk.key
                GROUP BY 1)
         SELECT bucket,
                coalesce(n_left, CAST(0 AS BIGINT)) AS n_left,
                coalesce(n_right, CAST(0 AS BIGINT)) AS n_right,
                coalesce(n_left, CAST(0 AS BIGINT))
                  * coalesce(n_right, CAST(0 AS BIGINT)) AS est_rows,
                coalesce(exact_rows, CAST(0 AS BIGINT)) AS exact_rows,
                CAST(CASE WHEN coalesce(n_left, CAST(0 AS BIGINT))
                               * coalesce(n_right, CAST(0 AS BIGINT))
                               >= coalesce(exact_rows, CAST(0 AS BIGINT))
                          THEN 1 ELSE 0 END AS INT) AS est_ge_exact
         FROM nl FULL JOIN nr USING (bucket) LEFT JOIN ex USING (bucket)
         ORDER BY bucket""",

    // column profile over orders: per-type EXACT min/max encodings
    // (ints/strings verbatim, money as half-up cents, timestamps as
    // epoch micros), one UNION-ALL row per column
    "q_profile_columns" ->
      """SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
                count(*) - count(o_custkey) AS n_nulls,
                count(DISTINCT o_custkey) AS n_distinct,
                CAST(min(o_custkey) AS VARCHAR) AS min_repr,
                CAST(max(o_custkey) AS VARCHAR) AS max_repr FROM orders
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
                count(DISTINCT o_orderdate),
                CAST(min(epoch_us(o_orderdate)) AS VARCHAR),
                CAST(max(epoch_us(o_orderdate)) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
                count(DISTINCT o_orderkey),
                CAST(min(o_orderkey) AS VARCHAR),
                CAST(max(o_orderkey) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
                count(DISTINCT o_orderpriority),
                min(o_orderpriority), max(o_orderpriority) FROM orders
         UNION ALL
         SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
                count(DISTINCT o_orderstatus),
                min(o_orderstatus), max(o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
                count(DISTINCT o_totalprice),
                CAST(min(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS VARCHAR),
                CAST(max(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS VARCHAR) FROM orders
         ORDER BY column_name""",

    "q_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us, value,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, event_id, ts_us, value,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                round(sum(value), 4) AS sum_value
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    // per-day bounce/dwell over the same session definition; make_timestamp
    // interprets BIGINT micros exactly (no float epoch round-trip)
    "q_session_quality" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         flagged AS (SELECT user_id, event_id, ts_us,
           CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                     > 1800000000
                     OR lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
           FROM e),
         sessions AS (SELECT user_id, ts_us,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         sess AS (SELECT user_id, session_id, count(*) AS n_events,
                         min(ts_us) AS start_us, max(ts_us) AS end_us
                  FROM sessions GROUP BY user_id, session_id),
         byday AS (SELECT strftime(make_timestamp(start_us), '%Y-%m-%d') AS day,
                          CAST(count(*) AS BIGINT) AS n_sessions,
                          CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
                          CAST(sum(end_us - start_us) AS BIGINT) AS dur_sum
                   FROM sess GROUP BY day)
         SELECT day, n_sessions, n_bounces,
                CAST((20000 * n_bounces + n_sessions) // (2 * n_sessions) AS BIGINT) AS bounce_1e4,
                CAST((2 * dur_sum + n_sessions) // (2 * n_sessions) AS BIGINT) AS mean_dur_us
         FROM byday ORDER BY day""",

    "q_top_tokens_per_source" ->
      """WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                      FROM documents),
         counts AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token),
         ranked AS (SELECT source, token, n,
                    row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
                    FROM counts)
         SELECT source, CAST(rk AS BIGINT) AS rk, token, n
         FROM ranked WHERE rk <= 5 ORDER BY source, rk""",

    // heavy hitters: the sketch only PRUNES; the emitted set is the exact
    // count*k > n answer, so the oracle is a plain GROUP BY ... HAVING
    "q_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($Toks) AS tok FROM documents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
         SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         FROM tok, t GROUP BY tok, t.n HAVING count(*) * ${Heavy.k} > t.n
         ORDER BY cnt DESC, tok""",

    // DSIR-style data selection: smoothed df-lift toward the target feed,
    // floor-averaged over each doc's distinct shingles
    "q_domain_affinity" ->
      s"""WITH d AS (SELECT doc_id, source, $Toks AS ws FROM documents),
         shd AS (SELECT doc_id, source, list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
                 FROM d WHERE len(ws) >= 3),
         ex AS (SELECT doc_id, source, CAST(len(sh) AS BIGINT) AS n_sh,
                       unnest(sh) AS shingle FROM shd),
         df AS (SELECT shingle,
                       CAST(sum(CASE WHEN source = '${Affinity.targetSource}' THEN 1 ELSE 0 END) AS BIGINT) AS t_df,
                       CAST(sum(CASE WHEN source <> '${Affinity.targetSource}' THEN 1 ELSE 0 END) AS BIGINT) AS c_df
                FROM ex GROUP BY shingle),
         tot AS (SELECT CAST(sum(CASE WHEN source = '${Affinity.targetSource}' THEN 1 ELSE 0 END) AS BIGINT) AS t_docs,
                        CAST(sum(CASE WHEN source <> '${Affinity.targetSource}' THEN 1 ELSE 0 END) AS BIGINT) AS c_docs
                 FROM shd),
         w AS (SELECT e.doc_id, e.n_sh,
                      (10000 * (f.t_df + 1) * (t.c_docs + 1))
                      // ((f.c_df + 1) * (t.t_docs + 1)) AS w
               FROM ex e JOIN df f ON e.shingle = f.shingle CROSS JOIN tot t
               WHERE e.source <> '${Affinity.targetSource}')
         SELECT doc_id, n_sh, CAST(sum(w) // n_sh AS BIGINT) AS affinity_1e4
         FROM w GROUP BY doc_id, n_sh ORDER BY doc_id""",

    // BPE first-merge pair statistics over the word histogram
    "q_bpe_pair_counts" ->
      s"""WITH d AS (SELECT $Toks AS ws FROM documents),
         wc AS (SELECT w, count(*) AS freq
                FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w),
         pr AS (SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym, freq
                FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
                      FROM wc WHERE length(w) >= 2))
         SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS n_pairs
         FROM pr GROUP BY 1, 2
         ORDER BY n_pairs DESC, left_sym, right_sym LIMIT 20""",

    // top bigram collocations by exact integer exp(PMI) lift; // floors
    // the positive quotient exactly like the operator's DECIMAL quotient
    "q_collocations" ->
      s"""WITH d AS (SELECT $Toks AS ws FROM documents),
         uc AS (SELECT w, count(*) AS c
                FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w),
         tot AS (SELECT sum(c) AS n_tokens FROM uc),
         bc AS (SELECT w1, w2, count(*) AS c_ab
                FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
                      FROM (SELECT ws, unnest(range(1, len(ws))) AS i
                            FROM d WHERE len(ws) >= 2))
                GROUP BY 1, 2 HAVING count(*) >= ${Colloc.minCount})
         SELECT b.w1, b.w2, b.c_ab, a.c AS c_a, c2.c AS c_b,
                CAST((10000 * b.c_ab * t.n_tokens) // (a.c * c2.c) AS BIGINT) AS lift_1e4
         FROM bc b JOIN uc a ON b.w1 = a.w JOIN uc c2 ON b.w2 = c2.w
         CROSS JOIN tot t
         ORDER BY lift_1e4 DESC, w1, w2 LIMIT ${Colloc.topK}""",

    // bigram-LM quality scoring: add-one-smoothed conditional frequency
    // under the lang='en' reference slice, exact micros, per-doc average
    "q_bigram_lm_score" ->
      s"""WITH d AS (SELECT doc_id, lang, $Toks AS ws FROM documents),
         bg AS (SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
                FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i
                      FROM d WHERE len(ws) >= 2)),
         model AS (SELECT w1, w2, count(*) AS c12 FROM bg
                   WHERE lang = '${BigramLm.refLang}' GROUP BY 1, 2),
         heads AS (SELECT w1, count(*) AS c1 FROM bg
                   WHERE lang = '${BigramLm.refLang}' GROUP BY 1),
         v AS (SELECT count(*) AS v FROM heads),
         terms AS (SELECT bg.doc_id,
                     ((coalesce(m.c12, 0) + 1) * 1000000) // (coalesce(h.c1, 0) + v.v) AS term
                   FROM bg
                   LEFT JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
                   LEFT JOIN heads h ON bg.w1 = h.w1
                   CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(term) // count(*) AS BIGINT) AS lm_score_1e6
         FROM terms GROUP BY doc_id ORDER BY doc_id""",

    "q_asof_join_events_orders" ->
      """WITH dedup AS (
           SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, o_orderdate),
         o2 AS (
           SELECT dedup.o_custkey, dedup.o_orderdate, dedup.o_orderkey,
                  orders.o_totalprice
           FROM dedup JOIN orders ON orders.o_orderkey = dedup.o_orderkey)
         SELECT e.event_id, e.user_id, o2.o_orderkey, o2.o_totalprice
         FROM events e ASOF JOIN o2
           ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
         ORDER BY e.event_id""",

    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, n_chars, $Toks AS toks FROM documents)
         SELECT doc_id, n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST((20000 * list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum')
               + CAST(len(toks) AS BIGINT))
              // (2 * CAST(len(toks) AS BIGINT)) AS BIGINT) AS avg_token_len_1e4
         FROM t ORDER BY doc_id""",

    // The GPT-2-ish pre-tokenizer pattern runs verbatim on both engines
    // (no lookahead — RE2 rejects lookaround); the contraction quote is
    // ''-escaped here and lives in a double-quoted literal on the Spark
    // side. chars_per_bpe is half-up ten-thousandths, pure integer.
    "q_token_estimate" ->
      """WITH b AS (SELECT doc_id, coalesce(text, '') AS t,
           regexp_extract_all(coalesce(text, ''),
             '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s+') AS bpe
           FROM documents),
         c AS (SELECT doc_id, t,
           CAST(len(list_filter(bpe, x -> NOT regexp_matches(x, '^\s+$'))) AS BIGINT) AS nb
           FROM b)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS n_ws_tokens,
           nb AS n_bpe_tokens,
           CASE WHEN nb > 0 THEN
             CAST((20000 * CAST(length(t) AS BIGINT) + nb) // (2 * nb) AS BIGINT)
           ELSE NULL END AS chars_per_bpe_1e4
         FROM c ORDER BY doc_id""",

    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         m AS (SELECT doc_id, text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars
           FROM t)
         SELECT doc_id, n_tokens,
         CAST((20000 * stop_hits + n_tokens) // (2 * n_tokens) AS BIGINT) AS stop_ratio_1e4,
         CAST((20000 * punct_chars + CAST(length(text) AS BIGINT))
              // (2 * CAST(length(text) AS BIGINT)) AS BIGINT) AS punct_ratio_1e4,
         CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
         CAST(floor(
           least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
           * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
           * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
         FROM m ORDER BY doc_id""",

    "q_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
         sc AS (SELECT doc_id,
           CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
           CAST(len(list_filter(toks, t -> list_contains(['der','die','und','ist','nicht','das'], t))) AS BIGINT) AS s_de,
           CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','est'], t))) AS BIGINT) AS s_fr,
           CAST(len(list_filter(toks, t -> list_contains(['el','los','que','una','por','como'], t))) AS BIGINT) AS s_es
           FROM t)
         SELECT doc_id, s_en, s_de, s_fr, s_es,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS pred_lang
         FROM sc ORDER BY doc_id""",

    "q_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents)
         SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp_md5,
         list_reduce(list_prepend(CAST(7 AS BIGINT),
           list_transform(toks, t -> CAST(length(t) * 131 + ascii(substr(t, 1, 1)) AS BIGINT))),
           (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling
         FROM t ORDER BY doc_id""",

    // winnowing (SIGMOD'03): per-window min gram-hash, rightmost tiebreak
    // packed as (md5 asc, pos desc) into one string so min() decides both
    "q_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, array_to_string($Toks, ' ') AS txt FROM documents),
         f AS (SELECT doc_id, txt FROM t WHERE length(txt) >= 8),
         g AS (SELECT doc_id, txt, unnest(range(0, length(txt) - 7)) AS pos FROM f),
         h AS (SELECT doc_id, pos,
               concat(md5(substr(txt, CAST(pos AS INT) + 1, 8)),
                      CASE WHEN pos < 999999
                           THEN lpad(CAST(999999 - pos AS VARCHAR), 6, '0')
                           ELSE error('winnow: document exceeds the 1e6-gram packing range') END) AS pk
               FROM g),
         wm AS (SELECT doc_id, pos,
               min(pk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               count(*) OVER (PARTITION BY doc_id) AS n
               FROM h),
         sel AS (SELECT DISTINCT doc_id, n, wmin FROM wm
                 WHERE pos <= greatest(n - 4, 0))
         SELECT doc_id, CAST(max(n) AS BIGINT) AS n_grams,
                CAST(count(*) AS BIGINT) AS n_fps,
                CAST(count(DISTINCT substr(wmin, 1, 32)) AS BIGINT) AS n_uniq_hashes,
                min(substr(wmin, 1, 32)) AS min_fp
         FROM sel GROUP BY doc_id ORDER BY doc_id""",

    "q_dedup_winnow" ->
      graft.operators.Dedup.winnowPairsSql(duck = true, Toks, "//"),

    "q_dedup_substring" ->
      graft.operators.Dedup.substringDedupSql(duck = true, Toks),

    // full-corpus spans restricted to greater-member-in-delta (ids are
    // append-monotone, so doc_b >= split IS membership here); the split
    // computed in SQL, the q_dedup_incremental oracle discipline
    "q_dedup_substring_incremental" ->
      graft.operators.Dedup.substringDedupSql(duck = true, Toks,
        incremental = true, div = "//"),

    "q_substring_dup_profile" ->
      graft.operators.Dedup.substringDupProfileSql(duck = true, Toks, div = "//"),

    "q_dedup_substring_rewrite" ->
      graft.operators.Dedup.substringDedupRewriteSql(duck = true, Toks),

    "q_date_parts_orders" ->
      """WITH p AS (SELECT
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS isoweek,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
           FROM orders)
         SELECT yr, qtr, mon, month_start, month_end,
           count(*) AS n_orders,
           CAST(sum(dow0) AS BIGINT) AS sum_dow0,
           CAST(sum(doy) AS BIGINT) AS sum_doy,
           CAST(sum(dom) AS BIGINT) AS sum_dom,
           CAST(max(isoweek) AS BIGINT) AS max_isoweek,
           count(DISTINCT dom) AS distinct_days
         FROM p GROUP BY yr, qtr, mon, month_start, month_end
         ORDER BY yr, mon""",

    "q_join_brand_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
           * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS revenue_cents
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q_volume_shipping" ->
      operators.Analytics.volumeShippingSql("NATION_18", "NATION_19"),
    "q_market_share" ->
      operators.Analytics.marketShareSql("//", "NATION_15", "AFRICA", "ECONOMY"),
    "q_promotion_effect" ->
      operators.Analytics.promotionEffectSql("//", "strftime(l_shipdate, '%Y-%m')"),
    "q_top_supplier" -> operators.Analytics.topSupplierSql,
    "q_small_qty_revenue" ->
      operators.Analytics.smallQtyRevenueSql("//", "Brand#1"),
    "q_returned_item_report" ->
      operators.Analytics.returnedItemReportSql(20),
    "q_forecast_revenue" ->
      operators.Analytics.forecastRevenueSql,
    "q_disjunctive_revenue" ->
      operators.Analytics.disjunctiveRevenueSql,
    "q_min_cost_supplier" ->
      operators.Analytics.minCostSupplierSql("Brand#2"),
    "q_acf_daily_value" -> operators.Analytics.acfDailyValueSql(7),

    "q_theil_sen_trend" ->
      operators.Analytics.theilSenTrendSql("date_diff('day', a.day, b.day)"),

    "q_kendall_tau_daily" -> operators.Analytics.kendallTauDailySql,
    "q_spearman_daily" -> operators.Analytics.spearmanDailySql,

    // day-of-week is the one dialect knob (DuckDB dayofweek is 0-based)
    "q_mann_kendall_seasonal" ->
      operators.Analytics.mannKendallSeasonalSql("dayofweek(day)"),

    "q_hodges_lehmann_value" -> operators.Quality.hodgesLehmannValueSql,
    "q_qn_scale_value" -> operators.Quality.qnScaleValueSql,

    // datediff argument order is the one dialect knob
    "q_wilcoxon_signed_rank" -> operators.Quality.wilcoxonSignedRankSql(
      "date_diff('day', DATE '1970-01-05', day)"),

    // datediff argument order is the one dialect knob
    "q_siegel_slope" ->
      operators.Analytics.siegelSlopeSql("date_diff('day', a.day, b.day)"),

    "q_runs_test_daily" -> operators.Analytics.runsTestDailySql,
    "q_ljung_box_daily" -> operators.Analytics.ljungBoxDailySql(7),
    "q_pacf_daily" -> operators.Analytics.pacfDailySql(7),

    // dayofweek base + // are the dialect knobs
    "q_seasonal_decompose" ->
      operators.Analytics.seasonalDecomposeSql("dayofweek(day)", "//"),

    // epoch-micros + // are the dialect knobs
    "q_bot_likeness" ->
      operators.Analytics.botLikenessSql("epoch_us", "//"),

    // datediff + // are the dialect knobs
    "q_mcnemar_conversion" -> operators.Quality.mcnemarConversionSql(
      "date_diff('day', DATE '1970-01-05', day)", "//"),
    "q_ccf_click_purchase" ->
      operators.Analytics.ccfDailyValueSql("click", "purchase", 7),
    "q_traffic_kpi_report" ->
      operators.Analytics.trafficKpiReportSql("//", "epoch_us", 30),

    "q_string_funcs" ->
      """SELECT c_custkey,
         upper(c_mktsegment) AS seg_upper,
         lower(c_name) AS name_lower,
         CAST(length(c_name) AS BIGINT) AS name_len,
         substr(c_name, 1, 8) AS name_prefix,
         replace(c_name, 'Customer', 'C') AS name_short,
         lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
         split_part(c_name, '#', 2) AS name_num,
         CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
         translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
         reverse(c_name) AS name_rev,
         concat_ws('|', c_mktsegment, c_name) AS seg_name,
         trim(split_part(c_name, '#', 2), '0') AS num_trimmed
         FROM customer ORDER BY c_custkey""",

    "q_histogram_order_price" ->
      """WITH b AS (SELECT
           least(CAST(floor(o_totalprice / CAST(50000 AS DOUBLE)) AS BIGINT),
                 CAST(9 AS BIGINT)) AS bucket,
           CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS cents
           FROM orders)
         SELECT bucket, count(*) AS n_orders,
                CAST(min(cents) AS BIGINT) AS min_cents,
                CAST(max(cents) AS BIGINT) AS max_cents
         FROM b GROUP BY bucket ORDER BY bucket""",

    // equal-frequency deciles over the value histogram: bin of a value is
    // floor(10*p/n)+1 on its exclusive prefix count p — pure BIGINT, so
    // ties land identically in both engines (the operator computes p with
    // a de-skewed two-level sum; see Analytics.equalFreqBins)
    "q_equal_freq_binning" ->
      """WITH o AS (SELECT CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
                    FROM orders),
         h AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY cents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
         c AS (SELECT cents, cnt,
                      coalesce(sum(cnt) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        CAST(0 AS BIGINT)) AS p
               FROM h)
         SELECT CAST((10 * p) // n + 1 AS BIGINT) AS bin,
                CAST(sum(cnt) AS BIGINT) AS n_orders,
                CAST(min(cents) AS BIGINT) AS lo_cents,
                CAST(max(cents) AS BIGINT) AS hi_cents
         FROM c, t GROUP BY bin ORDER BY bin""",

    "q_setops_all_nationkeys" ->
      """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
         s AS (SELECT s_nationkey AS nationkey FROM supplier),
         ea AS (SELECT nationkey, count(*) AS n
                FROM (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
                GROUP BY nationkey),
         ia AS (SELECT nationkey, count(*) AS n
                FROM (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s)
                GROUP BY nationkey)
         SELECT 'except_all' AS op, CAST(nationkey AS BIGINT) AS nationkey, n FROM ea
         UNION ALL
         SELECT 'intersect_all', CAST(nationkey AS BIGINT), n FROM ia
         ORDER BY op, nationkey""",

    "q_contract_audit" ->
      """SELECT * FROM (
           SELECT 'lineitem_orders_fk' AS check_name,
             (SELECT count(*) FROM lineitem
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
             AS n_violations
           UNION ALL
           SELECT 'orders_customer_fk',
             (SELECT count(*) FROM orders
              WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
           UNION ALL
           SELECT 'orders_orderkey_nulls',
             (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
           UNION ALL
           SELECT 'orders_pk_unique',
             (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                    GROUP BY o_orderkey HAVING count(*) > 1))
           UNION ALL
           SELECT 'orders_totalprice_nonpositive',
             (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
         ) ORDER BY check_name""",

    "q_dense_daily_counts" ->
      """WITH span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span),
         types AS (SELECT DISTINCT event_type AS etype FROM events),
         actual AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT strftime(CAST(days.day AS DATE), '%Y-%m-%d') AS day,
                types.etype AS event_type,
                CAST(coalesce(actual.n, 0) AS BIGINT) AS n_events
         FROM days CROSS JOIN types
         LEFT JOIN actual ON CAST(days.day AS DATE) = actual.day
                         AND types.etype = actual.event_type
         ORDER BY day, event_type""",

    "q_revenue_share" ->
      """WITH rev AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey),
         t AS (SELECT nationkey, revenue_cents,
               CAST(sum(revenue_cents) OVER () AS BIGINT) AS total_cents FROM rev)
         SELECT nationkey, revenue_cents,
                CAST((20000 * revenue_cents + total_cents) // (2 * total_cents) AS BIGINT)
                  AS share_1e4
         FROM t ORDER BY nationkey""",

    // portable LOCF rewrite: group id = running count of non-nulls, fill =
    // the group's (single) non-null value — equivalent to last(...) IGNORE
    // NULLS without depending on that syntax existing in the oracle engine
    "q_forward_fill" ->
      """WITH c AS (SELECT user_id, event_id, ts,
           CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0','1','2')
           THEN CAST(NULL AS BIGINT)
           ELSE CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           END AS cents
           FROM events),
         g AS (SELECT user_id, event_id, cents,
               count(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
               FROM c)
         SELECT user_id, event_id, cents,
                CAST(max(cents) OVER (PARTITION BY user_id, grp) AS BIGINT) AS filled_cents
         FROM g ORDER BY user_id, event_id""",

    "q_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
         s1 AS (SELECT user_id, min(t_us) AS t_prev FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT ev.user_id, min(t_us) AS t_prev FROM ev
                JOIN s1 ON ev.user_id = s1.user_id
                WHERE event_type = 'click' AND t_us > s1.t_prev
                GROUP BY ev.user_id),
         s3 AS (SELECT ev.user_id, min(t_us) AS t_prev FROM ev
                JOIN s2 ON ev.user_id = s2.user_id
                WHERE event_type = 'purchase' AND t_us > s2.t_prev
                GROUP BY ev.user_id)
         SELECT '1_view' AS step, count(*) AS n_users FROM s1
         UNION ALL SELECT '2_click', count(*) FROM s2
         UNION ALL SELECT '3_purchase', count(*) FROM s3
         ORDER BY step""",

    // cohort LTV: retention's cohort convention priced in cum cents
    "q_cohort_ltv" ->
      operators.Analytics.cohortLtvSql("//", "epoch_us(ts)"),

    "q_cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS day_idx
           FROM events),
         c AS (SELECT user_id, min(day_idx) AS cohort_day FROM ud GROUP BY user_id)
         SELECT cohort_day, day_idx - cohort_day AS day_offset,
                count(DISTINCT ud.user_id) AS n_active
         FROM ud JOIN c ON ud.user_id = c.user_id
         GROUP BY cohort_day, day_offset
         ORDER BY cohort_day, day_offset""",

    // Same pinned-order interpolation arithmetic as the Spark side; the
    // zero-span/endpoint guard keeps engine NaN semantics out entirely.
    "q_interp_residuals" ->
      """WITH e AS (SELECT event_id, user_id, value,
           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events),
         l AS (SELECT event_id, user_id, value, t,
           lag(value) OVER w AS pv, lead(value) OVER w AS nv,
           lag(t) OVER w AS pt, lead(t) OVER w AS nt
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
         SELECT event_id, user_id,
           CASE WHEN pt IS NULL OR nt IS NULL OR nt = pt THEN NULL
           ELSE CAST(floor((value - (pv + (nv - pv)
             * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))))
             * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           END AS residual_cents
         FROM l ORDER BY event_id""",

    // Bounded-explode sliding distinct: each (user, day) feeds the 7
    // window-end days it covers; windows beyond the data end are cut.
    "q_rolling_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS uday
           FROM events),
         mx AS (SELECT max(uday) AS mx FROM ud),
         ex AS (SELECT user_id, uday, uday + o AS wend
                FROM ud CROSS JOIN range(0, 7) os(o)),
         f AS (SELECT user_id, uday, wend FROM ex, mx WHERE wend <= mx)
         SELECT wend AS day,
           CAST(count(DISTINCT CASE WHEN uday = wend THEN user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
         FROM f GROUP BY wend ORDER BY day""",

    "q_interval_overlaps" ->
      """WITH e AS (SELECT user_id, event_id,
           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS lo,
           CAST(epoch_us(ts) // 1000000 + 600 AS BIGINT) AS hi
           FROM events),
         p AS (SELECT a.user_id,
               least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_sec
               FROM e a JOIN e b ON a.user_id = b.user_id
                                AND a.event_id < b.event_id
               WHERE a.lo < b.hi AND b.lo < a.hi)
         SELECT user_id, count(*) AS n_pairs,
                CAST(sum(overlap_sec) AS BIGINT) AS overlap_sec_total
         FROM p GROUP BY user_id ORDER BY user_id""",

    "q_sample_exact_n" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
           md5(CAST(doc_id AS VARCHAR)) AS hkey,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
           FROM documents)
         SELECT doc_id, source, n_chars FROM t
         WHERE rk <= 20 ORDER BY doc_id""",

    "q_sample_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
           CAST(len($Toks) AS BIGINT) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS hkey
           FROM documents),
         c AS (SELECT source, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
               FROM t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS mixed_tokens
         FROM c WHERE cum_tokens <= 2000
         GROUP BY source ORDER BY source""",

    "q_mode_order_priority" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY o_orderstatus, o_orderpriority),
         r AS (SELECT o_orderstatus, o_orderpriority, n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC, o_orderpriority) AS rk
               FROM c)
         SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
         FROM r WHERE rk = 1 ORDER BY o_orderstatus""",

    // HUGEINT moment sums mirror Spark's DECIMAL(38,0); the exact truncated
    // quotient (x - x % den) // den matches Spark's decimal division of the
    // same remainder-free dividend
    "q_regr_slope_price_qty" ->
      """WITH b AS (SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(floor(l_extendedprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS p
           FROM lineitem),
         m AS (SELECT l_returnflag, count(*) AS n,
           sum(q) AS sq, sum(p) AS sp, sum(q * p) AS sqp, sum(q * q) AS sqq
           FROM b GROUP BY l_returnflag),
         d AS (SELECT l_returnflag, n,
           (n * sqp - sq * sp) * 1000000 AS num,
           (n * sqq - sq * sq) AS den
           FROM m)
         SELECT l_returnflag, n,
                CAST((num - num % den) // den AS BIGINT) AS slope_cents_1e6
         FROM d ORDER BY l_returnflag""",

    // parallel unnests iterate in lockstep (Postgres semantics), so pos and
    // code stay aligned; pos numbering differs from Spark's 0-based
    // posexplode but only ever joins against itself
    "q_centroid_affinity" ->
      """WITH codes AS (SELECT vec_id, label,
           unnest(range(1, len(embedding) + 1)) AS pos,
           unnest(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS code
           FROM embeddings),
         cent AS (SELECT label, pos, CAST(sum(code) AS BIGINT) AS csum,
                  count(*) AS n_label
                  FROM codes GROUP BY label, pos)
         SELECT c.vec_id, CAST(c.label AS BIGINT) AS label,
                CAST(max(t.n_label) AS BIGINT) AS n_label,
                CAST(sum(c.code * t.csum) AS BIGINT) AS affinity_q
         FROM codes c JOIN cent t ON c.label = t.label AND c.pos = t.pos
         GROUP BY c.vec_id, c.label ORDER BY c.vec_id""",

    // per-dimension embedding health: exact 2^20 integer codes, one row
    // per coordinate position (0-based dim)
    // per-dim Welch t^2 between two labels over the 2^20 integer codes
    "q_label_separability" ->
      operators.Similarity.labelSeparabilitySql(duck = true, 0, 1),

    "q_embed_dim_stats" ->
      """WITH codes AS (SELECT
           unnest(range(0, len(embedding))) AS dim,
           unnest(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS code
           FROM embeddings)
         SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
                CAST(sum(CASE WHEN code > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                CAST(sum(CASE WHEN code < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
                CAST(min(code) AS BIGINT) AS min_code,
                CAST(max(code) AS BIGINT) AS max_code,
                CAST(sum(code) AS BIGINT) AS sum_code
         FROM codes GROUP BY dim ORDER BY dim""",

    // exact Gram / second-moment matrix over the 2^20 integer codes —
    // the order-free input to covariance/PCA/whitening
    "q_embed_gram" ->
      """WITH c AS (SELECT list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)
                             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS c
           FROM embeddings),
         ex AS (SELECT len(c) AS d,
                unnest(range(0, len(c) * len(c))) AS k,
                unnest(flatten(list_transform(c, x -> list_transform(c, y -> x * y)))) AS p
           FROM c)
         SELECT CAST(k // d AS BIGINT) AS dim_i, CAST(k % d AS BIGINT) AS dim_j,
                count(*) AS n, CAST(sum(p) AS BIGINT) AS sum_ij
         FROM ex GROUP BY 1, 2 ORDER BY dim_i, dim_j""",

    "q_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         g AS (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS gram
               FROM d WHERE len(ws) >= 2),
         c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
         a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
               count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS top_n
               FROM c GROUP BY doc_id)
         SELECT doc_id, n_grams, n_distinct,
           CAST((20000 * (n_grams - n_distinct) + n_grams) // (2 * n_grams) AS BIGINT)
             AS dup_gram_ratio_1e4,
           CAST((20000 * top_n + n_grams) // (2 * n_grams) AS BIGINT)
             AS top_gram_frac_1e4
         FROM a ORDER BY doc_id""",

    "q_tfidf_top_terms" ->
      s"""WITH tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest($Toks) AS term FROM documents)
             GROUP BY doc_id, term),
         s AS (SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf),
         r AS (SELECT doc_id, term, tf, df,
               CAST((tf * 1000000) // df AS BIGINT) AS score_1e6,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY CAST((tf * 1000000) // df AS BIGINT) DESC, term) AS rk
               FROM s)
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
                CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_1e6
         FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",

    "q_chunk_docs" ->
      s"""WITH $chunkCtes
         SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_tokens,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM ch ORDER BY doc_id, chunk_idx""",

    "q_chunk_dedup" ->
      s"""WITH $chunkCtes
         SELECT md5(array_to_string(chunk, ' ')) AS chunk_md5,
                count(DISTINCT doc_id) AS n_docs,
                count(*) AS n_occurrences,
                min(doc_id) AS keeper_doc_id
         FROM ch
         GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         ORDER BY chunk_md5""",

    // single-backslash twins of TextAnalysis.{EmailRe,PhoneRe,IpRe}; DuckDB
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all semantics
    "q_pii_redact" ->
      """WITH a AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           '@mail.example.com or call 555-' ||
           lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS aug
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
         FROM a ORDER BY doc_id""",

    // Per-source report card: exact-integer sums only (no means — engine
    // division semantics stay out of the comparison).
    "q_corpus_report" ->
      s"""WITH t AS (SELECT source, text, $Toks AS toks FROM documents),
         m AS (SELECT source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, t -> list_contains(
               ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars,
             CAST(length(text) AS BIGINT) AS text_len,
             CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
             CAST(len(list_filter(toks, t -> list_contains(['der','die','und','ist','nicht','das'], t))) AS BIGINT) AS s_de,
             CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','est'], t))) AS BIGINT) AS s_fr,
             CAST(len(list_filter(toks, t -> list_contains(['el','los','que','una','por','como'], t))) AS BIGINT) AS s_es
             FROM t),
         q AS (SELECT source, n_tokens,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                  THEN 1 ELSE 0 END AS is_en,
             coalesce(CASE WHEN n_tokens = 0 OR text_len = 0 THEN NULL ELSE
               CAST(floor(
                 least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
                 * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(text_len AS DOUBLE))
                 * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                 * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END, 0) AS q4
             FROM m)
         SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(is_en) AS BIGINT) AS en_docs,
           CAST(sum(q4) AS BIGINT) AS quality_sum_1e4
         FROM q GROUP BY source ORDER BY source""",

    // Funnel stages are cumulative conditional aggregates of one flagged
    // table: quality gate (composite >= 0.5), language gate (argmax 'en'),
    // near-dup removal (minhash doc_b drop set).
    "q_corpus_funnel" ->
      s"""WITH $minhashVerifyCtes,
         drops AS (SELECT DISTINCT doc_b AS doc_id FROM verify WHERE jaccard_1e4 >= 5000),
         qm AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(ws, t -> list_contains(
               ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars,
             CAST(length(text) AS BIGINT) AS text_len
             FROM d JOIN documents USING (doc_id)),
         qs AS (SELECT doc_id,
             CASE WHEN n_tokens = 0 OR text_len = 0 THEN NULL ELSE
             CAST(floor(
               least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
               * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(text_len AS DOUBLE))
               * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
             FROM qm),
         ls AS (SELECT doc_id,
             CAST(len(list_filter(ws, t -> list_contains(['the','and','of','to','in','is'], t))) AS BIGINT) AS s_en,
             CAST(len(list_filter(ws, t -> list_contains(['der','die','und','ist','nicht','das'], t))) AS BIGINT) AS s_de,
             CAST(len(list_filter(ws, t -> list_contains(['le','la','et','les','des','est'], t))) AS BIGINT) AS s_fr,
             CAST(len(list_filter(ws, t -> list_contains(['el','los','que','una','por','como'], t))) AS BIGINT) AS s_es
             FROM d),
         f AS (SELECT doc.doc_id, doc.n_chars,
             coalesce(qs.quality_1e4 >= 5000, FALSE) AS q_ok,
             coalesce(ls.s_en >= ls.s_de AND ls.s_en >= ls.s_fr AND ls.s_en >= ls.s_es, FALSE) AS l_ok,
             doc.doc_id IN (SELECT doc_id FROM drops) AS dup
             FROM documents doc
             LEFT JOIN qs ON qs.doc_id = doc.doc_id
             LEFT JOIN ls ON ls.doc_id = doc.doc_id),
         a AS (SELECT
             CAST(count(*) AS BIGINT) AS c0, CAST(sum(n_chars) AS BIGINT) AS h0,
             CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN q_ok THEN n_chars ELSE 0 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN q_ok AND l_ok THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN q_ok AND l_ok THEN n_chars ELSE 0 END) AS BIGINT) AS h2,
             CAST(sum(CASE WHEN q_ok AND l_ok AND NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN q_ok AND l_ok AND NOT dup THEN n_chars ELSE 0 END) AS BIGINT) AS h3
             FROM f)
         SELECT stage, docs_kept, chars_kept FROM (
           SELECT '0_all' AS stage, c0 AS docs_kept, h0 AS chars_kept FROM a
           UNION ALL SELECT '1_quality', c1, h1 FROM a
           UNION ALL SELECT '2_lang_en', c2, h2 FROM a
           UNION ALL SELECT '3_dedup', c3, h3 FROM a)
         ORDER BY stage""",

    "q_dup_clusters" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, r.b FROM edges e JOIN reach r ON r.a = e.dst),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a)
         SELECT doc_id, cluster_id,
                count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM lab ORDER BY doc_id""",

    // the near-dup clustering chain (same CTEs as q_dup_clusters) joined
    // against the quality scores: every doc gets a cluster (its label or
    // itself), and the kept flag marks the per-cluster quality argmax
    // (ties to smallest doc_id)
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, r.b FROM edges e JOIN reach r ON r.a = e.dst),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a),
         qm AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         qv AS (SELECT doc_id, text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars
           FROM qm),
         qs AS (SELECT doc_id, CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
           CAST(floor(
             least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
           FROM qv),
         fullc AS (SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
                          q.quality_1e4
                   FROM qs q LEFT JOIN lab l ON l.doc_id = q.doc_id)
         SELECT doc_id, cluster_id,
                count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
                quality_1e4,
                (row_number() OVER (PARTITION BY cluster_id
                   ORDER BY quality_1e4 DESC NULLS LAST, doc_id) = 1) AS kept
         FROM fullc ORDER BY doc_id""",

    "q_dedup_exact" ->
      s"""WITH t AS (SELECT doc_id, md5(array_to_string($Toks, ' ')) AS fp FROM documents)
         SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
         FROM t GROUP BY fp ORDER BY fp""",

    // exact repeated-substring spans: every maximal token run occurring
    // verbatim >= 2 times corpus-wide (within-doc repeats included),
    // K-token windows fused gaps-and-islands style; K comes from the one
    // Dedup.SubstringK constant so oracle and operator cannot drift
    "q_substring_spans" -> {
      val k = Dedup.SubstringK
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
         grams AS (
           SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+${k - 1}], ' ')) AS g
           FROM toks, LATERAL unnest(generate_series(1, len(t) - ${k - 1})) AS u(i)
           WHERE len(t) >= $k),
         dup_pos AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS df FROM grams)
           WHERE df >= 2),
         ids AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
           FROM (SELECT doc_id, pos,
                        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
                             THEN 0 ELSE 1 END AS brk
                 FROM dup_pos))
         SELECT doc_id, min(pos) AS span_start, max(pos) + ${k - 1} AS span_end,
                count(*) AS n_windows
         FROM ids GROUP BY doc_id, island ORDER BY doc_id, span_start"""
    },

    // per-band bucket distribution + exact candidate-pair budget
    "q_lsh_band_stats" ->
      s"""WITH $ShinglesCte,
         sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
         bands AS (SELECT doc_id, $minhashBands FROM sigs),
         br AS ($minhashBandRows),
         bk AS (SELECT band_idx, band_val, count(*) AS sz FROM br GROUP BY 1, 2)
         SELECT CAST(band_idx AS BIGINT) AS band_idx,
                CAST(sum(sz) AS BIGINT) AS n_rows,
                count(*) AS n_buckets,
                CAST(max(sz) AS BIGINT) AS max_bucket,
                CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding,
                CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs
         FROM bk GROUP BY 1 ORDER BY 1""",

    // relational twin of the Bloom band screen: a band "hits" iff its 4
    // positions all join against the distinct inserted-position set; a
    // doc is flagged iff any of its bands hits
    "q_bloom_screen" ->
      s"""WITH $ShinglesCte,
         sigs AS (SELECT doc_id, sh, $minhashSigs FROM shd),
         bands AS (SELECT doc_id, $minhashBands FROM sigs),
         br AS ($minhashBandRows),
         bk AS (SELECT doc_id, CAST(band_idx AS VARCHAR) || band_val AS bkey,
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         < '${operators.Sampling.hexThreshold(0.8)}' AS seen
                FROM br),
         pos AS (SELECT doc_id, bkey, seen,
                        unnest([${Dedup.bloomPositions("bkey").mkString(", ")}]) AS pos
                 FROM bk),
         setbits AS (SELECT DISTINCT pos FROM pos WHERE seen),
         seenb AS (SELECT DISTINCT bkey FROM bk WHERE seen),
         bandhits AS (SELECT pp.doc_id, pp.bkey, count(*) AS nhit
                      FROM pos pp JOIN setbits sb ON pp.pos = sb.pos
                      WHERE NOT pp.seen GROUP BY 1, 2),
         probe AS (SELECT k.doc_id,
                          bool_or(coalesce(h.nhit, 0) = 4) AS bloom_hit,
                          bool_or(sb2.bkey IS NOT NULL) AS candidate
                   FROM bk k
                   LEFT JOIN bandhits h ON k.doc_id = h.doc_id AND k.bkey = h.bkey
                   LEFT JOIN seenb sb2 ON k.bkey = sb2.bkey
                   WHERE NOT k.seen GROUP BY 1)
         SELECT doc.source AS source, count(*) AS n_probe,
                CAST(sum(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit,
                CAST(sum(CASE WHEN p.candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
                CAST(sum(CASE WHEN p.bloom_hit AND NOT p.candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
         FROM probe p JOIN documents doc ON doc.doc_id = p.doc_id
         GROUP BY 1 ORDER BY 1""",

    "q_dedup_ngram_jaccard" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         flt AS (SELECT * FROM (
             SELECT doc_id, n_sh, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM ex) f
           WHERE df <= 100),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM flt a JOIN flt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT doc_a, doc_b,
                (20000 * common + (na + nb - common))
                // (2 * (na + nb - common)) AS jaccard_1e4
         FROM pairs
         WHERE (20000 * common + (na + nb - common))
               // (2 * (na + nb - common)) >= 5000
         ORDER BY doc_a, doc_b""",

    // prefix-filtered exact Jaccard: the oracle is the NAIVE
    // any-shared-shingle join with NO prefix and NO df cap — a different
    // algorithm whose equality proves the prefix lemma and the verify step
    "q_dedup_prefix_filter" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT doc_a, doc_b,
                (20000 * common + (na + nb - common))
                // (2 * (na + nb - common)) AS jaccard_1e4
         FROM pairs
         WHERE (20000 * common + (na + nb - common))
               // (2 * (na + nb - common)) >= 5000
         ORDER BY doc_a, doc_b""",

    // directed containment |sh(A) ∩ sh(B)| / |sh(A)|: both directions of
    // each candidate pair, each normalized by its own contained-side size
    "q_dedup_containment" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         flt AS (SELECT * FROM (
             SELECT doc_id, n_sh, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM ex) f
           WHERE df <= 100),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, count(*) AS common
           FROM flt a JOIN flt b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
           GROUP BY 1, 2, 3)
         SELECT doc_a, doc_b,
                (20000 * common + na) // (2 * na) AS containment_1e4
         FROM pairs
         WHERE (20000 * common + na) // (2 * na) >= 7000
         ORDER BY doc_a, doc_b""",

    // source×source shingle-set Jaccard, every unordered pair incl. disjoint
    "q_source_overlap" ->
      s"""WITH d AS (SELECT source, $Toks AS ws FROM documents),
         shd AS (SELECT source, list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
                 FROM d WHERE len(ws) >= 3),
         ss AS (SELECT DISTINCT source, unnest(sh) AS shingle FROM shd),
         sz AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY source),
         inter AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS cm
                   FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
                   GROUP BY 1, 2),
         pairs AS (SELECT za.source AS source_a, zb.source AS source_b,
                          za.n_sh AS na, zb.n_sh AS nb
                   FROM sz za JOIN sz zb ON za.source < zb.source)
         SELECT p.source_a, p.source_b,
                coalesce(i.cm, 0) AS common,
                p.na + p.nb - coalesce(i.cm, 0) AS union_sh,
                (20000 * coalesce(i.cm, 0) + (p.na + p.nb - coalesce(i.cm, 0)))
                // (2 * (p.na + p.nb - coalesce(i.cm, 0))) AS jaccard_1e4
         FROM pairs p LEFT JOIN inter i
           ON i.source_a = p.source_a AND i.source_b = p.source_b
         ORDER BY p.source_a, p.source_b""",

    // FastSS deletion-1 neighborhood: variant equi-join for candidates,
    // exact levenshtein verify (DuckDB range() end is exclusive, hence +1)
    "q_fuzzy_join_names" ->
      """WITH v AS (SELECT DISTINCT c_custkey, c_name,
           unnest(list_transform(range(0, length(c_name) + 1),
             i -> substr(c_name, 1, i) || substr(c_name, i + 2))) AS variant
           FROM customer),
         cand AS (SELECT DISTINCT a.c_custkey AS cust_a, a.c_name AS name_a,
                  b.c_custkey AS cust_b, b.c_name AS name_b
                  FROM v a JOIN v b
                    ON a.variant = b.variant AND a.c_custkey < b.c_custkey)
         SELECT cust_a, cust_b,
                CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
         FROM cand WHERE levenshtein(name_a, name_b) <= 1
         ORDER BY cust_a, cust_b""",

    "q_dedup_minhash_lsh" ->
      s"""WITH $minhashVerifyCtes
         SELECT doc_a, doc_b, jaccard_1e4 FROM verify
         WHERE jaccard_1e4 >= 5000 ORDER BY doc_a, doc_b""",

    // LSH recall per true-Jaccard bucket: exact pairs from the naive
    // any-shared-shingle join, found pairs from the banded pipeline
    "q_dedup_recall_report" ->
      s"""WITH $minhashVerifyCtes,
         ex2 AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
                        unnest(sh) AS shingle FROM shd),
         ep AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.n_sh AS na, b.n_sh AS nb, count(*) AS common
                FROM ex2 a JOIN ex2 b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4),
         exact AS (SELECT doc_a, doc_b,
                          (20000 * common + (na + nb - common))
                          // (2 * (na + nb - common)) AS j
                   FROM ep
                   WHERE (20000 * common + (na + nb - common))
                         // (2 * (na + nb - common)) >= 5000),
         f AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         jj AS (SELECT e.j,
                       CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM exact e
                LEFT JOIN f ON f.doc_a = e.doc_a AND f.doc_b = e.doc_b),
         b AS (SELECT least((j - 5000) // 1000, 4) AS bucket,
                      CAST(count(*) AS BIGINT) AS n_pairs,
                      CAST(sum(hit) AS BIGINT) AS n_found
               FROM jj GROUP BY 1)
         SELECT bucket, 5000 + 1000 * bucket AS lo_1e4, n_pairs, n_found,
                (20000 * n_found + n_pairs) // (2 * n_pairs) AS recall_1e4
         FROM b ORDER BY bucket""",

    // Full-corpus pairs restricted to those whose greater member is in the
    // delta (doc_id >= 80% of max): band rows agree between the index and
    // an inline recompute, so incremental == full ∩ (doc_b in delta).
    "q_dedup_incremental" ->
      s"""WITH $minhashVerifyCtes,
         mx AS (SELECT max(doc_id) * 4 // 5 AS split FROM documents)
         SELECT doc_a, doc_b, jaccard_1e4 FROM verify, mx
         WHERE jaccard_1e4 >= 5000 AND doc_b >= split
         ORDER BY doc_a, doc_b""",

    "q_dedup_apply" ->
      s"""WITH $minhashVerifyCtes,
         drops AS (SELECT DISTINCT doc_b AS doc_id FROM verify WHERE jaccard_1e4 >= 5000)
         SELECT source, count(*) AS kept_docs,
                CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         GROUP BY source ORDER BY source""",

    "q_dedup_simhash" ->
      s"""WITH $ShinglesCte, $simhashSimsCte
         SELECT doc_id, simhash FROM sims ORDER BY doc_id""",

    "q_dedup_simhash_pairs" ->
      s"""WITH $ShinglesCte, $simhashSimsCte,
         br AS ($simhashBandRows),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  bit_count(xor(a.simhash, b.simhash)) AS hamming
                  FROM br a JOIN br b
                    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                       AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming FROM cand
         WHERE hamming <= 3 ORDER BY doc_a, doc_b""",

    "q_dedup_sorted_neighborhood" ->
      s"""WITH $ShinglesCte, $simhashSimsCte,
         b AS (SELECT doc_id, simhash,
               (simhash >> 16) & 65535 AS block0,
               ((simhash + 32768) >> 16) & 65535 AS block1 FROM sims),
         l0 AS (SELECT doc_id, simhash,
               lag(doc_id, 1) OVER w AS p1, lag(simhash, 1) OVER w AS s1,
               lag(doc_id, 2) OVER w AS p2, lag(simhash, 2) OVER w AS s2
               FROM b
               WINDOW w AS (PARTITION BY block0 ORDER BY simhash, doc_id)),
         l1 AS (SELECT doc_id, simhash,
               lag(doc_id, 1) OVER w AS p1, lag(simhash, 1) OVER w AS s1,
               lag(doc_id, 2) OVER w AS p2, lag(simhash, 2) OVER w AS s2
               FROM b
               WINDOW w AS (PARTITION BY block1 ORDER BY simhash, doc_id)),
         pr AS (
           SELECT least(doc_id, p1) AS doc_a, greatest(doc_id, p1) AS doc_b,
                  bit_count(xor(simhash, s1)) AS hamming
           FROM l0 WHERE p1 IS NOT NULL
           UNION
           SELECT least(doc_id, p2), greatest(doc_id, p2),
                  bit_count(xor(simhash, s2))
           FROM l0 WHERE p2 IS NOT NULL
           UNION
           SELECT least(doc_id, p1), greatest(doc_id, p1),
                  bit_count(xor(simhash, s1))
           FROM l1 WHERE p1 IS NOT NULL
           UNION
           SELECT least(doc_id, p2), greatest(doc_id, p2),
                  bit_count(xor(simhash, s2))
           FROM l1 WHERE p2 IS NOT NULL)
         SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
         FROM pr WHERE hamming <= 3 ORDER BY doc_a, doc_b""",

    // nearest DIFFERENT-label neighbors — contrastive hard negatives
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
               FROM e WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id,
                    ${cosMicrosSql("qv", "v")} AS m
                    FROM e CROSS JOIN q
                    WHERE vec_id <> query_id AND label <> qlabel),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_ann_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id,
                    ${cosMicrosSql("qv", "v")} AS m
                    FROM e CROSS JOIN q WHERE vec_id <> query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    // MMR diversified re-rank: the greedy unrolled as k argmax steps from
    // the shared template (cos fold + // are the dialect points)
    "q_mmr_rerank" ->
      operators.Similarity.mmrSql(cosMicrosSql,
        "CAST(embedding AS DOUBLE[])", "//"),

    // bitext margin mining: CSLS ratio margin over the parity shards
    // (cos fold, array cast, and // are the dialect points)
    "q_bitext_margin" ->
      operators.Similarity.bitextMarginSql(cosMicrosSql,
        "CAST(embedding AS DOUBLE[])", "//"),

    // index-approximated bitext mining (the production entry): first-N
    // IVF candidate screen + the same CSLS tail over candidates only
    "q_bitext_margin_index" ->
      operators.Similarity.bitextMarginIndexSql(cosMicrosSql,
        "CAST(embedding AS DOUBLE[])", "//"),

    // embedding-space decontamination: same first-N IVF candidate screen,
    // eval/corpus split on vec_id % 97, per-corpus-doc hit aggregate
    "q_semantic_decontaminate" ->
      operators.Similarity.semanticDecontaminateSql(cosMicrosSql,
        "CAST(embedding AS DOUBLE[])"),

    // incremental face: build(prefix) + append(delta) must equal the
    // one-shot scan — the SAME oracle text as the parent
    "q_semantic_decontaminate_incremental" ->
      operators.Similarity.semanticDecontaminateSql(cosMicrosSql,
        "CAST(embedding AS DOUBLE[])"),

    // embedding drift monitor: cross-multiplied mean shifts over 2^20
    // integer codes (template; list dialect + // are the only points)
    "q_embed_drift" ->
      operators.Similarity.embedDriftSql(
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT))",
        """SELECT label, is_ref, CAST(i AS BIGINT) AS dim,
                  code[CAST(i AS INT)] AS c
           FROM (SELECT label, is_ref, code,
                        unnest(range(1, len(code) + 1)) AS i FROM e) t""",
        "//", operators.Sampling.hexThreshold(0.8)),

    "q_embed_lsh_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         planes AS (SELECT * FROM (VALUES $planesValuesSql) AS t(plane_id, plane)),
         dots AS (SELECT vec_id, plane_id, ${dotSql("v", "plane")} AS d
                  FROM e CROSS JOIN planes),
         sigs AS (SELECT vec_id,
                  CAST(sum(CASE WHEN d >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(plane_id AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sig
                  FROM dots GROUP BY vec_id),
         br AS (SELECT vec_id, 0 AS band_idx, sig & 255 AS band_val FROM sigs
                UNION ALL
                SELECT vec_id, 1, (sig >> 8) & 255 FROM sigs),
         cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                  FROM br a JOIN br b
                    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                       AND a.vec_id < b.vec_id),
         v AS (SELECT cand.vec_a, cand.vec_b,
               ${cosMicrosSql("ea.v", "eb.v")} AS m
               FROM cand
               JOIN e ea ON ea.vec_id = cand.vec_a
               JOIN e eb ON eb.vec_id = cand.vec_b)
         SELECT vec_a, vec_b, $micro4Sql AS score
         FROM v WHERE m >= 300000 ORDER BY vec_a, vec_b""",

    "q_ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         planes AS (SELECT * FROM (VALUES $planesValuesSql) AS t(plane_id, plane)),
         dots AS (SELECT vec_id, plane_id, ${dotSql("v", "plane")} AS d
                  FROM e CROSS JOIN planes),
         sigs AS (SELECT vec_id,
                  CAST(sum(CASE WHEN d >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(plane_id AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sig
                  FROM dots GROUP BY vec_id),
         br AS (SELECT vec_id, 0 AS band_idx, sig & 255 AS band_val FROM sigs
                UNION ALL
                SELECT vec_id, 1, (sig >> 8) & 255 FROM sigs),
         qb AS (SELECT vec_id AS query_id, band_idx, band_val FROM br WHERE vec_id < 10),
         cand AS (SELECT DISTINCT qb.query_id, br.vec_id
                  FROM br JOIN qb ON br.band_idx = qb.band_idx
                                 AND br.band_val = qb.band_val
                  WHERE br.vec_id <> qb.query_id),
         scored AS (SELECT c.query_id, c.vec_id,
                    ${cosMicrosSql("q.qv", "e.v")} AS m
                    FROM cand c
                    JOIN e ON e.vec_id = c.vec_id
                    JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10) q
                      ON q.qid = c.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
         scored_c AS (SELECT e.vec_id, c.centroid_id,
                      ${cosMicrosSql("e.v", "c.cv")} AS cm
                      FROM e CROSS JOIN c),
         assign AS (SELECT vec_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scored_c) t WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, centroid_id FROM (
                    SELECT vec_id, centroid_id,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cm DESC, centroid_id) AS rn
                    FROM scored_c WHERE vec_id < 10) t WHERE rn <= 3),
         cand AS (SELECT DISTINCT p.query_id, a.vec_id
                  FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
                  WHERE a.vec_id <> p.query_id),
         rr AS (SELECT cand.query_id, cand.vec_id,
                ${cosMicrosSql("q.qv", "e.v")} AS m
                FROM cand
                JOIN e ON e.vec_id = cand.vec_id
                JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10) q
                  ON q.qid = cand.query_id),
         ranked AS (SELECT query_id, vec_id, m,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY m DESC, vec_id) AS rank
                    FROM rr)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
                $micro4Sql AS score
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_ann_ivf_trained_topk" -> trainedIvfSql(TrainedIvf.iters, TrainedIvf.nLists,
      TrainedIvf.nQueries, TrainedIvf.nProbe, TrainedIvf.k),

    "q_ann_recall_report" -> recallReportSql(TrainedIvf.iters, TrainedIvf.nLists,
      TrainedIvf.nQueries, TrainedIvf.nProbe, TrainedIvf.k),

    // per-cluster population + truncated mean member-to-centroid cosine
    "q_kmeans_cluster_report" -> (trainedAssignCtes(TrainedIvf.iters, TrainedIvf.nLists) +
      s""",
         best AS (SELECT vec_id, centroid_id, cm FROM (
                  SELECT vec_id, centroid_id, cm,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cm DESC, centroid_id) AS rn
                  FROM scoredF) s WHERE rn = 1),
         agg AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs,
                        CAST(sum(cm) AS BIGINT) AS cm_sum
                 FROM best GROUP BY 1)
         SELECT centroid_id, n_vecs,
                CAST((cm_sum - cm_sum % n_vecs) // n_vecs AS BIGINT) AS mean_sim_micro
         FROM agg ORDER BY centroid_id"""),

    "q_ann_pq_topk" -> pqSql(PqAnn.m, PqAnn.subDim, PqAnn.ksub, PqAnn.iters,
      PqAnn.nQueries, PqAnn.k),

    "q_ann_ivfpq_topk" -> ivfPqSql(IvfPq),

    "q_semantic_dedup" -> semanticDedupSql(SemDedup.iters, SemDedup.nLists,
      SemDedup.thresholdMicros),

    // from-scratch recompute with the SAME frozen training bound the
    // incremental wrapper stages (prefix = the oldest 4/5 of vec_ids) —
    // incremental-equals-from-scratch is exactly what the comparison pins
    "q_semantic_dedup_incremental" -> semanticDedupSql(
      SemDedup.iters, SemDedup.nLists, SemDedup.thresholdMicros,
      trainFilterSql = "vec_id < (SELECT max(vec_id) * 4 // 5 FROM embeddings)"),

    // two integer-exact channels — rarity-weighted (1e6 div df) shared
    // distinct tokens through the inverted index, exact micro-cosine
    // top-k — fused by reciprocal-rank fusion (1e6 div (60 + rank))
    "q_hybrid_search" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, tok FROM
                        (SELECT doc_id, unnest($Toks) AS tok FROM documents)),
         w AS (SELECT tok, CAST(1000000 // count(*) AS BIGINT) AS w
               FROM toks GROUP BY tok HAVING count(*) <= ${Hybrid.maxDf}),
         idx AS (SELECT t.doc_id, t.tok, w.w FROM toks t JOIN w USING (tok)),
         qt AS (SELECT doc_id AS query_id, tok FROM idx
                WHERE doc_id < ${Hybrid.nQueries}),
         lex AS (SELECT q.query_id, i.doc_id, sum(i.w) AS lex_score
                 FROM idx i JOIN qt q USING (tok)
                 WHERE i.doc_id <> q.query_id
                 GROUP BY q.query_id, i.doc_id),
         lexr AS (SELECT query_id, doc_id, lex_rank FROM (
                  SELECT query_id, doc_id,
                         CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY lex_score DESC, doc_id) AS BIGINT) AS lex_rank
                  FROM lex) WHERE lex_rank <= ${Hybrid.candK}),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < ${Hybrid.nQueries}),
         vs AS (SELECT query_id, vec_id AS doc_id,
                ${cosMicrosSql("qv", "v")} AS m
                FROM e CROSS JOIN q WHERE vec_id <> query_id),
         vr AS (SELECT query_id, doc_id, vec_rank FROM (
                SELECT query_id, doc_id,
                       CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY m DESC, doc_id) AS BIGINT) AS vec_rank
                FROM vs) WHERE vec_rank <= ${Hybrid.candK}),
         f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
                      coalesce(l.doc_id, v.doc_id) AS doc_id,
                      l.lex_rank, v.vec_rank,
                      coalesce(CAST(1000000 // (${Hybrid.rrfK} + l.lex_rank) AS BIGINT), 0)
                        + coalesce(CAST(1000000 // (${Hybrid.rrfK} + v.vec_rank) AS BIGINT), 0)
                        AS rrf_micro
               FROM lexr l FULL OUTER JOIN vr v
                 ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         SELECT query_id, rank, doc_id, rrf_micro, lex_rank, vec_rank FROM (
           SELECT query_id, doc_id, rrf_micro, lex_rank, vec_rank,
                  CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
           FROM f) WHERE rank <= ${Hybrid.k}
         ORDER BY query_id, rank""",

    // Okapi BM25 in exact integer micros: idf = the Robertson ratio
    // without the log (monotone), tf saturation with milli-scaled k1/b
    // and dl/avgdl expanded to (dl*N) // sum(dl) — every factor one
    // integer division, identical on both engines
    "q_bm25_search" ->
      s"""WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM
                      (SELECT doc_id, unnest($Toks) AS tok FROM documents)
                      GROUP BY doc_id, tok),
         dl AS (SELECT doc_id, CAST(len($Toks) AS BIGINT) AS dl FROM documents),
         st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
         dfb AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok
                 HAVING count(*) * 1000 <= (SELECT n_docs FROM st) * ${Bm25.maxDfPermille}),
         idx AS (SELECT t.doc_id, t.tok, t.tf, d.df FROM tf t JOIN dfb d USING (tok)),
         qt AS (SELECT doc_id AS query_id, tok FROM idx
                WHERE doc_id < ${Bm25.nQueries}),
         sc AS (SELECT q.query_id, i.doc_id,
                CAST(sum(
                  (((2 * (st.n_docs - i.df) + 1) * CAST(1000000 AS BIGINT) // (2 * i.df + 1))
                   * ((i.tf * ${Bm25.k1Milli + 1000} * CAST(1000000000 AS BIGINT))
                      // (i.tf * 1000000 + ${Bm25.k1Milli} *
                         (1000 - ${Bm25.bMilli} + (${Bm25.bMilli} * dl.dl * st.n_docs) // st.total_tokens))))
                  // 1000000) AS BIGINT) AS score_micro,
                count(*) AS n_terms
                FROM idx i JOIN qt q USING (tok)
                JOIN dl ON dl.doc_id = i.doc_id CROSS JOIN st
                WHERE i.doc_id <> q.query_id
                GROUP BY q.query_id, i.doc_id)
         SELECT query_id, rank, doc_id, score_micro, n_terms FROM (
           SELECT query_id, doc_id, score_micro, n_terms,
                  CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
           FROM sc) WHERE rank <= ${Bm25.k}
         ORDER BY query_id, rank""",

    // positional phrase match: each term's postings shift left by its
    // phrase offset; a start position surviving the n-way join is a
    // contiguous occurrence
    "q_phrase_search" -> {
      val anchorCtes = Phrase.tokens.zipWithIndex.map { case (t, i) =>
        s"a$i AS (SELECT doc_id, pos - $i AS start_pos FROM p WHERE tok = '$t')"
      }.mkString(",\n         ")
      val joinChain = Phrase.tokens.indices.tail
        .map(i => s"JOIN a$i USING (doc_id, start_pos)").mkString(" ")
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         p AS (SELECT doc_id, i - 1 AS pos, ws[i] AS tok
               FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM d)),
         $anchorCtes,
         m AS (SELECT a0.doc_id, a0.start_pos FROM a0 $joinChain)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
                CAST(min(start_pos) AS BIGINT) AS first_pos
         FROM m GROUP BY doc_id ORDER BY doc_id"""
    },

    // Matryoshka dim ablation: per prefix dim, brute-force top-k on the
    // sliced DOUBLE[] prefix (prefix norms recomputed) vs full-dim truth
    "q_ann_dim_ablation" -> {
      def rankedSql(d: Int): String =
        s"""ab$d AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY ${cosMicrosSql(s"list_slice(q.qv, 1, $d)", s"list_slice(e.v, 1, $d)")} DESC, e.vec_id) AS rank
             FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
           WHERE rank <= ${Ablation.k})"""
      val dimBlocks = Ablation.dims.map(rankedSql).mkString(",\n         ")
      val unioned = Ablation.dims.map(d =>
        s"SELECT $d AS dim, query_id, vec_id FROM ab$d").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < ${Ablation.nQueries}),
         truth AS (SELECT query_id, vec_id FROM (
           SELECT q.query_id, e.vec_id,
                  row_number() OVER (PARTITION BY q.query_id
                    ORDER BY ${cosMicrosSql("q.qv", "e.v")} DESC, e.vec_id) AS rank
           FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
           WHERE rank <= ${Ablation.k}),
         $dimBlocks,
         ab AS ($unioned)
         SELECT CAST(ab.dim AS BIGINT) AS dim,
                CAST(count(*) AS BIGINT) AS n_retrieved,
                CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                CAST((20000 * sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) + count(*))
                     // (2 * count(*)) AS BIGINT) AS recall_1e4
         FROM ab LEFT JOIN truth t
           ON t.query_id = ab.query_id AND t.vec_id = ab.vec_id
         GROUP BY ab.dim ORDER BY dim"""
    },

    // same frozen k-means chain as q_semantic_dedup (trainedAssignCtes
    // recomputes the clusters bit-for-bit), then an equal per-cluster
    // quota picked in content-hash order
    "q_cluster_sample" ->
      (trainedAssignCtes(SemDedup.iters, SemDedup.nLists) +
        s""",
           ranked AS (SELECT vec_id, centroid_id,
                      row_number() OVER (PARTITION BY centroid_id
                        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                      FROM assignF)
           SELECT vec_id, centroid_id AS cluster_id, CAST(rn AS BIGINT) AS sample_rank
           FROM ranked WHERE rn <= ${ClusterSample.perCluster}
           ORDER BY vec_id"""),

    "q_embed_nearest_in_label" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         pairs AS (SELECT a.vec_id, a.label, b.vec_id AS b_vec_id,
                   ${cosMicrosSql("a.v", "b.v")} AS m
                   FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
         ranked AS (SELECT vec_id, label, b_vec_id, m,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY m DESC, b_vec_id) AS rk
                    FROM pairs)
         SELECT vec_id, CAST(label AS BIGINT) AS label, b_vec_id AS nn_vec_id,
                $micro4Sql AS nn_score, m >= 950000 AS is_near_dup
         FROM ranked WHERE rk = 1 ORDER BY vec_id""",

    // The Spark side generates a real constant-fill PNG per document
    // (dims/level picked by md5(text) hex chars) and DECODES it with
    // javax.imageio; the oracle predicts the decoded features from the
    // same generation formula — agreement proves the encode/decode
    // round-trip is faithful, not just that two formulas match.
    // decoded-raster identity groups predicted from the generation
    // formula (the Spark side groups on what the real decoder produced)
    "q_image_dedup" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         f AS (SELECT doc_id,
               CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS INTEGER) AS width,
               CAST(32 + (ascii(substr(hx, 2, 1)) % 16) * 8 AS INTEGER) AS height,
               CAST((ascii(substr(hx, 3, 1)) % 64) * 4 AS BIGINT) AS gray_level
               FROM m)
         SELECT width, height, gray_level, count(*) AS n_assets,
                min(doc_id) AS keeper_asset_id
         FROM f GROUP BY 1, 2, 3 HAVING count(*) > 1
         ORDER BY width, height, gray_level""",

    // near-dup ORACLE predicts from the generation formula (as
    // q_image_dedup does); Spark equality proves the decoded-raster path
    "q_image_near_dup" ->
      s"""WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         f AS (SELECT doc_id,
               CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS INTEGER) AS width,
               CAST(32 + (ascii(substr(hx, 2, 1)) % 16) * 8 AS INTEGER) AS height,
               CAST((ascii(substr(hx, 3, 1)) % 64) * 4 AS BIGINT) AS gray_level
               FROM m)
         SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
                a.width AS width, a.height AS height,
                abs(a.gray_level - b.gray_level) AS gray_delta
         FROM f a JOIN f b
           ON a.width = b.width AND a.height = b.height
              AND abs(a.gray_level - b.gray_level) <= ${ImageTol.tol}
              AND a.doc_id < b.doc_id
         ORDER BY asset_a, asset_b""",

    "q_multimodal_features" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
         SELECT doc_id AS asset_id,
         CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS INTEGER) AS width,
         CAST(32 + (ascii(substr(hx, 2, 1)) % 16) * 8 AS INTEGER) AS height,
         CAST(CAST(32 + (ascii(substr(hx, 1, 1)) % 16) * 8 AS BIGINT)
              * (32 + (ascii(substr(hx, 2, 1)) % 16) * 8)
              * 3 * ((ascii(substr(hx, 3, 1)) % 64) * 4) AS BIGINT) AS channel_sum,
         CAST((ascii(substr(hx, 3, 1)) % 64) * 4 AS BIGINT) AS gray_level
         FROM m ORDER BY asset_id""",

    // The Spark side writes a real animated GIF per document (2-4
    // constant-fill frames; dims/fills/frame-count from md5(text) hex),
    // then seeks and DECODES the k=3 sampled frames with javax.imageio.
    // The oracle predicts every decoded value from the generation formula
    // — agreement proves the multi-frame encode/seek/decode round-trip.
    "q_frame_features" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 CAST(16 + (ascii(substr(hx, 1, 1)) % 8) * 4 AS INTEGER) AS width,
                 CAST(16 + (ascii(substr(hx, 2, 1)) % 8) * 4 AS INTEGER) AS height,
                 CAST((ascii(substr(hx, 3, 1)) % 50) * 4 AS BIGINT) AS base,
                 CAST(2 + (ascii(substr(hx, 4, 1)) % 3) AS INTEGER) AS n_frames
               FROM m),
         sampled AS (SELECT DISTINCT doc_id, width, height, base, n_frames,
                       CAST((n_frames * t.i) // 3 AS INTEGER) AS frame_idx
                     FROM p, range(0, 3) t(i))
         SELECT doc_id AS asset_id, frame_idx, n_frames, width, height,
                CAST(3 * (base + 8 * frame_idx) AS BIGINT) * width * height AS channel_sum,
                CAST(base + 8 * frame_idx AS BIGINT) AS gray_level
         FROM sampled ORDER BY asset_id, frame_idx""",

    // The Spark side writes a real RIFF/WAVE container per document
    // (PCM16 mono square wave; rate/length/amplitude/half-period from
    // md5(text) hex), then container-parses it back with javax.sound and
    // computes signal stats from the decoded samples. The oracle predicts
    // every decoded value from the generation formula — agreement proves
    // the encode/parse/decode round-trip.
    "q_audio_features" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 8000 + (ascii(substr(hx, 1, 1)) % 8) * 1000 AS sample_rate,
                 256 + (ascii(substr(hx, 2, 1)) % 16) * 64 AS n_samples,
                 512 + (ascii(substr(hx, 3, 1)) % 32) * 1000 AS amp,
                 1 + (ascii(substr(hx, 4, 1)) % 4) AS hp
               FROM m)
         SELECT doc_id AS asset_id,
                CAST(sample_rate AS INTEGER) AS sample_rate,
                CAST(n_samples AS BIGINT) AS n_samples,
                CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms,
                CAST(amp AS BIGINT) AS peak,
                CAST(amp AS BIGINT) * n_samples AS abs_sum,
                CAST((n_samples - 1) // hp AS BIGINT) AS zero_crossings
         FROM p ORDER BY asset_id""",

    "q_text_clean" ->
      """WITH c AS (SELECT doc_id, text,
           trim(regexp_replace(regexp_replace(regexp_replace(text,
             '<[^>]*>', ' ', 'g'), '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g')) AS cleaned
           FROM documents)
         SELECT doc_id, md5(cleaned) AS clean_fp,
                CAST(length(cleaned) AS BIGINT) AS clean_chars,
                CAST(length(text) - length(cleaned) AS BIGINT) AS removed_chars
         FROM c ORDER BY doc_id""",

    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id, v,
               list_transform(v, x -> CAST(floor(x * CAST(127 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS codes FROM e)
         SELECT vec_id,
           CAST(list_aggregate(codes, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(codes, 'min') AS BIGINT) AS q_min,
           CAST(list_aggregate(codes, 'max') AS BIGINT) AS q_max,
           CAST(floor(
             list_reduce(list_transform(range(1, len(v) + 1),
               i -> (v[i] - CAST(codes[i] AS DOUBLE) / CAST(127 AS DOUBLE))
                  * (v[i] - CAST(codes[i] AS DOUBLE) / CAST(127 AS DOUBLE))),
               (a, b) -> a + b)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mse_micro
         FROM q ORDER BY vec_id""",

    "q_sample_hash_docs" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(0.25)}'
         ORDER BY doc_id""",

    // alpha=1/2 temperature mixing: // is the one dialect knob
    "q_temperature_mix" -> operators.Sampling.temperatureMixSql("//"),

    "q_sample_weighted_mix" -> {
      val cases = Sampling.DefaultMixWeights.toSeq.sortBy(_._1).map { case (src, r) =>
        s"WHEN '$src' THEN '${Sampling.hexThreshold(r)}'"
      }.mkString(" ")
      s"""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
               CASE source $cases ELSE '${Sampling.hexThreshold(0.0)}' END
         GROUP BY source ORDER BY source"""
    },

    "q_boilerplate" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         n AS (SELECT count(*) AS n_docs FROM shd),
         df AS (SELECT shingle, count(*) AS df FROM ex GROUP BY 1),
         boiler AS (SELECT shingle FROM df CROSS JOIN n WHERE df * 100 >= n_docs),
         j AS (SELECT e.doc_id, e.n_sh, CAST(count(b.shingle) AS BIGINT) AS n_boiler
               FROM ex e LEFT JOIN boiler b ON e.shingle = b.shingle GROUP BY 1, 2)
         SELECT doc_id, n_sh, n_boiler,
                CAST((20000 * n_boiler + n_sh) // (2 * n_sh) AS BIGINT) AS boiler_1e4
         FROM j ORDER BY doc_id""",

    "q_quality_calibrated" ->
      s"""WITH t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
         m AS (SELECT doc_id, source, text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars
           FROM t),
         sc AS (SELECT doc_id, source,
           CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
           CAST(floor(
             least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
           FROM m),
         f AS (SELECT * FROM sc WHERE quality_1e4 IS NOT NULL),
         rk AS (SELECT doc_id, source, quality_1e4,
                rank() OVER (PARTITION BY source ORDER BY quality_1e4) AS rk,
                count(*) OVER (PARTITION BY source) AS n FROM f)
         SELECT doc_id, source, quality_1e4,
                CAST(CASE WHEN n = 1 THEN 0
                     ELSE (20000 * (rk - 1) + (n - 1)) // (2 * (n - 1)) END AS BIGINT) AS pct_rank_1e4
         FROM rk ORDER BY doc_id""",

    // naive per-doc statement of the quantile normalization: max-rank by
    // a default-RANGE-frame window (ties included), pooled value by a
    // row_number-indexed lookup — no CDF build, so equality algorithmically
    // cross-checks the bounded-domain mapping the operator uses
    "q_quantile_normalize" ->
      s"""WITH t AS (SELECT doc_id, source, text, $Toks AS toks FROM documents),
         m AS (SELECT doc_id, source, text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars
           FROM t),
         sc AS (SELECT doc_id, source,
           CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
           CAST(floor(
             least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
             * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS quality_1e4
           FROM m),
         f AS (SELECT * FROM sc WHERE quality_1e4 IS NOT NULL),
         r AS (SELECT doc_id, source, quality_1e4,
                CAST(sum(1) OVER (PARTITION BY source ORDER BY quality_1e4) AS BIGINT) AS cum_s,
                CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s,
                CAST(count(*) OVER () AS BIGINT) AS n_total FROM f),
         p AS (SELECT quality_1e4 AS pq,
                CAST(row_number() OVER (ORDER BY quality_1e4, doc_id) AS BIGINT) AS idx
               FROM f)
         SELECT r.doc_id, r.source, r.quality_1e4, p.pq AS pooled_1e4
         FROM r JOIN p ON p.idx = (r.cum_s * r.n_total + r.n_s - 1) // r.n_s
         ORDER BY r.doc_id""",

    "q_dedup_threshold_sweep" ->
      s"""WITH $minhashVerifyCtes,
         pass AS (SELECT doc_a, doc_b, jaccard_1e4 FROM verify WHERE jaccard_1e4 >= 5000),
         gridded AS (SELECT doc_a, doc_b,
             unnest(range(CAST(5000 AS BIGINT), jaccard_1e4 - jaccard_1e4 % 500 + 1, 500)) AS threshold_1e4
             FROM pass)
         SELECT threshold_1e4, count(*) AS n_pairs,
                CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
         FROM gridded GROUP BY 1 ORDER BY 1""",

    "q_mix_apportion" ->
      s"""WITH perSrc AS (SELECT source, CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
                          FROM documents GROUP BY source),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
                        CAST((sum(n_tokens) - sum(n_tokens) % 3) // 3 AS BIGINT) AS budget
                 FROM perSrc),
         quota AS (SELECT source, n_tokens, t, budget,
                   CAST((budget * n_tokens - (budget * n_tokens) % t) // t AS BIGINT) AS base_tokens,
                   CAST((budget * n_tokens) % t AS BIGINT) AS remainder
                   FROM perSrc CROSS JOIN tot),
         ranked AS (SELECT *, budget - sum(base_tokens) OVER () AS extra,
                    row_number() OVER (ORDER BY remainder DESC, source) AS rk
                    FROM quota)
         SELECT source, n_tokens, base_tokens, remainder,
                CAST(base_tokens + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
         FROM ranked ORDER BY source""",

    "q_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS g
               FROM d WHERE len(ws) >= 4),
         ev AS (SELECT DISTINCT g, doc_id AS eval_doc FROM g WHERE doc_id % 97 = 0),
         tr AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0)
         SELECT tr.doc_id, CAST(count(DISTINCT tr.g) AS BIGINT) AS n_overlap_ngrams,
                CAST(count(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
         FROM tr JOIN ev ON tr.g = ev.g
         GROUP BY tr.doc_id ORDER BY tr.doc_id""",

    "q_length_filter_impact" ->
      s"""WITH d AS (SELECT CAST(len($Toks) AS BIGINT) AS n_tokens FROM documents),
         g AS (SELECT n_tokens,
               unnest(list_filter([CAST(1 AS BIGINT), 5, 10, 25, 50],
                 t -> t <= n_tokens)) AS min_tokens FROM d)
         SELECT min_tokens, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM g GROUP BY 1 ORDER BY 1""",

    "q_dup_cluster_sizes" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         prs AS (SELECT doc_a, doc_b FROM verify WHERE jaccard_1e4 >= 5000),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(a, b) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, r.b FROM edges e JOIN reach r ON r.a = e.dst),
         lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a),
         sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters
         FROM sz GROUP BY 1 ORDER BY 1""",

    "q_contamination_report" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS ws FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS g
               FROM d WHERE len(ws) >= 4),
         ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
         hits AS (SELECT DISTINCT t.doc_id FROM g t JOIN ev ON t.g = ev.g
                  WHERE t.doc_id % 97 <> 0),
         docs AS (SELECT doc_id, source FROM documents WHERE doc_id % 97 <> 0)
         SELECT source, count(*) AS n_docs,
                CAST(count(h.doc_id) AS BIGINT) AS n_contaminated,
                CAST((20000 * count(h.doc_id) + count(*))
                     // (2 * count(*)) AS BIGINT) AS contaminated_1e4
         FROM docs LEFT JOIN hits h ON docs.doc_id = h.doc_id
         GROUP BY source ORDER BY source""",

    "q_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n_tokens
                     FROM documents),
         st AS (SELECT doc_id, source, n_tokens,
                COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt FROM d)
         SELECT source, CAST(strt // 512 AS BIGINT) AS seq_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM st GROUP BY 1, 2 ORDER BY 1, 2""",

    // packing-efficiency rollup from the same derivation (shared template)
    "q_pack_efficiency" ->
      operators.Curation.packEfficiencySql(s"len($Toks)", "//"),

    "q_split_stratified" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n_tokens,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(0.8)}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(0.9)}' THEN 'valid'
                    ELSE 'test' END AS split FROM documents),
         g AS (SELECT source, split, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY 1, 2),
         t AS (SELECT *, sum(n_docs) OVER (PARTITION BY source) AS src_total FROM g)
         SELECT source, split, n_docs, n_tokens,
                CAST((20000 * n_docs + src_total) // (2 * src_total) AS BIGINT) AS share_1e4
         FROM t ORDER BY source, split""",

    "q_zorder_layout" -> {
      // Morton interleave in DuckDB dialect: bit i of e is (e // 2^i) % 2
      def bit(e: String, i: Int) = s"(($e // ${1L << i}) % 2)"
      val morton = (0 until 16).map { i =>
        s"${bit("xn", i)} * ${1L << (2 * i)} + ${bit("yn", i)} * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
                     min(l_suppkey) AS mns, max(l_suppkey) AS mxs FROM lineitem),
         n AS (SELECT l_partkey, l_suppkey, mnp, mxp, mns, mxs,
               ((CAST(l_partkey AS BIGINT) - mnp) * 65535) // greatest(mxp - mnp, 1) AS xn,
               ((CAST(l_suppkey AS BIGINT) - mns) * 65535) // greatest(mxs - mns, 1) AS yn
               FROM lineitem CROSS JOIN b),
         zed AS (SELECT *, ($morton) AS z FROM n),
         cells AS (SELECT z // ${1L << 28} AS z_cell, count(*) AS n_rows,
                   min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                   min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
                   min(mnp) AS mnp, min(mxp) AS mxp, min(mns) AS mns, min(mxs) AS mxs
                   FROM zed GROUP BY 1)
         SELECT CAST(z_cell AS BIGINT) AS z_cell, n_rows,
                min_part, max_part, min_supp, max_supp,
                CAST((20000 * (max_part - min_part) + greatest(mxp - mnp, 1))
                     // (2 * greatest(mxp - mnp, 1)) AS BIGINT) AS part_span_1e4,
                CAST((20000 * (max_supp - min_supp) + greatest(mxs - mns, 1))
                     // (2 * greatest(mxs - mns, 1)) AS BIGINT) AS supp_span_1e4
         FROM cells ORDER BY z_cell"""
    },

    // zone-map prune audit: read-amplification per predicate box
    "q_zone_prune_audit" -> operators.Layout.zonePruneSql("//"),

    // two-sample KS over exact-integer CDFs; one // vs DIV dialect knob
    "q_ks_drift" -> operators.Quality.ksDriftSql("//"),

    // Benford first-digit audit: expected shares are pinned literals
    "q_benford_audit" -> operators.Quality.benfordAuditSql("//"),

    // categorical concentration (HHI over half-up 1e-3 shares)
    "q_column_hhi" -> operators.Quality.columnHhiSql("//"),

    // class-balanced downsample: portable md5-ordered rank + derived quota
    "q_balanced_downsample" -> operators.Sampling.balancedDownsampleSql,

    // U-shaped attribution: oracle spells the quadratic pair join, the
    // operator the window form — parity proves them equivalent
    "q_attribution_position" -> operators.Analytics.positionAttributionSql("//"),

    // Markov removal-effect attribution: value iteration unrolled (the
    // pagerank pattern); same text as the Spark twin modulo // and epoch_us
    "q_markov_attribution" ->
      operators.Analytics.markovAttributionSql("//", "epoch_us(ts)", Markov.rounds),

    // time-decay attribution: the oracle spells the quadratic pair join;
    // dialect points are //, epoch_us, and the >> spelling
    "q_attribution_time_decay" ->
      operators.Analytics.timeDecayAttributionSql("//", "epoch_us(ts)",
        (a, b) => s"($a >> $b)", 9),

    // Flesch-shape readability in portable integer fixed point
    "q_readability" -> operators.TextAnalysis.readabilitySql(duck = true),

    // tokenizer round-trip: encode, decode through the vocab, compare
    "q_decode_roundtrip" -> operators.TextAnalysis.decodeRoundtripSql(duck = true),

    // bounded min-label propagation, rounds unrolled; fully portable text
    "q_connected_components" ->
      operators.Mining.connectedComponentsSql(Basket.maxItems, Basket.ccMinCo,
        Basket.ccRounds, Basket.topK),

    // fixed-round k-core peel, rounds unrolled as a single-reference
    // window chain (portable text; see kcoreMembershipSql for why the
    // naive unrolling explodes under per-reference CTE inlining)
    "q_kcore_membership" ->
      operators.Mining.kcoreMembershipSql(Basket.maxItems,
        Basket.ccMinCo, Basket.kcoreK, Basket.kcoreRounds),

    // naive id-ordered triangles per node; // vs DIV is the only knob
    "q_clustering_coeff" ->
      operators.Mining.clusteringCoeffSql("//", Basket.maxItems,
        Basket.coeffMinDeg, Basket.topK),

    // rank*freq/f1 Zipf curve in exact integers (no libm log)
    "q_zipf_profile" ->
      operators.TextAnalysis.zipfProfileSql(duck = true,
        Seq(1, 2, 4, 8, 16, 32, 64)),

    // exact P5/P95 clamp + half-up mean over the value-domain CDF frame
    "q_winsorized_stats" -> operators.Analytics.winsorizedStatsSql("//"),

    // BM25 recall/MRR against the exact PPJoin near-dup ground truth
    "q_retrieval_eval" ->
      operators.Retrieval.retrievalEvalSql(duck = true, Seq(1, 5, 10),
        Bm25.maxDfPermille, Bm25.k1Milli, Bm25.bMilli),

    // which feed copies which: exact near-dup pairs per source pair
    "q_dup_flow" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         tp AS (SELECT doc_a, doc_b FROM pairs
                WHERE (20000 * common + (na + nb - common))
                      // (2 * (na + nb - common)) >= 5000)
         SELECT least(da.source, db.source) AS source_a,
                greatest(da.source, db.source) AS source_b,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM tp JOIN documents da ON da.doc_id = tp.doc_a
                 JOIN documents db ON db.doc_id = tp.doc_b
         GROUP BY 1, 2 ORDER BY source_a, source_b""",

    // near-dup pairs classified by the md5 train/valid/test split of
    // their endpoints; off-diagonal rows are evaluation contamination
    "q_split_leakage" ->
      s"""WITH $ShinglesCte,
         ex AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS shingle FROM shd),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n_sh AS na, b.n_sh AS nb, count(*) AS common
           FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4),
         tp AS (SELECT doc_a, doc_b FROM pairs
                WHERE (20000 * common + (na + nb - common))
                      // (2 * (na + nb - common)) >= 5000),
         lab AS (SELECT
           CASE WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)
                     < '${Sampling.hexThreshold(0.8)}' THEN 'train'
                WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)
                     < '${Sampling.hexThreshold(0.9)}' THEN 'valid'
                ELSE 'test' END AS sa,
           CASE WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)
                     < '${Sampling.hexThreshold(0.8)}' THEN 'train'
                WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)
                     < '${Sampling.hexThreshold(0.9)}' THEN 'valid'
                ELSE 'test' END AS sb
           FROM tp)
         SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(CASE WHEN least(sa, sb) <> greatest(sa, sb)
                          THEN 1 ELSE 0 END AS INTEGER) AS leak
         FROM lab GROUP BY 1, 2 ORDER BY split_a, split_b""",

    // quality-selection gain curve: the oracle states the NAIVE global
    // row_number; the operator's range-partitioned distributed rank must
    // be result-invisible (the revenueLorenz contract)
    "q_selection_gain" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS toks FROM documents),
         m AS (SELECT doc_id, text,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(
             ['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS stop_hits,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars
           FROM t),
         d AS (SELECT doc_id, n_tokens,
           coalesce(CASE WHEN n_tokens = 0 OR length(text) = 0 THEN NULL ELSE
             CAST(floor(
               least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(50 AS DOUBLE))
               * (CAST(1 AS DOUBLE) - CAST(punct_chars AS DOUBLE) / CAST(length(text) AS DOUBLE))
               * (CAST(0.5 AS DOUBLE) + CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END,
             CAST(-1 AS BIGINT)) AS q
           FROM m),
         r AS (SELECT doc_id, n_tokens, q,
                      CAST(row_number() OVER (ORDER BY q, doc_id) AS BIGINT) AS rank,
                      CAST(count(*) OVER () AS BIGINT) AS n,
                      CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
               FROM d),
         g AS (SELECT (10 * (n - rank)) // n AS decile,
                      CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_tokens) AS BIGINT) AS tokens_sum,
                      CAST(min(q) AS BIGINT) AS min_quality_1e4,
                      CAST(max(total_tokens) AS BIGINT) AS total_tokens
               FROM r GROUP BY 1)
         SELECT CAST(decile AS BIGINT) AS decile, n_docs, tokens_sum,
                min_quality_1e4,
                CAST(sum(tokens_sum) OVER (ORDER BY decile) AS BIGINT)
                  AS cum_tokens,
                CAST((20000 * sum(tokens_sum) OVER (ORDER BY decile)
                      + total_tokens) // (2 * total_tokens) AS BIGINT)
                  AS cum_share_1e4
         FROM g ORDER BY decile""",

    // declared-vs-detected language confusion matrix
    "q_lang_confusion" -> operators.TextAnalysis.langConfusionSql(duck = true),

    // Simpson + inverse-Simpson language mix per source; // is the only
    // dialect point
    "q_lang_diversity" -> operators.TextAnalysis.langDiversitySql("//"),

    // effective source count by token mass; // + tokenizer dialect
    "q_source_mix_diversity" ->
      operators.TextAnalysis.sourceMixDiversitySql(duck = true, "//"),

    // token-mass-weighted length percentiles (max-rank threshold rule)
    "q_weighted_len_pctl" ->
      operators.TextAnalysis.weightedLengthPercentilesSql(duck = true),

    // token-share drift between the first 80% and trailing 20% by doc_id
    "q_vocab_drift" ->
      operators.TextAnalysis.vocabDriftSql(duck = true, 20, 25),

    // three-step journey mining; fully portable text
    "q_journey_trigrams" -> operators.Analytics.journeyTrigramsSql(25),

    // scene cuts predicted from the GIF generation formula; the Spark
    // side detects them on the REAL decoded frames (the q_frame_features
    // decode-vs-prediction contract, extended to the lag structure)
    "q_shot_boundaries" ->
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
         p AS (SELECT doc_id,
                 CAST((ascii(substr(hx, 3, 1)) % 50) * 4 AS BIGINT) AS base,
                 CAST(2 + (ascii(substr(hx, 4, 1)) % 3) AS INTEGER) AS n_frames
               FROM m),
         sampled AS (SELECT DISTINCT doc_id, base, n_frames,
                       CAST((n_frames * t.i) // 3 AS INTEGER) AS frame_idx
                     FROM p, range(0, 3) t(i)),
         f AS (SELECT doc_id, frame_idx,
                      CAST(base + 8 * frame_idx AS BIGINT) AS gray_level
               FROM sampled),
         lagged AS (SELECT doc_id, frame_idx, gray_level,
                      lag(gray_level) OVER (PARTITION BY doc_id
                        ORDER BY frame_idx) AS prev
                    FROM f),
         cuts AS (SELECT doc_id, frame_idx,
                    CASE WHEN prev IS NOT NULL
                              AND abs(gray_level - prev) * 16 >= prev
                         THEN 1 ELSE 0 END AS cut
                  FROM lagged)
         SELECT doc_id AS asset_id,
                CAST(count(*) AS BIGINT) AS n_sampled,
                CAST(sum(cut) AS BIGINT) AS n_boundaries,
                CAST(coalesce(min(CASE WHEN cut = 1 THEN frame_idx END), -1)
                     AS BIGINT) AS first_cut_idx
         FROM cuts GROUP BY doc_id ORDER BY asset_id""",

    // variance-to-mean dispersion per token (boilerplate statistics)
    "q_token_burstiness" ->
      operators.TextAnalysis.tokenBurstinessSql(duck = true, 50, 25),

    // dup density per ingestion decile (newer endpoint charged)
    "q_dup_rate_trend" ->
      operators.Dedup.dupRateTrendSql("//", ShinglesCte, "len", "unnest"),

    // systematic PPS draw over the cumulative token line; the oracle's
    // cumsum is the naive global window (the Lorenz contract)
    "q_sample_pps" -> operators.Sampling.ppsSampleSql("//", "len", "", 100),

    // log2-bucketed degree census of the co-purchase graph
    "q_degree_histogram" ->
      operators.Mining.degreeHistogramSql(Basket.maxItems,
        "CAST(CAST(1 AS BIGINT) << bucket AS BIGINT)"),

    // BPE-ish pieces per whitespace word, by language (the q_token_estimate
    // piece regex, aggregated)
    "q_tokenizer_fertility" ->
      """WITH b AS (SELECT lang, coalesce(text, '') AS t,
           regexp_extract_all(coalesce(text, ''),
             '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s+') AS bpe
           FROM documents),
         c AS (SELECT lang,
                 CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS words,
                 CAST(len(list_filter(bpe, p -> NOT regexp_matches(p, '^\s+$'))) AS BIGINT) AS pieces
               FROM b),
         g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(words) AS BIGINT) AS n_words,
                      CAST(sum(pieces) AS BIGINT) AS n_pieces
               FROM c GROUP BY lang)
         SELECT lang, n_docs, n_words, n_pieces,
                CAST((20000 * n_pieces + n_words) // (2 * n_words) AS BIGINT)
                  AS fertility_1e4
         FROM g ORDER BY lang"""
  )
}
