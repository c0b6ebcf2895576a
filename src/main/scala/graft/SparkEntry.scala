package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, Ext2Queries, Ext3Queries, Ext4Queries, Ext5Queries, Ext6Queries, Ext7Queries, Ext8Queries, Ext9Queries, Ext10Queries, Ext11Queries, Ext12Queries, Ext13Queries, Ext14Queries, Ext15Queries, Ext16Queries, Ext17Queries, Ext18Queries, Ext19Queries, Ext20Queries, Ext21Queries, Ext22Queries, Ext23Queries, Ext24Queries, Ext25Queries, Ext26Queries, Ext27Queries, Ext28Queries, Ext29Queries, Ext30Queries, Ext31Queries, Ext32Queries, Ext33Queries, Ext34Queries, Ext35Queries, Ext36Queries, Ext37Queries, ExtQueries, LlmQueries, StreamQueries, WireQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's parquet corpus, paired (where SQL-expressible) with an
  * ANSI-SQL oracle the driver executes in DuckDB on the same tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference-pipeline parity query: 4 indicator branches, union,
    * null filter, broadcast dim join (spark_job_1.py:22-71).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.indicatorUnion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (CoreQueries.q1Agg _),
    "q_window_sma" -> (CoreQueries.windowSma _),
    "q_window_rsi" -> (CoreQueries.windowRsi _),
    "q_window_bollinger" -> (CoreQueries.windowBollinger _),
    "q_indicator_union" -> (CoreQueries.indicatorUnion _),
    "q_anti_join" -> (CoreQueries.antiJoin _),
    "q_dim_join_agg" -> (CoreQueries.dimJoinAgg _),
    "q_get_or_create_dim" -> (CoreQueries.getOrCreateDim _),
    "q_topn_per_group" -> (CoreQueries.topNPerGroup _),
    "q_union_by_name" -> (CoreQueries.unionByNameAgg _),
    "q_epoch_roundtrip" -> (CoreQueries.epochRoundtrip _),
    "q_json_extract" -> (CoreQueries.jsonExtract _),
    "q_regex_filter" -> (CoreQueries.regexFilter _),
    "q_coalesce_default" -> (CoreQueries.coalesceDefault _),
    "q_parse_prices" -> (WireQueries.parsePrices _),
    "q_parse_news" -> (WireQueries.parseNews _),
    "q_rfc822_parse" -> (WireQueries.rfc822Parse _),
    "q_decimal_cast" -> (WireQueries.decimalCast _),
    "q_exact_dedup" -> (WireQueries.exactDedup _),
    "q_stream_tumbling" -> (StreamQueries.streamTumbling _),
    "q_state_inspect" -> (StreamQueries.stateInspect _),
    "q_session_window" -> (StreamQueries.sessionWindow _),
    "q_sliding_window" -> (StreamQueries.slidingWindow _),
    "q_token_stats" -> (LlmQueries.tokenStats _),
    "q_quality_score" -> (LlmQueries.qualityScore _),
    "q_lang_id" -> (LlmQueries.langId _),
    "q_fingerprint" -> (LlmQueries.fingerprintDocs _),
    "q_ngram_jaccard" -> (LlmQueries.ngramJaccard _),
    "q_minhash_neardup" -> (LlmQueries.minhashNearDup _),
    "q_simhash_neardup" -> (LlmQueries.simhashNearDup _),
    "q_simhash_fast" -> (LlmQueries.simhashFast _),
    "q_dedup_clusters" -> (LlmQueries.dedupClusters _),
    "q_top_terms" -> (LlmQueries.topTerms _),
    "q_embed_neardup" -> (LlmQueries.embedNearDup _),
    "q_cosine_topk" -> (LlmQueries.cosineTopK _),
    "q_ann_ivf" -> (LlmQueries.annIvf _),
    "q_multimodal_meta" -> (LlmQueries.multimodalMeta _),
    "q_sentiment" -> (LlmQueries.sentimentNews _),
    "q_rss_parse" -> (graft.queries.RssQueries.rssParse _),
    "q_scrape_sentiment" -> (graft.queries.RssQueries.scrapeSentiment _),
    "q_pipeline_e2e" -> (graft.queries.PipelineE2E.run _),
    "q_stateful_indicators" -> (StreamQueries.statefulIndicators _),
    "q_asof_join" -> (CoreQueries.asofJoin _),
    "q_distinct_agg" -> (CoreQueries.distinctAgg _),
    "q_rollup" -> (CoreQueries.rollupAgg _),
    "q_percentile" -> (CoreQueries.percentileAgg _),
    "q_range_join" -> (CoreQueries.rangeJoin _),
    "q_set_ops" -> (CoreQueries.setOps _),
    "q_vector_stats" -> (CoreQueries.vectorStats _),
    "q_pivot" -> (CoreQueries.pivotAgg _),
    "q_cube" -> (ExtQueries.cubeAgg _),
    "q_window_rank" -> (ExtQueries.windowRank _),
    "q_range_frame" -> (ExtQueries.rangeFrame _),
    "q_date_arith" -> (ExtQueries.dateArith _),
    "q_fuzzy_match" -> (ExtQueries.fuzzyMatch _),
    "q_heavy_hitters" -> (ExtQueries.heavyHitters _),
    "q_approx_distinct" -> (ExtQueries.approxDistinct _),
    "q_asof_forward" -> (ExtQueries.asofForward _),
    "q_salted_agg" -> (ExtQueries.saltedAgg _),
    "q_stream_dedup" -> (ExtQueries.streamDedup _),
    "q_unpivot" -> (ExtQueries.unpivotMetrics _),
    "q_source_v2" -> (ExtQueries.sourceV2 _),
    "q_asof_native" -> (ExtQueries.asofNative _),
    "q_tfidf" -> (Ext2Queries.tfidf _),
    "q_salted_join" -> (Ext2Queries.saltedJoin _),
    "q_full_outer" -> (Ext2Queries.fullOuter _),
    "q_semi_join" -> (Ext2Queries.semiJoin _),
    "q_approx_quantile" -> (Ext2Queries.approxQuantile _),
    "q_window_positional" -> (Ext2Queries.windowPositional _),
    "q_stream_join" -> (Ext2Queries.streamJoin _),
    "q_udtf_tokenize" -> (Ext2Queries.udtfTokenize _),
    "q_lsh_ann" -> (Ext2Queries.lshAnn _),
    "q_frame_sample" -> (Ext2Queries.frameSample _),
    "q_correlated_sub" -> (Ext2Queries.correlatedSub _),
    "q_exists_sub" -> (Ext2Queries.existsSub _),
    "q_resize_plan" -> (Ext2Queries.resizePlan _),
    "q_grouping_sets" -> (Ext3Queries.groupingSets _),
    "q_agg_filter" -> (Ext3Queries.aggFilter _),
    "q_array_funcs" -> (Ext3Queries.arrayFuncs _),
    "q_string_funcs" -> (Ext3Queries.stringFuncs _),
    "q_null_semantics" -> (Ext3Queries.nullSemantics _),
    "q_regex_extract_all" -> (Ext3Queries.regexExtractAll _),
    "q_bucketed_join" -> (Ext3Queries.bucketedJoin _),
    "q_window_ntile" -> (Ext4Queries.windowNtile _),
    "q_min_max_by" -> (Ext4Queries.minMaxBy _),
    "q_hash_sample" -> (Ext4Queries.hashSample _),
    "q_scd2" -> (Ext4Queries.scd2 _),
    "q_merge_upsert" -> (Ext4Queries.mergeUpsert _),
    "q_histogram" -> (Ext4Queries.histogram _),
    "q_map_funcs" -> (Ext4Queries.mapFuncs _),
    "q_bpe_tokenize" -> (Ext4Queries.bpeTokenize _),
    "q_zorder" -> (Ext5Queries.zorderCluster _),
    "q_binned_range_join" -> (Ext5Queries.binnedRangeJoin _),
    "q_sketch_merge" -> (Ext5Queries.sketchMerge _),
    "q_audio_chunks" -> (Ext5Queries.audioChunks _),
    "q_json_struct" -> (Ext5Queries.jsonStruct _),
    "q_char_entropy" -> (Ext5Queries.charEntropy _),
    "q_tws_totals" -> (Ext5Queries.twsTotals _),
    "q_forward_fill" -> (Ext5Queries.forwardFill _),
    "q_calendar_spine" -> (Ext5Queries.calendarSpine _),
    "q_stream_session" -> (Ext5Queries.streamSession _),
    "q_order_limit" -> (Ext5Queries.orderLimit _),
    "q_set_ops_all" -> (Ext5Queries.setOpsAll _),
    "q_regr_stats" -> (Ext6Queries.regrStats _),
    "q_bitwise_agg" -> (Ext6Queries.bitwiseAgg _),
    "q_listagg" -> (Ext6Queries.listAgg _),
    "q_safe_arith" -> (Ext6Queries.safeArith _),
    "q_partitioned_scan" -> (Ext6Queries.partitionedScan _),
    "q_latest_snapshot" -> (Ext6Queries.latestSnapshot _),
    "q_recursive_cte" -> (Ext6Queries.recursiveCte _),
    "q_lateral_join" -> (Ext6Queries.lateralJoin _),
    "q_variant_json" -> (Ext6Queries.variantJson _),
    "q_pii_redact" -> (Ext7Queries.piiRedact _),
    "q_url_domains" -> (Ext7Queries.urlDomains _),
    "q_dup_spans" -> (Ext7Queries.dupSpans _),
    "q_embed_quantize" -> (Ext7Queries.embedQuantize _),
    "q_stream_static" -> (Ext7Queries.streamStatic _),
    "q_decontaminate" -> (Ext7Queries.decontaminate _),
    "q_stratified_sample" -> (Ext7Queries.stratifiedSample _),
    "q_csv_roundtrip" -> (Ext7Queries.csvRoundtrip _),
    "q_json_roundtrip" -> (Ext7Queries.jsonRoundtrip _),
    "q_from_xml" -> (Ext8Queries.fromXml _),
    "q_xml_source" -> (Ext8Queries.xmlSource _),
    "q_crosstab" -> (Ext8Queries.crosstab _),
    "q_approx_top_k" -> (Ext8Queries.approxTopK _),
    "q_user_growth" -> (Ext8Queries.userGrowth _),
    "q_catalog_table" -> (Ext8Queries.catalogTable _),
    "q_udf_registered" -> (Ext8Queries.udfRegistered _),
    "q_jdbc_roundtrip" -> (Ext8Queries.jdbcRoundtrip _),
    "q_orc_roundtrip" -> (Ext8Queries.orcRoundtrip _),
    "q_corrupt_records" -> (Ext8Queries.corruptRecords _),
    "q_moments" -> (Ext8Queries.moments _),
    "q_central_tendency" -> (Ext8Queries.centralTendency _),
    "q_pagerank" -> (Ext8Queries.pagerank _),
    "q_tpch_q3" -> (Ext9Queries.tpchQ3 _),
    "q_tpch_q5" -> (Ext9Queries.tpchQ5 _),
    "q_tpch_q10" -> (Ext9Queries.tpchQ10 _),
    "q_tpch_q18" -> (Ext9Queries.tpchQ18 _),
    "q_tpch_q21" -> (Ext9Queries.tpchQ21 _),
    "q_funnel" -> (Ext9Queries.funnel _),
    "q_event_sequence" -> (Ext9Queries.eventSequence _),
    "q_cohort_retention" -> (Ext9Queries.cohortRetention _),
    "q_rolling_distinct" -> (Ext9Queries.rollingDistinct _),
    "q_gap_fill" -> (Ext9Queries.gapFill _),
    "q_null_safe_join" -> (Ext9Queries.nullSafeJoin _),
    "q_corr_matrix" -> (Ext9Queries.corrMatrix _),
    "q_repetition_filter" -> (Ext9Queries.repetitionFilter _),
    "q_ann_rerank" -> (Ext9Queries.annRerank _),
    "q_ohlc_resample" -> (Ext10Queries.ohlcResample _),
    "q_vwap" -> (Ext10Queries.vwap _),
    "q_jaccard_prefix" -> (Ext10Queries.jaccardPrefix _),
    "q_rolling_hll" -> (Ext10Queries.rollingHll _),
    "q_unigram_lm" -> (Ext11Queries.unigramLm _),
    "q_doc_chunks" -> (Ext11Queries.docChunks _),
    "q_normalize_dedup" -> (Ext11Queries.normalizeDedup _),
    "q_bloom_clean" -> (Ext11Queries.bloomClean _),
    "q_pack_sequences" -> (Ext11Queries.packSequences _),
    "q_tpch_q17" -> (Ext9Queries.tpchQ17 _),
    "q_doc_pipeline" -> (Ext11Queries.docPipeline _),
    "q_hard_negatives" -> (LlmQueries.hardNegatives _),
    "q_class_centroids" -> (LlmQueries.classCentroids _),
    "q_source_balance" -> (Ext11Queries.sourceBalance _),
    "q_schema_evolution" -> (Ext11Queries.schemaEvolution _),
    "q_semdedup" -> (Ext12Queries.semDedup _),
    "q_kanonymity" -> (Ext12Queries.kAnonymity _),
    "q_curriculum" -> (Ext12Queries.curriculum _),
    "q_winsorize" -> (Ext12Queries.winsorize _),
    "q_mad_outliers" -> (Ext12Queries.madOutliers _),
    "q_tpch_q6" -> (Ext12Queries.tpchQ6 _),
    "q_tpch_q14" -> (Ext12Queries.tpchQ14 _),
    "q_triangle_count" -> (Ext12Queries.triangleCount _),
    "q_class_weights" -> (Ext12Queries.classWeights _),
    "q_interleave_shards" -> (Ext12Queries.interleaveShards _),
    "q_freshness_decay" -> (Ext12Queries.freshnessDecay _),
    "q_tokenizer_fertility" -> (Ext12Queries.tokenizerFertility _),
    "q_vocab_growth" -> (Ext12Queries.vocabGrowth _),
    "q_matryoshka" -> (Ext12Queries.matryoshkaRecall _),
    "q_compaction_plan" -> (Ext12Queries.compactionPlan _),
    "q_abtest_welch" -> (Ext13Queries.abtestWelch _),
    "q_psi_drift" -> (Ext13Queries.psiDrift _),
    "q_data_quality" -> (Ext13Queries.dataQuality _),
    "q_skyline" -> (Ext13Queries.skyline _),
    "q_ks_stat" -> (Ext13Queries.ksStat _),
    "q_tpch_q1" -> (Ext14Queries.tpchQ1 _),
    "q_tpch_q7" -> (Ext14Queries.tpchQ7 _),
    "q_tpch_q8" -> (Ext14Queries.tpchQ8 _),
    "q_tpch_q13" -> (Ext14Queries.tpchQ13 _),
    "q_tpch_q15" -> (Ext14Queries.tpchQ15 _),
    "q_weighted_sample" -> (Ext13Queries.weightedSample _),
    "q_tpch_q19" -> (Ext14Queries.tpchQ19 _),
    "q_observe_metrics" -> (Ext13Queries.observeMetrics _),
    "q_temperature_mix" -> (Ext13Queries.temperatureMix _),
    "q_binary_source" -> (Ext14Queries.binarySource _),
    "q_incremental_agg" -> (Ext13Queries.incrementalAgg _),
    "q_ewma" -> (Ext15Queries.ewma _),
    "q_drawdown" -> (Ext15Queries.drawdown _),
    "q_markov_transitions" -> (Ext15Queries.markovTransitions _),
    "q_chi_square" -> (Ext15Queries.chiSquare _),
    "q_mann_whitney" -> (Ext15Queries.mannWhitney _),
    "q_benford" -> (Ext15Queries.benford _),
    "q_kmeans_step" -> (Ext15Queries.kmeansStep _),
    "q_rrf_fusion" -> (Ext15Queries.rrfFusion _),
    "q_bigram_lm" -> (Ext15Queries.bigramLm _),
    "q_lorenz_share" -> (Ext15Queries.lorenzShare _),
    "q_assoc_rules" -> (Ext16Queries.assocRules _),
    "q_item_similarity" -> (Ext16Queries.itemSimilarity _),
    "q_candle_patterns" -> (Ext16Queries.candlePatterns _),
    "q_twap" -> (Ext16Queries.twap _),
    "q_gini" -> (Ext16Queries.gini _),
    "q_km_survival" -> (Ext16Queries.kmSurvival _),
    "q_autocorr" -> (Ext16Queries.autocorr _),
    "q_attribution" -> (Ext17Queries.attribution _),
    "q_cusum_changepoint" -> (Ext17Queries.cusumChangepoint _),
    "q_theil_sen" -> (Ext17Queries.theilSen _),
    "q_feature_hash" -> (Ext17Queries.featureHash _),
    "q_holt_smoothing" -> (Ext17Queries.holtSmoothing _),
    "q_rfm" -> (Ext18Queries.rfm _),
    "q_lpa_communities" -> (Ext18Queries.lpaCommunities _),
    "q_forecast_backtest" -> (Ext18Queries.forecastBacktest _),
    "q_rolling_beta" -> (Ext18Queries.rollingBeta _),
    "q_stochastic" -> (Ext19Queries.stochastic _),
    "q_atr" -> (Ext19Queries.atr _),
    "q_donchian" -> (Ext19Queries.donchian _),
    "q_obv" -> (Ext19Queries.obv _),
    "q_williams_r" -> (Ext19Queries.williamsR _),
    "q_mfi" -> (Ext19Queries.mfi _),
    "q_pivot_points" -> (Ext19Queries.pivotPoints _),
    "q_cci" -> (Ext19Queries.cci _),
    "q_macd" -> (Ext19Queries.macd _),
    "q_heikin_ashi" -> (Ext19Queries.heikinAshi _),
    "q_vortex" -> (Ext31Queries.vortex _),
    "q_ichimoku" -> (Ext31Queries.ichimoku _),
    "q_cmf" -> (Ext31Queries.cmf _),
    "q_ulcer_index" -> (Ext31Queries.ulcer _),
    "q_cmo" -> (Ext31Queries.cmo _),
    "q_keltner" -> (Ext31Queries.keltner _),
    "q_aroon" -> (Ext31Queries.aroon _),
    "q_trix" -> (Ext31Queries.trix _),
    "q_cluster_canonical" -> (Ext32Queries.clusterCanonical _),
    "q_containment" -> (Ext32Queries.containment _),
    "q_containment_prefix" -> (Ext32Queries.containmentPrefix _),
    "q_boilerplate" -> (Ext32Queries.boilerplate _),
    "q_lexical_diversity" -> (Ext32Queries.lexicalDiversity _),
    "q_woe_iv" -> (Ext32Queries.woeIv _),
    "q_clustering_coeff" -> (Ext32Queries.clusteringCoeff _),
    "q_kn_bigram" -> (Ext33Queries.knBigram _),
    "q_graph_jaccard" -> (Ext33Queries.graphJaccard _),
    "q_curation_funnel" -> (Ext33Queries.curationFunnel _),
    "q_split_leakage" -> (Ext34Queries.splitLeakage _),
    "q_dp_count" -> (Ext34Queries.dpCount _),
    "q_bootstrap_ci" -> (Ext34Queries.bootstrapCi _),
    "q_sax_word" -> (Ext35Queries.saxWord _),
    "q_quantile_normalize" -> (Ext35Queries.quantileNormalize _),
    "q_ngram_coverage" -> (Ext36Queries.ngramCoverage _),
    "q_weighted_jaccard" -> (Ext36Queries.weightedJaccard _),
    "q_graph_reachability" -> (Ext37Queries.graphReachability _),
    "q_percentile_disc" -> (Ext37Queries.percentileDisc _),
    "q_tws_sessions" -> (Ext37Queries.twsSessions _),
    "q_stream_outer_join" -> (Ext37Queries.streamOuterJoin _),
    "q_adamic_adar" -> (Ext20Queries.adamicAdar _),
    "q_khop_reach" -> (Ext20Queries.khopReach _),
    "q_degree_dist" -> (Ext20Queries.degreeDist _),
    "q_perplexity_filter" -> (Ext20Queries.perplexityFilter _),
    "q_target_encode" -> (Ext20Queries.targetEncode _),
    "q_mi_features" -> (Ext20Queries.miFeatures _),
    "q_bot_detection" -> (Ext20Queries.botDetection _),
    "q_power_iteration" -> (Ext20Queries.powerIteration _),
    "q_auc_roc" -> (Ext21Queries.aucRoc _),
    "q_calibration_bins" -> (Ext21Queries.calibrationBins _),
    "q_lift_curve" -> (Ext21Queries.liftCurve _),
    "q_kalman_1d" -> (Ext21Queries.kalman1d _),
    "q_two_core" -> (Ext21Queries.twoCore _),
    "q_entity_blocking" -> (Ext21Queries.entityBlocking _),
    "q_streaks" -> (Ext22Queries.streaks _),
    "q_seasonality" -> (Ext22Queries.seasonality _),
    "q_silhouette" -> (Ext22Queries.silhouette _),
    "q_js_divergence" -> (Ext22Queries.jsDivergence _),
    "q_portfolio_var" -> (Ext22Queries.portfolioVar _),
    "q_jarque_bera" -> (Ext22Queries.jarqueBera _),
    "q_sharpe_sortino" -> (Ext23Queries.sharpeSortino _),
    "q_updown_capture" -> (Ext23Queries.upDownCapture _),
    "q_drawdown_duration" -> (Ext23Queries.drawdownDuration _),
    "q_hurst" -> (Ext23Queries.hurst _),
    "q_information_ratio" -> (Ext23Queries.informationRatio _),
    "q_var_es" -> (Ext23Queries.varEs _),
    "q_topk_agg" -> (Ext24Queries.topkAgg _),
    "q_tpch_q4" -> (Ext9Queries.tpchQ4 _),
    "q_tpch_q12" -> (Ext9Queries.tpchQ12 _),
    "q_tpch_q22" -> (Ext9Queries.tpchQ22 _),
    "q_tpch_q2" -> (Ext25Queries.tpchQ2 _),
    "q_tpch_q9" -> (Ext25Queries.tpchQ9 _),
    "q_tpch_q11" -> (Ext25Queries.tpchQ11 _),
    "q_tpch_q16" -> (Ext25Queries.tpchQ16 _),
    "q_tpch_q20" -> (Ext25Queries.tpchQ20 _),
    "q_bm25" -> (Ext26Queries.bm25 _),
    "q_ecdf" -> (Ext26Queries.ecdf _),
    "q_cv_folds" -> (Ext26Queries.cvFolds _),
    "q_group_split" -> (Ext26Queries.groupSplit _),
    "q_calmar_omega" -> (Ext23Queries.calmarOmega _),
    "q_pairs_spread" -> (Ext23Queries.pairsSpread _),
    "q_turnover" -> (Ext23Queries.turnover _),
    "q_jensen_alpha" -> (Ext23Queries.jensenAlpha _),
    "q_zipf_fit" -> (Ext27Queries.zipfFit _),
    "q_pmi_collocations" -> (Ext27Queries.pmiCollocations _),
    "q_fk_discovery" -> (Ext27Queries.fkDiscovery _),
    "q_anomaly_resid" -> (Ext27Queries.anomalyResid _),
    "q_knn_classify" -> (Ext28Queries.knnClassify _),
    "q_stickiness" -> (Ext28Queries.stickiness _),
    "q_dbscan_core" -> (Ext28Queries.dbscanCore _),
    "q_retrieval_eval" -> (Ext29Queries.retrievalEval _),
    "q_churn_features" -> (Ext29Queries.churnFeatures _),
    "q_jaro_winkler" -> (Ext29Queries.jaroWinklerPairs _),
    "q_weighted_percentile" -> (Ext30Queries.weightedPercentile _),
    "q_interval_coverage" -> (Ext30Queries.intervalCoverage _)
  )

  /** The shared oracle for both the union-rewrite (q_asof_join) and the
    * native-exec (q_asof_native) formulations. LATERAL with an explicit
    * (ts_us DESC, event_id DESC) tiebreak — the same shape the forward
    * oracle always had — instead of DuckDB's built-in ASOF JOIN, which
    * picks an ARBITRARY row among same-(key, ts) ties (round-13 fix): the
    * engine pins ties to the greatest event_id, so the built-in form could
    * flake the gate on any fixture with duplicate per-user timestamps.
    */
  private val asofOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events
      |), l AS (SELECT * FROM e WHERE event_type = 'click'),
      |   r AS (SELECT * FROM e WHERE event_type = 'purchase')
      |SELECT l.user_id, l.event_id, l.ts_us,
      |  prv.value AS asof_value, prv.event_id AS asof_event_id
      |FROM l LEFT JOIN LATERAL (
      |  SELECT r.value, r.event_id FROM r
      |  WHERE r.user_id = l.user_id AND r.ts_us <= l.ts_us
      |  ORDER BY r.ts_us DESC, r.event_id DESC LIMIT 1
      |) prv ON TRUE""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_window_sma" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  ROUND(AVG(value) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 6) AS sma
        |FROM events""".stripMargin,

    "q_window_rsi" ->
      """WITH diffs AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS diff
        |  FROM events
        |), gl AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
        |    CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
        |  FROM diffs
        |), a AS (
        |  SELECT user_id, event_id, ts_us,
        |    AVG(gain) OVER w AS avg_gain,
        |    AVG(loss) OVER w AS avg_loss
        |  FROM gl
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, event_id, ts_us,
        |  ROUND(100.0 - 100.0 / (1.0 + avg_gain / NULLIF(avg_loss, 0.0)), 6) AS rsi
        |FROM a""".stripMargin,

    "q_window_bollinger" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  ROUND(AVG(value) OVER w + 2 * STDDEV_SAMP(value) OVER w, 6) AS bb_up,
        |  ROUND(AVG(value) OVER w - 2 * STDDEV_SAMP(value) OVER w, 6) AS bb_down
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_indicator_union" ->
      """WITH diffs AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    value - lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS diff
        |  FROM events
        |), gl AS (
        |  SELECT *,
        |    CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
        |    CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
        |  FROM diffs
        |), wide AS (
        |  SELECT user_id, event_id, ts_us,
        |    AVG(value) OVER w AS sma,
        |    100.0 - 100.0 / (1.0 + (AVG(gain) OVER w) / NULLIF(AVG(loss) OVER w, 0.0)) AS rsi,
        |    AVG(value) OVER w + 2 * STDDEV_SAMP(value) OVER w AS bb_up,
        |    AVG(value) OVER w - 2 * STDDEV_SAMP(value) OVER w AS bb_down
        |  FROM gl
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), long AS (
        |  SELECT user_id, event_id, ts_us, 'SMA' AS type_name, sma AS value FROM wide
        |  UNION ALL
        |  SELECT user_id, event_id, ts_us, 'RSI', rsi FROM wide
        |  UNION ALL
        |  SELECT user_id, event_id, ts_us, 'BB_UP', bb_up FROM wide
        |  UNION ALL
        |  SELECT user_id, event_id, ts_us, 'BB_DOWN', bb_down FROM wide
        |), dim AS (
        |  SELECT * FROM (VALUES (1,'SMA'),(2,'RSI'),(3,'BB_UP'),(4,'BB_DOWN')) AS t(type_id, type_name)
        |)
        |SELECT l.user_id, l.event_id, l.ts_us, d.type_id, ROUND(l.value, 6) AS value
        |FROM long l JOIN dim d ON l.type_name = d.type_name
        |WHERE l.value IS NOT NULL""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,

    "q_dim_join_agg" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_get_or_create_dim" ->
      """WITH dim0(source_id, source) AS
        |  (VALUES (CAST(1 AS BIGINT),'src0'),(2,'src1'),(3,'src2')),
        |fresh AS (
        |  SELECT DISTINCT source FROM documents
        |  WHERE source NOT IN (SELECT source FROM dim0)
        |)
        |SELECT source_id, source FROM dim0
        |UNION ALL
        |SELECT CAST(3 + row_number() OVER (ORDER BY source) AS BIGINT) AS source_id, source
        |FROM fresh""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) <= 3""".stripMargin,

    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus, 'hi' AS bucket FROM orders WHERE o_totalprice > 100000
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, 'lo' AS bucket FROM orders WHERE o_totalprice <= 100000
        |)
        |SELECT o_orderstatus, bucket, COUNT(*) AS n FROM u GROUP BY o_orderstatus, bucket""".stripMargin,

    "q_epoch_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, epoch_us(ts) // 1000000 AS ts_sec
        |FROM events""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_regex_filter" ->
      """SELECT lang, COUNT(*) AS n_docs FROM documents
        |WHERE regexp_matches(text, 'window\s+table')
        |GROUP BY lang""".stripMargin,

    "q_coalesce_default" ->
      """SELECT event_id,
        |  COALESCE(NULLIF(event_type, 'error'), 'unknown') AS etype
        |FROM events""".stripMargin,

    "q_parse_prices" -> graft.queries.WireQueries.parsePricesOracle,
    "q_parse_news" -> graft.queries.WireQueries.parseNewsOracle,
    "q_rfc822_parse" -> graft.queries.WireQueries.rfc822Oracle,
    "q_decimal_cast" -> graft.queries.WireQueries.decimalCastOracle,
    "q_exact_dedup" -> graft.queries.WireQueries.exactDedupOracle,
    "q_stream_tumbling" -> graft.queries.StreamQueries.streamTumblingOracle,
    "q_state_inspect" -> graft.queries.StreamQueries.stateInspectOracle,
    "q_session_window" -> graft.queries.StreamQueries.sessionWindowOracle,
    "q_sliding_window" -> graft.queries.StreamQueries.slidingWindowOracle,
    "q_token_stats" -> LlmQueries.tokenStatsOracle,
    "q_quality_score" -> LlmQueries.qualityScoreOracle,
    "q_lang_id" -> LlmQueries.langIdOracle,
    "q_fingerprint" -> LlmQueries.fingerprintOracle,
    "q_ngram_jaccard" -> LlmQueries.ngramJaccardOracle,
    "q_dedup_clusters" -> LlmQueries.dedupClustersOracle,
    "q_top_terms" -> LlmQueries.topTermsOracle,
    "q_minhash_neardup" -> LlmQueries.ngramJaccardOracle,
    "q_embed_neardup" -> LlmQueries.embedNearDupOracle,
    "q_cosine_topk" -> LlmQueries.cosineTopKOracle,
    "q_ann_ivf" -> LlmQueries.annIvfOracle,
    "q_multimodal_meta" -> LlmQueries.multimodalMetaOracle,
    "q_rss_parse" -> graft.queries.RssQueries.rssParseOracle,
    "q_scrape_sentiment" -> graft.queries.RssQueries.scrapeSentimentOracle,
    "q_pipeline_e2e" -> graft.queries.PipelineE2E.oracle,
    "q_stateful_indicators" -> StreamQueries.statefulIndicatorsOracle,

    "q_asof_join" -> asofOracle,
    // the native-exec formulation answers to the SAME oracle
    "q_asof_native" -> asofOracle,

    "q_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT user_id AS window_user, MIN(epoch_us(ts)) AS start_us
        |  FROM events WHERE user_id < 20 GROUP BY 1
        |)
        |SELECT window_user, COUNT(*) AS n_events
        |FROM events e JOIN iv
        |  ON epoch_us(e.ts) >= iv.start_us
        | AND epoch_us(e.ts) < iv.start_us + 7200000000
        |GROUP BY window_user""".stripMargin,

    "q_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
        |INTERSECT
        |SELECT c_nationkey FROM customer
        |EXCEPT
        |SELECT c_nationkey FROM customer WHERE c_acctbal < -900""".stripMargin,

    "q_vector_stats" ->
      """SELECT vec_id,
        |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum,
        |  ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "q_simhash_neardup" -> LlmQueries.simhashNearDupOracle,
    "q_simhash_fast" -> LlmQueries.simhashFastOracle,
    "q_sentiment" -> LlmQueries.sentimentOracle,

    "q_cube" -> ExtQueries.cubeOracle,
    "q_window_rank" -> ExtQueries.windowRankOracle,
    "q_range_frame" -> ExtQueries.rangeFrameOracle,
    "q_date_arith" -> ExtQueries.dateArithOracle,
    "q_fuzzy_match" -> ExtQueries.fuzzyMatchOracle,
    "q_heavy_hitters" -> ExtQueries.heavyHittersOracle,
    "q_approx_distinct" -> ExtQueries.approxDistinctOracle,
    "q_asof_forward" -> ExtQueries.asofForwardOracle,
    "q_salted_agg" -> ExtQueries.saltedAggOracle,
    "q_stream_dedup" -> ExtQueries.streamDedupOracle,
    "q_unpivot" -> ExtQueries.unpivotOracle,
    "q_source_v2" -> ExtQueries.sourceV2Oracle,

    "q_tfidf" -> Ext2Queries.tfidfOracle,
    "q_salted_join" -> Ext2Queries.saltedJoinOracle,
    "q_full_outer" -> Ext2Queries.fullOuterOracle,
    "q_semi_join" -> Ext2Queries.semiJoinOracle,
    "q_approx_quantile" -> Ext2Queries.approxQuantileOracle,
    "q_window_positional" -> Ext2Queries.windowPositionalOracle,
    "q_stream_join" -> Ext2Queries.streamJoinOracle,
    "q_udtf_tokenize" -> Ext2Queries.udtfTokenizeOracle,
    "q_lsh_ann" -> Ext2Queries.lshAnnOracle,
    "q_frame_sample" -> Ext2Queries.frameSampleOracle,
    "q_correlated_sub" -> Ext2Queries.correlatedSubOracle,
    "q_exists_sub" -> Ext2Queries.existsSubOracle,
    "q_resize_plan" -> Ext2Queries.resizePlanOracle,
    "q_grouping_sets" -> Ext3Queries.groupingSetsOracle,
    "q_agg_filter" -> Ext3Queries.aggFilterOracle,
    "q_array_funcs" -> Ext3Queries.arrayFuncsOracle,
    "q_string_funcs" -> Ext3Queries.stringFuncsOracle,
    "q_null_semantics" -> Ext3Queries.nullSemanticsOracle,
    "q_regex_extract_all" -> Ext3Queries.regexExtractAllOracle,
    "q_bucketed_join" -> Ext3Queries.bucketedJoinOracle,
    "q_window_ntile" -> Ext4Queries.windowNtileOracle,
    "q_min_max_by" -> Ext4Queries.minMaxByOracle,
    "q_hash_sample" -> Ext4Queries.hashSampleOracle,
    "q_scd2" -> Ext4Queries.scd2Oracle,
    "q_merge_upsert" -> Ext4Queries.mergeUpsertOracle,
    "q_histogram" -> Ext4Queries.histogramOracle,
    "q_map_funcs" -> Ext4Queries.mapFuncsOracle,
    "q_bpe_tokenize" -> Ext4Queries.bpeTokenizeOracle,
    "q_zorder" -> Ext5Queries.zorderClusterOracle,
    "q_binned_range_join" -> Ext5Queries.binnedRangeJoinOracle,
    "q_sketch_merge" -> Ext5Queries.sketchMergeOracle,
    "q_audio_chunks" -> Ext5Queries.audioChunksOracle,
    "q_json_struct" -> Ext5Queries.jsonStructOracle,
    "q_char_entropy" -> Ext5Queries.charEntropyOracle,
    "q_tws_totals" -> Ext5Queries.twsTotalsOracle,
    "q_forward_fill" -> Ext5Queries.forwardFillOracle,
    "q_calendar_spine" -> Ext5Queries.calendarSpineOracle,
    "q_stream_session" -> Ext5Queries.streamSessionOracle,
    "q_order_limit" -> Ext5Queries.orderLimitOracle,
    "q_set_ops_all" -> Ext5Queries.setOpsAllOracle,
    "q_regr_stats" -> Ext6Queries.regrStatsOracle,
    "q_bitwise_agg" -> Ext6Queries.bitwiseAggOracle,
    "q_listagg" -> Ext6Queries.listAggOracle,
    "q_safe_arith" -> Ext6Queries.safeArithOracle,
    "q_partitioned_scan" -> Ext6Queries.partitionedScanOracle,
    "q_latest_snapshot" -> Ext6Queries.latestSnapshotOracle,
    "q_recursive_cte" -> Ext6Queries.recursiveCteOracle,
    "q_lateral_join" -> Ext6Queries.lateralJoinOracle,
    "q_variant_json" -> Ext6Queries.variantJsonOracle,
    "q_pii_redact" -> Ext7Queries.piiRedactOracle,
    "q_url_domains" -> Ext7Queries.urlDomainsOracle,
    "q_dup_spans" -> Ext7Queries.dupSpansOracle,
    "q_embed_quantize" -> Ext7Queries.embedQuantizeOracle,
    "q_stream_static" -> Ext7Queries.streamStaticOracle,
    "q_decontaminate" -> Ext7Queries.decontaminateOracle,
    "q_stratified_sample" -> Ext7Queries.stratifiedSampleOracle,
    "q_csv_roundtrip" -> Ext7Queries.csvRoundtripOracle,
    "q_json_roundtrip" -> Ext7Queries.jsonRoundtripOracle,
    "q_from_xml" -> Ext8Queries.fromXmlOracle,
    "q_xml_source" -> Ext8Queries.xmlSourceOracle,
    "q_crosstab" -> Ext8Queries.crosstabOracle,
    "q_approx_top_k" -> Ext8Queries.approxTopKOracle,
    "q_user_growth" -> Ext8Queries.userGrowthOracle,
    "q_catalog_table" -> Ext8Queries.catalogTableOracle,
    "q_udf_registered" -> Ext8Queries.udfRegisteredOracle,
    "q_jdbc_roundtrip" -> Ext8Queries.jdbcRoundtripOracle,
    "q_orc_roundtrip" -> Ext8Queries.orcRoundtripOracle,
    "q_corrupt_records" -> Ext8Queries.corruptRecordsOracle,
    "q_moments" -> Ext8Queries.momentsOracle,
    "q_central_tendency" -> Ext8Queries.centralTendencyOracle,
    "q_pagerank" -> Ext8Queries.pagerankOracle,
    "q_tpch_q3" -> Ext9Queries.tpchQ3Oracle,
    "q_tpch_q5" -> Ext9Queries.tpchQ5Oracle,
    "q_tpch_q10" -> Ext9Queries.tpchQ10Oracle,
    "q_tpch_q18" -> Ext9Queries.tpchQ18Oracle,
    "q_tpch_q21" -> Ext9Queries.tpchQ21Oracle,
    "q_funnel" -> Ext9Queries.funnelOracle,
    "q_event_sequence" -> Ext9Queries.eventSequenceOracle,
    "q_cohort_retention" -> Ext9Queries.cohortRetentionOracle,
    "q_rolling_distinct" -> Ext9Queries.rollingDistinctOracle,
    "q_gap_fill" -> Ext9Queries.gapFillOracle,
    "q_null_safe_join" -> Ext9Queries.nullSafeJoinOracle,
    "q_corr_matrix" -> Ext9Queries.corrMatrixOracle,
    "q_repetition_filter" -> Ext9Queries.repetitionFilterOracle,
    "q_ann_rerank" -> Ext9Queries.annRerankOracle,
    "q_ohlc_resample" -> Ext10Queries.ohlcResampleOracle,
    "q_vwap" -> Ext10Queries.vwapOracle,
    // same contract as the exact join — the prefix filter must be lossless
    "q_jaccard_prefix" -> LlmQueries.ngramJaccardOracle,
    "q_rolling_hll" -> Ext10Queries.rollingHllOracle,
    "q_unigram_lm" -> Ext11Queries.unigramLmOracle,
    "q_doc_chunks" -> Ext11Queries.docChunksOracle,
    "q_normalize_dedup" -> Ext11Queries.normalizeDedupOracle,
    "q_bloom_clean" -> Ext11Queries.bloomCleanOracle,
    "q_pack_sequences" -> Ext11Queries.packSequencesOracle,
    "q_tpch_q17" -> Ext9Queries.tpchQ17Oracle,
    "q_doc_pipeline" -> Ext11Queries.docPipelineOracle,
    "q_hard_negatives" -> LlmQueries.hardNegativesOracle,
    "q_class_centroids" -> LlmQueries.classCentroidsOracle,
    "q_source_balance" -> Ext11Queries.sourceBalanceOracle,
    "q_schema_evolution" -> Ext11Queries.schemaEvolutionOracle,
    "q_semdedup" -> Ext12Queries.semDedupOracle,
    "q_kanonymity" -> Ext12Queries.kAnonymityOracle,
    "q_curriculum" -> Ext12Queries.curriculumOracle,
    "q_winsorize" -> Ext12Queries.winsorizeOracle,
    "q_mad_outliers" -> Ext12Queries.madOutliersOracle,
    "q_tpch_q6" -> Ext12Queries.tpchQ6Oracle,
    "q_tpch_q14" -> Ext12Queries.tpchQ14Oracle,
    "q_triangle_count" -> Ext12Queries.triangleCountOracle,
    "q_class_weights" -> Ext12Queries.classWeightsOracle,
    "q_interleave_shards" -> Ext12Queries.interleaveShardsOracle,
    "q_freshness_decay" -> Ext12Queries.freshnessDecayOracle,
    "q_tokenizer_fertility" -> Ext12Queries.tokenizerFertilityOracle,
    "q_vocab_growth" -> Ext12Queries.vocabGrowthOracle,
    "q_matryoshka" -> Ext12Queries.matryoshkaRecallOracle,
    "q_compaction_plan" -> Ext12Queries.compactionPlanOracle,
    "q_abtest_welch" -> Ext13Queries.abtestWelchOracle,
    "q_psi_drift" -> Ext13Queries.psiDriftOracle,
    "q_data_quality" -> Ext13Queries.dataQualityOracle,
    "q_skyline" -> Ext13Queries.skylineOracle,
    "q_ks_stat" -> Ext13Queries.ksStatOracle,
    "q_tpch_q1" -> Ext14Queries.tpchQ1Oracle,
    "q_tpch_q7" -> Ext14Queries.tpchQ7Oracle,
    "q_tpch_q8" -> Ext14Queries.tpchQ8Oracle,
    "q_tpch_q13" -> Ext14Queries.tpchQ13Oracle,
    "q_tpch_q15" -> Ext14Queries.tpchQ15Oracle,
    "q_weighted_sample" -> Ext13Queries.weightedSampleOracle,
    "q_tpch_q19" -> Ext14Queries.tpchQ19Oracle,
    "q_observe_metrics" -> Ext13Queries.observeMetricsOracle,
    "q_temperature_mix" -> Ext13Queries.temperatureMixOracle,
    "q_binary_source" -> Ext14Queries.binarySourceOracle,
    "q_incremental_agg" -> Ext13Queries.incrementalAggOracle,
    "q_ewma" -> Ext15Queries.ewmaOracle,
    "q_drawdown" -> Ext15Queries.drawdownOracle,
    "q_markov_transitions" -> Ext15Queries.markovTransitionsOracle,
    "q_chi_square" -> Ext15Queries.chiSquareOracle,
    "q_mann_whitney" -> Ext15Queries.mannWhitneyOracle,
    "q_benford" -> Ext15Queries.benfordOracle,
    "q_kmeans_step" -> Ext15Queries.kmeansStepOracle,
    "q_rrf_fusion" -> Ext15Queries.rrfFusionOracle,
    "q_bigram_lm" -> Ext15Queries.bigramLmOracle,
    "q_lorenz_share" -> Ext15Queries.lorenzShareOracle,
    "q_assoc_rules" -> Ext16Queries.assocRulesOracle,
    "q_item_similarity" -> Ext16Queries.itemSimilarityOracle,
    "q_candle_patterns" -> Ext16Queries.candlePatternsOracle,
    "q_twap" -> Ext16Queries.twapOracle,
    "q_gini" -> Ext16Queries.giniOracle,
    "q_km_survival" -> Ext16Queries.kmSurvivalOracle,
    "q_autocorr" -> Ext16Queries.autocorrOracle,
    "q_attribution" -> Ext17Queries.attributionOracle,
    "q_cusum_changepoint" -> Ext17Queries.cusumChangepointOracle,
    "q_theil_sen" -> Ext17Queries.theilSenOracle,
    "q_feature_hash" -> Ext17Queries.featureHashOracle,
    "q_holt_smoothing" -> Ext17Queries.holtSmoothingOracle,
    "q_rfm" -> Ext18Queries.rfmOracle,
    "q_lpa_communities" -> Ext18Queries.lpaCommunitiesOracle,
    "q_forecast_backtest" -> Ext18Queries.forecastBacktestOracle,
    "q_rolling_beta" -> Ext18Queries.rollingBetaOracle,
    "q_stochastic" -> Ext19Queries.stochasticOracle,
    "q_atr" -> Ext19Queries.atrOracle,
    "q_donchian" -> Ext19Queries.donchianOracle,
    "q_obv" -> Ext19Queries.obvOracle,
    "q_williams_r" -> Ext19Queries.williamsROracle,
    "q_mfi" -> Ext19Queries.mfiOracle,
    "q_pivot_points" -> Ext19Queries.pivotPointsOracle,
    "q_cci" -> Ext19Queries.cciOracle,
    "q_macd" -> Ext19Queries.macdOracle,
    "q_heikin_ashi" -> Ext19Queries.heikinAshiOracle,
    "q_vortex" -> Ext31Queries.vortexOracle,
    "q_ichimoku" -> Ext31Queries.ichimokuOracle,
    "q_cmf" -> Ext31Queries.cmfOracle,
    "q_ulcer_index" -> Ext31Queries.ulcerOracle,
    "q_cmo" -> Ext31Queries.cmoOracle,
    "q_keltner" -> Ext31Queries.keltnerOracle,
    "q_aroon" -> Ext31Queries.aroonOracle,
    "q_trix" -> Ext31Queries.trixOracle,
    "q_cluster_canonical" -> Ext32Queries.clusterCanonicalOracle,
    "q_containment" -> Ext32Queries.containmentOracle,
    "q_containment_prefix" -> Ext32Queries.containmentPrefixOracle,
    "q_boilerplate" -> Ext32Queries.boilerplateOracle,
    "q_lexical_diversity" -> Ext32Queries.lexicalDiversityOracle,
    "q_woe_iv" -> Ext32Queries.woeIvOracle,
    "q_clustering_coeff" -> Ext32Queries.clusteringCoeffOracle,
    "q_kn_bigram" -> Ext33Queries.knBigramOracle,
    "q_graph_jaccard" -> Ext33Queries.graphJaccardOracle,
    "q_curation_funnel" -> Ext33Queries.curationFunnelOracle,
    "q_split_leakage" -> Ext34Queries.splitLeakageOracle,
    "q_dp_count" -> Ext34Queries.dpCountOracle,
    "q_bootstrap_ci" -> Ext34Queries.bootstrapCiOracle,
    "q_sax_word" -> Ext35Queries.saxWordOracle,
    "q_quantile_normalize" -> Ext35Queries.quantileNormalizeOracle,
    "q_ngram_coverage" -> Ext36Queries.ngramCoverageOracle,
    "q_weighted_jaccard" -> Ext36Queries.weightedJaccardOracle,
    "q_graph_reachability" -> Ext37Queries.graphReachabilityOracle,
    "q_percentile_disc" -> Ext37Queries.percentileDiscOracle,
    "q_tws_sessions" -> Ext37Queries.twsSessionsOracle,
    "q_stream_outer_join" -> Ext37Queries.streamOuterJoinOracle,
    "q_adamic_adar" -> Ext20Queries.adamicAdarOracle,
    "q_khop_reach" -> Ext20Queries.khopReachOracle,
    "q_degree_dist" -> Ext20Queries.degreeDistOracle,
    "q_perplexity_filter" -> Ext20Queries.perplexityFilterOracle,
    "q_target_encode" -> Ext20Queries.targetEncodeOracle,
    "q_mi_features" -> Ext20Queries.miFeaturesOracle,
    "q_bot_detection" -> Ext20Queries.botDetectionOracle,
    "q_power_iteration" -> Ext20Queries.powerIterationOracle,
    "q_auc_roc" -> Ext21Queries.aucRocOracle,
    "q_calibration_bins" -> Ext21Queries.calibrationBinsOracle,
    "q_lift_curve" -> Ext21Queries.liftCurveOracle,
    "q_kalman_1d" -> Ext21Queries.kalman1dOracle,
    "q_two_core" -> Ext21Queries.twoCoreOracle,
    "q_entity_blocking" -> Ext21Queries.entityBlockingOracle,
    "q_streaks" -> Ext22Queries.streaksOracle,
    "q_seasonality" -> Ext22Queries.seasonalityOracle,
    "q_silhouette" -> Ext22Queries.silhouetteOracle,
    "q_js_divergence" -> Ext22Queries.jsDivergenceOracle,
    "q_portfolio_var" -> Ext22Queries.portfolioVarOracle,
    "q_jarque_bera" -> Ext22Queries.jarqueBeraOracle,
    "q_sharpe_sortino" -> Ext23Queries.sharpeSortinoOracle,
    "q_updown_capture" -> Ext23Queries.upDownCaptureOracle,
    "q_drawdown_duration" -> Ext23Queries.drawdownDurationOracle,
    "q_hurst" -> Ext23Queries.hurstOracle,
    "q_information_ratio" -> Ext23Queries.informationRatioOracle,
    "q_var_es" -> Ext23Queries.varEsOracle,
    "q_topk_agg" -> Ext24Queries.topkAggOracle,
    "q_tpch_q4" -> Ext9Queries.tpchQ4Oracle,
    "q_tpch_q12" -> Ext9Queries.tpchQ12Oracle,
    "q_tpch_q22" -> Ext9Queries.tpchQ22Oracle,
    "q_tpch_q2" -> Ext25Queries.tpchQ2Oracle,
    "q_tpch_q9" -> Ext25Queries.tpchQ9Oracle,
    "q_tpch_q11" -> Ext25Queries.tpchQ11Oracle,
    "q_tpch_q16" -> Ext25Queries.tpchQ16Oracle,
    "q_tpch_q20" -> Ext25Queries.tpchQ20Oracle,
    "q_bm25" -> Ext26Queries.bm25Oracle,
    "q_ecdf" -> Ext26Queries.ecdfOracle,
    "q_cv_folds" -> Ext26Queries.cvFoldsOracle,
    "q_group_split" -> Ext26Queries.groupSplitOracle,
    "q_calmar_omega" -> Ext23Queries.calmarOmegaOracle,
    "q_pairs_spread" -> Ext23Queries.pairsSpreadOracle,
    "q_turnover" -> Ext23Queries.turnoverOracle,
    "q_jensen_alpha" -> Ext23Queries.jensenAlphaOracle,
    "q_zipf_fit" -> Ext27Queries.zipfFitOracle,
    "q_pmi_collocations" -> Ext27Queries.pmiCollocationsOracle,
    "q_fk_discovery" -> Ext27Queries.fkDiscoveryOracle,
    "q_anomaly_resid" -> Ext27Queries.anomalyResidOracle,
    "q_knn_classify" -> Ext28Queries.knnClassifyOracle,
    "q_stickiness" -> Ext28Queries.stickinessOracle,
    "q_dbscan_core" -> Ext28Queries.dbscanCoreOracle,
    "q_retrieval_eval" -> Ext29Queries.retrievalEvalOracle,
    "q_churn_features" -> Ext29Queries.churnFeaturesOracle,
    "q_jaro_winkler" -> Ext29Queries.jaroWinklerPairsOracle,
    "q_weighted_percentile" -> Ext30Queries.weightedPercentileOracle,
    "q_interval_coverage" -> Ext30Queries.intervalCoverageOracle
  )
}
