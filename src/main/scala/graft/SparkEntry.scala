package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator surface (one entry per SURVEY.md §2
  * operator family + training-data extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  * Implementations live in [[Queries]]; SQL in [[Oracles]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.moodFlagship(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.pricingSummary _),
    "q02_filter_project" -> (Queries.filterProject _),
    "q03_join_revenue" -> (Queries.joinRevenue _),
    "q04_left_join_agg" -> (Queries.leftJoinAgg _),
    "q05_semi_anti_join" -> (Queries.semiAntiJoin _),
    "q06_distinct" -> (Queries.distinctCombos _),
    "q07_topk_window" -> (Queries.topkPerGroup _),
    "q08_union_agg" -> (Queries.unionEntities _),
    "q09_minute_agg" -> (Queries.minuteAgg _),
    "q10_bucketing" -> (Queries.bucketing _),
    "q11_validate" -> (Queries.validateEvents _),
    "q12_day_filter" -> (Queries.dayFilter _),
    "q13_mood_flagship" -> (Queries.moodFlagship _),
    "q14_daily_summary" -> (Queries.dailySummary _),
    "q15_classify_news" -> (Queries.classifyNews _),
    "q16_text_stats" -> (Queries.textStats _),
    "q17_lang_id" -> (Queries.langId _),
    "q18_dedup_exact" -> (Queries.dedupExact _),
    "q19_minhash_signatures" -> (Queries.minhashSignatures _),
    "q20_lsh_candidate_pairs" -> (Queries.lshCandidatePairs _),
    "q21_jaccard_pairs" -> (Queries.jaccardPairs _),
    "q22_simhash" -> (Queries.simhashFingerprints _),
    "q23_ann_brute_force" -> (Queries.annBruteForce _),
    "q24_embedding_near_dups" -> (Queries.embeddingNearDups _),
    "q25_multimodal_features" -> (Queries.multimodalFeatures _),
    "q26_streaming_minute_agg" -> (Queries.streamingMinuteAgg _),
    "q29_json_extract" -> (Queries.jsonExtract _),
    "q30_sliding_window" -> (Queries.slidingWindow _),
    "q31_sessionize" -> (Queries.sessionize _),
    "q32_distinct_users" -> (Queries.distinctUsers _),
    "q33_rollup_revenue" -> (Queries.rollupRevenue _),
    "q34_pivot_orders" -> (Queries.pivotOrders _),
    "q35_percentiles" -> (Queries.percentiles _),
    "q37_asof_join" -> (Queries.asofJoin _),
    "q38_ann_ivf" -> (Queries.annIvf _),
    "q47_ann_ivf_saved" -> (Queries.annIvfSaved _),
    "q48_doc_fingerprints" -> (Queries.docFingerprints _),
    "q49_hash_sample" -> (Queries.hashSampleEvents _),
    "q50_bpe_tokens" -> (Queries.bpeTokens _),
    "q51_source_mixture" -> (Queries.sourceMixture _),
    "q40_range_join" -> (Queries.rangeJoinSessions _),
    "q41_quality_filter" -> (Queries.qualityFilter _),
    "q42_quantize_embeddings" -> (Queries.quantizeEmbeddings _),
    "q43_cube_orders" -> (Queries.cubeOrders _),
    "q44_running_totals" -> (Queries.runningTotals _),
    "q45_set_ops" -> (Queries.setOpsCohorts _),
    "q46_pack_sequences" -> ((s: SparkSession, dir: String) => Queries.packSequences(s, dir)),
    // LSH ranking is not SQL-expressible (random hyperplanes), so the
    // dump is the in-query certification vs brute force (model: q39) —
    // oracle-checkable bounds instead of a rows-only pass
    "q27_ann_lsh" -> (Queries.annLshCertified _),
    // exact columns hash-checked vs DuckDB; the sketch estimate is
    // certified in-query (bound column) + bounded tightly in QueriesSpec
    "q39_sketch_profile" -> (Queries.sketchProfile _),
    // oracle-checked despite the non-SQL implementation path: q28 is
    // bit-equal to q25's declarative variant, q36 is md5-deterministic
    "q28_multimodal_kernel" -> (Queries.multimodalFeaturesKernel _),
    "q36_dedupe_corpus" -> (Queries.dedupeCorpus _),
    "q52_dup_clusters" -> (Queries.dupClusters _),
    "q53_decontaminate" -> (Queries.decontaminate _),
    "q54_pii_scrub" -> (Queries.piiScrub _),
    "q55_vocabulary" -> (Queries.vocabulary _),
    "q56_compact_layout" -> (Queries.compactLayout _),
    "q57_merge_upsert" -> (Queries.mergeUpsert _),
    "q58_profile_orders" -> (Queries.profileOrders _),
    "q59_salted_join" -> (Queries.saltedJoinQty _),
    "q60_salted_agg" -> (Queries.saltedAggValues _),
    "q61_cdc_apply" -> (Queries.cdcApply _),
    "q62_cdc_deletes" -> (Queries.cdcDeletes _),
    "q63_cdc_partitioned" -> (Queries.cdcPartitioned _),
    "q64_incremental_dedup" -> (Queries.incrementalDedup _),
    "q65_chunk_docs" -> (Queries.chunkDocs _),
    "q66_tfidf_topk" -> (Queries.tfidfTopK _),
    "q67_incremental_near_dedup" -> (Queries.incrementalNearDedup _),
    "q68_streaming_dedup" -> (Queries.streamingDedup _),
    "q69_repetition_signals" -> (Queries.repetitionSignals _),
    "q70_semantic_dedup" -> (Queries.semanticDedup _),
    "q71_zorder_key" -> (Queries.zorderEvents _),
    "q72_streaming_near_dedup" -> (Queries.streamingNearDedup _),
    "q73_incremental_agg" -> (Queries.incrementalAgg _),
    "q74_bloom_dedup" -> (Queries.bloomDedup _),
    "q75_ann_ivf_append" -> (Queries.annIvfAppend _),
    "q76_bloom_near_dedup" -> (Queries.bloomNearDedup _),
    "q77_incr_decontaminate" -> (Queries.incrementalDecontaminate _),
    "q78_phrase_search" -> (Queries.phraseSearch _),
    "q79_bm25_topk" -> (Queries.bm25TopK _),
    "q80_incr_bm25" -> (Queries.incrementalBm25 _),
    "q81_cdc_diff" -> (Queries.cdcDiff _),
    "q82_incr_profile" -> (Queries.incrementalProfile _),
    "q83_curation_funnel" -> (Queries.curationFunnel _),
    "q84_dup_spans" -> (Queries.dupSpans _),
    "q85_bpe_merge_stats" -> (Queries.bpeMergeStats _),
    "q86_kmeans_step" -> (Queries.kmeansStep _),
    "q87_quality_model" -> (Queries.qualityModel _),
    "q88_strip_spans" -> (Queries.stripSpans _),
    "q89_incr_dup_spans" -> (Queries.incrementalDupSpans _),
    "q90_bpe_train" -> (Queries.bpeTrain _),
    "q91_kmeans_train" -> (Queries.kmeansTrainGate _),
    "q92_incr_strip_spans" -> (Queries.incrementalStripSpans _),
    "q93_bpe_encode" -> (Queries.bpeEncode _),
    "q94_ann_quantized" -> (Queries.annQuantizedRescore _),
    "q95_quality_percentile" -> (Queries.qualityPercentileGate _),
    "q96_token_budget" -> (Queries.tokenBudgetMixture _),
    "q97_canonical_docs" -> (Queries.canonicalDocs _),
    "q98_heavy_hitters" -> (Queries.heavyHitters _),
    "q99_lm_coverage" -> (Queries.lmCoverage _),
    "q100_semantic_decon" -> (Queries.semanticDecon _),
    "q101_bm25_deletes" -> (Queries.bm25WithDeletes _),
    "q102_stream_token_budget" -> (Queries.streamingTokenBudget _),
    "q103_stratified_sample" -> (Queries.stratifiedSample _),
    "q104_curriculum_order" -> (Queries.curriculumOrder _),
    "q105_mixture_reweight" -> (Queries.mixtureReweight _),
    "q106_leakage_audit" -> (Queries.leakageAudit _),
    "q107_ann_ivf_deletes" -> (Queries.annIvfDeletes _),
    "q108_data_card" -> (Queries.dataCard _),
    "q109_hybrid_search" -> (Queries.hybridSearch _),
    "q110_simhash_near_dups" -> (Queries.simhashNearDupPairs _),
    "q111_rag_pipeline" -> (Queries.ragPipeline _),
    "q112_funnel" -> (Queries.funnel _),
    "q113_retention_cohorts" -> (Queries.retentionCohorts _),
    "q114_ab_stats" -> (Queries.abStats _),
    "q115_anomaly_flags" -> (Queries.anomalyFlags _),
    "q116_collocations" -> (Queries.collocations _),
    "q117_dup_histogram" -> (Queries.dupClusterHistogram _),
    "q118_pq_adc" -> (Queries.pqAdc _),
    "q119_ivf_pq" -> (Queries.ivfPqAdc _),
    "q120_weighted_sample" -> (Queries.weightedSample _),
    "q121_dup_pagerank" -> (Queries.dupPagerank _),
    "q122_mmr_rerank" -> (Queries.mmrRerankGate _),
    "q123_pq_trained" -> (Queries.pqAdcTrained _),
    "q124_allpairs_jaccard" -> (Queries.allPairsJaccardGate _),
    "q125_hard_negatives" -> (Queries.hardNegativesGate _),
    "q126_token_shards" -> (Queries.tokenShardsGate _),
    "q127_token_drift" -> (Queries.tokenDriftGate _),
    "q128_leakage_safe_split" -> (Queries.leakageSafeSplit _),
    "q129_cluster_store" -> (Queries.clusterStoreGate _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
