package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Etl, Multimodal, Quantize, Similarity, TextAnalysis}
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator has a `queries` entry; every
  * SQL-expressible one has a matching `oracleSql` entry with
  * identical output column names (the driver's compare sorts columns
  * by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 ETL core
    "etl_normalize"      -> (Etl.normalize(_, _)),
    "etl_normalize_tz"   -> ((s, d) => Etl.normalizeTz(s, d)),
    "etl_hourly_rollup"  -> (Etl.hourlyRollup(_, _)),
    "etl_keep_latest"    -> (Etl.keepLatest(_, _)),
    "etl_dq_report"      -> (Etl.dqReport(_, _)),
    "etl_dq_profile"     -> (Etl.dqProfile(_, _)),
    "etl_dq_drift"       -> (Etl.dqDrift(_, _)),
    "etl_backfill_gaps"  -> (Etl.backfillGaps(_, _)),
    "etl_schema_enforce" -> (Etl.schemaEnforce(_, _)),
    "etl_incremental_ds" -> ((s, d) => Etl.incrementalDs(s, d)),
    "etl_normalize_arrays" -> ((s, d) => Etl.normalizeArrays(Etl.arrayPayloads(s, d))),
    "sample_deterministic" -> ((s, d) => Etl.sampleDeterministic(s, d)),
    "sample_stratified"    -> ((s, d) => Etl.sampleStratified(s, d)),
    "sample_weighted"      -> ((s, d) => Etl.sampleWeighted(s, d)),
    "sample_cap_per_source" -> ((s, d) => Etl.sampleCapPerSource(s, d)),
    "sample_holdout_split" -> ((s, d) => Etl.sampleHoldoutSplit(s, d)),
    "sample_temperature"   -> ((s, d) => Etl.sampleTemperature(s, d)),
    "sample_mixture_epochs" -> ((s, d) => Etl.sampleMixtureEpochs(s, d)),
    "etl_surrogate_keys"   -> (graft.operators.Keys.etlSurrogateKeys(_, _)),
    "etl_scd2"             -> (Etl.scd2History(_, _)),
    "etl_cdc_apply"        -> (Etl.cdcApply(_, _)),
    "etl_cdc_scd2"         -> (Etl.cdcScd2(_, _)),
    "etl_scd2_enrich"      -> (Etl.scd2Enrich(_, _)),
    "etl_snapshot_diff"    -> (Etl.etlSnapshotDiff(_, _)),
    "etl_merge_into"       -> (Etl.etlMergeInto(_, _)),
    "sample_quality_topfrac" -> ((s, d) => Etl.sampleQualityTopFrac(s, d)),
    "sample_topfrac_continuous" -> ((s, d) => Etl.sampleQualityTopFracContinuous(s, d)),
    // §2.2 analytics
    "q1_pricing_summary"   -> (Analytics.q1PricingSummary(_, _)),
    "q3_shipping_priority" -> (Analytics.q3ShippingPriority(_, _)),
    "q5_local_supplier"    -> (Analytics.q5LocalSupplier(_, _)),
    "q_market_share"       -> (Analytics.qMarketShare(_, _)),
    "q_top_customers"      -> (Analytics.qTopCustomers(_, _)),
    "q_running_total"      -> (Analytics.qRunningTotal(_, _)),
    "q_rollup"             -> (Analytics.qRollup(_, _)),
    "q_semi_anti"          -> (Analytics.qSemiAnti(_, _)),
    "q_skew_topk"          -> (Analytics.qSkewTopk(_, _)),
    "q_events_sessionize"  -> (Analytics.qEventsSessionize(_, _)),
    "q_asof_join"          -> (graft.operators.AsOf.qAsOfJoin(_, _)),
    "q_range_join"         -> (graft.operators.RangeJoin.qRangeJoin(_, _)),
    "q_interval_join"      -> (graft.operators.RangeJoin.qIntervalJoin(_, _)),
    "q_pivot_events"       -> (Analytics.qPivotEvents(_, _)),
    "q_window_funnel"      -> (Analytics.qWindowFunnel(_, _)),
    "q_bloom_join"         -> ((s, d) => graft.operators.BloomJoin.qBloomJoin(s, d)),
    "q_retention_cohorts"  -> (Analytics.qRetentionCohorts(_, _)),
    "q_fuzzy_match"        -> (graft.operators.Fuzzy.qFuzzyMatch(_, _)),
    "q_fuzzy_edit1"        -> (graft.operators.Fuzzy.qFuzzyEdit1(_, _)),
    "q_skyline"            -> (graft.operators.Skyline.qSkyline(_, _)),
    "layout_zorder"        -> (graft.operators.Layout.qZorderLayout(_, _)),
    "layout_compaction"    -> (graft.operators.Layout.qCompaction(_, _)),
    "layout_hilbert"       -> (graft.operators.Layout.qHilbertLayout(_, _)),
    "q_cube"               -> (Analytics.qCube(_, _)),
    "q_grouping_sets"      -> (Analytics.qGroupingSets(_, _)),
    "dq_key_skew"          -> (graft.operators.Skew.dqKeySkew(_, _)),
    "graph_triangles"      -> (graft.operators.Graph.graphTriangles(_, _)),
    "graph_pagerank"       -> (graft.operators.Graph.graphPagerank(_, _)),
    "graph_edge_jaccard"   -> (graft.operators.Graph.graphEdgeJaccard(_, _)),
    "graph_components"     -> (graft.operators.Graph.graphComponents(_, _)),
    "graph_kcore"          -> (graft.operators.Graph.graphKcore(_, _)),
    "graph_lpa"            -> (graft.operators.Graph.graphLpa(_, _)),
    "graph_modularity"     -> (graft.operators.Graph.graphModularity(_, _)),
    "graph_bfs"            -> (graft.operators.Graph.graphBfs(_, _)),
    "graph_link_predict"   -> (graft.operators.Graph.graphLinkPredict(_, _)),
    "agg_approx_ndv"       -> (graft.operators.Sketches.aggApproxNdv(_, _)),
    "agg_sketch_union"     -> (graft.operators.Sketches.aggSketchUnion(_, _)),
    "agg_cms_union"        -> (graft.operators.Sketches.aggCmsUnion(_, _)),
    "agg_distinct_intersect" -> (graft.operators.Sketches.aggDistinctIntersect(_, _)),
    "agg_hist_union"       -> ((s, d) => graft.operators.Quantiles.aggHistUnion(s, d)),
    "agg_heavy_hitters"    -> (graft.operators.Sketches.aggHeavyHitters(_, _)),
    "q_exact_quantiles"    -> (graft.operators.Quantiles.qExactQuantiles(_, _)),
    "agg_hist_quantiles"   -> (graft.operators.Quantiles.aggHistQuantiles(_, _)),
    // §2.3 dedup
    "dedup_exact"            -> (Dedup.exact(_, _)),
    "dedup_exact_normalized" -> (Dedup.exactNormalized(_, _)),
    "dedup_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "dedup_minhash_lsh"      -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"          -> (Dedup.simhash(_, _)),
    "dedup_contamination"    -> ((s, d) => Dedup.contamination(s, d)),
    "dedup_incremental"      -> ((s, d) => Dedup.incrementalExact(s, d)),
    "dedup_clusters"         -> (Dedup.clustersQuery(_, _)),
    "dedup_decontaminate"    -> ((s, d) => Dedup.decontaminate(s, d)),
    "dedup_boilerplate"      -> ((s, d) => Dedup.boilerplateCut(s, d)),
    "dedup_substring_spans"  -> ((s, d) => graft.operators.SubstringSpans.substringSpans(s, d)),
    "dedup_span_cut"         -> ((s, d) => graft.operators.SubstringSpans.spanCut(s, d)),
    "dedup_semantic"         -> ((s, d) => Dedup.semanticDedup(s, d)),
    "dedup_source_sim"       -> (Dedup.dedupSourceSim(_, _)),
    "dedup_cluster_keep_best" -> (Dedup.clusterKeepBest(_, _)),
    "sample_cluster_holdout"  -> (Dedup.sampleClusterHoldout(_, _)),
    "corpus_prep"            -> (graft.operators.CorpusPipeline.corpusPrep(_, _)),
    // §2.4 similarity
    "knn_bruteforce" -> ((s, d) => Similarity.knnBruteforce(s, d)),
    "knn_lsh"        -> ((s, d) => Similarity.knnLsh(s, d)),
    "knn_ivf"        -> ((s, d) => Similarity.knnIvf(s, d)),
    "knn_ivf_delete" -> ((s, d) => Similarity.knnIvfDelete(s, d)),
    "knn_graph"      -> ((s, d) => Similarity.knnGraph(s, d)),
    "knn_pq"         -> ((s, d) => graft.operators.Pq.knnPq(s, d)),
    "knn_opq"        -> ((s, d) => graft.operators.Opq.knnOpq(s, d)),
    "knn_ivf_opq"    -> ((s, d) => graft.operators.Opq.knnIvfOpq(s, d)),
    "knn_ivf_opq_filtered" -> ((s, d) => graft.operators.Opq.knnIvfOpqFiltered(s, d)),
    "knn_ivf_opq_radius" -> ((s, d) => graft.operators.Opq.knnIvfOpqRadius(s, d)),
    "knn_ivf_opq_radius_filtered" -> ((s, d) => graft.operators.Opq.knnIvfOpqRadiusFiltered(s, d)),
    "knn_ivf_opq_append" -> ((s, d) => graft.operators.Opq.knnIvfOpqAppend(s, d)),
    "knn_ivf_opq_delete" -> ((s, d) => graft.operators.Opq.knnIvfOpqDelete(s, d)),
    "knn_ivf_pq"     -> ((s, d) => graft.operators.Pq.knnIvfPq(s, d)),
    "knn_ivf_pq_append" -> ((s, d) => graft.operators.Pq.knnIvfPqAppend(s, d)),
    "knn_ivf_pq_delete" -> ((s, d) => graft.operators.Pq.knnIvfPqDelete(s, d)),
    "knn_ivf_pq_filtered" -> ((s, d) => graft.operators.Pq.knnIvfPqFiltered(s, d)),
    "knn_ivf_pq_radius" -> ((s, d) => graft.operators.Pq.knnIvfPqRadius(s, d)),
    "knn_ivf_pq_radius_filtered" -> ((s, d) => graft.operators.Pq.knnIvfPqRadiusFiltered(s, d)),
    "knn_sq8"        -> ((s, d) => Quantize.knnSq8(s, d)),
    "knn_sq8_filtered" -> ((s, d) => Quantize.knnSq8Filtered(s, d)),
    "knn_sq8_radius" -> ((s, d) => Quantize.knnSq8Radius(s, d)),
    "knn_sq8_radius_filtered" -> ((s, d) => Quantize.knnSq8RadiusFiltered(s, d)),
    "knn_sq8_delete" -> ((s, d) => Quantize.knnSq8Delete(s, d)),
    "knn_sq8_append" -> ((s, d) => Quantize.knnSq8Append(s, d)),
    "knn_ivf_sq8"    -> ((s, d) => Quantize.knnIvfSq8(s, d)),
    "knn_recall_report" -> (Similarity.knnRecallReport(_, _)),
    "knn_index_stats" -> (Similarity.knnIndexStats(_, _)),
    "knn_pq_index_stats" -> (graft.operators.Pq.knnPqIndexStats(_, _)),
    "knn_radius"     -> ((s, d) => Similarity.knnRadius(s, d)),
    "knn_filtered"   -> ((s, d) => Similarity.knnFiltered(s, d)),
    "knn_radius_filtered" -> ((s, d) => Similarity.knnRadiusFiltered(s, d)),
    "sample_kcenter" -> ((s, d) => Similarity.sampleKCenter(s, d)),
    "vec_stats"      -> (Similarity.vecStats(_, _)),
    "vec_covariance" -> (Similarity.vecCovariance(_, _)),
    "vec_quantize"   -> (Quantize.vecQuantize(_, _)),
    "embed_clusters" -> (Similarity.embedClusters(_, _)),
    // §2.5 text analysis
    "text_tokens"      -> (TextAnalysis.textTokens(_, _)),
    "text_entropy"     -> (TextAnalysis.textEntropy(_, _)),
    "text_quality"     -> (TextAnalysis.textQuality(_, _)),
    "text_langid"      -> (TextAnalysis.textLangid(_, _)),
    "text_fingerprint" -> (TextAnalysis.textFingerprint(_, _)),
    "text_tfidf"       -> (TextAnalysis.textTfidf(_, _)),
    "text_repetition"  -> (TextAnalysis.textRepetition(_, _)),
    "text_pii_scrub"   -> (TextAnalysis.textPiiScrub(_, _)),
    "text_vocab"       -> ((s, d) => TextAnalysis.textVocab(s, d)),
    "text_lm_score"    -> (TextAnalysis.textLmScore(_, _)),
    "pack_sequences"   -> ((s, d) => graft.operators.TrainPrep.packSequences(s, d)),
    "pack_boundaries"  -> ((s, d) => graft.operators.TrainPrep.packBoundaries(s, d)),
    "text_chunk"       -> ((s, d) => graft.operators.TrainPrep.chunkDocuments(s, d)),
    "sample_mixture"   -> ((s, d) => graft.operators.TrainPrep.sampleMixture(s, d)),
    "text_encode"      -> ((s, d) => graft.operators.TrainPrep.textEncode(s, d)),
    "pack_token_ids"   -> ((s, d) => graft.operators.TrainPrep.packTokenIds(s, d)),
    "bpe_train"        -> ((s, d) => graft.operators.Bpe.train(s, d)),
    "bpe_apply"        -> ((s, d) => graft.operators.Bpe.applySegments(s, d)),
    "bpe_encode"       -> ((s, d) => graft.operators.Bpe.encodeDocs(s, d)),
    // §2.6 multimodal
    "mm_binary_meta"     -> (Multimodal.binaryMeta(_, _)),
    "mm_feature_extract" -> (Multimodal.featureExtract(_, _)),
    "mm_frame_sample"    -> (Multimodal.frameSample(_, _)),
    "mm_frame_dedup"     -> (Multimodal.mmFrameDedup(_, _)),
    "mm_bmp_features"    -> (Multimodal.mmBmpFeatures(_, _)),
    "mm_wav_features"    -> (Multimodal.mmWavFeatures(_, _)),
    // §2.7 streaming (batch twins of the shared transforms; the
    // streaming forms run in StreamingSpec via MemoryStream)
    "stream_windowed_agg" -> (graft.streaming.Streams.windowedAggBatch(_, _)),
    "stream_hop_windows"  -> (graft.streaming.Streams.hopWindowedAggBatch(_, _)),
    "stream_dedupe"       -> (graft.streaming.Streams.keepFirstBatch(_, _)),
    "stream_ann_ingest"   -> (graft.streaming.Streams.annIngestBatch(_, _)),
    "stream_minhash_dedupe" -> (graft.streaming.Streams.minhashGuardBatch(_, _)),
    "stream_scd2"         -> (graft.streaming.Streams.scd2Batch(_, _)),
    "stream_sessionize"   -> (graft.streaming.Streams.sessionizeBatch(_, _)),
    "stream_approx_ndv"   -> (graft.streaming.Streams.windowedApproxNdvBatch(_, _)),
    "stream_topk"         -> (graft.streaming.Streams.topkBatch(_, _)),
    "stream_hist_quantiles" -> (graft.streaming.Streams.histQuantilesBatch(_, _)),
    "stream_anomaly"      -> (graft.streaming.Streams.anomalyBatchSorted(_, _)),
    "stream_enrich"       -> (graft.streaming.Streams.enrichBatch(_, _)),
    "stream_join"         -> (graft.streaming.Streams.attributeClicksBatch(_, _)),
    "stream_join_outer"   -> (graft.streaming.Streams.attributeClicksOuterBatch(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "etl_normalize"      -> Etl.normalizeOracleSql,
    "etl_normalize_tz"   -> Etl.normalizeTzOracleSql,
    "etl_hourly_rollup"  -> Etl.hourlyRollupOracleSql,
    "etl_keep_latest"    -> Etl.keepLatestOracleSql,
    "etl_dq_report"      -> Etl.dqReportOracleSql,
    "etl_dq_profile"     -> Etl.dqProfileOracleSql,
    // integer day counts through an exact trailing-window average
    "etl_dq_drift"       -> Etl.dqDriftOracleSql,
    // calendar explode from a 1-row bounds agg, never corpus-sized
    "etl_backfill_gaps"  -> Etl.backfillGapsOracleSql,
    "etl_schema_enforce" -> Etl.schemaEnforceOracleSql,
    "etl_incremental_ds" -> Etl.incrementalDsOracleSql,
    "etl_normalize_arrays" -> Etl.normalizeArraysOracleSql,
    "sample_deterministic" -> Etl.sampleDeterministicOracleSql,
    "sample_stratified"    -> Etl.sampleStratifiedOracleSql,
    "sample_weighted"      -> Etl.sampleWeightedOracleSql,
    "sample_cap_per_source" -> Etl.sampleCapPerSourceOracleSql,
    "sample_holdout_split" -> Etl.sampleHoldoutSplitOracleSql,
    // alpha=1/2 mixture rates: sqrt is the one correctly-rounded
    // IEEE exponent, so the rate doubles replay bit-for-bit
    "sample_temperature"   -> Etl.sampleTemperatureOracleSql,
    "sample_mixture_epochs" -> Etl.sampleMixtureEpochsOracleSql,
    "etl_scd2"             -> Etl.scd2OracleSql,
    "etl_snapshot_diff"    -> Etl.etlSnapshotDiffOracleSql,
    // one full-outer join resolving the MERGE clause semantics
    "etl_merge_into"       -> Etl.etlMergeIntoOracleSql,
    // oracle = the per-group rank form the histogram verdict replaces
    "sample_quality_topfrac" -> Etl.sampleQualityTopFracOracleSql,
    // the continuous-score refinement variant is output-identical by
    // contract, so it shares the discrete key's oracle verbatim
    "sample_topfrac_continuous" -> Etl.sampleQualityTopFracOracleSql,
    // keep-latest generalized to tombstone-bearing change feeds
    "etl_cdc_apply"        -> Etl.cdcApplyOracleSql,
    "etl_cdc_scd2"         -> Etl.cdcScd2OracleSql,
    "etl_scd2_enrich"      -> Etl.scd2EnrichOracleSql,
    "q1_pricing_summary"   -> Analytics.q1OracleSql,
    "q3_shipping_priority" -> Analytics.q3OracleSql,
    "q5_local_supplier"    -> Analytics.q5OracleSql,
    "q_market_share"       -> Analytics.qMarketShareOracleSql,
    "q_top_customers"      -> Analytics.qTopCustomersOracleSql,
    "q_running_total"      -> Analytics.qRunningTotalOracleSql,
    "q_rollup"             -> Analytics.qRollupOracleSql,
    "q_semi_anti"          -> Analytics.qSemiAntiOracleSql,
    "q_skew_topk"          -> Analytics.qSkewTopkOracleSql,
    "q_events_sessionize"  -> Analytics.qEventsSessionizeOracleSql,
    "q_asof_join"          -> graft.operators.AsOf.qAsOfJoinOracleSql,
    "q_range_join"         -> graft.operators.RangeJoin.qRangeJoinOracleSql,
    "q_interval_join"      -> graft.operators.RangeJoin.qIntervalJoinOracleSql,
    "etl_surrogate_keys"   -> graft.operators.Keys.etlSurrogateKeysOracleSql,
    "q_pivot_events"       -> Analytics.qPivotEventsOracleSql,
    "q_window_funnel"      -> Analytics.qWindowFunnelOracleSql,
    // the bloom prefilter must be invisible in the output: the oracle
    // is the PLAIN join
    "q_bloom_join"         -> graft.operators.BloomJoin.qBloomJoinOracleSql,
    "layout_zorder"        -> graft.operators.Layout.qZorderLayoutOracleSql,
    "layout_compaction"    -> graft.operators.Layout.qCompactionOracleSql,
    "layout_hilbert"       -> graft.operators.Layout.qHilbertLayoutOracleSql,
    "q_cube"               -> Analytics.qCubeOracleSql,
    // the irregular grouping-set lattice: two specific breakdowns +
    // the grand total in one pass (GROUPING bitmask both engines)
    "q_grouping_sets"      -> Analytics.qGroupingSetsOracleSql,
    "dq_key_skew"          -> graft.operators.Skew.dqKeySkewOracleSql,
    "q_retention_cohorts"  -> Analytics.qRetentionCohortsOracleSql,
    "q_fuzzy_match"        -> graft.operators.Fuzzy.qFuzzyMatchOracleSql,
    "q_fuzzy_edit1"        -> graft.operators.Fuzzy.qFuzzyEdit1OracleSql,
    "q_skyline"            -> graft.operators.Skyline.qSkylineOracleSql,
    "graph_triangles"      -> graft.operators.Graph.graphTrianglesOracleSql,
    "graph_pagerank"       -> graft.operators.Graph.graphPagerankOracleSql,
    "graph_edge_jaccard"   -> graft.operators.Graph.graphEdgeJaccardOracleSql,
    "graph_components"     -> graft.operators.Graph.graphComponentsOracleSql,
    // peeling unrolled KcorePeelRounds deep — identity once converged
    "graph_kcore"          -> graft.operators.Graph.graphKcoreOracleSql,
    // fixed synchronous rounds unrolled as materialized CTE levels —
    // mode argmax tie-broken (count DESC, label ASC) both engines
    "graph_lpa"            -> graft.operators.Graph.graphLpaOracleSql,
    // the LPA partition graded: exact BIGINT modularity units over
    // the shared unrolled-rounds replay, one presentation division
    "graph_modularity"     -> graft.operators.Graph.graphModularityOracleSql,
    // multi-source BFS: the min-fold walk unrolled as materialized
    // levels, per-distance histogram + reach totals
    "graph_bfs"            -> graft.operators.Graph.graphBfsOracleSql,
    "graph_link_predict"   -> graft.operators.Graph.graphLinkPredictOracleSql,
    // the HLL estimator replays bit-exactly: ordered register fold of
    // exact 2^-rho terms; ln() lookup table embedded from Scala
    "agg_approx_ndv"       -> graft.operators.Sketches.aggApproxNdvOracleSql,
    "agg_sketch_union"     -> graft.operators.Sketches.aggSketchUnionOracleSql,
    "agg_cms_union"        -> graft.operators.Sketches.aggCmsUnionOracleSql,
    // MinHash-Jaccard x HLL-union composite intersection estimator
    "agg_distinct_intersect" -> graft.operators.Sketches.aggDistinctIntersectOracleSql,
    "agg_hist_union"       -> graft.operators.Quantiles.aggHistUnionOracleSql,
    // the CMS replays bit-exactly: poly_hash64 byte fold + per-row
    // xxhash64 lanes with Scala-computed constant-lane seeds
    "agg_heavy_hitters"    -> graft.operators.Sketches.aggHeavyHittersOracleSql,
    // the histogram-refinement selection must equal the ranked sort
    "q_exact_quantiles"    -> graft.operators.Quantiles.qExactQuantilesOracleSql,
    // the one-pass histogram sketch replays as the same integer grid
    "agg_hist_quantiles"   -> graft.operators.Quantiles.aggHistQuantilesOracleSql,
    // §2.3 dedup
    "dedup_exact"            -> Dedup.exactOracleSql,
    // the minhash signature math replays bit-exactly in DuckDB
    // (HUGEINT mod-2^64 + UBIGINT bitwise; bands join on raw slices)
    "dedup_minhash_lsh"      -> Dedup.minhashLshOracleSql,
    "dedup_source_sim"       -> Dedup.dedupSourceSimOracleSql,
    // the cluster closure re-rooted with quality argmax survivors
    "dedup_cluster_keep_best" -> Dedup.clusterKeepBestOracleSql,
    // the closure re-rooted with the family-keyed holdout draw
    "sample_cluster_holdout"  -> Dedup.sampleClusterHoldoutOracleSql,
    "dedup_exact_normalized" -> Dedup.exactNormalizedOracleSql,
    "dedup_ngram_jaccard"    -> Dedup.ngramJaccardOracleSql,
    "dedup_simhash"          -> Dedup.simhashOracleSql,
    "dedup_embedding_cosine" -> Dedup.embeddingCosineOracleSql,
    "dedup_contamination"    -> Dedup.contaminationOracleSql,
    "dedup_incremental"      -> Dedup.incrementalExactOracleSql,
    "dedup_clusters"         -> Dedup.clustersOracleSql,
    "dedup_decontaminate"    -> Dedup.decontaminateOracleSql,
    "dedup_boilerplate"      -> Dedup.boilerplateCutOracleSql,
    "dedup_substring_spans"  -> graft.operators.SubstringSpans.substringSpansOracleSql,
    // the cut composes the same duplicated-window replay + anti-join
    "dedup_span_cut"         -> graft.operators.SubstringSpans.spanCutOracleSql,
    // within-cluster pair space over the shared IVF-build replay
    "dedup_semantic"         -> Dedup.semanticDedupOracleSql,
    // the six-stage corpus composition as one CTE chain — each stage
    // the same formulation as its standalone oracle, re-rooted
    "corpus_prep"            -> graft.operators.CorpusPipeline.corpusPrepOracleSql,
    // §2.4 similarity — the "approximate" indexes are deterministic
    // (fixed-seed hyperplanes; decimal-exact Lloyd means), so they
    // replay fully in SQL and get real hash oracles
    "knn_bruteforce" -> Similarity.knnBruteforceOracleSql,
    "knn_lsh"        -> Similarity.knnLshOracleSql,
    "knn_ivf"        -> Similarity.knnIvfOracleSql,
    // the float tier's erasure lifecycle: candidate exclusion only —
    // centroids and probes stand
    "knn_ivf_delete" -> Similarity.knnIvfDeleteOracleSql,
    "knn_graph"      -> Similarity.knnGraphOracleSql,
    "knn_pq"         -> graft.operators.Pq.knnPqOracleSql,
    // the PCA-rotated PQ replayed end to end: covariance units, the
    // power-iteration basis as recursive CTEs, round-robin placement,
    // the shared PQ tail at the rotated dim
    "knn_opq"        -> graft.operators.Opq.knnOpqOracleSql,
    // the rotation composed with the inverted file: OPQ prefix + the
    // shared IVF body + the suffixed cell-pruned ADC tail
    "knn_ivf_opq"    -> graft.operators.Opq.knnIvfOpqOracleSql,
    // the rotated composition's filtered serving path: the OPQ prefix
    // + IVF body + qlabel-carrying probes + the filtered ADC tail
    "knn_ivf_opq_filtered" -> graft.operators.Opq.knnIvfOpqFilteredOracleSql,
    // the rotated composition's radius path: ranked cut swapped for
    // the adist threshold, exact verify on the true cosine
    "knn_ivf_opq_radius" -> graft.operators.Opq.knnIvfOpqRadiusOracleSql,
    // the LAST serving-matrix cell (tier × query type) at the gate:
    // same-label radius admission inside the rotated compressed scan
    "knn_ivf_opq_radius_filtered" -> graft.operators.Opq.knnIvfOpqRadiusFilteredOracleSql,
    // the rotated append lifecycle: basis, Lloyd, and codebooks all
    // trained on the day-0 half; assignment/encode/probes full-corpus
    "knn_ivf_opq_append" -> graft.operators.Opq.knnIvfOpqAppendOracleSql,
    // the rotated erasure lifecycle: candidate exclusion only — the
    // trained aggregates (basis/centroids/codebooks) stand
    "knn_ivf_opq_delete" -> graft.operators.Opq.knnIvfOpqDeleteOracleSql,
    "knn_ivf_pq"     -> graft.operators.Pq.knnIvfPqOracleSql,
    // the append lifecycle replayed with training decoupled: Lloyd +
    // codebooks on the base half only, assign+encode over everything
    "knn_ivf_pq_append" -> graft.operators.Pq.knnIvfPqAppendOracleSql,
    // the erasure lifecycle replayed as candidate exclusion: trained
    // artifacts stand, only the erased ids' codes are gone
    "knn_ivf_pq_delete" -> graft.operators.Pq.knnIvfPqDeleteOracleSql,
    // filtered search off the compressed staged tier: the composed
    // IVFADC replay with the label joined on both sides, candidate
    // enumeration same-label only, widened probe cut
    "knn_ivf_pq_filtered" -> graft.operators.Pq.knnIvfPqFilteredOracleSql,
    // radius search off the compressed staged tier: the composed
    // IVFADC replay with the ranked cut swapped for the distance
    // threshold, exact verify on the true cosine
    "knn_ivf_pq_radius" -> graft.operators.Pq.knnIvfPqRadiusOracleSql,
    // filtered radius on the compressed tier: same-label admission
    // inside the ADC scan, threshold cut, labeled radius verify
    "knn_ivf_pq_radius_filtered" -> graft.operators.Pq.knnIvfPqRadiusFilteredOracleSql,
    // the int8 serving scan replayed end-to-end: the vec_quantize
    // grid re-derived, decode, approx-cosine cut, exact rerank
    "knn_sq8"        -> Quantize.knnSq8OracleSql,
    // filtered search off the SQ8 tier: the flat decode replay with
    // the label joined on both sides, same-label candidate ranking
    "knn_sq8_filtered" -> Quantize.knnSq8FilteredOracleSql,
    // radius search off the compressed tier: approximate-cosine
    // admission + exact verify, both thresholds strtod-embedded
    "knn_sq8_radius" -> Quantize.knnSq8RadiusOracleSql,
    // filtered radius on the scalar tier: lab joined on both sides
    // of the decode admission, labeled radius verify
    "knn_sq8_radius_filtered" -> Quantize.knnSq8RadiusFilteredOracleSql,
    // the SQ8 erasure lifecycle: candidates exclude the erased slice,
    // the trained grid and every surviving code stand as built
    "knn_sq8_delete" -> Quantize.knnSq8DeleteOracleSql,
    // the scalar tier's frozen-grid append: grid from the base slice,
    // decode of everything against it with the executor's saturation
    "knn_sq8_append" -> Quantize.knnSq8AppendOracleSql,
    // the composed IVF-pruned compressed scan: the shared IVF prefix
    // + the SQ8 grid/decode CTEs, candidates restricted to probed cells
    "knn_ivf_sq8"    -> Quantize.knnIvfSq8OracleSql,
    // the nprobe quality curve: one materialized IVF-build replay,
    // per-nprobe ranked cuts, overlap vs the brute-force replay
    "knn_recall_report" -> Similarity.knnRecallReportOracleSql,
    // the retrain pre-flight: per-cell counts/skew/appended-fraction
    // over the trained-on-base assignment (the append equation)
    "knn_index_stats" -> Similarity.knnIndexStatsOracleSql,
    // the PQ tier's health read shares the float oracle VERBATIM: its
    // codes tree assigns against the same deterministic coarse
    // quantizer trained on the same half (the trainOn-decoupling
    // equation), and stats read no code bytes
    "knn_pq_index_stats" -> Similarity.knnIndexStatsOracleSql,
    // range search: the IVF replay with the ranked tail swapped for
    // the radius filter (strtod-embedded threshold)
    "knn_radius"     -> Similarity.knnRadiusOracleSql,
    // filtered top-k: the IVF replay with the label projection joined
    // onto queries and candidates, window over the filtered stream
    "knn_filtered"   -> Similarity.knnFilteredOracleSql,
    // filtered radius: the radius tail with the lab CTE on both
    // sides at the widened probe cut
    "knn_radius_filtered" -> Similarity.knnRadiusFilteredOracleSql,
    "sample_kcenter" -> Similarity.sampleKCenterOracleSql,
    "vec_stats"      -> Similarity.vecStatsOracleSql,
    "vec_covariance" -> Similarity.vecCovarianceOracleSql,
    // per-dimension affine int8 grid: exact integer code checksum +
    // decimal-accumulated reconstruction error
    "vec_quantize"   -> Quantize.vecQuantizeOracleSql,
    // per-cluster population + decimal-accumulated mean centroid cosine
    "embed_clusters" -> Similarity.embedClustersOracleSql,
    // §2.5 text — langid's whole learn+predict path is deterministic
    // (hash split, count profiles, integer-sum scoring) and replays in
    // SQL, so even the "learned" operator carries a hash oracle
    "text_tokens"  -> TextAnalysis.textTokensOracleSql,
    // ln() is not correctly-rounded in either engine — the entropy
    // oracle joins the SAME embedded ln literal table the executor
    // reads (the HLL linear-counting precedent)
    "text_entropy" -> TextAnalysis.textEntropyOracleSql,
    "text_langid"  -> TextAnalysis.textLangidOracleSql,
    // the native codegen fingerprints replay byte-exactly in DuckDB
    // HUGEINT mod-2^64 arithmetic — same technique as mm_feature_extract
    "text_fingerprint" -> TextAnalysis.textFingerprintOracleSql,
    "text_quality" -> TextAnalysis.textQualityOracleSql,
    "text_tfidf"   -> TextAnalysis.textTfidfOracleSql,
    "text_repetition" -> TextAnalysis.textRepetitionOracleSql,
    "text_pii_scrub"  -> TextAnalysis.textPiiScrubOracleSql,
    "text_vocab"      -> TextAnalysis.textVocabOracleSql,
    // exact-integer unigram scoring, one final division
    "text_lm_score"   -> TextAnalysis.textLmScoreOracleSql,
    "pack_sequences"  -> graft.operators.TrainPrep.packSequencesOracleSql,
    // pure layout math: chunk-intersection arithmetic over the
    // packSequences index, integer-exact
    "pack_boundaries" -> graft.operators.TrainPrep.packBoundariesOracleSql,
    "text_chunk"      -> graft.operators.TrainPrep.chunkDocumentsOracleSql,
    // temperature mixture sampling: exact-unit sqrt weights, XXH64
    // admission coordinate replayed via the factored single-long chain
    "sample_mixture"  -> graft.operators.TrainPrep.sampleMixtureOracleSql,
    "text_encode"     -> graft.operators.TrainPrep.textEncodeOracleSql,
    "pack_token_ids"  -> graft.operators.TrainPrep.packTokenIdsOracleSql,
    // BPE training: per-round recursive-fold replay (exact integer
    // counts + bytewise string ties -> bit-for-bit)
    "bpe_train"       -> graft.operators.Bpe.trainOracleSql(),
    "bpe_apply"       -> graft.operators.Bpe.applyOracleSql(),
    "bpe_encode"      -> graft.operators.Bpe.encodeDocsOracleSql(),
    // §2.6 multimodal
    "mm_binary_meta"     -> Multimodal.binaryMetaOracleSql,
    "mm_feature_extract" -> Multimodal.featureExtractOracleSql,
    // the frame grid + poly_hash64-over-BINARY fingerprint replay
    // through the shared Karp-Rabin byte-fold fragments
    "mm_frame_sample"    -> Multimodal.frameSampleOracleSql,
    "mm_frame_dedup"     -> Multimodal.mmFrameDedupOracleSql,
    "mm_bmp_features"    -> Multimodal.mmBmpFeaturesOracleSql,
    "mm_wav_features"    -> Multimodal.mmWavFeaturesOracleSql,
    // §2.7 streaming batch twins
    "stream_windowed_agg" -> graft.streaming.Streams.windowedAggOracleSql,
    "stream_hop_windows"  -> graft.streaming.Streams.hopWindowedAggOracleSql,
    "stream_dedupe"       -> graft.streaming.Streams.keepFirstOracleSql,
    "stream_minhash_dedupe" -> graft.operators.Dedup.minhashGuardOracleSql,
    // batch twin of the streaming ANN ingest sink — shares the
    // trainOn-decoupled append replay (the stream_scd2 precedent)
    "stream_ann_ingest"   -> graft.operators.Pq.knnIvfPqAppendOracleSql,
    // the sink's materialization over the complete feed == the batch
    // CDC->SCD2 composition, so the two keys share one oracle
    "stream_scd2"         -> Etl.cdcScd2OracleSql,
    // the stateful sessionizer must agree with the window-form
    // sessionizer row-for-row — one oracle checks both
    "stream_sessionize"   -> Analytics.qEventsSessionizeOracleSql,
    // per-hour HLL replay, same single-source CTE pipeline as
    // agg_approx_ndv keyed by the window start
    "stream_approx_ndv"   -> graft.operators.Sketches.windowedApproxNdvOracleSql,
    "stream_topk"         -> graft.streaming.Streams.topkOracleSql,
    "stream_hist_quantiles" -> graft.streaming.Streams.histQuantilesOracleSql,
    "stream_anomaly"      -> graft.streaming.Streams.anomalyOracleSql,
    // stream-static broadcast enrichment: stateless by construction,
    // the batch body and the streaming body are the same function
    "stream_enrich"       -> graft.streaming.Streams.enrichOracleSql,
    // stream-stream interval join: the batch twin is the same join
    // body, so one oracle checks both modes (StreamingSpec drives the
    // watermarked form)
    "stream_join"         -> graft.streaming.Streams.attributeClicksOracleSql,
    "stream_join_outer"   -> graft.streaming.Streams.attributeClicksOuterOracleSql
  )
}
