package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AggQueries, AnalyticsQueries, CorpusQueries, CurationQueries, DedupQueries, EventQueries, ParityQueries, SimilarityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL column names/types and a deterministic ORDER BY on both
  * sides. Conventions for cross-engine determinism:
  *
  *   - integer outputs cast to BIGINT in both engines
  *   - money aggregates computed in exact DECIMAL then cast to DOUBLE
  *     (bit-identical regardless of partial-agg order)
  *   - hashing via md5-hex -> 60-bit BIGINT ([[graft.functions.PortableHash]])
  *   - dates/timestamps emitted as ISO strings
  */
object SparkEntry {

  /** DuckDB fragment: the Fts tokenizer (lower + split non-alphanumeric,
    * boundary empties dropped).
    */
  private def duckTokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), t -> t <> '')"

  private def duckContainsAll(expr: String, terms: Seq[String]): String =
    terms.map(t => s"list_contains(${duckTokens(expr)}, '$t')").mkString(" AND ")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 / §2.7 — scan + row identity
    "s1_rowid_scan" -> (ParityQueries.rowidScan _),
    // §2.2 — projections / column transforms
    "p2_shape_part" -> (ParityQueries.shapePart _),
    "p3_literal_columns" -> (ParityQueries.literalColumns _),
    "p5_dates_iso" -> (ParityQueries.datesIso _),
    "p5_datetimes_iso" -> (ParityQueries.datetimesIso _),
    // §2.3 — dictionary encoding
    "e2_dict_orderpriority" -> (ParityQueries.dictOrderpriority _),
    "e2_encode_orders" -> (ParityQueries.encodeOrders _),
    "e2_shared_dict" -> (ParityQueries.sharedDict _),
    "e2_canon_float_dict" -> (ParityQueries.canonFloatDict _),
    "x_window_top_orders" -> (ParityQueries.windowTopOrders _),
    // §2.5/§2.6 — FTS + reconstruction joins
    "s10_fts_reconstruct" -> (ParityQueries.ftsReconstruct _),
    "s13_fts_match" -> (ParityQueries.ftsMatch _),
    "s12_fts_term_stats" -> (ParityQueries.ftsTermStats _),
    "s13_fts_index_match" -> (ParityQueries.ftsIndexMatch _),
    "x_fts_ranked" -> (ParityQueries.ftsRanked _),
    "x_fts_boolean" -> (ParityQueries.ftsBoolean _),
    "x_fts_bm25" -> (ParityQueries.ftsBm25 _),
    "x_fts_snippet" -> (ParityQueries.ftsSnippet _),
    "x_fts_highlight" -> (ParityQueries.ftsHighlight _),
    "x_fts_near" -> (ParityQueries.ftsNear _),
    "x_fts_prefix" -> (ParityQueries.ftsPrefix _),
    "x_fts_colfilter" -> (ParityQueries.ftsColFilter _),
    "x_fts_colset_expr" -> (ParityQueries.ftsColSetExpr _),
    "x_fts_near3" -> (ParityQueries.ftsNear3 _),
    "x_fts_anchor" -> (ParityQueries.ftsAnchor _),
    "x_fts_unicode" -> (ParityQueries.ftsUnicode _),
    "x_u61_term_stats" -> (ParityQueries.u61TermStats _),
    "x_span_corrupt" -> (CorpusQueries.spanCorrupt _),
    "x_token_dropout" -> (CorpusQueries.tokenDropout _),
    "x_semantic_chunks" -> (CorpusQueries.semanticChunks _),
    "x_prefix_savings" -> (CorpusQueries.prefixSavings _),
    "x_fim_transform" -> (CorpusQueries.fimTransform _),
    // headline agg/join workloads
    "q1_pricing_summary" -> (AggQueries.pricingSummary _),
    "q3_top_revenue_orders" -> (AggQueries.topRevenueOrders _),
    "q5_revenue_by_nation" -> (AggQueries.revenueByNation _),
    "q6_forecast_revenue" -> (AggQueries.forecastRevenue _),
    "q14_promo_share" -> (AggQueries.promoShare _),
    "x_rollup_revenue" -> (AggQueries.rollupRevenue _),
    "x_cube_revenue" -> (AggQueries.cubeRevenue _),
    "x_distinct_parts" -> (AggQueries.distinctParts _),
    "x_approx_distinct_parts" -> (AggQueries.approxDistinctParts _),
    "x_anti_join_customers" -> (AggQueries.customersWithoutOrders _),
    // extensions: dedup + text analysis (documents)
    "x_dedup_exact" -> (DedupQueries.dedupExact _),
    "x_dedup_clusters" -> (DedupQueries.dedupClusters _),
    "x_dedup_keep_best" -> (DedupQueries.dedupKeepBest _),
    "x_dedup_cluster_sizes" -> (DedupQueries.dedupClusterSizes _),
    "x_dedup_leakage" -> (DedupQueries.dedupLeakage _),
    "x_ppjoin_pairs" -> (DedupQueries.ppjoinPairs _),
    "x_ppjoin_skew_report" -> (DedupQueries.ppjoinSkewReport _),
    "x_dup_ngram_mass" -> (DedupQueries.dupNgramMass _),
    "x_dup_span_prune" -> (DedupQueries.dupSpanPrune _),
    "x_dup_span_prune_incr" -> (DedupQueries.dupSpanPruneIncremental _),
    "x_pipeline_scrub" -> (DedupQueries.pipelineScrub _),
    "x_lsh_recall" -> (DedupQueries.lshRecall _),
    "x_split_leakage" -> (DedupQueries.splitLeakage _),
    "x_dedup_savings" -> (DedupQueries.dedupSavings _),
    "x_dedup_manifest" -> (DedupQueries.dedupManifest _),
    "x_dedup_incremental" -> (DedupQueries.dedupIncremental _),
    "x_dedup_incremental_near" -> (DedupQueries.dedupIncrementalNear _),
    "x_minhash_signatures" -> (DedupQueries.minhashSignatures _),
    "x_minhash_pairs" -> (DedupQueries.minhashPairs _),
    "x_simhash" -> (DedupQueries.simhashFingerprints _),
    "x_simhash_pairs" -> (DedupQueries.simhashPairs _),
    "x_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    "x_winnow_fingerprints" -> (DedupQueries.winnowFingerprints _),
    "x_winnow_pairs" -> (DedupQueries.winnowPairs _),
    "x_containment_pairs" -> (DedupQueries.containmentPairs _),
    "x_cdc_chunks" -> (DedupQueries.cdcChunks _),
    "x_snm_pairs" -> (DedupQueries.snmPairs _),
    "x_split_assign" -> (DedupQueries.splitAssign _),
    "x_corpus_report" -> (DedupQueries.corpusReport _),
    "x_quality_sample" -> (DedupQueries.qualitySample _),
    "x_quality_calibrated" -> (DedupQueries.qualityCalibrated _),
    "x_pack_assign" -> (DedupQueries.packAssign _),
    "x_pack_attention" -> (DedupQueries.packAttention _),
    "x_pack_sequences" -> (DedupQueries.packSequences _),
    "x_batch_padding" -> (DedupQueries.batchPadding _),
    "x_redact_pii" -> (DedupQueries.redactPii _),
    "x_repetition" -> (DedupQueries.repetitionReport _),
    "x_stratified_sample" -> (DedupQueries.stratifiedSample _),
    "x_temperature_sample" -> (DedupQueries.temperatureSample _),
    "x_length_quantiles" -> (DedupQueries.lengthQuantiles _),
    "x_chunk_docs" -> (DedupQueries.chunkDocs _),
    "x_decontaminate" -> (DedupQueries.decontaminate _),
    "x_contam_span" -> (DedupQueries.contamSpan _),
    "x_shared_ngrams" -> (CorpusQueries.sharedNgrams _),
    "x_freq_score" -> (CorpusQueries.freqScore _),
    "x_dsir_select" -> (CorpusQueries.dsirSelect _),
    "x_ngram_lm_score" -> (CorpusQueries.ngramLmScore _),
    "x_negative_samples" -> (CorpusQueries.negativeSamples _),
    "x_curriculum_order" -> (CorpusQueries.curriculumOrder _),
    "x_nb_domain" -> (CorpusQueries.nbDomain _),
    "x_token_budget_plan" -> (CorpusQueries.tokenBudgetPlan _),
    "x_topk_two_phase" -> (EventQueries.topkTwoPhase _),
    "x_kmv_set_ops" -> (CorpusQueries.kmvSetOps _),
    "x_readability" -> (CorpusQueries.readability _),
    "x_profile_columns" -> (CorpusQueries.profileColumns _),
    "x_multimodal_windows" -> (EventQueries.multimodalWindows _),
    "x_card_numbers" -> (DedupQueries.cardNumbers _),
    "x_priority_sample" -> (CorpusQueries.prioritySample _),
    "x_top_terms" -> (CorpusQueries.topTerms _),
    "x_cms_freq" -> (CorpusQueries.cmsFreq _),
    "x_hist_quantiles" -> (CorpusQueries.histQuantiles _),
    "x_zorder_layout" -> (CorpusQueries.zorderLayout _),
    "x_oov_rate" -> (CorpusQueries.oovRate _),
    "x_vocab_growth" -> (CorpusQueries.vocabGrowth _),
    "x_corpus_manifest" -> (CorpusQueries.corpusManifest _),
    "x_manifest_check" -> (CorpusQueries.manifestCheck _),
    "x_pagerank" -> (CorpusQueries.pagerank _),
    "x_token_fertility" -> (CorpusQueries.tokenFertility _),
    "x_mix_drift" -> (CorpusQueries.mixDrift _),
    "x_corpus_diff" -> (CorpusQueries.corpusDiff _),
    "x_length_deciles" -> (CorpusQueries.lengthDeciles _),
    "x_url_filter" -> (CorpusQueries.urlFilter _),
    "x_url_dedup" -> (CorpusQueries.urlDedup _),
    "x_shard_skew" -> (CorpusQueries.shardSkew _),
    "x_token_mass_median" -> (CorpusQueries.tokenMassMedian _),
    "x_bloom_membership" -> (CorpusQueries.bloomMembership _),
    "x_corpus_shuffle" -> (CorpusQueries.corpusShuffle _),
    "x_para_dedup" -> (CorpusQueries.paraDedup _),
    "x_embed_quantize" -> (SimilarityQueries.embedQuantize _),
    "x_mixture_sample" -> (CorpusQueries.mixtureSample _),
    "x_epoch_shards" -> (CorpusQueries.epochShards _),
    "x_interleave_plan" -> (CorpusQueries.interleavePlan _),
    "x_length_gini" -> (CorpusQueries.lengthGini _),
    "x_source_quota" -> (CorpusQueries.sourceQuota _),
    "x_vocab_coverage" -> (CorpusQueries.vocabCoverage _),
    // extensions: line-level curation + lexical retrieval
    "x_c4_line_filter" -> (CurationQueries.c4LineFilter _),
    "x_boilerplate_strip" -> (CurationQueries.boilerplateStrip _),
    "x_dedup_lines_doc" -> (CurationQueries.dedupLinesDoc _),
    "x_gopher_quality" -> (CurationQueries.gopherQuality _),
    "x_tfidf_topk" -> (CurationQueries.tfidfTopk _),
    "x_curation_verdict" -> (CurationQueries.curationVerdict _),
    "x_keywords" -> (CurationQueries.keywords _),
    "x_html_strip" -> (CurationQueries.htmlStrip _),
    "x_markdown_strip" -> (CurationQueries.markdownStrip _),
    "x_mojibake" -> (CurationQueries.mojibake _),
    "x_code_prose" -> (CurationQueries.codeProse _),
    "x_chat_validate" -> (CurationQueries.chatValidate _),
    "x_passage_rank" -> (CurationQueries.passageRank _),
    "x_curation_by_source" -> (CurationQueries.curationBySource _),
    "x_blocklist" -> (CurationQueries.blocklist _),
    "x_turn_dedup" -> (CurationQueries.turnDedup _),
    "x_sft_loss_mask" -> (CurationQueries.sftLossMask _),
    "x_sft_pipeline" -> (CurationQueries.sftPipeline _),
    "x_preference_pairs" -> (CurationQueries.preferencePairs _),
    "x_soft_dedup_weights" -> (DedupQueries.softDedupWeights _),
    "x_k_anonymity" -> (CurationQueries.kAnonymity _),
    "x_pipeline_e2e" -> (CurationQueries.pipelineE2e _),
    "x_semdedup" -> (SimilarityQueries.semDedup _),
    // extensions: corpus analytics (round 6)
    "x_kmv_distinct" -> (AnalyticsQueries.kmvDistinct _),
    "x_edit_verify" -> (AnalyticsQueries.editVerify _),
    "x_script_mix" -> (AnalyticsQueries.scriptMix _),
    "x_collocations" -> (AnalyticsQueries.collocations _),
    "x_pivot_sources" -> (AnalyticsQueries.pivotSources _),
    "x_corr_stats" -> (AnalyticsQueries.corrStats _),
    "x_bpe_merges" -> (AnalyticsQueries.bpeMerges _),
    "x_bpe_tokenize" -> (AnalyticsQueries.bpeTokenize _),
    "x_bpe_compression" -> (AnalyticsQueries.bpeCompression _),
    "x_mad_outliers" -> (AnalyticsQueries.madOutliers _),
    "x_length_histogram" -> (AnalyticsQueries.lengthHistogram _),
    "x_domain_cap" -> (AnalyticsQueries.domainCap _),
    "x_rank_fusion" -> (AnalyticsQueries.rankFusion _),
    "x_events_latest" -> (EventQueries.eventsLatest _),
    "x_events_dense_hourly" -> (EventQueries.denseHourly _),
    "x_kmv_sliding" -> (EventQueries.kmvSliding _),
    "x_events_props" -> (EventQueries.eventsProps _),
    "x_events_trend" -> (EventQueries.eventsTrend _),
    "x_winsor_means" -> (AnalyticsQueries.winsorMeans _),
    "x_token_cdf" -> (AnalyticsQueries.tokenCdf _),
    "x_dedup_recall" -> (AnalyticsQueries.dedupRecall _),
    // sketch queries: deterministic portable-hash sketches (KMV sample,
    // per-group CMS) -> hash-exact oracles like everything else
    "x_approx_length_quantiles" -> (CorpusQueries.approxLengthQuantiles _),
    "x_heavy_hitters_sketch" -> (CorpusQueries.heavyHittersSketch _),
    "x_lang_id" -> (DedupQueries.langId _),
    "x_lang_id_ngram" -> (CorpusQueries.langIdNgram _),
    "x_normalize_text" -> (CorpusQueries.normalizeText _),
    "x_quality" -> (DedupQueries.quality _),
    "x_token_counts" -> (DedupQueries.tokenCounts _),
    "x_fingerprints" -> (DedupQueries.fingerprints _),
    // extensions: similarity search (embeddings)
    "x_ann_topk" -> (SimilarityQueries.annTopK _),
    "x_hard_negatives" -> (SimilarityQueries.hardNegatives _),
    "x_ann_ivf" -> (SimilarityQueries.annIvf _),
    "x_ann_recall" -> (SimilarityQueries.annRecall _),
    "x_matryoshka_recall" -> (SimilarityQueries.matryoshkaRecall _),
    "x_rand_project" -> (SimilarityQueries.randProject _),
    "x_rp_recall" -> (SimilarityQueries.rpRecall _),
    "x_pq_codes" -> (SimilarityQueries.pqCodes _),
    "x_pq_recall" -> (SimilarityQueries.pqRecall _),
    "x_ann_lsh" -> (SimilarityQueries.annLsh _),
    "x_embed_neardups" -> (SimilarityQueries.embedNearDups _),
    "x_embed_centroids" -> (SimilarityQueries.embedCentroids _),
    "x_kmeans_clusters" -> (SimilarityQueries.kmeansClusters _),
    "x_cluster_topics" -> (SimilarityQueries.clusterTopics _),
    "x_ann_ivf_trained" -> (SimilarityQueries.annIvfTrained _),
    "x_ann_ivfpq" -> (SimilarityQueries.annIvfPq _),
    "x_ann_ivfpq_recall" -> (SimilarityQueries.ivfPqRecall _),
    // extensions: event-time windows + multimodal plumbing
    "x_events_asof" -> (EventQueries.asofJoin _),
    "x_events_asof_exec" -> (EventQueries.asofJoinExec _),
    "x_events_asof_nearest" -> (EventQueries.asofNearest _),
    "x_events_asof_nearest_exec" -> (EventQueries.asofNearestExec _),
    "x_events_range_join" -> (EventQueries.rangeJoin _),
    "x_events_interval_overlap" -> (EventQueries.intervalOverlap _),
    "x_events_retention" -> (EventQueries.retention _),
    "x_events_funnel" -> (EventQueries.funnel _),
    "x_events_paths" -> (EventQueries.eventPaths _),
    "x_events_anomaly" -> (EventQueries.eventsAnomaly _),
    "x_events_transitions" -> (EventQueries.eventTransitions _),
    "x_join_skew_report" -> (EventQueries.joinSkewReport _),
    "x_multimodal_resize" -> (EventQueries.multimodalResize _),
    "x_multimodal_crops" -> (EventQueries.multimodalCrops _),
    "x_events_tumbling" -> (EventQueries.tumbling _),
    "x_events_sliding" -> (EventQueries.sliding _),
    "x_events_sessions" -> (EventQueries.sessions _),
    "x_multimodal_decode" -> (EventQueries.multimodalDecode _),
    "x_multimodal_frames" -> (EventQueries.multimodalFrames _),
    "x_multimodal_frame_dedup" -> (EventQueries.multimodalFrameDedup _),
    "x_multimodal_patches" -> (EventQueries.multimodalPatches _),
    "x_multimodal_embed_topk" -> (EventQueries.multimodalEmbedTopK _),
  )

  /** DuckDB-runnable oracle per query (same column names, same ORDER BY). */
  def oracleSql: Map[String, String] = Map(
    "s1_rowid_scan" ->
      """SELECT CAST(row_number() OVER (ORDER BY r_regionkey) AS BIGINT) AS rowid,
        |  CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
        |FROM region ORDER BY rowid""".stripMargin,
    "p2_shape_part" ->
      """SELECT CAST(p_partkey AS BIGINT) AS part_id, p_name AS part_name,
        |  CAST(p_size AS DOUBLE) AS size_real, CAST(p_brand AS VARCHAR) AS brand
        |FROM part ORDER BY part_id""".stripMargin,
    "p3_literal_columns" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  'nation' AS filename, 'batch42' AS batch,
        |  CAST(42 AS BIGINT) AS load_id, CAST(1.5 AS DOUBLE) AS weight
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "p5_dates_iso" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_fuzzy,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_fuzzy2
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p5_datetimes_iso" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
        |FROM events ORDER BY event_id""".stripMargin,
    "e2_dict_orderpriority" ->
      """SELECT CAST(row_number() OVER (ORDER BY first_seen) AS BIGINT) AS id, value
        |FROM (SELECT o_orderpriority AS value, min(o_orderkey) AS first_seen
        |      FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1)
        |ORDER BY id""".stripMargin,
    "e2_encode_orders" ->
      """WITH dict AS (
        |  SELECT CAST(row_number() OVER (ORDER BY first_seen) AS BIGINT) AS id, value
        |  FROM (SELECT o_orderpriority AS value, min(o_orderkey) AS first_seen
        |        FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1))
        |SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderstatus,
        |  CAST(d.id AS BIGINT) AS o_orderpriority
        |FROM orders o LEFT JOIN dict d ON o.o_orderpriority = d.value
        |ORDER BY o_orderkey""".stripMargin,
    "e2_shared_dict" ->
      """WITH src AS (
        |  SELECT l_returnflag AS value, CAST(0 AS BIGINT) AS s,
        |         l_orderkey*10 + l_linenumber AS rowid FROM lineitem
        |  UNION ALL
        |  SELECT l_linestatus, CAST(1 AS BIGINT),
        |         l_orderkey*10 + l_linenumber FROM lineitem)
        |SELECT CAST(row_number() OVER (ORDER BY fs) AS BIGINT) AS id, value
        |FROM (SELECT value, min(s*1000000000000 + rowid) AS fs
        |      FROM src WHERE value IS NOT NULL GROUP BY 1)
        |ORDER BY id""".stripMargin,
    "e2_canon_float_dict" ->
      """SELECT CAST(row_number() OVER (ORDER BY fs) AS BIGINT) AS id, value
        |FROM (SELECT printf('%g', c_acctbal) AS value, min(c_custkey) AS fs
        |      FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1)
        |ORDER BY id""".stripMargin,
    "x_window_top_orders" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(rank AS BIGINT) AS rank,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |      FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "s10_fts_reconstruct" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  o_orderpriority AS priority_text
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "s13_fts_match" ->
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
         |FROM documents
         |WHERE ${duckContainsAll("text", Seq("spark", "window", "merge"))}
         |ORDER BY doc_id""".stripMargin,
    "s12_fts_term_stats" ->
      s"""SELECT term, CAST(count(*) AS BIGINT) AS df
         |FROM (SELECT doc_id, unnest(list_distinct(${duckTokens("text")})) AS term
         |      FROM documents)
         |GROUP BY term ORDER BY term""".stripMargin,
    "s13_fts_index_match" ->
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id
         |FROM documents
         |WHERE ${duckContainsAll("text", Seq("vector", "hash", "join"))}
         |ORDER BY doc_id""".stripMargin,
    "x_fts_ranked" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(${duckTokens("text")}) AS term FROM documents)
         |  WHERE term IN ('spark', 'vector', 'hash')
         |  GROUP BY doc_id, term),
         |idf AS (
         |  SELECT term,
         |    CAST(((SELECT count(*) FROM documents) * 1000000) // count(DISTINCT doc_id) AS BIGINT) AS idf_scaled
         |  FROM tf GROUP BY term)
         |SELECT CAST(tf.doc_id AS BIGINT) AS doc_id,
         |  CAST(sum(tf.tf * idf.idf_scaled) AS BIGINT) AS score,
         |  CAST(count(DISTINCT tf.term) AS BIGINT) AS terms_hit
         |FROM tf JOIN idf USING (term)
         |GROUP BY tf.doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "x_fts_boolean" -> ParityQueries.ftsBooleanOracle,
    "x_fts_bm25" -> ParityQueries.ftsBm25Oracle,
    "x_fts_snippet" -> ParityQueries.ftsSnippetOracle,
    "x_fts_highlight" -> ParityQueries.ftsHighlightOracle,
    "x_fts_near" -> ParityQueries.ftsNearOracle,
    "x_fts_prefix" -> ParityQueries.ftsPrefixOracle,
    "x_fts_colfilter" -> ParityQueries.ftsColFilterOracle,
    "x_fts_colset_expr" -> ParityQueries.ftsColSetExprOracle,
    "x_fts_near3" -> ParityQueries.ftsNear3Oracle,
    "x_fts_anchor" -> ParityQueries.ftsAnchorOracle,
    "x_fts_unicode" -> ParityQueries.ftsUnicodeOracle,
    "x_u61_term_stats" -> ParityQueries.u61TermStatsOracle,
    "x_span_corrupt" -> CorpusQueries.spanCorruptOracle,
    "x_token_dropout" -> CorpusQueries.tokenDropoutOracle,
    "x_semantic_chunks" -> CorpusQueries.semanticChunksOracle,
    "x_prefix_savings" -> CorpusQueries.prefixSavingsOracle,
    "x_fim_transform" -> CorpusQueries.fimTransformOracle,
    "q1_pricing_summary" -> AggQueries.pricingSummaryOracle,
    "q3_top_revenue_orders" -> AggQueries.topRevenueOrdersOracle,
    "q5_revenue_by_nation" -> AggQueries.revenueByNationOracle,
    "q6_forecast_revenue" -> AggQueries.forecastRevenueOracle,
    "q14_promo_share" -> AggQueries.promoShareOracle,
    "x_rollup_revenue" -> AggQueries.rollupRevenueOracle,
    "x_cube_revenue" -> AggQueries.cubeRevenueOracle,
    "x_distinct_parts" -> AggQueries.distinctPartsOracle,
    "x_approx_distinct_parts" -> AggQueries.approxDistinctPartsOracle,
    "x_approx_length_quantiles" -> CorpusQueries.approxLengthQuantilesOracle,
    "x_heavy_hitters_sketch" -> CorpusQueries.heavyHittersSketchOracle,
    "x_anti_join_customers" -> AggQueries.customersWithoutOrdersOracle,
    "x_dedup_exact" -> DedupQueries.dedupExactOracle,
    "x_dedup_clusters" -> DedupQueries.dedupClustersOracle,
    "x_dedup_keep_best" -> DedupQueries.dedupKeepBestOracle,
    "x_dedup_cluster_sizes" -> DedupQueries.dedupClusterSizesOracle,
    "x_dedup_leakage" -> DedupQueries.dedupLeakageOracle,
    "x_ppjoin_pairs" -> DedupQueries.ppjoinPairsOracle,
    "x_ppjoin_skew_report" -> DedupQueries.ppjoinSkewReportOracle,
    "x_dup_ngram_mass" -> DedupQueries.dupNgramMassOracle,
    "x_dup_span_prune" -> DedupQueries.dupSpanPruneOracle,
    "x_dup_span_prune_incr" -> DedupQueries.dupSpanPruneIncrementalOracle,
    "x_pipeline_scrub" -> DedupQueries.pipelineScrubOracle,
    "x_lsh_recall" -> DedupQueries.lshRecallOracle,
    "x_split_leakage" -> DedupQueries.splitLeakageOracle,
    "x_dedup_savings" -> DedupQueries.dedupSavingsOracle,
    "x_dedup_manifest" -> DedupQueries.dedupManifestOracle,
    "x_dedup_incremental" -> DedupQueries.dedupIncrementalOracle,
    "x_dedup_incremental_near" -> DedupQueries.dedupIncrementalNearOracle,
    "x_minhash_signatures" -> DedupQueries.minhashSignaturesOracle,
    "x_minhash_pairs" -> DedupQueries.minhashPairsOracle,
    "x_simhash" -> DedupQueries.simhashFingerprintsOracle,
    "x_simhash_pairs" -> DedupQueries.simhashPairsOracle,
    "x_ngram_jaccard" -> DedupQueries.ngramJaccardOracle,
    "x_winnow_fingerprints" -> DedupQueries.winnowFingerprintsOracle,
    "x_winnow_pairs" -> DedupQueries.winnowPairsOracle,
    "x_containment_pairs" -> DedupQueries.containmentPairsOracle,
    "x_cdc_chunks" -> DedupQueries.cdcChunksOracle,
    "x_snm_pairs" -> DedupQueries.snmPairsOracle,
    "x_split_assign" -> DedupQueries.splitAssignOracle,
    "x_corpus_report" -> DedupQueries.corpusReportOracle,
    "x_quality_sample" -> DedupQueries.qualitySampleOracle,
    "x_quality_calibrated" -> DedupQueries.qualityCalibratedOracle,
    "x_pack_assign" -> DedupQueries.packAssignOracle,
    "x_pack_attention" -> DedupQueries.packAttentionOracle,
    "x_pack_sequences" -> DedupQueries.packSequencesOracle,
    "x_batch_padding" -> DedupQueries.batchPaddingOracle,
    "x_redact_pii" -> DedupQueries.redactPiiOracle,
    "x_repetition" -> DedupQueries.repetitionReportOracle,
    "x_stratified_sample" -> DedupQueries.stratifiedSampleOracle,
    "x_temperature_sample" -> DedupQueries.temperatureSampleOracle,
    "x_length_quantiles" -> DedupQueries.lengthQuantilesOracle,
    "x_chunk_docs" -> DedupQueries.chunkDocsOracle,
    "x_decontaminate" -> DedupQueries.decontaminateOracle,
    "x_contam_span" -> DedupQueries.contamSpanOracle,
    "x_shared_ngrams" -> CorpusQueries.sharedNgramsOracle,
    "x_freq_score" -> CorpusQueries.freqScoreOracle,
    "x_dsir_select" -> CorpusQueries.dsirSelectOracle,
    "x_ngram_lm_score" -> CorpusQueries.ngramLmScoreOracle,
    "x_negative_samples" -> CorpusQueries.negativeSamplesOracle,
    "x_curriculum_order" -> CorpusQueries.curriculumOrderOracle,
    "x_nb_domain" -> CorpusQueries.nbDomainOracle,
    "x_token_budget_plan" -> CorpusQueries.tokenBudgetPlanOracle,
    "x_topk_two_phase" -> EventQueries.topkTwoPhaseOracle,
    "x_kmv_set_ops" -> CorpusQueries.kmvSetOpsOracle,
    "x_readability" -> CorpusQueries.readabilityOracle,
    "x_profile_columns" -> CorpusQueries.profileColumnsOracle,
    "x_multimodal_windows" -> EventQueries.multimodalWindowsOracle,
    "x_card_numbers" -> DedupQueries.cardNumbersOracle,
    "x_priority_sample" -> CorpusQueries.prioritySampleOracle,
    "x_top_terms" -> CorpusQueries.topTermsOracle,
    "x_cms_freq" -> CorpusQueries.cmsFreqOracle,
    "x_hist_quantiles" -> CorpusQueries.histQuantilesOracle,
    "x_zorder_layout" -> CorpusQueries.zorderLayoutOracle,
    "x_oov_rate" -> CorpusQueries.oovRateOracle,
    "x_vocab_growth" -> CorpusQueries.vocabGrowthOracle,
    "x_corpus_manifest" -> CorpusQueries.corpusManifestOracle,
    "x_manifest_check" -> CorpusQueries.manifestCheckOracle,
    "x_pagerank" -> CorpusQueries.pagerankOracle,
    "x_token_fertility" -> CorpusQueries.tokenFertilityOracle,
    "x_mix_drift" -> CorpusQueries.mixDriftOracle,
    "x_corpus_diff" -> CorpusQueries.corpusDiffOracle,
    "x_length_deciles" -> CorpusQueries.lengthDecilesOracle,
    "x_url_filter" -> CorpusQueries.urlFilterOracle,
    "x_url_dedup" -> CorpusQueries.urlDedupOracle,
    "x_shard_skew" -> CorpusQueries.shardSkewOracle,
    "x_token_mass_median" -> CorpusQueries.tokenMassMedianOracle,
    "x_bloom_membership" -> CorpusQueries.bloomMembershipOracle,
    "x_corpus_shuffle" -> CorpusQueries.corpusShuffleOracle,
    "x_para_dedup" -> CorpusQueries.paraDedupOracle,
    "x_embed_quantize" -> SimilarityQueries.embedQuantizeOracle,
    "x_mixture_sample" -> CorpusQueries.mixtureSampleOracle,
    "x_epoch_shards" -> CorpusQueries.epochShardsOracle,
    "x_interleave_plan" -> CorpusQueries.interleavePlanOracle,
    "x_length_gini" -> CorpusQueries.lengthGiniOracle,
    "x_source_quota" -> CorpusQueries.sourceQuotaOracle,
    "x_vocab_coverage" -> CorpusQueries.vocabCoverageOracle,
    "x_c4_line_filter" -> CurationQueries.c4LineFilterOracle,
    "x_boilerplate_strip" -> CurationQueries.boilerplateStripOracle,
    "x_dedup_lines_doc" -> CurationQueries.dedupLinesDocOracle,
    "x_gopher_quality" -> CurationQueries.gopherQualityOracle,
    "x_tfidf_topk" -> CurationQueries.tfidfTopkOracle,
    "x_curation_verdict" -> CurationQueries.curationVerdictOracle,
    "x_keywords" -> CurationQueries.keywordsOracle,
    "x_html_strip" -> CurationQueries.htmlStripOracle,
    "x_markdown_strip" -> CurationQueries.markdownStripOracle,
    "x_mojibake" -> CurationQueries.mojibakeOracle,
    "x_code_prose" -> CurationQueries.codeProseOracle,
    "x_chat_validate" -> CurationQueries.chatValidateOracle,
    "x_passage_rank" -> CurationQueries.passageRankOracle,
    "x_curation_by_source" -> CurationQueries.curationBySourceOracle,
    "x_blocklist" -> CurationQueries.blocklistOracle,
    "x_turn_dedup" -> CurationQueries.turnDedupOracle,
    "x_sft_loss_mask" -> CurationQueries.sftLossMaskOracle,
    "x_sft_pipeline" -> CurationQueries.sftPipelineOracle,
    "x_preference_pairs" -> CurationQueries.preferencePairsOracle,
    "x_soft_dedup_weights" -> DedupQueries.softDedupWeightsOracle,
    "x_k_anonymity" -> CurationQueries.kAnonymityOracle,
    "x_pipeline_e2e" -> CurationQueries.pipelineE2eOracle,
    "x_semdedup" -> SimilarityQueries.semDedupOracle,
    "x_kmv_distinct" -> AnalyticsQueries.kmvDistinctOracle,
    "x_edit_verify" -> AnalyticsQueries.editVerifyOracle,
    "x_script_mix" -> AnalyticsQueries.scriptMixOracle,
    "x_collocations" -> AnalyticsQueries.collocationsOracle,
    "x_pivot_sources" -> AnalyticsQueries.pivotSourcesOracle,
    "x_corr_stats" -> AnalyticsQueries.corrStatsOracle,
    "x_bpe_merges" -> AnalyticsQueries.bpeMergesOracle,
    "x_bpe_tokenize" -> AnalyticsQueries.bpeTokenizeOracle,
    "x_bpe_compression" -> AnalyticsQueries.bpeCompressionOracle,
    "x_mad_outliers" -> AnalyticsQueries.madOutliersOracle,
    "x_length_histogram" -> AnalyticsQueries.lengthHistogramOracle,
    "x_domain_cap" -> AnalyticsQueries.domainCapOracle,
    "x_rank_fusion" -> AnalyticsQueries.rankFusionOracle,
    "x_events_latest" -> EventQueries.eventsLatestOracle,
    "x_events_dense_hourly" -> EventQueries.denseHourlyOracle,
    "x_kmv_sliding" -> EventQueries.kmvSlidingOracle,
    "x_events_props" -> EventQueries.eventsPropsOracle,
    "x_events_trend" -> EventQueries.eventsTrendOracle,
    "x_winsor_means" -> AnalyticsQueries.winsorMeansOracle,
    "x_token_cdf" -> AnalyticsQueries.tokenCdfOracle,
    "x_dedup_recall" -> AnalyticsQueries.dedupRecallOracle,
    "x_lang_id" -> DedupQueries.langIdOracle,
    "x_lang_id_ngram" -> CorpusQueries.langIdNgramOracle,
    "x_normalize_text" -> CorpusQueries.normalizeTextOracle,
    "x_quality" -> DedupQueries.qualityOracle,
    "x_token_counts" -> DedupQueries.tokenCountsOracle,
    "x_fingerprints" -> DedupQueries.fingerprintsOracle,
    "x_ann_topk" -> SimilarityQueries.annTopKOracle,
    "x_hard_negatives" -> SimilarityQueries.hardNegativesOracle,
    "x_ann_ivf" -> SimilarityQueries.annIvfOracle,
    "x_ann_recall" -> SimilarityQueries.annRecallOracle,
    "x_matryoshka_recall" -> SimilarityQueries.matryoshkaRecallOracle,
    "x_rand_project" -> SimilarityQueries.randProjectOracle,
    "x_rp_recall" -> SimilarityQueries.rpRecallOracle,
    "x_pq_codes" -> SimilarityQueries.pqCodesOracle,
    "x_pq_recall" -> SimilarityQueries.pqRecallOracle,
    "x_ann_lsh" -> SimilarityQueries.annLshOracle,
    "x_embed_neardups" -> SimilarityQueries.embedNearDupsOracle,
    "x_embed_centroids" -> SimilarityQueries.embedCentroidsOracle,
    "x_kmeans_clusters" -> SimilarityQueries.kmeansClustersOracle,
    "x_cluster_topics" -> SimilarityQueries.clusterTopicsOracle,
    "x_ann_ivf_trained" -> SimilarityQueries.annIvfTrainedOracle,
    "x_ann_ivfpq" -> SimilarityQueries.annIvfPqOracle,
    "x_ann_ivfpq_recall" -> SimilarityQueries.ivfPqRecallOracle,
    "x_events_asof" -> EventQueries.asofJoinOracle,
    "x_events_asof_exec" -> EventQueries.asofJoinExecOracle,
    "x_events_asof_nearest" -> EventQueries.asofNearestOracle,
    "x_events_asof_nearest_exec" -> EventQueries.asofNearestExecOracle,
    "x_events_range_join" -> EventQueries.rangeJoinOracle,
    "x_events_interval_overlap" -> EventQueries.intervalOverlapOracle,
    "x_events_retention" -> EventQueries.retentionOracle,
    "x_events_funnel" -> EventQueries.funnelOracle,
    "x_events_paths" -> EventQueries.eventPathsOracle,
    "x_events_anomaly" -> EventQueries.eventsAnomalyOracle,
    "x_events_transitions" -> EventQueries.eventTransitionsOracle,
    "x_join_skew_report" -> EventQueries.joinSkewReportOracle,
    "x_multimodal_resize" -> EventQueries.multimodalResizeOracle,
    "x_multimodal_crops" -> EventQueries.multimodalCropsOracle,
    "x_events_tumbling" -> EventQueries.tumblingOracle,
    "x_events_sliding" -> EventQueries.slidingOracle,
    "x_events_sessions" -> EventQueries.sessionsOracle,
    "x_multimodal_decode" -> EventQueries.multimodalDecodeOracle,
    "x_multimodal_frames" -> EventQueries.multimodalFramesOracle,
    "x_multimodal_frame_dedup" -> EventQueries.multimodalFrameDedupOracle,
    "x_multimodal_patches" -> EventQueries.multimodalPatchesOracle,
    "x_multimodal_embed_topk" -> EventQueries.multimodalEmbedTopKOracle,
  )
}
