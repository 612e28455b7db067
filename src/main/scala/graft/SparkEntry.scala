package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.ord.{OrdFixtures, OrdPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has (where SQL-expressible) a matching
  * `oracleSql` entry that DuckDB runs over the same parquet tables; the
  * driver hash-compares the two. Column names, types, and row order are
  * therefore pinned on BOTH sides (see each op's Scaladoc for the
  * semantics source in /root/reference).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The ORD M1 slice (SURVEY §7.3): golden JSON fixtures → explode
    * reactions → posexplode inputs assoc-list → explode components →
    * amount tagged-union + per-dataset counts checked against the
    * envelope's own total_reactions_scraped. */
  def entry(spark: SparkSession): DataFrame = OrdPipeline.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.10
    * extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans / sources / sinks
    "s1_catalog_scan"    -> (Relational.s1CatalogScan _),
    "s2_partition_scan"  -> (Relational.s2PartitionScan _),
    "s3_point_lookup"    -> (Relational.s3PointLookup _),
    "s4_json_decode"     -> (SourceSink.s4JsonDecode _),
    "s5_validated_read"  -> (SourceSink.s5ValidatedRead _),
    "s6_json_sink"       -> (SourceSink.s6JsonSink _),
    // §2.2 projections / filters
    "p1_key_extract"       -> (Relational.p1KeyExtract _),
    "p2_prefix_filter"     -> (Relational.p2PrefixFilter _),
    "p3_type_filter"       -> (Relational.p3TypeFilter _),
    "p4_bool_filter"       -> (Relational.p4BoolFilter _),
    "p5_tagged_union"      -> (Relational.p5TaggedUnion _),
    "p6_restructure"       -> (Relational.p6Restructure _),
    "p7_coalesce_defaults" -> (Relational.p7CoalesceDefaults _),
    // §2.3 joins
    "j1_broadcast_decode" -> (Relational.j1BroadcastDecode _),
    "j1b_map_decode"      -> (Relational.j1bMapDecode _),
    "j2_smj_reassemble"   -> (Relational.j2SmjReassemble _),
    "j3_self_join"        -> (Relational.j3SelfJoin _),
    "j3b_semi"            -> (Relational.j3bSemi _),
    "j3c_anti"            -> (Relational.j3cAnti _),
    // §2.4 flatten / explode
    "f1_posexplode_tabs"    -> (Relational.f1PosexplodeTabs _),
    "f2_explode_components" -> (Relational.f2ExplodeComponents _),
    "f3_explode_ids"        -> (Relational.f3ExplodeIds _),
    "f4_double_flatten"     -> (Relational.f4DoubleFlatten _),
    "f5_explode_outer"      -> (Relational.f5ExplodeOuter _),
    // §2.5 aggregations
    "a1_count_group"   -> (Relational.a1CountGroup _),
    "a2_cond_count"    -> (Relational.a2CondCount _),
    "a3_rollup_totals" -> (Relational.a3RollupTotals _),
    "a4_collect_list"  -> (Relational.a4CollectList _),
    "a5_regex_ceil"    -> (Relational.a5RegexCeil _),
    // §2.6 dedup / set ops
    "d1_dedup_first_seen" -> (Relational.d1DedupFirstSeen _),
    "d2_union_priority"   -> (Relational.d2UnionPriority _),
    // §2.7 sorts / limits
    "l1_limit"        -> (Relational.l1Limit _),
    "l2_offset_limit" -> (Relational.l2OffsetLimit _),
    // §2.9 scalar bundles
    "x1_string_funcs" -> (Relational.x1StringFuncs _),
    "x2_array_funcs"  -> (Relational.x2ArrayFuncs _),
    // §2.10 event-time
    "e4_time_window"    -> (EventOps.e4TimeWindow _),
    "e5_session_window" -> (EventOps.e5SessionWindow _),
    // §2.10 engine mechanisms: streaming parity, dead-letter, partitioned scan
    "e4b_stream_parity"    -> (graft.streaming.EventStreams.e4StreamToTable _),
    "e4l_late_drop"        -> (graft.streaming.EventStreams.e4lLateDrop _),
    "e5b_stream_parity"    -> (graft.streaming.EventStreams.e5StreamToTable _),
    "e1s_stream_dedup"     -> (graft.streaming.EventStreams.e1sStreamDedup _),
    "e1sb_dedup_bounded"   -> (graft.streaming.EventStreams.e1sbDedupBounded _),
    "c5_dead_letter"       -> (graft.streaming.EventStreams.c5DeadLetterStats _),
    "c4_stateful_totals"   -> (graft.streaming.StatefulOps.c4StatefulTotals _),
    "s2b_partition_pruned" -> (graft.sources.PartitionedLayout.prunedScan _),
    // §2.10 LLM-pipeline: dedup / similarity / text analysis / multimodal
    "e1_text_dedup"     -> (TextOps.e1TextDedup _),
    "e1x_dedup_xxhash"  -> (TextOps.e1xTextDedupXx _),
    "e2_cosine_topk"    -> (SimOps.e2CosineTopk _),
    "e2i_ivf_index_scan" -> (graft.sources.IvfLayout.e2iIvfIndexScan _),
    "e2t_trained_ivf"   -> (graft.sources.IvfLayout.e2tTrainedIvfScan _),
    "e2v_ivf_serve"     -> (graft.sources.IvfServe.e2vIvfServe _),
    "e2w_ivf_multiprobe" -> (graft.sources.IvfServe.e2wIvfMultiprobe _),
    "e2a_filtered_ann"  -> (graft.sources.IvfServe.e2aFilteredAnn _),
    "e2x_filtered_multiprobe" -> (graft.sources.IvfServe.e2xFilteredMultiprobe _),
    "e2n_nprobe_sweep"  -> (graft.sources.IvfServe.e2nNprobeSweep _),
    "e2q_adhoc_vectors" -> (graft.sources.IvfServe.e2qAdhocVectors _),
    "e2pq_ivfpq_probe"  -> (graft.sources.IvfServe.e2pqIvfPqProbe _),
    "e2y_recall_policy" -> (graft.sources.IvfServe.e2yRecallPolicy _),
    "e2pw_ivfpq_multiprobe" -> (graft.sources.IvfServe.e2pwIvfPqMultiprobe _),
    "e2px_filtered_pq"  -> (graft.sources.IvfServe.e2pxFilteredPqMultiprobe _),
    "e2f_ivf_fold"      -> (graft.streaming.VecStreams.e2fIvfFoldStream _),
    "e2z_fold_snapshot" -> (graft.streaming.VecStreams.e2zFoldSnapshot _),
    "e2g_drift_gate"    -> (graft.streaming.VecStreams.e2gDriftGate _),
    "e2d_vec_tombstone" -> (graft.streaming.VecStreams.e2dVecTombstone _),
    "e2tm_vec_tier_merge" -> (graft.streaming.VecStreams.e2tmVecTierMerge _),
    "e2u_vec_upsert"    -> (graft.streaming.VecStreams.e2uVecUpsert _),
    "e65b_pq_trained"   -> (SimOps.e65bPqTrainedAnn _),
    "e2b_cosine_lsh"    -> (SimOps.e2bCosineLsh _),
    "e2c_topk_native"   -> (SimOps.e2cTopkNative _),
    "e2r_recall_at_k"   -> (SimOps.e2rRecallAtK _),
    "e2p_lsh_multiprobe" -> (SimOps.e2pLshMultiprobe _),
    "e3_token_counts"   -> (TextOps.e3TokenCounts _),
    "e3b_token_regex"   -> (TextOps.e3bTokenRegex _),
    "e13_embed_neardup" -> (SimOps.e13EmbedNeardup _),
    "e15_funnel"         -> (ClusterOps.e15Funnel _),
    "e16_dedup_clusters" -> (ClusterOps.e16DedupClusters _),
    "e19_dedup_pipeline" -> (ClusterOps.e19DedupPipeline _),
    "e70_curation_pipeline" -> (CurationOps.e70CurationPipeline _),
    "e70b_curation_split"   -> (CurationOps.e70bCurationSplit _),
    "e71_hybrid_rrf"        -> (RetrievalOps.e71HybridRrf _),
    "e71v_hybrid_snapshot"  -> (RetrievalOps.e71vHybridAtSnapshot _),
    "e71f_filtered_hybrid"  -> (RetrievalOps.e71fFilteredHybrid _),
    "e71q_adhoc_hybrid"     -> (RetrievalOps.e71qAdhocHybrid _),
    "e6_minhash_lsh"    -> (SimOps.e6MinhashLsh _),
    "e6s_minhash_stream" -> (graft.streaming.DocStreams.e6sMinhashStream _),
    "e6x_minhash_xx"    -> (SimOps.e6xMinhashXxDups _),
    "e7_simhash"        -> (SimOps.e7Simhash _),
    "e7b_simhash_pairs" -> (SimOps.e7bSimhashPairs _),
    "e8_ngram_jaccard"  -> (SimOps.e8NgramJaccard _),
    "e8h_posting_histogram" -> (SimOps.e8hPostingHistogram _),
    "e33h_candidate_volume" -> (EventOps.e33hCandidateVolume _),
    "e51_event_transitions" -> (EventOps.e51EventTransitions _),
    "e51s_transitions_stream" -> (graft.streaming.StatefulOps.e51sTransitionsStream _),
    "e53_rate_anomaly"      -> (EventOps.e53RateAnomaly _),
    "e54_cms_heavy_hitters" -> (CurationOps.e54CmsHeavyHitters _),
    "e54x_cms_xx_gate"      -> (CurationOps.e54xCmsXxGate _),
    "e55_bpe_encode"        -> (CurationOps.e55BpeEncode _),
    "e56_source_overlap"    -> (CurationOps.e56SourceOverlap _),
    "e9_lang_id"        -> (TextOps.e9LangId _),
    "e10_quality_score" -> (TextOps.e10QualityScore _),
    "e11_fingerprint"   -> (TextOps.e11Fingerprint _),
    "e11x_fingerprint_xx" -> (TextOps.e11xFingerprintXxGroups _),
    "e12_ann_brute"     -> (SimOps.e12AnnBrute _),
    "e14_hash_sample"    -> (TextOps.e14HashSample _),
    "e17_len_quantiles"  -> (TextOps.e17LengthQuantiles _),
    "e17x_len_quantiles_approx" -> (TextOps.e17xLenQuantilesApprox _),
    "e18_distinct_sketch" -> (EventOps.e18DistinctSketch _),
    "m1_multimodal_meta" -> (TextOps.m1MultimodalMeta _),
    "m2_frame_sample"    -> (TextOps.m2FrameSample _),
    "m4_image_resize"    -> (TextOps.m4ImageResize _),
    "m3_wav_meta"        -> (TextOps.m3WavMeta _),
    "x3_salted_agg"      -> (graft.plans.ScaleJoins.x3SaltedAgg _),
    "x4_bucketed_join"   -> (graft.plans.ScaleJoins.bucketedJoinDemo _),
    // §2.10 LLM-pipeline: curation stages (r7)
    "s7_csv_roundtrip"      -> (SourceSink.s7CsvRoundtrip _),
    "e20_decontaminate"     -> (CurationOps.e20Decontaminate _),
    "e10b_gopher_repetition" -> (CurationOps.e10bGopherRepetition _),
    "e21_pii_scrub"         -> (CurationOps.e21PiiScrub _),
    "e22_seq_pack"          -> (CurationOps.e22SeqPack _),
    "e14b_stratified_sample" -> (CurationOps.e14bStratifiedSample _),
    "e23_ngram_stats"       -> (CurationOps.e23NgramStats _),
    "e24_mixture_weights"   -> (CurationOps.e24MixtureWeights _),
    "e10s_quality_stream"   -> (graft.streaming.DocStreams.e10sQualityStream _),
    // §2.10 LLM-pipeline: curation stages (r8)
    "e25_asof_join"         -> (EventOps.e25AsofJoin _),
    "e26_shard_manifest"    -> (CurationOps.e26ShardManifest _),
    "e27_tfidf_topk"        -> (CurationOps.e27TfidfTopk _),
    "e28_passage_dedup"     -> (CurationOps.e28PassageDedup _),
    "e20b_bloom_decon"      -> (CurationOps.e20bBloomDecon _),
    "e29_stream_join"       -> (graft.streaming.EventStreams.e29StreamToTable _),
    "e29b_stream_left_join" -> (graft.streaming.EventStreams.e29bStreamLeftToTable _),
    "e30_sparse_cosine"     -> (SimOps.e30SparseCosine _),
    "e31_quant_ann"         -> (SimOps.e31QuantAnn _),
    "e32_centroid_agg"      -> (SimOps.e32CentroidAgg _),
    "e34_centroid_keeper"   -> (SimOps.e34CentroidKeeper _),
    "e35_bm25_topk"         -> (CurationOps.e35Bm25Topk _),
    "e35s_bm25_serve"       -> (graft.sources.LexIndex.e35sBm25Serve _),
    "e35a_filtered_bm25"    -> (graft.sources.LexIndex.e35aFilteredBm25 _),
    "e35q_adhoc_terms"      -> (graft.sources.LexIndex.e35qAdhocTerms _),
    "e35p_phrase_query"     -> (graft.sources.LexIndex.e35pPhraseQuery _),
    "e35w_prefix_query"     -> (graft.sources.LexIndex.e35wPrefixQuery _),
    "e35f_postings_fold"    -> (graft.streaming.LexStreams.e35fPostingsFold _),
    "e35z_lex_snapshot"     -> (graft.streaming.LexStreams.e35zLexSnapshot _),
    "e35g_merge_gate"       -> (graft.streaming.LexStreams.e35gMergeGate _),
    "e35d_lex_tombstone"    -> (graft.streaming.LexStreams.e35dLexTombstone _),
    "e35u_lex_upsert"       -> (graft.streaming.LexStreams.e35uLexUpsert _),
    "e35t_tier_merge"       -> (graft.streaming.LexStreams.e35tTierMerge _),
    "e36_epoch_order"       -> (CurationOps.e36EpochOrder _),
    "e37_pmi_cooc"          -> (CurationOps.e37PmiCooc _),
    "e38_lm_quality"        -> (CurationOps.e38LmQuality _),
    "e39_domain_gate"       -> (CurationOps.e39DomainGate _),
    "e40_kmeans_train"      -> (SimOps.e40KmeansTrain _),
    "e41_chunk_overlap"     -> (CurationOps.e41ChunkOverlap _),
    "e41b_chunk_generator"  -> (CurationOps.e41bChunkGenerator _),
    "e42_split_leakage"     -> (CurationOps.e42SplitLeakage _),
    "e43_snapshot_diff"     -> (CurationOps.e43SnapshotDiff _),
    "e57_scd2_merge"        -> (CurationOps.e57Scd2Merge _),
    "e44_dsir_weights"      -> (CurationOps.e44DsirWeights _),
    "e45_novelty"           -> (CurationOps.e45Novelty _),
    "e46_embed_outliers"    -> (SimOps.e46EmbedOutliers _),
    "e47_intradoc_dedup"    -> (CurationOps.e47IntradocDedup _),
    "e48_bpe_merge"         -> (CurationOps.e48BpeMerge _),
    "e48b_bpe_train"        -> (CurationOps.e48bBpeTrain _),
    "e49_semantic_decon"    -> (SimOps.e49SemanticDecon _),
    "e50_filter_attribution" -> (CurationOps.e50FilterAttribution _),
    "e52_temp_upsample"     -> (CurationOps.e52TempUpsample _),
    "e33_range_join"        -> (EventOps.e33RangeJoin _),
    // §2.10 LLM-pipeline: curation stages (r10, second wave)
    "e48c_bpe_delta"        -> (CurationOps.e48cBpeDelta _),
    "e53b_dead_hours"       -> (EventOps.e53bDeadHours _),
    "e58_domain_cap"        -> (CurationOps.e58DomainCap _),
    "e59_priority_sample"   -> (CurationOps.e59PrioritySample _),
    "e60_edit_confirm"      -> (SimOps.e60EditConfirm _),
    "e61_retention_cohorts" -> (EventOps.e61RetentionCohorts _),
    "e61b_incr_retention"   -> (EventOps.e61bIncrRetention _),
    "e61s_retention_stream" -> (graft.streaming.EventStreams.e61sStreamRetention _),
    // §2.10 LLM-pipeline: curation stages (r10, third wave)
    "e62_zorder_scan"       -> (graft.sources.ZOrderLayout.e62ZorderScan _),
    "e63_incr_agg"          -> (EventOps.e63IncrAgg _),
    "e63s_incr_stream"      -> (graft.streaming.EventStreams.e63sStreamIncrAgg _),
    "e72_snapshot_read"     -> (graft.streaming.SnapshotFolds.e72SnapshotRead _),
    "e64_pagerank"          -> (ClusterOps.e64Pagerank _),
    "e65_pq_ann"            -> (SimOps.e65PqAnn _),
    "e66_hll_state_merge"   -> (EventOps.e66HllStateMerge _),
    "e67_cluster_split"     -> (ClusterOps.e67ClusterSplit _),
    "e68_hist_quantiles"    -> (EventOps.e68HistQuantiles _),
    "m5_audio_energy"       -> (TextOps.m5AudioEnergy _),
    // ORD golden-data pipeline (SURVEY §7.2 M1/M3, over target/fixtures)
    "ord_envelope_check"   -> (OrdPipeline.ordEnvelopeCheck _),
    "ord_f1_tabs"          -> (OrdPipeline.ordF1Tabs _),
    "ord_components"       -> (OrdPipeline.ordComponents _),
    "ord_id_types"         -> (OrdPipeline.ordIdTypes _),
    "ord_roles_histogram"  -> (OrdPipeline.ordRolesHistogram _),
    "ord_j1_role_encode"   -> (OrdPipeline.ordJ1RoleEncode _),
    "ord_amount_stats"     -> (OrdPipeline.ordAmountStats _),
    "ord_f5_measurements"  -> (OrdPipeline.ordF5Measurements _),
    "ord_s4_decode"        -> (OrdPipeline.ordS4Decode _),
    "ord_a4_renest"        -> (OrdPipeline.ordA4Renest _),
    "ord_s6_sink"          -> (OrdPipeline.ordS6Sink _),
    "ord_s6b_raw_sink"     -> (OrdPipeline.ordS6bRawSink _),
    "ord_v1_downgrade"     -> (OrdPipeline.ordV1Downgrade _),
    "ord_units_diverge"    -> (OrdPipeline.ordUnitsDiverge _),
  )

  private val ordNested = s"${OrdFixtures.nestedPath}/*.parquet"
  private val ordRaw = s"${OrdFixtures.rawPath}/*.parquet"

  /** Shared DuckDB CTE prefix: dataset → reaction → tab → component
    * flatten over the nested ORD fixture (posexplode ≡ 1-based DuckDB
    * lambda index - 1). */
  private def ordCte: String =
    s"""WITH rx AS (
       |  SELECT file, dataset_id, unnest(reactions) AS r
       |  FROM read_parquet('$ordNested')),
       |t AS (
       |  SELECT file, dataset_id, r.reaction_id AS reaction_id,
       |    unnest(list_transform(r.inputsMap, (x, i) -> {'p': i - 1, 't': x})) AS u
       |  FROM rx),
       |c AS (
       |  SELECT file, dataset_id, reaction_id,
       |    CAST(u.p AS INTEGER) AS tab_pos, u.t.tab_name AS tab_name,
       |    unnest(u.t.components) AS comp
       |  FROM t)""".stripMargin

  /** DuckDB oracle for e48b: `n` chained greedy-merge iterations
    * generated from one CTE template — the same four relations the
    * 2-iteration e48 oracle spells out by hand (adjacent pairs, argmax,
    * aggregate stats, literal-replace rewrite), chained m0 → m`n`.
    * Token totals use the engine's Σlen = Σpairs + n_docs identity so
    * each iteration needs only its pair aggregate, keeping every m_k
    * referenced exactly twice (p_{k+1} and m_{k+1}). The corpus-sized
    * CTEs are AS MATERIALIZED: DuckDB's default inlining re-expands
    * the doubly-referenced chain exponentially (measured 29.7 s →
    * 0.96 s at sf0.01, 10.1 s at 500k docs, identical rows). */
  private[graft] def e48bOracleSql(n: Int): String = {
    val header =
      """WITH d0 AS (SELECT doc_id,
        |    list_filter(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> regexp_matches(x, '^[a-z0-9]+$')) AS w
        |  FROM documents),
        |m0 AS MATERIALIZED (SELECT doc_id, w FROM d0 WHERE len(w) > 0),
        |nd AS (SELECT count(*) AS n_docs FROM m0)""".stripMargin
    val iters = (1 to n + 1).flatMap { k =>
      val p =
        s"""p$k AS MATERIALIZED (SELECT w[CAST(i.i AS INTEGER)] AS a,
           |    w[CAST(i.i AS INTEGER) + 1] AS b, count(*) AS n
           |  FROM m${k - 1}, UNNEST(range(1, len(w))) AS i(i) GROUP BY 1, 2)""".stripMargin
      val agg =
        s"""a$k AS (SELECT CAST(sum(n) AS BIGINT) AS occ,
           |  count(*) AS vocab_pairs FROM p$k)""".stripMargin
      if (k <= n) {
        val b = s"b$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1)"
        val m =
          s"""m$k AS MATERIALIZED (SELECT doc_id,
             |    list_filter(string_split(
             |      replace('||' || array_to_string(w, '||') || '||',
             |        '|' || b$k.a || '||' || b$k.b || '|',
             |        '|' || b$k.a || '_' || b$k.b || '|'), '||'),
             |      x -> x <> '') AS w
             |  FROM m${k - 1}, b$k)""".stripMargin
        Seq(p, b, agg, m)
      } else Seq(p, agg)
    }
    val rows = (1 to n).map { k =>
      s"""SELECT $k AS iter, b$k.a, b$k.b, b$k.n AS n_occ,
         |  a$k.occ - a${k + 1}.occ AS n_merged,
         |  a$k.occ + nd.n_docs AS toks_before,
         |  a${k + 1}.occ + nd.n_docs AS toks_after,
         |  a$k.vocab_pairs
         |FROM b$k, a$k, a${k + 1}, nd""".stripMargin
    }
    // the ORDER BY must wrap the WHOLE union from a subquery: a bare
    // trailing ORDER BY after a UNION ALL chain binds to the last
    // operand in DuckDB, which LOOKED ordered only while
    // preserve_insertion_order kept operand order — under the r13
    // spill knob (preserve_insertion_order=false) the operands
    // interleave and the compare read it as a value mismatch
    (header +: iters).mkString(",\n") + ",\nu AS (\n" +
      rows.mkString("\nUNION ALL\n") + ")\nSELECT * FROM u ORDER BY iter"
  }

  /** Shared by e41 (HOF build) and e41b (native Generator): both
    * declared forms must hash-match the SAME chunk recomputation —
    * the generator is an execution-strategy change, not a semantics
    * change, and the shared oracle states that. */
  private val e41OracleSql: String =
    """WITH w AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |t AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n_tok,
      |    CAST((greatest(len(w) - 16, 0) + 11) // 12 + 1 AS INTEGER) AS n_chunks
      |  FROM w WHERE len(w) > 0),
      |ch AS (SELECT doc_id, w, n_tok, n_chunks, CAST(u.c AS INTEGER) AS chunk_id,
      |    CAST(u.c * 12 AS INTEGER) AS start_tok,
      |    CAST(least(16, n_tok - u.c * 12) AS INTEGER) AS n_tok_chunk
      |  FROM t, UNNEST(range(n_chunks)) AS u(c))
      |SELECT doc_id, chunk_id, start_tok, n_tok_chunk,
      |  CAST(('0x' || substr(md5(array_to_string(
      |    list_slice(w, start_tok + 1, start_tok + n_tok_chunk), ' ')), 1, 8))
      |    AS BIGINT) AS chunk_fp,
      |  n_tok, n_chunks
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (s6_json_sink) get the
    * driver's weaker rows-only check. */
  /** Shared by e6 (batch) and e6s (streaming ingest): both declared
    * forms must hash-match the SAME exact MinHash+LSH recomputation —
    * batch/stream parity stated as one oracle. */
  // e63/e63s: the oracle is the FULL recompute the incremental engine
  // path exists to avoid — grouped through the same (type, day) partial
  // grain so the algebraic merge is what's being checked
  private val e63OracleSql: String =
    """WITH p AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |    min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
      |    max(CAST(round(value * 100) AS BIGINT)) AS max_cents
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
      |  min(min_cents) AS min_cents, max(max_cents) AS max_cents,
      |  count(*) AS n_day_partials,
      |  round(CAST(sum(sum_cents) AS DOUBLE) / sum(n), 6) AS avg_cents
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin

  private val e61OracleSql: String =
    """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
      |c AS (SELECT cohort,
      |    CAST(date_diff('day', cohort, wk) // 7 AS INTEGER) AS wk_offset,
      |    count(*) AS n_active
      |  FROM ev JOIN f USING (user_id) GROUP BY 1, 2),
      |s AS (SELECT *, max(CASE WHEN wk_offset = 0 THEN n_active END)
      |    OVER (PARTITION BY cohort) AS cohort_size FROM c)
      |SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_start, wk_offset,
      |  n_active, cohort_size,
      |  round(n_active * 1.0 / cohort_size, 6) AS retention
      |FROM s ORDER BY cohort_start, wk_offset""".stripMargin

  private val e2OracleSql: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, list_dot_product(v, v) AS nrm FROM e),
      |q AS (SELECT vec_id AS q_id, label, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
      |j AS (SELECT q_id, c.vec_id AS cand_id,
      |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
      |  FROM q JOIN n c ON q.label = c.label AND c.vec_id <> q.q_id),
      |r AS (SELECT *, CAST(row_number() OVER
      |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
      |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
      |ORDER BY q_id, "rank"""".stripMargin

  /** Shared DuckDB replay of the trained-IVF SERVE chain
    * (graft.sources.IvfServe / the e2f fold stream): seed k=64 coarse
    * centroids on the training base (`seedPred` within `basePred`),
    * ONE Lloyd recompute round (the e65b discipline — half e2t's CTE
    * chain), assign the WHOLE corpus under the trained centroids (the
    * index partitioning), pick each query's probe cell(s), exact
    * in-cell rescore, top-3. The engine persists the trained layout
    * under `ensure` and times only the probe; the oracle replays the
    * build too, so staleness or training drift is a hash miss.
    * `nprobe > 1` ranks ALL trained cells per query by (rounded d2,
    * cid) and sweeps the nearest `nprobe`; `candLabelFilter` pushes
    * the filtered-ANN attribute predicate into the candidate side. */
  /** The trained-serve BUILD replay shared by every IVF oracle: seed
    * k=64 coarse centroids on the training base, one Lloyd recompute,
    * assign the WHOLE corpus under the trained centroids. Ends at the
    * `asg` CTE (vec_id, label, v, cell, nrm); `c1` (the trained
    * centroids) stays visible for probe-cell ranking. */
  private def ivfChainPrefix(basePred: String, seedPred: String): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v FROM e WHERE $basePred),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid,
       |    list_transform(v, x -> round(x, 6)) AS c
       |  FROM b WHERE $seedPred),
       |s1 AS (SELECT b.vec_id, b.v, c0.cid,
       |    round(list_dot_product(
       |      list_transform(b.v, (x, i) -> x - c0.c[i]),
       |      list_transform(b.v, (x, i) -> x - c0.c[i])), 6) AS d2
       |  FROM b CROSS JOIN c0),
       |a1 AS (SELECT vec_id, v, cid FROM (SELECT *, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM s1) WHERE rn = 1),
       |u1 AS (SELECT cid, CAST(u.i AS INTEGER) AS pos,
       |    v[CAST(u.i AS INTEGER) + 1] AS x
       |  FROM a1, UNNEST(range(len(v))) AS u(i)),
       |c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT cid, pos, round(avg(x), 6) AS m FROM u1 GROUP BY cid, pos)
       |  GROUP BY cid),
       |sf AS (SELECT e.vec_id, e.label, e.v, c1.cid,
       |    round(list_dot_product(
       |      list_transform(e.v, (x, i) -> x - c1.c[i]),
       |      list_transform(e.v, (x, i) -> x - c1.c[i])), 6) AS d2
       |  FROM e CROSS JOIN c1),
       |asg AS (SELECT vec_id, label, v, cid AS cell, list_dot_product(v, v) AS nrm
       |  FROM (SELECT *, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM sf) WHERE rn = 1)""".stripMargin

  private def ivfServeOracleSql(basePred: String, seedPred: String,
      nprobe: Int, candLabelFilter: Boolean,
      extraCandPred: String = "", snapshotIdOut: Option[Long] = None): String = {
    val candPred = (if (candLabelFilter) " AND c.label < 5" else "") +
      (if (extraCandPred.nonEmpty) s" AND ($extraCandPred)" else "")
    val candLabelCol = if (candLabelFilter) "c.label AS cand_label," else ""
    val labelOut = if (candLabelFilter) "cand_label, " else ""
    val snapOut = snapshotIdOut
      .map(id => s", CAST($id AS BIGINT) AS snapshot_id").getOrElse("")
    val qCte =
      if (nprobe == 1)
        "q AS (SELECT vec_id AS q_id, v AS qv, cell, nrm AS qn FROM asg WHERE vec_id < 8)"
      else
        s"""q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM asg WHERE vec_id < 8),
           |q AS (SELECT q_id, qv, qn, cid AS cell FROM (
           |  SELECT q0.q_id, q0.qv, q0.qn, c1.cid,
           |    row_number() OVER (PARTITION BY q0.q_id ORDER BY
           |      round(list_dot_product(
           |        list_transform(q0.qv, (x, i) -> x - c1.c[i]),
           |        list_transform(q0.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
           |  FROM q0 CROSS JOIN c1) WHERE rn <= $nprobe)""".stripMargin
    s"""${ivfChainPrefix(basePred, seedPred)},
       |$qCte,
       |j AS (SELECT q_id, c.vec_id AS cand_id, $candLabelCol
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM q JOIN asg c ON q.cell = c.cell AND c.vec_id <> q.q_id$candPred),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
       |SELECT q_id, "rank", cand_id, ${labelOut}cos_sim$snapOut FROM r WHERE "rank" <= 3
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** e2u's oracle: the trained chain (centroids from the ORIGINAL
    * pre-update base — training happened before the updates arrived)
    * with the CANDIDATE corpus re-assigned from the LATEST-VERSION
    * embeddings (the declared negation applied in SQL); queries keep
    * their original vectors and original probe cells (the request owns
    * its vector — the e2d stance). A stale served version, a dropped
    * update, or an update routed by anything but the frozen quantizer
    * is a hash miss. */
  private val e2uOracleSql: String = {
    import graft.streaming.LexStreams.{UpdMod, UpdRes, UpdLo, UpdHi}
    s"""${ivfChainPrefix("vec_id >= 16", "vec_id < 80")},
       |e2 AS (SELECT vec_id, label,
       |    CASE WHEN vec_id % $UpdMod = $UpdRes AND vec_id > $UpdLo AND vec_id < $UpdHi
       |      THEN list_transform(v, x -> -x) ELSE v END AS v
       |  FROM e),
       |sf2 AS (SELECT e2.vec_id, e2.label, e2.v, c1.cid,
       |    round(list_dot_product(
       |      list_transform(e2.v, (x, i) -> x - c1.c[i]),
       |      list_transform(e2.v, (x, i) -> x - c1.c[i])), 6) AS d2
       |  FROM e2 CROSS JOIN c1),
       |asg2 AS (SELECT vec_id, label, v, cid AS cell, list_dot_product(v, v) AS nrm
       |  FROM (SELECT *, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM sf2) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, cell, nrm AS qn FROM asg WHERE vec_id < 8),
       |j AS (SELECT q_id, c.vec_id AS cand_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM q JOIN asg2 c ON q.cell = c.cell AND c.vec_id <> q.q_id),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
       |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** e2q's oracle: the trained chain with the query relation replaced
    * by the DECLARED AD-HOC VECTOR LITERALS (generated from
    * IvfServe.AdhocVecQueries — single-decimal-digit components, so the
    * SQL literal and the Scala double parse to the same IEEE value),
    * routed to their 4 nearest trained cells, exact in-cell rescore,
    * top-3. No self-exclusion: an ad-hoc query is not a corpus row. */
  private val e2qOracleSql: String = {
    val values = graft.sources.IvfServe.AdhocVecQueries
      .map { case (qid, qv) =>
        s"(CAST($qid AS BIGINT), [${qv.map(_.toString).mkString(", ")}]::DOUBLE[])"
      }.mkString(",\n       |  ")
    s"""${ivfChainPrefix("TRUE", "vec_id < 64")},
       |q0(q_id, qv) AS (VALUES $values),
       |qq AS (SELECT q_id, qv, list_dot_product(qv, qv) AS qn FROM q0),
       |qp AS (SELECT q_id, qv, qn, cid AS cell FROM (
       |  SELECT qq.q_id, qq.qv, qq.qn, c1.cid,
       |    row_number() OVER (PARTITION BY qq.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(qq.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(qq.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM qq CROSS JOIN c1) WHERE rn <= ${graft.sources.IvfServe.NProbe}),
       |j AS (SELECT q_id, c.vec_id AS cand_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM qp JOIN asg c ON qp.cell = c.cell),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
       |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** e2n's oracle: the trained chain, every query's cells ranked to
    * depth 8, per-(query, probe-rank) top-3, the sweep lifted by a
    * correlated UNNEST (a rank-r survivor serves every nprobe ≥ r),
    * hits against the full-corpus exact top-3, and the per-nprobe
    * cells/candidate-row counts — the engine's whole declared table. */
  private val e2nOracleSql: String =
    s"""${e2nCurveCtes}
       |SELECT nprobe, n_cells, n_cand_rows, n_hits, recall_at3
       |FROM curve ORDER BY nprobe""".stripMargin

  /** The e2n sweep as a CTE chain ending at `curve` (one row per
    * nprobe 1..8) with the scored relation `j` still visible — shared
    * by e2n's oracle and e2y's policy replay (never self-reference
    * oracleSql entries — the e70 hoisting precedent). */
  private def e2nCurveCtes: String =
    s"""${ivfChainPrefix("TRUE", "vec_id < 64")},
       |q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM asg WHERE vec_id < 8),
       |pc AS (SELECT q_id, qv, qn, cid AS cell, CAST(rn AS INTEGER) AS pr FROM (
       |  SELECT q0.q_id, q0.qv, q0.qn, c1.cid,
       |    row_number() OVER (PARTITION BY q0.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM q0 CROSS JOIN c1) WHERE rn <= 8),
       |j AS (SELECT pc.q_id, pc.pr, c.vec_id AS cand_id,
       |    round(list_dot_product(pc.qv, c.v) / (sqrt(pc.qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM pc JOIN asg c ON pc.cell = c.cell AND c.vec_id <> pc.q_id),
       |pcell AS (SELECT q_id, pr, cand_id, cos_sim FROM (
       |  SELECT j.*, row_number() OVER
       |    (PARTITION BY q_id, pr ORDER BY cos_sim DESC, cand_id) AS rk FROM j)
       |  WHERE rk <= 3),
       |sw AS (SELECT q_id, CAST(u.np AS INTEGER) AS nprobe, cand_id, cos_sim
       |  FROM pcell, UNNEST(range(pr, 9)) AS u(np)),
       |t3 AS (SELECT q_id, nprobe, cand_id FROM (
       |  SELECT sw.*, row_number() OVER
       |    (PARTITION BY q_id, nprobe ORDER BY cos_sim DESC, cand_id) AS rk FROM sw)
       |  WHERE rk <= 3),
       |ex AS (SELECT q_id, cand_id FROM (
       |  SELECT q0.q_id, c.vec_id AS cand_id, row_number() OVER
       |    (PARTITION BY q0.q_id ORDER BY
       |      round(list_dot_product(q0.qv, c.v) / (sqrt(q0.qn) * sqrt(c.nrm)), 6) DESC,
       |      c.vec_id) AS rk
       |  FROM q0 CROSS JOIN asg c WHERE c.vec_id <> q0.q_id) WHERE rk <= 3),
       |h AS (SELECT nprobe, count(*) AS n_hits FROM t3
       |  JOIN ex ON t3.q_id = ex.q_id AND t3.cand_id = ex.cand_id GROUP BY nprobe),
       |cl AS (SELECT CAST(u.np AS INTEGER) AS nprobe, count(DISTINCT cell) AS n_cells
       |  FROM pc, UNNEST(range(pr, 9)) AS u(np) GROUP BY 1),
       |cr AS (SELECT CAST(u.np AS INTEGER) AS nprobe, count(*) AS n_cand_rows
       |  FROM j, UNNEST(range(pr, 9)) AS u(np) GROUP BY 1),
       |nq AS (SELECT count(*) AS n FROM q0),
       |curve AS (SELECT cl.nprobe, cl.n_cells, cr.n_cand_rows,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  round(coalesce(h.n_hits, 0) / (3.0 * nq.n), 6) AS recall_at3
       |FROM cl JOIN cr ON cl.nprobe = cr.nprobe
       |LEFT JOIN h ON h.nprobe = cl.nprobe CROSS JOIN nq)""".stripMargin

  /** e2y's oracle: e2n's whole curve replay, the per-target argmin
    * (minimal nprobe meeting the target, SweepMax fallback), and the
    * multiprobe serve replayed at each chosen width from the same
    * scored relation `j`. */
  private val e2yOracleSql: String =
    s"""$e2nCurveCtes,
       |tgt AS (SELECT CAST(t.target AS DOUBLE) AS target
       |  FROM (VALUES (0.5), (0.75), (0.85), (0.95)) AS t(target)),
       |pick AS (SELECT t.target, coalesce(
       |    (SELECT min(c.nprobe) FROM curve c WHERE c.recall_at3 >= t.target),
       |    (SELECT max(nprobe) FROM curve)) AS chosen_nprobe
       |  FROM tgt t),
       |sel AS (SELECT p.target, p.chosen_nprobe, c.recall_at3 AS achieved_recall,
       |    c.n_cells, c.n_cand_rows
       |  FROM pick p JOIN curve c ON c.nprobe = p.chosen_nprobe),
       |srv AS (SELECT s.target, s.chosen_nprobe, s.achieved_recall,
       |    s.n_cells, s.n_cand_rows, j.q_id, j.cand_id, j.cos_sim,
       |    row_number() OVER (PARTITION BY s.target, j.q_id
       |      ORDER BY j.cos_sim DESC, j.cand_id) AS rk
       |  FROM sel s JOIN j ON j.pr <= s.chosen_nprobe)
       |SELECT target, chosen_nprobe, achieved_recall, n_cells, n_cand_rows,
       |  q_id, CAST(rk AS INTEGER) AS "rank", cand_id, cos_sim
       |FROM srv WHERE rk <= 3
       |ORDER BY target, q_id, rk""".stripMargin

  /** e71's oracle: the trained-IVF chain (vector leg: q_id < 3 routed
    * to their 4 nearest trained cells, in-cell exact rescore, top-10)
    * beside the full BM25 replay (lexical leg: each query doc's top-8
    * terms by in-doc tf, e35's scoring formula, top-10), fused by
    * reciprocal-rank 1/(60+rank) with absent legs contributing 0 —
    * both retrievers AND the fusion replayed end-to-end. */
  private val e71OracleSql: String =
    s"""${ivfChainPrefix("TRUE", "vec_id < 64")},
       |q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM asg WHERE vec_id < 3),
       |qp AS (SELECT q_id, qv, qn, cid AS cell FROM (
       |  SELECT q0.q_id, q0.qv, q0.qn, c1.cid,
       |    row_number() OVER (PARTITION BY q0.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM q0 CROSS JOIN c1) WHERE rn <= 4),
       |vj AS (SELECT q_id, c.vec_id AS doc_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM qp JOIN asg c ON qp.cell = c.cell AND c.vec_id <> qp.q_id),
       |vec AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS vec_rank FROM (
       |  SELECT vj.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rk FROM vj)
       |  WHERE rk <= 10),
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |qsel AS (SELECT doc_id AS q_id, term FROM (
       |    SELECT doc_id, term, row_number() OVER
       |      (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
       |    FROM tf WHERE doc_id < 3) WHERE r <= 8),
       |qterms AS (SELECT qsel.q_id, qsel.term, dfreq.df
       |  FROM qsel JOIN dfreq USING (term)),
       |lexsc AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS lex_score
       |  FROM tf JOIN qterms q USING (term) JOIN lens USING (doc_id), st
       |  WHERE tf.doc_id <> q.q_id
       |  GROUP BY 1, 2),
       |lex AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS lex_rank FROM (
       |  SELECT lexsc.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY lex_score DESC, doc_id) AS rk FROM lexsc)
       |  WHERE rk <= 10),
       |fused AS (SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rank, vec.vec_rank,
       |    round(coalesce(1.0 / (60 + lex.lex_rank), 0) +
       |      coalesce(1.0 / (60 + vec.vec_rank), 0), 6) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY rrf_score DESC, doc_id) AS INTEGER)
       |    AS "rank" FROM fused)
       |SELECT q_id, "rank", doc_id, rrf_score, lex_rank, vec_rank
       |FROM r WHERE "rank" <= 5
       |ORDER BY q_id, "rank"""".stripMargin

  /** e71f's oracle: e71's two-leg + RRF replay with the declared
    * source predicate enforced per leg by ITS strategy — lexical
    * candidates filtered before ranking (pre-filter: full recall
    * within the stratum, statistics full-corpus), the vector leg's
    * shortlist CAPPED at OverFetch·LegK by cosine BEFORE the filter
    * (post-filter: recall bounded by the declared over-fetch — an
    * engine that quietly widened or narrowed the shortlist
    * hash-misses). */
  private val e71fOracleSql: String = {
    import graft.ops.RetrievalOps.{HybridFilterSource, OverFetch, LegK}
    s"""${ivfChainPrefix("TRUE", "vec_id < 64")},
       |flt AS (SELECT doc_id FROM documents WHERE source = '$HybridFilterSource'),
       |q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM asg WHERE vec_id < 3),
       |qp AS (SELECT q_id, qv, qn, cid AS cell FROM (
       |  SELECT q0.q_id, q0.qv, q0.qn, c1.cid,
       |    row_number() OVER (PARTITION BY q0.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM q0 CROSS JOIN c1) WHERE rn <= 4),
       |vj AS (SELECT q_id, c.vec_id AS doc_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM qp JOIN asg c ON qp.cell = c.cell AND c.vec_id <> qp.q_id),
       |vof AS (SELECT q_id, doc_id, cos_sim FROM (
       |  SELECT vj.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rk FROM vj)
       |  WHERE rk <= ${OverFetch * LegK}),
       |vec AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS vec_rank FROM (
       |  SELECT vof.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rk
       |  FROM vof JOIN flt USING (doc_id)) WHERE rk <= $LegK),
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |qsel AS (SELECT doc_id AS q_id, term FROM (
       |    SELECT doc_id, term, row_number() OVER
       |      (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
       |    FROM tf WHERE doc_id < 3) WHERE r <= 8),
       |qterms AS (SELECT qsel.q_id, qsel.term, dfreq.df
       |  FROM qsel JOIN dfreq USING (term)),
       |lexsc AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS lex_score
       |  FROM tf JOIN flt USING (doc_id) JOIN qterms q USING (term)
       |    JOIN lens USING (doc_id), st
       |  WHERE tf.doc_id <> q.q_id
       |  GROUP BY 1, 2),
       |lex AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS lex_rank FROM (
       |  SELECT lexsc.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY lex_score DESC, doc_id) AS rk FROM lexsc)
       |  WHERE rk <= $LegK),
       |fused AS (SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rank, vec.vec_rank,
       |    round(coalesce(1.0 / (60 + lex.lex_rank), 0) +
       |      coalesce(1.0 / (60 + vec.vec_rank), 0), 6) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY rrf_score DESC, doc_id) AS INTEGER)
       |    AS "rank" FROM fused)
       |SELECT q_id, "rank", doc_id, rrf_score, lex_rank, vec_rank
       |FROM r WHERE "rank" <= 5
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** e71q's oracle: the AD-HOC HYBRID replay — the vector leg is e2q's
    * chain (VALUES vectors routed by the trained centroids, NO
    * self-exclusion) to depth LegK, the lexical leg is e35q's chain
    * (VALUES terms, NO self-exclusion) to depth LegK, fused by e71's
    * exact RRF tail. BOTH VALUES relations are GENERATED from the
    * declared constants ([[graft.ops.RetrievalOps.AdhocHybridTerms]],
    * [[graft.sources.IvfServe.AdhocVecQueries]]) — no drift. */
  private val e71qOracleSql: String = {
    import graft.ops.RetrievalOps.{LegK, RrfK}
    val vecValues = graft.sources.IvfServe.AdhocVecQueries
      .map { case (qid, qv) =>
        s"(CAST($qid AS BIGINT), [${qv.map(_.toString).mkString(", ")}]::DOUBLE[])"
      }.mkString(",\n       |  ")
    val termValues = graft.ops.RetrievalOps.AdhocHybridTerms
      .map { case (qid, t) => s"(CAST($qid AS BIGINT), '$t')" }
      .mkString(", ")
    s"""${ivfChainPrefix("TRUE", "vec_id < 64")},
       |q0(q_id, qv) AS (VALUES $vecValues),
       |qq AS (SELECT q_id, qv, list_dot_product(qv, qv) AS qn FROM q0),
       |qp AS (SELECT q_id, qv, qn, cid AS cell FROM (
       |  SELECT qq.q_id, qq.qv, qq.qn, c1.cid,
       |    row_number() OVER (PARTITION BY qq.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(qq.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(qq.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM qq CROSS JOIN c1) WHERE rn <= ${graft.sources.IvfServe.NProbe}),
       |vj AS (SELECT q_id, c.vec_id AS doc_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM qp JOIN asg c ON qp.cell = c.cell),
       |vec AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS vec_rank FROM (
       |  SELECT vj.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rk FROM vj)
       |  WHERE rk <= $LegK),
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |qt(q_id, term) AS (VALUES $termValues),
       |lexsc AS (SELECT qt.q_id, tf.doc_id,
       |    round(sum(ln(1 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS lex_score
       |  FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
       |    JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |lex AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS lex_rank FROM (
       |  SELECT lexsc.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY lex_score DESC, doc_id) AS rk FROM lexsc)
       |  WHERE rk <= $LegK),
       |fused AS (SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rank, vec.vec_rank,
       |    round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0) +
       |      coalesce(1.0 / ($RrfK + vec.vec_rank), 0), 6) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY rrf_score DESC, doc_id) AS INTEGER)
       |    AS "rank" FROM fused)
       |SELECT q_id, "rank", doc_id, rrf_score, lex_rank, vec_rank
       |FROM r WHERE "rank" <= 5
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** e71v's oracle: e71's two-leg + RRF replay pinned to ONE corpus
    * version — the vector chain trains on the pre-arrival base (the
    * fold-base contract) with candidates restricted to base ∪ the
    * batch prefix ≤ 2 (ids ≥ 16 or < 12); the lexical chain restricts
    * candidates, df, n_docs and avgdl to the SAME version while the
    * query keywords derive from the query docs' own text (corpus-
    * independent). A leg pinned at the wrong batch — or one leg
    * current while the other is pinned — is a hash miss. */
  private val e71vOracleSql: String =
    s"""${ivfChainPrefix("vec_id >= 16", "vec_id < 80")},
       |q0 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM asg WHERE vec_id < 3),
       |qp AS (SELECT q_id, qv, qn, cid AS cell FROM (
       |  SELECT q0.q_id, q0.qv, q0.qn, c1.cid,
       |    row_number() OVER (PARTITION BY q0.q_id ORDER BY
       |      round(list_dot_product(
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i]),
       |        list_transform(q0.qv, (x, i) -> x - c1.c[i])), 6), c1.cid) AS rn
       |  FROM q0 CROSS JOIN c1) WHERE rn <= 4),
       |vj AS (SELECT q_id, c.vec_id AS doc_id,
       |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
       |  FROM qp JOIN asg c ON qp.cell = c.cell AND c.vec_id <> qp.q_id
       |  WHERE c.vec_id >= 16 OR c.vec_id < 12),
       |vec AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS vec_rank FROM (
       |  SELECT vj.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rk FROM vj)
       |  WHERE rk <= 10),
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |ver AS (SELECT doc_id FROM documents WHERE doc_id >= 16 OR doc_id < 12),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
       |  FROM lens JOIN ver USING (doc_id)),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf JOIN ver USING (doc_id)
       |  GROUP BY term),
       |qsel AS (SELECT doc_id AS q_id, term FROM (
       |    SELECT doc_id, term, row_number() OVER
       |      (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
       |    FROM tf WHERE doc_id < 3) WHERE r <= 8),
       |qterms AS (SELECT qsel.q_id, qsel.term, dfreq.df
       |  FROM qsel JOIN dfreq USING (term)),
       |lexsc AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS lex_score
       |  FROM tf JOIN ver USING (doc_id) JOIN qterms q USING (term)
       |    JOIN lens USING (doc_id), st
       |  WHERE tf.doc_id <> q.q_id
       |  GROUP BY 1, 2),
       |lex AS (SELECT q_id, doc_id, CAST(rk AS INTEGER) AS lex_rank FROM (
       |  SELECT lexsc.*, row_number() OVER
       |    (PARTITION BY q_id ORDER BY lex_score DESC, doc_id) AS rk FROM lexsc)
       |  WHERE rk <= 10),
       |fused AS (SELECT coalesce(lex.q_id, vec.q_id) AS q_id,
       |    coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex.lex_rank, vec.vec_rank,
       |    round(coalesce(1.0 / (60 + lex.lex_rank), 0) +
       |      coalesce(1.0 / (60 + vec.vec_rank), 0), 6) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.q_id = vec.q_id AND lex.doc_id = vec.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY rrf_score DESC, doc_id) AS INTEGER)
       |    AS "rank" FROM fused)
       |SELECT q_id, "rank", doc_id, rrf_score, lex_rank, vec_rank,
       |  CAST(${graft.ops.RetrievalOps.DeclaredHybridSnap} AS BIGINT) AS snapshot_id
       |FROM r WHERE "rank" <= 5
       |ORDER BY q_id, "rank"""".stripMargin

  /** e70/e70b's shared stage 1-4 replay (decon → quality → dedup
    * with recursive-CTE connected components → mixture), ending at
    * the `mx` survivors CTE; `lab` (the CC labels) stays visible for
    * e70b's cluster-keyed split. Hoisted so both oracles splice the
    * IDENTICAL chain (never self-reference oracleSql entries). */
  private val e70ChainSql: String =
    """WITH RECURSIVE
        |d0 AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END) AS sh FROM d0),
        |shAll AS (SELECT DISTINCT doc_id, sh FROM sh0),
        |bench AS (SELECT DISTINCT sh FROM shAll
        |  WHERE doc_id % 23 = 7 AND doc_id < 100000),
        |contam AS (SELECT doc_id FROM shAll JOIN bench USING (sh)
        |  WHERE NOT (doc_id % 23 = 7 AND doc_id < 100000)
        |  GROUP BY doc_id HAVING count(*) >= 4),
        |s1 AS (SELECT * FROM d0
        |  WHERE NOT (doc_id % 23 = 7 AND doc_id < 100000)
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |q AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok FROM s1
        |  WHERE len(w) > 0
        |    AND round(list_max(list_transform(list_distinct(w),
        |      x -> len(list_filter(w, y -> y = x)))) / len(w), 6) <= 0.14
        |    AND coalesce(CASE WHEN len(w) >= 2 THEN
        |      round(1 - len(list_distinct(list_transform(range(1, len(w)),
        |        i -> array_to_string(w[i:i+1], ' ')))) / (len(w) - 1), 6)
        |      END, 0) <= 0.12),
        |sh AS (SELECT * FROM shAll WHERE doc_id IN (SELECT doc_id FROM q)),
        |sigs AS (SELECT doc_id, hid, min(md5(CAST(hid AS VARCHAR) || ':' || sh)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS hid) h GROUP BY doc_id, hid),
        |bands AS (SELECT doc_id, hid // 2 AS band,
        |  md5(string_agg(mh, '' ORDER BY hid)) AS bh FROM sigs GROUP BY doc_id, hid // 2),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (SELECT p.d1, p.d2, count(*) AS n_common FROM pairs p
        |  JOIN sh x1 ON x1.doc_id = p.d1
        |  JOIN sh x2 ON x2.doc_id = p.d2 AND x2.sh = x1.sh
        |  GROUP BY 1, 2),
        |cand AS (SELECT p.d1, p.d2 FROM pairs p
        |  JOIN common c ON p.d1 = c.d1 AND p.d2 = c.d2
        |  JOIN counts c1 ON c1.doc_id = p.d1
        |  JOIN counts c2 ON c2.doc_id = p.d2
        |  WHERE round(c.n_common / (c1.n_sh + c2.n_sh - c.n_common), 6) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM cand
        |  UNION SELECT d2 AS a, d1 AS b FROM cand),
        |verts AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS r FROM verts
        |  UNION
        |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON reach.node = e.b),
        |lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM lab WHERE node != cluster_id),
        |dd AS (SELECT q.* FROM q LEFT JOIN dropped dr ON q.doc_id = dr.node
        |  WHERE dr.node IS NULL),
        |dim(source, wt) AS (VALUES
        |  ('src0', 3.0), ('src1', 3.0), ('src2', 3.0), ('src3', 3.0), ('src4', 3.0)),
        |mx AS (SELECT dd.doc_id, dd.source, dd.n_tok
        |  FROM dd LEFT JOIN dim USING (source)
        |  WHERE CAST(('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) / 4294967296.0
        |    < CAST(least(1.0, coalesce(wt, 1.0) * 0.25) AS DOUBLE))""".stripMargin

  private val e6OracleSql: String =
    """WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
      |  ELSE [] END) AS sh FROM w),
      |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      |sigs AS (SELECT doc_id, hid, min(md5(CAST(hid AS VARCHAR) || ':' || sh)) AS mh
      |  FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS hid) h GROUP BY doc_id, hid),
      |bands AS (SELECT doc_id, hid // 2 AS band,
      |  md5(string_agg(mh, '' ORDER BY hid)) AS bh FROM sigs GROUP BY doc_id, hid // 2),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |common AS (SELECT p.d1, p.d2, count(*) AS n_common FROM pairs p
      |  JOIN sh s1 ON s1.doc_id = p.d1
      |  JOIN sh s2 ON s2.doc_id = p.d2 AND s2.sh = s1.sh
      |  GROUP BY 1, 2)
      |SELECT p.d1, p.d2, p.n_bands, coalesce(c.n_common, 0) AS n_common,
      |  c1.n_sh AS n1, c2.n_sh AS n2,
      |  round(coalesce(c.n_common, 0) /
      |    (c1.n_sh + c2.n_sh - coalesce(c.n_common, 0)), 6) AS jaccard
      |FROM pairs p
      |LEFT JOIN common c ON p.d1 = c.d1 AND p.d2 = c.d2
      |JOIN counts c1 ON c1.doc_id = p.d1
      |JOIN counts c2 ON c2.doc_id = p.d2
      |ORDER BY p.d1, p.d2""".stripMargin

  /** m3's full payload-synthesis + structural-parse SQL, shared
    * verbatim by the m5 sample-domain continuation (both consume the
    * `ok` CTE's validated data_hex). */
  private val m3WavSql: String =
    """WITH p AS (SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS INT) AS ch,
        |  [8000,11025,16000,22050][CAST(doc_id % 4 AS INT) + 1] AS rate,
        |  CASE WHEN doc_id % 3 = 0 THEN 16 ELSE 8 END AS bits,
        |  CAST(doc_id % 40 + 10 AS INT) AS nsamp
        |  FROM documents),
        |q AS (SELECT doc_id, ch, rate, bits, nsamp,
        |  ch * bits // 8 AS ba FROM p),
        |r AS (SELECT doc_id, ch, rate, bits, ba,
        |  nsamp * ba AS dsz, rate * ba AS brate FROM q),
        |le AS (SELECT *,
        |  substr(printf('%08X', dsz + 36), 7, 2) || substr(printf('%08X', dsz + 36), 5, 2) ||
        |    substr(printf('%08X', dsz + 36), 3, 2) || substr(printf('%08X', dsz + 36), 1, 2) AS riff_le,
        |  substr(printf('%08X', rate), 7, 2) || substr(printf('%08X', rate), 5, 2) ||
        |    substr(printf('%08X', rate), 3, 2) || substr(printf('%08X', rate), 1, 2) AS rate_le,
        |  substr(printf('%08X', brate), 7, 2) || substr(printf('%08X', brate), 5, 2) ||
        |    substr(printf('%08X', brate), 3, 2) || substr(printf('%08X', brate), 1, 2) AS brate_le,
        |  substr(printf('%08X', dsz), 7, 2) || substr(printf('%08X', dsz), 5, 2) ||
        |    substr(printf('%08X', dsz), 3, 2) || substr(printf('%08X', dsz), 1, 2) AS dsz_le,
        |  substr(printf('%04X', ch), 3, 2) || substr(printf('%04X', ch), 1, 2) AS ch_le,
        |  substr(printf('%04X', ba), 3, 2) || substr(printf('%04X', ba), 1, 2) AS ba_le,
        |  substr(printf('%04X', bits), 3, 2) || substr(printf('%04X', bits), 1, 2) AS bits_le,
        |  substring(array_to_string(list_transform(range(0, dsz//16 + 1),
        |    k -> md5(CAST(doc_id AS VARCHAR) || ':wav:' || CAST(k AS VARCHAR))), ''),
        |    1, dsz*2) AS datahex
        |  FROM r),
        |pay AS (SELECT doc_id, unhex(upper(
        |  '52494646' || riff_le || '57415645' || '666D7420' || '10000000' ||
        |  '0100' || ch_le || rate_le || brate_le || ba_le || bits_le ||
        |  '64617461' || dsz_le || datahex)) AS payload FROM le),
        |hx AS (SELECT doc_id, hex(payload) AS hx FROM pay),
        |hdr AS (SELECT doc_id, hx,
        |  ('0x' || substr(hx, 15, 2) || substr(hx, 13, 2) || substr(hx, 11, 2) || substr(hx, 9, 2))::BIGINT AS riff_size,
        |  ('0x' || substr(hx, 39, 2) || substr(hx, 37, 2) || substr(hx, 35, 2) || substr(hx, 33, 2))::BIGINT AS fmt_size,
        |  ('0x' || substr(hx, 43, 2) || substr(hx, 41, 2))::BIGINT AS audio_format,
        |  ('0x' || substr(hx, 47, 2) || substr(hx, 45, 2))::INT AS channels,
        |  ('0x' || substr(hx, 55, 2) || substr(hx, 53, 2) || substr(hx, 51, 2) || substr(hx, 49, 2))::BIGINT AS sample_rate,
        |  ('0x' || substr(hx, 67, 2) || substr(hx, 65, 2))::INT AS block_align,
        |  ('0x' || substr(hx, 71, 2) || substr(hx, 69, 2))::INT AS bits_per_sample
        |  FROM hx),
        |dat AS (SELECT *, 20 + fmt_size AS data_off FROM hdr),
        |dsz AS (SELECT *,
        |  ('0x' || substr(hx, CAST((data_off+7)*2+1 AS INT), 2) ||
        |          substr(hx, CAST((data_off+6)*2+1 AS INT), 2) ||
        |          substr(hx, CAST((data_off+5)*2+1 AS INT), 2) ||
        |          substr(hx, CAST((data_off+4)*2+1 AS INT), 2))::BIGINT AS data_size
        |  FROM dat
        |  WHERE substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
        |    AND substr(hx, 25, 8) = '666D7420' AND audio_format = 1
        |    AND substr(hx, CAST(data_off*2+1 AS INT), 8) = '64617461'
        |    AND block_align > 0 AND sample_rate > 0),
        |ok AS (SELECT *, data_size // block_align AS n_samples,
        |  substr(hx, CAST(data_off*2+17 AS INT), CAST(data_size*2 AS INT)) AS data_hex
        |  FROM dsz
        |  WHERE length(hx) = (data_off + 8 + data_size) * 2
        |    AND riff_size = data_off + data_size)
        |SELECT doc_id, channels, sample_rate, bits_per_sample, block_align,
        |  data_size, n_samples, n_samples * 1000000 // sample_rate AS duration_us,
        |  ('0x' || substr(data_hex, 1, 2))::INT AS s0,
        |  md5(data_hex) AS data_sig
        |FROM ok ORDER BY doc_id""".stripMargin

  /** e16's full exact+jaccard edge build and recursive-CTE connected
    * components, shared verbatim by the e67 cluster-split oracle (both
    * consume the `lab` CTE's (doc_id, cluster_id) labels). */
  private val e16CcSql: String =
    """WITH RECURSIVE
        |h AS (SELECT doc_id,
        |  sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS ch
        |  FROM documents),
        |epair AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM h a
        |  JOIN h b ON a.ch = b.ch AND a.doc_id < b.doc_id),
        |w AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bg0 AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM w),
        |bg AS (SELECT DISTINCT doc_id, source, bg FROM bg0),
        |counts AS (SELECT doc_id, count(*) AS n_bg FROM bg GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
        |  FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jpair AS (SELECT d1, d2 FROM common
        |  JOIN counts c1 ON c1.doc_id = d1
        |  JOIN counts c2 ON c2.doc_id = d2
        |  WHERE n_common >= 5
        |    AND round(n_common / (c1.n_bg + c2.n_bg - n_common), 6) >= 0.1),
        |und AS (SELECT * FROM epair UNION SELECT * FROM jpair),
        |edges AS (SELECT d1 AS a, d2 AS b FROM und
        |  UNION SELECT d2 AS a, d1 AS b FROM und),
        |verts AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS r FROM verts
        |  UNION
        |  SELECT e.a AS node, reach.r AS r FROM edges e
        |  JOIN reach ON reach.node = e.b),
        |lab AS (SELECT node AS doc_id, min(r) AS cluster_id
        |  FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin

  /** e35's full BM25 replay — shared VERBATIM by `e35s_bm25_serve`
    * (the staged inverted index serves the identical declared rows; a
    * layout never changes the answer — the e2v/e2i precedent, applied
    * to text). */
  private val e35OracleSql: String =
    """WITH w AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |lens AS (SELECT doc_id, len(w) AS dl FROM w),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |q AS (SELECT CAST((r - 20) // 4 AS INTEGER) AS qid, term, df FROM (
      |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS r
      |    FROM dfreq)
      |  WHERE r BETWEEN 20 AND 31),
      |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
      |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
      |      (tf.tf * 2.2) /
      |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
      |  FROM tf JOIN q USING (term) JOIN lens USING (doc_id), st
      |  GROUP BY 1, 2),
      |r AS (SELECT *, CAST(row_number() OVER
      |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
      |  FROM sc)
      |SELECT qid, rnk, doc_id, n_match, score FROM r WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  /** e35a's oracle: the e35 chain with CANDIDATES restricted to
    * source = FilterSource while every scoring statistic (df, dl,
    * n_docs, avgdl) stays full-corpus — the filter restricts
    * candidates, never the model (the e2a stance, replayed). */
  private val e35aOracleSql: String =
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q AS (SELECT CAST((r - 20) // 4 AS INTEGER) AS qid, term, df FROM (
       |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS r
       |    FROM dfreq)
       |  WHERE r BETWEEN 20 AND 31),
       |src AS (SELECT doc_id, source FROM documents
       |  WHERE source = '${graft.sources.LexIndex.FilterSource}'),
       |sc AS (SELECT q.qid, tf.doc_id, src.source, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN q USING (term) JOIN lens USING (doc_id)
       |    JOIN src ON src.doc_id = tf.doc_id, st
       |  GROUP BY 1, 2, 3),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, source, n_match, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** e35q's oracle: the e35 scoring chain with the query relation
    * replaced by the DECLARED AD-HOC LITERALS — generated from
    * LexIndex.AdhocQueries so the two sides cannot drift. The df each
    * term scores with joins from the corpus df dim (the engine reads
    * it denormalized off the posting rows — same numbers); an
    * out-of-vocabulary literal matches no tf row and contributes
    * nothing, on both sides. */
  private val e35qOracleSql: String = {
    val values = graft.sources.LexIndex.AdhocQueries
      .map { case (qid, t) => s"(CAST($qid AS INTEGER), '$t')" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q(qid, term) AS (VALUES $values),
       |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |    JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, n_match, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** e35p's oracle: per-token POSITIONS by zipped unnest (the parallel
    * lists zip row-wise), phrase frequency as the count of adjacent
    * (t1 at p, t2 at p+1) pairs per document, and Lucene's PhraseWeight
    * scoring — summed constituent idfs, the phrase frequency through
    * the same (k1, b) saturation as a term's tf. The VALUES relation is
    * GENERATED from [[graft.sources.LexIndex.PhraseQueries]]; the OOV
    * phrase matches nothing on either side (its qid is absent). */
  private val e35pOracleSql: String = {
    val values = graft.sources.LexIndex.PhraseQueries
      .map { case (qid, t1, t2) => s"(CAST($qid AS INTEGER), '$t1', '$t2')" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |pos AS (SELECT doc_id, unnest(w) AS term,
       |    unnest(range(1, len(w) + 1)) AS p FROM w),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |ph(qid, t1, t2) AS (VALUES $values),
       |m AS (SELECT ph.qid, ph.t1, ph.t2, a.doc_id, count(*) AS ptf
       |  FROM ph JOIN pos a ON a.term = ph.t1
       |    JOIN pos b ON b.doc_id = a.doc_id AND b.term = ph.t2
       |      AND b.p = a.p + 1
       |  GROUP BY 1, 2, 3, 4),
       |sc AS (SELECT m.qid, m.doc_id, CAST(m.ptf AS INTEGER) AS ptf,
       |    round((ln(1 + (st.n_docs - d1.df + 0.5) / (d1.df + 0.5)) +
       |        ln(1 + (st.n_docs - d2.df + 0.5) / (d2.df + 0.5))) *
       |      (m.ptf * 2.2) /
       |      (m.ptf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl)), 6) AS score
       |  FROM m JOIN dfreq d1 ON d1.term = m.t1
       |    JOIN dfreq d2 ON d2.term = m.t2
       |    JOIN lens ON lens.doc_id = m.doc_id, st),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, ptf, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** e35w's oracle: prefix → term-dictionary expansion capped at
    * MaxExpansion by (df desc, term) — the top-terms scoring rewrite —
    * then e35's exact BM25 disjunction over the surviving terms. The
    * VALUES relation is GENERATED from
    * [[graft.sources.LexIndex.PrefixQueries]]; the no-match prefix
    * expands to nothing on either side (its qid is absent). */
  private val e35wOracleSql: String = {
    val values = graft.sources.LexIndex.PrefixQueries
      .map { case (qid, p) => s"(CAST($qid AS INTEGER), '$p')" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |pref(qid, p) AS (VALUES $values),
       |q AS (SELECT qid, term, df FROM (
       |    SELECT pref.qid, d.term, d.df, row_number() OVER
       |      (PARTITION BY pref.qid ORDER BY d.df DESC, d.term) AS er
       |    FROM pref JOIN dfreq d ON d.term LIKE (p || '%'))
       |  WHERE er <= ${graft.sources.LexIndex.MaxExpansion}),
       |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN q USING (term) JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, n_match, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** The segment-fold BM25 replay shared by e35f (whole corpus) and
    * e35z (base + the pinned batch prefix): query selection from the
    * BASE corpus (doc_id >= 16 — the frozen query set), every scoring
    * statistic from `corpusPred`'s rows. */
  private def e35FoldOracleSql(corpusPred: String, snap: Option[Long]): String = {
    val snapCol = snap.map(id => s", CAST($id AS BIGINT) AS snapshot_id").getOrElse("")
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents WHERE $corpusPred),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |bdf AS (SELECT term, count(*) AS df FROM tf WHERE doc_id >= 16 GROUP BY term),
       |q AS (SELECT CAST((r - 20) // 4 AS INTEGER) AS qid, term FROM (
       |    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM bdf)
       |  WHERE r BETWEEN 20 AND 31),
       |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |    JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, n_match, score$snapCol FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** e35d's oracle: BM25 over (corpus − tombstones) with the query set
    * still frozen on the FULL pre-delete base — candidates, per-term
    * df, n_docs and avgdl all shrink with the deleted docs, exactly
    * what the live-docs probe must reproduce. */
  private val e35dOracleSql: String = {
    import graft.streaming.LexStreams.{TombMod, TombRes, TombBound, ArrivalDocBound}
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |live AS (SELECT doc_id FROM documents
       |  WHERE NOT (doc_id % $TombMod = $TombRes AND doc_id < $TombBound)),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl
       |  FROM lens JOIN live USING (doc_id)),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |bdf AS (SELECT term, count(*) AS df FROM tf
       |  WHERE doc_id >= $ArrivalDocBound GROUP BY term),
       |q AS (SELECT CAST((r - 20) // 4 AS INTEGER) AS qid, term FROM (
       |    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM bdf)
       |  WHERE r BETWEEN 20 AND 31),
       |dfl AS (SELECT term, count(*) AS df FROM tf JOIN live USING (doc_id)
       |  GROUP BY term),
       |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - dfl.df + 0.5) / (dfl.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN live USING (doc_id) JOIN q USING (term)
       |    JOIN dfl USING (term) JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, n_match, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  /** e35u's oracle: BM25 over the LATEST-VERSION corpus — the declared
    * update transform (text doubled for the update set) applied in
    * SQL — with the query set still frozen on the pre-update base
    * (original text, doc_id ≥ bound). A served stale version, a
    * double-counted doc (n_docs must not move), or an un-shifted
    * avgdl is a hash miss. */
  private val e35uOracleSql: String = {
    import graft.streaming.LexStreams.{UpdMod, UpdRes, UpdLo, UpdHi, ArrivalDocBound}
    s"""WITH d2 AS (SELECT doc_id,
       |    CASE WHEN doc_id % $UpdMod = $UpdRes AND doc_id > $UpdLo AND doc_id < $UpdHi
       |      THEN text || ' ' || text ELSE text END AS text
       |  FROM documents),
       |w0 AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM documents),
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS w
       |  FROM d2),
       |lens AS (SELECT doc_id, len(w) AS dl FROM w),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
       |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w0) GROUP BY 1, 2),
       |bdf AS (SELECT term, count(*) AS df FROM tf0
       |  WHERE doc_id >= $ArrivalDocBound GROUP BY term),
       |q AS (SELECT CAST((r - 20) // 4 AS INTEGER) AS qid, term FROM (
       |    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM bdf)
       |  WHERE r BETWEEN 20 AND 31),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
       |dfl AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (SELECT q.qid, tf.doc_id, count(*) AS n_match,
       |    round(sum(ln(1 + (st.n_docs - dfl.df + 0.5) / (dfl.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / st.avgdl))), 6) AS score
       |  FROM tf JOIN q USING (term)
       |    JOIN dfl USING (term) JOIN lens USING (doc_id), st
       |  GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER
       |    (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM sc)
       |SELECT qid, rnk, doc_id, n_match, score FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "s1_catalog_scan" ->
      "SELECT DISTINCT o_custkey AS id FROM orders ORDER BY id LIMIT 100",
    "s2_partition_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey BETWEEN 1 AND 64
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,
    "s3_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)""".stripMargin,
    "s4_json_decode" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "s5_validated_read" ->
      """SELECT event_type, count(*) AS n_valid FROM events
        |WHERE value IS NOT NULL AND value >= 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s7_csv_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // r7 curation stages: decontamination / repetition rules / scrub /
    // packing / stratified sample / n-gram stats
    "e20_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END) AS sh FROM t),
        |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
        |bench AS (SELECT DISTINCT sh FROM sh
        |  WHERE doc_id % 23 = 7 AND doc_id < 100000)
        |SELECT doc_id, count(*) AS n_overlap, count(*) >= 4 AS is_contaminated
        |FROM sh JOIN bench USING (sh)
        |WHERE NOT (doc_id % 23 = 7 AND doc_id < 100000)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e10b_gopher_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (SELECT doc_id, w, len(w) AS n_tokens,
        |  list_max(list_transform(list_distinct(w),
        |    x -> len(list_filter(w, y -> y = x)))) AS top_n,
        |  CASE WHEN len(w) >= 2
        |    THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |    ELSE [] END AS bg
        |  FROM t WHERE len(w) > 0),
        |f AS (SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  round(top_n / n_tokens, 6) AS top_word_frac,
        |  round(1 - len(list_distinct(w)) / n_tokens, 6) AS dup_word_frac,
        |  CASE WHEN len(bg) > 0
        |    THEN round(1 - len(list_distinct(bg)) / len(bg), 6) END AS dup_bigram_frac
        |  FROM m)
        |SELECT doc_id, n_tokens, top_word_frac, dup_word_frac, dup_bigram_frac,
        |  (top_word_frac <= 0.14 AND coalesce(dup_bigram_frac, 0) <= 0.12)
        |    AS passes_repetition
        |FROM f ORDER BY doc_id""".stripMargin,
    "e21_pii_scrub" ->
      """WITH p AS (SELECT event_id,
        |  props || ' uid=' || CAST(user_id AS VARCHAR) || ' ev=' || event_type AS payload
        |  FROM events)
        |SELECT event_id,
        |  regexp_replace(payload, '[0-9]+', '<NUM>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(payload, '[0-9]+')) AS INTEGER) AS n_redacted
        |FROM p ORDER BY event_id""".stripMargin,
    "e22_seq_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n_tok,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
        |    AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, source, shard, n_tok,
        |  sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT source, shard, CAST(floor((cum - n_tok) / 256) AS BIGINT) AS window_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3 ORDER BY source, shard, window_id""".stripMargin,
    "e14b_stratified_sample" ->
      """WITH k AS (SELECT doc_id, lang,
        |  md5(text || '|' || CAST(doc_id AS VARCHAR)) AS sample_key FROM documents),
        |r AS (SELECT lang, doc_id, sample_key,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id)
        |    AS INTEGER) AS rank_in_stratum FROM k)
        |SELECT lang, rank_in_stratum, doc_id, sample_key FROM r
        |WHERE rank_in_stratum <= 20 ORDER BY lang, rank_in_stratum""".stripMargin,
    // stream/batch parity: the drained quality-gate manifest must equal
    // the batch rule SQL — same thresholds as e10b, aggregated by source
    "e10s_quality_stream" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (SELECT doc_id, source, len(w) AS n_tokens,
        |  list_max(list_transform(list_distinct(w),
        |    x -> len(list_filter(w, y -> y = x)))) AS top_n,
        |  CASE WHEN len(w) >= 2
        |    THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |    ELSE [] END AS bg
        |  FROM t),
        |f AS (SELECT source, CASE WHEN n_tokens = 0 THEN FALSE ELSE
        |  (round(top_n / n_tokens, 6) <= 0.14
        |   AND coalesce(CASE WHEN len(bg) > 0
        |     THEN round(1 - len(list_distinct(bg)) / len(bg), 6) END, 0) <= 0.12)
        |  END AS p FROM m)
        |SELECT source, CAST(count(*) FILTER (p) AS BIGINT) AS n_admitted,
        |  CAST(count(*) FILTER (NOT p) AS BIGINT) AS n_rejected
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "e24_mixture_weights" ->
      """WITH dim(source, w) AS (VALUES
        |  ('src0', 3.0), ('src1', 3.0), ('src2', 3.0), ('src3', 3.0), ('src4', 3.0)),
        |t AS (SELECT doc_id, source,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n_tok,
        |  CAST(('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        |  FROM documents),
        |j AS (SELECT t.*, CAST(least(1.0, coalesce(dim.w, 1.0) * 0.25) AS DOUBLE) AS rate
        |  FROM t LEFT JOIN dim USING (source))
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (u < rate) AS n_sampled,
        |  max(rate) AS target_rate,
        |  round((count(*) FILTER (u < rate)) / count(*), 6) AS realized_rate,
        |  CAST(sum(CASE WHEN u < rate THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_sampled
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "e23_ngram_stats" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM t)
        |SELECT bg, count(*) AS n_occur, count(DISTINCT doc_id) AS n_docs
        |FROM bg GROUP BY bg ORDER BY n_occur DESC, bg LIMIT 50""".stripMargin,
    // e56: the oracle states the overlap as a shingle-keyed self-join;
    // the engine's collect_set formulation must produce identical pairs
    "e56_source_overlap" ->
      """WITH w AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT source, unnest(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1),
        |      i -> array_to_string(w[i:i+2], ' '))
        |    ELSE [] END) AS sh FROM w),
        |ss AS (SELECT DISTINCT sh, source FROM sh0),
        |tot AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY source),
        |c AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |  FROM ss a JOIN ss b USING (sh) WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared,
        |  round(n_shared * 1.0 / ta.n_sh, 6) AS share_a,
        |  round(n_shared * 1.0 / tb.n_sh, 6) AS share_b
        |FROM c JOIN tot ta ON ta.source = c.src_a
        |  JOIN tot tb ON tb.source = c.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // e55: replace() is left-to-right non-overlapping on both engines,
    // so the frozen-merge rewrite is identical by construction (e48);
    // the e48 alphabet filter runs before encoding (r9 advisory: the
    // encoding is collision-free only over [a-z0-9]+ tokens)
    "e55_bpe_encode" ->
      """WITH t AS (SELECT source,
        |  list_filter(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0),
        |    x -> regexp_matches(x, '^[a-z0-9]+$')) AS w
        |  FROM documents),
        |f AS (SELECT source, w,
        |    '||' || array_to_string(w, '||') || '||' AS s0 FROM t
        |  WHERE len(w) > 0),
        |m AS (SELECT source, len(w) AS n_in,
        |    replace(replace(replace(s0,
        |      '|table||hash|', '|table_hash|'),
        |      '|part||filter|', '|part_filter|'),
        |      '|customer||join|', '|customer_join|') AS s3 FROM f),
        |c AS (SELECT source, n_in,
        |    len(list_filter(string_split(s3, '||'), x -> len(x) > 0)) AS n_out
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_in) AS BIGINT) AS toks_in,
        |  CAST(sum(n_out) AS BIGINT) AS toks_out,
        |  round(sum(n_out) * 1.0 / sum(n_in), 6) AS compression
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // e54: the oracle cannot run a CMS — it recomputes the exact
    // top-20 over the SAME deterministic 1/16 md5 vocabulary sample and
    // expects gate_ok literally true; the engine's gate passes on a
    // >=19/20 quorum (one excursion is the sketch's priced confidence,
    // two is drift and flips every declared row)
    "e54_cms_heavy_hitters" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bgs AS (SELECT unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM t),
        |sam AS (SELECT bg FROM bgs
        |  WHERE CAST(('0x' || substr(md5('cms:' || bg), 1, 8)) AS BIGINT) % 16 = 0),
        |e AS (SELECT bg, count(*) AS n_exact FROM sam GROUP BY bg
        |  ORDER BY n_exact DESC, bg LIMIT 20)
        |SELECT bg, n_exact, TRUE AS gate_ok FROM e
        |ORDER BY n_exact DESC, bg""".stripMargin,
    // e54x: the xx-sampled top-20 is hash-family-dependent (DuckDB has
    // no xxhash64), so the declared row is the hash-INDEPENDENT gate
    // contract — total and ε-bound recomputed exactly, the quorum
    // verdict pinned literal TRUE (the e66 hll_ok convention); the
    // sample itself is spec-gated (CmsXxGateSpec)
    "e54x_cms_xx_gate" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bgs AS (SELECT unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM t)
        |SELECT CAST(20 AS BIGINT) AS n_probes, TRUE AS gate_ok,
        |  count(*) AS total_bigrams,
        |  CAST(ceil(0.0001 * count(*)) AS BIGINT) AS eps_bound
        |FROM bgs""".stripMargin,
    // r8 curation stages: DuckDB's native ASOF JOIN oracles the Spark
    // union-and-carry as-of idiom; shard/tfidf/passage recompute exactly
    "e25_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
        |  CAST(epoch_us(p.ts) AS BIGINT) AS asof_ts_us,
        |  p.purchase_value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "e26_shard_manifest" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n_tok,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_bytes,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,
    "e27_tfidf_topk" ->
      """WITH tf AS (SELECT doc_id, u.term AS term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |    FROM documents), UNNEST(w) AS u(term)
        |  GROUP BY doc_id, u.term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
        |  FROM s)
        |SELECT doc_id, rnk, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, tfidf
        |FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "e28_passage_dedup" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |p AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pidx,
        |  array_to_string(w[(u.i*16+1):((u.i+1)*16)], ' ') AS passage
        |  FROM t, UNNEST(range(CAST(ceil(len(w)/16.0) AS BIGINT))) AS u(i)),
        |r AS (SELECT doc_id, pidx, row_number() OVER (
        |    PARTITION BY passage ORDER BY doc_id, pidx) AS rn FROM p),
        |kept AS (SELECT doc_id, count(*) AS n_kept FROM r WHERE rn = 1 GROUP BY doc_id)
        |SELECT t.doc_id, CAST(ceil(len(w)/16.0) AS INTEGER) AS n_passages,
        |  CAST(coalesce(kept.n_kept, 0) AS INTEGER) AS n_kept,
        |  CASE WHEN len(w) > 0
        |    THEN round(1.0 - coalesce(kept.n_kept, 0) / ceil(len(w)/16.0), 6)
        |  END AS dup_frac
        |FROM t LEFT JOIN kept USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    // e20b is the bloom-prefiltered form of e20 and must produce its
    // exact result, so the oracle IS e20's oracle — the gate proves the
    // sketch path changes the plan, not the answer
    "e20b_bloom_decon" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END) AS sh FROM t),
        |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
        |bench AS (SELECT DISTINCT sh FROM sh
        |  WHERE doc_id % 23 = 7 AND doc_id < 100000)
        |SELECT doc_id, count(*) AS n_overlap, count(*) >= 4 AS is_contaminated
        |FROM sh JOIN bench USING (sh)
        |WHERE NOT (doc_id % 23 = 7 AND doc_id < 100000)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e29_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
        |  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    // e29b: the left join's null rows are the WATERMARK-EMISSION
    // contract, reproduced exactly: an unmatched click appears iff the
    // final global watermark (min of both sides' MILLISECOND-truncated
    // max event time — Spark tracks watermarks in ms — minus the
    // 10-minute delay) strictly cleared its 6-hour join window —
    // clicks later than that are still in join state when the replay
    // ends and correctly emit nothing. NULLS FIRST pins DuckDB to
    // Spark's ascending null ordering.
    "e29b_stream_left_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS cus FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS pus FROM events
        |  WHERE event_type = 'purchase'),
        |wm AS (SELECT (least((SELECT max(cus) FROM c),
        |    (SELECT max(pus) FROM p)) // 1000 - 600000) * 1000 AS w)
        |SELECT c.click_id, p.purchase_id, c.user_id,
        |  c.cus AS click_ts_us, p.pus AS purchase_ts_us
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.pus >= c.cus AND p.pus <= c.cus + 21600000000
        |WHERE p.purchase_id IS NOT NULL
        |   OR c.cus + 21600000000 < (SELECT w FROM wm)
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,
    "e30_sparse_cosine" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[(u.i+1):(u.i+3)], ' ') AS term
        |  FROM t, UNNEST(range(len(w)-2)) AS u(i) WHERE len(w) >= 3),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |d0 AS (SELECT term, count(*) AS df FROM sh GROUP BY term
        |  HAVING count(*) <= 64),
        |dfw AS (SELECT term, df,
        |    ln((n.n_docs + 1.0)/(df + 1.0)) * ln((n.n_docs + 1.0)/(df + 1.0)) AS idf2
        |  FROM d0 CROSS JOIN n),
        |nrm AS (SELECT doc_id, sqrt(sum(idf2)) AS nrm
        |  FROM sh JOIN dfw USING (term) GROUP BY doc_id),
        |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_shared, sum(f.idf2) AS dp
        |  FROM sh a JOIN sh b USING (term) JOIN dfw f USING (term)
        |  WHERE a.doc_id < b.doc_id AND f.df >= 2
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared,
        |  round(dp/(na.nrm*nb.nrm), 6) AS cos_sim
        |FROM dots JOIN nrm na ON na.doc_id = dots.doc_a
        |  JOIN nrm nb ON nb.doc_id = dots.doc_b
        |WHERE round(dp/(na.nrm*nb.nrm), 6) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    "e31_quant_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |qz AS (SELECT vec_id, v,
        |    list_transform(v, x -> floor(x * (127.0 / mx) + 0.5)) AS qv
        |  FROM m WHERE mx > 0),
        |q AS (SELECT vec_id AS q_id, qv AS qa, v AS va FROM qz WHERE vec_id < 3),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qa, c.qv) /
        |      (sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(c.qv, c.qv))), 6)
        |      AS q_cos,
        |    round(list_dot_product(va, c.v) /
        |      (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(c.v, c.v))), 6)
        |      AS exact_cos
        |  FROM q CROSS JOIN qz c WHERE c.vec_id <> q.q_id),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY q_cos DESC, cand_id) AS INTEGER) AS "rank"
        |  FROM j)
        |SELECT q_id, "rank", cand_id, q_cos, exact_cos FROM r WHERE "rank" <= 5
        |ORDER BY q_id, "rank"""".stripMargin,
    "e32_centroid_agg" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |u AS (SELECT label, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER)+1] AS x
        |  FROM e, UNNEST(range(len(v))) AS u(i)),
        |c AS (SELECT label, pos, round(avg(x), 6) AS centroid_val
        |  FROM u GROUP BY label, pos),
        |n AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY label)
        |SELECT c.label, c.pos, c.centroid_val, n.n_vecs
        |FROM c JOIN n ON n.label = c.label
        |ORDER BY c.label, c.pos""".stripMargin,
    // e34: the centroid recompute is e32's oracle (round(avg,6) per
    // position); cosine-to-centroid uses the list_dot_product idiom the
    // e12/e31 oracles already prove bit-compatible with the codegen
    // expression; keeper rn=1 mirrors Spark's (cos desc, vec_id) argmax
    "e34_centroid_keeper" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |u AS (SELECT label, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER)+1] AS x
        |  FROM e, UNNEST(range(len(v))) AS u(i)),
        |c AS (SELECT label, pos, round(avg(x), 6) AS m FROM u GROUP BY label, pos),
        |cl AS (SELECT label, list(m ORDER BY pos) AS c FROM c GROUP BY label),
        |s AS (SELECT e.label, e.vec_id,
        |    round(list_dot_product(e.v, cl.c) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cl.c, cl.c))), 6)
        |      AS cos_c
        |  FROM e JOIN cl USING (label)),
        |k AS (SELECT label, vec_id AS keeper_id, cos_c AS keeper_cos,
        |    row_number() OVER (PARTITION BY label ORDER BY cos_c DESC, vec_id) AS rn
        |  FROM s),
        |a AS (SELECT label, count(*) AS n_vecs, round(avg(cos_c), 6) AS mean_cos
        |  FROM s GROUP BY label)
        |SELECT k.label, k.keeper_id, k.keeper_cos, a.n_vecs, a.mean_cos
        |FROM k JOIN a USING (label) WHERE k.rn = 1
        |ORDER BY k.label""".stripMargin,
    // e35: BM25 with k1=1.2, b=0.75; the query set is the terms ranked
    // 20-31 by (df DESC, term) split 4-per-query — derived from the
    // corpus in both engines identically; scores round to 6 dp BEFORE
    // ranking so both engines rank the same number, ties on doc_id
    "e35_bm25_topk" -> e35OracleSql,
    // e35s serves the SAME rows from the staged inverted index — the
    // oracle replays the full recompute; a layout drift (stale
    // postings, wrong bucket routing, lost df/dl denormalization) is
    // a hash miss
    "e35s_bm25_serve" -> e35OracleSql,
    // e35a: filtered BM25 — candidates restricted by the pushed source
    // predicate, statistics full-corpus (the e2a stance on text)
    "e35a_filtered_bm25" -> e35aOracleSql,
    // e35q: ad-hoc literal terms through the staged index — the oracle
    // splices the SAME declared literals (incl. the OOV terms)
    "e35q_adhoc_terms" -> e35qOracleSql,
    "e35p_phrase_query" -> e35pOracleSql,
    "e35w_prefix_query" -> e35wOracleSql,
    // e35f: the segment-fold index — query selection FROZEN at the
    // base corpus (doc_id >= 16, the frozen-quantizer analogue), every
    // scoring statistic (df, n_docs, avgdl, dl) from the WHOLE corpus;
    // a dropped/doubled arrival or a stale base-df score is a hash miss
    "e35f_postings_fold" -> e35FoldOracleSql("TRUE", None),
    // e35t: the tier merge relocates segment rows, never changes them —
    // the declared rows are e35f's verbatim (the e2i layout-invariance
    // precedent); the spec pins untouched base mtimes + the collapsed
    // read set, which no row oracle can see
    "e35t_tier_merge" -> e35FoldOracleSql("TRUE", None),
    // e35z: the same chain over base + the batch prefix <= 2 (arrival
    // buckets are contiguous doc_id ranges of 16/4 = 4, so prefix <= 2
    // is doc_id < 12) — df/n_docs/avgdl all roll back with the pinned
    // posting set; a current-stats score of pinned postings, a leaked
    // batch-3 arrival, or a lost pinned one is a hash miss
    "e35z_lex_snapshot" ->
      e35FoldOracleSql("doc_id >= 16 OR doc_id < 12",
        Some(graft.streaming.LexStreams.DeclaredLexSnap)),
    // e35u: upserts — BM25 over the latest-version corpus, query set
    // frozen on the pre-update base; a stale version or a
    // double-counted doc is a hash miss (see e35uOracleSql)
    "e35u_lex_upsert" -> e35uOracleSql,
    // e35d: live-docs tombstones — candidates, df, n_docs, avgdl all
    // shrink with the deleted docs; the query set stays frozen on the
    // full pre-delete base (see e35dOracleSql)
    "e35d_lex_tombstone" -> e35dOracleSql,
    // e35g: base/arrival mass comparison — both sides recomputed from
    // the corpus split; the verdict reads the ROUNDED share exactly as
    // the engine does
    "e35g_merge_gate" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(w) AS term FROM w) GROUP BY 1, 2),
        |m AS (SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id >= 16) AS n_base_docs,
        |  (SELECT count(*) FROM documents WHERE doc_id < 16) AS n_arr_docs,
        |  (SELECT count(*) FROM tf WHERE doc_id >= 16) AS n_base_postings,
        |  (SELECT count(*) FROM tf WHERE doc_id < 16) AS n_arr_postings),
        |r AS (SELECT *, round(n_arr_postings * 1.0 /
        |    (n_base_postings + n_arr_postings), 6) AS arr_posting_share FROM m)
        |SELECT n_base_docs, n_arr_docs, n_base_postings, n_arr_postings,
        |  arr_posting_share, arr_posting_share > 0.25 AS gate_tripped
        |FROM r""".stripMargin,
    "e36_epoch_order" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 8))
        |      AS BIGINT) AS h
        |  FROM documents),
        |o AS (SELECT doc_id, h, h % 64 AS shard,
        |    row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id) AS ord
        |  FROM t)
        |SELECT shard, count(*) AS n_docs,
        |  min(CASE WHEN ord = 1 THEN doc_id END) AS first_doc,
        |  CAST(sum((ord * (doc_id % 997)) % 1000003) AS BIGINT) AS order_fp
        |FROM o GROUP BY shard ORDER BY shard""".stripMargin,
    // e37: direction-sensitive skip-bigrams (gaps 1 and 2) via the
    // range/UNNEST indexing idiom the e32 oracle proved; ln and the
    // division structure mirror the engine expression exactly
    "e37_pmi_cooc" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |p1 AS (SELECT w[CAST(i AS INTEGER)+1] AS a, w[CAST(i AS INTEGER)+2] AS b
        |  FROM w, UNNEST(range(len(w)-1)) AS u(i)),
        |p2 AS (SELECT w[CAST(i AS INTEGER)+1] AS a, w[CAST(i AS INTEGER)+3] AS b
        |  FROM w, UNNEST(range(len(w)-2)) AS u(i)),
        |pc AS (SELECT a, b, count(*) AS c_ab FROM (
        |    SELECT a, b FROM p1 UNION ALL SELECT a, b FROM p2) GROUP BY 1, 2),
        |uni AS (SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
        |tt AS (SELECT sum(c) AS t_tot FROM uni),
        |tp AS (SELECT sum(c_ab) AS p_tot FROM pc)
        |SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  round(ln((c_ab / tp.p_tot) /
        |    ((ua.c / tt.t_tot) * (ub.c / tt.t_tot))), 6) AS pmi
        |FROM pc JOIN uni ua ON ua.t = pc.a JOIN uni ub ON ub.t = pc.b, tt, tp
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 40""".stripMargin,
    // e38: add-one-smoothed unigram cross-entropy; exact terciles via
    // quantile_cont (the e17 parity precedent), boundaries and scores
    // both rounded to 6 dp before the bucket comparison
    "e38_lm_quality" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |dw AS (SELECT * FROM w WHERE len(w) > 0),
        |dt AS (SELECT doc_id, t, count(*) AS n FROM (
        |    SELECT doc_id, unnest(w) AS t FROM dw) GROUP BY 1, 2),
        |uni AS (SELECT t, sum(n) AS c FROM dt GROUP BY 1),
        |tot AS (SELECT sum(c) AS t_tot, count(*) AS v FROM uni),
        |sc AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
        |    round(-sum(n * ln((c + 1.0) / (t_tot + v))) / sum(n), 6) AS nll
        |  FROM dt JOIN uni USING (t), tot GROUP BY doc_id),
        |q AS (SELECT round(quantile_cont(nll, CAST(1 AS DOUBLE)/3), 6) AS q33,
        |    round(quantile_cont(nll, CAST(2 AS DOUBLE)/3), 6) AS q66 FROM sc)
        |SELECT doc_id, n_toks, nll,
        |  CASE WHEN nll <= q33 THEN 'head'
        |       WHEN nll <= q66 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM sc, q ORDER BY doc_id""".stripMargin,
    // e39: keeper = min(doc_id) per normalized hash (doc_id is unique,
    // so joining back on doc_id recovers the keeper's source — the
    // engine's min(struct) equivalent)
    "e39_domain_gate" ->
      """WITH b AS (SELECT source, doc_id,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS h,
        |    CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS short, n_chars
        |  FROM documents),
        |k AS (SELECT h, min(doc_id) AS kd FROM b GROUP BY 1),
        |kk AS (SELECT b.source, count(*) AS n_keep
        |  FROM b JOIN k ON b.doc_id = k.kd GROUP BY 1),
        |per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(short) AS BIGINT) AS n_short,
        |    round(avg(n_chars), 6) AS mean_chars FROM b GROUP BY 1),
        |c AS (SELECT sum(short) / count(*) AS corpus_short_rate FROM b),
        |j AS (SELECT per.source, per.n_docs, per.mean_chars,
        |    per.n_docs - coalesce(kk.n_keep, 0) AS n_dup,
        |    round((per.n_docs - coalesce(kk.n_keep, 0)) / per.n_docs, 6) AS dup_rate,
        |    per.n_short,
        |    round(per.n_short / per.n_docs, 6) AS short_rate,
        |    c.corpus_short_rate
        |  FROM per LEFT JOIN kk USING (source), c)
        |SELECT source, n_docs, mean_chars, n_dup, dup_rate, n_short, short_rate,
        |  CASE WHEN dup_rate > 0.2 OR short_rate > round(1.1 * corpus_short_rate, 6)
        |       THEN 'drop' ELSE 'keep' END AS verdict
        |FROM j ORDER BY source""".stripMargin,
    // e40: Lloyd's loop unrolled to its declared two iterations. Every
    // iterate is rounded to 6 dp in both engines before it feeds the
    // next step (seeds, recomputed centroids, distances), so the argmin
    // ranks identical doubles; d2 via list_dot_product(diff, diff)
    // matches the engine's left-to-right fold of squared differences
    "e40_kmeans_train" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid,
        |    list_transform(v, x -> round(x, 6)) AS c
        |  FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.v, c0.cid,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - c0.c[i]),
        |      list_transform(e.v, (x, i) -> x - c0.c[i])), 6) AS d2
        |  FROM e CROSS JOIN c0),
        |a1 AS (SELECT vec_id, v, cid FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM s1) WHERE rn = 1),
        |u1 AS (SELECT cid, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER) + 1] AS x
        |  FROM a1, UNNEST(range(len(v))) AS u(i)),
        |c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM (
        |    SELECT cid, pos, round(avg(x), 6) AS m FROM u1 GROUP BY cid, pos)
        |  GROUP BY cid),
        |s2 AS (SELECT e.vec_id, e.v, c1.cid,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - c1.c[i]),
        |      list_transform(e.v, (x, i) -> x - c1.c[i])), 6) AS d2
        |  FROM e CROSS JOIN c1),
        |a2 AS (SELECT vec_id, v, cid, d2 FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM s2) WHERE rn = 1),
        |st AS (SELECT cid AS cluster, count(*) AS n_members,
        |    round(avg(d2), 6) AS inertia FROM a2 GROUP BY cid),
        |u2 AS (SELECT cid AS cluster, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER) + 1] AS x
        |  FROM a2, UNNEST(range(len(v))) AS u(i)),
        |cf AS (SELECT cluster, pos, round(avg(x), 6) AS centroid_val
        |  FROM u2 GROUP BY cluster, pos)
        |SELECT cf.cluster, cf.pos, cf.centroid_val, st.n_members, st.inertia
        |FROM cf JOIN st USING (cluster)
        |ORDER BY cf.cluster, cf.pos""".stripMargin,
    // e41: chunk arithmetic via BIGINT `//`; the fingerprint slices the
    // token list 1-based inclusive (list_slice) to the same span Spark's
    // slice(w, start+1, len) takes, then the e36 hex-prefix idiom
    "e41_chunk_overlap" -> e41OracleSql,
    // e41b: the native-Generator twin is oracle-checked against the
    // IDENTICAL recomputation — same rows, same fingerprints
    "e41b_chunk_generator" -> e41OracleSql,
    // e42: the split bucket is a pure function of the normalized-content
    // group hash, so the leak audit's 0 is measured in both engines
    "e42_split_leakage" ->
      """WITH g AS (SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS h,
        |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY 1),
        |s AS (SELECT h, n_docs, n_chars,
        |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT *, CAST(('0x' || substr(md5(h || ':split'), 1, 8))
        |      AS BIGINT) % 10 AS b FROM g)),
        |l AS (SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS leaked_groups
        |  FROM (SELECT h, count(DISTINCT split) AS ns FROM s GROUP BY h))
        |SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  count(*) AS n_groups,
        |  CAST(sum(n_docs) - count(*) AS BIGINT) AS dup_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars, l.leaked_groups
        |FROM s, l GROUP BY split, l.leaked_groups ORDER BY split""".stripMargin,
    // e43: snapshot B derives from A by the same modular rule in both
    // engines; the diff compares hex-prefix digests, never text
    "e43_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS dig,
        |    len(text) AS l
        |  FROM documents),
        |mx AS (SELECT max(doc_id) + 1 AS base FROM documents),
        |b0 AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0),
        |badd AS (SELECT doc_id + mx.base AS doc_id, source, text
        |  FROM documents, mx WHERE doc_id % 11 = 0),
        |b AS (SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS dig,
        |    len(text) AS l
        |  FROM (SELECT * FROM b0 UNION ALL SELECT * FROM badd)),
        |j AS (SELECT a.source AS src_a, b.source AS src_b,
        |    a.dig AS dig_a, b.dig AS dig_b, a.l AS len_a, b.l AS len_b
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT CASE WHEN dig_a IS NULL THEN 'added'
        |            WHEN dig_b IS NULL THEN 'removed'
        |            WHEN dig_a <> dig_b THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |  coalesce(src_b, src_a) AS source,
        |  count(*) AS n_docs, CAST(sum(coalesce(len_b, len_a)) AS BIGINT) AS n_chars
        |FROM j GROUP BY 1, 2 ORDER BY status, source""".stripMargin,
    // e44: hashed unigram+bigram features into 1024 buckets (the e36
    // hex-prefix idiom), add-1 smoothed bucket LMs, per-doc mean log
    // ratio rounded 6 dp; the quintile cut is exact quantile_cont (the
    // e38 percentile pairing)
    "e44_dsir_weights" ->
      """WITH dw AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |dwn AS (SELECT * FROM dw WHERE len(w) > 0),
        |f AS (SELECT doc_id, lang, unnest(w) AS f FROM dwn
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    w[CAST(i AS INTEGER) + 1] || ' ' || w[CAST(i AS INTEGER) + 2] AS f
        |  FROM dwn, UNNEST(range(len(w) - 1)) AS u(i)),
        |fb AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 1024 AS b FROM f),
        |raw AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
        |tgt AS (SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT count(*) AS tr,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt
        |  FROM fb),
        |lm AS (SELECT raw.b,
        |    ln(((coalesce(tgt.ct, 0) + 1.0) / (tot.tt + 1024)) /
        |       ((raw.cr + 1.0) / (tot.tr + 1024))) AS lr
        |  FROM raw LEFT JOIN tgt USING (b), tot),
        |wts AS (SELECT doc_id, lang, round(avg(lr), 6) AS w
        |  FROM fb JOIN lm USING (b) GROUP BY doc_id, lang),
        |cut AS (SELECT round(quantile_cont(w, 0.8), 6) AS cut FROM wts)
        |SELECT lang, count(*) AS n_docs, round(avg(w), 6) AS mean_w,
        |  CAST(sum(CASE WHEN w >= cut.cut THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
        |  round(sum(CASE WHEN w >= cut.cut THEN 1 ELSE 0 END) / count(*), 6)
        |    AS top_share
        |FROM wts, cut GROUP BY lang, cut.cut ORDER BY lang""".stripMargin,
    // e45: the e6 oracle's distinct-shingle CTE with source carried
    // through; novelty = df=1 share per doc, rolled up per source
    "e45_novelty" ->
      """WITH w AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1),
        |      i -> array_to_string(w[i:i+2], ' '))
        |    ELSE [] END) AS sh FROM w),
        |sh AS (SELECT DISTINCT doc_id, source, sh FROM sh0),
        |dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
        |per AS (SELECT doc_id, source, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM sh JOIN dfreq USING (sh) GROUP BY doc_id, source),
        |pn AS (SELECT *, round(n_unique / n_shingles, 6) AS novelty FROM per)
        |SELECT source, count(*) AS n_docs, round(avg(novelty), 6) AS mean_novelty,
        |  CAST(sum(CASE WHEN novelty = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fully_novel,
        |  CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
        |  CAST(sum(n_unique) AS BIGINT) AS n_unique
        |FROM pn GROUP BY source ORDER BY source""".stripMargin,
    // e46: centroid recompute is the e32/e34 oracle; d2 via
    // list_dot_product(diff, diff); mean/σ/d2 all rounded 6 dp before
    // the strict > threshold compare so both engines flag identically
    "e46_embed_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |u AS (SELECT label, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER) + 1] AS x
        |  FROM e, UNNEST(range(len(v))) AS u(i)),
        |c AS (SELECT label, pos, round(avg(x), 6) AS m FROM u GROUP BY label, pos),
        |cl AS (SELECT label, list(m ORDER BY pos) AS c FROM c GROUP BY label),
        |s AS (SELECT e.label, e.vec_id,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - cl.c[i]),
        |      list_transform(e.v, (x, i) -> x - cl.c[i])), 6) AS d2
        |  FROM e JOIN cl USING (label)),
        |st AS (SELECT label, count(*) AS n_vecs, round(avg(d2), 6) AS mean_d2,
        |    round(coalesce(stddev_samp(d2), 0), 6) AS std_d2
        |  FROM s GROUP BY label)
        |SELECT s.label, st.n_vecs, st.mean_d2, st.std_d2,
        |  CAST(sum(CASE WHEN s.d2 > st.mean_d2 + 2.0 * st.std_d2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(sum(CASE WHEN s.d2 > st.mean_d2 + 2.0 * st.std_d2
        |    THEN 1 ELSE 0 END) / st.n_vecs, 6) AS outlier_rate
        |FROM s JOIN st USING (label)
        |GROUP BY s.label, st.n_vecs, st.mean_d2, st.std_d2
        |ORDER BY s.label""".stripMargin,
    // e47: DuckDB builds the same non-overlapping word-2-gram tiles via
    // a list comprehension; both engines round the fraction to 6 dp and
    // carry counts as BIGINT so the declared schemas agree
    "e47_intradoc_dedup" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> len(x) > 0) AS w
        |  FROM documents),
        |t AS (SELECT doc_id,
        |    [array_to_string(w[(i*2+1):(i*2+2)], ' ')
        |      for i in range(0, CAST(ceil(len(w)/2.0) AS INT))] AS tiles
        |  FROM w)
        |SELECT doc_id, CAST(len(tiles) AS BIGINT) AS n_tiles,
        |  CAST(len(list_distinct(tiles)) AS BIGINT) AS n_uniq,
        |  CASE WHEN len(tiles) > 0 THEN
        |    round(1.0 - len(list_distinct(tiles)) / CAST(len(tiles) AS DOUBLE), 6)
        |  END AS intra_dup_frac
        |FROM t ORDER BY doc_id""".stripMargin,
    // e48: the greedy BPE rewrite is a LITERAL string replace in both
    // engines (non-overlapping left-to-right in Spark and DuckDB alike)
    // over the '||'-bounded token encoding, so the merge semantics are
    // identical by construction; DuckDB's range(1, len) is 1..len-1,
    // exactly the 1-based adjacent-pair index set
    "e48_bpe_merge" ->
      """WITH d0 AS (SELECT doc_id,
        |    list_filter(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> regexp_matches(x, '^[a-z0-9]+$')) AS w
        |  FROM documents),
        |docs1 AS (SELECT doc_id, w FROM d0 WHERE len(w) > 0),
        |p1 AS (SELECT w[CAST(i.i AS INTEGER)] AS a,
        |    w[CAST(i.i AS INTEGER) + 1] AS b, count(*) AS n
        |  FROM docs1, UNNEST(range(1, len(w))) AS i(i) GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
        |v1 AS (SELECT count(*) AS vocab_pairs FROM p1),
        |t1 AS (SELECT CAST(sum(len(w)) AS BIGINT) AS toks_before FROM docs1),
        |m1 AS (SELECT doc_id,
        |    list_filter(string_split(
        |      replace('||' || array_to_string(w, '||') || '||',
        |        '|' || b1.a || '||' || b1.b || '|',
        |        '|' || b1.a || '_' || b1.b || '|'), '||'),
        |      x -> x <> '') AS w
        |  FROM docs1, b1),
        |t1a AS (SELECT CAST(sum(len(w)) AS BIGINT) AS toks_after FROM m1),
        |r1 AS (SELECT 1 AS iter, b1.a, b1.b, b1.n AS n_occ,
        |    t1.toks_before - t1a.toks_after AS n_merged,
        |    t1.toks_before, t1a.toks_after, v1.vocab_pairs
        |  FROM b1, v1, t1, t1a),
        |p2 AS (SELECT w[CAST(i.i AS INTEGER)] AS a,
        |    w[CAST(i.i AS INTEGER) + 1] AS b, count(*) AS n
        |  FROM m1, UNNEST(range(1, len(w))) AS i(i) GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
        |v2 AS (SELECT count(*) AS vocab_pairs FROM p2),
        |m2 AS (SELECT doc_id,
        |    list_filter(string_split(
        |      replace('||' || array_to_string(w, '||') || '||',
        |        '|' || b2.a || '||' || b2.b || '|',
        |        '|' || b2.a || '_' || b2.b || '|'), '||'),
        |      x -> x <> '') AS w
        |  FROM m1, b2),
        |t2a AS (SELECT CAST(sum(len(w)) AS BIGINT) AS toks_after FROM m2),
        |r2 AS (SELECT 2 AS iter, b2.a, b2.b, b2.n AS n_occ,
        |    t1a.toks_after - t2a.toks_after AS n_merged,
        |    t1a.toks_after AS toks_before, t2a.toks_after, v2.vocab_pairs
        |  FROM b2, v2, t1a, t2a)
        |SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
        |ORDER BY iter""".stripMargin,
    // e48b: the generalized trainer — 8 chained iterations of the same
    // template, generated (e48bOracleSql); token totals derived via the
    // shared Σlen = Σpairs + n_docs identity
    "e48b_bpe_train" -> e48bOracleSql(8),
    // e48c: the delta-maintained trainer must be INVISIBLE in the
    // result — same 8-merge trace, same oracle as the recount loop
    "e48c_bpe_delta" -> e48bOracleSql(8),
    // e57: both engines derive the identical snapshot pair (the e43
    // rule) and merge it; (doc_id, valid_from) keys the output, so the
    // declared ordering is total. valid_to is a nullable INTEGER on
    // both sides (pandas lifts each to float64 + NaN identically)
    "e57_scd2_merge" ->
      """WITH a AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS dig,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM documents),
        |bs AS (SELECT max(doc_id) + 1 AS base FROM documents),
        |bt AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + bs.base, text FROM documents, bs WHERE doc_id % 11 = 0),
        |b AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS dig,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM bt),
        |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |    a.dig AS dig_a, a.len AS len_a, b.dig AS dig_b, b.len AS len_b
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id),
        |scd AS (
        |SELECT doc_id, 1 AS version, dig_a AS digest, len_a AS n_chars,
        |  1 AS valid_from,
        |  CASE WHEN dig_b IS NULL OR dig_b <> dig_a THEN 2 END AS valid_to,
        |  (dig_b IS NOT NULL AND dig_b = dig_a) AS is_current
        |FROM j WHERE dig_a IS NOT NULL
        |UNION ALL
        |SELECT doc_id, CASE WHEN dig_a IS NULL THEN 1 ELSE 2 END, dig_b, len_b,
        |  2, NULL, TRUE
        |FROM j WHERE dig_b IS NOT NULL AND (dig_a IS NULL OR dig_a <> dig_b)
        |) SELECT * FROM scd ORDER BY doc_id, valid_from""".stripMargin,
    // e49: cosine rounds 6 dp INSIDE the max on both engines (the
    // Spark side's codegen cosine already rounds), and the p99 bar is
    // exact quantile_cont for parity (the e38/e17 stance)
    "e49_semantic_decon" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |b AS (SELECT vec_id AS b_id, v AS bv
        |  FROM e WHERE vec_id % 97 = 0 AND vec_id < 100000),
        |c AS (SELECT * FROM e WHERE NOT (vec_id % 97 = 0 AND vec_id < 100000)),
        |m AS (SELECT c.vec_id, c.label,
        |    max(round(list_dot_product(c.v, b.bv) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(b.bv, b.bv))), 6)) AS max_cos
        |  FROM c CROSS JOIN b GROUP BY 1, 2),
        |p AS (SELECT round(quantile_cont(max_cos, 0.99), 6) AS p99 FROM m)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(sum(CASE WHEN max_cos >= p.p99 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  round(avg(max_cos), 6) AS mean_max_cos, p.p99
        |FROM m, p GROUP BY label, p.p99 ORDER BY label""".stripMargin,
    // e50: shares are double division of the same longs on both
    // engines (DuckDB's *1.0 forces the identical IEEE path)
    "e50_filter_attribution" ->
      """WITH d AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0) AS w FROM documents),
        |f AS (SELECT
        |    len(w) < 20 AS fs,
        |    len(list_distinct(w)) * 1.0 / len(w) < 0.45 AS fl,
        |    NOT list_contains(w, 'the') AS fn,
        |    list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) > 4.8 AS fm
        |  FROM d WHERE len(w) > 0),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN fs THEN 1 ELSE 0 END) AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT) AS l,
        |    CAST(sum(CASE WHEN fn THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN fm THEN 1 ELSE 0 END) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN fs AND NOT fl AND NOT fn AND NOT fm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ss,
        |    CAST(sum(CASE WHEN fl AND NOT fs AND NOT fn AND NOT fm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS sl,
        |    CAST(sum(CASE WHEN fn AND NOT fs AND NOT fl AND NOT fm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS sn,
        |    CAST(sum(CASE WHEN fm AND NOT fs AND NOT fl AND NOT fn
        |      THEN 1 ELSE 0 END) AS BIGINT) AS sm,
        |    CAST(sum(CASE WHEN fs OR fl OR fn OR fm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
        |    count(*) AS n_docs
        |  FROM f),
        |u AS (
        |SELECT 'lowttr' AS filter, l AS n_flagged, sl AS n_sole,
        |    round(l * 1.0 / dropped, 6) AS drop_share, dropped, n_docs FROM a
        |UNION ALL SELECT 'mtl', m, sm, round(m * 1.0 / dropped, 6), dropped, n_docs FROM a
        |UNION ALL SELECT 'nostop', n, sn, round(n * 1.0 / dropped, 6), dropped, n_docs FROM a
        |UNION ALL SELECT 'short', s, ss, round(s * 1.0 / dropped, 6), dropped, n_docs FROM a
        |) SELECT * FROM u ORDER BY filter""".stripMargin,
    "e33_range_join" ->
      """WITH e AS (SELECT event_id AS error_id, CAST(epoch_us(ts) AS BIGINT) AS ets_us
        |  FROM events WHERE event_type = 'error'),
        |p AS (SELECT event_id AS purchase_id, CAST(epoch_us(ts) AS BIGINT) AS pts_us
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT purchase_id, pts_us, error_id, ets_us
        |  FROM p JOIN e ON ets_us <= pts_us AND pts_us <= ets_us + 900000000),
        |r AS (SELECT *, row_number() OVER (PARTITION BY purchase_id
        |    ORDER BY ets_us DESC, error_id) AS rn FROM j)
        |SELECT purchase_id, pts_us AS purchase_ts_us, error_id,
        |  ets_us AS error_ts_us, pts_us - ets_us AS gap_us
        |FROM r WHERE rn = 1 ORDER BY purchase_id""".stripMargin,
    // e33h: buckets derive via double division + floor on BOTH engines
    // (Spark's floor(long/long) is IEEE double math; 900000000.0 forces
    // DuckDB onto the identical path) so bucket ids match bit-for-bit
    "e33h_candidate_volume" ->
      """WITH e AS (SELECT CAST(floor(epoch_us(ts) / 900000000.0) AS BIGINT) AS b0
        |  FROM events WHERE event_type = 'error'),
        |eb AS (SELECT bucket, count(*) AS n_err FROM (
        |    SELECT unnest([b0, b0 + 1]) AS bucket FROM e) GROUP BY bucket),
        |pb AS (SELECT CAST(floor(epoch_us(ts) / 900000000.0) AS BIGINT) AS bucket,
        |    count(*) AS n_purch
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (SELECT eb.n_err * pb.n_purch AS cand FROM eb JOIN pb USING (bucket))
        |SELECT CAST(length(bin(cand)) - 1 AS BIGINT) AS cand_bucket,
        |  count(*) AS n_buckets, CAST(sum(cand) AS BIGINT) AS candidate_volume
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // e52: r is rounded to 6 dp before floor/frac on BOTH engines so
    // the extra-copy threshold is the identical double
    "e52_temp_upsample" ->
      """WITH p AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        |n1 AS (SELECT source, n_src, n_src * 1.0 / sum(n_src) OVER () AS nat FROM p),
        |n2 AS (SELECT source, nat, sqrt(nat) AS sq FROM n1),
        |pol AS (SELECT source,
        |    round(least((sq / sum(sq) OVER ()) / nat, 4.0), 6) AS r FROM n2),
        |d2 AS (SELECT d.source, d.n_chars, pol.r,
        |    CAST(('0x' || substring(md5('up:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) / 4294967296.0 AS u
        |  FROM documents d JOIN pol USING (source)),
        |c AS (SELECT source, r, n_chars,
        |    CAST(floor(r) AS BIGINT)
        |      + (CASE WHEN u < r - floor(r) THEN 1 ELSE 0 END) AS n_copies
        |  FROM d2)
        |SELECT source, count(*) AS n_docs, max(r) AS r_target,
        |  CAST(sum(n_copies) AS BIGINT) AS n_copies,
        |  round(sum(n_copies) * 1.0 / count(*), 6) AS realized_rate,
        |  CAST(sum(n_copies * n_chars) AS BIGINT) AS chars_out
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // e53: z is rounded to 6 dp before the |z| >= 3 threshold; a null
    // z (sub-2-row baseline) is not-anomalous on both engines. The
    // frame is the trailing 24 OBSERVED hourly rows (ROWS BETWEEN, not
    // RANGE): hour gaps stretch it back in wall time and silent hours
    // are never scored — burst/replay detection, not dead-source
    // detection (see the e53 docstring for the densified variant)
    "e53_rate_anomaly" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sc AS (SELECT event_type,
        |    CASE WHEN stddev_samp(n) OVER w > 0
        |      THEN round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 6)
        |    END AS z
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN abs(z) >= 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  max(z) AS max_z, min(z) AS min_z
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e53b: the spine is built from the UNFILTERED bounds so blanked
    // boundary hours cannot shrink the frame; epoch-hour // is integer
    // division on both engines (Spark `div`, DuckDB `//`)
    "e53b_dead_hours" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS hr FROM events),
        |bounds AS (SELECT min(hr) AS mn, max(hr) AS mx FROM b),
        |h AS (SELECT event_type, hr, count(*) AS n_obs FROM b
        |  WHERE (CAST(epoch(hr) AS BIGINT) // 3600) % 97 NOT IN (13, 50)
        |  GROUP BY 1, 2),
        |spine AS (SELECT t.event_type, s.hr
        |  FROM (SELECT DISTINCT event_type FROM b) t
        |  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
        |    FROM bounds) s),
        |d AS (SELECT spine.event_type, spine.hr, coalesce(h.n_obs, 0) AS n
        |  FROM spine LEFT JOIN h ON spine.event_type = h.event_type
        |    AND spine.hr = h.hr),
        |sc AS (SELECT event_type, n, avg(n) OVER w AS mu,
        |    CASE WHEN stddev_samp(n) OVER w > 0
        |      THEN round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 6)
        |    END AS z
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |  CAST(sum(CASE WHEN n = 0 AND mu > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dead,
        |  CAST(sum(CASE WHEN abs(z) >= 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  max(z) AS max_z, min(z) AS min_z
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e58: e10's quality grids (6 dp ratios, 7 dp blend) so both
    // engines rank the identical double; zero-token docs are
    // unscoreable and excluded on both sides
    "e58_domain_cap" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (SELECT doc_id, source,
        |    CAST(length(text) AS INTEGER) AS n_chars_obs,
        |    CAST(len(w) AS INTEGER) AS n_tokens,
        |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
        |      AS INTEGER) AS n_alpha,
        |    CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))
        |      AS INTEGER) AS n_stop
        |  FROM t),
        |q AS (SELECT source, doc_id,
        |    round(round(n_stop / n_tokens, 6) * 0.5 +
        |      round(n_alpha / n_chars_obs, 6) * 0.5, 7) AS quality
        |  FROM m WHERE n_tokens > 0 AND n_chars_obs > 0),
        |r AS (SELECT source, doc_id, quality, CAST(row_number() OVER
        |    (PARTITION BY source ORDER BY quality DESC, doc_id) AS INTEGER) AS rnk
        |  FROM q)
        |SELECT source, doc_id, quality, rnk FROM r WHERE rnk <= 8
        |ORDER BY source, rnk""".stripMargin,
    // e59: the race key lives at ~1e-5, so it rounds on a 12 dp grid
    // (6 dp would collapse the race); ties break on doc_id
    "e59_priority_sample" ->
      """WITH q AS (SELECT doc_id, source, n_chars AS w,
        |    round(-ln((CAST(('0x' || substring(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) + 1) / 4294967296.0) / n_chars, 12) AS skey
        |  FROM documents),
        |s AS (SELECT doc_id, source, w, skey, CAST(row_number() OVER
        |    (ORDER BY skey, doc_id) AS INTEGER) AS rnk FROM q)
        |SELECT rnk, doc_id, source, w, skey FROM s WHERE rnk <= 40
        |ORDER BY rnk""".stripMargin,
    // e60: block cap and length prune applied identically so the pair
    // set — not just the scores — is oracle-pinned
    "e60_edit_confirm" ->
      """WITH t AS (SELECT doc_id,
        |    md5(array_to_string(
        |      list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)[1:3],
        |      ' ')) AS blk,
        |    substring(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 400) AS t
        |  FROM documents),
        |b AS (SELECT doc_id, blk, t, CAST(length(t) AS INTEGER) AS len
        |  FROM t WHERE length(t) > 0),
        |ok AS (SELECT blk FROM b GROUP BY blk HAVING count(*) BETWEEN 2 AND 32),
        |s AS (SELECT b.* FROM b JOIN ok USING (blk)),
        |p AS (SELECT a.doc_id AS a_id, c.doc_id AS b_id,
        |    a.len AS la, c.len AS lb,
        |    CAST(levenshtein(a.t, c.t) AS INTEGER) AS lev
        |  FROM s a JOIN s c ON a.blk = c.blk AND a.doc_id < c.doc_id
        |  WHERE abs(a.len - c.len) * 5 <= greatest(a.len, c.len) * 2)
        |SELECT a_id, b_id, la, lb, lev,
        |  round(1.0 - lev / greatest(la, lb), 6) AS sim,
        |  CAST(CASE WHEN round(1.0 - lev / greatest(la, lb), 6) >= 0.6
        |    THEN 1 ELSE 0 END AS BIGINT) AS confirmed
        |FROM p ORDER BY a_id, b_id""".stripMargin,
    // e61: Monday-start week truncation on both engines; the offset
    // divides an exact multiple of 7 days
    "e61_retention_cohorts" -> e61OracleSql,
    // e61b maintains the distinct (user, week) state incrementally and
    // re-derives the same matrix — the full recompute IS its oracle;
    // e61s folds the same state from micro-batch deltas (set union is
    // idempotent, so even a true double-delivery cannot move the hash)
    "e61b_incr_retention" -> e61OracleSql,
    "e61s_retention_stream" -> e61OracleSql,
    // e62: the oracle recomputes the Morton interleave with DuckDB's own
    // integer bit ops over the RAW events table — the result is
    // layout-invariant, so a z-layout that stored wrong z-values or
    // dropped rows in the rewrite hash-mismatches here. epoch() is
    // fraction-free only after date_trunc('second') (unix_timestamp
    // floors to the second on the engine side).
    "e62_zorder_scan" ->
      """WITH q AS (SELECT user_id AS u,
        |    (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) % 65536 AS h,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id BETWEEN 4 AND 79
        |    AND ts >= TIMESTAMP '2024-01-11 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-21 00:00:00'),
        |s0 AS (SELECT u, cents, u & 65535 AS ub, h & 65535 AS hb FROM q),
        |s1 AS (SELECT u, cents, (ub | (ub << 8)) & 16711935 AS ub,
        |  (hb | (hb << 8)) & 16711935 AS hb FROM s0),
        |s2 AS (SELECT u, cents, (ub | (ub << 4)) & 252645135 AS ub,
        |  (hb | (hb << 4)) & 252645135 AS hb FROM s1),
        |s3 AS (SELECT u, cents, (ub | (ub << 2)) & 858993459 AS ub,
        |  (hb | (hb << 2)) & 858993459 AS hb FROM s2),
        |s4 AS (SELECT u, cents, (ub | (ub << 1)) & 1431655765 AS ub,
        |  (hb | (hb << 1)) & 1431655765 AS hb FROM s3),
        |z AS (SELECT u, cents, (ub | (hb << 1)) >> 20 AS z_tile FROM s4)
        |SELECT z_tile, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(u) AS min_user, max(u) AS max_user
        |FROM z GROUP BY z_tile ORDER BY z_tile""".stripMargin,
    "e63_incr_agg" -> e63OracleSql,
    // e63s folds the SAME refresh through micro-batch deltas — drained
    // state must equal the batch key's answer under the same oracle
    "e63s_incr_stream" -> e63OracleSql,
    // e72: read-at-snapshot over the manifested fold — the pinned
    // snapshot (batch 2 of 4) equals the full recompute over the
    // pre-boundary state plus the first 3 deterministic time-range
    // buckets (eventsStreamBucketed's [tmin + span*i/4) slices)
    "e72_snapshot_read" ->
      """WITH bnd AS (SELECT min(epoch_us(ts)) AS tmin,
        |    max(epoch_us(ts)) AS tmax FROM events),
        |ev AS (SELECT e.* FROM events e, bnd
        |  WHERE e.ts < TIMESTAMP '2024-01-24 00:00:00'
        |     OR epoch_us(e.ts) < bnd.tmin + (bnd.tmax - bnd.tmin + 1) * 3 // 4),
        |p AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |    min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
        |    max(CAST(round(value * 100) AS BIGINT)) AS max_cents
        |  FROM ev GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
        |  min(min_cents) AS min_cents, max(max_cents) AS max_cents,
        |  count(*) AS n_day_partials,
        |  round(CAST(sum(sum_cents) AS DOUBLE) / sum(n), 6) AS avg_cents,
        |  CAST(2 AS BIGINT) AS snapshot_id
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e66: the exact side is the recomputable contract (e18 convention —
    // the oracle cannot build a DataSketches HLL, so it pins the gate);
    // n_day_sketches is the state grain count, recomputed relationally
    "e66_hll_state_merge" ->
      """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events
        |  GROUP BY 1, 2)
        |SELECT e.event_type,
        |  (SELECT count(*) FROM g WHERE g.event_type = e.event_type)
        |    AS n_day_sketches,
        |  count(DISTINCT e.user_id) AS exact_users, TRUE AS hll_ok
        |FROM events e GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // e68: the oracle recomputes the identical binned quantiles from the
    // raw events — bin counts add, thresholds are pure-integer, so the
    // incremental path has no probabilistic slack to hide behind
    "e68_hist_quantiles" ->
      """WITH b AS (SELECT event_type,
        |    least(CAST(round(value * 100) AS BIGINT) // 1000, 39) AS bin,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, n,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS total
        |  FROM b)
        |SELECT event_type, CAST(max(total) AS BIGINT) AS total_n,
        |  CAST(min(CASE WHEN cum * 2 >= total THEN bin END) * 1000 AS BIGINT)
        |    AS p50_cents,
        |  CAST(min(CASE WHEN cum * 10 >= total * 9 THEN bin END) * 1000 AS BIGINT)
        |    AS p90_cents,
        |  CAST(min(CASE WHEN cum * 100 >= total * 99 THEN bin END) * 1000 AS BIGINT)
        |    AS p99_cents
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    // e64: six power-iteration rounds unrolled as CTE chains (the e48
    // oracle convention); every iterate rounded to 12 dp on both engines
    // (the e40 float-parity discipline) so summation order cannot drift
    // the hash. json_valid guards DuckDB's erroring json_extract (the
    // c5 convention — the fixture contains invalid props rows).
    "e64_pagerank" -> {
      val base =
        """WITH ev AS (SELECT user_id, ts, event_id,
          |    CAST(json_extract(props, '$.k') AS BIGINT) AS node
          |  FROM events
          |  WHERE json_valid(props)
          |    AND json_extract(props, '$.k') IS NOT NULL),
          |ed AS (SELECT src, node AS dst, count(*) AS w FROM (
          |    SELECT node, lag(node) OVER (
          |      PARTITION BY user_id ORDER BY ts, event_id) AS src
          |    FROM ev) WHERE src IS NOT NULL GROUP BY 1, 2),
          |nodes AS (SELECT DISTINCT node FROM ev),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |ow AS (SELECT src, sum(w) AS outw FROM ed GROUP BY 1),
          |pe AS (SELECT ed.src, ed.dst, CAST(ed.w AS DOUBLE) / ow.outw AS p
          |  FROM ed JOIN ow USING (src)),
          |sn AS (SELECT DISTINCT src FROM pe),
          |r0 AS (SELECT node,
          |  round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 12) AS rank
          |  FROM nodes)""".stripMargin
      val iter = (1 to 6).map { k =>
        s"""d$k AS (SELECT round(coalesce(sum(rank), 0), 12) AS dang
           |  FROM r${k - 1} WHERE node NOT IN (SELECT src FROM sn)),
           |c$k AS (SELECT pe.dst, round(sum(pe.p * r.rank), 12) AS m
           |  FROM pe JOIN r${k - 1} r ON pe.src = r.node GROUP BY 1),
           |r$k AS (SELECT nodes.node,
           |  round(round(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn), 12)
           |    + CAST(0.85 AS DOUBLE) * (coalesce(c$k.m, 0)
           |      + (SELECT dang FROM d$k) / (SELECT n FROM nn)), 12) AS rank
           |  FROM nodes LEFT JOIN c$k ON nodes.node = c$k.dst)""".stripMargin
      }.mkString(",\n")
      val tail =
        """SELECT r6.node, r6.rank,
          |  CAST(coalesce(ind.in_deg, 0) AS BIGINT) AS in_deg
          |FROM r6 LEFT JOIN (SELECT dst, count(*) AS in_deg
          |  FROM pe GROUP BY 1) ind ON r6.node = ind.dst
          |ORDER BY node""".stripMargin
      s"$base,\n$iter\n$tail"
    },
    // e65: PQ encode + asymmetric distance, recomputed relationally —
    // the engine's per-subspace when-chain over literal codewords and
    // the oracle's (m, code) lookup-table join are the same arithmetic
    // over the same 6-dp-rounded codebooks and sub-distances
    "e65_pq_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (SELECT CAST(vec_id AS INT) AS cid,
        |    list_transform(v, x -> round(x, 6)) AS c
        |  FROM e WHERE vec_id < 4),
        |sub AS (SELECT ms.m, cb.cid,
        |    cb.c[CAST(ms.m*16+1 AS INT) : CAST(ms.m*16+16 AS INT)] AS cw
        |  FROM cb CROSS JOIN range(4) ms(m)),
        |dist AS (SELECT e.vec_id, s.m, s.cid,
        |    round(list_sum(list_transform(range(16), i ->
        |      (v[CAST(s.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)])
        |      * (v[CAST(s.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)]))), 6) AS d2
        |  FROM e CROSS JOIN sub s),
        |enc AS (SELECT vec_id, m, cid FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn FROM dist)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e
        |  WHERE vec_id >= 10 AND vec_id < 13),
        |qd AS (SELECT q.q_id, s.m, s.cid,
        |    round(list_sum(list_transform(range(16), i ->
        |      (qv[CAST(s.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)])
        |      * (qv[CAST(s.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)]))), 6) AS d2
        |  FROM q CROSS JOIN sub s),
        |adc AS (SELECT qd.q_id, enc.vec_id AS cand_id,
        |    round(sum(qd.d2), 6) AS adc_d2
        |  FROM enc JOIN qd ON enc.m = qd.m AND enc.cid = qd.cid
        |  WHERE enc.vec_id <> qd.q_id GROUP BY 1, 2),
        |exact AS (SELECT q.q_id, e.vec_id AS cand_id,
        |    round(list_sum(list_transform(range(64), i ->
        |      (qv[CAST(i+1 AS INT)] - v[CAST(i+1 AS INT)])
        |      * (qv[CAST(i+1 AS INT)] - v[CAST(i+1 AS INT)]))), 6) AS exact_d2
        |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
        |rk AS (SELECT q_id, cand_id, adc_d2, row_number() OVER
        |    (PARTITION BY q_id ORDER BY adc_d2, cand_id) AS rank
        |  FROM adc)
        |SELECT rk.q_id, CAST(rk.rank AS INT) AS rank, rk.cand_id,
        |  rk.adc_d2, exact.exact_d2
        |FROM rk JOIN exact USING (q_id, cand_id)
        |WHERE rk.rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // e65b: the oracle replays the TRAINING trajectory too — seed books
    // (cb0) → assign (a0, row_number over (d2, j) = the engine's
    // keep-earlier fold) → recentered books (cb1, round(avg,6) per
    // position = the VectorCentroid contract) — then gates the same
    // encode/ADC/exact tail as e65 under the trained books
    "e65b_pq_trained" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb0 AS (SELECT ms.m, CAST(cb.vec_id AS INT) AS j,
        |    list_transform(cb.v, x -> round(x, 6))
        |      [CAST(ms.m*16+1 AS INT) : CAST(ms.m*16+16 AS INT)] AS cw
        |  FROM e cb CROSS JOIN range(4) ms(m) WHERE cb.vec_id < 4),
        |d0 AS (SELECT e.vec_id, c.m, c.j,
        |    round(list_sum(list_transform(range(16), i ->
        |      (v[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)])
        |      * (v[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)]))), 6) AS d2
        |  FROM e CROSS JOIN cb0 c),
        |a0 AS (SELECT vec_id, m, j FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id, m ORDER BY d2, j) AS rn FROM d0) WHERE rn = 1),
        |u0 AS (SELECT a0.m, a0.j, CAST(t.i AS INT) AS pos,
        |    e.v[CAST(a0.m*16 + t.i + 1 AS INT)] AS x
        |  FROM a0 JOIN e USING (vec_id), UNNEST(range(16)) AS t(i)),
        |cb1 AS (SELECT m, j, list(mm ORDER BY pos) AS cw FROM (
        |    SELECT m, j, pos, round(avg(x), 6) AS mm FROM u0 GROUP BY m, j, pos)
        |  GROUP BY m, j),
        |d1 AS (SELECT e.vec_id, c.m, c.j,
        |    round(list_sum(list_transform(range(16), i ->
        |      (v[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)])
        |      * (v[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)]))), 6) AS d2
        |  FROM e CROSS JOIN cb1 c),
        |enc AS (SELECT vec_id, m, j FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id, m ORDER BY d2, j) AS rn FROM d1) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e
        |  WHERE vec_id >= 10 AND vec_id < 13),
        |qd AS (SELECT q.q_id, c.m, c.j,
        |    round(list_sum(list_transform(range(16), i ->
        |      (qv[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)])
        |      * (qv[CAST(c.m*16+i+1 AS INT)] - cw[CAST(i+1 AS INT)]))), 6) AS d2
        |  FROM q CROSS JOIN cb1 c),
        |adc AS (SELECT qd.q_id, enc.vec_id AS cand_id,
        |    round(sum(qd.d2), 6) AS adc_d2
        |  FROM enc JOIN qd ON enc.m = qd.m AND enc.j = qd.j
        |  WHERE enc.vec_id <> qd.q_id GROUP BY 1, 2),
        |exact AS (SELECT q.q_id, e.vec_id AS cand_id,
        |    round(list_sum(list_transform(range(64), i ->
        |      (qv[CAST(i+1 AS INT)] - v[CAST(i+1 AS INT)])
        |      * (qv[CAST(i+1 AS INT)] - v[CAST(i+1 AS INT)]))), 6) AS exact_d2
        |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
        |rk AS (SELECT q_id, cand_id, adc_d2, row_number() OVER
        |    (PARTITION BY q_id ORDER BY adc_d2, cand_id) AS rank
        |  FROM adc)
        |SELECT rk.q_id, CAST(rk.rank AS INT) AS rank, rk.cand_id,
        |  rk.adc_d2, exact.exact_d2
        |FROM rk JOIN exact USING (q_id, cand_id)
        |WHERE rk.rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // e51: (ts, event_id) tie-break makes the per-user sequence — and
    // therefore every transition count — identical on both engines
    "e51_event_transitions" ->
      """WITH s AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n,
        |  round(count(*) * 1.0 / sum(count(*))
        |    OVER (PARTITION BY from_type), 6) AS p_to
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY from_type, event_type
        |ORDER BY from_type, to_type""".stripMargin,
    // e51s: the incremental (one-row-of-state-per-user) path must
    // converge to the batch window's answer — same oracle as e51
    "e51s_transitions_stream" ->
      """WITH s AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n,
        |  round(count(*) * 1.0 / sum(count(*))
        |    OVER (PARTITION BY from_type), 6) AS p_to
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY from_type, event_type
        |ORDER BY from_type, to_type""".stripMargin,
    "p1_key_extract" ->
      """SELECT o_orderkey,
        |  (string_split('https://example.org/d/ord-' || CAST(o_orderkey AS VARCHAR), '/'))[-1] AS id
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p2_prefix_filter" ->
      """SELECT id FROM (
        |  SELECT CASE WHEN o_orderkey % 3 = 0
        |    THEN 'ord-' || CAST(o_orderkey AS VARCHAR)
        |    ELSE 'doc-' || CAST(o_orderkey AS VARCHAR) END AS id
        |  FROM orders) t
        |WHERE starts_with(id, 'ord-') ORDER BY id""".stripMargin,
    "p3_type_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE l_linenumber = 2 ORDER BY l_orderkey, l_partkey""".stripMargin,
    "p4_bool_filter" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "p5_tagged_union" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'R' THEN 'moles'
        |       WHEN l_returnflag = 'A' THEN 'volume'
        |       ELSE 'mass' END AS amount_kind,
        |  l_quantity AS amount_value,
        |  CASE WHEN l_returnflag = 'R' THEN 'MOLE'
        |       WHEN l_returnflag = 'A' THEN 'LITER'
        |       ELSE 'GRAM' END AS amount_units
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, amount_kind, amount_value""".stripMargin,
    "p6_restructure" ->
      """SELECT c_custkey, c_name AS name, c_mktsegment AS segment,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "p7_coalesce_defaults" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS status,
        |  coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), '0-DEFAULT') AS priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "j1_broadcast_decode" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_linenumber WHEN 1 THEN 'REACTANT' WHEN 2 THEN 'REAGENT'
        |    WHEN 3 THEN 'SOLVENT' WHEN 4 THEN 'CATALYST'
        |    WHEN 5 THEN 'INTERNAL_STANDARD' ELSE 'UNKNOWN' END AS role
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "j1b_map_decode" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_linenumber WHEN 1 THEN 'REACTANT' WHEN 2 THEN 'REAGENT'
        |    WHEN 3 THEN 'SOLVENT' WHEN 4 THEN 'CATALYST'
        |    WHEN 5 THEN 'INTERNAL_STANDARD' ELSE 'UNKNOWN' END AS role
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "j2_smj_reassemble" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_ids
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "j3_self_join" ->
      """SELECT a.l_orderkey AS l_orderkey, part1, qty1, part2, qty2 FROM
        |  (SELECT l_orderkey, l_partkey AS part1, l_quantity AS qty1
        |   FROM lineitem WHERE l_linenumber = 1) a
        |JOIN
        |  (SELECT l_orderkey, l_partkey AS part2, l_quantity AS qty2
        |   FROM lineitem WHERE l_linenumber = 2) b
        |USING (l_orderkey) ORDER BY l_orderkey, part1, qty1, part2, qty2""".stripMargin,
    "j3b_semi" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey IN
        |  (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "j3c_anti" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM lineitem WHERE l_quantity >= 48 AND l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "f1_posexplode_tabs" ->
      """SELECT l_orderkey,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey) - 1 AS INTEGER) AS pos,
        |  l_linenumber, l_partkey
        |FROM lineitem ORDER BY l_orderkey, pos""".stripMargin,
    "f2_explode_components" ->
      "SELECT l_orderkey, l_partkey FROM lineitem ORDER BY l_orderkey, l_partkey",
    "f3_explode_ids" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        |FROM part ORDER BY p_partkey, word""".stripMargin,
    "f4_double_flatten" ->
      """SELECT l_orderkey, l_returnflag, l_partkey FROM lineitem
        |ORDER BY l_orderkey, l_returnflag, l_partkey""".stripMargin,
    "f5_explode_outer" ->
      """SELECT o_orderkey, li.l_partkey AS big_part FROM orders
        |LEFT JOIN (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 49) li
        |ON o_orderkey = li.l_orderkey
        |ORDER BY o_orderkey, big_part NULLS FIRST""".stripMargin,
    "a1_count_group" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a2_cond_count" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_totalprice > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a3_rollup_totals" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS n, CAST(round(sum(l_quantity)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "a4_collect_list" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a5_regex_ceil" ->
      """SELECT o_orderpriority,
        |  CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS INTEGER) AS code,
        |  count(*) AS n, (count(*) + 99) // 100 AS pages
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "d1_dedup_first_seen" ->
      """SELECT o_custkey, min(o_orderkey) AS first_order FROM orders
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "d2_union_priority" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey,
        |    CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 2 END AS prio
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY o_custkey ORDER BY prio, o_orderkey) AS rn FROM c)
        |SELECT o_custkey, o_orderkey AS picked, prio FROM r WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "l1_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 10""".stripMargin,
    "l2_offset_limit" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,
    "x1_string_funcs" ->
      """SELECT c_custkey,
        |  (string_split(c_name, '#'))[-1] AS name_id,
        |  starts_with(c_name, 'Customer#') AS is_cust,
        |  trim('  ' || c_mktsegment || ' ') AS seg_trim,
        |  regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS digits,
        |  'cust-' || CAST(c_custkey AS VARCHAR) AS url_id,
        |  substring(c_name, 1, 10) AS name10
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x2_array_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) || '|' || upper(o_orderstatus) || '|EXTRA' AS parts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "e4_time_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "e5_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |      + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess_id FROM e)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS sess_start,
        |  count(*) AS n
        |FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_start""".stripMargin,
    // streaming dedup parity: the deduped stream's per-type key count
    // must equal batch count(DISTINCT) — first-arrival row choice is
    // nondeterministic, the distinct-key count is not
    "e1s_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_uniq_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // bounded-state dedup must still equal the batch-global distinct:
    // keys recur only within their day, files replay in timeline order,
    // so every duplicate meets live state (see e1sbDedupBounded scaladoc)
    "e1sb_dedup_bounded" ->
      """SELECT event_type,
        |  count(DISTINCT (user_id, date_trunc('day', ts))) AS n_user_days
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e4b_stream_parity" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // e4l: reproduce Spark's watermark drop/emit rule from the batch
    // table. Buckets: the same integer-division boundaries the staging
    // computes; replay positions: the fixed 0,2,4,1,3,5 permutation;
    // watermark before position p: (ms-truncated max event time over
    // positions < p) − 600000 ms (Spark accumulates eventTimeUs/1000);
    // a row is KEPT iff its hour-window end (µs) > watermark·1000, a
    // window is EMITTED iff its end ≤ final watermark·1000.
    "e4l_late_drop" ->
      """WITH stats AS (SELECT min(epoch_us(ts)) AS ts_min,
        |    max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span FROM events),
        |b AS (SELECT CAST(t.i AS INTEGER) AS i,
        |    ts_min + (span * t.i) // 6 AS lo,
        |    ts_min + (span * (t.i + 1)) // 6 AS hi
        |  FROM range(6) t(i), stats),
        |pos(i, p) AS (VALUES (0,0),(2,1),(4,2),(1,3),(3,4),(5,5)),
        |e AS (SELECT ev.event_type, ev.value, ev.ts, epoch_us(ev.ts) AS ets_us,
        |    pos.p AS p
        |  FROM events ev
        |  JOIN b ON epoch_us(ev.ts) >= b.lo AND epoch_us(ev.ts) < b.hi
        |  JOIN pos ON pos.i = b.i),
        |bmax AS (SELECT p, max(ets_us) // 1000 AS max_ms FROM e GROUP BY p),
        |wm AS (SELECT p, max(max_ms) OVER (ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000 AS wm_ms
        |  FROM bmax),
        |kept AS (SELECT e.* FROM e JOIN wm ON e.p = wm.p
        |  WHERE wm.wm_ms IS NULL
        |    OR (epoch_us(date_trunc('hour', e.ts)) + 3600000000) > wm.wm_ms * 1000),
        |fin AS (SELECT max(ets_us) // 1000 - 600000 AS fwm_ms FROM e)
        |SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM kept, fin
        |GROUP BY 1, 2, fin.fwm_ms
        |HAVING (min(epoch_us(date_trunc('hour', ts))) + 3600000000) <= fwm_ms * 1000
        |ORDER BY win_start, event_type""".stripMargin,
    "e5b_stream_parity" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |      + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |g AS (SELECT user_id, ts,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess_id FROM e)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS sess_start,
        |  count(*) AS n
        |FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_start""".stripMargin,
    "c5_dead_letter" ->
      // json_extract guarded by json_valid: DuckDB's json_extract ERRORS on
      // malformed JSON (vs Spark's PERMISSIVE null), so an unguarded oracle
      // would crash on the very rows the dead-letter query exists to count
      """SELECT event_type, count(*) AS n_total,
        |  CAST(sum(CASE WHEN props IS NOT NULL AND NOT json_valid(props)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
        |  CAST(sum(CASE WHEN json_valid(props)
        |    THEN CAST(json_extract(props, '$.k') AS INTEGER) END) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s2b_partition_pruned" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    // the custom-state stream must converge to the plain batch aggregate
    "c4_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(coalesce(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e1_text_dedup" ->
      """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |  min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin,
    // hash-independent output: Spark groups by xxhash64(normalized text),
    // the oracle by the normalized text itself — identical groupings
    // absent 64-bit collisions (the hash values themselves are not
    // exposed, DuckDB having no xxhash64)
    "e1x_dedup_xxhash" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |ORDER BY keeper_id""".stripMargin,
    "x3_salted_agg" ->
      """SELECT CASE l_returnflag WHEN 'R' THEN 'RETURNED'
        |  WHEN 'A' THEN 'ACCEPTED' ELSE 'NONE' END AS flag_name,
        |  count(*) AS n, CAST(round(sum(l_quantity)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY flag_name""".stripMargin,
    // the bucketed layout changes the PLAN (zero-Exchange SMJ, asserted in
    // ScaleJoinSpec), never the ANSWER — the oracle is the plain join
    "x4_bucketed_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  CAST(round(sum(l_quantity)) AS BIGINT) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "e2_cosine_topk" -> e2OracleSql,
    // e2i reads the SAME vectors through the persisted cell-partitioned
    // IVF layout — probe-pruned directories, identical ranking: the
    // layout changes the plan, never the answer, so the oracle IS e2's
    "e2i_ivf_index_scan" -> e2OracleSql,
    // e2t: the oracle replays the WHOLE trained chain — e40's two Lloyd
    // iterations (the e40 oracle's CTEs verbatim), the final-centroid
    // assignment that partitions the index, the query-cell probe, and
    // the in-cell cosine top-3 — so drift anywhere in
    // train → persist → probe is a hash miss
    "e2t_trained_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid,
        |    list_transform(v, x -> round(x, 6)) AS c
        |  FROM e WHERE vec_id < 8),
        |s1 AS (SELECT e.vec_id, e.v, c0.cid,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - c0.c[i]),
        |      list_transform(e.v, (x, i) -> x - c0.c[i])), 6) AS d2
        |  FROM e CROSS JOIN c0),
        |a1 AS (SELECT vec_id, v, cid FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM s1) WHERE rn = 1),
        |u1 AS (SELECT cid, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER) + 1] AS x
        |  FROM a1, UNNEST(range(len(v))) AS u(i)),
        |c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM (
        |    SELECT cid, pos, round(avg(x), 6) AS m FROM u1 GROUP BY cid, pos)
        |  GROUP BY cid),
        |s2 AS (SELECT e.vec_id, e.v, c1.cid,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - c1.c[i]),
        |      list_transform(e.v, (x, i) -> x - c1.c[i])), 6) AS d2
        |  FROM e CROSS JOIN c1),
        |a2 AS (SELECT vec_id, v, cid FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM s2) WHERE rn = 1),
        |u2 AS (SELECT cid, CAST(u.i AS INTEGER) AS pos,
        |    v[CAST(u.i AS INTEGER) + 1] AS x
        |  FROM a2, UNNEST(range(len(v))) AS u(i)),
        |cf AS (SELECT cid, list(m ORDER BY pos) AS c FROM (
        |    SELECT cid, pos, round(avg(x), 6) AS m FROM u2 GROUP BY cid, pos)
        |  GROUP BY cid),
        |sf AS (SELECT e.vec_id, e.v, cf.cid,
        |    round(list_dot_product(
        |      list_transform(e.v, (x, i) -> x - cf.c[i]),
        |      list_transform(e.v, (x, i) -> x - cf.c[i])), 6) AS d2
        |  FROM e CROSS JOIN cf),
        |asg AS (SELECT vec_id, v, cid AS cell,
        |    list_dot_product(v, v) AS nrm
        |  FROM (SELECT *, row_number() OVER
        |    (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM sf) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv, cell, nrm AS qn FROM asg
        |  WHERE vec_id < 8),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
        |  FROM q JOIN asg c ON q.cell = c.cell AND c.vec_id <> q.q_id),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
        |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
        |ORDER BY q_id, "rank"""".stripMargin,
    // the serve family: the oracle replays the whole build (k=64
    // seeding, one Lloyd recompute, corpus assignment) plus the probe
    // the engine times — see ivfServeOracleSql
    "e2v_ivf_serve" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 1, candLabelFilter = false),
    "e2w_ivf_multiprobe" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 4, candLabelFilter = false),
    "e2a_filtered_ann" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 1, candLabelFilter = true),
    // e2x: the recall knob and the attribute predicate composed —
    // e2w's 4-cell sweep with e2a's candidate predicate
    "e2x_filtered_multiprobe" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 4, candLabelFilter = true),
    // e2n: the declared recall/cost curve — see e2nOracleSql
    "e2n_nprobe_sweep" -> e2nOracleSql,
    // e2q: ad-hoc literal query vectors through the trained layout —
    // the oracle splices the SAME declared literals (see e2qOracleSql)
    "e2q_adhoc_vectors" -> e2qOracleSql,
    // e2y: curve + argmin + serve replay at the chosen widths — see
    // e2yOracleSql
    "e2y_recall_policy" -> e2yOracleSql,
    // e71: hybrid retrieval — BM25 leg + IVF-multiprobe leg + RRF
    // fusion, all three replayed end-to-end (see e71OracleSql)
    "e71_hybrid_rrf" -> e71OracleSql,
    // e71v: the same fusion with BOTH legs pinned at one corpus
    // version (see e71vOracleSql)
    "e71v_hybrid_snapshot" -> e71vOracleSql,
    // e71f: one source predicate on both legs — lexical pre-filtered
    // in the pruned scan, vector post-filtered behind the DECLARED
    // over-fetch cap (the capped shortlist is part of the contract:
    // the oracle replays it exactly — see e71fOracleSql)
    "e71f_filtered_hybrid" -> e71fOracleSql,
    "e71q_adhoc_hybrid" -> e71qOracleSql,
    // e2pq reads the SAME probed cells through the stored-codes ADC
    // shortlist + exact rescore — the LAYOUT changes the plan (codes
    // scan + point fetch), never the answer: exact top-3 ⊆ ADC top-64
    // (spec-pinned), so the oracle IS e2v's (the e2i precedent)
    "e2pq_ivfpq_probe" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 1, candLabelFilter = false),
    // e2pw: the multi-probe serve through the PQ format — e2w's oracle
    // verbatim (layout invariance at nprobe=4)
    "e2pw_ivfpq_multiprobe" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 4, candLabelFilter = false),
    // e2px: filtered multiprobe through the PQ format — e2x's oracle
    // verbatim (layout invariance under the filtered candidate set)
    "e2px_filtered_pq" ->
      ivfServeOracleSql("TRUE", "vec_id < 64", 4, candLabelFilter = true),
    // e2f: the quantizer trains on the PRE-ARRIVAL base only (the
    // frozen-quantizer maintenance contract) but the assignment — and
    // so the probe's candidate set — covers base AND folded arrivals:
    // a dropped/duplicated/mis-assigned arriving vector is a hash miss
    "e2f_ivf_fold" ->
      ivfServeOracleSql("vec_id >= 16", "vec_id < 80", 1, candLabelFilter = false),
    // e2z: the e2f chain probed AT snapshot 2 — candidates restricted
    // to base ∪ the batch prefix ≤ 2 (arrival buckets are contiguous
    // vec_id ranges of 16/4 = 4, so prefix ≤ 2 is vec_id < 12); a
    // snapshot that leaked batch 3's arrivals or lost a pinned one is
    // a hash miss
    "e2z_fold_snapshot" ->
      ivfServeOracleSql("vec_id >= 16", "vec_id < 80", 1, candLabelFilter = false,
        extraCandPred = "c.vec_id >= 16 OR c.vec_id < 12",
        snapshotIdOut = Some(graft.streaming.VecStreams.DeclaredVecSnap)),
    // e2d: live-docs tombstones on the vector index — the e2f chain
    // with candidates restricted to corpus − the declared delete set
    // (the quantizer stays frozen: deletes change candidacy, never the
    // trained model); a served deleted vector is a hash miss
    "e2d_vec_tombstone" ->
      ivfServeOracleSql("vec_id >= 16", "vec_id < 80", 1, candLabelFilter = false,
        extraCandPred = "NOT (c.vec_id % 7 = 3 AND c.vec_id < 48)"),
    // e2tm: the tier merge relocates fold rows, never changes them —
    // the declared rows are e2f's verbatim (the e35t discipline on the
    // vector folds); the spec pins the collapsed read set and the
    // untouched base lists
    "e2tm_vec_tier_merge" ->
      ivfServeOracleSql("vec_id >= 16", "vec_id < 80", 1, candLabelFilter = false),
    // e2u: upserts — candidates assigned from the LATEST-VERSION
    // corpus (the declared negation in SQL) under centroids trained on
    // the ORIGINAL base; queries stay the original embeddings (the
    // request owns its vector); a served stale version is a hash miss
    "e2u_vec_upsert" -> e2uOracleSql,
    // e2g: per-cell occupancy of base vs folded arrivals under e2f's
    // frozen quantizer — the drift gate's declared metric; the oracle
    // recomputes both occupancy sides from the same assignment chain,
    // so a mis-assigned/dropped/double-counted arrival is a hash miss
    "e2g_drift_gate" ->
      s"""${ivfChainPrefix("vec_id >= 16", "vec_id < 80")},
         |bc AS (SELECT cell, count(*) AS n_base FROM asg WHERE vec_id >= 16 GROUP BY cell),
         |ac AS (SELECT cell, count(*) AS n_arr FROM asg WHERE vec_id < 16 GROUP BY cell),
         |tot AS (SELECT (SELECT count(*) FROM asg WHERE vec_id >= 16) AS tb,
         |               (SELECT count(*) FROM asg WHERE vec_id < 16) AS ta),
         |cells AS (SELECT coalesce(bc.cell, ac.cell) AS cell,
         |    coalesce(n_base, 0) AS n_base, coalesce(n_arr, 0) AS n_arr
         |  FROM bc FULL JOIN ac ON bc.cell = ac.cell),
         |sh2 AS (SELECT cell, n_base, n_arr,
         |    round(n_base / CAST(tb AS DOUBLE), 6) AS base_share,
         |    round(n_arr / CAST(ta AS DOUBLE), 6) AS arr_share,
         |    round(abs(round(n_arr / CAST(ta AS DOUBLE), 6)
         |      - round(n_base / CAST(tb AS DOUBLE), 6)), 6) AS share_drift
         |  FROM cells CROSS JOIN tot),
         |mxd AS (SELECT max(share_drift) AS max_drift FROM sh2)
         |SELECT cell, n_base, n_arr, base_share, arr_share, share_drift,
         |  mxd.max_drift, mxd.max_drift > CAST(0.5 AS DOUBLE) AS gate_tripped
         |FROM sh2 CROSS JOIN mxd WHERE n_arr > 0 ORDER BY cell""".stripMargin,
    "e2c_topk_native" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, list_dot_product(v, v) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
        |  FROM q JOIN n c ON q.label = c.label AND c.vec_id <> q.q_id),
        |r AS (SELECT *, row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS rn FROM j)
        |SELECT q_id, cand_id, cos_sim FROM r WHERE rn <= 3
        |ORDER BY q_id, cos_sim DESC, cand_id""".stripMargin,
    "e2b_cosine_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |  (CASE WHEN v[1]+v[2]-v[3]-v[4] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[5]+v[6]-v[7]-v[8] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[9]+v[10]-v[11]-v[12] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[13]+v[14]-v[15]-v[16] >= 0 THEN '1' ELSE '0' END) AS bkt
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, bkt, v AS qv FROM b WHERE vec_id < 8),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qv, c.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))), 6)
        |      AS cos_sim
        |  FROM q JOIN b c ON q.bkt = c.bkt AND c.vec_id <> q.q_id),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
        |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
        |ORDER BY q_id, "rank"""".stripMargin,
    "e13_embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
        |    AS cos_sim
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
        |ORDER BY a.label, id1, id2""".stripMargin,
    "e15_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS t_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |cv AS (SELECT e.user_id, min(e.ts) AS t_conv FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.t_signup
        |  GROUP BY e.user_id)
        |SELECT su.user_id,
        |  CAST(epoch(date_trunc('second', t_signup)) AS BIGINT) AS signup_s,
        |  CAST(epoch(date_trunc('second', t_conv)) AS BIGINT) AS conv_s,
        |  t_conv IS NOT NULL AS converted,
        |  CAST(epoch(date_trunc('second', t_conv)) AS BIGINT)
        |    - CAST(epoch(date_trunc('second', t_signup)) AS BIGINT) AS delay_s
        |FROM su LEFT JOIN cv ON su.user_id = cv.user_id
        |ORDER BY su.user_id""".stripMargin,
    "e16_dedup_clusters" -> e16CcSql,
    // e67: e16's CC chain continued into the cluster-keyed split; the
    // leakage gate is recomputed relationally on both engines
    "e67_cluster_split" -> {
      val chain = e16CcSql.substring(0, e16CcSql.lastIndexOf("SELECT doc_id, cluster_id,"))
      chain.stripSuffix("\n") + ",\n" +
        """rp AS (SELECT d.doc_id, d.n_chars,
          |    coalesce(lab.cluster_id, d.doc_id) AS rep
          |  FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
          |asg AS (SELECT doc_id, n_chars, rep,
          |    ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT % 10
          |      AS bucket FROM rp),
          |sp AS (SELECT *, CASE WHEN bucket < 8 THEN 'train'
          |    WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split FROM asg),
          |lk AS (SELECT count(*) AS leak_clusters FROM (
          |  SELECT rep FROM sp GROUP BY rep HAVING count(DISTINCT split) > 1))
          |SELECT split, count(*) AS n_docs, count(DISTINCT rep) AS n_clusters,
          |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
          |  (SELECT leak_clusters FROM lk) AS leak_clusters
          |FROM sp GROUP BY split ORDER BY split""".stripMargin
    },
    // end-to-end dedup: e6 candidates (jaccard >= 0.5) -> recursive-CTE
    // connected components -> min-id keeper per cluster -> survivor
    // stats. The keeper test is doc_id = cluster_id because min-reach
    // labels with the component minimum (D1 first-seen semantics).
    "e19_dedup_pipeline" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END) AS sh FROM w),
        |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
        |sigs AS (SELECT doc_id, hid, min(md5(CAST(hid AS VARCHAR) || ':' || sh)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS hid) h GROUP BY doc_id, hid),
        |bands AS (SELECT doc_id, hid // 2 AS band,
        |  md5(string_agg(mh, '' ORDER BY hid)) AS bh FROM sigs GROUP BY doc_id, hid // 2),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (SELECT p.d1, p.d2, count(*) AS n_common FROM pairs p
        |  JOIN sh s1 ON s1.doc_id = p.d1
        |  JOIN sh s2 ON s2.doc_id = p.d2 AND s2.sh = s1.sh
        |  GROUP BY 1, 2),
        |cand AS (SELECT p.d1, p.d2 FROM pairs p
        |  JOIN common c ON p.d1 = c.d1 AND p.d2 = c.d2
        |  JOIN counts c1 ON c1.doc_id = p.d1
        |  JOIN counts c2 ON c2.doc_id = p.d2
        |  WHERE round(c.n_common / (c1.n_sh + c2.n_sh - c.n_common), 6) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM cand
        |  UNION SELECT d2 AS a, d1 AS b FROM cand),
        |verts AS (SELECT DISTINCT a AS node FROM edges),
        |reach AS (
        |  SELECT node, node AS r FROM verts
        |  UNION
        |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON reach.node = e.b),
        |lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM lab WHERE node != cluster_id)
        |SELECT d.source, count(*) AS n_total,
        |  count(*) FILTER (WHERE dr.node IS NULL) AS n_kept,
        |  count(dr.node) AS n_dropped,
        |  CAST(sum(d.n_chars) FILTER (WHERE dr.node IS NULL) AS BIGINT) AS chars_kept
        |FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.node
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // e70: the full-width curation DAG as ONE oracle — decon → quality
    // → dedup (CC keeper) → mixture → packing → shard manifest, every
    // stage consuming the previous stage's survivors; drift anywhere
    // reshapes the windows and misses the 64-row hash. Since r13 the
    // packing window is keyed by (source, pack_shard) — e26's hash —
    // and e70b appends the leakage-safe split (the e70Chain CTEs are
    // shared verbatim).
    "e70_curation_pipeline" -> (e70ChainSql +
      """,
        |pk0 AS (SELECT doc_id, source, n_tok,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
        |    AS pack_shard FROM mx),
        |pk AS (SELECT doc_id, source, pack_shard, n_tok,
        |  CAST(floor((sum(n_tok) OVER (PARTITION BY source, pack_shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 256)
        |    AS BIGINT) AS window_id
        |  FROM pk0),
        |wins AS (SELECT source, pack_shard, window_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(('0x' || substring(md5(source || ':' || CAST(pack_shard AS VARCHAR)
        |    || ':' || CAST(window_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS shard
        |  FROM pk GROUP BY source, pack_shard, window_id)
        |SELECT shard, count(*) AS n_windows, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM wins GROUP BY shard ORDER BY shard""".stripMargin),
    // e70b: the chain + e67's cluster-keyed split (md5 of the stage-3
    // CC rep, 80/10/10), split-then-pack so a window can never straddle
    // splits, leak_clusters recomputed relationally
    "e70b_curation_split" -> (e70ChainSql +
      """,
        |rp AS (SELECT mx.doc_id, mx.source, mx.n_tok,
        |    coalesce(lab.cluster_id, mx.doc_id) AS rep
        |  FROM mx LEFT JOIN lab ON lab.node = mx.doc_id),
        |spl AS (SELECT doc_id, source, n_tok, rep,
        |  CASE WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT % 10 < 8
        |    THEN 'train'
        |    WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))::BIGINT % 10 = 8
        |    THEN 'val' ELSE 'test' END AS split FROM rp),
        |lk AS (SELECT count(*) AS leak_clusters FROM (
        |  SELECT rep FROM spl GROUP BY rep HAVING count(DISTINCT split) > 1)),
        |pk0 AS (SELECT doc_id, source, split, n_tok,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
        |    AS pack_shard FROM spl),
        |pk AS (SELECT doc_id, source, split, pack_shard, n_tok,
        |  CAST(floor((sum(n_tok) OVER (PARTITION BY split, source, pack_shard
        |    ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 256)
        |    AS BIGINT) AS window_id
        |  FROM pk0),
        |wins AS (SELECT split, source, pack_shard, window_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(('0x' || substring(md5(split || ':' || source || ':'
        |    || CAST(pack_shard AS VARCHAR) || ':' || CAST(window_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 64 AS shard
        |  FROM pk GROUP BY split, source, pack_shard, window_id)
        |SELECT split, shard, count(*) AS n_windows, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  (SELECT leak_clusters FROM lk) AS leak_clusters
        |FROM wins GROUP BY split, shard ORDER BY split, shard""".stripMargin),
    "e3b_token_regex" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0)) AS tok
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e3_token_counts" ->
      """WITH w AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS word
        |  FROM documents)
        |SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM w GROUP BY word ORDER BY word""".stripMargin,
    "e6_minhash_lsh" -> e6OracleSql,
    // streaming ingest parity: the drained stream-static probe must
    // verify to EXACTLY the batch pipeline's rows — one SQL gates both
    "e6s_minhash_stream" -> e6OracleSql,
    // hash-independent slice of the xx-hash pipeline: pairs with
    // IDENTICAL shingle sets (jaccard exactly 1) — DuckDB states set
    // equality directly (ordered string_agg signature; chr(10) cannot
    // occur inside a whitespace-split shingle), no xxhash64 needed
    "e6x_minhash_xx" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |sh0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END) AS sh FROM w),
        |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
        |sets AS (SELECT doc_id, count(*) AS n_sh,
        |  md5(string_agg(sh, chr(10) ORDER BY sh)) AS sig FROM sh GROUP BY doc_id)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n_sh
        |FROM sets a JOIN sets b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY d1, d2""".stripMargin,
    "e7_simhash" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS word
        |  FROM documents),
        |tc AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |bits AS (SELECT unnest(range(0, 16)) AS b),
        |x AS (SELECT doc_id, word, cnt, b,
        |    strpos('0123456789abcdef',
        |      substring(md5(word), CAST(b // 4 AS INTEGER) + 1, 1)) - 1 AS nibble
        |  FROM tc CROSS JOIN bits),
        |y AS (SELECT doc_id, b, sum(CASE
        |    WHEN CAST(floor(nibble / pow(2, b % 4)) AS INTEGER) % 2 = 1
        |    THEN cnt ELSE -cnt END) AS s
        |  FROM x GROUP BY 1, 2),
        |z AS (SELECT doc_id, b, CASE WHEN s > 0 THEN 1 ELSE 0 END AS bitval FROM y)
        |SELECT doc_id, CAST(sum(bitval * CAST(pow(2, b) AS BIGINT)) AS BIGINT) AS simhash
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "e7b_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS word
        |  FROM documents),
        |tc AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |bits AS (SELECT unnest(range(0, 32)) AS b),
        |x AS (SELECT doc_id, word, cnt, b,
        |    strpos('0123456789abcdef',
        |      substring(md5(word), CAST(b // 4 AS INTEGER) + 1, 1)) - 1 AS nibble
        |  FROM tc CROSS JOIN bits),
        |y AS (SELECT doc_id, b, sum(CASE
        |    WHEN CAST(floor(nibble / pow(2, b % 4)) AS INTEGER) % 2 = 1
        |    THEN cnt ELSE -cnt END) AS s
        |  FROM x GROUP BY 1, 2),
        |z AS (SELECT doc_id, b, CASE WHEN s > 0 THEN 1 ELSE 0 END AS bitval FROM y),
        |fp AS (SELECT doc_id,
        |  CAST(sum(bitval * CAST(pow(2, b) AS BIGINT)) AS BIGINT) AS simhash
        |  FROM z GROUP BY doc_id),
        |bb AS (SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS nib
        |  FROM fp CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS band) t),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, a.simhash AS s1,
        |    b.doc_id AS d2, b.simhash AS s2
        |  FROM bb a JOIN bb b ON a.band = b.band AND a.nib = b.nib
        |    AND a.doc_id < b.doc_id)
        |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
        |ORDER BY d1, d2""".stripMargin,
    // candidate-volume gate: posting lengths bucketed by floor(log2) via
    // the integer bin-string path (float log2 drifts on exact powers);
    // DuckDB groups by the bigram STRING where Spark groups by its
    // xxhash64 — identical lengths absent a 64-bit collision (same
    // argument as e8's declared output)
    "e8h_posting_histogram" ->
      """WITH w AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bg0 AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM w),
        |bg AS (SELECT DISTINCT doc_id, source, bg FROM bg0),
        |p AS (SELECT source, bg, count(*) AS len FROM bg GROUP BY 1, 2
        |  HAVING count(*) > 1)
        |SELECT CAST(length(bin(len)) - 1 AS BIGINT) AS len_bucket,
        |  count(*) AS n_postings,
        |  CAST(sum(len * (len - 1) // 2) AS BIGINT) AS pair_volume
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "e8_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, source,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bg0 AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 2
        |  THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
        |  ELSE [] END) AS bg FROM w),
        |bg AS (SELECT DISTINCT doc_id, source, bg FROM bg0),
        |counts AS (SELECT doc_id, count(*) AS n_bg FROM bg GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
        |  FROM bg a JOIN bg b ON a.source = b.source AND a.bg = b.bg
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, n_common, c1.n_bg + c2.n_bg - n_common AS n_union,
        |  round(n_common / (c1.n_bg + c2.n_bg - n_common), 6) AS jaccard
        |FROM common
        |JOIN counts c1 ON c1.doc_id = d1
        |JOIN counts c2 ON c2.doc_id = d2
        |WHERE n_common >= 5
        |  AND round(n_common / (c1.n_bg + c2.n_bg - n_common), 6) >= 0.1
        |ORDER BY d1, d2""".stripMargin,
    "e9_lang_id" ->
      """WITH dim(word, cand_lang) AS (VALUES
        |  ('the','en'),('a','en'),('of','en'),('and','en'),('to','en'),
        |  ('el','es'),('la','es'),('de','es'),('los','es'),('y','es'),
        |  ('der','de'),('die','de'),('und','de'),('das','de'),('ein','de'),
        |  ('le','fr'),('les','fr'),('et','fr'),('un','fr'),('dans','fr')),
        |tok AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS word
        |  FROM documents),
        |hits AS (SELECT doc_id, cand_lang, count(*) AS hits
        |  FROM tok JOIN dim USING (word) GROUP BY 1, 2),
        |best AS (SELECT doc_id, cand_lang, hits, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn FROM hits)
        |SELECT d.doc_id, d.lang AS labeled_lang,
        |  coalesce(b.cand_lang, 'und') AS pred_lang,
        |  CAST(coalesce(b.hits, 0) AS BIGINT) AS hits
        |FROM documents d
        |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "e10_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_obs,
        |  CAST(len(w) AS INTEGER) AS n_tokens,
        |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS INTEGER) AS n_alpha,
        |  CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))
        |    AS INTEGER) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_chars_obs, n_tokens, n_alpha, n_stop,
        |  CASE WHEN n_tokens > 0 THEN round(n_stop / n_tokens, 6) END AS stop_ratio,
        |  CASE WHEN n_chars_obs > 0
        |    THEN round(n_alpha / n_chars_obs, 6) END AS alpha_ratio,
        |  CASE WHEN n_tokens > 0 THEN round(n_alpha / n_tokens, 6) END AS avg_token_len,
        |  CASE WHEN n_tokens > 0 THEN
        |    round(round(n_stop / n_tokens, 6) * 0.5
        |      + round(n_alpha / n_chars_obs, 6) * 0.5, 7) END AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "e11_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm FROM documents),
        |x AS (SELECT doc_id, nrm,
        |  list_filter(string_split_regex(nrm, '\s+'), y -> len(y) > 0) AS w FROM t),
        |sh AS (SELECT doc_id, nrm, CASE WHEN len(w) >= 3
        |  THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        |  ELSE [] END AS sh FROM x)
        |SELECT doc_id, md5(nrm) AS fp_md5, sha256(nrm) AS fp_sha256,
        |  CAST(len(sh) AS INTEGER) AS n_shingles,
        |  list_min(list_transform(sh, y -> md5(y))) AS fp_min_shingle
        |FROM sh ORDER BY doc_id""".stripMargin,
    // hash-independent columns of the xx fingerprint pipeline: the fp
    // equality-class size equals the normalized-text class size under
    // any collision-free hash, which DuckDB computes directly
    "e11x_fingerprint_xx" ->
      """WITH t AS (SELECT doc_id,
        |  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nrm FROM documents),
        |x AS (SELECT doc_id, nrm,
        |  list_filter(string_split_regex(nrm, '\s+'), y -> len(y) > 0) AS w FROM t)
        |SELECT doc_id,
        |  CAST(CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END AS INTEGER) AS n_shingles,
        |  count(*) OVER (PARTITION BY nrm) AS n_same_fp
        |FROM x ORDER BY doc_id""".stripMargin,
    // multi-probe: candidates from the query's bucket OR any bucket at
    // Hamming distance 1 (the oracle states it as a <=1 differing-chars
    // join predicate; Spark's form is the equi-join on exploded probe
    // codes — same candidate set, scalable shape)
    "e2p_lsh_multiprobe" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |  (CASE WHEN v[1]+v[2]-v[3]-v[4] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[5]+v[6]-v[7]-v[8] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[9]+v[10]-v[11]-v[12] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[13]+v[14]-v[15]-v[16] >= 0 THEN '1' ELSE '0' END) AS bkt
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, bkt, v AS qv FROM b WHERE vec_id < 8),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qv, c.v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))), 6)
        |      AS cos_sim
        |  FROM q JOIN b c ON c.vec_id <> q.q_id AND
        |    (CASE WHEN substr(q.bkt,1,1) = substr(c.bkt,1,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,2,1) = substr(c.bkt,2,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,3,1) = substr(c.bkt,3,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,4,1) = substr(c.bkt,4,1) THEN 0 ELSE 1 END) <= 1),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
        |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 3
        |ORDER BY q_id, "rank"""".stripMargin,
    // every input to the recall computation is deterministic, so the
    // oracle recomputes exact top-k, IVF and LSH candidate sets, and the
    // intersection counts — recall itself is oracle-checked end to end
    "e2r_recall_at_k" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, list_dot_product(v, v) AS nrm,
        |  (CASE WHEN v[1]+v[2]-v[3]-v[4] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[5]+v[6]-v[7]-v[8] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[9]+v[10]-v[11]-v[12] >= 0 THEN '1' ELSE '0' END) ||
        |  (CASE WHEN v[13]+v[14]-v[15]-v[16] >= 0 THEN '1' ELSE '0' END) AS bkt
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, label, bkt, v AS qv, nrm AS qn
        |  FROM n WHERE vec_id < 8),
        |ex AS (SELECT q_id, cand_id FROM (
        |  SELECT q_id, c.vec_id AS cand_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6)
        |      DESC, c.vec_id) AS rk
        |  FROM q CROSS JOIN n c WHERE c.vec_id <> q.q_id) WHERE rk <= 3),
        |iv AS (SELECT q_id, cand_id FROM (
        |  SELECT q_id, c.vec_id AS cand_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6)
        |      DESC, c.vec_id) AS rk
        |  FROM q JOIN n c ON q.label = c.label AND c.vec_id <> q.q_id) WHERE rk <= 3),
        |ls AS (SELECT q_id, cand_id FROM (
        |  SELECT q_id, c.vec_id AS cand_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6)
        |      DESC, c.vec_id) AS rk
        |  FROM q JOIN n c ON q.bkt = c.bkt AND c.vec_id <> q.q_id) WHERE rk <= 3),
        |mp AS (SELECT q_id, cand_id FROM (
        |  SELECT q_id, c.vec_id AS cand_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6)
        |      DESC, c.vec_id) AS rk
        |  FROM q JOIN n c ON c.vec_id <> q.q_id AND
        |    (CASE WHEN substr(q.bkt,1,1) = substr(c.bkt,1,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,2,1) = substr(c.bkt,2,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,3,1) = substr(c.bkt,3,1) THEN 0 ELSE 1 END) +
        |    (CASE WHEN substr(q.bkt,4,1) = substr(c.bkt,4,1) THEN 0 ELSE 1 END) <= 1)
        |  WHERE rk <= 3),
        |base AS (SELECT q_id, count(*) AS n_exact FROM ex GROUP BY q_id),
        |hi AS (SELECT q_id, count(*) AS hits_ivf
        |  FROM (SELECT * FROM ex INTERSECT SELECT * FROM iv) GROUP BY q_id),
        |hl AS (SELECT q_id, count(*) AS hits_lsh
        |  FROM (SELECT * FROM ex INTERSECT SELECT * FROM ls) GROUP BY q_id),
        |hm AS (SELECT q_id, count(*) AS hits_mp
        |  FROM (SELECT * FROM ex INTERSECT SELECT * FROM mp) GROUP BY q_id)
        |SELECT base.q_id, n_exact,
        |  COALESCE(hits_ivf, 0) AS hits_ivf, COALESCE(hits_lsh, 0) AS hits_lsh,
        |  COALESCE(hits_mp, 0) AS hits_mp,
        |  round(COALESCE(hits_ivf, 0) / n_exact, 6) AS recall_ivf,
        |  round(COALESCE(hits_lsh, 0) / n_exact, 6) AS recall_lsh,
        |  round(COALESCE(hits_mp, 0) / n_exact, 6) AS recall_mp,
        |  TRUE AS mp_ge_lsh
        |FROM base LEFT JOIN hi USING (q_id) LEFT JOIN hl USING (q_id)
        |  LEFT JOIN hm USING (q_id)
        |ORDER BY base.q_id""".stripMargin,
    "e12_ann_brute" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 3),
        |j AS (SELECT q_id, c.vec_id AS cand_id,
        |    round(list_dot_product(qv, c.v) / (sqrt(qn) * sqrt(c.nrm)), 6) AS cos_sim
        |  FROM q CROSS JOIN n c WHERE c.vec_id <> q.q_id),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS "rank" FROM j)
        |SELECT q_id, "rank", cand_id, cos_sim FROM r WHERE "rank" <= 5
        |ORDER BY q_id, "rank"""".stripMargin,
    "e14_hash_sample" ->
      """SELECT doc_id,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10
        |    AS bucket,
        |  CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 < 8
        |    THEN 'train'
        |    WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 = 8
        |    THEN 'val' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e17_len_quantiles" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(min(length(text)) AS INTEGER) AS min_len,
        |  round(quantile_cont(length(text), 0.25), 6) AS p25,
        |  round(quantile_cont(length(text), 0.5), 6) AS p50,
        |  round(quantile_cont(length(text), 0.75), 6) AS p75,
        |  CAST(max(length(text)) AS INTEGER) AS max_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the *_ok flags assert the sketch CONTRACT (rank / std-error bound)
    // from the Spark side; DuckDB recomputes the exact columns and pins
    // the flags to TRUE, so an out-of-bound sketch fails the hash compare
    "e17x_len_quantiles_approx" ->
      """SELECT source, count(*) AS n_docs,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "e18_distinct_sketch" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST((octet_length(CAST(text AS BLOB)) % 64) * 16 + 32 AS INTEGER) AS width,
        |  CAST((octet_length(CAST(text AS BLOB)) % 48) * 16 + 32 AS INTEGER) AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // REAL byte-format decode (r6 ask #6): both engines synthesize the
    // SAME valid binary PPM per doc (md5-block pixel stream), and this
    // SQL re-PARSES the bytes in the hex domain — "P6\n" = 50360A,
    // ASCII-digit runs for dimensions, ('0x'||..)::INT pixel decode —
    // rather than re-deriving metadata from a length formula
    "m2_frame_sample" ->
      """WITH p AS (SELECT doc_id,
        |  CAST(doc_id % 13 + 4 AS INT) AS w, CAST(doc_id % 11 + 3 AS INT) AS h
        |  FROM documents),
        |pp AS (SELECT doc_id,
        |  'P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) AS hdr,
        |  substring(array_to_string(list_transform(range(0, w*h*3//16 + 1),
        |    k -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR))), ''),
        |    1, w*h*3*2) AS pixhex
        |  FROM p),
        |pay AS (SELECT doc_id, hdr::BLOB || unhex(pixhex) AS payload FROM pp),
        |hx AS (SELECT doc_id, hex(payload) AS hx FROM pay),
        |hdr AS (SELECT doc_id, hx,
        |  regexp_extract(hx, '^(50360A(?:3[0-9])+20(?:3[0-9])+0A3235350A)', 1) AS hdr_hex,
        |  CAST(regexp_replace(regexp_extract(hx,
        |    '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 1),
        |    '3([0-9])', '\1', 'g') AS INT) AS width,
        |  CAST(regexp_replace(regexp_extract(hx,
        |    '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 2),
        |    '3([0-9])', '\1', 'g') AS INT) AS height
        |  FROM hx WHERE hdr_hex <> ''),
        |base AS (SELECT doc_id, hx, width, height,
        |  length(hdr_hex) // 2 AS hdr_len, least(height, 4) AS n_frames FROM hdr),
        |fr AS (SELECT doc_id, hx, width, height, hdr_len, n_frames,
        |  unnest(range(0, n_frames)) AS f FROM base),
        |rw AS (SELECT doc_id, width, height, CAST(f AS BIGINT) AS frame_idx,
        |  hdr_len + (f * height // n_frames) * width * 3 AS frame_off,
        |  substring(hx, CAST(2 * (hdr_len + (f * height // n_frames) * width * 3) + 1 AS INT),
        |    width * 6) AS row_hex
        |  FROM fr)
        |SELECT doc_id, width, height, frame_idx, frame_off,
        |  ('0x' || substring(row_hex, 1, 2))::INT AS px0,
        |  md5(row_hex) AS frame_sig
        |FROM rw ORDER BY doc_id, frame_idx""".stripMargin,
    // m4: the resize gathers source pixel (2x,2y) per target (x,y)
    // from the SAME synthesized bytes the m2 oracle re-parses
    "m4_image_resize" ->
      """WITH p AS (SELECT doc_id,
        |  CAST(doc_id % 13 + 4 AS INT) AS w, CAST(doc_id % 11 + 3 AS INT) AS h
        |  FROM documents),
        |pp AS (SELECT doc_id,
        |  'P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) AS hdr,
        |  substring(array_to_string(list_transform(range(0, w*h*3//16 + 1),
        |    k -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR))), ''),
        |    1, w*h*3*2) AS pixhex
        |  FROM p),
        |pay AS (SELECT doc_id, hdr::BLOB || unhex(pixhex) AS payload FROM pp),
        |hx AS (SELECT doc_id, hex(payload) AS hx FROM pay),
        |hdr AS (SELECT doc_id, hx,
        |  regexp_extract(hx, '^(50360A(?:3[0-9])+20(?:3[0-9])+0A3235350A)', 1) AS hdr_hex,
        |  CAST(regexp_replace(regexp_extract(hx,
        |    '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 1),
        |    '3([0-9])', '\1', 'g') AS INT) AS width,
        |  CAST(regexp_replace(regexp_extract(hx,
        |    '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 2),
        |    '3([0-9])', '\1', 'g') AS INT) AS height
        |  FROM hx WHERE hdr_hex <> ''),
        |dim AS (SELECT doc_id, hx, width, height,
        |  length(hdr_hex) // 2 AS hdr_len,
        |  CAST(width // 2 AS INT) AS w2, CAST(height // 2 AS INT) AS h2
        |  FROM hdr WHERE width // 2 > 0 AND height // 2 > 0),
        |px AS (SELECT doc_id, width, height, w2, h2,
        |  list_transform(range(0, w2*h2), i -> substring(hx,
        |    CAST((hdr_len + ((i // w2) * 2 * width + (i % w2) * 2) * 3) * 2 + 1 AS INT),
        |    6)) AS pxs
        |  FROM dim)
        |SELECT doc_id, width, height, w2, h2,
        |  CAST(w2 * h2 * 3 AS BIGINT) AS resized_len,
        |  md5(array_to_string(pxs, '')) AS resized_sig,
        |  round(list_sum(list_transform(pxs, q -> ('0x' || substring(q, 1, 2))::INT))
        |    * 1.0 / (w2 * h2), 6) AS mean_red
        |FROM px ORDER BY doc_id""".stripMargin,
    "m3_wav_meta" -> m3WavSql,
    // m5: the m3 payload/parse chain continued into the SAMPLE domain —
    // the oracle re-decodes every PCM value (8-bit unsigned re-centered,
    // 16-bit LE two's-complemented) and re-folds the exact integer
    // energy features; no float grid anywhere in the compare.
    "m5_audio_energy" -> {
      // replace the m3 SELECT tail with the sample-domain continuation
      val chain = m3WavSql.substring(0, m3WavSql.lastIndexOf("SELECT doc_id,"))
      chain.stripSuffix("\n") + ",\n" +
        """v AS (SELECT doc_id, channels, bits_per_sample,
          |  CAST(data_size // (bits_per_sample // 8) AS BIGINT) AS n_values,
          |  data_hex AS dh FROM ok),
          |a AS (SELECT doc_id, channels, bits_per_sample, n_values,
          |  list_transform(range(0, n_values), i ->
          |    CASE WHEN bits_per_sample = 8
          |      THEN ('0x' || substr(dh, CAST(i*2+1 AS INT), 2))::BIGINT - 128
          |      ELSE ('0x' || substr(dh, CAST(i*4+3 AS INT), 2)
          |             || substr(dh, CAST(i*4+1 AS INT), 2))::BIGINT
          |        - CASE WHEN ('0x' || substr(dh, CAST(i*4+3 AS INT), 2)
          |                      || substr(dh, CAST(i*4+1 AS INT), 2))::BIGINT
          |                    >= 32768 THEN 65536 ELSE 0 END
          |    END) AS amps FROM v)
          |SELECT doc_id, channels, bits_per_sample, n_values,
          |  CAST(list_sum(list_transform(amps, x -> abs(x))) AS BIGINT) AS sum_abs,
          |  CAST(list_sum(list_transform(amps, x -> x * x)) AS BIGINT) AS sum_sq,
          |  CAST(list_max(list_transform(amps, x -> abs(x))) AS BIGINT) AS peak
          |FROM a ORDER BY doc_id""".stripMargin
    },
    "ord_envelope_check" ->
      s"""SELECT file, dataset_id, total_reactions_scraped,
         |  CAST(len(reactions) AS INTEGER) AS n_rx,
         |  CAST(len(list_filter(reactions, r -> r.success)) AS INTEGER) AS n_success,
         |  total_reactions_scraped = len(reactions) AS env_match
         |FROM read_parquet('$ordNested')
         |ORDER BY file, dataset_id""".stripMargin,
    "ord_f1_tabs" ->
      s"""$ordCte
         |SELECT file, dataset_id, reaction_id,
         |  CAST(u.p AS INTEGER) AS tab_pos, u.t.tab_name AS tab_name,
         |  CAST(len(u.t.components) AS INTEGER) AS n_components
         |FROM t ORDER BY file, dataset_id, reaction_id, tab_pos""".stripMargin,
    "ord_components" ->
      s"""$ordCte
         |SELECT file, dataset_id, reaction_id, tab_pos, tab_name,
         |  comp.comp_pos AS comp_pos, comp.amount_kind AS amount_kind,
         |  comp.amount_value AS amount_value, comp.amount_units AS amount_units,
         |  comp.reaction_role AS reaction_role
         |FROM c ORDER BY file, dataset_id, reaction_id, tab_pos, comp_pos""".stripMargin,
    "ord_id_types" ->
      s"""$ordCte,
         |i AS (SELECT file, unnest(comp.identifiers) AS id FROM c)
         |SELECT file, id.id_type AS id_type, count(*) AS n
         |FROM i GROUP BY 1, 2 ORDER BY file, id_type""".stripMargin,
    "ord_roles_histogram" ->
      s"""$ordCte
         |SELECT file, comp.reaction_role AS reaction_role, count(*) AS n
         |FROM c GROUP BY 1, 2 ORDER BY file, reaction_role""".stripMargin,
    "ord_j1_role_encode" ->
      s"""$ordCte
         |SELECT file, comp.reaction_role AS reaction_role,
         |  CASE comp.reaction_role
         |    WHEN 'UNSPECIFIED' THEN 0 WHEN 'REACTANT' THEN 1
         |    WHEN 'REAGENT' THEN 2 WHEN 'SOLVENT' THEN 3
         |    WHEN 'CATALYST' THEN 4 WHEN 'WORKUP' THEN 5
         |    WHEN 'INTERNAL_STANDARD' THEN 6 WHEN 'AUTHENTIC_STANDARD' THEN 7
         |    WHEN 'PRODUCT' THEN 8 WHEN 'BYPRODUCT' THEN 9
         |    WHEN 'SIDE_PRODUCT' THEN 10 ELSE -1 END AS role_code,
         |  count(*) AS n
         |FROM c GROUP BY 1, 2, 3 ORDER BY file, reaction_role""".stripMargin,
    "ord_amount_stats" ->
      s"""$ordCte
         |SELECT file, comp.amount_kind AS amount_kind,
         |  comp.amount_units AS amount_units, count(*) AS n,
         |  round(sum(comp.amount_value), 9) AS total_value
         |FROM c GROUP BY 1, 2, 3 ORDER BY file, amount_kind, amount_units""".stripMargin,
    "ord_f5_measurements" ->
      s"""WITH rx AS (
         |  SELECT file, dataset_id, unnest(reactions) AS r
         |  FROM read_parquet('$ordNested')),
         |o AS (
         |  SELECT file, dataset_id, r.reaction_id AS reaction_id, unnest(r.outcomes) AS o
         |  FROM rx),
         |m AS (
         |  SELECT file, dataset_id, reaction_id, o.out_pos AS out_pos,
         |    o.reaction_role AS out_role, o.is_desired_product AS is_desired_product,
         |    unnest(list_transform(o.measurements, (x, i) -> {'p': i - 1, 'm': x})) AS u
         |  FROM o WHERE len(o.measurements) > 0),
         |u AS (
         |SELECT file, dataset_id, reaction_id, out_pos, out_role, is_desired_product,
         |  CAST(u.p AS INTEGER) AS m_pos, u.m.m_type AS m_type,
         |  u.m.details AS details, u.m.mass_value AS mass_value,
         |  u.m.mass_units AS mass_units
         |FROM m
         |UNION ALL
         |SELECT file, dataset_id, reaction_id, o.out_pos, o.reaction_role,
         |  o.is_desired_product, NULL, NULL, NULL, NULL, NULL
         |FROM o WHERE len(o.measurements) = 0
         |) SELECT * FROM u
         |ORDER BY file, dataset_id, reaction_id, out_pos, m_pos NULLS FIRST""".stripMargin,
    "ord_s4_decode" ->
      s"""SELECT file, dataset_id, reaction_id,
         |  json_extract_string(raw, '$$.reaction_id') AS parsed_id,
         |  CAST(json_extract_string(raw, '$$.success') AS BOOLEAN) AS parsed_success,
         |  json_extract_string(raw, '$$.reaction_id') = reaction_id AS id_match,
         |  json_extract_string(raw, '$$.inputsMap[0][0]') AS first_tab,
         |  CAST(json_array_length(raw, '$$.inputsMap') AS INTEGER) AS n_tabs,
         |  CAST(json_array_length(raw, '$$.outcomes') AS INTEGER) AS n_outcomes
         |FROM read_parquet('$ordRaw')
         |ORDER BY file, dataset_id, reaction_id""".stripMargin,
    "ord_v1_downgrade" ->
      s"""$ordCte
         |SELECT dataset_id, reaction_id, tab_pos,
         |  comp.comp_pos AS comp_pos,
         |  CAST(len(list_filter(comp.identifiers, x -> x.id_type = 'SMILES'))
         |    AS INTEGER) AS n_smiles_ids,
         |  CASE WHEN comp.amount_kind = 'mass' THEN 'none'
         |    ELSE comp.amount_kind END AS v1_kind,
         |  CASE WHEN comp.amount_kind = 'moles' THEN 'MOLE'
         |    WHEN comp.amount_kind = 'volume' THEN 'LITER' END AS v1_units,
         |  comp.reaction_role AS reaction_role
         |FROM c WHERE file = 'ord_formatted_data.json'
         |ORDER BY dataset_id, reaction_id, tab_pos, comp_pos""".stripMargin,
    "ord_units_diverge" ->
      s"""$ordCte
         |SELECT file, comp.amount_kind AS amount_kind,
         |  CASE WHEN comp.amount_kind = 'moles' THEN 'MOLE' ELSE 'LITER' END AS v1_units,
         |  comp.amount_units AS v2_units, count(*) AS n,
         |  (CASE WHEN comp.amount_kind = 'moles' THEN 'MOLE' ELSE 'LITER' END)
         |    <> comp.amount_units AS diverges
         |FROM c WHERE comp.amount_kind IN ('moles', 'volume')
         |GROUP BY 1, 2, 3, 4 ORDER BY file, amount_kind, v2_units""".stripMargin,
    "ord_a4_renest" ->
      s"""WITH rx AS (
         |  SELECT file, dataset_id, unnest(reactions) AS r
         |  FROM read_parquet('$ordNested'))
         |SELECT file, dataset_id, count(*) AS n_rx,
         |  string_agg(r.reaction_id, ',' ORDER BY r.reaction_id) AS rx_ids
         |FROM rx GROUP BY file, dataset_id ORDER BY file, dataset_id""".stripMargin,
  )
}
