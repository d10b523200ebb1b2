"""Central query registry: every implemented operator from SURVEY.md §2
as a named (spark_fn, duckdb_oracle_sql) pair.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
REGISTRY. Queries whose oracle is None get the driver's weaker rows-only
check (approximate sketches whose exact value is engine-specific).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from postgres_es_cdc_spark.cdc import queries as cdcq
from postgres_es_cdc_spark.cdc import scd2
from postgres_es_cdc_spark.functions import python_udfs, scalar
from postgres_es_cdc_spark.llm import (
    bm25, decontam, dedup, lm, multimodal, quality, retrieval, sampling,
    similarity, text, tfidf)
from postgres_es_cdc_spark.operators import analytics, sql_frontend
from postgres_es_cdc_spark.sources import pgoutput
from postgres_es_cdc_spark.streaming import ivm
from postgres_es_cdc_spark.streaming import dedup as sdedup
from postgres_es_cdc_spark.operators import (
    advanced, events_q, graph, relational, setops, stats, tpch_extra,
    tpch_more, windows)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {
    # ORDER MATTERS: the driver evaluates a 50-query prefix per round, so
    # queries without a prior driver-green CORRECTNESS row are listed
    # first (LLM pipeline -> events -> windows/setops/scalar/UDF), and
    # the r1-green set rides at the back. Rotate again as rows go green.
    # --- LLM data pipeline: text analysis ---
    "docs_token_stats": QuerySpec(text.docs_token_stats, text.DOCS_TOKEN_STATS_SQL),
    "docs_lang_profile": QuerySpec(text.docs_lang_profile, text.DOCS_LANG_PROFILE_SQL),
    "docs_quality_score": QuerySpec(text.docs_quality_score, text.DOCS_QUALITY_SQL),
    "docs_fingerprint": QuerySpec(text.docs_fingerprint, text.DOCS_FINGERPRINT_SQL),
    "docs_lang_id": QuerySpec(text.docs_lang_id, text.DOCS_LANG_ID_SQL),
    "docs_term_frequency": QuerySpec(text.docs_term_frequency, text.DOCS_TERM_FREQUENCY_SQL),
    "docs_bpe_token_count": QuerySpec(text.docs_bpe_token_count, text.DOCS_BPE_TOKEN_SQL),
    "docs_bpe_pair_stats": QuerySpec(text.docs_bpe_pair_stats, text.DOCS_BPE_PAIR_SQL),
    "docs_bpe_merges": QuerySpec(text.docs_bpe_merges, text.DOCS_BPE_MERGES_SQL),
    "docs_bpe_encode": QuerySpec(text.docs_bpe_encode, text.DOCS_BPE_ENCODE_SQL),
    "docs_top_terms": QuerySpec(text.docs_top_terms, text.DOCS_TOP_TERMS_SQL),
    # --- LLM data pipeline: dedup ---
    "docs_exact_dedup": QuerySpec(dedup.docs_exact_dedup, dedup.DOCS_EXACT_DEDUP_SQL),
    "docs_minhash_signatures": QuerySpec(dedup.docs_minhash_signatures, dedup.DOCS_MINHASH_SIG_SQL),
    "docs_minhash_lsh_pairs": QuerySpec(dedup.docs_minhash_lsh_pairs, dedup.DOCS_MINHASH_LSH_SQL),
    # new-batch vs persisted-signature-store dedup; oracle = full
    # recompute restricted to batch-touching pairs (incremental == full)
    "docs_incremental_lsh_pairs": QuerySpec(dedup.docs_incremental_lsh_pairs, dedup.DOCS_INCREMENTAL_LSH_SQL),
    "docs_incremental_lsh_multibatch": QuerySpec(dedup.docs_incremental_lsh_multibatch, dedup.DOCS_INCREMENTAL_LSH_SQL),
    # SignatureIndexSink's fold law (r11): n-batch fold from an EMPTY
    # index == the one-shot recompute, against the SAME oracle SQL
    "docs_streaming_lsh_fold": QuerySpec(
        dedup.docs_streaming_lsh_fold, dedup.DOCS_MINHASH_LSH_SQL),
    "docs_incremental_exact_dedup": QuerySpec(dedup.docs_incremental_exact_dedup, dedup.DOCS_INCREMENTAL_EXACT_SQL),
    "docs_incremental_simhash_pairs": QuerySpec(dedup.docs_incremental_simhash_pairs, dedup.DOCS_INCREMENTAL_SIMHASH_SQL),
    "emb_incremental_near_dup_pairs": QuerySpec(
        similarity.emb_incremental_near_dup_pairs, similarity.EMB_INCR_NEAR_DUP_SQL),
    "emb_streaming_near_dup_fold": QuerySpec(
        similarity.emb_streaming_near_dup_fold, similarity.EMB_NEAR_DUP_SQL),
    # KeyedDedupSink's per-batch fold algebra vs one-shot first-arrival
    "streaming_dedup_first_event": QuerySpec(sdedup.streaming_dedup_first_event, sdedup.STREAMING_DEDUP_FIRST_SQL),
    # round-5 breadth: corpus quality / curation / retrieval eval
    "docs_repetition_report": QuerySpec(text.docs_repetition_report, text.DOCS_REPETITION_SQL),
    "docs_dsir_weights": QuerySpec(sampling.docs_dsir_weights, sampling.DOCS_DSIR_SQL),
    "orders_basket_affinity": QuerySpec(analytics.orders_basket_affinity, analytics.ORDERS_BASKET_SQL),
    "orders_basket_overflow_report": QuerySpec(analytics.orders_basket_overflow_report, analytics.ORDERS_BASKET_OVERFLOW_SQL),
    "emb_matryoshka_recall": QuerySpec(similarity.emb_matryoshka_recall, similarity.EMB_MATRYOSHKA_RECALL_SQL),
    # two-level coarse quantizer (the flat-assign escape at 10^7+ vecs)
    "emb_hier_assign": QuerySpec(similarity.emb_hier_assign, similarity.EMB_HIER_ASSIGN_SQL),
    # round-5 breadth b2: eval, observability, behavioral analytics
    "emb_ivf_recall": QuerySpec(similarity.emb_ivf_recall, similarity.EMB_IVF_RECALL_SQL),
    "events_path_mining": QuerySpec(analytics.events_path_mining, analytics.EVENTS_PATH_MINING_SQL),
    "events_anomaly_zscore": QuerySpec(analytics.events_anomaly_zscore, analytics.EVENTS_ANOMALY_SQL),
    "events_hll_distinct_users": QuerySpec(
        analytics.events_hll_distinct_users, analytics.EVENTS_HLL_SQL),
    "events_quantile_gap_sketch": QuerySpec(
        analytics.events_quantile_gap_sketch, analytics.EVENTS_QSKETCH_SQL),
    "docs_cluster_size_histogram": QuerySpec(dedup.docs_cluster_size_histogram, dedup.DOCS_CLUSTER_SIZE_HIST_SQL),
    "docs_ngram_coverage": QuerySpec(decontam.docs_ngram_coverage, decontam.DOCS_NGRAM_COVERAGE_SQL),
    "cdc_txn_size_histogram": QuerySpec(cdcq.cdc_txn_size_histogram, cdcq.CDC_TXN_SIZE_HIST_SQL),
    "docs_quality_filter_funnel": QuerySpec(quality.docs_quality_filter_funnel, quality.DOCS_FUNNEL_SQL),
    "part_supplier_hhi": QuerySpec(analytics.part_supplier_hhi, analytics.PART_SUPPLIER_HHI_SQL),
    # bounded k-core peel (unrolled oracle, BFS discipline)
    "graph_kcore_peel": QuerySpec(graph.graph_kcore_peel, graph.GRAPH_KCORE_SQL),
    "graph_kcore_fixpoint": QuerySpec(graph.graph_kcore_fixpoint, graph.GRAPH_KCORE_FIXPOINT_SQL),
    "graph_common_neighbors_topk": QuerySpec(graph.graph_common_neighbors_topk, graph.GRAPH_COMMON_NEIGHBORS_SQL),
    # IVF cell balance observability
    "emb_quantizer_balance": QuerySpec(similarity.emb_quantizer_balance, similarity.EMB_QUANTIZER_BALANCE_SQL),
    # CCNet-style LM keep/drop rollup; cross-source duplication matrix
    "docs_perplexity_filter_report": QuerySpec(lm.docs_perplexity_filter_report, lm.DOCS_PPL_FILTER_SQL),
    "docs_near_dup_rate_by_source": QuerySpec(dedup.docs_near_dup_rate_by_source, dedup.DOCS_NEAR_DUP_BY_SOURCE_SQL),
    "part_name_fuzzy_pairs": QuerySpec(dedup.part_name_fuzzy_pairs, dedup.PART_NAME_FUZZY_SQL),
    "docs_lsh_recall_curve": QuerySpec(dedup.docs_lsh_recall_curve, dedup.DOCS_LSH_RECALL_SQL),
    "docs_leakage_safe_splits": QuerySpec(dedup.docs_leakage_safe_splits, dedup.DOCS_LEAKAGE_SPLITS_SQL),
    # TopKSink's k-bounded semilattice merge vs one-shot per-group top-k
    "ivm_topk_orders_by_segment": QuerySpec(ivm.ivm_topk_orders_by_segment, ivm.IVM_TOPK_SEGMENT_SQL),
    "ivm_watermark_rollup": QuerySpec(ivm.ivm_watermark_rollup, ivm.IVM_WATERMARK_ROLLUP_SQL),
    "ivm_watermark_late_report": QuerySpec(ivm.ivm_watermark_late_report, ivm.IVM_WATERMARK_LATE_SQL),
    "ivm_session_rollup": QuerySpec(ivm.ivm_session_rollup, ivm.IVM_SESSION_ROLLUP_SQL),
    "ivm_join_view_rollup": QuerySpec(
        ivm.ivm_join_view_rollup, ivm.IVM_JOIN_VIEW_SQL),
    # same fold with mid-stream delta-log compaction + vacuum (r9)
    "ivm_join_view_compacted_rollup": QuerySpec(
        ivm.ivm_join_view_compacted_rollup, ivm.IVM_JOIN_VIEW_SQL),
    "ivm_hll_rollup": QuerySpec(ivm.ivm_hll_rollup, analytics.IVM_HLL_SQL),
    "ivm_qsketch_rollup": QuerySpec(
        ivm.ivm_qsketch_rollup, analytics.IVM_QSKETCH_SQL),
    "events_cms_heavy_hitters": QuerySpec(
        analytics.events_cms_heavy_hitters, analytics.EVENTS_CMS_SQL),
    "events_hll_type_overlap": QuerySpec(
        analytics.events_hll_type_overlap,
        analytics.EVENTS_HLL_OVERLAP_SQL),
    "docs_ngram_jaccard_pairs": QuerySpec(dedup.docs_ngram_jaccard_pairs, dedup.DOCS_NGRAM_JACCARD_SQL),
    "docs_winnowing_overlap": QuerySpec(
        dedup.docs_winnowing_overlap, dedup.DOCS_WINNOWING_SQL),
    "docs_duplicate_span_removal": QuerySpec(
        dedup.docs_duplicate_span_removal, dedup.DOCS_SPAN_REMOVAL_SQL),
    "docs_incremental_winnow_overlap": QuerySpec(
        dedup.docs_incremental_winnow_overlap, dedup.DOCS_INC_WINNOW_SQL),
    "docs_simhash": QuerySpec(dedup.docs_simhash, dedup.DOCS_SIMHASH_SQL),
    # iterative label propagation over the LSH pair graph — rows-only;
    # semantics pinned in tests/test_dedup.py.
    "docs_dedup_clusters": QuerySpec(dedup.docs_dedup_clusters, dedup.DOCS_DEDUP_CLUSTERS_SQL),
    # signature-collapsed sibling (r9): rep-grain banding/propagation,
    # full hash-checked oracle; the duplication-heavy-corpus scale path
    "docs_dedup_clusters_collapsed": QuerySpec(
        dedup.docs_dedup_clusters_collapsed,
        dedup.DOCS_DEDUP_CLUSTERS_COLLAPSED_SQL),
    # member-vs-rep routing side channel (r11): the pair_expansion_q
    # number that tells an operator when to route to the collapsed row
    "docs_dedup_routing_report": QuerySpec(
        dedup.docs_dedup_routing_report, dedup.DOCS_DEDUP_ROUTING_SQL),
    # incremental connected-component maintenance: n-batch union-find
    # fold over rep-grain pair deltas == one-shot TRUE components
    # (recursive-CTE oracle — exact reachability, no depth bound)
    "docs_incremental_cluster_fold": QuerySpec(
        dedup.docs_incremental_cluster_fold,
        dedup.DOCS_INCREMENTAL_CLUSTER_SQL),
    # the same fold law driven through the DURABLE ClusterLabelSink
    # (versioned-snapshot commits + batch-id replay gate, one batch
    # redelivered mid-stream) — same TRUE-CC oracle
    "docs_streaming_cluster_fold": QuerySpec(
        dedup.docs_streaming_cluster_fold,
        dedup.DOCS_INCREMENTAL_CLUSTER_SQL),
    # per-cluster KEEPER maintenance through ClusterKeeperSink (labels
    # + argmax-quality keepers in one two-frame snapshot commit) —
    # TRUE-CC chain + quality argmax oracle
    "docs_streaming_cluster_keepers": QuerySpec(
        dedup.docs_streaming_cluster_keepers,
        dedup.DOCS_STREAMING_KEEPERS_SQL),
    # --- LLM data pipeline: similarity search ---
    "emb_cosine_near_dup_pairs": QuerySpec(similarity.emb_cosine_near_dup_pairs, similarity.EMB_NEAR_DUP_SQL),
    "emb_cosine_topk": QuerySpec(similarity.emb_cosine_topk, similarity.EMB_COSINE_TOPK_SQL),
    "emb_euclidean_topk": QuerySpec(similarity.emb_euclidean_topk, similarity.EMB_EUCLIDEAN_TOPK_SQL),
    "emb_centroid_assign": QuerySpec(similarity.emb_centroid_assign, similarity.EMB_CENTROID_SQL),
    "emb_lsh_sign_buckets": QuerySpec(similarity.emb_lsh_sign_buckets, similarity.EMB_LSH_BUCKETS_SQL),
    "emb_int8_quantize": QuerySpec(similarity.emb_int8_quantize, similarity.EMB_INT8_QUANTIZE_SQL),
    "emb_binary_quantize_topk": QuerySpec(
        similarity.emb_binary_quantize_topk, similarity.EMB_BINARY_QUANTIZE_SQL),
    "emb_ivf_topk": QuerySpec(similarity.emb_ivf_topk, similarity.EMB_IVF_TOPK_SQL),
    # fixed-init fixed-iters k-means with exact rational centroids — the
    # DuckDB twin unrolls the loop (KMEANS_SQL), full hash check.
    "emb_kmeans_assignments": QuerySpec(similarity.kmeans_assignments, similarity.KMEANS_SQL),
    "emb_pca_top_component": QuerySpec(similarity.emb_pca_top_component, similarity.EMB_PCA_SQL),
    "emb_dim_variance_report": QuerySpec(similarity.emb_dim_variance_report, similarity.EMB_DIM_VARIANCE_SQL),
    # --- graph iteration ---
    "graph_pagerank": QuerySpec(graph.graph_pagerank, graph.GRAPH_PAGERANK_SQL),
    "graph_clustering_coefficient": QuerySpec(
        graph.graph_clustering_coefficient, graph.GRAPH_CLUSTERING_SQL),
    "graph_triangle_counts": QuerySpec(
        graph.graph_triangle_counts, graph.GRAPH_TRIANGLES_SQL),
    "graph_triangle_estimate": QuerySpec(
        graph.graph_triangle_estimate, graph.GRAPH_TRIANGLE_ESTIMATE_SQL),
    # per-node DOULION: local triangles + clamped cc estimate (r9)
    "graph_local_clustering_estimate": QuerySpec(
        graph.graph_local_clustering_estimate,
        graph.GRAPH_LOCAL_CLUSTERING_EST_SQL),
    # --- LLM data pipeline: multimodal columns ---
    "multimodal_meta_stats": QuerySpec(multimodal.multimodal_meta_stats, multimodal.MULTIMODAL_META_SQL),
    "multimodal_transform_stats": QuerySpec(multimodal.multimodal_transform_stats, multimodal.MULTIMODAL_TRANSFORM_SQL),
    "multimodal_audio_energy": QuerySpec(multimodal.multimodal_audio_energy, multimodal.MULTIMODAL_AUDIO_ENERGY_SQL),
    "multimodal_video_scene_cuts": QuerySpec(
        multimodal.multimodal_video_scene_cuts,
        multimodal.MULTIMODAL_SCENE_CUTS_SQL),
    # --- LLM data pipeline: governance (round-2 additions) ---
    "docs_pii_scrub": QuerySpec(quality.docs_pii_scrub, quality.DOCS_PII_SCRUB_SQL),
    "docs_split_assign": QuerySpec(sampling.docs_split_assign, sampling.DOCS_SPLIT_ASSIGN_SQL),
    "docs_decontaminate": QuerySpec(decontam.docs_decontaminate, decontam.DOCS_DECONTAMINATE_SQL),
    # --- LLM data pipeline: retrieval / quality ---
    "docs_inverted_index": QuerySpec(
        retrieval.docs_inverted_index, retrieval.DOCS_INVERTED_INDEX_SQL),
    "docs_match_query": QuerySpec(
        retrieval.docs_match_query, retrieval.DOCS_MATCH_QUERY_SQL),
    "docs_tfidf_topk": QuerySpec(
        tfidf.docs_tfidf_topk, tfidf.DOCS_TFIDF_TOPK_SQL),
    "docs_bm25_topk": QuerySpec(
        bm25.docs_bm25_topk, bm25.DOCS_BM25_TOPK_SQL),
    "docs_gopher_filters": QuerySpec(
        quality.docs_gopher_filters, quality.DOCS_GOPHER_SQL),
    # --- event-stream analytics (batch twins of streaming ops) ---
    "events_funnel": QuerySpec(tpch_extra.events_funnel, tpch_extra.EVENTS_FUNNEL_SQL),
    "events_route_counts": QuerySpec(events_q.events_route_counts, events_q.EVENTS_ROUTE_SQL),
    "events_tumbling": QuerySpec(events_q.events_tumbling, events_q.EVENTS_TUMBLING_SQL),
    "events_ewma": QuerySpec(events_q.events_ewma, events_q.EVENTS_EWMA_SQL),
    "events_gap_fill": QuerySpec(
        events_q.events_gap_fill, events_q.EVENTS_GAP_FILL_SQL),
    "events_cohort_retention": QuerySpec(
        analytics.events_cohort_retention, analytics.EVENTS_COHORT_SQL),
    "events_zscore_outliers": QuerySpec(
        analytics.events_zscore_outliers, analytics.EVENTS_ZSCORE_SQL),
    "events_sliding": QuerySpec(events_q.events_sliding, events_q.EVENTS_SLIDING_SQL),
    "events_session": QuerySpec(events_q.events_session, events_q.EVENTS_SESSION_SQL),
    "events_asof_join": QuerySpec(events_q.events_asof_join, events_q.EVENTS_ASOF_SQL),
    "events_json_extract": QuerySpec(events_q.events_json_extract, events_q.EVENTS_JSON_SQL),
    "events_exists_buyers": QuerySpec(events_q.events_exists_buyers, events_q.EVENTS_EXISTS_SQL),
    # --- CDC round-2 additions: snapshot, txn atomicity, wire codec ---
    "cdc_snapshot_then_stream": QuerySpec(
        cdcq.cdc_snapshot_then_stream, cdcq.CDC_SNAPSHOT_THEN_STREAM_SQL),
    "cdc_txn_committed_only": QuerySpec(
        cdcq.cdc_txn_committed_only, cdcq.CDC_TXN_COMMITTED_SQL),
    # typed events -> byte-exact pgoutput wire -> decode -> fold; oracle
    # is the independent expected-state projection.
    "cdc_truncate_restart_fold": QuerySpec(
        cdcq.cdc_truncate_restart_fold, cdcq.CDC_TRUNCATE_SQL),
    "cdc_schema_evolution_fold": QuerySpec(
        pgoutput.cdc_schema_evolution_fold, cdcq.CDC_SCHEMA_EVOLUTION_SQL),
    "cdc_pgoutput_roundtrip": QuerySpec(
        pgoutput.cdc_pgoutput_roundtrip, cdcq.CDC_APPLY_SQL),
    # --- sketch with deterministic accuracy assertion (hash-checked) ---
    "agg_approx_distinct": QuerySpec(relational.agg_approx_distinct, relational.AGG_APPROX_DISTINCT_SQL),
    # ---- position 51+: below the driver's 50-query evaluation window ----
    "agg_approx_percentile": QuerySpec(stats.agg_approx_percentile, stats.AGG_APPROX_PERCENTILE_SQL),
    # Broder estimator vs exact Jaccard, both hash-checked.
    "docs_minhash_jaccard_estimate": QuerySpec(
        dedup.docs_minhash_jaccard_estimate, dedup.DOCS_MINHASH_JACCARD_EST_SQL),
    # two-stage retrieval: BM25 candidates -> tf-vector cosine rerank
    "docs_retrieve_rerank": QuerySpec(
        bm25.docs_retrieve_rerank, bm25.DOCS_RETRIEVE_RERANK_SQL),
    # character-entropy quality signal (model-free perplexity proxy)
    "docs_char_entropy": QuerySpec(
        quality.docs_char_entropy, quality.DOCS_CHAR_ENTROPY_SQL),
    # product quantization: per-subspace codebooks + codes + distortion
    "emb_pq_encode": QuerySpec(
        similarity.emb_pq_encode, similarity.EMB_PQ_ENCODE_SQL),
    # --- LLM data pipeline: sampling ---
    "docs_hash_sample": QuerySpec(sampling.docs_hash_sample, sampling.DOCS_HASH_SAMPLE_SQL),
    "docs_stratified_sample": QuerySpec(sampling.docs_stratified_sample, sampling.DOCS_STRATIFIED_SAMPLE_SQL),
    "docs_training_shards": QuerySpec(
        sampling.docs_training_shards, sampling.DOCS_TRAINING_SHARDS_SQL),
    "corpus_prep_pipeline": QuerySpec(sampling.corpus_prep_pipeline, sampling.CORPUS_PREP_SQL),
    "docs_context_pack": QuerySpec(sampling.docs_context_pack, sampling.DOCS_CONTEXT_PACK_SQL),
    "docs_sequence_packing": QuerySpec(
        sampling.docs_sequence_packing, sampling.DOCS_SEQUENCE_PACKING_SQL),
    "docs_packing_efficiency": QuerySpec(
        sampling.docs_packing_efficiency, sampling.DOCS_PACKING_EFFICIENCY_SQL),
    # --- graph iteration (round-2 addition) ---
    "graph_bfs_distances": QuerySpec(
        graph.graph_bfs_distances, graph.GRAPH_BFS_SQL),
    # --- trained ANN: kmeans coarse quantizer + probe-limited search ---
    "emb_ivf_trained_topk": QuerySpec(
        similarity.emb_ivf_trained_topk, similarity.EMB_IVF_TRAINED_SQL),
    # --- multimodal ingestion: bytes -> features -> similarity search ---
    "multimodal_embed_topk": QuerySpec(
        multimodal.multimodal_embed_topk, multimodal.MULTIMODAL_EMBED_TOPK_SQL),
    # --- SQL frontend: ONE ANSI text run verbatim by both engines ---
    "sql_ansi_portable": QuerySpec(
        sql_frontend.sql_ansi_portable, sql_frontend.SQL_ANSI_PORTABLE),
    # --- analytics over orders/customers ---
    "agg_mode_priority": QuerySpec(
        analytics.agg_mode_priority, analytics.AGG_MODE_SQL),
    "customers_rfm": QuerySpec(
        analytics.customers_rfm, analytics.CUSTOMERS_RFM_SQL),
    # --- window functions ---
    "window_rank": QuerySpec(windows.window_rank, windows.WINDOW_RANK_SQL),
    "window_lag_lead": QuerySpec(windows.window_lag_lead, windows.WINDOW_LAG_SQL),
    "window_running_sum": QuerySpec(windows.window_running_sum, windows.WINDOW_RUNNING_SQL),
    "window_frames": QuerySpec(windows.window_frames, windows.WINDOW_FRAMES_SQL),
    "topk_per_group": QuerySpec(windows.topk_per_group, windows.TOPK_PER_GROUP_SQL),
    # --- set operations ---
    "setop_union": QuerySpec(setops.setop_union, setops.SETOP_UNION_SQL),
    "setop_intersect": QuerySpec(setops.setop_intersect, setops.SETOP_INTERSECT_SQL),
    "setop_except": QuerySpec(setops.setop_except, setops.SETOP_EXCEPT_SQL),
    "setop_intersect_all": QuerySpec(setops.setop_intersect_all, setops.SETOP_INTERSECT_ALL_SQL),
    "setop_except_all": QuerySpec(setops.setop_except_all, setops.SETOP_EXCEPT_ALL_SQL),
    "unpivot_order_measures": QuerySpec(setops.unpivot_order_measures, setops.UNPIVOT_SQL),
    # --- scalar function surface ---
    "scalar_string_funcs": QuerySpec(scalar.scalar_string_funcs, scalar.SCALAR_STRING_SQL),
    "scalar_date_funcs": QuerySpec(scalar.scalar_date_funcs, scalar.SCALAR_DATE_SQL),
    "scalar_math_funcs": QuerySpec(scalar.scalar_math_funcs, scalar.SCALAR_MATH_SQL),
    "scalar_conditional_funcs": QuerySpec(scalar.scalar_conditional_funcs, scalar.SCALAR_COND_SQL),
    "scalar_array_funcs": QuerySpec(scalar.scalar_array_funcs, scalar.SCALAR_ARRAY_SQL),
    "scalar_map_funcs": QuerySpec(scalar.scalar_map_funcs, scalar.SCALAR_MAP_SQL),
    "scalar_map_transform_funcs": QuerySpec(
        scalar.scalar_map_transform_funcs, scalar.SCALAR_MAP_TRANSFORM_SQL),
    # --- Python extensibility (pandas UDF scalar+grouped-agg, UDTF) ---
    "emb_pandas_udf_norms": QuerySpec(
        python_udfs.emb_pandas_udf_norms, python_udfs.EMB_PANDAS_UDF_NORMS_SQL),
    "docs_chunk_udtf": QuerySpec(
        python_udfs.docs_chunk_udtf, python_udfs.DOCS_CHUNK_UDTF_SQL),
    "string_agg_nation_customers": QuerySpec(advanced.string_agg_nation_customers, advanced.STRING_AGG_SQL),
    # =================================================================
    # r1 driver-green set (48 hash_match rows in CORRECTNESS_r01.json)
    # --- CDC core (REF semantics: es.go:47-144, utils.go:92-117) ---
    "cdc_apply_changes": QuerySpec(cdcq.cdc_apply_changes, cdcq.CDC_APPLY_SQL),
    "cdc_apply_changes_typed": QuerySpec(cdcq.cdc_apply_changes_typed, cdcq.CDC_APPLY_TYPED_SQL),
    "cdc_apply_changes_evolving": QuerySpec(cdcq.cdc_apply_changes_evolving, cdcq.CDC_APPLY_EVOLVING_SQL),
    "cdc_replay_dedup": QuerySpec(cdcq.cdc_replay_dedup, cdcq.CDC_APPLY_SQL),
    "cdc_snapshot_bootstrap": QuerySpec(cdcq.cdc_snapshot_bootstrap, cdcq.CDC_APPLY_SQL),
    "cdc_latest_event": QuerySpec(cdcq.cdc_latest_event, cdcq.CDC_LATEST_EVENT_SQL),
    "cdc_dead_letters": QuerySpec(cdcq.cdc_dead_letters, cdcq.CDC_DEAD_LETTERS_SQL),
    "cdc_multi_table_route": QuerySpec(cdcq.cdc_multi_table_route, cdcq.CDC_MULTI_TABLE_SQL),
    "cdc_scd2_history": QuerySpec(scd2.cdc_scd2_history, scd2.CDC_SCD2_SQL),
    "cdc_state_asof": QuerySpec(scd2.cdc_state_asof, scd2.CDC_STATE_ASOF_SQL),
    # --- relational: scans/filters/joins/aggs ---
    "q1_pricing_summary": QuerySpec(relational.q1_pricing_summary, relational.Q1_SQL),
    "q3_shipping_priority": QuerySpec(relational.q3_shipping_priority, relational.Q3_SQL),
    "q5_region_revenue": QuerySpec(relational.q5_region_revenue, relational.Q5_SQL),
    "q6_revenue_forecast": QuerySpec(relational.q6_revenue_forecast, relational.Q6_SQL),
    "q10_returned_items": QuerySpec(relational.q10_returned_items, relational.Q10_SQL),
    "join_left_outer": QuerySpec(relational.join_left_outer, relational.JOIN_LEFT_SQL),
    "join_semi": QuerySpec(relational.join_semi, relational.JOIN_SEMI_SQL),
    "join_anti": QuerySpec(relational.join_anti, relational.JOIN_ANTI_SQL),
    "join_full_outer": QuerySpec(relational.join_full_outer, relational.JOIN_FULL_OUTER_SQL),
    "join_cross": QuerySpec(relational.join_cross, relational.JOIN_CROSS_SQL),
    "agg_distinct": QuerySpec(relational.agg_distinct, relational.AGG_DISTINCT_SQL),
    "agg_rollup": QuerySpec(relational.agg_rollup, relational.AGG_ROLLUP_SQL),
    "agg_cube": QuerySpec(relational.agg_cube, relational.AGG_CUBE_SQL),
    "q2_min_balance_supplier": QuerySpec(tpch_extra.q2_min_balance_supplier, tpch_extra.Q2_SQL),
    "q4_priority_with_lineitems": QuerySpec(tpch_extra.q4_priority_with_lineitems, tpch_extra.Q4_SQL),
    "q14_promo_revenue_ratio": QuerySpec(tpch_extra.q14_promo_revenue_ratio, tpch_extra.Q14_SQL),
    "q15_top_supplier": QuerySpec(tpch_extra.q15_top_supplier, tpch_extra.Q15_SQL),
    "q16_supplier_variety": QuerySpec(tpch_extra.q16_supplier_variety, tpch_extra.Q16_SQL),
    "q19_or_of_ands": QuerySpec(tpch_extra.q19_or_of_ands, tpch_extra.Q19_SQL),
    "q22_idle_rich_customers": QuerySpec(tpch_extra.q22_idle_rich_customers, tpch_extra.Q22_SQL),
    "q7_nation_trade": QuerySpec(tpch_extra.q7_nation_trade, tpch_extra.Q7_SQL),
    "q9_product_profit": QuerySpec(tpch_extra.q9_product_profit, tpch_extra.Q9_SQL),
    "q13_order_count_distribution": QuerySpec(tpch_extra.q13_order_count_distribution, tpch_extra.Q13_SQL),
    "q8_market_share": QuerySpec(tpch_more.q8_market_share, tpch_more.Q8_SQL),
    "q11_important_parts": QuerySpec(tpch_more.q11_important_parts, tpch_more.Q11_SQL),
    "q12_shipping_delay_priority": QuerySpec(tpch_more.q12_shipping_delay_priority, tpch_more.Q12_SQL),
    "q17_small_quantity_revenue": QuerySpec(tpch_more.q17_small_quantity_revenue, tpch_more.Q17_SQL),
    "q18_large_volume_customers": QuerySpec(tpch_more.q18_large_volume_customers, tpch_more.Q18_SQL),
    "q20_heavy_promo_shippers": QuerySpec(tpch_more.q20_heavy_promo_shippers, tpch_more.Q20_SQL),
    "q21_sole_return_supplier": QuerySpec(tpch_more.q21_sole_return_supplier, tpch_more.Q21_SQL),
    # --- advanced relational ---
    "pivot_priority_status": QuerySpec(advanced.pivot_priority_status, advanced.PIVOT_SQL),
    "grouping_sets_mix": QuerySpec(advanced.grouping_sets_mix, advanced.GROUPING_SETS_SQL),
    "having_big_orders": QuerySpec(advanced.having_big_orders, advanced.HAVING_SQL),
    "subquery_above_nation_avg": QuerySpec(advanced.subquery_above_nation_avg, advanced.SUBQUERY_AVG_SQL),
    "range_join_price_bands": QuerySpec(advanced.range_join_price_bands, advanced.RANGE_JOIN_SQL),
    "percentile_disc_prices": QuerySpec(advanced.percentile_disc_prices, advanced.PERCENTILE_SQL),
    "agg_stats_moments": QuerySpec(stats.agg_stats_moments, stats.AGG_STATS_MOMENTS_SQL),
    "percentile_cont_quantity": QuerySpec(stats.percentile_cont_quantity, stats.PERCENTILE_CONT_SQL),
    # --- round 3 additions (authored AFTER the 40 driver-unverified
    # queries above in rotation order: appended here so they fill the
    # 50-window's remaining slots without displacing them) ---
    "docs_rrf_fusion": QuerySpec(bm25.docs_rrf_fusion, bm25.DOCS_RRF_FUSION_SQL),
    "emb_pq_adc_topk": QuerySpec(similarity.emb_pq_adc_topk, similarity.EMB_PQ_ADC_SQL),
    "docs_dedup_rate_report": QuerySpec(dedup.docs_dedup_rate_report, dedup.DOCS_DEDUP_RATE_SQL),
    "stats_linreg_price_qty": QuerySpec(stats.stats_linreg_price_qty, stats.STATS_LINREG_SQL),
    "events_interval_join": QuerySpec(events_q.events_interval_join, events_q.EVENTS_INTERVAL_JOIN_SQL),
    "events_asof_forward": QuerySpec(events_q.events_asof_forward, events_q.EVENTS_ASOF_FWD_SQL),
    "events_props_schema_profile": QuerySpec(events_q.events_props_schema_profile, events_q.EVENTS_PROPS_PROFILE_SQL),
    "events_daily_top_types_delta": QuerySpec(events_q.events_daily_top_types_delta, events_q.EVENTS_DAILY_TOP_SQL),
    "cdc_changelog_stats": QuerySpec(cdcq.cdc_changelog_stats, cdcq.CDC_CHANGELOG_STATS_SQL),
    "nation_share_of_segment": QuerySpec(windows.nation_share_of_segment, windows.NATION_SHARE_SQL),
    # --- round 3, batch 2 (authored below the full round-3 window:
    # these enter the driver's evaluation prefix in round 4) ---
    "docs_chunk_dedup": QuerySpec(dedup.docs_chunk_dedup, dedup.DOCS_CHUNK_DEDUP_SQL),
    "docs_simhash_hamming_pairs": QuerySpec(dedup.docs_simhash_hamming_pairs, dedup.DOCS_SIMHASH_HAMMING_SQL),
    "docs_cluster_representatives": QuerySpec(dedup.docs_cluster_representatives, dedup.DOCS_CLUSTER_REPS_SQL),
    "docs_domain_mixture": QuerySpec(sampling.docs_domain_mixture, sampling.DOCS_DOMAIN_MIXTURE_SQL),
    "events_type_transitions": QuerySpec(analytics.events_type_transitions, analytics.EVENTS_TRANSITIONS_SQL),
    "events_markov_stationary": QuerySpec(analytics.events_markov_stationary, analytics.EVENTS_MARKOV_SQL),
    "events_type_share_drift": QuerySpec(analytics.events_type_share_drift, analytics.EVENTS_TYPE_DRIFT_SQL),
    "emb_ivfpq_topk": QuerySpec(similarity.emb_ivfpq_topk, similarity.EMB_IVFPQ_SQL),
    "docs_bigram_lm_score": QuerySpec(lm.docs_bigram_lm_score, lm.DOCS_BIGRAM_LM_SQL),
    "emb_prefix_rerank_topk": QuerySpec(similarity.emb_prefix_rerank_topk, similarity.EMB_PREFIX_RERANK_SQL),
    # verbatim-portable SQL #2: the oracle IS the same text.
    "sql_ansi_window_portable": QuerySpec(sql_frontend.sql_ansi_window_portable, sql_frontend.SQL_ANSI_WINDOW_PORTABLE),
    "multimodal_frame_dedup": QuerySpec(multimodal.multimodal_frame_dedup, multimodal.MULTIMODAL_FRAME_DEDUP_SQL),
    "graph_connected_components": QuerySpec(graph.graph_connected_components, graph.GRAPH_CC_SQL),
    "docs_weighted_sample": QuerySpec(sampling.docs_weighted_sample, sampling.DOCS_WEIGHTED_SAMPLE_SQL),
    "corpus_governance_report": QuerySpec(quality.corpus_governance_report, quality.CORPUS_GOVERNANCE_SQL),
    "docs_ngram_novelty": QuerySpec(dedup.docs_ngram_novelty, dedup.DOCS_NGRAM_NOVELTY_SQL),
    "events_dau_stickiness": QuerySpec(analytics.events_dau_stickiness, analytics.EVENTS_DAU_STICKINESS_SQL),
    "orders_interpurchase_stats": QuerySpec(analytics.orders_interpurchase_stats, analytics.ORDERS_INTERPURCHASE_SQL),
    "docs_langid_confusion": QuerySpec(text.docs_langid_confusion, text.DOCS_LANGID_CONFUSION_SQL),
    "supplier_lead_time_stats": QuerySpec(analytics.supplier_lead_time_stats, analytics.SUPPLIER_LEAD_TIME_SQL),
    # --- round 4: scale hardening & observability ---
    "dedup_bucket_overflow_report": QuerySpec(
        dedup.dedup_bucket_overflow_report, dedup.DEDUP_BUCKET_OVERFLOW_SQL),
    "orders_segment_skew_join": QuerySpec(
        analytics.orders_segment_skew_join, analytics.ORDERS_SEGMENT_SKEW_SQL),
    "ivm_orders_priority_rollup": QuerySpec(
        ivm.ivm_orders_priority_rollup, ivm.IVM_ORDERS_ROLLUP_SQL),
    # --- round 4: breadth (semantic dedup, phrase mining, containment,
    #     corpus stats, revenue concentration, seasonality, range ANN) ---
    "emb_semdedup_prune": QuerySpec(
        similarity.emb_semdedup_prune, similarity.EMB_SEMDEDUP_SQL),
    "emb_range_search": QuerySpec(
        similarity.emb_range_search, similarity.EMB_RANGE_SEARCH_SQL),
    "docs_pmi_collocations": QuerySpec(
        lm.docs_pmi_collocations, lm.DOCS_PMI_SQL),
    "docs_zipf_slope": QuerySpec(lm.docs_zipf_slope, lm.DOCS_ZIPF_SQL),
    "docs_minhash_containment": QuerySpec(
        dedup.docs_minhash_containment, dedup.DOCS_CONTAINMENT_SQL),
    "docs_length_histogram": QuerySpec(
        text.docs_length_histogram, text.DOCS_LENGTH_HIST_SQL),
    "orders_pareto_revenue_share": QuerySpec(
        analytics.orders_pareto_revenue_share, analytics.ORDERS_PARETO_SQL),
    "events_hourly_seasonality": QuerySpec(
        analytics.events_hourly_seasonality,
        analytics.EVENTS_SEASONALITY_SQL),
    "graph_degree_distribution": QuerySpec(
        graph.graph_degree_distribution, graph.GRAPH_DEGREE_DIST_SQL),
    "emb_pair_cosine_histogram": QuerySpec(
        similarity.emb_pair_cosine_histogram, similarity.EMB_PAIR_HIST_SQL),
    "emb_norm_histogram": QuerySpec(
        similarity.emb_norm_histogram, similarity.EMB_NORM_HIST_SQL),
    "docs_dedup_survivorship_quality": QuerySpec(
        dedup.docs_dedup_survivorship_quality, dedup.DOCS_SURVIVORSHIP_SQL),
    "docs_char_trigram_profile": QuerySpec(
        text.docs_char_trigram_profile, text.DOCS_CHAR_TRIGRAM_SQL),
    "orders_monthly_revenue_yoy": QuerySpec(
        analytics.orders_monthly_revenue_yoy,
        analytics.ORDERS_MONTHLY_YOY_SQL),
    "docs_source_quality_report": QuerySpec(
        quality.docs_source_quality_report, quality.DOCS_SOURCE_QUALITY_SQL),
    "emb_label_cluster_purity": QuerySpec(
        similarity.emb_label_cluster_purity,
        similarity.EMB_CLUSTER_PURITY_SQL),
    "emb_label_knn_accuracy": QuerySpec(
        similarity.emb_label_knn_accuracy, similarity.EMB_KNN_ACCURACY_SQL),
    "lineitem_monthly_returnflag_share": QuerySpec(
        analytics.lineitem_monthly_returnflag_share,
        analytics.LINEITEM_MONTHLY_FLAG_SQL),
    "events_value_deciles": QuerySpec(
        analytics.events_value_deciles, analytics.EVENTS_VALUE_DECILES_SQL),
    "docs_vocab_growth_curve": QuerySpec(
        text.docs_vocab_growth_curve, text.DOCS_VOCAB_GROWTH_SQL),
    "events_user_burstiness": QuerySpec(
        analytics.events_user_burstiness, analytics.EVENTS_BURSTINESS_SQL),
    "lineitem_discount_band_revenue": QuerySpec(
        analytics.lineitem_discount_band_revenue,
        analytics.LINEITEM_DISCOUNT_BAND_SQL),
    "part_type_price_summary": QuerySpec(
        analytics.part_type_price_summary, analytics.PART_TYPE_PRICE_SQL),
}


_PKG = __package__  # "postgres_es_cdc_spark"
_PKG_DIR = __import__("os").path.dirname(__import__("os").path.abspath(__file__))
_FILE_AST_SHA: dict[str, str] = {}   # module file path -> sha of ast.dump
_MOD_DEPS: dict[str, set] = {}       # module name -> direct first-party deps
_DEP_DIGEST: dict[str, str] = {}     # module name -> transitive closure digest


def _module_file(modname: str) -> str | None:
    import os
    parts = modname.split(".")
    if parts[0] != _PKG:
        return None
    base = os.path.join(_PKG_DIR, *parts[1:])
    for p in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.isfile(p):
            return p
    return None


def _ast_sha(path: str) -> str:
    """sha256 of the module's *parsed* AST dump: whitespace/comment-only
    edits don't change it; any code or docstring change does."""
    if path not in _FILE_AST_SHA:
        import ast
        import hashlib
        with open(path, "rb") as f:
            src = f.read()
        try:
            norm = ast.dump(ast.parse(src))
        except SyntaxError:
            norm = src.decode("utf-8", "replace")
        _FILE_AST_SHA[path] = hashlib.sha256(norm.encode()).hexdigest()
    return _FILE_AST_SHA[path]


def _direct_deps(modname: str) -> set:
    """First-party modules imported by modname, found by SOURCE scan so
    function-local (lazy) imports count too."""
    if modname not in _MOD_DEPS:
        import re
        deps: set = set()
        path = _module_file(modname)
        if path is not None:
            with open(path, encoding="utf-8", errors="replace") as f:
                src = f.read()
            for m in re.finditer(
                    rf"from\s+({_PKG}[\w.]*)\s+import\s+(\([^)]*\)|[^\n]*)",
                    src):
                base, names = m.group(1), m.group(2)
                deps.add(base)
                for tok in names.strip("()").split(","):
                    sub = tok.split("#")[0].strip().split(" as ")[0].strip()
                    if sub and _module_file(f"{base}.{sub}"):
                        deps.add(f"{base}.{sub}")
            for m in re.finditer(rf"^\s*import\s+({_PKG}[\w.]*)", src,
                                 re.MULTILINE):
                deps.add(m.group(1))
        _MOD_DEPS[modname] = deps
    return _MOD_DEPS[modname]


def _dep_digest(root: str) -> str:
    """Digest of the transitive first-party module closure reachable from
    ``root`` (including itself): the 'engine code this query runs on'."""
    if root not in _DEP_DIGEST:
        import hashlib
        seen: set = set()
        todo = [root]
        while todo:
            mod = todo.pop()
            if mod in seen or _module_file(mod) is None:
                continue
            seen.add(mod)
            todo.extend(_direct_deps(mod))
        parts = sorted(f"{m}\x00{_ast_sha(_module_file(m))}" for m in seen)
        _DEP_DIGEST[root] = hashlib.sha256(
            "\x01".join(parts).encode()).hexdigest()
    return _DEP_DIGEST[root]


def query_fingerprint(spec: QuerySpec) -> str:
    """Identity of a query's *implementation*: sha256 over the registered
    function's source, its oracle SQL, and the AST digest of every
    first-party module transitively imported by the function's defining
    module (source-scanned, so function-local imports count). A helper
    edit anywhere in the query's engine closure therefore invalidates its
    recorded fingerprint and rotates it back into the driver's evaluation
    window (the r13 verdict's gap: helper-level rewrites shipped without
    fresh driver-oracle rows). Comment/format-only edits don't invalidate
    (the closure hashes parsed ASTs, not raw bytes)."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = repr(spec.fn)
    mod = getattr(spec.fn, "__module__", "") or ""
    dep = _dep_digest(mod) if mod.startswith(_PKG) else ""
    return hashlib.sha256(
        (src + "\x00" + (spec.oracle or "") + "\x00" + dep).encode()
    ).hexdigest()


# When more queries need (re-)verification than the driver's 50-row
# window holds — the r14 situation: transitive-helper fingerprints
# (query_fingerprint above) invalidate every consumer of an edited
# engine module — this list decides WHICH unverified queries the
# window samples first: the queries whose engine paths were actually
# rewritten this round (wire codec, IVM join sink, keeper store,
# bucketed reps layout, GEMM intake, LM/decontam plan rewrites),
# then one representative slice per touched family. Names not listed
# keep their authored relative order behind these; verified-green
# queries stay rotated to the back regardless.
REVERIFY_PRIORITY: list = [
    "cdc_pgoutput_roundtrip", "cdc_schema_evolution_fold",
    "cdc_apply_changes", "cdc_truncate_restart_fold",
    "ivm_join_view_compacted_rollup", "ivm_join_view_rollup",
    "ivm_topk_orders_by_segment", "ivm_watermark_rollup",
    "ivm_watermark_late_report", "ivm_session_rollup", "ivm_hll_rollup",
    "ivm_qsketch_rollup", "ivm_orders_priority_rollup",
    "docs_streaming_cluster_keepers", "docs_streaming_cluster_fold",
    "docs_incremental_cluster_fold", "docs_dedup_clusters_collapsed",
    "docs_dedup_routing_report",
    "docs_streaming_lsh_fold", "emb_streaming_near_dup_fold",
    "emb_incremental_near_dup_pairs", "docs_incremental_lsh_pairs",
    "docs_incremental_lsh_multibatch", "streaming_dedup_first_event",
    "docs_bigram_lm_score", "docs_perplexity_filter_report",
    "docs_pmi_collocations", "docs_decontaminate", "docs_ngram_coverage",
    "graph_connected_components", "graph_clustering_coefficient",
    "graph_triangle_estimate", "graph_kcore_fixpoint",
    "graph_bfs_distances",
    "emb_cosine_topk", "emb_hier_assign", "emb_pca_top_component",
    "emb_ivf_recall", "emb_matryoshka_recall",
    "emb_binary_quantize_topk", "emb_semdedup_prune", "emb_pq_adc_topk",
    "docs_exact_dedup", "docs_minhash_lsh_pairs",
    "docs_minhash_signatures", "docs_near_dup_rate_by_source",
    "part_name_fuzzy_pairs",
    "multimodal_embed_topk", "multimodal_frame_dedup",
    "docs_winnowing_overlap",
]


def rotate_by_correctness(registry: dict[str, QuerySpec],
                          artifact_dir: str | None = None
                          ) -> dict[str, QuerySpec]:
    """Self-driving rotation of the driver's 50-query evaluation prefix:
    any query with a STILL-VALID hash-green row in a prior
    CORRECTNESS_r*.json moves behind the ones lacking driver
    verification, preserving the authored priority order within each
    group. A green row is valid only while the query's implementation
    fingerprint matches the one recorded in QUERY_FINGERPRINTS.json
    (maintained by tools/record_fingerprints.py at round start) — a
    rewritten query or oracle rotates back into the evaluation window
    instead of keeping stale green status. With no artifacts present
    this is the identity, so the static ordering above remains the
    round-1 behavior."""
    import glob
    import json
    import os

    if artifact_dir is None:
        artifact_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                green.add(name)
    try:
        with open(os.path.join(artifact_dir, "QUERY_FINGERPRINTS.json")) as f:
            recorded = json.load(f)
    except (OSError, ValueError):
        recorded = None
    if recorded is not None:
        green = {n for n in green
                 if n in registry
                 and recorded.get(n) == query_fingerprint(registry[n])}
    prio = {n: i for i, n in enumerate(REVERIFY_PRIORITY)}
    names = [k for k in registry if k not in green]
    authored = {k: i for i, k in enumerate(registry)}
    names.sort(key=lambda k: (prio.get(k, len(prio)), authored[k]))
    front = {k: registry[k] for k in names}
    back = {k: v for k, v in registry.items() if k in green}
    return {**front, **back}


REGISTRY = rotate_by_correctness(REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
