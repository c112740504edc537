"""Differential tests vs the DuckDB oracle at sf0.001 — the house style of
the reference (Python-vs-Rust parity, ``tests/test_image_technical_quality.py``)
re-aimed at Spark-vs-DuckDB. A representative subset per query family;
``tools/oracle_check.py`` runs the full catalog.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from __spark_entry__ import oracle_sql, queries
from webscale_multimodal_datapipeline_spark.catalog import TABLES

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_top_customers_per_nation",
    "t_url_filter",
    "t_text_stats",
    "d_coarse_dedup_rejected",
    "d_simhash",
    "v_mlp_score",
    "v_cosine_topk",
    "e_sessionization",
    "e_funnel",
    "q8_market_share",
    "q13_order_distribution",
    "q22_global_sales",
    "t_lang_id",
    "x_rank_distributions",
    "x_levenshtein_near_names",
    "t_pii_redact",
    "t_domain_mix",
    "d_decontaminate",
    "t_quality_classifier",
    "d_dedup_components",
    "c_line_dedup",
    "c_upsert",
    "ts_gap_fill",
    "v_quantize_int8",
    "ts_ewma",
    "x_column_profile",
    "x_histogram",
    "v_maxsim_topk",
    "t_flesch_reading_ease",
    "e_trigram_paths",
    "m_phash_blocklist",
    "d_contamination_score",
    "t_bigram_logprob",
    "e_attribution_credit",
    "g_bfs_hops",
    "v_binary_quantize_rerank",
    "p_snapshot_diff",
    "t_bpe_merge_candidates",
    "p_compaction_plan",
    "v_embedding_drift",
    "m_exif_scrub",
    "e_session_funnel_strict",
    "u_crawl_frontier",
    "c_score_normalize",
    "v_calibration_curve",
    "d_dedup_savings",
    "x_mode_median",
    "d_threshold_sweep",
    "d_cross_source_overlap",
    "x_benford_audit",
    "x_correlation",
    "v_mmr_diverse_topk",
    "ts_m4_downsample",
    "c_epoch_shuffle",
    "x_market_basket",
    "x_entity_resolution",
    "ts_seasonal_naive",
    "c_tokenizer_fertility",
    "a_grouped_agg_pandas",
    "a_grouped_map_rank",
    "e_wow_growth",
    "e_activity_streaks",
    "x_chi2_cells",
    "e_bot_heuristic",
    "s_dsir_importance",
    "s_ks_test",
    "s_mahalanobis_ood",
    "s_weighted_sample",
    "t_lang_confusion",
    "t_ttr_diversity",
    "e_activity_gini",
    "g_common_neighbors",
    "v_lsh_bucket_purity",
    "v_knn_classify",
    "s_psi_drift",
    "e_srm_check",
    "e_funnel_wilson_ci",
    "c_length_bucket_batching",
    "s_mannwhitney_u",
    "x_cramers_v",
    "t_char_entropy",
    "e_theil_index",
    "e_seasonality_strength",
    "x_id_gap_audit",
    "t_heaps_law",
    "p_pk_uniqueness",
    "t_length_lognormal_fit",
    "ts_cusum_changepoint",
    "s_bh_fdr",
    "d_lsh_s_curve",
    "d_ngram_novelty",
    "t_winnowing_fingerprint",
    "v_multiprobe_recall",
    "s_poisson_bootstrap",
    "s_neyman_allocation",
    "d_bloom_bitmap_fpr",
    "p_dataset_card",
    "e_power_analysis",
    "ts_autocorrelation",
    "x_skipping_benefit",
    "d_capture_recapture",
    "s_runs_test",
    "s_dsir_ess",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = _norm(queries()[name](spark, sf_dir).toPandas())
    ddf = _norm(duck.sql(oracle_sql()[name]).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    for c in sdf.columns:
        if sdf[c].dtype == np.float64:
            assert np.array_equal(
                sdf[c].to_numpy(), ddf[c].to_numpy(), equal_nan=True
            ), f"float col {c} differs"
        else:
            assert sdf[c].equals(ddf[c]), f"col {c} differs"


def test_every_oracle_has_query():
    qs, osql = queries(), oracle_sql()
    assert set(osql) <= set(qs)
    # catalog sanity: substantial coverage with oracles
    assert len(qs) >= 40 and len(osql) >= 39


def test_entry_runs(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"lang", "n_docs", "total_tokens", "avg_quality"}
