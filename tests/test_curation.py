"""Tests for the round-2 curation operators (operators/curation.py,
functions/urls.py, plans/curation_queries.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from webscale_multimodal_datapipeline_spark.functions import urls as URLS
from webscale_multimodal_datapipeline_spark.operators import curation as CU

# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def test_sequence_pack_boundaries(spark):
    # one bucket so the packing order is just doc_id; budget 10 tokens
    rows = [
        (1, "a b c d"),          # 4 tokens, cum 4  -> starts at 0  -> seq 0
        (2, "e f g h i"),        # 5 tokens, cum 9  -> starts at 4  -> seq 0
        (3, "j k l"),            # 3 tokens, cum 12 -> starts at 9  -> seq 0 (straddles)
        (4, "m n"),              # 2 tokens, cum 14 -> starts at 12 -> seq 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = CU.sequence_pack(df, budget=10, buckets=1).orderBy("doc_id").collect()
    assert [r.seq_id for r in out] == [0, 0, 0, 1]
    assert [r.n_tokens for r in out] == [4, 5, 3, 2]
    assert all(r.pack_bucket == 0 for r in out)


def test_sequence_pack_bucket_stability(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(40)], "doc_id long, text string"
    )
    a = {r.doc_id: (r.pack_bucket, r.seq_id) for r in CU.sequence_pack(df).collect()}
    b = {r.doc_id: (r.pack_bucket, r.seq_id) for r in CU.sequence_pack(df).collect()}
    assert a == b  # deterministic, no RNG
    assert len({v[0] for v in a.values()}) > 1  # uses multiple buckets


# ---------------------------------------------------------------------------
# Boilerplate stats
# ---------------------------------------------------------------------------


def test_boilerplate_stats_flags_repeated_content(spark):
    boiler = "subscribe to our newsletter now"
    rows = [(i, boiler) for i in range(5)] + [
        (10, "completely original text about sparks"),
        (11, "another unique document body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in CU.boilerplate_stats(df, min_df=3).collect()
    }
    # the repeated doc's shingles all occur 5x >= 3 -> ratio 1.0
    assert out[0].boiler_ratio == 1.0
    # unique docs share no common shingles
    assert out[10].n_common == 0 and out[10].boiler_ratio == 0.0
    filtered = CU.boilerplate_filter(df, max_ratio=0.5, min_df=3)
    assert sorted(r.doc_id for r in filtered.collect()) == [10, 11]


# ---------------------------------------------------------------------------
# Stratified sampling / quantile filter
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_counts(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = CU.stratified_sample(df, n_per_stratum=10)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 10, "fr": 10}
    # deterministic: same sample both runs
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in CU.stratified_sample(df, n_per_stratum=10).collect())
    assert ids1 == ids2


def test_quantile_filter_keeps_top_fraction(spark):
    rows = [(i, "en", float(i)) for i in range(100)] + [(100 + i, "fr", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = CU.quantile_filter(df, F.col("s"), keep_frac=0.2, strata_col="lang")
    got = out.groupBy("lang").agg(F.count("*").alias("n"), F.min("score").alias("lo")).collect()
    by_lang = {r.lang: r for r in got}
    assert by_lang["en"].n == 20 and by_lang["en"].lo == 80.0
    assert by_lang["fr"].n == 2 and by_lang["fr"].lo == 8.0


def test_quantile_threshold_filter_approximates_exact(spark):
    rows = [(i, "en", float(i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    exact = CU.quantile_filter(df, F.col("s"), keep_frac=0.2).count()
    approx = CU.quantile_threshold_filter(df, F.col("s"), keep_frac=0.2).count()
    # sketch error is bounded; on 50 distinct values it lands within one bin
    assert abs(approx - exact) <= 500 * 0.05


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "url,expected",
    [
        ("HTTPS://WWW.Example.COM:443/a/", "https://www.example.com/a"),
        ("http://example.com:80/x?b=2&a=1", "http://example.com/x?a=1&b=2"),
        (
            "https://ex.com/p?utm_source=x&ref=abc&keep=1#frag",
            "https://ex.com/p?keep=1",
        ),
        ("https://ex.com/p?utm_campaign=only", "https://ex.com/p"),
        ("https://ex.com", "https://ex.com"),
        ("https://ex.com/?a=1", "https://ex.com?a=1"),
    ],
)
def test_canonical_url_cases(spark, url, expected):
    df = spark.createDataFrame([(url,)], "u string")
    got = df.select(URLS.canonical_url("u").alias("c")).first().c
    assert got == expected


# ---------------------------------------------------------------------------
# Cross-modal score parity
# ---------------------------------------------------------------------------


def test_crossmodal_score_matches_numpy(spark, sf_dir):
    import numpy as np

    from webscale_multimodal_datapipeline_spark.plans.curation_queries import (
        CROSSMODAL_REF,
        v_crossmodal_filter,
    )

    out = v_crossmodal_filter(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    by_id = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    ref = np.array(CROSSMODAL_REF)
    for r in out:
        expect = float(by_id[r.doc_id] @ ref)
        assert abs(r.score - expect) < 1e-9
        assert r.score > 0


# ---------------------------------------------------------------------------
# Duplicate-line removal
# ---------------------------------------------------------------------------


def test_duplicate_line_removal_scrubs_cross_doc_lines(spark):
    from webscale_multimodal_datapipeline_spark.operators.curation import (
        duplicate_line_removal,
    )

    df = spark.createDataFrame(
        [
            (1, "unique alpha\nSubscribe now\nmore words"),
            (2, "subscribe now\ndifferent body"),
            (3, "Subscribe NOW \nonly boilerplate here not shared"),
            (4, "Subscribe now"),  # becomes empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_line_removal(df).collect()}
    # 'subscribe now' key appears in docs 1,2,3,4 (case/trim-insensitive)
    assert out[1].text == "unique alpha\nmore words"
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    assert out[2].text == "different body"
    assert out[3].text == "only boilerplate here not shared"
    assert out[4].text == "" and out[4].n_removed == 1
    # unique lines in a single doc survive untouched
    assert out[2].n_lines == 2


def test_duplicate_line_removal_min_df_threshold(spark):
    from webscale_multimodal_datapipeline_spark.operators.curation import (
        duplicate_line_removal,
    )

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nd")],
        "doc_id long, text string",
    )
    out3 = {
        r.doc_id: r.text for r in duplicate_line_removal(df, min_df=3).collect()
    }
    # 'a' is in 3 docs -> removed at min_df=3; 'b'/'c'/'d' survive
    assert out3 == {1: "b", 2: "c", 3: "d"}
    out4 = {
        r.doc_id: r.text for r in duplicate_line_removal(df, min_df=4).collect()
    }
    assert out4 == {1: "a\nb", 2: "a\nc", 3: "a\nd"}


# ---------------------------------------------------------------------------
# Merge / upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_update_insert_carryover(spark):
    from webscale_multimodal_datapipeline_spark.operators.curation import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    delta = spark.createDataFrame(
        [(2, "b2", 22.0), (9, "new", 90.0)],
        "k long, name string, v double",
    )
    got = {r.k: (r.name, r.v) for r in merge_upsert(base, delta, "k").collect()}
    assert got == {
        1: ("a", 10.0),   # carryover
        2: ("b2", 22.0),  # delta wins on collision
        3: ("c", 30.0),
        9: ("new", 90.0), # insert
    }
    # column order preserved from base
    assert merge_upsert(base, delta, "k").columns == ["k", "name", "v"]


def test_merge_upsert_delta_null_wins_and_unique_key_guard(spark):
    import pytest

    from webscale_multimodal_datapipeline_spark.operators.curation import (
        merge_upsert,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    delta = spark.createDataFrame(
        [(2, None, None)], "k long, name string, v double"
    )
    # UPDATE SET * semantics: a matched delta row wins wholesale — its
    # NULLs overwrite base values (not per-column COALESCE carryover)
    got = {r.k: (r.name, r.v) for r in merge_upsert(base, delta, "k").collect()}
    assert got == {1: ("a", 10.0), 2: (None, None)}

    dup_delta = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "k long, name string, v double"
    )
    with pytest.raises(ValueError, match="duplicate delta keys"):
        merge_upsert(base, dup_delta, "k", check_unique_delta_keys=True)


def test_unigram_logprob_operator_matches_query(spark, sf_dir):
    """The YAML-reachable operator annotates with exactly the scores the
    registry query computes (same LM, same rounding discipline), keeps
    every input row/column, and gives token-less rows NULL."""
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.operators.curation import unigram_logprob
    from webscale_multimodal_datapipeline_spark.plans.text_queries import t_unigram_logprob

    d = load_table(spark, sf_dir, "documents")
    got = unigram_logprob(d)
    assert got.count() == d.count()
    assert set(d.columns) < set(got.columns)
    a = {r.doc_id: r.avg_logprob for r in got.select("doc_id", "avg_logprob").collect()}
    b = {r.doc_id: r.avg_logprob for r in t_unigram_logprob(spark, sf_dir).collect()}
    for k, v in b.items():
        assert a[k] == v
    # a row with empty text -> NULL annotation, row retained
    empty = spark.createDataFrame([(999999, ""), (999998, "a b a")], "doc_id long, text string")
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(empty).collect()}
    assert out[999999] is None and out[999998] is not None
