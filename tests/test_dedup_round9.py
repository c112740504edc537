"""Round-9 dedup fixes (ADVICE r8): the GEMM auto-gate profiles the
valid-row basis its candidate path actually buckets, and a tripped
arrow/sql auto-gate releases the raw projection's storage before
materializing the centered one."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.operators import dedup as OD


def _balanced_rows(n=60, dim=8):
    def val(i, j):
        h = int(hashlib.md5(f"bal|{i}|{j}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 250.0

    return [(i, [val(i, j) for j in range(dim)]) for i in range(n)]


def _null_heavy_corpus(spark, n_valid=60, n_null=200, dim=8):
    """Balanced valid rows swamped by NULL-embedding rows: the UNFILTERED
    raw profile is cone-shaped (nulls pile into bucket 0, max_bucket*4 >
    rows; few valid rows keep n_buckets*4 < 2^planes) while the
    valid-row profile is balanced — the exact divergence ADVICE r8 #2
    describes."""
    rows = _balanced_rows(n_valid, dim)
    rows += [(10_000 + i, None) for i in range(n_null)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_gemm_auto_gate_ignores_null_rows(spark):
    df = _null_heavy_corpus(spark)
    planes = 8
    valid = (
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & ~F.exists("embedding", lambda x: x.isNull())
    )
    # Premise: the two bases disagree — unfiltered trips, valid-only not.
    assert OD.cone_gate(df, "embedding", 8, planes)
    assert not OD.cone_gate(df.filter(valid), "embedding", 8, planes)
    auto = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=planes, verify="gemm", center="auto"
    )
    raw = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=planes, verify="gemm", center=False
    )
    assert {(r.vec_id, r._rep) for r in auto.collect()} == {
        (r.vec_id, r._rep) for r in raw.collect()
    }


def _cone_corpus(spark, n=120, dim=8, shift=12.0):
    def dev(i, j):
        h = int(hashlib.md5(f"cone|{i}|{j}".encode()).hexdigest()[:8], 16)
        return (h % 11 - 5) * 0.3

    rows = [(i, [shift + dev(i, j) for j in range(dim)]) for i in range(n)]
    for i in range(5):
        rows.append((1000 + i, [x * 1.000001 for x in rows[i][1]]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_tripped_auto_gate_releases_raw_projection(spark):
    """ADVICE r8 #3: with a `resources` list, a tripped arrow-path gate
    must hand the caller ONLY the centered projection handle — the raw
    one is unpersisted inside the operator, so peak storage on cone
    corpora is one projection, not two."""
    df = _cone_corpus(spark)
    resources: list = []
    dup = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, verify="arrow",
        center="auto", resources=resources,
    )
    assert len(resources) == 1  # raw handle released, centered handle kept
    got = {(r.vec_id, r._rep) for r in dup.collect()}
    pinned = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, verify="arrow", center=True
    )
    assert got == {(r.vec_id, r._rep) for r in pinned.collect()}
    OD.release_all(resources)


def test_silent_auto_gate_keeps_single_handle(spark):
    """Balanced corpus, arrow path: the gate stays silent and the caller
    still owns exactly one (raw) projection handle."""
    df = spark.createDataFrame(
        _balanced_rows(150), "vec_id int, embedding array<double>"
    )
    resources: list = []
    dup = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, verify="arrow",
        center="auto", resources=resources,
    )
    assert len(resources) == 1
    raw = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, verify="arrow", center=False
    )
    assert {(r.vec_id, r._rep) for r in dup.collect()} == {
        (r.vec_id, r._rep) for r in raw.collect()
    }
    OD.release_all(resources)


def test_banded_auto_gate_fires_and_matches_pinned_center(spark):
    """VERDICT r8 #6: with bands>1 the gate profiles band 0's key
    (element_at(_bk, 1)); on a cone corpus the auto path must produce
    exactly the pinned center=True banded plan's pairs."""
    df = _cone_corpus(spark)
    auto = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, bands=3,
        verify="arrow", center="auto",
    )
    pinned = OD.embedding_cosine_dup_map(
        df, dim=8, threshold=0.98, planes=6, bands=3,
        verify="arrow", center=True,
    )
    assert {(r.vec_id, r._rep) for r in auto.collect()} == {
        (r.vec_id, r._rep) for r in pinned.collect()
    }
