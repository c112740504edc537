"""Advanced-query tests: deep-MLP UDF parity (numpy spec vs Spark UDF),
semantic dedup sanity, as-of join semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.plans import advanced_queries as AQ


def test_mlp_deep_score_parity(spark, sf_dir):
    got = {
        r.vec_id: r.deep_score
        for r in AQ.a_mlp_deep_score(spark, sf_dir).collect()
    }
    pdf = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = AQ.mlp_forward_py(mat)
    for vid, w in zip(pdf["vec_id"], want):
        assert got[vid] == pytest.approx(round(w, 6), abs=1e-9)


def test_mlp_has_nonlinearity():
    # ReLU must actually fire: forward of x and -x differ in magnitude
    x = np.ones((1, 64))
    a = AQ.mlp_forward_py(x)[0]
    b = AQ.mlp_forward_py(-x)[0]
    assert abs(a + b) > 1e-9  # not an odd function -> nonlinear


def test_semantic_dedup_clusters_complete(spark, sf_dir):
    out = AQ.a_semantic_dedup(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 10  # k=10 clusters, all non-empty (seeded)
    assert sum(r.n for r in rows) <= 500


def test_asof_prev_click_is_before_purchase(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").toPandas()
    ts = dict(zip(ev.event_id, ev.ts))
    rows = AQ.a_asof_click_before_purchase(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.prev_click_id is not None:
            assert ts[r.prev_click_id] <= ts[r.purchase_id]
