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
        r.vec_id: r.deep_score_e5
        for r in AQ.a_mlp_deep_score(spark, sf_dir).collect()
    }
    pdf = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = AQ.mlp_forward_py(mat)
    for vid, w in zip(pdf["vec_id"], want):
        assert got[vid] == int(round(w * 1e5))


def test_mlp_has_nonlinearity():
    # ReLU must actually fire: forward of x and -x differ in magnitude
    x = np.ones((1, 64))
    a = AQ.mlp_forward_py(x)[0]
    b = AQ.mlp_forward_py(-x)[0]
    assert abs(a + b) > 1e-9  # not an odd function -> nonlinear


def test_semantic_dedup_clusters_complete(spark, sf_dir):
    out = AQ.a_semantic_dedup(spark, sf_dir)
    [row] = out.collect()
    assert row.n_input == 500
    assert row.survivors_subset and row.cluster_coverage and row.count_ok


def test_asof_prev_click_is_before_purchase(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").toPandas()
    ts = dict(zip(ev.event_id, ev.ts))
    rows = AQ.a_asof_click_before_purchase(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.prev_click_id is not None:
            assert ts[r.prev_click_id] <= ts[r.purchase_id]


def test_ivf_topk_recall_and_shape(spark, sf_dir):
    """IVF ANN: exact schema, exact rank discipline, and recall vs the
    brute-force baseline high enough that probing works (3/8 clusters)."""
    from webscale_multimodal_datapipeline_spark.plans import vector_queries as VQ

    exact = VQ.v_cosine_topk(spark, sf_dir).collect()
    approx = VQ.v_ivf_topk(spark, sf_dir).collect()
    assert {tuple(r.asDict()) for r in approx} and approx[0].asDict().keys() == {
        "query_id",
        "vec_id",
        "cosine",
        "rank",
    }
    # every query returns exactly k ranked rows 1..k
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, VQ.TOP_K + 1)) for v in by_q.values())
    e_ids = {(r.query_id, r.vec_id) for r in exact}
    a_ids = {(r.query_id, r.vec_id) for r in approx}
    recall = len(e_ids & a_ids) / len(e_ids)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # rank-1 must be the query itself (cosine(q, q) = 1 is in its own cluster's probe set)
    for r in approx:
        if r.rank == 1:
            assert r.vec_id == r.query_id


def test_pq_adc_topk_recall_and_determinism(spark, sf_dir):
    """Product quantization: exact result-shape discipline, recall vs the
    exact L2 baseline comfortably above the oracle's 0.2 floor, and
    re-running the seeded pipeline reproduces the identical code
    assignment (determinism the invariant oracle leans on)."""
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.operators import similarity as OS
    from webscale_multimodal_datapipeline_spark.plans.vector_queries import DIM, N_QUERIES, TOP_K

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes, books = OS.pq_train_encode(e, dim=DIM, m=16, k=16)
    assert len(books) == 16 and len(books[0]) == 16 and len(books[0][0]) == DIM // 16
    pq = OS.pq_adc_topk(codes, books, q, dim=DIM, k=TOP_K).collect()
    by_q = {}
    for r in pq:
        by_q.setdefault(r.query_id, []).append(r.rank)
        assert r.adc_dist >= 0.0
    assert all(sorted(v) == list(range(1, TOP_K + 1)) for v in by_q.values())

    exact = OS.l2_topk(e, q, k=TOP_K).collect()
    e_ids = {(r.query_id, r.vec_id) for r in exact}
    a_ids = {(r.query_id, r.vec_id) for r in pq}
    recall = len(e_ids & a_ids) / len(e_ids)
    assert recall >= 0.25, f"PQ recall too low: {recall}"

    codes2, books2 = OS.pq_train_encode(e, dim=DIM, m=16, k=16)
    assert books == books2
    a = sorted(tuple(r) for r in codes.collect())
    b = sorted(tuple(r) for r in codes2.collect())
    assert a == b


def test_triangle_stats_known_graphs(spark):
    """Known-answer fixtures for the degree-oriented triangle counter —
    the DuckDB oracle mirrors the same algorithm, so only hand-computed
    graphs catch a shared algorithmic bug."""
    from webscale_multimodal_datapipeline_spark.plans.graph_queries import triangle_stats

    def run(pairs):
        e = spark.createDataFrame(pairs, "u long, v long")
        return triangle_stats(e).collect()[0]

    # K4: C(4,3) = 4 triangles
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = run(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # K4 minus one edge: exactly 2 triangles survive
    r = run([p for p in k4 if p != (3, 4)])
    assert r.n_triangles == 2
    # star (no closure): 0 triangles
    r = run([(1, 2), (1, 3), (1, 4), (1, 5)])
    assert (r.n_nodes, r.n_triangles) == (5, 0)
    # triangle + pendant: 1
    r = run([(1, 2), (1, 3), (2, 3), (3, 4)])
    assert r.n_triangles == 1


def test_containment_superset_pair(spark, tmp_path):
    """A doc fully contained in another scores containment 1.0."""
    import pandas as pd

    from webscale_multimodal_datapipeline_spark.plans.dedup_queries import (
        d_containment_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = small + " iota kappa lam mu nu xi omicron pi rho sigma tau"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [small, big, "totally different words only here now"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(small), len(big), 37],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = d_containment_pairs(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_l, r.id_r) == (2, 1) and r.containment == 1.0


def test_cdc_chunking_shift_locality(spark, tmp_path):
    """The CDC property fixed-width chunking lacks: prepending a token
    changes only the FIRST chunk's fingerprint — every boundary after the
    first anchor re-synchronizes."""
    import pandas as pd

    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.functions import text as TX

    base = "one two three four five six seven eight nine ten eleven twelve " * 8
    shifted = "inserted " + base
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [base.strip(), shifted.strip()],
            "lang": ["en"] * 2,
            "source": ["a", "b"],
            "n_chars": [len(base), len(shifted)],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.plans.text_queries import _CDC_MOD

    d = load_table(spark, str(tmp_path), "documents")
    toks = d.select("doc_id", F.posexplode(TX.norm_tokens("text")).alias("pos", "tok"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boundary = (F.pmod(TX.md5_long(F.col("tok")), F.lit(_CDC_MOD)) == 0).cast("int")
    chunks = (
        toks.withColumn("cid", F.coalesce(F.sum(boundary).over(w), F.lit(0)))
        .groupBy("doc_id", "cid")
        .agg(
            TX.md5_long(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("fp")
        )
    )
    fps = {r.doc_id: set() for r in chunks.collect()}
    for r in chunks.collect():
        fps[r.doc_id].add(r.fp)
    only_base = fps[1] - fps[2]
    only_shift = fps[2] - fps[1]
    # at most the first chunk differs on each side
    assert len(only_base) <= 1 and len(only_shift) <= 1
    # and the vast majority of chunks are shared (re-synchronized)
    assert len(fps[1] & fps[2]) >= len(fps[1]) - 1


def test_attribution_credit_known_answer(spark, tmp_path):
    """Hand-computed multi-touch attribution: horizon exclusion, uncredited
    trailing touches, first/last assignment, integer linear credit."""
    import datetime as dt

    import pandas as pd

    from webscale_multimodal_datapipeline_spark.plans.events_queries import (
        e_attribution_credit,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view, click then purchase; trailing view never credited
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase"),
        (4, t0 + dt.timedelta(minutes=3), 1, "view"),
        # user 2: purchase 10 days later — outside the 7-day horizon
        (5, t0, 2, "click"),
        (6, t0 + dt.timedelta(days=10), 2, "purchase"),
        # user 3: view, view, click -> purchase (n=3 linear split)
        (7, t0, 3, "view"),
        (8, t0 + dt.timedelta(minutes=1), 3, "view"),
        (9, t0 + dt.timedelta(minutes=2), 3, "click"),
        (10, t0 + dt.timedelta(minutes=3), 3, "purchase"),
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r.event_type: r for r in e_attribution_credit(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"view", "click"}
    v, c = got["view"], got["click"]
    assert (v.first_touch_convs, v.last_touch_convs, v.touches) == (2, 0, 3)
    assert (c.first_touch_convs, c.last_touch_convs, c.touches) == (0, 2, 2)
    # linear: u1 conversion n=2 (view 500000, click 500000); u3 n=3
    # (view 333333*2, click 333333)
    assert v.linear_ppm == 500_000 + 2 * 333_333
    assert c.linear_ppm == 500_000 + 333_333


def test_bfs_hops_chain_graph(spark, tmp_path):
    """BFS distances on a hand-built chain C1-S1-C2-S2-C3 with the single
    seed S1 (suppkey ≡ 1 mod 10): histogram {0:1, 1:2, 2:1, 3:1}."""
    import pandas as pd

    from webscale_multimodal_datapipeline_spark.plans.graph_queries import g_bfs_hops

    pd.DataFrame({"o_orderkey": [1, 2, 3, 4], "o_custkey": [1, 2, 2, 3]}).to_parquet(
        tmp_path / "orders.parquet"
    )
    pd.DataFrame({"l_orderkey": [1, 2, 3, 4], "l_suppkey": [1, 1, 2, 2]}).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    got = {r.hops: r.n_nodes for r in g_bfs_hops(spark, str(tmp_path)).collect()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_multiprobe_recall_monotone_in_probe_level(spark, sf_dir):
    """Multi-probe LSH invariants: raising the probe level can only ADD
    candidate buckets, so per-query candidates and hits are monotone
    non-decreasing in p, level-0 probes exactly the query's own bucket
    (so the self-match guarantees >= 1 candidate and >= 1 hit), and
    hits never exceed k."""
    from webscale_multimodal_datapipeline_spark.plans.vector_queries import (
        TOP_K,
        v_multiprobe_recall,
    )

    rows = v_multiprobe_recall(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.probe_level] = r
    for q, lv in by_q.items():
        assert set(lv) == {0, 1, 2}
        assert lv[0].n_candidates >= 1 and lv[0].n_hits >= 1, q  # self-match
        for p in (1, 2):
            assert lv[p].n_candidates >= lv[p - 1].n_candidates, q
            assert lv[p].n_hits >= lv[p - 1].n_hits, q
        assert all(r.n_hits <= TOP_K for r in lv.values()), q


def test_lsh_s_curve_floor_and_theory(spark, sf_dir):
    """S-curve audit invariants: every candidate pair shares a full band,
    so the signature-match count k is >= r = 3; est_jaccard = k/12; and
    the theoretical collision probability is monotone increasing in k
    with p(12/12) = 1."""
    from webscale_multimodal_datapipeline_spark.plans.dedup_queries import (
        d_lsh_s_curve,
    )

    rows = sorted(d_lsh_s_curve(spark, sf_dir).collect(), key=lambda r: r.sig_match_k)
    assert rows, "banding produced no candidate pairs at this sf"
    assert all(r.sig_match_k >= 3 for r in rows)
    for r in rows:
        assert abs(r.est_jaccard - round(r.sig_match_k / 12.0, 6)) < 1e-9
    ps = [r.p_collide_theory for r in rows]
    assert all(b >= a for a, b in zip(ps, ps[1:]))
    if rows[-1].sig_match_k == 12:
        assert rows[-1].p_collide_theory == 1.0


# ---------------------------------------------------------------------------
# stored IVF index (round 7: the serving-shape scale path)
# ---------------------------------------------------------------------------


def test_ivf_store_prunes_and_serves(spark, sf_dir, tmp_path):
    """The stored IVF index reads only probed clusters' files, and its
    answers match an independent numpy IVF replay over the SAME stored
    assignment (ids/ranks exact, cosine to 1e-9)."""
    import numpy as np

    from webscale_multimodal_datapipeline_spark.operators import similarity as OS
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    table = str(tmp_path / "ivf")
    cents = OS.ivf_store(e, table, n_clusters=8)
    files = TX.snapshot_files(table)
    assert len(files) >= 2
    # per-cluster probe lists a strict subset of files
    assert len(TX.pruned_files(table, "_cluster", 0, 0)) < len(files)

    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = OS.ivf_topk_stored(spark, table, q, cents, k=5, n_probe=2)
    rows = got.collect()

    # independent replay: numpy IVF over the stored assignment
    stored = TX.read(spark, table).select("vec_id", "embedding", "_cluster").collect()
    C = np.asarray(cents)
    want = {}
    for qr in q.collect():
        x = np.asarray(qr.embedding, dtype=np.float64)
        d2 = ((C - x) ** 2).sum(axis=1)
        probe = set(np.argsort(d2, kind="stable")[:2].tolist())
        cand = []
        for sr in stored:
            if sr._cluster not in probe:
                continue
            v = np.asarray(sr.embedding, dtype=np.float64)
            den = np.linalg.norm(v) * np.linalg.norm(x)
            if den == 0:
                continue
            cand.append((float(v @ x / den), sr.vec_id))
        cand.sort(key=lambda t: (-t[0], t[1]))
        want[qr.query_id] = cand[:5]
    assert {r.query_id for r in rows} == set(want)
    for r in rows:
        cos, vid = want[r.query_id][r.rank - 1]
        assert r.vec_id == vid
        assert abs(r.cosine - cos) < 1e-9


def test_spherical_kmeans_matches_numpy_reference(spark):
    """Independent numpy recomputation of the deterministic spherical
    Lloyd's (first-k init, max-dot assignment with smallest-cluster
    ties, normalized-mean update) — assignment-exact, sim to 1e-9."""
    import numpy as np

    from webscale_multimodal_datapipeline_spark.operators import (
        similarity as OS,
    )

    rng_vals = [
        [((i * 31 + j * 17) % 97 - 48) / 23.0 for j in range(8)]
        for i in range(60)
    ]
    rows = [(i, v) for i, v in enumerate(rng_vals)]
    rows.append((1000, None))            # invalid: null vector
    rows.append((1001, [0.0] * 8))       # invalid: zero norm
    rows.append((1002, [1.0] * 4))       # invalid: wrong dim
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {
        r.vec_id: (r.cluster, r.sim)
        for r in OS.spherical_kmeans_assign(
            df, dim=8, k=4, iters=2
        ).collect()
    }
    assert set(out) == set(range(60))  # invalid rows excluded

    # numpy replay
    X = np.array(rng_vals, dtype=np.float64)
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = U[:4].copy()
    for t in range(2):
        sims = U @ C.T
        assign = sims.argmax(axis=1)  # argmax takes first max = smallest id
        best = sims[np.arange(len(U)), assign]
        if t == 0:
            C = np.stack(
                [
                    U[assign == j].mean(axis=0)
                    if (assign == j).any()
                    else C[j]
                    for j in range(4)
                ]
            )
            keep = np.linalg.norm(C, axis=1) > 0
            C = C / np.where(
                keep, np.linalg.norm(C, axis=1), 1.0
            )[:, None]
    for i in range(60):
        cl, sim = out[i]
        assert cl == assign[i], f"vec {i}: {cl} != {assign[i]}"
        assert abs(sim - best[i]) < 1e-9


def test_spherical_kmeans_clusters_unit_sphere_structure(spark):
    """Four orthogonal directions with noise -> 4 clean clusters and
    within-cluster sim near 1 (cosine geometry, not Euclidean: vectors
    of very different MAGNITUDE but same direction co-cluster)."""
    from webscale_multimodal_datapipeline_spark.operators import (
        similarity as OS,
    )

    rows = []
    for i in range(40):
        d = i % 4
        base = [0.0] * 8
        base[d] = 1.0 + (i % 7) * 10.0  # wildly varying magnitude
        base[(d + 4) % 8] = 0.01 * (i % 3)  # small noise
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = OS.spherical_kmeans_assign(df, dim=8, k=4, iters=2).collect()
    by_dir = {}
    for r in out:
        by_dir.setdefault(r.vec_id % 4, set()).add(r.cluster)
        assert r.sim > 0.99
    # each direction maps to exactly one cluster, all four distinct
    assert all(len(s) == 1 for s in by_dir.values())
    assert len({next(iter(s)) for s in by_dir.values()}) == 4


def test_spherical_kmeans_deep_iters_agrees_with_mllib(spark):
    """Semantic convergence cross-check (round 10, VERDICT r9 task 7):
    the catalog row pins SPHERICAL_ITERS=2 for the bitwise oracle; this
    runs the SAME operator at iters=10 on a well-separated synthetic
    corpus and asserts the induced PARTITION (labels are arbitrary)
    agrees with pyspark.ml KMeans on the normalized vectors AND with the
    generator's ground truth — a semantic check the hash oracle can't
    give. On unit vectors, Euclidean k-means minimizes the same
    objective as cosine k-means (|u-c|^2 = 2 - 2*u.c), so the two must
    find the same well-separated partition."""
    import numpy as np

    from webscale_multimodal_datapipeline_spark.operators import (
        similarity as OS,
    )

    rng = np.random.default_rng(42)
    k, dim, per = 4, 16, 50
    # orthogonal ground-truth centers + small noise, unit-normalized;
    # ids interleave clusters so the deterministic first-k init starts
    # with one seed per true cluster
    rows = []
    for i in range(k * per):
        c = i % k
        v = np.zeros(dim)
        v[c] = 1.0
        v += rng.normal(0, 0.08, dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    ours = {
        r.vec_id: r.cluster
        for r in OS.spherical_kmeans_assign(
            df, dim=dim, k=k, iters=10
        ).collect()
    }

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.linalg import Vectors

    feat = spark.createDataFrame(
        [(i, Vectors.dense(v)) for i, v in rows], ["vec_id", "features"]
    )
    model = KMeans(k=k, seed=7, maxIter=40).fit(feat)
    theirs = {
        r.vec_id: r.prediction
        for r in model.transform(feat).select("vec_id", "prediction").collect()
    }

    def partition(assign):
        groups = {}
        for vid, cl in assign.items():
            groups.setdefault(cl, set()).add(vid)
        return {frozenset(s) for s in groups.values()}

    truth = {frozenset(range(c, k * per, k)) for c in range(k)}
    assert partition(ours) == truth, "spherical k-means missed ground truth"
    assert partition(theirs) == truth, "mllib baseline missed ground truth"
    assert partition(ours) == partition(theirs)
