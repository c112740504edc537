"""Round-7 dedup-family tests: the scaled-planes default, the full-rank
hyperplane family, the arrow pair-verify parity contract, the banded
OR-construction, the simhash bucket cap, and the cache-lifetime plumbing
(VERDICT r6 #1-#3, ADVICE r6 #1/#3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from webscale_multimodal_datapipeline_spark.operators import dedup as OD


# ---------------------------------------------------------------------------
# plane family
# ---------------------------------------------------------------------------


def test_plane_family_is_full_rank():
    """Round-7 root-cause regression: the original congruential
    ``_plane_coef`` was periodic in p with period 7 — only 7 distinct
    hyperplanes existed, so extra planes/bands could never split a
    bucket (8 and 12 planes both measured 119 distinct buckets on the
    sf0.1 fixture). The md5-keyed family must be full-rank."""
    import numpy as np

    M = np.array([[OD._plane_coef(p, i) for i in range(64)] for p in range(32)])
    assert np.linalg.matrix_rank(M) == 32
    # and no plane duplicates another outright (the old failure shape)
    rows = {tuple(r) for r in M.tolist()}
    assert len(rows) == 32


def test_scaled_planes_schedule():
    # fixture scales resolve to the base count — pinned oracle hashes of
    # every hyperplane query are unchanged by the round-7 default switch
    assert OD.scaled_planes(500) == OD.EMB_LSH_PLANES
    assert OD.scaled_planes(2000) == OD.EMB_LSH_PLANES
    assert OD.scaled_planes(16_384) == 8
    # past 16K rows the schedule grows: expected bucket size stays ~64
    assert OD.scaled_planes(32_768) == 9
    assert OD.scaled_planes(65_536) == 10
    assert OD.scaled_planes(1 << 30) == 24
    assert OD.scaled_planes(0) == OD.EMB_LSH_PLANES  # degenerate


def test_band_keys_disjoint_keyspaces(spark):
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(20)],
        "vec_id int, embedding array<double>",
    )
    out = df.select(
        OD.hyperplane_band_keys("embedding", 8, bands=3, planes=4).alias("bk")
    ).collect()
    for row in out:
        assert len(row.bk) == 3
        for k, key in enumerate(row.bk):
            assert k * 16 <= key < (k + 1) * 16  # band k keyspace [k*2^4, (k+1)*2^4)


# ---------------------------------------------------------------------------
# arrow pair verify: decision parity with the SQL HOF spelling
# ---------------------------------------------------------------------------


def _poisoned_vectors(spark):
    """Vector shapes a real embeddings delivery produces, EXCLUDING
    shorter-than-dim arrays (those raise in ANSI mode inside the bucket
    expression on BOTH paths — the pre-existing length contract)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1e-6, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 1e-6, 0.0]),  # near-dup of 2
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector: guarded_div -> NULL
        (5, None),  # failed encode
        (6, [1.0, None, 0.0, 0.0]),  # NULL element
        (7, [float("nan"), 1.0, 0.0, 0.0]),  # NaN data: NaN >= t is TRUE
        (8, [float("nan"), 1.0, 0.0, 0.0]),  # ... and its twin
        (9, [1.0, 0.0, 0.0, 0.0, 99.0]),  # LONGER than dim: SQL pads -> NULL
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


@pytest.mark.parametrize("verify", ["arrow", "gemm"])
@pytest.mark.parametrize("bands", [1, 2])
def test_kernel_verify_matches_sql_spelling(spark, bands, verify):
    df = _poisoned_vectors(spark)
    kw = dict(dim=4, threshold=0.98, planes=4, bands=bands)
    sql_pairs = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify="sql", **kw).collect()
    }
    arrow_pairs = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify=verify, **kw).collect()
    }
    assert arrow_pairs == sql_pairs
    # non-vacuous: the NaN rows' projections are all NaN > 0 = TRUE, so
    # they share the all-ones bucket and their NaN cosine passes the
    # threshold (the Spark/DuckDB "NaN >= t" convention) — the exact case
    # the kernel's coalesce-to-NaN exists for
    assert any(i in (7, 8) for i, _ in arrow_pairs)
    # zero vector (guarded_div NULL), null array, null element, and
    # longer-than-partner arrays (SQL zip_with pads -> NULL) never appear
    dropped = {i for i, _ in arrow_pairs}
    assert not dropped & {4, 5, 6, 9}


@pytest.mark.parametrize("verify", ["arrow", "gemm"])
def test_kernel_verify_matches_sql_on_fixture(spark, sf_dir, verify):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(
            e, dim=64, threshold=0.9, verify=verify
        ).collect()
    }
    b = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(
            e, dim=64, threshold=0.9, verify="sql"
        ).collect()
    }
    assert a == b


def test_gemm_boundary_band_reverifies_exactly(spark):
    """A pair engineered EXACTLY at the threshold must take the fold
    decision (cos == t → hit, >= is inclusive): identical unit vectors
    with threshold 1.0 sit on the boundary where GEMM rounding could
    flip either way without the re-verify."""
    df = spark.createDataFrame(
        [(0, [0.6, 0.8]), (1, [0.6, 0.8]), (2, [0.8, -0.6])],
        "vec_id int, embedding array<double>",
    )
    kw = dict(dim=2, threshold=1.0, planes=2)
    got = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify="gemm", **kw).collect()
    }
    want = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify="sql", **kw).collect()
    }
    assert got == want


def test_pair_dot_udf_left_fold_bit_parity(spark):
    """The kernel's value (not just decision) must equal the HOF fold
    bit-for-bit on valid arrays — same cast-first, same IEEE add order."""
    from webscale_multimodal_datapipeline_spark.functions import vectors as VX

    rows = [
        (i, [((i * 13 + j * 7) % 97) / 9.7 for j in range(64)],
            [((i * 5 + j * 11) % 89) / 8.9 for j in range(64)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, a array<double>, b array<double>")
    out = df.select(
        OD.pair_dot_udf("a", "b").alias("k"),
        VX.dot("a", "b").alias("s"),
    ).collect()
    for r in out:
        assert r.k == r.s  # exact equality, no tolerance


def test_banded_dup_map_is_superset_of_single_band(spark, sf_dir):
    """OR-construction can only ADD verified pairs (every band-0 match is
    still a match), so the banded dup set contains the single-band one."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one = {
        r.vec_id
        for r in OD.embedding_cosine_dup_map(e, dim=64, threshold=0.9).collect()
    }
    four = {
        r.vec_id
        for r in OD.embedding_cosine_dup_map(
            e, dim=64, threshold=0.9, bands=4
        ).collect()
    }
    assert one <= four


# ---------------------------------------------------------------------------
# simhash bucket cap (ADVICE r6 #1)
# ---------------------------------------------------------------------------


def test_simhash_near_pairs_cap_path_identical(spark, sf_dir):
    """Forcing every bucket through the join path (cap=0) must produce
    exactly the default (array-path) pair set — the cap only changes the
    execution shape, never the semantics."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    default = {
        (r.id_l, r.id_r, r.hamming)
        for r in OD.simhash_near_pairs(d, max_hamming=12).collect()
    }
    joined = {
        (r.id_l, r.id_r, r.hamming)
        for r in OD.simhash_near_pairs(d, max_hamming=12, bucket_cap=0).collect()
    }
    assert default == joined
    assert default  # non-vacuous at hamming 12 on the fixture


def test_simhash_near_pairs_skewed_bucket_does_not_array_pair(spark):
    """A degenerate corpus (every doc empty -> signature 0 -> ONE bucket)
    over the cap must still produce the right pairs via the streaming
    join path — the exact ADVICE r6 #1 scenario."""
    n = 40
    df = spark.createDataFrame(
        [(i, "") for i in range(n)], "doc_id long, text string"
    )
    pairs = OD.simhash_near_pairs(df, max_hamming=0, bucket_cap=8)
    assert pairs.count() == n * (n - 1) // 2


# ---------------------------------------------------------------------------
# cache lifetime (ADVICE r6 #3)
# ---------------------------------------------------------------------------


def test_materialize_resources_and_release(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res: list = []
    # the join-shaped verifies materialize their two-consumer signature
    # table; the gemm default has one consumer and (by contract) leaves
    # `resources` untouched
    dup = OD.embedding_cosine_dup_map(
        e, dim=64, threshold=0.9, verify="arrow", resources=res
    )
    dup.count()
    assert len(res) == 1
    assert res[0].storageLevel.useMemory  # persisted, not checkpointed
    OD.release_all(res)
    assert res == []
    res2: list = []
    OD.embedding_cosine_dup_map(
        e, dim=64, threshold=0.9, verify="gemm", resources=res2
    ).count()
    assert res2 == []


def test_neardup_operator_release_unpersists(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    op = OD.embedding_cosine_dedup_op(threshold=0.9)
    result = op.split(e)
    n_pass, n_rej = result.passed.count(), result.rejected.count()
    assert n_pass + n_rej == e.count()
    held = list(op._resources)
    assert held  # the dup-map cache + the persisted signature table
    op.release()
    assert op._resources == []
    for d in held:
        assert not d.storageLevel.useMemory  # actually unpersisted
    # released operator still computes correctly (just recomputes)
    assert op.apply(e).count() == n_pass


def test_pipeline_run_releases_operator_caches(spark, sf_dir, tmp_path):
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline

    cfg = {
        "data_loader": {"table": "embeddings"},
        "stages": [
            {
                "name": "dedup",
                "operators": [
                    {"type": "embedding_cosine_dedup", "params": {"threshold": 0.9}}
                ],
            }
        ],
        "data_writer": {"path": str(tmp_path / "out")},
        "collect_rejected": False,
    }
    pipe = compile_pipeline(cfg)
    result = pipe.run(spark, sf_dir)
    # writer materialized everything inside run() -> caches already freed
    for op in result.operators:
        assert getattr(op, "_resources", []) == []


# ---------------------------------------------------------------------------
# metrics provenance (ADVICE r6 #2)
# ---------------------------------------------------------------------------


def test_harvest_marks_recount_fallback(spark):
    from webscale_multimodal_datapipeline_spark.compiler import MetricsCollector

    mc = MetricsCollector(spark, "t")
    df = mc.instrument(spark.range(5), "s", "op")
    df.count()
    rows = mc.harvest()
    assert rows[0].output_records == 5
    assert rows[0].count_source == "observed"
    # un-actioned observation -> empty row -> recount fallback, marked
    mc2 = MetricsCollector(spark, "t2")
    mc2.instrument(spark.range(7), "s", "op")
    rows2 = mc2.harvest()
    assert rows2[0].output_records == 7
    assert rows2[0].count_source == "recount"


# ---------------------------------------------------------------------------
# mean-centered hyperplane LSH (ARCHITECTURE §33's recorded escalation)
# ---------------------------------------------------------------------------


def _cone_corpus(spark, n=120, dim=8, shift=12.0):
    """CLIP-cone-shaped corpus: every vector = a large constant offset +
    small deterministic per-row variation, plus planted near-dup twins.
    Raw sign buckets collapse (every plane agrees on the cone direction);
    centered buckets must not."""
    import hashlib

    def dev(i, j):  # hash-random deviation — the §32 replicator rule:
        # modular patterns yield only ~11 distinct deviation vectors,
        # which caps the centered bucket count at the pattern period
        h = int(hashlib.md5(f"cone|{i}|{j}".encode()).hexdigest()[:8], 16)
        return (h % 11 - 5) * 0.3

    rows = []
    for i in range(n):
        base = [shift + dev(i, j) for j in range(dim)]
        rows.append((i, base))
    # planted twins of rows 0..4 (cosine ~ 1)
    for i in range(5):
        twin = [x * 1.000001 for x in rows[i][1]]
        rows.append((1000 + i, twin))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_centered_buckets_split_the_cone(spark):
    df = _cone_corpus(spark)
    dim, planes = 8, 6
    raw = (
        df.select(OD.hyperplane_bucket("embedding", dim, planes).alias("b"))
        .distinct()
        .count()
    )
    stats = OD.hyperplane_bias_stats(df, "embedding", dim, planes)
    centered = (
        df.crossJoin(F.broadcast(stats))
        .select(OD.centered_hyperplane_bucket("embedding", dim, planes).alias("b"))
        .distinct()
        .count()
    )
    # the cone collapses raw sign buckets to a handful; centering restores
    # a spread comparable to the plane count's capacity
    assert raw <= 4
    assert centered >= 8 * raw


@pytest.mark.parametrize("verify", ["sql", "arrow", "gemm"])
def test_centered_dedup_finds_planted_twins(spark, verify):
    df = _cone_corpus(spark)
    dup = {
        r.vec_id
        for r in OD.embedding_cosine_dup_map(
            df, dim=8, threshold=0.98, planes=6, verify=verify, center=True
        ).collect()
    }
    assert {1000 + i for i in range(5)} <= dup


@pytest.mark.parametrize("verify", ["arrow", "gemm"])
@pytest.mark.parametrize("center", [False, True])
def test_centered_verify_matches_sql_spelling(spark, center, verify):
    """The poisoned-vector parity contract holds under centering too: the
    candidate buckets change, but all three verify paths must agree on the
    SAME centered buckets."""
    df = _poisoned_vectors(spark)
    kw = dict(dim=4, threshold=0.98, planes=4, center=center)
    sql_pairs = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify="sql", **kw).collect()
    }
    other = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify=verify, **kw).collect()
    }
    assert other == sql_pairs


@pytest.mark.parametrize("verify", ["arrow", "gemm"])
def test_centered_banded_matches_sql_spelling(spark, verify):
    """center=True composes with bands>1: all three verify paths agree on
    the centered band keys (poisoned vectors included)."""
    df = _poisoned_vectors(spark)
    kw = dict(dim=4, threshold=0.98, planes=4, bands=2, center=True)
    sql_pairs = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify="sql", **kw).collect()
    }
    other = {
        (r.vec_id, r._rep)
        for r in OD.embedding_cosine_dup_map(df, verify=verify, **kw).collect()
    }
    assert other == sql_pairs


def test_centered_banded_superset_on_cone(spark):
    """On the cone corpus, centered bands can only ADD verified pairs over
    the single centered band (band 0 of the banded key set IS the single
    bucket's plane set), and the planted twins stay caught."""
    df = _cone_corpus(spark)
    one = {
        r.vec_id
        for r in OD.embedding_cosine_dup_map(
            df, dim=8, threshold=0.98, planes=6, center=True
        ).collect()
    }
    four = {
        r.vec_id
        for r in OD.embedding_cosine_dup_map(
            df, dim=8, threshold=0.98, planes=6, bands=4, center=True
        ).collect()
    }
    assert one <= four
    assert {1000 + i for i in range(5)} <= four


def test_bias_stats_ignore_dirty_rows(spark):
    """NaN/inf/huge/null rows are excluded from the BIAS BASIS (they cannot
    round-trip the exact decimal sum) but still flow through dedup."""
    clean = [(i, [float(i % 3 - 1)] * 4) for i in range(10)]
    dirty = [
        (100, None),
        (101, [1.0, None, 0.0, 0.0]),
        (102, [float("nan"), 1.0, 0.0, 0.0]),
        (103, [1e20, 1.0, 0.0, 0.0]),
        (104, [1.0, 2.0, 3.0]),  # short: excluded from stats, raises later
    ]
    df = spark.createDataFrame(clean + dirty, "vec_id int, embedding array<double>")
    row = OD.hyperplane_bias_stats(df, "embedding", 4, 2).collect()[0]
    clean_only = spark.createDataFrame(clean, "vec_id int, embedding array<double>")
    row2 = OD.hyperplane_bias_stats(clean_only, "embedding", 4, 2).collect()[0]
    assert row["_cn"] == 10 == row2["_cn"]
    assert row["_cb0"] == row2["_cb0"] and row["_cb1"] == row2["_cb1"]


# ---------------------------------------------------------------------------
# partition-local union-find contraction (components-star pre-pass)
# ---------------------------------------------------------------------------


def test_local_contract_preserves_components(spark):
    # chain 1-2-3-4, clique 10-11-12, pair (20, 21), spread over partitions
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    e = spark.createDataFrame(edges, "src long, dst long").repartition(4)
    c = OD._local_contract(e)
    star = {
        (r.id, r.comp)
        for r in OD.connected_components_star(e, "src", "dst",
                                              edges_distinct=True).collect()
    }
    # contraction is wired INSIDE the loop; also check its raw output
    # connects exactly the same node set
    nodes_in = {x for t in edges for x in t}
    nodes_out = {x for r in c.collect() for x in (r.src, r.dst)}
    assert nodes_out <= nodes_in
    expected = {(1, 1), (2, 1), (3, 1), (4, 1),
                (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    assert star == expected


def test_local_contract_passthrough_on_strings_and_nulls(spark):
    # string ids: contraction must be a NO-OP (collation-dependent min)
    es = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert OD._local_contract(es) is es
    # null endpoints pass through uncontracted
    en = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    out = {(r.src, r.dst) for r in OD._local_contract(en).collect()}
    assert (None, 3) in out and (4, None) in out
    assert (2, 1) in out or (1, 2) in out
