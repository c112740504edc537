"""Operator-contract tests (reference ``framework/operator.py`` semantics:
Refiner adds, Filter drops, Dedup keeps first per key, rejected rows are
annotated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.operators import dedup as OD
from webscale_multimodal_datapipeline_spark.operators import filters as OF
from webscale_multimodal_datapipeline_spark.operators import registry as REG
from webscale_multimodal_datapipeline_spark.operators import similarity as OS


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_text_length_filter_bounds_and_fallback(spark):
    df = _docs(
        spark,
        [
            (1, "x" * 50, "s", None),  # falls back to length(text)=50
            (2, "short", "s", 5),
            (3, "y", "s", 200),  # precomputed wins over actual
        ],
    )
    op = OF.text_length_filter(10, 300, length_col="n_chars")
    got = {r.doc_id for r in op.apply(df).collect()}
    assert got == {1, 3}


def test_filter_split_rejected_annotation(spark):
    df = _docs(spark, [(1, "keep me please ok", "s", 100), (2, "no", "s", 2)])
    op = OF.text_length_filter(10, 300, length_col="n_chars", name="len_f")
    res = op.split(df)
    rej = res.rejected.collect()
    assert [r.doc_id for r in rej] == [2]
    assert rej[0]["_rejection_details"]["reason"] == "filtered"
    assert rej[0]["_rejection_details"]["operator"] == "len_f"


def test_url_filter_branches(spark):
    df = _docs(
        spark,
        [
            (1, "clean words", "good", 10),
            (2, "clean words", "blocked", 10),  # blocklist
            (3, "casino poker", "good", 10),  # word score
            (4, "clean words", "wiki", 10),  # quality exclusion
            (5, "clean words", None, 10),  # null source passes
        ],
    )
    op = OF.url_filter(blocklist=("blocked",), quality_sources=("wiki",))
    got = {r.doc_id for r in op.apply(df).collect()}
    assert got == {1, 5}


def test_exact_dedup_min_id_wins_and_rejected_has_representative(spark):
    df = _docs(
        spark,
        [
            (5, "Hello  World", "a", 11),
            (2, "hello world", "a", 11),  # same normalized text -> dup
            (7, "different", "a", 9),
        ],
    )
    op = OD.text_exact_dedup()
    res = op.split(df)
    kept = {r.doc_id for r in res.passed.collect()}
    assert kept == {2, 7}
    rej = res.rejected.collect()
    assert [r.doc_id for r in rej] == [5]
    assert rej[0]["_rejection_details"]["representative_id"] == "2"
    assert rej[0]["_rejection_details"]["reason"] == "duplicate"


def test_composite_dedup_distinguishes_sources(spark):
    df = _docs(spark, [(1, "same text", "a", 9), (2, "same text", "b", 9)])
    # composite source|text: different sources -> both kept
    assert OD.text_exact_dedup(composite_col="source").apply(df).count() == 2
    # plain text key -> one kept
    assert OD.text_exact_dedup().apply(df).count() == 1


def test_minhash_lsh_dedup_removes_near_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " extra"
    other = "completely different words appear in this sentence about spark engines"
    df = _docs(spark, [(1, base, "s", 1), (2, near, "s", 1), (3, other, "s", 1)])
    out = {r.doc_id for r in OD.minhash_lsh_dedup(df, jaccard_threshold=0.5).collect()}
    assert out == {1, 3}


def test_simhash_whitespace_invariance(spark):
    df = _docs(spark, [(1, "Alpha Beta   Gamma", "s", 1), (2, "alpha beta gamma", "s", 1)])
    vals = [r.sh for r in df.select(OD.simhash("text").alias("sh")).collect()]
    assert vals[0] == vals[1]


def test_embedding_cosine_dedup_drops_duplicate_vector(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # identical -> dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id for r in OD.embedding_cosine_dedup(df, dim=4, threshold=0.99).collect()}
    assert out == {1, 3}


def test_cosine_topk_self_is_rank_one(spark):
    rows = [(i, [float(i == j) + 0.1 for j in range(4)]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = OS.cosine_topk(df, q, k=3).collect()
    assert top[0].vec_id == 0 and top[0].rank == 1
    assert abs(top[0].cosine - 1.0) < 1e-12


def test_registry_create(spark, sf_dir):
    op = REG.create("text_length_filter", min_length=100, max_length=400)
    from webscale_multimodal_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    assert op.apply(d).count() > 0


def test_registry_unknown_raises():
    import pytest

    with pytest.raises(KeyError):
        REG.create("nope_operator")


def test_simhash_fast_udf_parity(spark, sf_dir):
    """Fast-path numpy simhash == native-SQL simhash on real docs incl.
    empty/whitespace texts (the reference's Rust-vs-Python house style)."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(500)
    extra = spark.createDataFrame([(10**9, ""), (10**9 + 1, "   "), (10**9 + 2, "one")],
                                  "doc_id long, text string")
    d = d.select("doc_id", "text").unionByName(extra)
    d = d.withColumn("_th", OD.token_hashes("text"))
    cmp = d.select(
        OD.simhash("text", hashes="_th").alias("a"),
        OD.simhash_fast_udf("_th").alias("b"),
    )
    assert cmp.filter("a != b").count() == 0


def test_gopher_flags_rule_semantics(spark):
    from webscale_multimodal_datapipeline_spark.functions import text as TXF

    long_ok = "the quick brown fox jumps over the lazy dog and runs on " * 6
    rows = [
        (1, long_ok),                           # passes everything
        (2, "too short"),                       # fails word count
        (3, "### " * 60 + "the a of is"),       # fails symbol ratio
        (4, "\n".join(["- item the a of"] * 20)),  # fails bullet ratio
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    flags = TXF.gopher_flags("text")
    out = {r.id: r for r in df.select("id", *[c.alias(n) for n, c in flags.items()],
                                      TXF.gopher_keep("text").alias("keep")).collect()}
    assert out[1].keep is True
    assert out[2].ok_word_count is False and out[2].keep is False
    assert out[3].ok_symbol_ratio is False and out[3].keep is False
    assert out[4].ok_bullet_ratio is False and out[4].keep is False


def test_shared_shingle_dedup_drops_span_sharers(spark):
    rows = [
        (1, "a b c d e"),
        (2, "x y z w v"),
        (3, "q r c d e"),   # shares shingle "c d e" with doc 1
        (4, "a b c"),       # shares "a b c" with doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in OD.shared_shingle_dedup(df, k=3).collect())
    assert kept == [1, 2]


def test_token_hashes_xxhash_variant(spark):
    """The xxhash64 scale path stays within SIMHASH_BITS and yields the
    same simhash SEMANTICS (deterministic, whitespace-invariant) — values
    differ from the md5 oracle spec by design."""
    df = spark.createDataFrame(
        [(1, "hello   world foo"), (2, "hello world\tfoo"), (3, "other text")],
        "id long, text string",
    )
    out = df.select(
        "id",
        OD.simhash_fast_udf(OD.token_hashes("text", algo="xxhash64")).alias("sh"),
    )
    rows = {r.id: r.sh for r in out.collect()}
    assert rows[1] == rows[2]          # whitespace-invariant
    assert rows[1] != rows[3]
    assert all(0 <= v < 2**OD.SIMHASH_BITS for v in rows.values())
    rows2 = {r.id: r.sh for r in out.collect()}
    assert rows == rows2               # deterministic


def test_simhash_fast_udf_parity_long_doc(spark):
    """Docs with >= 256 tokens exercise the SWAR byte-lane overflow
    fallback — parity with the SQL spec must hold there too."""
    long_text = " ".join(f"tok{i % 37}" for i in range(700))
    df = spark.createDataFrame([(1, long_text), (2, "short doc")], "doc_id long, text string")
    df = df.withColumn("_th", OD.token_hashes("text"))
    cmp = df.select(
        OD.simhash("text", hashes="_th").alias("a"),
        OD.simhash_fast_udf("_th").alias("b"),
    )
    assert cmp.filter("a != b").count() == 0


def test_simhash_swar_chunking_parity():
    """The allocator-friendly chunking wrapper (_SWAR_MAX_TOKENS splits
    on segment boundaries — the round-4 bimodality fix) must be
    bit-identical to one whole-array SWAR call, including segments
    longer than the chunk cap and the ≥256-token exact-recompute lane."""
    import numpy as np

    rng = np.random.default_rng(0xC0FFEE)
    # many small segments crossing several chunk boundaries
    seg_lens = rng.integers(1, 400, size=4000).astype(np.int64)
    # plus one segment larger than the cap itself
    seg_lens[1234] = OD._SWAR_MAX_TOKENS + 777
    starts = np.cumsum(seg_lens) - seg_lens
    h64 = rng.integers(-(2**63), 2**63 - 1, size=int(seg_lens.sum()), dtype=np.int64)
    chunked = OD._simhash_votes_swar(h64, starts, seg_lens)
    whole = OD._simhash_votes_swar_block(h64, starts, seg_lens)
    assert (chunked == whole).all()


def test_simhash_text_udf_semantics(spark):
    """The text-direct production lane: whitespace-invariant,
    case-folded, deterministic, 60-bit range, null/empty -> 0."""
    rows = [
        (1, "Hello   World foo"),
        (2, "hello world\tfoo"),
        (3, "other text entirely"),
        (4, ""),
        (5, None),
        (6, "  \t \n "),
        (7, " ".join(f"w{i % 53}" for i in range(600))),  # long-doc lane
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.sh for r in df.select("id", OD.simhash_text_udf("text").alias("sh")).collect()}
    assert out[1] == out[2]            # ws + case invariant
    assert out[1] != out[3]
    assert out[4] == 0 and out[5] == 0 and out[6] == 0
    assert all(0 <= v < 2**OD.SIMHASH_BITS for v in out.values())
    out2 = {r.id: r.sh for r in df.select("id", OD.simhash_text_udf("text").alias("sh")).collect()}
    assert out == out2                 # deterministic across runs


def test_simhash_text_column_matches_udf(spark):
    rows = [(1, "Hello   World foo"), (2, "x y z"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "id long, text string")
    a = {r.id: r.sh for r in OD.simhash_text_column(df, "text", "sh").collect()}
    b = {r.id: r.sh for r in df.select("id", OD.simhash_text_udf("text").alias("sh")).collect()}
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        OD.simhash_text_column(df, "text", "text")


def test_gopher_kernel_matches_column_spec(spark, sf_dir):
    """The one-pass Arrow gopher kernel == the column-expression spec on
    real docs plus nulls/empties/bullet/ellipsis edge rows."""
    from webscale_multimodal_datapipeline_spark.functions import text as TXF
    from webscale_multimodal_datapipeline_spark.operators.filters import (
        gopher_flags_column,
    )
    from webscale_multimodal_datapipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    extra = spark.createDataFrame(
        [(9001, ""), (9002, None), (9003, "   \t "),
         (9004, "- a\n- b\nmore...\nthe end is of a to in it and"),
         (9005, "### ...... the and of " + "ok " * 60)],
        "doc_id long, text string")
    d = docs.unionByName(extra)
    flags = TXF.gopher_flags("text")
    spec = d.select("doc_id", *[c.alias(nm) for nm, c in flags.items()],
                    TXF.gopher_keep("text").alias("keep"))
    fast = gopher_flags_column(d, "text").select(spec.columns)
    a = {r.doc_id: tuple(r)[1:] for r in spec.collect()}
    b = {r.doc_id: tuple(r)[1:] for r in fast.collect()}
    assert a == b


def test_connected_components_labels_min_reachable(spark):
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        connected_components,
    )

    # two chains and a triangle: {1-2-3}, {10-11}, {20-21-22 triangle}
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_l", "id_r"],
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_chain_diameter(spark):
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        connected_components,
    )

    # a 9-node path: propagation needs several rounds; all collapse to 0
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["id_l", "id_r"]
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(9)}


def test_connected_components_star_matches_propagation(spark):
    """Large-star/small-star produces identical (id, comp) labels to
    min-label propagation on mixed shapes: chains, a triangle, a star,
    and singeltons-by-omission — and on a long chain, where the star
    variant's O(log n) rounds are the whole point."""
    import random

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31),
         (30, 32), (30, 33)],
        ["id_l", "id_r"],
    )
    a = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    b = {r["id"]: r["comp"] for r in connected_components_star(edges).collect()}
    assert a == b

    # 40-node path — diameter 39, log2(40) ~ 5.3 alternating rounds
    chain = spark.createDataFrame([(i, i + 1) for i in range(39)], ["id_l", "id_r"])
    got = {r["id"]: r["comp"] for r in connected_components_star(chain, max_iter=8).collect()}
    assert got == {i: 0 for i in range(40)}

    # randomized graph: both algorithms agree with a NetworkX-free oracle
    rng = random.Random(7)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(80)})
    pairs = [(a_, b_) for a_, b_ in pairs if a_ != b_]
    rnd = spark.createDataFrame(pairs, ["id_l", "id_r"])
    a = {r["id"]: r["comp"] for r in connected_components(rnd).collect()}
    b = {r["id"]: r["comp"] for r in connected_components_star(rnd).collect()}
    assert a == b


def test_compression_ratio_parity_and_signal(spark):
    """UDF matches the plain-Python model exactly, and the signal orders
    repetitive text below prose-like text."""
    import pytest

    from webscale_multimodal_datapipeline_spark.operators.refiners import (
        compression_ratio_py,
        compression_ratio_refiner,
    )

    rows = [
        (1, "spam " * 200),
        (2, "the quick brown fox jumps over the lazy dog " * 5),
        # non-repetitive high-entropy text (hex of distinct hashes)
        (3, __import__("hashlib").sha256(b"x").hexdigest().join(
            __import__("hashlib").sha256(str(i).encode()).hexdigest()
            for i in range(6)
        )),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.compression_ratio
        for r in compression_ratio_refiner().apply(df).collect()
    }
    for i, t in rows:
        want = compression_ratio_py(t)
        if want is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(want, abs=1e-12)
    assert got[1] < got[2] < got[3]  # repetition compresses best


def test_incremental_dedup_vs_snapshot_index(spark, tmp_path):
    """Round-4 continuous-crawl operator: batch rows whose normalized
    content is already in the snapshot key index are dropped (annotated
    duplicate_snapshot in split()), remaining within-batch dups keep the
    min-id winner, and batch_keys() advances the index."""
    snap = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    op0 = OD.incremental_text_dedup()
    idx_path = str(tmp_path / "idx")
    op0.batch_keys(snap).write.parquet(idx_path)

    batch = spark.createDataFrame(
        [
            (10, "Seen   Before"),   # normalizes to snapshot key -> dropped
            (11, "brand new"),
            (12, "brand new"),       # within-batch dup of 11 -> dropped
            (13, "also new"),
        ],
        "doc_id long, text string",
    )
    op = OD.incremental_text_dedup(index_path=idx_path)
    kept = sorted(r.doc_id for r in op.apply(batch).collect())
    assert kept == [11, 13]

    res = op.split(batch)
    assert sorted(r.doc_id for r in res.passed.collect()) == [11, 13]
    reasons = {r.doc_id: r["_rejection_details"]["reason"] for r in res.rejected.collect()}
    assert reasons == {10: "duplicate_snapshot", 12: "duplicate"}

    # advancing the index: after appending the batch keys, re-running the
    # same batch drops everything
    op.batch_keys(res.passed).write.mode("append").parquet(idx_path)
    assert OD.incremental_text_dedup(index_path=idx_path).apply(batch).count() == 0

    # registry-reachable
    assert REG.create("incremental_text_dedup", index_path=idx_path).apply(batch).count() == 0


def test_concurrency_sweep_matches_naive_overlap(spark):
    """The sweep-line concurrency query must equal the naive
    O(n^2) interval-overlap maximum on a random small instance
    (differential test, reference house style)."""
    import random

    from webscale_multimodal_datapipeline_spark.plans.events_queries import (
        e_concurrency_sweep,
    )

    rnd = random.Random(11)
    rows = [
        (i, 1000 + rnd.randrange(0, 2000), "t%d" % rnd.randrange(2))
        for i in range(120)
    ]
    ev = spark.createDataFrame(rows, "event_id long, sec long, event_type string").select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "event_type",
        F.lit(1).alias("user_id"), F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        # write as an sf-dir-shaped events table so the query reads it
        ev.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: r.max_concurrent
            for r in e_concurrency_sweep(spark, td).collect()
        }
    # naive: for each event start, count intervals [s, s+300) covering it
    by_type: dict[str, list[int]] = {}
    for _, s, t in rows:
        by_type.setdefault(t, []).append(s)
    for t, starts in by_type.items():
        naive = max(
            sum(1 for s2 in starts if s2 <= s < s2 + 300) for s in starts
        )
        assert got[t] == naive, t


def test_bloom_prefilter_no_false_negatives_property(spark):
    """Property over random corpora: every member doc is a candidate
    (Bloom guarantee); non-candidates are provably non-members."""
    import random

    from webscale_multimodal_datapipeline_spark.plans.dedup_queries import (
        d_bloom_prefilter,
    )

    rnd = random.Random(5)
    words = ["w%02d" % i for i in range(40)]
    rows = [
        (i, " ".join(rnd.choice(words) for _ in range(8)),
         "en", "src%d" % rnd.randrange(4), 40)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.source: r for r in d_bloom_prefilter(spark, td).collect()}
    for src, r in out.items():
        assert r.no_false_negatives, src
        assert r.n_candidates >= r.n_members


def test_registry_dup_span_scrub_refiner_shape(spark):
    """YAML-reachable span scrub: rows survive with text REPLACED by the
    scrubbed remainder and a span_tokens_removed accounting column."""
    op = REG.create("dup_span_scrub")
    df = spark.createDataFrame(
        [(1, "a b x y z c", "s0"), (2, "p x y z q r", "s1")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in op.apply(df).collect()}
    assert out[1].text == "a b c" and out[1].span_tokens_removed == 3
    assert out[2].text == "p q r" and out[2].span_tokens_removed == 3
    assert out[1].source == "s0"  # other columns carried through


def test_cc_star_finish_gate_matches_star_loop(spark):
    """r10 bounded-size finish: the single-task whole-partition union-find
    that replaces the star loop on small contracted graphs must produce
    IDENTICAL labels to the star loop itself (gate forced off via env),
    including on a cross-batch chain (the whole=True accumulation seam:
    per-batch contraction alone would mislabel a chain that straddles
    Arrow batch boundaries)."""
    import os
    import random

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(11)
    pairs = list({(rng.randrange(300), rng.randrange(300)) for _ in range(400)})
    pairs = [(a, b) for a, b in pairs if a != b]
    # long chain appended so components span many ids
    pairs += [(1000 + i, 1001 + i) for i in range(60)]
    edges = spark.createDataFrame(pairs, ["id_l", "id_r"])
    saved = os.environ.get("SPARK_GRAFT_CC_FINISH_EDGES")
    try:
        os.environ["SPARK_GRAFT_CC_FINISH_EDGES"] = str(1 << 20)
        with_finish = {
            r["id"]: r["comp"] for r in connected_components_star(edges).collect()
        }
        os.environ["SPARK_GRAFT_CC_FINISH_EDGES"] = "0"
        star_loop = {
            r["id"]: r["comp"] for r in connected_components_star(edges).collect()
        }
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_CC_FINISH_EDGES", None)
        else:
            os.environ["SPARK_GRAFT_CC_FINISH_EDGES"] = saved
    assert with_finish == star_loop

    # whole=True accumulates across Arrow batches: force tiny batches so
    # the chain crosses batch boundaries inside one partition
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], ["id_l", "id_r"]
        ).coalesce(1)
        got = {
            r["id"]: r["comp"] for r in connected_components_star(chain).collect()
        }
        assert got == {i: 0 for i in range(201)}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
