"""Property-based tests (hypothesis) — random-input parity between the
Spark column expressions and plain-Python reference models.

The reference's test strategy is differential (Python vs Rust, SURVEY §5)
but example-based only; these add randomized coverage over the ASCII
domain, where Java regex and Python ``re`` agree on ``\\s``/``\\d``/``\\b``
semantics (each example is a BATCH of strings -> one Spark job, keeping
runtime bounded)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions import pii as PII
from webscale_multimodal_datapipeline_spark.functions import text as TX

# printable ASCII + the whitespace set where Python re and Java regex agree
_ALPHABET = st.sampled_from(
    list("abcdefghijkXYZ0189 \t\n\r\f\v.,!?#@-_%+:/()'\"")
)
_TEXTS = st.lists(st.text(_ALPHABET, max_size=120), min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.v for r in df.select(col.alias("v")).collect()]


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_tokens_and_count_match_python_split(spark, texts):
    got_toks = _run(spark, texts, TX.tokens("text"))
    got_counts = _run(spark, texts, TX.token_count("text"))
    for t, toks, n in zip(texts, got_toks, got_counts):
        assert list(toks) == t.split(), repr(t)
        assert n == len(t.split()), repr(t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_normalize_text_matches_python(spark, texts):
    got = _run(spark, texts, TX.normalize_text("text"))
    for t, g in zip(texts, got):
        assert g == " ".join(t.split()).lower(), repr(t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_mean_word_length_matches_python(spark, texts):
    got = _run(spark, texts, TX.mean_word_length("text"))
    for t, g in zip(texts, got):
        toks = t.split()
        want = (sum(len(w) for w in toks) / len(toks)) if toks else 0.0
        assert g == pytest.approx(want, abs=1e-12), repr(t)


_PII_BITS = st.sampled_from(
    [
        "contact bob@example.com now",
        "10.0.0.1",
        "555-123-4567",
        "+1 555 1234",
        "no pii here",
        "a@b.io and 192.168.300.5",
        "999.999.999.999",
        "x",
        " ",
    ]
)


@given(texts=st.lists(st.lists(_PII_BITS, min_size=1, max_size=5), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_pii_redaction_matches_python_re(spark, texts):
    joined = [" ".join(parts) for parts in texts]
    got = _run(spark, joined, PII.redact_pii("text"))
    counts = {
        kind: _run(spark, joined, PII.pii_counts("text")[f"n_{kind}"])
        for kind, _, _ in PII.PII_PATTERNS
    }
    for i, t in enumerate(joined):
        want = t
        for _, pat, token in PII.PII_PATTERNS:
            want = re.sub(pat, token, want)
        assert got[i] == want, repr(t)
        for kind, pat, _ in PII.PII_PATTERNS:
            assert counts[kind][i] == len(re.findall(pat, t)), (kind, t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_md5_long_matches_python_hashlib(spark, texts):
    import hashlib

    got = _run(spark, texts, TX.md5_long("text"))
    for t, g in zip(texts, got):
        want = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        assert g == want, repr(t)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["spark", "data", "row", "scan", "agg", "x1", "y2"]), min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_simhash_kernels_agree(spark, docs):
    """SimHash lane contracts on random token streams: the SWAR fast UDF
    is VALUE-identical to the SQL-HOF oracle spec (same md5 token hashes);
    the Arrow text-direct lane is a different (faster, in-kernel) hash
    family, so it is held to its semantic contract instead — determinism,
    empty -> 0, and whitespace invariance."""
    from webscale_multimodal_datapipeline_spark.operators import dedup as OD

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    sql_form = {
        r.id: r.v
        for r in df.select("id", OD.simhash("text").alias("v")).collect()
    }
    fast = {
        r.id: r.v
        for r in df.withColumn("_th", OD.token_hashes("text"))
        .select("id", OD.simhash_fast_udf("_th").alias("v"))
        .collect()
    }
    assert sql_form == fast
    arrow = {
        r.id: r.v
        for r in OD.simhash_text_column(df, "text", "v").select("id", "v").collect()
    }
    # determinism + empty-doc convention
    arrow2 = {
        r.id: r.v
        for r in OD.simhash_text_column(df, "text", "v").select("id", "v").collect()
    }
    assert arrow == arrow2
    for i, t in enumerate(texts):
        if not t.split():
            assert arrow[i] == 0
    # whitespace invariance: doubled separators must not change the hash
    df_ws = spark.createDataFrame(
        [(i, t.replace(" ", "  \t")) for i, t in enumerate(texts)],
        "id long, text string",
    )
    arrow_ws = {
        r.id: r.v
        for r in OD.simhash_text_column(df_ws, "text", "v").select("id", "v").collect()
    }
    assert arrow_ws == arrow


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_norm_tokens_equals_tokens_of_normalize(spark, texts):
    """norm_tokens is a pure optimization: identical token array to the
    tokens(normalize_text(·), clean=True) composition on every input
    (the \\s+ split makes the whitespace-collapse pass redundant)."""
    fast = _run(spark, texts, TX.norm_tokens("text"))
    spec = _run(spark, texts, TX.tokens(TX.normalize_text("text"), clean=True))
    for t, a, b in zip(texts, fast, spec):
        assert list(a) == list(b), repr(t)
        assert list(a) == t.lower().split(), repr(t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_word_shingle_seq_matches_python(spark, texts):
    """word_shingle_seq == the positional k-gram sequence of the
    normalized token list (duplicates KEPT, order preserved) — the
    order-stability contract winnowing depends on (ARCHITECTURE §23)."""
    got = _run(spark, texts, TX.word_shingle_seq("text", k=3))
    for t, g in zip(texts, got):
        toks = " ".join(t.split()).lower().split()
        if len(toks) >= 3:
            want = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        else:
            want = [" ".join(toks)]
        assert list(g) == want, repr(t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_word_shingles_is_first_occurrence_distinct_of_seq(spark, texts):
    """word_shingles (set-semantic) == word_shingle_seq deduped keeping
    first occurrences — the two variants must never drift apart."""
    got_set = _run(spark, texts, TX.word_shingles("text", k=3))
    got_seq = _run(spark, texts, TX.word_shingle_seq("text", k=3))
    for t, s, q in zip(texts, got_set, got_seq):
        assert list(s) == list(dict.fromkeys(q)), repr(t)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_winnow_fp_kernel_matches_python_reference(spark, texts):
    """The vectorized winnowing kernel (segmented shingle mix + flat
    sliding-min + lexsort distinct, operators/dedup.py::_winnow_fp_block)
    equals a per-document pure-Python reference over the SAME token
    hashes — pinning the segment arithmetic, the riskiest part."""
    import numpy as np

    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        _token_hash_block,
        _winnow_fp_block,
    )

    k, w = 3, 4
    got = list(_winnow_fp_block(texts, k=k, w=w))
    h64, doc_lens, nulls = _token_hash_block(texts)
    h = h64.view(np.uint64)
    mults = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)
    offs = np.cumsum(doc_lens) - doc_lens
    for d in range(len(doc_lens)):
        n = int(doc_lens[d])
        if nulls[d] or n == 0:
            want = 0
        elif n < k:
            want = 1
        else:
            hs = h[offs[d] : offs[d] + n]
            sh = []
            for i in range(n - k + 1):
                v = np.uint64(0)
                for j in range(k):
                    v = v + hs[i + j] * np.uint64(mults[j])
                v = v ^ (v >> np.uint64(29))
                sh.append(int(v))
            nw = max(len(sh) - w + 1, 1)
            mins = [min(sh[i : i + w]) for i in range(nw)]
            want = len(set(mins))
        assert got[d] == want, (d, texts[d] if d < len(texts) else None)


# ---------------------------------------------------------------------------
# Round-9 session-2 properties: span dedup vs a brute-force Python
# reference, and the interleave fold vs a plain sequential replay.
# ---------------------------------------------------------------------------

# small-vocabulary corpora so duplicated k-grams actually occur
_WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOCS = st.lists(
    st.lists(_WORDS, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


def _py_span_scrub(docs: dict[int, str], k: int = 3) -> dict[int, tuple]:
    """Brute-force reference: count every positional k-gram, cover the
    [pos, pos+k) windows of grams with total count > 1, keep the rest."""
    toks = {i: t.split() for i, t in docs.items()}
    from collections import Counter

    counts = Counter()
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            counts[tuple(ts[p : p + k])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if counts[tuple(ts[p : p + k])] > 1:
                covered.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (len(ts), len(kept), len(ts) - len(kept), " ".join(kept))
    return out


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_dup_span_scrub_matches_bruteforce(spark, docs):
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        dup_span_scrub,
    )

    d = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(list(d.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.n_removed, r.clean_text)
        for r in dup_span_scrub(df).collect()
    }
    assert got == _py_span_scrub(d)


_ITEMS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # doc
        st.integers(min_value=0, max_value=30),  # cost
    ),
    min_size=1,
    max_size=25,
)


@given(raw=_ITEMS)
@settings(**_SETTINGS)
def test_interleave_pack_matches_sequential_replay(spark, raw):
    from webscale_multimodal_datapipeline_spark.operators.packing import (
        interleave_pack,
    )

    budget = 24
    items = [
        (doc, idx, "x", cost)
        for idx, (doc, cost) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        items, "doc_id long, item_idx int, item_type string, token_cost long"
    )
    got = {
        (r.doc_id, r.item_idx): (r.pack_id, r.pack_offset)
        for r in interleave_pack(df, budget=budget, n_shards=1).collect()
    }
    # plain replay in (doc, idx) order — the discipline's definition
    want = {}
    pack, fill, first = 0, 0, True
    for doc, idx, _t, cost in sorted(items):
        if first:
            want[(doc, idx)] = (0, 0)
            fill, first = cost, False
        elif fill + cost <= budget:
            want[(doc, idx)] = (pack, fill)
            fill += cost
        else:
            pack += 1
            want[(doc, idx)] = (pack, 0)
            fill = cost
    assert got == want
