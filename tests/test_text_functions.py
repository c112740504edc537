"""Unit semantics of the text expression library (reference parity:
normalization ``text_exact_dedup.py:66-72``, length ``text_length_filter.py:
43-57``, url scoring ``url_filter.py:255-282``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.operators import filters as OF


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("x")).first()["x"]


def test_normalize_collapses_whitespace_and_case(spark):
    assert _one(spark, "  Hello   WORLD\t\nfoo ", TX.normalize_text("text")) == "hello world foo"


def test_normalize_empty(spark):
    assert _one(spark, "", TX.normalize_text("text")) == ""


def test_token_count(spark):
    assert _one(spark, " a  b c ", TX.token_count("text")) == 3
    assert _one(spark, "", TX.token_count("text")) == 0
    assert _one(spark, "   ", TX.token_count("text")) == 0


def test_stopword_ratio(spark):
    # "the cat and dog": 2 stopwords of 4 tokens
    assert _one(spark, "the cat and dog", TX.stopword_ratio("text")) == 0.5
    assert _one(spark, "", TX.stopword_ratio("text")) == 0.0


def test_word_shingles_short_text_falls_back_to_whole(spark):
    assert _one(spark, "one two", TX.word_shingles("text", k=3)) == ["one two"]


def test_word_shingles_distinct(spark):
    got = _one(spark, "a b c a b c a b c", TX.word_shingles("text", k=3))
    assert sorted(got) == ["a b c", "b c a", "c a b"]


def test_word_score_max_and_total(spark):
    # casino (1.0) + poker (0.9): 0.8*1.0 + min(1.9/3, 0.2) = 1.0
    score = _one(spark, "visit casino poker now", OF.word_score("text"))
    assert abs(score - 1.0) < 1e-12
    # no match: 0
    assert _one(spark, "clean text here", OF.word_score("text")) == 0.0


def test_lang_id_markers(spark):
    assert _one(spark, "der die und das", TX.lang_id("text")) == "de"
    assert _one(spark, "xyzzy qwerty", TX.lang_id("text")) == "und"
    # tie between en and es markers -> en priority
    assert _one(spark, "the el", TX.lang_id("text")) == "en"


def test_md5_long_range(spark):
    v = _one(spark, "abc", TX.md5_long("text"))
    assert 0 <= v < 2**60


def test_tokens_strip_non_space_whitespace_edges(spark):
    """Tabs/newlines/CR at string edges must not yield empty tokens
    (F.trim strips only ASCII spaces) — parity with the DuckDB oracle
    form, which filters t <> ''."""
    import duckdb

    for s in ["\ttext\n", "\r\n a\tb \r", "\t\n", "", "  x  "]:
        got = _one(spark, s, TX.tokens("text"))
        want = duckdb.sql(
            "SELECT list_filter(string_split_regex(trim($1), '\\s+'), t -> t <> '')",
            params=[s],
        ).fetchone()[0]
        assert got == want, (s, got, want)
        assert _one(spark, s, TX.token_count("text")) == len(want)


# ---------------------------------------------------------------------------
# PII primitives (functions/pii.py)
# ---------------------------------------------------------------------------


def test_pii_counts_and_redact(spark):
    from pyspark.sql import functions as F

    from webscale_multimodal_datapipeline_spark.functions import pii as PII

    rows = [
        ("mail bob.smith+x@sub.example.co.uk now", 1, 0, 0),
        ("server at 192.168.0.1 and 10.0.0.255", 0, 2, 0),
        ("call +1 555-0100 or 800-555-1234 today", 0, 0, 2),
        ("clean text, no pii at all", 0, 0, 0),
        ("a@b.io from 1.2.3.4 dial 555-123-4567", 1, 1, 1),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], ["text"]
    ).select("text", *[c.alias(n) for n, c in PII.pii_counts("text").items()],
             PII.redact_pii("text").alias("red"))
    got = {r["text"]: r for r in df.collect()}
    for t, ne, ni, np_ in rows:
        r = got[t]
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (ne, ni, np_), t
        if ne or ni or np_:
            assert "@" not in r["red"] or "<EMAIL>" in r["red"]
        else:
            assert r["red"] == t


def test_pii_redaction_is_complete(spark):
    """After redaction, re-running the counters finds nothing."""
    from webscale_multimodal_datapipeline_spark.functions import pii as PII

    df = spark.createDataFrame(
        [("x a@b.io 1.2.3.4 +1 555-0100 c@d.com y",)], ["text"]
    ).select(PII.redact_pii("text").alias("t"))
    counts = df.select(*[c.alias(n) for n, c in PII.pii_counts("t").items()]).head()
    assert counts["n_email"] == 0 and counts["n_phone"] == 0
    # the <IP> token leaves no dotted-quad behind
    assert counts["n_ip"] == 0
