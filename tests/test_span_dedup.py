"""Duplicated-substring span removal (Lee et al. 2021 ExactSubstr, k-gram
formulation — ``operators/dedup.py::dup_span_spans / dup_span_scrub``).

Hand-built corpora with known duplicated runs pin exact span boundaries,
the interval merge, the scrub text, and the edge cases (sub-k docs, empty
docs, fully-duplicated docs, within-doc self-repetition)."""

from __future__ import annotations

from webscale_multimodal_datapipeline_spark.operators import dedup as OD


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(spark, rows, k=3):
    out = OD.dup_span_spans(_df(spark, rows), "text", "doc_id", k=k)
    return sorted(
        (r.doc_id, r.start_tok, r.end_tok) for r in out.collect()
    )


def _scrub(spark, rows, k=3):
    out = OD.dup_span_scrub(_df(spark, rows), "text", "doc_id", k=k)
    return {r.doc_id: (r.n_tokens, r.n_kept, r.n_removed, r.clean_text)
            for r in out.collect()}


def test_cross_doc_shared_run_is_excised_from_both(spark):
    # "x y z" occurs in both docs -> each doc loses exactly that 3-run.
    rows = [(1, "a b x y z c"), (2, "p x y z q r")]
    assert _spans(spark, rows) == [(1, 2, 5), (2, 1, 4)]
    s = _scrub(spark, rows)
    assert s[1] == (6, 3, 3, "a b c")
    assert s[2] == (6, 3, 3, "p q r")


def test_overlapping_grams_merge_into_one_maximal_span(spark):
    # Shared run of 4 tokens = two overlapping 3-grams -> ONE merged span.
    rows = [(1, "a w x y z b"), (2, "w x y z")]
    assert _spans(spark, rows) == [(1, 1, 5), (2, 0, 4)]
    s = _scrub(spark, rows)
    assert s[1] == (6, 2, 4, "a b")
    assert s[2] == (4, 0, 4, "")  # fully duplicated doc -> empty


def test_adjacent_spans_merge_and_disjoint_spans_do_not(spark):
    # Doc 1 has two duplicated runs separated by a unique gap of 3 tokens:
    # they must stay separate spans.
    rows = [
        (1, "a b c g1 g2 g3 x y z"),
        (2, "a b c"),
        (3, "x y z"),
    ]
    sp = _spans(spark, rows)
    assert (1, 0, 3) in sp and (1, 6, 9) in sp
    assert (2, 0, 3) in sp and (3, 0, 3) in sp
    assert len(sp) == 4


def test_within_doc_self_repetition_counts_as_duplicated(spark):
    # The same 3-gram twice inside ONE doc: both occurrences excised
    # (Lee et al. dedup self-repeats too: total occurrence count > 1).
    rows = [(1, "q r s junk1 junk2 q r s")]
    assert _spans(spark, rows) == [(1, 0, 3), (1, 5, 8)]
    s = _scrub(spark, rows)
    assert s[1] == (8, 2, 6, "junk1 junk2")


def test_sub_k_and_empty_docs_pass_through_untouched(spark):
    rows = [(1, "a b"), (2, ""), (3, "   "), (4, "unique tokens here only")]
    assert _spans(spark, rows) == []
    s = _scrub(spark, rows)
    assert s[1] == (2, 2, 0, "a b")
    assert s[2] == (0, 0, 0, "")
    assert s[3] == (0, 0, 0, "")
    assert s[4] == (4, 4, 0, "unique tokens here only")


def test_scrub_is_total_and_normalized(spark):
    # Dedup is defined over NORMALIZED text: case/whitespace variants of
    # the same run still collide, and clean_text comes back normalized.
    rows = [(1, "A  B\tC d"), (2, "a b c e")]
    assert _spans(spark, rows) == [(1, 0, 3), (2, 0, 3)]
    s = _scrub(spark, rows)
    assert s[1] == (4, 1, 3, "d")
    assert s[2] == (4, 1, 3, "e")
    assert set(s) == {1, 2}


def test_wider_k_requires_longer_shared_run(spark):
    # With k=4 a shared 3-run is NOT long enough to form a span.
    rows = [(1, "a b x y z c"), (2, "p x y z q r")]
    assert _spans(spark, rows, k=4) == []
    # ...but a shared 4-run is.
    rows = [(1, "a x y z w c"), (2, "p x y z w r")]
    assert _spans(spark, rows, k=4) == [(1, 1, 5), (2, 1, 5)]


def test_poly_gram_key_agrees_with_md5_key(spark):
    """r10 polynomial gram key (O(n) hashing): the key recipe must not
    change the SEMANTICS — spans from the poly key equal spans from the
    md5-concat key on corpora with known runs, at k=3 and k=5, including
    self-repetition and the no-span case."""
    corpora = [
        [(1, "a b c d e f"), (2, "x b c d y z")],            # shared 3-run
        [(1, "q w e q w e r t"), (2, "unrelated words here")],  # self-rep
        [(1, "a b c"), (2, "d e f")],                        # no dups
        [(1, "p q r s t u v w"), (2, "z p q r s t u y")],    # long run
    ]
    for rows in corpora:
        for k in (3, 5):
            md5_spans = sorted(
                (r.doc_id, r.start_tok, r.end_tok)
                for r in OD.dup_span_spans(
                    _df(spark, rows), k=k, gram_hash="md5"
                ).collect()
            )
            poly_spans = sorted(
                (r.doc_id, r.start_tok, r.end_tok)
                for r in OD.dup_span_spans(
                    _df(spark, rows), k=k, gram_hash="poly"
                ).collect()
            )
            assert md5_spans == poly_spans, (rows, k)

    # unknown recipe refuses loudly
    import pytest

    with pytest.raises(ValueError, match="md5|poly"):
        OD.dup_span_positions(_df(spark, corpora[0]), gram_hash="rot13")
