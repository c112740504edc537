"""Text column expressions.

Native-Spark re-expressions of the reference's text kernels:

- normalization (lowercase + whitespace collapse) — reference
  ``operators/dedup/text_exact_dedup.py:66-72``;
- content hashing — ``text_exact_dedup.py:74-83`` (xxhash64/md5);
- text length — ``operators/filters/text_length_filter.py:43-57``;
- URL word scoring — ``operators/filters/url_filter.py:24-58,255-282``
  (score = 0.8 * max(weight) + min(total/3, 0.2));
- plus the training-data-pipeline extensions: token counting, quality
  scoring, language-ID heuristic, shingling, fingerprinting.

All are pure Column expressions → whole-stage codegen, no Python in the hot
path. Each has a matching ANSI-SQL form used by the DuckDB oracle (see
``plans/``); md5 is the shared cross-engine hash primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Normalization + hashing (exact-dedup keys)
# ---------------------------------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse runs of whitespace + trim.

    Reference semantics: ``text_exact_dedup.py:66-72`` (``" ".join(text
    .split()).lower()``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def content_hash(col: Column | str) -> Column:
    """64-bit content hash of normalized text (xxhash64, JVM-native).

    Reference: ``text_exact_dedup.py:74-83`` (xxhash64 preferred, md5
    fallback). Used as the shuffle/dedup key; for oracle-comparable keys use
    ``md5_long`` instead (DuckDB lacks xxhash64).
    """
    return F.xxhash64(normalize_text(col))


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash shared with DuckDB.

    ``CAST(CONV(SUBSTR(md5(x),1,15),16,10) AS BIGINT)`` — both engines
    produce identical md5 hex, and 15 hex chars = 60 bits avoids sign issues.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Tokenization / counting
# ---------------------------------------------------------------------------


def _strip_ws(c: Column) -> Column:
    # F.trim strips only ASCII spaces — tabs/newlines/CR at string edges
    # would survive it and split() would emit empty '' tokens. Strip the
    # full \s class so the edge case can't arise.
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def tokens(col: Column | str, clean: bool = False) -> Column:
    """Whitespace tokens of the text (empty/all-whitespace → empty array).

    All leading/trailing whitespace (the full ``\\s`` class, not just
    spaces) is stripped before splitting, so ``\\s+``-split can only
    produce an empty token when the whole string is empty — that one case
    branches instead of running a per-element filter lambda (HOF passes
    are interpreted; see docs/ARCHITECTURE.md §8).

    ``clean=True`` skips the strip regexp (one fewer regex pass per row —
    ~45% of this expression's cost): pass it ONLY when the input provably
    has no non-space whitespace, e.g. the output of ``normalize_text``
    (which collapses every ``\\s`` run to a single space and trims)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c) if clean else _strip_ws(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def norm_tokens(col: Column | str) -> Column:
    """Normalized whitespace tokens: EXACTLY the array
    ``tokens(normalize_text(col), clean=True)`` produces, for every
    input — without the whitespace-collapse ``regexp_replace`` pass.
    Splitting on ``\\s+`` already treats a whitespace RUN as one
    delimiter, so collapsing runs to single spaces first changes nothing
    about the token list; it only pays a full-text regex rewrite
    (measured ~5x of the whole hashed-classifier lane on long text).
    Parity is property-tested (``test_properties.py``).

    Use this when only the token ARRAY is needed; keep
    ``normalize_text`` where the normalized STRING itself is the value
    (content hashes, fingerprints)."""
    c = F.col(col) if isinstance(col, str) else col
    t = _strip_ws(F.lower(c))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (``length``-style cheap tokenizer) — pure
    size/split, no higher-order function."""
    c = F.col(col) if isinstance(col, str) else col
    t = _strip_ws(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: maximal alphanumeric runs plus individual
    punctuation marks — a cheap, deterministic proxy for a BPE tokenizer.
    (Defined via regexp extraction, no lookarounds — RE2-safe so the DuckDB
    oracle computes the identical count.)
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+"), 0))
    puncts = F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return words + puncts


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    stop = F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def mean_word_length(col: Column | str) -> Column:
    """Every non-whitespace char belongs to exactly one token, so the
    token-length sum is one strip pass (``length`` after removing all
    ``\\s``) — replaces an interpreted per-token ``aggregate`` fold."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    total = F.length(F.regexp_replace(c, r"\s", ""))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Composite doc-quality score in [0, 1].

    0.4 * length component (saturating at 400 chars) +
    0.3 * (1 - punct_ratio) + 0.3 * stopword presence component (saturating
    at ratio 0.2). Deterministic and SQL-expressible for the oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    len_comp = F.least(F.length(c) / F.lit(400.0), F.lit(1.0))
    stop_comp = F.least(stopword_ratio(c) / F.lit(0.2), F.lit(1.0))
    return (
        F.lit(0.4) * len_comp + F.lit(0.3) * (1.0 - punct_ratio(c)) + F.lit(0.3) * stop_comp
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
# FineWeb/RefinedWeb-era heuristic battery). All pure column expressions;
# DuckDB mirrors in plans/oracle_fragments.py.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


# The rule expressions below are all SINGLE whole-string regex passes
# (regexp_extract_all counts), not per-element HOF lambdas over a split
# array — HOF ``filter(..., rlike)`` re-enters the interpreted expression
# evaluator once per token/line (measured: the dominant cost of the
# gopher lane at 1M rows). Each rewrite is value-identical to the
# per-element form it replaces (the DuckDB oracle keeps the list_filter
# spelling, so the oracle gate pins the equivalence).


def symbol_word_ratio(col: Column | str) -> Column:
    """(# of '#' or '...' symbols) / word count — Gopher's symbol spam rule."""
    c = F.col(col) if isinstance(col, str) else col
    syms = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), 0))
    n = token_count(c)
    return F.when(n > 0, syms / n).otherwise(F.lit(0.0))


def alpha_word_ratio(col: Column | str) -> Column:
    """Fraction of words containing at least one alphabetic character.

    A word = maximal ``\\S`` run; ``\\S*[A-Za-z]\\S*`` greedily covers the
    whole run whenever it contains a letter (and cannot span whitespace),
    so the global non-overlapping match count = # words with a letter."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    alpha = F.size(F.regexp_extract_all(c, F.lit(r"\S*[A-Za-z]\S*"), 0))
    return F.when(F.size(toks) > 0, alpha / F.size(toks)).otherwise(F.lit(0.0))


def _line_count(c: Column) -> Column:
    # size(split(c, '\n')) without materializing the line array
    return F.length(c) - F.length(F.replace(c, F.lit("\n"), F.lit(""))) + 1


def bullet_line_ratio(col: Column | str) -> Column:
    """Fraction of lines starting with a bullet ('-' or '*' or '•').

    ``(?:^|\\n) *`` anchors each line start explicitly (no ``(?m)`` — Java
    multiline anchors also fire around bare ``\\r``, which the split+trim
    form this replaces never did)."""
    c = F.col(col) if isinstance(col, str) else col
    bullets = F.size(F.regexp_extract_all(c, F.lit(r"(?:^|\n) *[-*•]"), 0))
    lines = _line_count(c)
    return F.when(lines > 0, bullets / lines).otherwise(F.lit(0.0))


def ellipsis_line_ratio(col: Column | str) -> Column:
    """Fraction of lines ending with '...' (trailing spaces ignored)."""
    c = F.col(col) if isinstance(col, str) else col
    ell = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\. *(?=\n|$)"), 0))
    lines = _line_count(c)
    return F.when(lines > 0, ell / lines).otherwise(F.lit(0.0))


def stopword_hits(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """# words that exactly equal a stopword (case-folded): a word is a
    maximal ``\\S`` run, so 'start-or-whitespace' lookbehind + 'whitespace-
    or-end' lookahead around the literal alternation is exact equality."""
    c = F.col(col) if isinstance(col, str) else col
    alt = "|".join(stopwords)
    pat = r"(?i)(?:^|(?<=\s))(?:" + alt + r")(?=\s|$)"
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def gopher_flags(col: Column | str) -> dict[str, Column]:
    """Per-rule pass booleans (True = rule satisfied)."""
    n = token_count(col)
    return {
        "ok_word_count": n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        "ok_mean_word_len": mean_word_length(col).between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        ),
        "ok_symbol_ratio": symbol_word_ratio(col) < GOPHER_MAX_SYMBOL_RATIO,
        "ok_bullet_ratio": bullet_line_ratio(col) < GOPHER_MAX_BULLET_RATIO,
        "ok_ellipsis_ratio": ellipsis_line_ratio(col) < GOPHER_MAX_ELLIPSIS_RATIO,
        "ok_alpha_ratio": alpha_word_ratio(col) > GOPHER_MIN_ALPHA_RATIO,
        "ok_stopwords": stopword_hits(col) >= GOPHER_MIN_STOPWORDS,
    }


def gopher_keep(col: Column | str) -> Column:
    """Conjunction of all Gopher rules (the filter predicate)."""
    out = F.lit(True)
    for flag in gopher_flags(col).values():
        out = out & flag
    return out


# ---------------------------------------------------------------------------
# Language-ID heuristic (n-gram / stopword evidence)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


LANG_ID_MAX_TOKENS = 4095  # one 12-bit packed counter per language


def lang_id(col: str) -> Column:
    """Rule-based language guess: the language with the most marker-word hits;
    ties and no-evidence fall back to 'und'. Deterministic, SQL-expressible.

    ONE aggregate pass accumulates all per-language counts into an array —
    the per-language ``filter()`` form re-evaluated the tokenize chain once
    per language plus once per tie-break branch (~11 passes/row; measured
    78K rec/s → this form is one pass). Counts are integers, so the argmax
    and tie-break (declaration order: en > es > fr > de > zh) are
    value-identical to the old expression and to the DuckDB oracle.

    Evidence is taken from the first ``LANG_ID_MAX_TOKENS`` tokens (the
    oracle mirrors the same slice): each language owns a 12-bit field of
    the packed counter, so an unbounded token stream could overflow into
    the neighboring language's count.
    """
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("lang_id requires a column name (built as a SQL string)")
    langs = list(LANG_MARKERS)
    toks = (
        f"slice(filter(split(trim(`{name}`), '\\\\s+'), t -> t != ''), "
        f"1, {LANG_ID_MAX_TOKENS})"
    )
    # Bit-packed single-pass accumulation: language i gets a 12-bit counter
    # inside one BIGINT (token counts are << 4095), so the per-token work is
    # a handful of IN checks and one integer add — no per-token array
    # allocation (the zip_with form measured SLOWER than the 11-pass
    # original; this form is one pass and allocation-free).
    per_token = " + ".join(
        "(CASE WHEN t IN (%s) THEN CAST(%d AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        % (", ".join("'%s'" % m for m in LANG_MARKERS[lang]), 1 << (12 * i))
        for i, lang in enumerate(langs)
    )
    packed = (
        f"aggregate(transform({toks}, t -> lower(t)), CAST(0 AS BIGINT), "
        f"(acc, t) -> acc + {per_token})"
    )
    # Bind the packed counter ONCE via a transform lambda (SQL has no
    # `let`); extracts on the bound variable are cheap integer ops.
    # shiftright() call form — the `>>` operator doesn't parse inside SQL
    # lambda bodies (grammar conflict with the `->` arrow).
    ext = {lang: f"(shiftright(p, {12 * i}) & 4095)" for i, lang in enumerate(langs)}
    best = "greatest(" + ", ".join(ext[lang] for lang in langs) + ")"
    case = " ".join(f"WHEN {ext[lang]} = {best} THEN '{lang}'" for lang in langs)
    return F.expr(
        f"element_at(transform(array({packed}), "
        f"p -> CASE WHEN {best} > 0 THEN (CASE {case} END) ELSE 'und' END), 1)"
    )


# ---------------------------------------------------------------------------
# Shingling / fingerprinting (near-dup building blocks)
# ---------------------------------------------------------------------------


def word_shingles(
    col: Column | str, k: int = 3, toks: Column | None = None
) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    Building block for MinHash / Jaccard dedup (SURVEY §2.5 extension).
    Texts shorter than k words yield a single shingle of the whole text so
    every row keeps a key (mirrors the reference's fallback-to-id behavior,
    ``text_exact_dedup.py:84-90``).

    PERF: pass ``toks`` as a materialized token-array *column reference*
    when calling in a hot path — if the tokenization expression is inlined
    here, Catalyst re-evaluates the full split once per element_at inside
    the transform lambda (measured 50x slowdown at 260K shingles).
    """
    if toks is None:
        toks = norm_tokens(col)
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(n >= k, shingles).otherwise(whole))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: 60-bit integer hash of the normalized text
    (md5-backed so the DuckDB oracle can reproduce it exactly).
    """
    return md5_long(normalize_text(col))


# ---------------------------------------------------------------------------
# Hashed-token linear quality classifier (FineWeb-edu / fastText shape)
# ---------------------------------------------------------------------------

CLF_BUCKETS = 4096
CLF_MIX = 2654435761  # Knuth multiplicative-hash constant
CLF_MAX_TOKENS = 256


def hashed_quality_clf(col: Column | str, algo: str = "xxhash64") -> dict[str, Column]:
    """Model-based quality score: hash each of the first CLF_MAX_TOKENS
    tokens into a CLF_BUCKETS-entry weight table, average, squash with the
    rational fast-sigmoid ``0.5 + 0.5*x/(1+|x|)``.

    The "trained" weights are a deterministic function of the bucket id
    (``(bucket*CLF_MIX) % 2000001 - 1e6`` milli-units) so both engines
    materialize the identical model with no weights file; a real model
    swaps that expression for a broadcast map lookup — the plumbing
    (hash → bucket → weight → mean → squash) is identical. Every step is
    integer or single-IEEE-op arithmetic → bit-identical cross-engine
    (no libm exp divergence).

    Returns ``{n_scored_tokens, clf_score, keep}`` columns; pure per-row
    array math inside whole-stage codegen — no shuffle, no UDF.

    ``algo='xxhash64'`` (the default) is the production hot path
    (JVM-native token hash, ~4x the md5 lane); ``algo='md5'`` is the
    cross-engine oracle spec (DuckDB-reproducible bucket assignment) —
    same model shape, different bucket assignment. Same split as SimHash:
    fast kernel by default, md5 retained as the differential spec.
    """
    toks = F.slice(norm_tokens(col), 1, CLF_MAX_TOKENS)

    def _milli(t: Column) -> Column:
        if algo == "xxhash64":
            bucket = F.pmod(F.xxhash64(t), F.lit(CLF_BUCKETS))
        else:
            bucket = (
                F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % CLF_BUCKETS
            )
        return (bucket * CLF_MIX) % 2000001 - 1000000

    # n from the TOKEN array (pre-hash) and keep from the raw SUM: the
    # sum-and-size-of-`milli` form made every consumer of `keep` evaluate
    # the hashed array TWICE (HOF expressions get no CSE across outputs —
    # measured 2.3x on the 1M-row lane). `s > 0` ≡ `raw > 0` exactly:
    # n*1e6 > 0 whenever n > 0, and the n == 0 branch pins raw to 0.0.
    n = F.size(toks)
    s = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + _milli(t)
    )
    raw = F.when(n > 0, s / (n.cast("double") * 1000000.0)).otherwise(F.lit(0.0))
    score = F.round(F.lit(0.5) + F.lit(0.5) * raw / (F.lit(1.0) + F.abs(raw)), 4)
    return {
        "n_scored_tokens": n.cast("int"),
        "clf_score": score,
        "keep": s > 0,
    }


# ---------------------------------------------------------------------------
# Readability (Flesch reading-ease, vowel-group syllable proxy)
# ---------------------------------------------------------------------------


def flesch_parts(col: Column | str) -> dict[str, Column]:
    """Word / sentence-run / syllable counts and the Flesch reading-ease
    score. Syllables are approximated as vowel-group runs with an
    every-word-has-one floor (``greatest(words, vowel_groups)``) — a
    deterministic, RE2-safe proxy (no dictionary, no lookarounds), so the
    DuckDB oracle reproduces it exactly. FRE is emitted at 1e-2 integer
    resolution (the repo's cross-engine rounding discipline)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))
    sentences = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0))
    )
    vowels = F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), 0))
    syllables = F.greatest(words, vowels)
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6) * (syllables.cast("double") / words)
    )
    return {
        "n_words": words,
        "n_sentences": sentences,
        "n_syllables": syllables,
        # zero-word guard: under ANSI (Spark 4 default) /0 RAISES, so the
        # division must be conditionally unreachable, not just filtered by
        # the caller — token-less rows score NULL
        "fre": F.when(
            words > 0, F.round(fre * 100, 0).cast("bigint") / F.lit(100.0)
        ),
    }


def word_shingle_seq(
    col: Column | str, k: int = 3, toks: Column | None = None
) -> Column:
    """POSITIONAL k-word shingle sequence (array<string>, duplicates
    kept, token order preserved) — the input winnowing is defined over
    (Schleimer et al. 2003 fingerprint the k-gram SEQUENCE, not the
    distinct set: window positions are positions in the document).
    ``word_shingles`` stays the set-semantic variant for MinHash /
    Jaccard, where ``array_distinct``'s engine-specific ordering is
    harmless; this variant is the cross-engine-order-stable one.
    Short texts (< k tokens) yield the single whole-text shingle."""
    if toks is None:
        toks = norm_tokens(col)
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(n >= k, shingles).otherwise(whole)
