"""Corpus-curation operators for LLM training-data pipelines.

These extend the reference's operator families (SURVEY §2.4-§2.6) with the
standard large-scale curation steps the reference's users run downstream:

- sequence packing (concatenate docs into fixed-token-budget training
  sequences — the T5/GPT "pack then chunk" shape);
- boilerplate detection by shingle document-frequency (CCNet/RefinedWeb
  repeated-content heuristic, generalized from lines to word shingles);
- deterministic stratified sampling (per-stratum hash-ordered top-n);
- per-stratum quantile filtering (keep the top X% by a score column).

All are pure DataFrame compositions — shuffle-native, no Python in the hot
path, each with an exact DuckDB oracle mirror in
``plans/curation_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions.text import (
    md5_long,
    norm_tokens,
    normalize_text,
    token_count,
    tokens,
    word_shingles,
)
from webscale_multimodal_datapipeline_spark.operators.base import LambdaOperator

# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

PACK_BUDGET = 256  # tokens per training sequence
PACK_BUCKETS = 16  # parallel packing streams (scale knob, see below)


def sequence_pack(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = PACK_BUDGET,
    buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Assign each document to a (bucket, seq_id) training sequence.

    Documents are hash-partitioned into ``buckets`` independent packing
    streams; within a stream they are concatenated in ``id_col`` order and
    chunked every ``budget`` tokens. A document belongs to the sequence its
    first token lands in (greedy contiguous packing — documents may straddle
    a boundary, exactly like pretraining-corpus chunking).

    Scale: the window is PARTITIONED by bucket — no global sort. ``buckets``
    is the parallelism knob: at 100 TB use O(100k) buckets so each stream is
    a few GB; the bucket hash is data-independent so the layout is
    reproducible run-to-run. The md5-derived bucket/order keys make the
    output bit-identical cross-engine (DuckDB oracle).
    """
    bucket = md5_long(F.col(id_col).cast("string")) % buckets
    n_tok = token_count(F.col(text_col))
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("pack_bucket", bucket)
        .withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_id", F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
        )
        .drop("_cum")
    )


def sequence_pack_op(**kw) -> LambdaOperator:
    return LambdaOperator("sequence_pack", lambda df: sequence_pack(df, **kw), "refiner")


# ---------------------------------------------------------------------------
# Boilerplate detection (shingle document-frequency)
# ---------------------------------------------------------------------------

BOILER_K = 3  # shingle width (words)
BOILER_MIN_DF = 3  # shingle is "boilerplate" if it appears in >= this many docs
BOILER_MAX_RATIO = 0.5  # drop docs with more than this fraction boilerplate


def boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = BOILER_K,
    min_df: int = BOILER_MIN_DF,
) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of its distinct word
    shingles that occur in >= ``min_df`` distinct documents corpus-wide.

    The CCNet/RefinedWeb repeated-line heuristic generalized to shingles
    (robust to corpora without line structure). Two-phase, shuffle-native:

    1. one groupBy over exploded (shingle) computes document frequency —
       shingles are distinct per doc, so ``count(*)`` IS the doc frequency;
    2. the common-shingle set (df >= min_df) is by construction small
       (boilerplate is rare among distinct shingles) → broadcast semi-join
       back against each doc's shingles; no second wide shuffle.

    Adds ``n_shingles``, ``n_common``, ``boiler_ratio`` columns.
    """
    # materialize the token array as a real column BEFORE shingling —
    # an inline token expression re-runs the split per element_at inside
    # word_shingles' transform lambda (measured 50x; see word_shingles doc)
    exploded = (
        df.withColumn("_tk", norm_tokens(F.col(text_col)))
        .withColumn("_sh", word_shingles(text_col, k=k, toks=F.col("_tk")))
        .select(id_col, F.explode("_sh").alias("shingle"))
    )
    common = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle", F.lit(1).alias("_is_common"))
    )
    # one left join + one agg yields BOTH counts — the shingle expression
    # is evaluated twice total (once per exploded use); at 100 TB persist
    # or checkpoint `exploded` to make it once.
    per_doc = (
        exploded.join(F.broadcast(common), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("_is_common", F.lit(0))).alias("n_common"),
        )
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_shingles", F.coalesce("n_shingles", F.lit(0)).cast("bigint"))
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)).cast("bigint"))
        .withColumn(
            "boiler_ratio",
            (F.col("n_common").cast("double") / F.col("n_shingles")),
        )
    )


def boilerplate_filter(
    df: DataFrame,
    max_ratio: float = BOILER_MAX_RATIO,
    **kw,
) -> DataFrame:
    """Keep documents whose boilerplate ratio is <= ``max_ratio``."""
    return boilerplate_stats(df, **kw).filter(F.col("boiler_ratio") <= max_ratio)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    n_per_stratum: int = 30,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by md5 hash order
    of the id — deterministic and engine-independent (no RNG seed drift),
    reproducible across reruns and engines; adds ``sample_rank``.

    Scale: one hash-partitioned window per stratum. For heavy-hitter strata
    (en at web scale) the window sort is per-stratum; if a single stratum
    exceeds a task, pre-filter with an approximate hash threshold first
    (``md5_long(id) % M < ceil(M * k / count)``) and rank only survivors —
    same result, bounded sort input.
    """
    order = md5_long(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order, id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


# ---------------------------------------------------------------------------
# Per-stratum quantile filtering
# ---------------------------------------------------------------------------


def quantile_filter(
    df: DataFrame,
    score: Column,
    keep_frac: float = 0.2,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` fraction of rows per stratum by ``score``
    (ties broken by id — fully deterministic). Keeps ``ceil(frac * n)`` rows.

    This is the EXACT form (rank vs per-stratum count) used for the oracle
    gate. At web scale with one dominant stratum, swap the rank for the
    approximate-threshold form: per-stratum ``percentile_approx(score,
    1-frac)`` aggregated and broadcast back as a filter — one agg + one
    scan, no per-stratum sort (see ``quantile_threshold_filter``).
    """
    w = Window.partitionBy(strata_col).orderBy(F.desc("_q_score"), id_col)
    cnt = Window.partitionBy(strata_col)
    return (
        df.withColumn("_q_score", score)
        .withColumn("_rnk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("_rnk") <= F.ceil(F.col("_n") * F.lit(keep_frac)))
        .drop("_rnk", "_n")
        .withColumnRenamed("_q_score", "score")
    )


def quantile_threshold_filter(
    df: DataFrame,
    score: Column,
    keep_frac: float = 0.2,
    strata_col: str = "lang",
    rel_err: float = 0.001,
) -> DataFrame:
    """Approximate-quantile variant: no per-stratum sort, two narrow passes.

    ``percentile_approx`` runs as a partial-merge aggregate (one shuffle of
    sketches, not rows); the per-stratum cutoffs are a tiny table joined
    back with a broadcast hash join. This is the 100 TB path; results can
    differ from the exact form by the sketch's rank error (``rel_err``).
    """
    cuts = (
        df.withColumn("_q_score", score)
        .groupBy(strata_col)
        .agg(
            F.percentile_approx(
                "_q_score", F.lit(1.0 - keep_frac), F.lit(int(1.0 / rel_err))
            ).alias("_cut")
        )
    )
    return (
        df.withColumn("_q_score", score)
        .join(F.broadcast(cuts), strata_col)
        .filter(F.col("_q_score") >= F.col("_cut"))
        .drop("_cut")
        .withColumnRenamed("_q_score", "score")
    )


# ---------------------------------------------------------------------------
# Duplicate-line removal (CCNet paragraph-hash dedup / RefinedWeb line dedup)
# ---------------------------------------------------------------------------

LINE_MIN_DF = 2  # a line is "duplicated" if it appears in >= this many docs


def duplicate_line_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_df: int = LINE_MIN_DF,
) -> DataFrame:
    """Rewrite each document with its cross-document duplicated lines
    removed — the CCNet paragraph-hash / RefinedWeb line-dedup step (drop
    "subscribe to our newsletter"-style lines that recur across pages)
    applied WITHIN the engine rather than as a whole-doc drop.

    A line's key is ``lower(trim(line))``; a line is duplicated when its
    key occurs in >= ``min_df`` distinct documents. Documents keep their
    surviving lines in original order; a fully-boilerplate document
    becomes the empty string (it stays in the output so a downstream
    length filter can make the drop decision explicitly).

    Plan shape (three shuffles, no pair join, no state):
    1. ``posexplode(split(text))`` — narrow;
    2. line-key groupBy counting DISTINCT docs (partial-agg combinable
       after the per-doc ``distinct``-by-construction explode);
    3. left-anti join the duplicated-key set back (NO forced broadcast:
       "boilerplate is rare among distinct keys" is a corpus assumption —
       on boilerplate-heavy corpora at 100 TB the dup-key set can exceed
       broadcast limits, so AQE decides broadcast-vs-shuffle from runtime
       size), then per-doc ordered reassembly via
       ``array_sort(collect_list(struct(pos, line)))`` — one groupBy on
       the id, no global sort.

    ``sep`` is a Java-regex split pattern on the way in and a literal on
    the way out (the common '\\n' is both).

    Adds ``n_lines``/``n_removed`` and replaces ``text_col``.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    ).withColumn("_k", F.lower(F.trim("_line")))
    dup_keys = (
        # (id, key) distinct first so count(*) is the distinct-doc frequency
        lines.select(id_col, "_k")
        .distinct()
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_k")
    )
    kept = lines.join(dup_keys, "_k", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep.replace("\\n", "\n"),
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    # n_lines folds into the base projection (no self-join for it — the
    # only join in the rebuild path is the id-keyed one against `rebuilt`)
    return (
        df.withColumn(
            "n_lines", F.size(F.split(F.col(text_col), sep)).cast("bigint")
        )
        .drop(text_col)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .withColumn(
            "n_removed",
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).cast("bigint"),
        )
        .drop("_new_text", "_n_kept")
    )


def duplicate_line_removal_op(**kw) -> LambdaOperator:
    return LambdaOperator(
        "duplicate_line_removal", lambda df: duplicate_line_removal(df, **kw), "refiner"
    )


# ---------------------------------------------------------------------------
# Merge / upsert (CDC-style delta application)
# ---------------------------------------------------------------------------


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    check_unique_delta_keys: bool = False,
) -> DataFrame:
    """MERGE semantics without a table format: delta rows win on key
    collision, unmatched delta rows insert, unmatched base rows carry
    over — i.e. ``MERGE WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *``
    (the operation Iceberg/Delta run transactionally; here as a pure
    dataflow so pipelines can apply CDC deltas before a sink exists).

    A matched row takes the delta row WHOLESALE (matched-flag pick, not
    per-column COALESCE), so a delta row CAN set a column to NULL —
    exactly ``UPDATE SET *``.

    Precondition: delta keys must be unique (one delta row per key),
    as row-level MERGE requires — duplicate delta keys would fan out
    through the join, like SQL MERGE's "multiple matched rows" error
    condition. Pass ``check_unique_delta_keys=True`` to pay one extra
    aggregate job that raises instead of silently fanning out.

    One full-outer hash join on the key. At 100 TB the base side should be
    bucketed by the key (``operators/scale.py::write_bucketed``) so only
    the (much smaller) delta shuffles; with a table format, swap this for
    the engine's native row-level MERGE.

    Columns = base's columns; delta must carry the same schema.
    """
    cols = base.columns
    b = base.select(*cols)
    d = delta.select(*cols).withColumn("_matched", F.lit(True))
    if check_unique_delta_keys:
        dup = (
            d.groupBy(key).agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") > 1)
        )
        n_dup = dup.limit(1).count()
        if n_dup:
            raise ValueError(f"merge_upsert: duplicate delta keys on {key!r}")
    joined = b.alias("b").join(d.alias("d"), F.col(f"b.{key}") == F.col(f"d.{key}"), "full_outer")
    take_delta = F.col("d._matched").isNotNull()
    return joined.select(
        *[
            F.when(take_delta, F.col(f"d.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            for c in cols
        ]
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity proxy as a pipeline operator (YAML-reachable form
# of plans/text_queries.py::t_unigram_logprob — same algorithm, keeps every
# input column and annotates instead of projecting)
# ---------------------------------------------------------------------------


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "avg_logprob",
) -> DataFrame:
    """Annotate each row with its mean token log-probability under the
    corpus's own unigram LM (the model-free stand-in for a KenLM quality
    filter — CCNet/RefinedWeb lineage). Rows whose text has no tokens get
    NULL (no evidence), not 0.

    Two aggregations (term frequency, per-doc mean) + one shuffle join on
    term; the vocabulary side is NOT force-broadcast — AQE decides.
    Per-token log-probs are rounded to 4 dp and accumulated as DECIMAL so
    the signal is deterministic across engines and partitionings.
    """
    toks = df.select(id_col, F.explode(norm_tokens(F.col(text_col))).alias("_term"))
    freq = toks.groupBy("_term").agg(F.count(F.lit(1)).alias("_cnt"))
    total = freq.agg(F.sum("_cnt").alias("_total"))
    lm = freq.crossJoin(F.broadcast(total)).select(
        "_term",
        F.round(F.log(F.col("_cnt").cast("double") / F.col("_total")), 4)
        .cast("decimal(18,4)")
        .alias("_lp"),
    )
    scores = (
        toks.join(lm, "_term")
        .groupBy(id_col)
        .agg(F.sum("_lp").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            id_col,
            # integer-resolution rounding in 1e-4 units — see
            # plans/text_queries.py::t_unigram_logprob for why scaled
            # ROUND(x, 4) is not cross-engine-stable
            (
                F.round(
                    (F.col("_s") * 10000).cast("bigint").cast("double")
                    / F.col("_n"),
                    0,
                )
                / F.lit(10000.0)
            ).alias(out_col),
        )
    )
    return df.join(scores, id_col, "left")


def unigram_logprob_refiner(**kw) -> LambdaOperator:
    return LambdaOperator(
        "unigram_logprob", lambda df: unigram_logprob(df, **kw), "refiner"
    )
