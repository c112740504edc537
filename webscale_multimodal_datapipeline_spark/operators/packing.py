"""Sequence packing — the step between tokenizer-encode and the trainer.

A pretraining pipeline does not feed documents to the model; it feeds
fixed-size token WINDOWS. Two published packing disciplines are
implemented, both deterministic and both oracle-checkable:

* :func:`concat_chunk_pack` — GPT-style concatenate-then-chunk: documents
  are laid out end-to-end in a stable global order and the stream is cut
  every ``budget`` tokens. Every window is exactly full; documents may
  span window boundaries. The assignment is a pure function of the
  exclusive global token cumsum, so it is expressible as window algebra
  in ANSI SQL (the DuckDB oracle hash-verifies it end-to-end).

* :func:`nextfit_pack` — boundary-free packing (T5/examples-pack style):
  documents are never split; within deterministic hash shards they are
  laid out in Next-Fit-Decreasing order (sort by token count descending,
  open a new pack whenever the current one cannot take the next doc).
  The fold is sequential per shard, which SQL can replay with a
  recursive CTE — the oracle still hash-verifies exact assignments.

The reference pipeline stops at per-record refinement and has no packing
stage (its training-side consumers do this out-of-band); these operators
extend SURVEY §2's training-data coverage past the reference, like the
dedup/ANN families.

Relationship to ``operators/curation.py::sequence_pack``
(``c_sequence_pack``): that operator is the BUCKETED-STREAMS variant —
hash documents into independent packing streams and chunk within each,
emitting only a coarse ``(bucket, seq_id)``. It trades global layout
for embarrassing parallelism. :func:`concat_chunk_pack` is the
single-global-stream layout a GPT-style loader actually materializes
(one deterministic corpus order, byte-accurate ``pack_offset`` and
boundary-span flags — enough to SEEK into a window), and it shows the
global cumsum is still shuffle-parallel via range partitioning, so the
bucketed trade is optional, not forced. :func:`nextfit_pack` covers the
third discipline (no document ever splits). Three disciplines, three
operators; each oracle-verified.

Scale notes: the concat-chunk cumsum is the classic global-window trap —
``SUM() OVER (ORDER BY …)`` with no partition key puts the whole corpus
in ONE task. It is built instead on the range-repartition +
broadcast-offset pattern (``plans/misc_queries.py::x_acctbal_deciles``,
ARCHITECTURE §43): range-partition on the order key, cumsum locally,
add tiny per-partition token offsets (P-row triangular broadcast join),
and freeze the ranged frame once so every branch sees the same partition
assignment. Next-fit shards are hash-distributed (`md5_long % shards`) so
the per-shard Python fold is O(rows/shard) with bounded memory and no
global state; at cluster scale ``n_shards`` rises with the corpus and
the fold never sees more than one shard per Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions.text import (
    bpe_ish_token_count,
    md5_long,
)

PACK_BUDGET = 2048  # tokens per training window (catalog default)
PACK_SHARDS = 32
# Next-fit shard sizing target: the per-shard fold materializes ONE shard
# per Arrow group, so shard row count is the operator's memory bound.
PACK_SHARD_TARGET_ROWS = 100_000


def scaled_pack_shards(n_rows: int, target: int = PACK_SHARD_TARGET_ROWS) -> int:
    """Shard count that holds the per-shard Arrow group at ~``target``
    rows as the corpus grows — the ``scaled_planes`` lesson applied to
    packing: a FIXED shard count means shard size grows linearly with the
    corpus and the ``applyInPandas`` fold eventually cannot hold one
    group in executor memory. Deployments that need a reproducible layout
    across runs of DIFFERENT corpus sizes pin ``n_shards`` explicitly
    (the layout is a function of the shard count, like the CDC handlers'
    pinned plane schedule)."""
    import math

    return max(PACK_SHARDS, math.ceil(max(n_rows, 1) / target))


def _with_token_counts(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens) with the BPE-ish deterministic tokenizer proxy —
    the same counter ``a_token_counts`` value-checks cross-engine."""
    return docs.select(
        F.col(id_col),
        bpe_ish_token_count(text_col).cast("bigint").alias("n_tokens"),
    )


def concat_chunk_pack(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
    base: int = 0,
    resources: list | None = None,
) -> DataFrame:
    """Concatenate-then-chunk window assignment per document.

    Returns ``(id_col, n_tokens, pack_id, pack_offset, spans_boundary)``:
    the document's tokens begin at ``pack_offset`` inside window
    ``pack_id``; ``spans_boundary`` marks documents whose tokens cross at
    least one window cut. Zero-token documents are kept (width-0 at the
    current cursor, never spanning).

    ``base`` shifts the layout cursor: the first document's tokens start
    at global offset ``base`` instead of 0 — the streaming composition's
    hook (``incremental_pack_batch_handler`` lays each micro-batch out at
    the stored corpus cursor, so the multi-epoch assignment equals this
    operator on the concatenation).

    The global exclusive cumsum runs on the ``x_acctbal_deciles``
    range-repartition pattern instead of an unpartitioned window — at
    100 TB an ``ORDER BY`` window with no partition key is a single-task
    plan; this one is ``num_parts``-parallel with a P-row broadcast."""
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        _materialize,
    )

    t = _with_token_counts(docs, id_col, text_col)
    # Materialized ONCE: range-exchange boundary sampling is not
    # guaranteed identical across plan branches (§43) — the offsets
    # branch and the window branch must see the SAME _pid map. With a
    # `resources` list (the streaming-handler shape, ADVICE r6 #3) the
    # handle is persist-based and released by the CALLER at epoch end;
    # the localCheckpoint default frees on driver GC (batch contract).
    ranged = _materialize(
        t.repartitionByRange(num_parts, F.col(id_col).asc()).withColumn(
            "_pid", F.spark_partition_id()
        ),
        resources,
    )
    hist = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptok"))
    offs = (
        hist.alias("l")
        .join(hist.alias("r"), F.col("r._pid") < F.col("l._pid"), "left")
        .groupBy(F.col("l._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("r._ptok"), F.lit(0)).alias("_off"))
    )
    wl = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    excl = (
        F.coalesce(
            F.sum("n_tokens").over(
                wl.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        + F.col("_off")
        + F.lit(int(base))
    )
    # Integer division (DIV), not floor(double /): a double quotient is
    # exact only below 2^53 and the cumsum is a corpus-total token count.
    b = int(budget)
    out = (
        ranged.join(F.broadcast(offs), "_pid")
        .withColumn("_excl", excl)
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.expr(f"CAST(_excl DIV {b} AS BIGINT)").alias("pack_id"),
            F.expr(f"CAST(_excl % {b} AS BIGINT)").alias("pack_offset"),
            F.expr(
                f"((_excl + GREATEST(n_tokens, 1) - 1) DIV {b})"
                f" > (_excl DIV {b})"
            ).alias("spans_boundary"),
        )
    )
    return out


def nextfit_pack(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-Fit-Decreasing packing within deterministic hash shards —
    documents never split across windows.

    Shard = ``md5_long(id) % n_shards`` (the cross-engine hash idiom).
    Within a shard, documents are laid out in (n_tokens DESC, id ASC)
    order; a document that no longer fits the open pack closes it and
    opens the next (oversize documents get a pack of their own). Returns
    ``(shard, id_col, n_tokens, pack_id)`` with pack ids local to the
    shard — globally unique as ``(shard, pack_id)``.

    The per-shard fold runs in one ``applyInPandas`` pass (sequential by
    construction — exactly the recursive-CTE replay the oracle runs);
    everything before it is hash-shuffle + sort, so the plan is
    shard-parallel and the Python loop is O(rows/shard).

    Shard-count default (r10, VERDICT r9 hygiene #2 — the old ``None``
    path ran an eager ``df.count()`` inside the operator, a full input
    scan before the fold that an unsuspecting pipeline user paid
    silently): ``n_shards=None`` now derives from
    ``defaultParallelism * 2`` — scan-free, parallelism-matched, and
    correct for any corpus whose rows/shard stays under
    ``PACK_SHARD_TARGET_ROWS`` at that width. For corpora past that,
    pass ``n_shards="scaled"`` to pay one explicit count for the
    row-bounded ``scaled_pack_shards`` sizing, or pin an integer for a
    size-independent layout (the catalog row pins ``PACK_SHARDS`` so
    the oracle hash is stable)."""
    if n_shards is None:
        n_shards = max(
            PACK_SHARDS, docs.sparkSession.sparkContext.defaultParallelism * 2
        )
    elif n_shards == "scaled":
        n_shards = scaled_pack_shards(docs.count())
    t = _with_token_counts(docs, id_col, text_col).withColumn(
        "shard",
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
            "int"
        ),
    )
    b = int(budget)
    id_type = t.schema[id_col].dataType.simpleString()

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        )
        pack_ids = []
        pack, fill = 0, 0
        first = True
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if first:
                fill = tok
                first = False
            elif fill + tok <= b:
                fill += tok
            else:
                pack += 1
                fill = tok
            pack_ids.append(pack)
        out = pdf[["shard", id_col, "n_tokens"]].copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int64")
        return out

    return t.groupBy("shard").applyInPandas(
        fold,
        schema=(
            f"shard int, {id_col} {id_type}, n_tokens bigint, pack_id bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Interleaved MULTIMODAL packing (round 9, session 2) — the VLM-training
# counterpart of the three text disciplines above. An interleaved
# image-text corpus (OBELICS/MMC4 style) trains on windows whose items
# are text runs AND images; an image is ATOMIC (a fixed block of vision
# tokens — a ViT patch grid never splits across windows) while document
# order must be preserved so the text stays aligned with the images it
# references. The discipline is therefore atomic-item NEXT-FIT in
# arrival order: items stream in (doc, item_idx) order; an item that no
# longer fits the open window closes it and opens the next.
#
# Same scale shape as nextfit_pack: deterministic hash shards, one
# sequential applyInPandas fold per shard (the fold IS the discipline —
# its recursive-CTE replay is the oracle), everything before it
# hash-shuffle + sort. Cost model: text item = BPE-ish token count,
# image item = INTERLEAVE_IMG_TOKENS vision tokens.
# ---------------------------------------------------------------------------

INTERLEAVE_IMG_TOKENS = 64  # vision tokens per image; production towers
#                             use 256-576 (e.g. a 24x24 ViT grid) — the
#                             synthetic corpus' short docs pin a small grid.


def interleave_pack(
    items: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
    doc_col: str = "doc_id",
    idx_col: str = "item_idx",
    type_col: str = "item_type",
    cost_col: str = "token_cost",
) -> DataFrame:
    """Atomic-item next-fit packing of an interleaved multimodal item
    stream.

    ``items`` = one row per item: ``(doc_col, idx_col, type_col,
    cost_col)`` — a document's text run plus each of its images, with
    ``idx_col`` giving the within-doc order. Shard =
    ``md5_long(doc)`` % ``n_shards`` (whole docs co-shard, so a doc's
    items stay consecutive); within a shard items are laid out in
    (doc, item_idx) order, each item atomic: if the open window cannot
    take it, the window closes and the item starts the next (oversize
    items get a window of their own). Returns the item rows plus
    ``(shard, pack_id, pack_offset)`` — pack ids local to the shard,
    offset = fill before the item.
    """
    t = items.withColumn(
        "shard",
        F.pmod(md5_long(F.col(doc_col).cast("string")), F.lit(n_shards)).cast(
            "int"
        ),
    )
    b = int(budget)
    doc_type = t.schema[doc_col].dataType.simpleString()
    idx_type = t.schema[idx_col].dataType.simpleString()

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values([doc_col, idx_col], kind="mergesort")
        pack_ids, offsets = [], []
        pack, fill = 0, 0
        first = True
        for cost in pdf[cost_col]:
            cost = int(cost)
            if first:
                offsets.append(0)
                fill = cost
                first = False
            elif fill + cost <= b:
                offsets.append(fill)
                fill += cost
            else:
                pack += 1
                offsets.append(0)
                fill = cost
            pack_ids.append(pack)
        out = pdf[["shard", doc_col, idx_col, type_col, cost_col]].copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int64")
        out["pack_offset"] = pd.array(offsets, dtype="int64")
        return out

    return t.groupBy("shard").applyInPandas(
        fold,
        schema=(
            f"shard int, {doc_col} {doc_type}, {idx_col} {idx_type}, "
            f"{type_col} string, {cost_col} bigint, "
            "pack_id bigint, pack_offset bigint"
        ),
    )
