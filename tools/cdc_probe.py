"""CDC scaling probe (VERDICT r7 #4): epoch throughput vs ACCUMULATED
index size for the three continuous-crawl dedup families — exact (key
index), MinHash (signature index), embedding-cosine (stored-embedding
index). The batch families all carry §34-style measured exponents; this
closes the same loop for the streaming paths, where the cost driver is
not batch size but the GROWING stored state every epoch probes.

Method: fixed batch size per family; ingest doubling amounts of unique
rows to reach each target index size, then TIME one additional epoch at
that size. The readout is the slope of epoch wall vs index size — flat
(α≈0) means probe traffic is bounded by candidates (the §39 design
claim: keys-only / bucket-pruned probe reads), α≈1 means the epoch
re-reads the world and the design failed. Batches are UNIQUE rows
(suffix-token / hash-noise replicas, the probe replicator's rule), so
the timed path is the probe-and-append shape, not the rejection path.

Emits one JSON line per lane plus a summary line with the bench
calibration sentinel; exits nonzero on a contended run like
scaling_probe (round-8 close ritual).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402
from webscale_multimodal_datapipeline_spark.streaming import pipeline as SP  # noqa: E402

from bench import calibration_ms, contention_flag, should_refuse_contended  # noqa: E402


def _doc_batch(base: pd.DataFrame, b: int) -> pd.DataFrame:
    """Unique-doc batch b: remapped ids + a per-batch suffix token (near
    the base text, never equal to any other batch's — no cross-epoch
    rejections, the timed path is probe+append)."""
    out = base.copy()
    out["doc_id"] = out["doc_id"] * 10_000 + b
    out["text"] = out["text"] + f" batch{b}"
    return out


def _doc_batch_shuffled(base: pd.DataFrame, b: int) -> pd.DataFrame:
    """MinHash-lane batch: a suffix token alone does NOT escape NEAR-dup
    rejection (measured: the index pinned at one batch and every later
    epoch was all-rejections — timing the reject path, not the growing
    probe). Per-(doc, batch) word permutation rewrites the shingle set
    wholesale, so batches are genuinely novel to the signature index."""
    out = base.copy()
    out["doc_id"] = out["doc_id"] * 10_000 + b
    rng = np.random.default_rng(11_000 + b)
    out["text"] = [
        " ".join(rng.permutation(str(t).split()).tolist()) + f" batch{b}"
        for t in out["text"]
    ]
    return out


def _emb_batch(base: pd.DataFrame, b: int) -> pd.DataFrame:
    out = base.copy()
    out["vec_id"] = out["vec_id"] * 10_000 + b
    rng = np.random.default_rng(7_000 + b)
    mat = np.stack(out["embedding"].to_numpy()).astype(np.float32)
    mat[:, :16] += rng.uniform(-4.0, 4.0, size=(len(out), 16)).astype(np.float32)
    out["embedding"] = list(mat)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # index-size schedule in INGESTED batches; warmup + timed epochs also
    # append (their rows are unique), so the recorded x-axis is the ACTUAL
    # stored row count read back per point — the schedule just spaces the
    # points roughly geometrically (~2× apart). Round 9 (VERDICT r8 #5):
    # extended to 15/31 batches (~170K doc rows / ~70K vectors, 35+ txlog
    # commits) so the accumulated index crosses enough FILES that the
    # bucket-pruned probe's per-epoch file-listing cost becomes visible if
    # it exists; each point also records the snapshot's file count.
    sizes = [
        int(s)
        for s in os.environ.get("CDC_PROBE_SIZES", "1,3,7,15,31").split(",")
        if s.strip()
    ]
    spark = get_spark("cdc_probe")
    docs_base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    )
    emb_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    work = tempfile.mkdtemp(prefix="cdc_probe_")
    cal = [calibration_ms()]
    results: dict[str, list[tuple[int, float]]] = {}

    # CDC_PROBE_COMPACT_EVERY=N exercises the handlers' built-in
    # index-maintenance cadence (round 9) — the lane then measures the
    # steady-state a maintained deployment sees instead of unbounded
    # file growth. CDC_PROBE_LANES=cdc_minhash,... filters lanes.
    compact_every = int(os.environ.get("CDC_PROBE_COMPACT_EVERY", "0")) or None
    lanes = {
        "cdc_exact": (
            docs_base,
            _doc_batch,
            lambda table: SP.incremental_dedup_batch_handler(
                table, compact_every=compact_every
            ),
        ),
        "cdc_minhash": (
            docs_base,
            _doc_batch_shuffled,
            lambda table: SP.incremental_neardup_batch_handler(
                table, compact_every=compact_every
            ),
        ),
        "cdc_embedding": (
            emb_base,
            _emb_batch,
            lambda table: SP.incremental_embdedup_batch_handler(
                table, dim=64, threshold=0.9, planes=8,
                compact_every=compact_every,
            ),
        ),
        # round 9: streaming sequence packing — the epoch cost must be
        # flat against the accumulated table because cursor recovery is
        # metadata-only (txlog file stats, no data pages)
        "cdc_pack": (
            docs_base,
            _doc_batch,
            lambda table: SP.incremental_pack_batch_handler(
                table, compact_every=compact_every
            ),
        ),
        # round 9 session 2: substring-span dedup CDC. Shuffled batches
        # (the minhash lane's rule) keep batch grams genuinely novel, so
        # the timed path is the index PROBE + scrub + append. Expected
        # shape: the exact gram semi-join explodes the accumulated
        # `_grams` column every epoch — token-scale index traffic, so
        # this lane's α is the honest cost of exact substring CDC (see
        # the handler docstring); the lane exists to measure it, not to
        # prove it flat.
        "cdc_span": (
            docs_base,
            _doc_batch_shuffled,
            lambda table: SP.incremental_spandedup_batch_handler(
                table, compact_every=compact_every
            ),
        ),
        # round 9 session 2: the span-CDC SCALE PATH — bloom-sketch
        # prefilter + point-pruned exact verify over the hash-clustered
        # gram sidecar. The pair (cdc_span, cdc_span_sketch) is the
        # design's A/B: inline must read ~linear in index size, sketch
        # ~flat.
        "cdc_span_sketch": (
            docs_base,
            _doc_batch_shuffled,
            lambda table: SP.incremental_spandedup_sketch_batch_handler(
                table, compact_every=compact_every
            ),
        ),
    }
    only_lanes = {
        s for s in os.environ.get("CDC_PROBE_LANES", "").split(",") if s
    }
    if only_lanes:
        lanes = {k: v for k, v in lanes.items() if k in only_lanes}
    from webscale_multimodal_datapipeline_spark.sources import txtable as TX

    for lane, (base, mk_batch, mk_handler) in lanes.items():
        table = f"{work}/{lane}"
        handler = mk_handler(table)
        ingested = 0
        epoch = 0
        first = True
        for target in sizes:
            while ingested < target:
                handler(spark.createDataFrame(mk_batch(base, epoch)), epoch)
                ingested += 1
                epoch += 1
            if first:
                # warmup of the PROBE-JOIN plan shape (it only exists once
                # the table does — the ingest epochs' first-plan compile
                # otherwise lands in the first timed point)
                handler(spark.createDataFrame(mk_batch(base, epoch)), epoch)
                epoch += 1
                first = False
            # index size = the ACTUAL stored row count (warmup and timed
            # epochs append too — all batch rows are unique by design)
            index_rows = TX.read(spark, table).count()
            index_files = len(TX.snapshot_files(table))
            bdf = spark.createDataFrame(mk_batch(base, epoch))
            t0 = time.time()
            handler(bdf, epoch)
            epoch += 1
            wall = time.time() - t0
            results.setdefault(lane, []).append((index_rows, index_files, wall))
            print(
                f"# {lane} @ index {index_rows} rows / {index_files} files: "
                f"{wall:.2f}s epoch ({len(base) / wall / 1000:.1f}K rec/s)",
                file=sys.stderr,
            )
        spark.catalog.clearCache()
        import gc

        gc.collect()
        cal.append(calibration_ms())

    summary = {}
    for name, pts in results.items():
        xs = [math.log(n) for n, _, _ in pts]
        ys = [math.log(w) for _, _, w in pts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        den = sum((x - mx) ** 2 for x in xs)
        alpha = (
            round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den, 3
            )
            if den > 0
            else None  # <2 distinct points (short smoke schedules)
        )
        summary[name] = {
            "alpha_vs_index": alpha,
            "points": [
                {
                    "index_rows": n,
                    "index_files": nf,
                    "epoch_wall_s": round(w, 2),
                }
                for n, nf, w in pts
            ],
        }
        print(json.dumps({"lane": name, **summary[name]}))
    dev, contended = contention_flag(cal)
    print(
        json.dumps(
            {
                "metric": "cdc_epoch_scaling",
                "batch_rows": {
                    k: len(lanes[k][0]) for k in results
                },
                "alphas": {k: v["alpha_vs_index"] for k, v in summary.items()},
                "cal_ms": [int(round(c)) for c in cal],
                "cal_dev": dev,
                "contended": int(contended),
            },
            separators=(",", ":"),
        )
    )
    if should_refuse_contended(cal):  # one ritual, one spelling (bench)
        print("# CONTENDED cdc_probe run — rerun idle", file=sys.stderr)
        sys.exit(3)


if __name__ == "__main__":
    main()
