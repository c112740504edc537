"""Settle connected_components_star's second contraction pass (round 9,
VERDICT r8 #2): the round-8 change added a ``repartition("src")`` +
second partition-local union-find between the first contraction and the
star loop — one extra full shuffle of the contracted edge set, bought on
the theory that it hands the loop a graph one merge-round closer to
fixed point. The r8 close bench read 5.48 s for
``d_dedup_components_star`` vs the r7-pinned 3.9-5.3 s band, so the
trade was never shown to pay where it is measured.

This experiment measures the SAME code with the pass forced on/off
(``second_contract=True/False``), interleaved A/B at two shapes:

* the sf0.1 catalog shape (``d_dedup_components_star``'s plan: simhash
  near-pairs over 5K documents -> components), and
* the probe's largest replication point (factor 4, ~20K docs) — the
  point where a contraction that pays would pay most.

Interleaving controls for session drift; medians reported per arm. The
run refuses a contended session exactly like the scaling probe (same
calibration kernel, same env override).

Usage: python tools/pass2_experiment.py [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscale_multimodal_datapipeline_spark.operators import dedup as OD  # noqa: E402
from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402

from bench import calibration_ms, contention_flag, should_refuse_contended  # noqa: E402
from tools.scaling_probe import replicated  # noqa: E402


def star_wall(docs, second_contract: bool) -> float:
    t0 = time.time()
    OD.connected_components_star(
        OD.simhash_near_pairs(docs, max_hamming=12),
        "id_l",
        "id_r",
        edges_distinct=True,
        second_contract=second_contract,
    ).count()
    return time.time() - t0


def run_shape(name: str, docs, reps: int, results: dict) -> None:
    # warm both arms once (codegen, python workers, shuffle services)
    star_wall(docs, True)
    star_wall(docs, False)
    on, off = [], []
    for _ in range(reps):  # interleaved A/B
        on.append(star_wall(docs, True))
        off.append(star_wall(docs, False))
    on.sort(), off.sort()
    results[name] = {
        "on_median_s": round(on[len(on) // 2], 2),
        "off_median_s": round(off[len(off) // 2], 2),
        "on_all": [round(x, 2) for x in on],
        "off_all": [round(x, 2) for x in off],
    }
    print(f"# {name}: pass2 ON {on} vs OFF {off}", file=sys.stderr)


def main() -> None:
    json_out = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires an output path")
        json_out = argv[i + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pass2_experiment")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    cal = [calibration_ms()]
    results: dict = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    run_shape("sf0.1_catalog_shape", docs, reps=3, results=results)
    docs.unpersist()
    cal.append(calibration_ms())

    big, n = replicated(spark, sf_dir, 4)
    run_shape(f"probe_factor4_{n}docs", big, reps=3, results=results)
    big.unpersist()
    cal.append(calibration_ms())

    dev, contended = contention_flag(cal)
    line = {
        "metric": "components_star_pass2_ab",
        "shapes": results,
        "cal_ms": [int(round(c)) for c in cal],
        "cal_dev": dev,
        "contended": int(contended),
    }
    print(json.dumps(line, separators=(",", ":")))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(line, fh, indent=1)
    # one ritual, one spelling (bench.should_refuse_contended)
    if should_refuse_contended(cal):
        print(
            f"# CONTENDED experiment run (cal_dev {dev}) — rerun idle",
            file=sys.stderr,
        )
        sys.exit(3)


if __name__ == "__main__":
    main()
