"""A/B the scan-spread knob query-by-query in ONE session.

Usage: python tools/ab_spread.py [sf_dir] query [query ...]

For each query: warm-up + 3 timed count() passes with
SPARK_GRAFT_NO_SCAN_SPREAD=1 (off), then the same with it unset (on).
The env flag is read at plan-build time, so both arms share the session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES  # noqa: E402
from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402


def run(spark, fn, sf_dir, passes=3):
    ts = []
    for i in range(passes + 1):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        if i > 0:
            ts.append(dt)
    return min(ts), ts


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    names = argv[1:] if argv and os.path.isdir(argv[0]) else argv
    spark = get_spark("ab")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        fn = QUERIES[name]
        os.environ["SPARK_GRAFT_NO_SCAN_SPREAD"] = "1"
        off, off_ts = run(spark, fn, sf_dir)
        os.environ["SPARK_GRAFT_NO_SCAN_SPREAD"] = ""
        on, on_ts = run(spark, fn, sf_dir)
        verdict = "SPREAD WINS" if on < off else "raw wins"
        print(
            f"{name}: off {off:.3f} {[round(t,2) for t in off_ts]}"
            f" | on {on:.3f} {[round(t,2) for t in on_ts]}  -> {verdict}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
