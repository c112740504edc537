"""Per-query profiling harness for the optimization rounds (guide §1).

Runs named registry queries in one Spark session: a warm-up pass, then N
timed passes through the noop sink (computes every column, no driver
collect — guide §1.4), labelled via setJobDescription. Optionally dumps
``explain("formatted")`` to a file per query.

Usage:
    python tools/profile_query.py [--explain-dir DIR] [--suffix S]
        [--passes N] [--count] [sf_dir] query [query ...]

``--count`` times ``df.count()`` instead of the noop sink — the bench's
statistic, for apples-to-apples comparison with BENCH records.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import steal_pct, steal_snapshot  # noqa: E402
from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES  # noqa: E402
from webscale_multimodal_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    explain_dir = None
    suffix = "before"
    passes = 3
    use_count = False
    while argv and argv[0].startswith("--"):
        if argv[0] == "--explain-dir":
            explain_dir = argv[1]
            argv = argv[2:]
        elif argv[0] == "--suffix":
            suffix = argv[1]
            argv = argv[2:]
        elif argv[0] == "--passes":
            passes = int(argv[1])
            argv = argv[2:]
        elif argv[0] == "--count":
            use_count = True
            argv = argv[1:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    if argv and os.path.isdir(argv[0]):
        sf_dir = argv[0]
        names = argv[1:]
    else:
        sf_dir = "/root/testdata/sf0.1"
        names = argv
    spark = get_spark("profile")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in names:
        fn = QUERIES[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            path = os.path.join(explain_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"# wrote {path}", file=sys.stderr)
        ts = []
        steals = []
        for i in range(passes + 1):  # pass 0 = warm-up
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            s0 = steal_snapshot()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if use_count:
                n = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            dt = time.perf_counter() - t0
            if i > 0:
                ts.append(dt)
                # per-pass hypervisor steal (r11): this host's contention
                # arrives in bursts invisible to loadavg/calibration —
                # discard stolen passes when reading an A/B.
                steals.append(steal_pct(s0, steal_snapshot()))
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min {min(ts):.3f}s  passes {[round(t, 3) for t in ts]}"
            f"  steal {steals}  rows {n}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
