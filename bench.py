"""Benchmark runner — the driver's per-round performance probe.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-driver count).
A warm-up action first absorbs JVM/codegen startup so numbers reflect
steady-state execution, matching how the reference reports per-operator
throughput after workers are up (``README.md:418-440``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES
from webscale_multimodal_datapipeline_spark.session import get_spark

# Headline set: the queries that exercise scan/join/agg/window/dedup/vector
# machinery hardest at sf0.1 (lineitem 600K, events 100K rows).
BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_order_priority_count",
    "q_top_customers_per_nation",
    "q_running_revenue_by_month",
    "q_supplier_rollup",
    "t_text_stats",
    "t_url_filter",
    "d_exact_dedup",
    "d_minhash_lsh_dedup",
    "d_simhash",
    "v_cosine_topk",
    "v_cosine_dedup",
    "e_tumbling_window",
    "e_sessionization",
    "e_first_event_dedup",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark("bench")

    # Warm up the JVM / parquet footer cache with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        # count() forces full execution of every operator in the plan.
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
