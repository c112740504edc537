"""SparkSession factory.

Tuned for the harness (single JVM, ``local[N]``) but every setting is the
one you'd also want on a real cluster at 100 TB:

- AQE on (runtime coalesce + skew-join splitting) — replaces the reference's
  hand-rolled backpressure/round-robin balancing (``framework/executor.py:
  338-342,462-469``) with Catalyst-native equivalents.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  is per-job sized (AQE coalesces down from a high initial value).
- Arrow enabled — the pandas-UDF boundary is the moral equivalent of the
  reference's Rust batch kernels (batch in / batch out, GIL-free).
- UTC session timezone — deterministic timestamp semantics for the DuckDB
  oracle comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "webscale_multimodal_datapipeline_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime bloom-filter join pruning: when a selective build side
        # can't broadcast (large-large joins — exactly the shapes this
        # engine refuses to hint, q3/q5/q10 customer joins included), the
        # optimizer injects a bloom filter on the probe side's scan. At
        # 100 TB this prunes fact-table shuffle input by the dim-side
        # selectivity; at local scale it's a no-op beyond plan overhead.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
