"""Test-table catalog.

The driver generates a deterministic TPC-H-ish star schema plus pipeline
shaped tables (``documents``, ``embeddings``, ``events``) under
``/root/testdata/sf*/`` (see TESTDATA.md / FIXTURES.md). This module loads
them as DataFrames and registers temp views so queries can be written in
either the DataFrame or SQL API.

Scale note: each table is a single parquet file locally, but nothing here
assumes that — ``spark.read.parquet`` on a directory of thousands of parts
partitions by input split exactly the same way (reference analogue: the
file-list sharding in ``loaders/huggingface_loader.py:42-74`` is what Spark's
FileSourceScanExec does natively).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-timezone TimestampType regardless
    of how the fixture generation wrote it:

    - TIMESTAMP(NANOS) read as long (``nanosAsLong``) → integer ``div`` to
      micros (double division of 1e18-scale nanos loses the final digit),
      matching DuckDB's TIMESTAMP_NS → micro truncation;
    - TIMESTAMP(MICROS) isAdjustedToUTC=false → TIMESTAMP_NTZ → cast to
      TimestampType (value-preserving under the UTC session timezone);
    - already TimestampType → no-op.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _spread_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Scan-parallelism floor for the local single-file fixtures (r10,
    guide §2.5/§6: input skew — "one huge unsplittable file ... repartition
    immediately after the read").

    A 100-TB table arrives as thousands of input splits and the scan
    parallelizes natively; the local fixture is ONE single-row-group
    parquet file per table, so every pre-shuffle per-row kernel (shingle
    md5s, gram hashing, winnow windows) runs on ONE core of the session's
    N. When — and only when — the planned scan has fewer splits than the
    session has cores, spread it with a round-robin repartition
    (deterministic under sort-before-repartition). On a real multi-split
    table the condition is false and NO exchange is added, so this is
    scale-adaptive, not a local[32] constant: the repartition width is
    ``defaultParallelism``, never a hard-coded count.

    OPT-IN per query (``load_table(..., spread=True)``), never blanket:
    the r10 A/B sweep (tools/ab_spread.py, idle box, min of 3) shows the
    exchange only pays for itself where an expensive per-row kernel runs
    BEFORE the first shuffle — shingle/gram/minhash explode pipelines
    (d_shared_shingle 1.91→1.28, d_minhash_lsh 1.56→1.11, x_countmin
    1.45→1.14, d_dup_span_detect 2.17→1.42, t_winnowing_fingerprint
    1.30→0.65) — and consistently LOSES on narrow column-pruned scans
    whose first exchange is the join/groupBy itself (q1 0.77→1.03,
    q8 1.00→1.58, d_exact_dedup 0.32→0.57, t_gopher_rules 0.60→0.76,
    e_attribution 0.52→0.81, g_bfs_hops 2.55→3.00).

    ``SPARK_GRAFT_NO_SCAN_SPREAD=1`` restores the raw scan (A/B knob)."""
    if os.environ.get("SPARK_GRAFT_NO_SCAN_SPREAD", "") not in ("", "0"):
        return df
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    if "://" in sf_dir:
        # Remote catalog root (hf://datasets/..., s3://...): enumerate via
        # the fsspec listing hook (sources/files.py, gated on fsspec being
        # installed) and read through the format dispatcher. The driver's
        # local fixtures never take this path; a real deployment pointing
        # the engine at a hosted dataset repo does.
        from webscale_multimodal_datapipeline_spark.sources.files import read_dataset

        df = read_dataset(spark, sf_dir, pattern=f"{name}*.parquet")
        return normalize_events_ts(df) if name == "events" else df
    if name == "events":
        # Tolerate either fixture generation (nanos-as-long or micros).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _spread_scan(spark, df) if spread else df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
