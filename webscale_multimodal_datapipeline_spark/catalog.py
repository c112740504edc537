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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
