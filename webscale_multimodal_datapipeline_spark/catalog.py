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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and convert to micros (matches
        # DuckDB's TIMESTAMP_NS → micro truncation in strftime/epoch_us).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer `div`, not `/` — double division of 1e18-scale nanos loses
        # the final microsecond digit.
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
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
