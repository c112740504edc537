"""Sinks (reference ``writers/`` — W1 parquet, W2 Iceberg, W3 rejected).

W1 parquet semantics (``writers/parquet_writer.py:20-162``): snappy,
dictionary encoding, unique part files, optional hive partitioning with
dotted-path keys — all native ``df.write`` behavior; the dotted-path
partition key becomes a struct-field projection.

W2 Iceberg (``writers/iceberg_writer.py``): the reference buffers parquet
under a table path and skips the actual catalog; Spark does it properly
via ``writeTo`` — but the Iceberg runtime jars are not in this container,
so the connector is gated behind a capability check (SURVEY §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.operators.base import REJECTION_COL


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
    row_group_size: int = 50_000,
) -> None:
    """W1: snappy parquet append with unique task-attempt part names
    (Spark's native naming replaces ``part_{ts}_{uuid}`` uniqueness,
    ``parquet_writer.py:144-158``)."""
    w = (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("parquet.block.size", row_group_size * 128)
    )
    if partition_by:
        # dotted paths (e.g. "_rejection_details.operator") become columns
        # first — the reference's nested partition-key extractor
        # (parquet_writer.py:57-93)
        cols = []
        out = df
        for p in partition_by:
            if "." in p:
                flat = p.replace(".", "_")
                out = out.withColumn(flat, F.col(p))
                cols.append(flat)
            else:
                cols.append(p)
        w = (
            out.write.mode(mode)
            .option("compression", "snappy")
            .partitionBy(*cols)
        )
    w.parquet(path)


def write_rejected(rejected: DataFrame, path: str, mode: str = "append") -> None:
    """W3: rejected-samples sink partitioned by rejecting operator
    (``framework/executor.py:100-124``)."""
    (
        rejected.withColumn("operator", F.col(f"{REJECTION_COL}.operator"))
        .write.mode(mode)
        .partitionBy("operator")
        .option("compression", "snappy")
        .parquet(path)
    )


def iceberg_available(spark) -> bool:
    """True if an Iceberg catalog is usable in this session."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_iceberg(df: DataFrame, table: str) -> None:
    """W2: real Iceberg append (ACID commit, schema evolution — what the
    reference's writer only gestures at, ``iceberg_writer.py:118-142``).
    Requires iceberg-spark-runtime on the classpath."""
    if not iceberg_available(df.sparkSession):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath in this container; "
            "configure spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "and retry. Parquet sink (write_parquet) is the supported path here."
        )
    df.writeTo(table).append()


def write_jsonl(df: DataFrame, path: str, mode: str = "append", compression: str | None = "gzip") -> None:
    """JSONL sink (the interchange format HF datasets / most curation
    tooling consume). One JSON object per line per row; binary columns
    are base64 (Spark's JSON writer convention)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "append", header: bool = True
) -> None:
    """CSV sink for flat exports; nested/array columns must be projected
    or serialized first (CSV is flat by definition — fail loudly rather
    than silently stringify)."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise ValueError(
            f"CSV cannot represent nested columns {bad}; project or to_json them first"
        )
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ``ceil(rows / target)`` evenly-sized files. The operational fix for
    streaming/append sinks that accumulate thousands of tiny parts (each
    part costs a task + a footer read downstream).

    Row-count-based sizing keeps this a metadata-cheap two-pass job:
    ``count()`` reads footers only, and the rewrite is one narrow
    ``repartition``. Returns the number of output files written.
    """
    import math

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(out_path)
    return n_files
