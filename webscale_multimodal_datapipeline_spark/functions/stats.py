"""Shared exact-statistics plan helpers (Spark side; the SQL mirrors live
in ``plans/oracle_fragments.py``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_lower_median(df: DataFrame, col: str | Column) -> DataFrame:
    """1-row DataFrame ``(median)``: the exact LOWER median of the
    non-null values of ``col`` — the ``(n+1)//2``-th order statistic,
    computed from a value-histogram rollup + one bounded-domain
    cumulative window (never a row sort; the histogram is as small as
    the value domain). NULLs are excluded by spec: Spark's cumulative
    window orders them first, DuckDB's last — exclusion is the only
    cross-engine-stable convention (the p_dataset_card null-parity
    lesson)."""
    c = F.col(col) if isinstance(col, str) else col
    hist = (
        df.filter(c.isNotNull())
        .groupBy(c.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tot = hist.agg(F.sum("_c").cast("long").alias("_n"))
    w = Window.orderBy("_v")
    return (
        hist.select("_v", F.sum("_c").over(w).alias("_cum"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("_cum") * 2 >= F.col("_n") + F.pmod(F.col("_n"), F.lit(2)))
        .orderBy("_v")
        .limit(1)
        .select(F.col("_v").alias("median"))
    )
