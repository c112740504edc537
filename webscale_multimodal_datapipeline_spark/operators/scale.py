"""Scale patterns: skew-aware joins, co-location, partition sizing.

These are the techniques a 1000-executor / 100 TB deployment of this
engine leans on (SURVEY §4). AQE handles most skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); explicit
salting remains necessary when ONE key dominates a shuffle *aggregation*
or when joining two large tables both skewed on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe large-large equi-join: salt the left side's hot keys by
    exploding the right side ``salt_buckets`` ways.

    left gets a random-ish but DETERMINISTIC salt (hash of all columns mod
    buckets — reproducible, no rand()); right is replicated per salt. The
    shuffle then spreads the hot key over ``salt_buckets`` partitions.
    Cost: right side is duplicated — use only when right is the smaller of
    two unbroadcastable sides and the key histogram is known-skewed.
    """
    lcols = [F.col(c) for c in left.columns]
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*lcols), F.lit(salt_buckets)).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_l.join(salted_r, [key, "_salt"], how)
    return out.drop("_salt")


def co_partition(left: DataFrame, right: DataFrame, key: str, partitions: int):
    """Pre-shuffle both sides identically so a subsequent join is a
    zero-exchange zip of co-located partitions (the manual form of
    bucketing when no metastore table is available)."""
    return (
        left.repartition(partitions, key),
        right.repartition(partitions, key),
    )


def sized_repartition(df: DataFrame, target_rows_per_partition: int = 1_000_000) -> DataFrame:
    """Row-count-aware repartition: derive the partition count from an
    approximate cardinality instead of guessing (spill-aware sizing —
    SURVEY 'size shuffle partitions so partitions fit in memory')."""
    n = df.select(F.count(F.lit(1))).first()[0]
    parts = max(1, (n + target_rows_per_partition - 1) // target_rows_per_partition)
    return df.repartition(int(parts))


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnostic: top-N key frequencies + share of total — run this
    before choosing salt_buckets."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(total))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    THE 100 TB co-location pattern: two tables bucketed by the same key
    into the same bucket count join with ZERO exchange — the shuffle was
    paid once at write time and amortized over every later join. (The
    reference's ``hash(key) % num_buckets`` dedup sharding,
    ``framework/backend.py:134-138``, is this exact layout.)
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed saved tables (no exchange; sort elided too
    when both sides were written sorted)."""
    return spark.table(left_table).join(spark.table(right_table), key)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-column data layout for file skipping
# ---------------------------------------------------------------------------


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """Morton interleave of ``bits`` low bits per column (column j's bit i
    lands at position ``i * n_cols + j``) — one codegen'd integer
    expression, no UDF.

    Z-ordering is how lakehouse tables (Delta OPTIMIZE ZORDER, Iceberg
    sort orders) get min/max file-skipping on MULTIPLE filter columns at
    once: neighbors in key space are neighbors in every dimension, so a
    range-partitioned write clusters all ``cols`` simultaneously.
    """
    n = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c).cast("long")
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """DuckDB mirror of ``zorder_key`` (kept in lockstep by construction)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, cols: list[str], partitions: int, bits: int = 8
) -> DataFrame:
    """Range-partition + locally sort by the Morton key: the write-side
    layout pass. Each output file then covers a compact hyper-rectangle of
    the key space, so parquet min/max stats prune on any of ``cols``."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    return keyed.repartitionByRange(partitions, "_zkey").sortWithinPartitions(
        "_zkey"
    )
