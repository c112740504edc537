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
