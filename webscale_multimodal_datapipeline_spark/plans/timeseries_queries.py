"""Time-series / hypertable-style queries over ``events``: multi-resolution
rollup ladders (continuous-aggregate semantics), bucketized range joins,
and gap-tolerant diagnostics — operators the reference lacks but a
training-data pipeline's telemetry layer needs (SURVEY §2.6 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table

DEC = "decimal(18,6)"


def ts_rollup_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup ladder: raw → minute → hour → day, each level
    RE-AGGREGATED from the previous (not from raw). Returning the day
    level proves the whole ladder: exact decimal sums make
    sum-of-sums ≡ direct aggregation, which is what the oracle computes.

    At scale each level is a materialized continuous aggregate ~60x
    smaller than its input; re-aggregating the previous level instead of
    raw is the difference between scanning 100 TB and scanning 2 GB.
    """
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    return day.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("v"), 4).cast("double").alias("total_value"),
    )


TS_ROLLUP_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketized: join lineitem rows to quantity bands
    [1-10], [11-20], ... via an EQUI-join on a computed band id instead of
    a theta join (``l_quantity BETWEEN lo AND hi`` as a join condition
    would be a broadcast-nested-loop — quadratic at scale; the bucket
    trick makes it a hash join)."""
    l = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(i, i * 10 + 1, (i + 1) * 10, f"{i * 10 + 1}-{(i + 1) * 10}") for i in range(5)],
        "band_id int, lo int, hi int, band string",
    )
    with_band = l.withColumn(
        "band_id", F.floor((F.col("l_quantity") - 1) / 10).cast("int")
    )
    return (
        with_band.join(F.broadcast(bands), "band_id")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("revenue"),
        )
    )


TS_RANGE_SQL = """
SELECT band, COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN (
  SELECT * FROM (VALUES (1, 10, '1-10'), (11, 20, '11-20'), (21, 30, '21-30'),
                        (31, 40, '31-40'), (41, 50, '41-50')) AS b(lo, hi, band)
) ON l_quantity BETWEEN lo AND hi
GROUP BY band
"""


def ts_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest inter-event gap per user (lag diagnostics — stream-health
    shape). Gap in seconds, exact integer micros arithmetic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        ev.withColumn("_gap", gap_us)
        .groupBy("user_id")
        .agg(
            F.max("_gap").alias("max_gap_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


TS_GAPS_SQL = """
SELECT user_id, MAX(gap) AS max_gap_us, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
GROUP BY user_id
"""


QUERIES = {
    "ts_rollup_ladder": ts_rollup_ladder,
    "ts_range_join": ts_range_join,
    "ts_event_gaps": ts_event_gaps,
}

ORACLE = {
    "ts_rollup_ladder": TS_ROLLUP_SQL,
    "ts_range_join": TS_RANGE_SQL,
    "ts_event_gaps": TS_GAPS_SQL,
}
