"""Event-stream queries over ``events`` (SURVEY §2.9: the streaming
extension surface, expressed in batch form here; ``streaming/`` runs the
same logic with readStream + watermarks).

Covers: tumbling & sliding event-time windows, sessionization (lag +
gap-cumsum — the batch analog of ``session_window``), JSON extraction
(reference's dotted-path JSON partition keys, ``parquet_writer.py:69-87``),
first-event-per-key dedup (batch analog of
``dropDuplicatesWithinWatermark``), and funnel-style metrics aggregation
(``metrics/reporter.py:689-701``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table

DEC = "decimal(18,6)"
SESSION_GAP_MIN = 30


def e_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window: count + value sum per (window, event_type).
    NULL-ts events are excluded by spec — Spark's ``window()`` drops them
    implicitly, DuckDB's ``date_trunc`` would keep a NULL group; the
    explicit filter on both sides IS the cross-engine semantics (pinned
    by the events null-parity sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 4).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


E_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


def e_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes: count per (window, type).
    Each event lands in 2 windows (epoch-aligned, Spark ``window()``
    semantics). NULL-ts events excluded by spec (the e_tumbling_window
    convention)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


E_SLIDING_SQL = """
WITH slid AS (
  SELECT event_type,
         unnest([
           to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
           to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
         ]) AS wstart
  FROM events WHERE ts IS NOT NULL
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n
FROM slid GROUP BY 1, 2
"""


def e_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when gap to previous event (per user)
    exceeds 30 min. Batch analog of ``session_window(ts, '30 minutes')``.
    Returns per-user session count + event count. NULL-ts events carry
    no session position and are excluded by spec (the e_session_window
    convention — events null-parity sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = F.when(
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
        > SESSION_GAP_MIN * 60,
        1,
    ).otherwise(0)
    return (
        ev.withColumn("_new_session", gap_flag)
        .groupBy("user_id")
        .agg(
            (F.sum("_new_session") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


E_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id,
       CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


def e_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the ``props`` column (reference's
    dotted-path JSON partition-key extractor, ``parquet_writer.py:69-87``):
    sum of ``$.k`` per event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        F.count(k).alias("k_present"),
    )


E_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       COUNT(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k')) AS k_present
FROM events GROUP BY event_type
"""


def e_first_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user_id, event_type) — the batch analog of
    streaming ``dropDuplicatesWithinWatermark`` (stateful dedup D3);
    deterministic winner by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        )
    )


E_FIRST_SQL = """
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
"""


def e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel/metrics-report aggregation (reference
    ``metrics/reporter.py:689-701``): per event_type totals + value stats."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast(DEC)), 4).cast("double").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


E_FUNNEL_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


QUERIES = {
    "e_tumbling_window": e_tumbling_window,
    "e_sliding_window": e_sliding_window,
    "e_sessionization": e_sessionization,
    "e_json_extract": e_json_extract,
    "e_first_event_dedup": e_first_event_dedup,
    "e_funnel": e_funnel,
}

ORACLE = {
    "e_tumbling_window": E_TUMBLING_SQL,
    "e_sliding_window": E_SLIDING_SQL,
    "e_sessionization": E_SESSION_SQL,
    "e_json_extract": E_JSON_SQL,
    "e_first_event_dedup": E_FIRST_SQL,
    "e_funnel": E_FUNNEL_SQL,
}


# ---------------------------------------------------------------------------
# Retention cohorts (product-analytics staple; SURVEY §2.6 extension)
# ---------------------------------------------------------------------------


def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by first-activity day,
    counted by day-offset of each later active day. Two grouped
    aggregations + a broadcast-size cohort map (distinct users is
    bounded-small relative to events; at larger user counts the join
    flips to a plain hash join on the same plan)."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    return (
        active.join(first_day, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .groupBy(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"))
        .pivot("day_offset", list(range(0, 7)))
        .agg(F.count(F.lit(1)))
        .select(
            "cohort",
            *[
                F.coalesce(F.col(str(i)), F.lit(0)).cast("bigint").alias(f"d{i}")
                for i in range(0, 7)
            ],
        )
    )


E_RETENTION_SQL = """
WITH first_day AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), offs AS (
  SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
         datediff('day', f.cohort_day, a.day) AS day_offset
  FROM active a JOIN first_day f USING (user_id)
)
SELECT cohort,
       COUNT(*) FILTER (WHERE day_offset = 0) AS d0,
       COUNT(*) FILTER (WHERE day_offset = 1) AS d1,
       COUNT(*) FILTER (WHERE day_offset = 2) AS d2,
       COUNT(*) FILTER (WHERE day_offset = 3) AS d3,
       COUNT(*) FILTER (WHERE day_offset = 4) AS d4,
       COUNT(*) FILTER (WHERE day_offset = 5) AS d5,
       COUNT(*) FILTER (WHERE day_offset = 6) AS d6
FROM offs GROUP BY cohort
"""

QUERIES["e_retention_cohorts"] = e_retention_cohorts
ORACLE["e_retention_cohorts"] = E_RETENTION_SQL


def e_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per-user event sequences (ordered by
    ts, event_id) → (from_type, to_type) counts and row-normalized
    transition probabilities — the Markov-chain summary behind
    next-action analytics and session-path mining.

    One window (partitioned by user — never global) + one aggregate;
    the output is |event_types|² rows, bounded regardless of corpus
    size. Probability = n / total(from_type): both engines compute the
    identical double division before the 6-dp round.

    Events without a timestamp or a type carry no position / no state in
    the chain and are excluded by spec on BOTH sides (a NULL ts would
    otherwise sort first in Spark's sequence window but last in DuckDB's,
    silently flipping which transition exists — events null-parity
    sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("prob"),
    )


E_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
), pairs AS (
  SELECT event_type AS from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
FROM pairs
"""

QUERIES["e_markov_transitions"] = e_markov_transitions
ORACLE["e_markov_transitions"] = E_MARKOV_SQL


def e_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: derive each user's
    "tier" (``$.k`` quartile bucket) from the event stream, collapse
    consecutive runs into validity intervals ``[effective_from,
    effective_to)`` with an ``is_current`` flag — the standard
    gaps-and-islands SCD2 construction every warehouse pipeline runs to
    version dimension attributes from an event log.

    Two user-partitioned windows (lag to mark changes, lead to close
    intervals) and no self-join; at 100 TB the user partitioning is the
    shuffle key and rows-per-user stays bounded by the change count,
    not the event count."""
    ev = load_table(spark, sf_dir, "events")
    tier = (F.get_json_object("props", "$.k").cast("bigint") / F.lit(25)).cast(
        "bigint"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", tier.alias("tier"))
        .withColumn("_prev", F.lag("tier").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("tier")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "tier",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("effective_from"),
        F.date_format(F.lead("ts").over(wc), "yyyy-MM-dd HH:mm:ss").alias(
            "effective_to"
        ),
        F.lead("ts").over(wc).isNull().alias("is_current"),
    )


E_SCD2_SQL = """
WITH tiers AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT) // 25 AS tier
  FROM events
), marked AS (
  SELECT user_id, ts, event_id, tier,
         LAG(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM tiers
), changes AS (
  SELECT user_id, ts, event_id, tier FROM marked
  WHERE prev IS NULL OR prev <> tier
)
SELECT user_id, tier,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS effective_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS effective_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
"""

QUERIES["e_scd2_dimension"] = e_scd2_dimension
ORACLE["e_scd2_dimension"] = E_SCD2_SQL


# ---------------------------------------------------------------------------
# Top-k 3-step paths (session-path mining, one order up from Markov pairs)
# ---------------------------------------------------------------------------


def e_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event paths: every consecutive event-type triple
    in a user's (ts, event_id)-ordered stream, counted corpus-wide — the
    path-mining view that pair transitions (``e_markov_transitions``)
    cannot show (A→B→A loops vs A→B→C progressions).

    One per-user window (two leads in the SAME window spec — a single
    WindowExec), one count aggregate over a bounded key space
    (|event_types|³), then a top-k over that already-tiny aggregate.
    Ranking is exact-integer with a lexicographic tie-break, so the
    result set is deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    # the global window runs over the |event_types|^3-bounded aggregate,
    # never over raw events — same shape as the report-layer top-k's
    return (
        paths.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 20)
        .select("rank", "path", "n")
    )


E_TRIGRAM_SQL = """
WITH seq AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
), paths AS (
  SELECT concat(t1, '>', t2, '>', t3) AS path, COUNT(*) AS n
  FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY 1
)
SELECT rank, path, n FROM (
  SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS rank
  FROM paths
) WHERE rank <= 20
"""

QUERIES["e_trigram_paths"] = e_trigram_paths
ORACLE["e_trigram_paths"] = E_TRIGRAM_SQL


# ---------------------------------------------------------------------------
# Sweep-line concurrency (interval overlap WITHOUT a self-join)
# ---------------------------------------------------------------------------


def e_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event occupies the
    half-open interval [ts, ts+5min); the maximum number of
    simultaneously open intervals is found with a SWEEP-LINE — explode
    each event into a +1 (start) and -1 (end) delta, running-sum the
    deltas in time order, take the max. The naive formulation is an
    interval self-join (O(n²) on hot windows); the sweep is one sort.

    Scale shape: the running sum uses the deciles/tokenize-ids pattern
    (range-repartition on the global sort key → per-(partition, type)
    local window → broadcast per-partition offsets from a P×T-row
    histogram with a triangular prefix join) — no data-sized
    single-partition WindowExec anywhere. The sort key includes
    event_id, making the order TOTAL, so local RANGE frames equal ROWS
    frames and partition boundaries cannot split tie groups. Ends sort
    before starts at the same instant (half-open semantics: a touch is
    not an overlap). NULL-ts events have no interval and NULL-type
    events no lane; both excluded by spec (the Spark sweep's typed
    partitioning drops the NULL-type group where DuckDB keeps it —
    events null-parity sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("d"), "event_id"
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("d"),
        "event_id",
    )
    deltas = starts.unionByName(ends)
    # scale-adaptive range-partition width (r10): the sweep's offsets
    # correction is partition-count-invariant, so derive the width from
    # the session instead of pinning the local core count
    num_parts = spark.sparkContext.defaultParallelism
    ranged = deltas.repartitionByRange(
        num_parts,
        F.col("event_type").asc(),
        F.col("t").asc(),
        F.col("d").asc(),
        F.col("event_id").asc(),
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    # Materialized ONCE (round 8, found by the sf1 sweep): the range
    # exchange's boundary sampling is not guaranteed identical across
    # the plan's branches, so hist/offsets and the window could see
    # DIFFERENT _pid assignments — global ranks then collide/gap and
    # the buckets go uneven. Freezing the ranged frame makes every
    # branch read the same partition assignment (and saves the second
    # corpus shuffle the window branch otherwise re-runs).
    hist = ranged.groupBy("_pid", "event_type").agg(F.sum("d").alias("_s"))
    offs = (
        hist.alias("l")
        .join(
            hist.alias("r"),
            (F.col("r._pid") < F.col("l._pid"))
            & (F.col("r.event_type") == F.col("l.event_type")),
            "left",
        )
        .groupBy(F.col("l._pid").alias("_pid"), F.col("l.event_type").alias("event_type"))
        .agg(F.coalesce(F.sum("r._s"), F.lit(0)).alias("_off"))
    )
    wl = Window.partitionBy("_pid", "event_type").orderBy(
        F.col("t").asc(), F.col("d").asc(), F.col("event_id").asc()
    )
    running = (
        ranged.withColumn("_run", F.sum("d").over(wl))
        .join(F.broadcast(offs), ["_pid", "event_type"])
        .withColumn("_conc", F.col("_run") + F.col("_off"))
    )
    return running.groupBy("event_type").agg(
        F.max("_conc").cast("bigint").alias("max_concurrent")
    )


E_CONCURRENCY_SQL = """
WITH typed AS (
  SELECT event_type, ts, event_id FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
), deltas AS (
  SELECT event_type, ts AS t, 1 AS d, event_id FROM typed
  UNION ALL
  SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS d, event_id FROM typed
), swept AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type
                      ORDER BY t, d, event_id
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
)
SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM swept GROUP BY event_type
"""

QUERIES["e_concurrency_sweep"] = e_concurrency_sweep
ORACLE["e_concurrency_sweep"] = E_CONCURRENCY_SQL


# ---------------------------------------------------------------------------
# Volume-spike detection (z-score in exact integer arithmetic)
# ---------------------------------------------------------------------------


def e_spike_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly flags per event type: an hour is a SPIKE
    when its count sits more than 2 sample standard deviations above
    the type's hourly mean. The z-test is evaluated in EXACT integer
    arithmetic — ``(n·c - S)² · (n-1) > 4 · n · (n·SS - S²)`` with
    S = Σc, SS = Σc² as bigints AND the one-sided c·n > S condition —
    so the flag is bit-identical cross-engine (no float stddev whose
    summation order differs between engines).

    Scale shape: hourly rollup (map-side combinable), then per-type
    scalar stats joined back — the stats table is bounded by the number
    of types, and hours scale with TIME, not corpus size.

    The scoring step is factored as ``spike_flags_over_hourly`` so the
    streaming lift (``streaming/pipeline.py``: watermarked rollup →
    txtable MERGE → the SAME scorer) shares one algorithm — integer
    exactness makes batch/streaming parity bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("_h")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    return spike_flags_over_hourly(hourly)


def spike_flags_over_hourly(hourly: DataFrame) -> DataFrame:
    """Exact-integer spike test over an hourly rollup with columns
    ``(event_type, _h timestamp, cnt)`` — the shared batch/streaming
    scorer (see ``e_spike_zscore``)."""
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("cnt").alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("_ss"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    dev = F.col("_n") * F.col("cnt") - F.col("_s")
    var_num = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    is_spike = (
        (F.col("_n") > 1)
        & (dev > 0)
        & (dev * dev * (F.col("_n") - 1) > F.lit(4) * F.col("_n") * var_num)
    )
    return j.select(
        "event_type",
        F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("cnt").cast("bigint").alias("cnt"),
        is_spike.alias("is_spike"),
    )


E_SPIKE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt * cnt) AS ss
  FROM hourly GROUP BY 1
)
SELECT hourly.event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(cnt AS BIGINT) AS cnt,
       (n > 1 AND (n * cnt - s) > 0
        AND (n * cnt - s) * (n * cnt - s) * (n - 1) > 4 * n * (n * ss - s * s))
       AS is_spike
FROM hourly JOIN stats ON hourly.event_type = stats.event_type
"""

QUERIES["e_spike_zscore"] = e_spike_zscore
ORACLE["e_spike_zscore"] = E_SPIKE_SQL


# ---------------------------------------------------------------------------
# Native session_window operator (the streaming-ready sessionization form)
# ---------------------------------------------------------------------------


def e_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE ``session_window`` operator — the same
    grouping expression runs unchanged under ``readStream`` with a
    watermark (``streaming/pipeline.py`` runs the tumbling analog), which
    is the point: one session definition for batch backfill AND the live
    stream. Complements ``e_sessionization`` (the lag+cumsum islands form):
    Spark merges windows when the gap to the previous event is ≤ gap
    (strictly greater starts a new session — verified empirically; the
    islands oracle uses the same ``>`` cut).

    Per-user output: session count, event count, and the largest session's
    event count. Scale shape: session merge happens inside one
    UpdatingSessionsExec pass after a single shuffle on user_id; the
    per-user rollup reuses that partitioning (no second exchange on a
    different key). NULL-ts events are excluded by spec — Spark's
    session_window drops them implicitly, the oracle's islands logic
    would keep them (events null-parity sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    ).agg(F.count(F.lit(1)).alias("_n_ev"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("_n_ev").alias("n_events"),
            F.max("_n_ev").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


E_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
), numbered AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_ev
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(n_ev) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["e_session_window"] = e_session_window
ORACLE["e_session_window"] = E_SESSION_WINDOW_SQL


def e_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-delay distribution: per user, the gap between the FIRST
    view and the first purchase at-or-after it. The funnel metric
    (``e_funnel``) counts who converts; this measures HOW LONG — the
    number an activation team actually tracks.

    Scale shape: one conditional aggregate per user (min ts per type —
    map-side combinable, no self-join), then a bounded scalar rollup.
    Delays are exact integer microseconds; the average is decimal-rounded
    so both engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("_first_view"),
    )
    # first purchase at-or-after the first view: join back the purchase
    # stream (filter pushed to the scan), min per user
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("_pts")
    )
    conv = (
        per_user.filter(F.col("_first_view").isNotNull())
        .join(purchases, "user_id")
        .filter(F.col("_pts") >= F.col("_first_view"))
        .groupBy("user_id", "_first_view")
        .agg(F.min("_pts").alias("_first_purchase"))
    )
    delay_us = (
        F.unix_micros("_first_purchase") - F.unix_micros("_first_view")
    )
    viewed = per_user.filter(F.col("_first_view").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_viewed")
    )
    stats = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round((F.avg(delay_us.cast("decimal(28,6)")) / 1_000_000), 4)
        .cast("double")
        .alias("avg_delay_sec"),
        (F.max(delay_us) / 1_000_000).cast("double").alias("max_delay_sec"),
    )
    return viewed.crossJoin(stats).select(
        F.col("n_viewed").cast("long").alias("n_viewed"),
        F.col("n_converted").cast("long").alias("n_converted"),
        "avg_delay_sec",
        "max_delay_sec",
    )


E_TIME_TO_CONVERT_SQL = """
WITH fv AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
), conv AS (
  SELECT f.user_id, f.first_view, MIN(e.ts) AS first_purchase
  FROM fv f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.first_view
  WHERE f.first_view IS NOT NULL
  GROUP BY f.user_id, f.first_view
), delays AS (
  SELECT epoch_us(first_purchase) - epoch_us(first_view) AS d_us FROM conv
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv WHERE first_view IS NOT NULL) AS n_viewed,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(ROUND(AVG(CAST(d_us AS DECIMAL(28,6))) / 1000000, 4) AS DOUBLE) AS avg_delay_sec,
       CAST(MAX(d_us) / 1000000 AS DOUBLE) AS max_delay_sec
FROM delays
"""

QUERIES["e_time_to_convert"] = e_time_to_convert
ORACLE["e_time_to_convert"] = E_TIME_TO_CONVERT_SQL


def e_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every user bucketed by Recency (days since last
    activity, vs the corpus max timestamp), Frequency (event count) and
    Monetary (exact-decimal value sum) into fixed, documented thresholds —
    fixed cutoffs rather than per-run quantiles so segments are COMPARABLE
    across runs (and the plan needs no global sort/ntile window: one
    user-keyed aggregate, then a bounded 3x3x3 rollup)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("_anchor"))
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("_last"),
        F.count(F.lit(1)).alias("_freq"),
        F.sum(F.col("value").cast(DEC)).alias("_spend"),
    )
    days = F.floor(
        (F.unix_micros("_anchor") - F.unix_micros("_last"))
        / F.lit(86_400_000_000)
    )
    r = F.when(days < 1, "active").when(days < 2, "cooling").otherwise("dormant")
    f_ = (
        F.when(F.col("_freq") >= 70, "heavy")
        .when(F.col("_freq") >= 55, "regular")
        .otherwise("light")
    )
    m = (
        F.when(F.col("_spend") >= 4000, "high")
        .when(F.col("_spend") >= 2500, "mid")
        .otherwise("low")
    )
    return (
        per_user.crossJoin(anchor)
        .select(r.alias("recency"), f_.alias("frequency"), m.alias("monetary"))
        .groupBy("recency", "frequency", "monetary")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


E_RFM_SQL = """
WITH anchor AS (SELECT MAX(ts) AS a FROM events),
pu AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
         SUM(CAST(value AS DECIMAL(18,6))) AS spend
  FROM events GROUP BY user_id
), seg AS (
  SELECT CASE WHEN FLOOR((epoch_us(a) - epoch_us(last_ts)) / 86400000000) < 1 THEN 'active'
              WHEN FLOOR((epoch_us(a) - epoch_us(last_ts)) / 86400000000) < 2 THEN 'cooling'
              ELSE 'dormant' END AS recency,
         CASE WHEN freq >= 70 THEN 'heavy' WHEN freq >= 55 THEN 'regular' ELSE 'light' END AS frequency,
         CASE WHEN spend >= 4000 THEN 'high' WHEN spend >= 2500 THEN 'mid' ELSE 'low' END AS monetary
  FROM pu CROSS JOIN anchor
)
SELECT recency, frequency, monetary, CAST(COUNT(*) AS BIGINT) AS n_users
FROM seg GROUP BY 1, 2, 3
"""

QUERIES["e_rfm_segments"] = e_rfm_segments
ORACLE["e_rfm_segments"] = E_RFM_SQL


def e_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day — active users, NEW users (first-ever
    activity that day), returning users, and the cumulative user base.
    New-vs-returning comes from the first-seen-day trick (min(day) per
    user, one aggregate) instead of a distinct-over-growing-window,
    which at 100 TB is the difference between one user-keyed shuffle and
    a quadratic re-scan per day. The cumulative sum runs on the
    DAY-keyed rollup — rows bounded by the calendar, not the data.
    NULL-ts events carry no activity day and are excluded by spec (a
    NULL "day" would land first in Spark's cumsum ordering but last in
    DuckDB's — events null-parity sweep)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )
    dau = ev.groupBy("day").agg(F.countDistinct("user_id").alias("active_users"))
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    new_users = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(new_users, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn("returning_users", F.col("active_users") - F.col("new_users"))
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_users",
            "new_users",
            "returning_users",
            "cumulative_users",
        )
    )


E_GROWTH_SQL = """
WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events
            WHERE ts IS NOT NULL),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS active_users FROM ev GROUP BY day),
fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.active_users AS BIGINT) AS active_users,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(d.active_users - COALESCE(n.new_users, 0) AS BIGINT) AS returning_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
FROM dau d LEFT JOIN nu n USING (day)
"""

QUERIES["e_growth_accounting"] = e_growth_accounting
ORACLE["e_growth_accounting"] = E_GROWTH_SQL


def e_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — the rolling 7-day distinct-user count, EXACTLY.

    Rolling COUNT(DISTINCT) is the canonical "can't window it" aggregate
    (distinct doesn't decompose over sliding frames). The scale-correct
    exact form is the BOUNDED FANOUT: reduce events to distinct
    (user, day) pairs first (the only full-data shuffle), then each pair
    contributes to exactly the 7 target days it can influence — a 7x
    fanout of the *compact* pair table, never of the event stream —
    followed by one more distinct count per target day. At 100 TB the
    sketch tier (``x_hll_merge``) answers the same question approximately
    with mergeable per-day state; this query is the exact oracle of that
    rollup. Stickiness is emitted in exact basis points (integer
    10000*dau DIV wau) so the ratio is bit-identical cross-engine.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    ud = ev.select("day", "user_id").distinct()
    fan = ud.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
        "user_id",
    )
    wau = fan.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")  # inner join drops fanout days past the calendar end
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("CAST((10000 * dau) DIV wau AS BIGINT)").alias("stickiness_bp"),
        )
    )


E_STICKINESS_SQL = """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
fan AS (SELECT ud.day + CAST(r.i AS INTEGER) AS day, user_id
        FROM ud, range(0, 7) r(i)),
wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY day),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       CAST((10000 * d.dau) // w.wau AS BIGINT) AS stickiness_bp
FROM dau d JOIN wau w USING (day)
"""

QUERIES["e_dau_wau_stickiness"] = e_dau_wau_stickiness
ORACLE["e_dau_wau_stickiness"] = E_STICKINESS_SQL


def e_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ``props`` through Spark 4's VARIANT type:
    ``parse_json`` -> binary variant -> typed ``try_variant_get`` paths.

    Distinct from ``e_json_extract`` (string-path ``get_json_object``):
    VARIANT parses once into a shredded binary encoding, so every
    downstream path extraction is a cheap binary probe instead of a
    re-parse — the 100-TB answer for records carrying many JSON probes
    per row. Missing paths yield NULL (``try_`` form), mirrored by the
    oracle's json_extract NULL semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json, not parse_json: malformed props must shred to NULL
    # (parse_json raises MALFORMED_RECORD_IN_PARSING mid-query; DuckDB's
    # json_valid guard is the oracle-side mirror)
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("k_present"),
            F.count("m").alias("missing_present"),
            F.countDistinct("k").alias("k_distinct"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


E_VARIANT_SQL = """
SELECT event_type,
       COUNT(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)) AS k_present,
       COUNT(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.missing') AS BIGINT)) AS missing_present,
       COUNT(DISTINCT CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)) AS k_distinct,
       MIN(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
"""

QUERIES["e_variant_shred"] = e_variant_shred
ORACLE["e_variant_shred"] = E_VARIANT_SQL


# ---------------------------------------------------------------------------
# Multi-touch attribution
# ---------------------------------------------------------------------------

ATTRIB_HORIZON_US = 7 * 86_400_000_000  # 7-day lookback, microseconds


def e_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: every view/click is credited to
    the user's FIRST purchase at-or-after it (within a 7-day horizon), then
    per event_type we report first-touch wins, last-touch wins, credited
    touch count, and linear credit.

    Scale shape: the touch→conversion assignment is ROW-LOCAL — a single
    forward-looking min window over the user partition (the same
    as-of-join-as-window trick as ``a_asof_click_before_purchase``), so no
    purchase⋈touch range join and no per-user fanout ever materializes.
    Per-conversion position/size annotations ride a second window keyed by
    (user, conversion); the final rollup is bounded by |event types|. The
    exchanges carry only (type, 3×long) — timestamps as exact integer
    microseconds.

    Linear credit is reported in parts-per-million with per-touch INTEGER
    division (``1000000 div n``) — exactly defined, bit-identical across
    engines, unlike a float 1/n accumulation whose sum order differs.
    Conversions with zero preceding touches receive no credit (documented;
    the funnel query counts those)."""
    ev = load_table(spark, sf_dir, "events")
    # Forward-looking min spelled as a RUNNING min over the reversed order
    # (r10, guide §1.2 per-task work): Spark executes a (currentRow,
    # unboundedFollowing) aggregate frame by re-scanning the partition tail
    # for EVERY row — O(k²) per user — while (unboundedPreceding,
    # currentRow) is an incremental O(k) fold. (ts, event_id) is a total
    # order, so the descending ROWS frame covers exactly the same row set
    # and the value is identical.
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        )
        .over(w_fwd)
        .alias("conv_us"),
    )
    touches = annotated.filter(
        F.col("event_type").isin("view", "click")
        & F.col("conv_us").isNotNull()
        & ((F.col("conv_us") - F.col("t_us")) <= ATTRIB_HORIZON_US)
    )
    w_conv = Window.partitionBy("user_id", "conv_us").orderBy("t_us", "event_id")
    w_conv_all = Window.partitionBy("user_id", "conv_us")
    credited = touches.select(
        "event_type",
        F.row_number().over(w_conv).alias("rn"),
        F.count(F.lit(1)).over(w_conv_all).alias("n"),
    )
    return (
        credited.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("first_touch_convs"),
            F.sum(F.when(F.col("rn") == F.col("n"), 1).otherwise(0)).alias(
                "last_touch_convs"
            ),
            F.count(F.lit(1)).alias("touches"),
            F.sum(F.expr("1000000 div n")).alias("linear_ppm"),
        )
        .orderBy("event_type")
    )


E_ATTRIBUTION_SQL = f"""
WITH ann AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_us
  FROM events
), touches AS (
  SELECT event_type, user_id, conv_us, t_us, event_id
  FROM ann
  WHERE event_type IN ('view', 'click') AND conv_us IS NOT NULL
    AND conv_us - t_us <= {ATTRIB_HORIZON_US}
), credited AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, conv_us ORDER BY t_us, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, conv_us) AS n
  FROM touches
)
SELECT event_type,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch_convs,
       CAST(SUM(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT) AS last_touch_convs,
       COUNT(*) AS touches,
       CAST(SUM(1000000 // n) AS BIGINT) AS linear_ppm
FROM credited GROUP BY event_type ORDER BY event_type
"""

QUERIES["e_attribution_credit"] = e_attribution_credit
ORACLE["e_attribution_credit"] = E_ATTRIBUTION_SQL


# ---------------------------------------------------------------------------
# Strict-order session funnel
# ---------------------------------------------------------------------------


def e_session_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ORDER funnel view → click → purchase within a session: a
    click only counts after the session's first view, a purchase only
    after such a click (the match_recognize / sequential-funnel workload
    — ``e_funnel`` reports unordered totals, this enforces progression).

    Scale shape: sessionization (gap-cumsum) and BOTH progression flags
    ride cumulative windows over the same (user)-ordered partition — one
    sort, one WindowExec, no self-joins for the "first X after first Y"
    chain (the naive form is two correlated as-of joins); the session
    rollup and the single-row funnel reduce map-side. Output: session
    counts per funnel stage + conversion in exact basis points (integer
    DIV, bit-identical cross-engine)."""
    # NULL-ts events are unsessionizable (section 24) — the oracle already
    # filters them; without the mirror they formed a phantom session here
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.when(
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
        > SESSION_GAP_MIN * 60,
        1,
    ).otherwise(0)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type", gap.alias("_new")
    ).withColumn("session_no", F.sum("_new").over(wc))
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    wsc = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seen_view = F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(wsc)
    staged = flagged.withColumn("_sv", seen_view).withColumn(
        "_click_ok", F.when((F.col("event_type") == "click") & (F.col("_sv") == 1), 1).otherwise(0)
    )
    seen_click = F.max("_click_ok").over(wsc)
    staged = staged.withColumn("_sc", seen_click).withColumn(
        "_purchase_ok",
        F.when((F.col("event_type") == "purchase") & (F.col("_sc") == 1), 1).otherwise(0),
    )
    sess = staged.groupBy("user_id", "session_no").agg(
        F.max("_sv").alias("s1"),
        F.max("_click_ok").alias("s2"),
        F.max("_purchase_ok").alias("s3"),
    )
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("s1").alias("n_view"),
        F.sum("s2").alias("n_view_click"),
        F.sum("s3").alias("n_view_click_purchase"),
        F.expr("sum(s2) * 10000 div sum(s1)").alias("click_bps"),
        F.expr("sum(s3) * 10000 div sum(s2)").alias("purchase_bps"),
    )


E_STRICT_FUNNEL_SQL = f"""
WITH lagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
), flagged AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM lagged
), staged1 AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id, session_no ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv
  FROM flagged
), staged2 AS (
  SELECT *,
         CASE WHEN event_type = 'click' AND sv = 1 THEN 1 ELSE 0 END AS click_ok
  FROM staged1
), staged3 AS (
  SELECT *,
         CASE WHEN event_type = 'purchase'
                   AND MAX(click_ok) OVER (
                     PARTITION BY user_id, session_no ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
              THEN 1 ELSE 0 END AS purchase_ok
  FROM staged2
), sess AS (
  SELECT user_id, session_no,
         MAX(sv) AS s1, MAX(click_ok) AS s2, MAX(purchase_ok) AS s3
  FROM staged3 GROUP BY user_id, session_no
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(s1) AS BIGINT) AS n_view,
       CAST(SUM(s2) AS BIGINT) AS n_view_click,
       CAST(SUM(s3) AS BIGINT) AS n_view_click_purchase,
       CAST(SUM(s2) * 10000 // SUM(s1) AS BIGINT) AS click_bps,
       CAST(SUM(s3) * 10000 // SUM(s2) AS BIGINT) AS purchase_bps
FROM sess
"""

QUERIES["e_session_funnel_strict"] = e_session_funnel_strict
ORACLE["e_session_funnel_strict"] = E_STRICT_FUNNEL_SQL


# ---------------------------------------------------------------------------
# Week-over-week growth
# ---------------------------------------------------------------------------


def e_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change in event volume and value per type — the
    topline growth readout every metrics dashboard leads with. Change is
    emitted in floored basis points against the prior week (negative
    weeks floor consistently: explicit ``floor`` both engines, the
    ``ts_seasonal_naive`` cast rule).

    Scale shape: stream → (type, week) rollup (map-side combinable),
    lag on the calendar-bounded rollup."""
    ev = load_table(spark, sf_dir, "events")
    week = (F.unix_micros("ts") / 1_000_000).cast("long") - (
        (F.unix_micros("ts") / 1_000_000).cast("long") % (7 * 86_400)
    )
    weekly = ev.groupBy("event_type", week.alias("wk")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    return (
        weekly.withColumn("prev_n", F.lag("n").over(w))
        .withColumn("prev_v", F.lag("v").over(w))
        .filter(F.col("prev_n").isNotNull())
        .select(
            "event_type",
            "wk",
            "n",
            F.expr("CAST(floor((n - prev_n) * 10000.0 / prev_n) AS BIGINT)").alias(
                "n_change_bps"
            ),
            F.expr(
                "CAST(floor((CAST(v AS DOUBLE) - CAST(prev_v AS DOUBLE)) * 10000.0"
                " / CAST(prev_v AS DOUBLE)) AS BIGINT)"
            ).alias("v_change_bps"),
        )
        .orderBy("event_type", "wk")
    )


E_WOW_SQL = """
WITH weekly AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000) - ((epoch_us(ts) // 1000000) % 604800) AS wk,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, wk, n, v,
         LAG(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n,
         LAG(v) OVER (PARTITION BY event_type ORDER BY wk) AS prev_v
  FROM weekly
)
SELECT event_type, wk, n,
       CAST(floor((n - prev_n) * 10000.0 / prev_n) AS BIGINT) AS n_change_bps,
       CAST(floor((CAST(v AS DOUBLE) - CAST(prev_v AS DOUBLE)) * 10000.0
            / CAST(prev_v AS DOUBLE)) AS BIGINT) AS v_change_bps
FROM lagged WHERE prev_n IS NOT NULL
ORDER BY event_type, wk
"""

QUERIES["e_wow_growth"] = e_wow_growth
ORACLE["e_wow_growth"] = E_WOW_SQL


# ---------------------------------------------------------------------------
# Activity streaks (gaps-and-islands, user-keyed)
# ---------------------------------------------------------------------------


def e_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, rolled into a
    streak-length histogram — the engagement metric behind "N-day
    streak" product features, and the user-keyed twin of the
    gaps-and-islands family (``e_scd2_dimension`` / ``e_trigram_paths``).

    Scale shape: stream → DISTINCT (user, day) (the e_dau_wau compact
    table), island id = day_number − row_number (one user-keyed window),
    then two bounded rollups. Nothing beyond the distinct pair table
    ever shuffles."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        ((F.unix_micros("ts") / 1_000_000).cast("long") / 86_400)
        .cast("long")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return (
        best.groupBy("best_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("best_streak")
    )


E_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST((epoch_us(ts) // 1000000) // 86400 AS BIGINT) AS day
  FROM events
), islands AS (
  SELECT user_id,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, COUNT(*) AS len FROM islands GROUP BY user_id, grp
), best AS (
  SELECT user_id, MAX(len) AS best_streak FROM streaks GROUP BY user_id
)
SELECT best_streak, COUNT(*) AS n_users
FROM best GROUP BY best_streak ORDER BY best_streak
"""

QUERIES["e_activity_streaks"] = e_activity_streaks
ORACLE["e_activity_streaks"] = E_STREAKS_SQL


# ---------------------------------------------------------------------------
# Bot-traffic heuristic
# ---------------------------------------------------------------------------

_BOT_FAST_GAP_US = 43_200_000_000  # "fast" inter-event gap: < 12 hours


def e_bot_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screen over the event stream — the hygiene filter
    run before behavioral data trains anything: per user, the share of
    suspiciously fast inter-event gaps and the minimum gap; the 20 most
    machine-like users (highest fast-gap share, then fastest minimum
    gap) are emitted for review, all exact integers (gap microseconds,
    shares in bps).

    Scale shape: ONE user-keyed window (lag) over the stream, then a
    user rollup and a bounded deterministic top-k — the sessionization
    exchange reused for abuse detection."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.sum((F.col("gap_us") < _BOT_FAST_GAP_US).cast("long")).alias("n_fast"),
    )
    return (
        per_user.withColumn(
            "fast_share_bps", F.expr("n_fast * 10000 div n_gaps")
        )
        .select("user_id", "n_gaps", "min_gap_us", "fast_share_bps")
        .orderBy(F.desc("fast_share_bps"), F.asc("min_gap_us"), F.asc("user_id"))
        .limit(20)
    )


E_BOT_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), per_user AS (
  SELECT user_id, COUNT(*) AS n_gaps, MIN(gap_us) AS min_gap_us,
         SUM(CASE WHEN gap_us < {_BOT_FAST_GAP_US} THEN 1 ELSE 0 END) AS n_fast
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, min_gap_us,
       CAST(n_fast * 10000 // n_gaps AS BIGINT) AS fast_share_bps
FROM per_user
ORDER BY fast_share_bps DESC, min_gap_us ASC, user_id ASC
LIMIT 20
"""

QUERIES["e_bot_heuristic"] = e_bot_heuristic
ORACLE["e_bot_heuristic"] = E_BOT_SQL


# ---------------------------------------------------------------------------
# Activity concentration: exact Gini coefficient
# ---------------------------------------------------------------------------


def e_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is activity across users? The EXACT Gini
    coefficient of per-user event counts — the one-number answer to "do
    10 bots generate half the corpus", read next to ``e_bot_heuristic``
    before trusting per-user frequency signals.

    Computed without a data-sized global sort: users are rolled up per
    DISTINCT activity level (the value domain is bounded — event counts,
    not users), and the sorted-rank sum ``Σ i·x_i`` is recovered from
    run algebra: a run of ``m`` users at level ``x`` starting after
    cumulative rank ``r`` contributes ``x·(m·r + m(m+1)/2)``. All
    integers until the final Gini division:
    ``G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)``.

    Scale shape: per-user rollup (hash shuffle on user), per-level
    rollup (bounded), ONE cumulative window over the bounded level
    domain, scalar result.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    per_level = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    runs = per_level.select(
        "x",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("r"),
    )
    agg = runs.agg(
        F.sum(
            F.col("x") * (F.col("m") * F.col("r") + F.expr("m * (m + 1) div 2"))
        ).alias("s1"),
        F.sum(F.col("x") * F.col("m")).alias("s"),
        F.sum("m").alias("n"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("s").cast("bigint").alias("total_events"),
        F.round(
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double"),
            6,
        ).alias("gini"),
    )


E_GINI_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
), per_level AS (
  SELECT x, COUNT(*) AS m FROM per_user GROUP BY x
), runs AS (
  SELECT x, m,
         COALESCE(SUM(m) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
  FROM per_level
), agg AS (
  SELECT SUM(x * (m * r + m * (m + 1) // 2)) AS s1,
         SUM(x * m) AS s, SUM(m) AS n
  FROM runs
)
SELECT CAST(n AS BIGINT) AS n_users, CAST(s AS BIGINT) AS total_events,
       ROUND(CAST(2 * s1 - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE), 6)
         AS gini
FROM agg
"""

QUERIES["e_activity_gini"] = e_activity_gini
ORACLE["e_activity_gini"] = E_GINI_SQL


# ---------------------------------------------------------------------------
# A/B hygiene: sample-ratio-mismatch check
# ---------------------------------------------------------------------------


def e_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guardrail for a 50/50 hash split of
    users — the first thing to check before reading ANY experiment
    metric (a skewed split means assignment is broken and every
    downstream comparison is invalid). The split is the repo's seeded
    md5 convention, so the check is reproducible.

    The 2-cell chi-square against expected 50/50 collapses to EXACT
    integer algebra: ``χ² = (n0 − n1)² / (n0 + n1)``; only the final
    division touches floats. χ² > 3.84 (α=0.05, 1 df) means SRM.

    Scale shape: per-user rollup, then one scalar aggregate.
    """
    from webscale_multimodal_datapipeline_spark.functions.text import md5_long

    ev = load_table(spark, sf_dir, "events")
    # NULL user_id cannot be assigned an arm; excluded by spec on both
    # sides (DuckDB's COUNT(*) denominator would otherwise count the
    # unassignable row that its arm filters exclude — null-parity sweep)
    users = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .select(
            F.pmod(md5_long(F.col("user_id").cast("string")), F.lit(2)).alias("arm")
        )
    )
    agg = users.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
    )
    return agg.select(
        F.col("n0").cast("bigint").alias("n_arm0"),
        F.col("n1").cast("bigint").alias("n_arm1"),
        F.round(
            ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
                "double"
            )
            / (F.col("n0") + F.col("n1")).cast("double"),
            6,
        ).alias("chi2"),
    )


E_SRM_SQL = """
WITH users AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS arm
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
)
SELECT CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_arm0,
       CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_arm1,
       ROUND(CAST((COUNT(*) FILTER (WHERE arm = 0)
                   - COUNT(*) FILTER (WHERE arm = 1))
                  * (COUNT(*) FILTER (WHERE arm = 0)
                     - COUNT(*) FILTER (WHERE arm = 1)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS chi2
FROM users
"""

QUERIES["e_srm_check"] = e_srm_check
ORACLE["e_srm_check"] = E_SRM_SQL


# ---------------------------------------------------------------------------
# Funnel conversion with Wilson confidence intervals
# ---------------------------------------------------------------------------


def e_funnel_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion rates WITH error bars: view→click and
    view+click→purchase user conversion, each with the Wilson 95%
    interval — the uncertainty-aware version of ``e_funnel`` (a 2-point
    drop on a 300-user stage is noise; the interval says so before
    anyone reacts to it).

    Determinism: k and n are exact distinct-user counts from ONE
    per-user flag rollup; the Wilson center/half-width is a single fixed
    expression tree over (k, n) — identical double ops in both engines —
    rounded to 6 at the end.

    Scale shape: per-user conditional-flag rollup (one shuffle), scalar
    flag sums, two bounded output rows.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "p"
        ),
    )
    agg = per_user.agg(
        F.sum("v").alias("n_view"),
        F.sum(F.col("v") * F.col("c")).alias("n_vc"),
        F.sum(F.col("v") * F.col("c") * F.col("p")).alias("n_vcp"),
    )

    def wilson(k, n):
        z = F.lit(1.96)
        ph = k.cast("double") / n.cast("double")
        nf = n.cast("double")
        center = (ph + z * z / (2 * nf)) / (1 + z * z / nf)
        half = (
            z
            * F.sqrt(ph * (1 - ph) / nf + z * z / (4 * nf * nf))
            / (1 + z * z / nf)
        )
        return (
            F.round(center - half, 6).alias("wilson_low"),
            F.round(center + half, 6).alias("wilson_high"),
        )

    s1 = agg.select(
        F.lit("view_to_click").alias("stage"),
        F.col("n_view").cast("bigint").alias("n"),
        F.col("n_vc").cast("bigint").alias("k"),
        F.expr("n_vc * 1000000 div n_view").alias("rate_ppm"),
        *wilson(F.col("n_vc"), F.col("n_view")),
    )
    s2 = agg.select(
        F.lit("click_to_purchase").alias("stage"),
        F.col("n_vc").cast("bigint").alias("n"),
        F.col("n_vcp").cast("bigint").alias("k"),
        F.expr("n_vcp * 1000000 div n_vc").alias("rate_ppm"),
        *wilson(F.col("n_vcp"), F.col("n_vc")),
    )
    return s1.unionByName(s2).orderBy("stage")


_WILSON_SQL_TMPL = """
  SELECT '{stage}' AS stage, CAST({n} AS BIGINT) AS n, CAST({k} AS BIGINT) AS k,
         CAST({k} * 1000000 // {n} AS BIGINT) AS rate_ppm,
         ROUND((CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)
                + 1.96 * 1.96 / (2 * CAST({n} AS DOUBLE)))
               / (1 + 1.96 * 1.96 / CAST({n} AS DOUBLE))
               - 1.96 * sqrt(CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)
                             * (1 - CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE))
                             / CAST({n} AS DOUBLE)
                             + 1.96 * 1.96
                               / (4 * CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE)))
                 / (1 + 1.96 * 1.96 / CAST({n} AS DOUBLE)), 6) AS wilson_low,
         ROUND((CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)
                + 1.96 * 1.96 / (2 * CAST({n} AS DOUBLE)))
               / (1 + 1.96 * 1.96 / CAST({n} AS DOUBLE))
               + 1.96 * sqrt(CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)
                             * (1 - CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE))
                             / CAST({n} AS DOUBLE)
                             + 1.96 * 1.96
                               / (4 * CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE)))
                 / (1 + 1.96 * 1.96 / CAST({n} AS DOUBLE)), 6) AS wilson_high
  FROM agg
"""

E_WILSON_SQL = (
    """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
), agg AS (
  SELECT SUM(v) AS n_view, SUM(v * c) AS n_vc, SUM(v * c * p) AS n_vcp
  FROM per_user
)
"""
    + _WILSON_SQL_TMPL.format(stage="view_to_click", n="n_view", k="n_vc")
    + "UNION ALL"
    + _WILSON_SQL_TMPL.format(stage="click_to_purchase", n="n_vc", k="n_vcp")
    + "ORDER BY stage"
)

QUERIES["e_funnel_wilson_ci"] = e_funnel_wilson_ci
ORACLE["e_funnel_wilson_ci"] = E_WILSON_SQL


# ---------------------------------------------------------------------------
# Inequality (Theil) and seasonality-strength diagnostics
# ---------------------------------------------------------------------------


def e_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil index of per-user activity — the decomposable companion to
    ``e_activity_gini`` (Theil, unlike Gini, splits exactly into
    between-group + within-group shares, so it is the concentration
    number you can later attribute to segments). ``T = (1/n)·Σ
    (x/μ)·ln(x/μ)``, grouped by distinct activity LEVEL with
    multiplicity: each level term is ``m·(x·n/S)·ln(x·n/S)`` — integer
    products inside the log, rounded to 6 and decimal-summed over the
    bounded level domain; one double division by ``n`` at the end.

    Scale shape: per-user rollup → bounded per-level rollup → scalar.
    No window at all (unlike the Gini's rank recovery).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    per_level = per_user.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    tot = per_level.agg(
        F.sum(F.col("x") * F.col("m")).alias("s"), F.sum("m").alias("n")
    )
    ratio = (F.col("x") * F.col("n")).cast("double") / F.col("s").cast("double")
    term = F.round(F.col("m") * ratio * F.log(ratio), 6).cast("decimal(18,6)")
    return (
        per_level.crossJoin(F.broadcast(tot))
        .select("n", "s", term.alias("t"))
        .groupBy("n", "s")
        .agg(F.sum("t").alias("_sum"))
        .select(
            F.col("n").cast("bigint").alias("n_users"),
            F.col("s").cast("bigint").alias("total_events"),
            F.round(F.col("_sum").cast("double") / F.col("n").cast("double"), 6).alias(
                "theil"
            ),
        )
    )


E_THEIL_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
), per_level AS (
  SELECT x, COUNT(*) AS m FROM per_user GROUP BY x
), tot AS (SELECT SUM(x * m) AS s, SUM(m) AS n FROM per_level)
SELECT CAST(n AS BIGINT) AS n_users, CAST(s AS BIGINT) AS total_events,
       ROUND(CAST(SUM(CAST(ROUND(
           m * (CAST(x * n AS DOUBLE) / CAST(s AS DOUBLE))
             * ln(CAST(x * n AS DOUBLE) / CAST(s AS DOUBLE)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS theil
FROM per_level, tot
GROUP BY n, s
"""

QUERIES["e_theil_index"] = e_theil_index
ORACLE["e_theil_index"] = E_THEIL_SQL


def e_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of hourly traffic variance is explained by hour-of-day?
    One-way eta² over calendar (date × hour) event-count cells:
    ``η² = SS_between / SS_total`` — ~0 means load is flat (no point
    hour-stratifying anything), ~1 means schedule-driven (cron/bot
    traffic; compare ``e_bot_heuristic``). The peak hour comes along for
    free as an exact argmax.

    Determinism: cell counts are integers; ``SS_total = Σc² − S²/k``
    uses exact decimal sums; the between term ``Σ_h S_h²/n_h`` is 24
    bounded per-hour divisions, rounded to 6 and decimal-summed. Scale
    shape: calendar-bounded (date, hour) rollup → 24-row hour rollup →
    scalar. All map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.to_date("ts").alias("d"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    hours = cells.groupBy("hr").agg(
        F.sum("c").alias("s_h"), F.count(F.lit(1)).alias("n_h")
    )
    tot = cells.agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).alias("k"),
    )
    bterm = F.round(
        (F.col("s_h") * F.col("s_h")).cast("double") / F.col("n_h").cast("double"),
        6,
    ).cast("decimal(18,6)")
    peak = hours.orderBy(F.desc("s_h"), "hr").limit(1).select(
        F.col("hr").alias("peak_hour"), F.col("s_h").alias("peak_events")
    )
    agg = (
        hours.crossJoin(F.broadcast(tot))
        .select("s", "ss", "k", bterm.alias("b"))
        .groupBy("s", "ss", "k")
        .agg(F.sum("b").alias("bsum"))
    )
    corr = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "k"
    ).cast("double")
    return (
        agg.crossJoin(F.broadcast(peak))
        .select(
            F.col("k").cast("bigint").alias("n_cells"),
            F.col("s").cast("bigint").alias("n_events"),
            F.round(
                (F.col("bsum").cast("double") - corr)
                / (F.col("ss").cast("double") - corr),
                6,
            ).alias("eta2"),
            F.col("peak_hour").cast("bigint").alias("peak_hour"),
            F.col("peak_events").cast("bigint").alias("peak_events"),
        )
    )


E_SEASONALITY_SQL = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS d, hour(ts) AS hr, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), hours AS (
  SELECT hr, SUM(c) AS s_h, COUNT(*) AS n_h FROM cells GROUP BY hr
), tot AS (
  SELECT SUM(c) AS s, SUM(c * c) AS ss, COUNT(*) AS k FROM cells
), peak AS (
  SELECT hr AS peak_hour, s_h AS peak_events FROM hours
  ORDER BY s_h DESC, hr LIMIT 1
), agg AS (
  SELECT s, ss, k,
         SUM(CAST(ROUND(CAST(s_h * s_h AS DOUBLE) / CAST(n_h AS DOUBLE), 6)
                  AS DECIMAL(18,6))) AS bsum
  FROM hours, tot
  GROUP BY s, ss, k
)
SELECT CAST(k AS BIGINT) AS n_cells, CAST(s AS BIGINT) AS n_events,
       ROUND((CAST(bsum AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(k AS DOUBLE)),
             6) AS eta2,
       CAST(peak_hour AS BIGINT) AS peak_hour,
       CAST(peak_events AS BIGINT) AS peak_events
FROM agg, peak
"""

QUERIES["e_seasonality_strength"] = e_seasonality_strength
ORACLE["e_seasonality_strength"] = E_SEASONALITY_SQL


# ---------------------------------------------------------------------------
# A/B-test power analysis (experiment design)
# ---------------------------------------------------------------------------

_POWER_Z_ALPHA = "1.959964"  # two-sided alpha = 0.05
_POWER_Z_BETA = "0.841621"  # power = 0.80
_POWER_MDE_FRAC = "0.05"  # detect a 5% lift on the mean


def e_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS over the events-per-user metric: the
    sample size per arm needed to detect a 5% lift at α=0.05 two-sided
    with 80% power — ``n = (z_α + z_β)² · 2σ² / δ²`` (the standard
    two-sample normal-approximation formula every experimentation
    platform runs before an experiment is even assigned; pairs with
    ``e_srm_check`` which runs after). Metric is the per-user event
    COUNT, so the variance comes from exact integer power sums.

    Determinism: σ² = (n·ΣX² − (ΣX)²)/n² over exact BIGINTs; z and MDE
    constants are shared literal tokens; the one ceil() acts on a
    bit-identical double in both engines.

    Scale shape: per-user rollup (map-side combinable), one scalar
    aggregate, 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("n_users").cast("double")
    var = (
        F.col("n_users") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double") / (F.col("n_users") * F.col("n_users")).cast("double")
    delta = F.lit(float(_POWER_MDE_FRAC)) * mean
    zsum = F.lit(float(_POWER_Z_ALPHA)) + F.lit(float(_POWER_Z_BETA))
    n_arm = F.ceil(zsum * zsum * 2.0 * var / (delta * delta)).cast("long")
    return tot.select(
        "n_users",
        F.round(mean, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(delta, 6).alias("mde_abs"),
        n_arm.alias("n_per_arm"),
    )


E_POWER_SQL = f"""
WITH per AS (
  SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM per
)
SELECT n_users,
       ROUND(CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_events,
       ROUND(CAST(n_users * sxx - sx * sx AS DOUBLE)
             / CAST(n_users * n_users AS DOUBLE), 6) AS var_events,
       ROUND(CAST({_POWER_MDE_FRAC} AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE)), 6)
         AS mde_abs,
       CAST(ceil((CAST({_POWER_Z_ALPHA} AS DOUBLE) + CAST({_POWER_Z_BETA} AS DOUBLE))
                 * (CAST({_POWER_Z_ALPHA} AS DOUBLE) + CAST({_POWER_Z_BETA} AS DOUBLE))
                 * CAST(2.0 AS DOUBLE)
                 * (CAST(n_users * sxx - sx * sx AS DOUBLE)
                    / CAST(n_users * n_users AS DOUBLE))
                 / ((CAST({_POWER_MDE_FRAC} AS DOUBLE)
                     * (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE)))
                    * (CAST({_POWER_MDE_FRAC} AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))))) AS BIGINT)
         AS n_per_arm
FROM tot
"""

QUERIES["e_power_analysis"] = e_power_analysis
ORACLE["e_power_analysis"] = E_POWER_SQL


def e_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, "Improving the
    Sensitivity of Online Controlled Experiments") — the standard
    pre-experiment-covariate adjustment every experimentation platform
    ships: per user, covariate X = total 'view' value (pre-exposure
    behavior) and metric Y = total 'purchase' value; θ = cov(X,Y)/var(X)
    pooled over all users; each arm's adjusted mean is
    mean(Y) − θ·(mean_arm(X) − mean(X)). Reports the raw and CUPED
    arm difference plus the achieved variance-reduction factor
    (corr(X,Y)² — the theoretical variance removed).

    Exact-decimal discipline (the ``a_welch_ab_test`` pattern): per-user
    X/Y accumulate in DECIMAL (2-dp values, exact, merge-order-free),
    the five global power sums Σx Σy Σxy Σx² Σy² and the per-arm sums
    accumulate in DECIMAL too, and θ/means derive with an identical
    float expression tree in both engines — bit-equal, no tolerance.
    NULL user_id is excluded by spec (unassignable arm — §24 rule).

    Scale shape: one user-keyed aggregate (the natural shuffle), then a
    single-row conditional aggregate; no UDF, no window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return cuped_over_user_xy(cuped_user_xy(ev))


def cuped_user_xy(ev: DataFrame) -> DataFrame:
    """Per-user covariate/outcome rollup ``(user_id, x, y)`` — exact
    decimal sums, so the rollup is MERGE-able state: the streaming lift
    accumulates exactly this table per user in the txtable."""
    v = F.col("value").cast("decimal(12,2)")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", v).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )).cast("decimal(18,2)").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", v).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )).cast("decimal(18,2)").alias("y"),
    )


def cuped_over_user_xy(per_user: DataFrame) -> DataFrame:
    """Shared CUPED scorer over a per-user ``(user_id, x, y)`` table:
    derives the md5 arm split and the θ/means float tree — factored out
    so the BATCH query and the STREAMING lift score through literally
    the same code (the spike/SRM/CUSUM shared-scorer pattern — exact
    parity by construction)."""
    from webscale_multimodal_datapipeline_spark.functions.text import md5_long

    per_user = per_user.withColumn(
        "arm",
        F.pmod(md5_long(F.concat(F.col("user_id").cast("string"), F.lit("#cuped"))), F.lit(2)),
    )
    a = F.col("arm") == 0
    z2 = F.lit(0).cast("decimal(18,2)")
    z4 = F.lit(0).cast("decimal(38,4)")
    g = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(a, 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("double").alias("nb"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).cast("double").alias("syy"),
        F.sum(F.when(a, F.col("x")).otherwise(z2)).cast("double").alias("sxa"),
        F.sum(F.when(~a, F.col("x")).otherwise(z2)).cast("double").alias("sxb"),
        F.sum(F.when(a, F.col("y")).otherwise(z2)).cast("double").alias("sya"),
        F.sum(F.when(~a, F.col("y")).otherwise(z2)).cast("double").alias("syb"),
    )
    n, na, nb = F.col("n"), F.col("na"), F.col("nb")
    sx, sy, sxy, sxx, syy = (F.col(c) for c in ("sx", "sy", "sxy", "sxx", "syy"))
    cov = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    theta = cov / varx
    mean_x = sx / n
    adj_a = F.col("sya") / na - theta * (F.col("sxa") / na - mean_x)
    adj_b = F.col("syb") / nb - theta * (F.col("sxb") / nb - mean_x)
    return g.select(
        n.cast("long").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(F.col("sya") / na - F.col("syb") / nb, 6).alias("diff_raw"),
        F.round(adj_a - adj_b, 6).alias("diff_cuped"),
        F.round(cov * cov / (varx * vary), 6).alias("var_reduction"),
    )


E_CUPED_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                   THEN CAST(value AS DECIMAL(12,2)) END), 0) AS DECIMAL(18,2)) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(12,2)) END), 0) AS DECIMAL(18,2)) AS y,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#cuped'), 1, 15)) AS BIGINT) % 2 AS arm
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(COUNT(*) FILTER (WHERE arm = 0) AS DOUBLE) AS na,
         CAST(COUNT(*) FILTER (WHERE arm = 1) AS DOUBLE) AS nb,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy,
         CAST(COALESCE(SUM(x) FILTER (WHERE arm = 0), 0) AS DOUBLE) AS sxa,
         CAST(COALESCE(SUM(x) FILTER (WHERE arm = 1), 0) AS DOUBLE) AS sxb,
         CAST(COALESCE(SUM(y) FILTER (WHERE arm = 0), 0) AS DOUBLE) AS sya,
         CAST(COALESCE(SUM(y) FILTER (WHERE arm = 1), 0) AS DOUBLE) AS syb
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS theta,
       ROUND(sya / na - syb / nb, 6) AS diff_raw,
       ROUND((sya / na - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sxa / na - sx / n))
             - (syb / nb - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sxb / nb - sx / n)),
             6) AS diff_cuped,
       ROUND((sxy - sx * sy / n) * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS var_reduction
FROM g
"""

QUERIES["e_cuped"] = e_cuped
ORACLE["e_cuped"] = E_CUPED_SQL


def cusum_over_hourly_totals(hourly: DataFrame) -> DataFrame:
    """Shared CUSUM-changepoint scorer over an ``(_h, cnt)`` hourly count
    table (any event-type split is summed away first): the hour
    maximizing |n·C_t − t·N| — the same pure-BIGINT argmax algebra as
    ``ts_cusum_changepoint``, factored out so the BATCH query and the
    STREAMING lift score through literally the same code (the
    spike/SRM lift pattern — exact parity by construction)."""
    total = hourly.groupBy("_h").agg(F.sum("cnt").alias("c"))
    w = Window.orderBy("_h")
    cum = total.select(
        "_h",
        F.row_number().over(w).alias("t"),
        F.sum("c").over(w).alias("cumc"),
    )
    tot = total.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    dev = F.col("n_hours") * F.col("cumc") - F.col("t") * F.col("n_total")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.date_format("_h", "yyyy-MM-dd HH:00").alias("changepoint_hour"),
            F.col("t").cast("long").alias("hour_idx"),
            "n_hours",
            "n_total",
            F.abs(dev).cast("long").alias("abs_dev"),
            F.round(
                F.abs(dev).cast("double")
                / (F.col("n_hours").cast("double") * F.col("n_total").cast("double")),
                8,
            ).alias("cusum_stat"),
        )
        .orderBy(F.desc("abs_dev"), F.asc("changepoint_hour"))
        .limit(1)
    )


def e_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint over the TOTAL hourly event arrivals — "when
    did the traffic mix shift?" at stream granularity; the batch anchor
    for the streaming lift (``streaming/pipeline.py::cusum_from_rollup``
    scores the live txtable rollup through the same
    ``cusum_over_hourly_totals``). NULL-ts events excluded by spec
    (unwindowable — §24)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("_h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return cusum_over_hourly_totals(hourly)


E_CUSUM_HOURLY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), cum AS (
  SELECT h,
         ROW_NUMBER() OVER (ORDER BY h) AS t,
         SUM(c) OVER (ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
  FROM hourly
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_total, CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM hourly
)
SELECT strftime(h, '%Y-%m-%d %H:00') AS changepoint_hour,
       CAST(t AS BIGINT) AS hour_idx,
       n_hours, n_total,
       CAST(abs(n_hours * cumc - t * n_total) AS BIGINT) AS abs_dev,
       ROUND(CAST(abs(n_hours * cumc - t * n_total) AS DOUBLE)
             / (CAST(n_hours AS DOUBLE) * CAST(n_total AS DOUBLE)), 8) AS cusum_stat
FROM cum, tot
ORDER BY abs_dev DESC, changepoint_hour ASC
LIMIT 1
"""

QUERIES["e_cusum_hourly"] = e_cusum_hourly
ORACLE["e_cusum_hourly"] = E_CUSUM_HOURLY_SQL
