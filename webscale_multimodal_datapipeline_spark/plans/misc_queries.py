"""Remaining coverage odds-and-ends: ntile binning, CUBE grouping sets,
sha2 fingerprints (the reference D1's md5-fallback hash family,
``text_exact_dedup.py:74-83`` algo dispatch), and conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ
from webscale_multimodal_datapipeline_spark.plans.relational import _dec


def x_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile binning of customer balances + per-decile stats.

    Exact NTILE semantics WITHOUT the single-partition global window
    (``NTILE OVER (ORDER BY …)`` puts the whole table in one task): range-
    repartition on the sort key so partition ids are globally ordered, rank
    locally with a partitioned window, and add broadcast per-partition
    offsets (tiny P-row histogram; cumulative sum via a triangular self-join
    so no unpartitioned WindowExec appears anywhere in the plan). The NTILE
    bucket is then a closed-form function of (global rank, n)."""
    # a NULL balance is unrankable: Spark's range partitioner puts it
    # FIRST and DuckDB's NTILE ORDER BY puts it LAST, shifting every
    # decile boundary (section 28) — excluded by spec in both engines
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_acctbal", "c_custkey")
        .filter(F.col("c_acctbal").isNotNull())
    )
    num_parts = 32  # at cluster scale: ≈ the table's shuffle parallelism
    ranged = c.repartitionByRange(
        num_parts, F.col("c_acctbal").asc(), F.col("c_custkey").asc()
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
    hist = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # exclusive prefix-sum over the P-row histogram (P ≤ num_parts rows —
    # the triangular join is broadcast and trivially small at any scale)
    offs = (
        hist.alias("l")
        .join(hist.alias("r"), F.col("r._pid") < F.col("l._pid"), "left")
        .groupBy(F.col("l._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("r._cnt"), F.lit(0)).alias("_off"))
    )
    total = hist.agg(F.sum("_cnt").alias("_n"))
    wl = Window.partitionBy("_pid").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    ranked = (
        ranged.withColumn("_lr", F.row_number().over(wl))
        .join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn("_rank", F.col("_off") + F.col("_lr"))
    )
    # NTILE(10): first (n % 10) buckets hold floor(n/10)+1 rows, rest hold
    # floor(n/10) — identical to the rank-based SQL definition.
    qsize = F.floor(F.col("_n") / 10)
    m = F.col("_n") % 10
    head = m * (qsize + F.lit(1))
    decile = F.when(
        F.col("_rank") <= head,
        F.floor((F.col("_rank") - 1) / (qsize + 1)) + 1,
    ).otherwise(m + F.floor((F.col("_rank") - head - 1) / qsize) + 1)
    return (
        ranked.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


X_DECILES_SQL = """
SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM (
  SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer WHERE c_acctbal IS NOT NULL
)
GROUP BY decile
"""


def x_order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations
    (rollup's big sibling — SURVEY §2.6 'not present' in reference)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("o_totalprice")), 4).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


X_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def x_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dedup hash-algo dispatch (xxhash64 preferred, md5
    fallback, ``text_exact_dedup.py:74-83``) as a column family: md5 and
    sha2-256 are cross-engine (oracle-checked); xxhash64 is Spark-native
    (used as the shuffle key, checked indirectly via every dedup query)."""
    d = load_table(spark, sf_dir, "documents")
    from webscale_multimodal_datapipeline_spark.functions.text import normalize_text

    norm = normalize_text("text")
    return d.select(
        "doc_id",
        F.md5(norm).alias("md5_hex"),
        F.sha2(norm, 256).alias("sha256_hex"),
    )


X_HASH_SQL = f"""
SELECT doc_id,
       md5({OQ.sql_norm('text')}) AS md5_hex,
       sha256({OQ.sql_norm('text')}) AS sha256_hex
FROM documents
"""


def x_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-style conditional aggregation per nation: high-balance vs
    low-balance customer counts and sums in one pass."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    high = F.col("c_acctbal") > 5000
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.when(high, 1)).alias("n_high"),
            F.count(F.when(~high, 1)).alias("n_low"),
            F.round(F.sum(F.when(high, _dec("c_acctbal"))), 4).cast("double").alias("high_total"),
        )
    )


X_CONDAGG_SQL = """
SELECT n_name,
       COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_high,
       COUNT(*) FILTER (WHERE NOT (c_acctbal > 5000)) AS n_low,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))) FILTER (WHERE c_acctbal > 5000), 4) AS DOUBLE) AS high_total
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def x_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / dense_rank over supplier balances within
    nation — the analytic-window long tail (none in the reference; a real
    engine needs them for report layers)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


X_RANKS_SQL = """
SELECT s_suppkey, s_nationkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS drank
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
"""


def x_levenshtein_near_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup NAME pairs over parts — levenshtein as the
    string-similarity primitive (fuzzy-dedup building block).

    Output shape (round 8, redefined by the sf1 sweep): one row per
    near-name pair ``(name_l, name_r, dist, n_key_pairs)`` where
    ``n_key_pairs`` is the EXACT count of part-key pairs the name pair
    covers (``cnt_l·cnt_r`` across names, ``C(cnt,2)`` within a name).
    The previous spelling expanded the full key-pair cross product —
    10.4M rows at sf0.1 and ~1B at sf1 (64 distinct names over 200K
    parts), i.e. output QUADRATIC in the duplication factor, which is
    the one shape a 100-TB engine must never emit. The aggregated form
    carries the same information (a consumer needing raw key pairs joins
    part back on the two name columns — linear work against a tiny pair
    table) and is bounded by distinct-name pairs at any scale.

    Scale shape: levenshtein runs on DISTINCT name pairs only (blocked by
    (2-char prefix, length//4) so candidates stay sub-quadratic); key
    multiplicities come from one groupBy — no row-level cross join
    anywhere. The block predicate is part of the query's semantics and is
    mirrored in the oracle."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    counts = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    same = counts.filter(F.col("cnt") >= 2).select(
        F.col("p_name").alias("name_l"),
        F.col("p_name").alias("name_r"),
        F.lit(0).cast("int").alias("dist"),
        F.expr("(cnt * (cnt - 1)) div 2").alias("n_key_pairs"),
    )
    dl, dr = counts.alias("dl"), counts.alias("dr")
    cross = (
        dl.join(
            dr,
            (F.substring(F.col("dl.p_name"), 1, 2) == F.substring(F.col("dr.p_name"), 1, 2))
            & (F.floor(F.length("dl.p_name") / 4) == F.floor(F.length("dr.p_name") / 4))
            & (F.col("dl.p_name") < F.col("dr.p_name")),
        )
        .select(
            F.col("dl.p_name").alias("name_l"),
            F.col("dr.p_name").alias("name_r"),
            F.levenshtein(F.col("dl.p_name"), F.col("dr.p_name")).alias("dist"),
            (F.col("dl.cnt") * F.col("dr.cnt")).alias("n_key_pairs"),
        )
        .filter(F.col("dist") <= 4)
    )
    return same.unionByName(cross)


X_LEV_SQL = """
WITH counts AS (
  SELECT p_name, COUNT(*) AS cnt FROM part GROUP BY p_name
)
SELECT p_name AS name_l, p_name AS name_r,
       CAST(0 AS INTEGER) AS dist,
       (cnt * (cnt - 1)) // 2 AS n_key_pairs
FROM counts WHERE cnt >= 2
UNION ALL
SELECT l.p_name AS name_l, r.p_name AS name_r,
       CAST(levenshtein(l.p_name, r.p_name) AS INTEGER) AS dist,
       l.cnt * r.cnt AS n_key_pairs
FROM counts l JOIN counts r
  ON substring(l.p_name, 1, 2) = substring(r.p_name, 1, 2)
 AND CAST(floor(length(l.p_name) / 4) AS BIGINT) = CAST(floor(length(r.p_name) / 4) AS BIGINT)
 AND l.p_name < r.p_name
WHERE levenshtein(l.p_name, r.p_name) <= 4
"""

QUERIES = {
    "x_acctbal_deciles": x_acctbal_deciles,
    "x_order_cube": x_order_cube,
    "x_hash_family": x_hash_family,
    "x_conditional_agg": x_conditional_agg,
    "x_rank_distributions": x_rank_distributions,
    "x_levenshtein_near_names": x_levenshtein_near_names,
}

ORACLE = {
    "x_acctbal_deciles": X_DECILES_SQL,
    "x_order_cube": X_CUBE_SQL,
    "x_hash_family": X_HASH_SQL,
    "x_conditional_agg": X_CONDAGG_SQL,
    "x_rank_distributions": X_RANKS_SQL,
    "x_levenshtein_near_names": X_LEV_SQL,
}


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key — lakehouse layout-optimization math
# ---------------------------------------------------------------------------


def x_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleaved key over (l_partkey % 256, l_suppkey % 256), plus
    per-range-bucket extents: within each of 16 key ranges, BOTH columns'
    min/max spans are narrow — the property parquet min/max skipping needs.
    The oracle pins the interleave math and the per-bucket extents."""
    from webscale_multimodal_datapipeline_spark.operators.scale import (
        zorder_key,
        zorder_sql,
    )

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sy"),
    ).withColumn("zkey", zorder_key(["px", "sy"], bits=8))
    # deterministic range buckets (key space is 16 bits -> 4096 per bucket)
    return (
        keyed.withColumn("bucket", F.floor(F.col("zkey") / 4096).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
            F.min("px").alias("px_min"),
            F.max("px").alias("px_max"),
            F.min("sy").alias("sy_min"),
            F.max("sy").alias("sy_max"),
        )
    )


def _x_zorder_sql() -> str:
    from webscale_multimodal_datapipeline_spark.operators.scale import zorder_sql

    z = zorder_sql(["px", "sy"], bits=8)
    return f"""
WITH keyed AS (
  SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sy
  FROM lineitem
), z AS (
  SELECT px, sy, {z} AS zkey FROM keyed
)
SELECT CAST(zkey // 4096 AS INT) AS bucket, COUNT(*) AS n,
       MIN(zkey) AS zmin, MAX(zkey) AS zmax,
       MIN(px) AS px_min, MAX(px) AS px_max,
       MIN(sy) AS sy_min, MAX(sy) AS sy_max
FROM z GROUP BY 1
"""


QUERIES["x_zorder_key"] = x_zorder_key
ORACLE["x_zorder_key"] = _x_zorder_sql()


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD per group)
# ---------------------------------------------------------------------------


def x_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust outlier count on order totals: median + MAD
    (median absolute deviation), then count rows beyond median ± 3·MAD —
    the heavy-tail-safe alternative to mean/stddev flagging.

    Two grouped exact-percentile aggregations (partial-merge sketch-free;
    at 100 TB swap `percentile` for `percentile_approx` and accept the
    documented rank error — same plan shape)."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = (
        o.join(F.broadcast(med), "o_orderpriority")
        .withColumn("_adev", F.abs(F.col("o_totalprice") - F.col("med")))
        .groupBy("o_orderpriority")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(_adev, 0.5)").alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    out = (
        o.join(
            F.broadcast(dev.select("o_orderpriority", "med", "mad")),
            "o_orderpriority",
        )
        .withColumn(
            "_is_out",
            (
                F.abs(F.col("o_totalprice") - F.col("med"))
                > F.lit(3.0) * F.col("mad")
            ).cast("int"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("_is_out").alias("n_outliers"))
    )
    return (
        dev.join(out, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.round("med", 6).cast("double").alias("med"),
            F.round("mad", 6).cast("double").alias("mad"),
            F.col("n").cast("bigint").alias("n"),
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
        )
    )


X_MAD_SQL = """
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY 1
), dev AS (
  SELECT o.o_orderpriority, ANY_VALUE(m.med) AS med,
         quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad,
         COUNT(*) AS n
  FROM orders o JOIN med m USING (o_orderpriority)
  GROUP BY 1
), outl AS (
  SELECT o.o_orderpriority,
         SUM(CASE WHEN abs(o.o_totalprice - d.med) > 3.0 * d.mad THEN 1 ELSE 0 END) AS n_outliers
  FROM orders o JOIN dev d USING (o_orderpriority)
  GROUP BY 1
)
SELECT d.o_orderpriority,
       CAST(ROUND(d.med, 6) AS DOUBLE) AS med,
       CAST(ROUND(d.mad, 6) AS DOUBLE) AS mad,
       CAST(d.n AS BIGINT) AS n,
       CAST(o.n_outliers AS BIGINT) AS n_outliers
FROM dev d JOIN outl o USING (o_orderpriority)
"""

QUERIES["x_mad_outliers"] = x_mad_outliers
ORACLE["x_mad_outliers"] = X_MAD_SQL


def x_segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op (completes the UNION/EXCEPT family): customers in
    the top-balance quartile who ALSO placed an urgent-priority order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(urgent)


X_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_acctbal > 7000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""

QUERIES["x_segment_intersect"] = x_segment_intersect
ORACLE["x_segment_intersect"] = X_INTERSECT_SQL


def x_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total report: per-nation revenue and its share of the
    grand total. The share window runs over the already-aggregated
    25-row nation rollup (bounded by the nation dimension, not the data),
    so the unpartitioned frame is deliberate and tiny."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev")
        )
    )
    total = Window.partitionBy()
    return rev.select(
        "n_name",
        F.round("rev", 4).cast("double").alias("revenue"),
        F.round(
            _dec(F.col("rev") / F.sum("rev").over(total) * 100), 4
        )
        .cast("double")
        .alias("share_pct"),
    )


X_REVSHARE_SQL = """
WITH rev AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       CAST(ROUND(rev, 4) AS DOUBLE) AS revenue,
       CAST(ROUND(CAST(rev / SUM(rev) OVER () * 100 AS DECIMAL(18,6)), 4) AS DOUBLE) AS share_pct
FROM rev
"""

QUERIES["x_revenue_share"] = x_revenue_share
ORACLE["x_revenue_share"] = X_REVSHARE_SQL


def x_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe large-large join, value-checked against the plain join:
    events joined to per-type stats on ``event_type`` — a 5-distinct-key
    join, the canonical pathological skew shape (every row hits one of 5
    shuffle partitions). ``operators/scale.py::salted_join`` spreads each
    hot key over 8 salt buckets by hashing the left row and replicating
    the right side per salt; the salt covers every left row exactly once,
    so the join result — and therefore this aggregate — is bit-identical
    to the unsalted plain join the oracle runs. Use when BOTH sides are
    too large to broadcast and AQE's skew split can't help (single
    logical key).
    """
    from webscale_multimodal_datapipeline_spark.operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    type_dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_n"))
    joined = salted_join(ev.select("event_type", "value"), type_dim, "event_type", 8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("type_n").alias("type_n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_value"),
    )


X_SALTED_SQL = """
WITH type_dim AS (
  SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY 1
)
SELECT e.event_type,
       COUNT(*) AS n,
       ANY_VALUE(d.type_n) AS type_n,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events e JOIN type_dim d USING (event_type)
GROUP BY e.event_type
"""

QUERIES["x_salted_skew_join"] = x_salted_skew_join
ORACLE["x_salted_skew_join"] = X_SALTED_SQL


def x_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: every token whose corpus frequency exceeds
    total/1000 (the phi=0.1% frequent-items threshold), with its share.
    At scale this is the shape to KEEP exact — one explode plus one
    map-side-combinable aggregate; the vocabulary-sized intermediate is
    the only shuffle. Sketches (Misra-Gries / Count-Min) only become
    necessary when the DISTINCT term space itself cannot be shuffled,
    and then only for the candidate pass — the final counts still come
    from this exact aggregate over the candidate set.
    """
    from webscale_multimodal_datapipeline_spark.functions import text as TX

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(TX.norm_tokens("text")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 1000 > F.col("total"))
        .select(
            "term",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
        )
    )


X_HEAVY_SQL = f"""
WITH toks AS (
  SELECT unnest({OQ.sql_tokens(OQ.sql_norm('text'))}) AS term FROM documents
), freq AS (
  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
)
SELECT term, cnt,
       ROUND(CAST(cnt AS DOUBLE) / (SELECT SUM(cnt) FROM freq), 6) AS share
FROM freq
WHERE cnt * 1000 > (SELECT SUM(cnt) FROM freq)
"""

QUERIES["x_heavy_hitters"] = x_heavy_hitters
ORACLE["x_heavy_hitters"] = X_HEAVY_SQL


def x_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group WITHOUT a window: ``max_by``/``min_by`` aggregation
    (DuckDB ``arg_max``/``arg_min``). For k=1 this halves the cost of the
    row_number() pattern — one map-side-combinable aggregate, no
    per-group sort, no rank column — the shape to prefer whenever "the
    best row per key" is the whole question. Deterministic tie-break by
    packing the tie key into the ordering struct."""
    c = load_table(spark, sf_dir, "customer")
    # richest customer per nation; ties (same acctbal) -> lowest custkey.
    # The ordering key is packed into ONE exact integer (cents * 1e8 -
    # custkey) rather than a struct: all-integer arithmetic is ordered
    # identically by both engines, and this DuckDB build's arg_max does
    # not take struct keys.
    ord_key = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * F.lit(100000000)
        - F.col("c_custkey")
    )
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", ord_key).alias("top_custkey"),
        F.max("c_acctbal").alias("top_acctbal"),
        F.min_by("c_custkey", ord_key).alias("bottom_custkey"),
        F.min("c_acctbal").alias("bottom_acctbal"),
    )


X_ARGMAX_SQL = """
SELECT c_nationkey,
       arg_max(c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100000000 - c_custkey) AS top_custkey,
       MAX(c_acctbal) AS top_acctbal,
       arg_min(c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100000000 - c_custkey) AS bottom_custkey,
       MIN(c_acctbal) AS bottom_acctbal
FROM customer GROUP BY c_nationkey
"""

QUERIES["x_argmax_agg"] = x_argmax_agg
ORACLE["x_argmax_agg"] = X_ARGMAX_SQL


def x_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` / ``IS NOT DISTINCT FROM``): join
    documents on a NULLABLE derived key where NULL must match NULL — the
    semantics plain ``=`` silently drops. The canonical trap when joining
    on optional attributes (e.g. detected language) at pipeline scale:
    every NULL-keyed row vanishes from an inner equi-join and no error
    tells you. Also exercises how the engine plans null-safe keys (they
    hash like normal keys — still a shuffle hash join, not a cartesian).
    """
    d = load_table(spark, sf_dir, "documents")
    # optional key: lang only when the doc is 'long'; NULL otherwise
    keyed = d.select(
        "doc_id",
        F.when(F.col("n_chars") >= 200, F.col("lang")).alias("opt_lang"),
    )
    stats = (
        keyed.groupBy("opt_lang")
        .agg(F.count(F.lit(1)).alias("grp_n"))
        .withColumnRenamed("opt_lang", "_s_lang")
    )
    joined = keyed.join(
        stats, F.col("opt_lang").eqNullSafe(F.col("_s_lang")), "inner"
    )
    return joined.select("doc_id", "opt_lang", "grp_n")


X_NULLSAFE_SQL = """
WITH keyed AS (
  SELECT doc_id,
         CASE WHEN n_chars >= 200 THEN lang END AS opt_lang
  FROM documents
), stats AS (
  SELECT opt_lang, COUNT(*) AS grp_n FROM keyed GROUP BY opt_lang
)
SELECT k.doc_id, k.opt_lang, s.grp_n
FROM keyed k JOIN stats s ON k.opt_lang IS NOT DISTINCT FROM s.opt_lang
"""

QUERIES["x_nullsafe_join"] = x_nullsafe_join
ORACLE["x_nullsafe_join"] = X_NULLSAFE_SQL


# ---------------------------------------------------------------------------
# Column profiling (ANALYZE-style one-pass table statistics)
# ---------------------------------------------------------------------------

_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


def x_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of ``orders``: per column — row count,
    null count, distinct count, numeric min/max (epoch-micros for the
    timestamp), and length min/max for strings. The stats-collection pass
    every catalog/optimizer needs (CBO inputs, data-quality drift
    monitors), expressed as ONE aggregation over ONE scan: all 6x5
    aggregates are map-side combinable, the output is 6 rows regardless
    of table size, and the per-column rows are exploded from the single
    aggregate row driver-side-free (an inline array, not a collect).

    distinct counts make this a 1-shuffle expand plan (Spark rewrites
    multi-countDistinct via EXPAND); at 100 TB swap exact distinct for
    approx_count_distinct — kept exact here for the cross-engine oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))

    def prof(col, min_num, max_num, min_len, max_len):
        return F.struct(
            F.lit(col).alias("column_name"),
            n.cast("bigint").alias("n_rows"),
            (n - F.count(col)).cast("bigint").alias("n_nulls"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            min_num.cast("double").alias("min_num"),
            max_num.cast("double").alias("max_num"),
            min_len.cast("bigint").alias("min_len"),
            max_len.cast("bigint").alias("max_len"),
        )

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("bigint")
    structs = [
        prof(c, F.min(c), F.max(c), null_l, null_l) for c in _PROFILE_NUM
    ] + [
        prof(c, null_d, null_d, F.min(F.length(c)), F.max(F.length(c)))
        for c in _PROFILE_STR
    ] + [
        prof(
            # timestamp min/max as yyyyMMddHHmmss numerics: NTZ-formatted,
            # so the value is identical under ANY session timezone (the
            # driver runs a vanilla session with the host tz, not UTC)
            "o_orderdate",
            F.date_format(F.min("o_orderdate"), "yyyyMMddHHmmss").cast("bigint"),
            F.date_format(F.max("o_orderdate"), "yyyyMMddHHmmss").cast("bigint"),
            null_l,
            null_l,
        )
    ]
    return (
        o.agg(F.array(*structs).alias("_p"))
        .select(F.explode("_p").alias("p"))
        .select("p.*")
    )


def _profile_row_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        ln, lx = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
    elif kind == "str":
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ln, lx = f"MIN(length({col}))", f"MAX(length({col}))"
    else:  # ts
        mn = f"CAST(CAST(strftime(MIN({col}), '%Y%m%d%H%M%S') AS BIGINT) AS DOUBLE)"
        mx = f"CAST(CAST(strftime(MAX({col}), '%Y%m%d%H%M%S') AS BIGINT) AS DOUBLE)"
        ln, lx = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
    return f"""
  SELECT '{col}' AS column_name,
         COUNT(*) AS n_rows,
         COUNT(*) - COUNT({col}) AS n_nulls,
         COUNT(DISTINCT {col}) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         CAST({ln} AS BIGINT) AS min_len, CAST({lx} AS BIGINT) AS max_len
  FROM orders"""


X_PROFILE_SQL = "\nUNION ALL\n".join(
    [_profile_row_sql(c, "num") for c in _PROFILE_NUM]
    + [_profile_row_sql(c, "str") for c in _PROFILE_STR]
    + [_profile_row_sql("o_orderdate", "ts")]
)

QUERIES["x_column_profile"] = x_column_profile
ORACLE["x_column_profile"] = X_PROFILE_SQL


# ---------------------------------------------------------------------------
# Equi-width histogram (distribution summary without a sort)
# ---------------------------------------------------------------------------

_HIST_WIDTH = 30000.0
_HIST_BINS = 20


def x_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: 20 bins of width 30000 with
    the last bin open-ended — the distribution summary behind data-drift
    monitors and skew diagnostics. Binning is a codegen'd floor division
    (no sort, no window); the aggregate is map-side combinable and its
    output is bounded by the bin count, so the shape survives any scale.
    Bin sums accumulate as exact decimals (order-free), surfaced as
    rounded doubles per the repo's float discipline.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(_HIST_WIDTH)).cast("bigint"),
        F.lit(_HIST_BINS - 1),
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("o_totalprice")), 4).cast("double").alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(_HIST_WIDTH)).alias("lo"),
            ((F.col("bucket") + 1) * F.lit(_HIST_WIDTH)).alias("hi"),
            "n",
            "sum_price",
        )
    )


X_HIST_SQL = f"""
SELECT bucket,
       bucket * {_HIST_WIDTH!r} AS lo,
       (bucket + 1) * {_HIST_WIDTH!r} AS hi,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_price
FROM (
  SELECT least(CAST(FLOOR(o_totalprice / {_HIST_WIDTH!r}) AS BIGINT),
               {_HIST_BINS - 1}) AS bucket,
         o_totalprice
  FROM orders
)
GROUP BY bucket
"""

QUERIES["x_histogram"] = x_histogram
ORACLE["x_histogram"] = X_HIST_SQL


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (beyond the cube/rollup coverage)
# ---------------------------------------------------------------------------


def x_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by GROUPING SETS ((flag, priority), (priority), ()) — a
    non-hierarchical set list neither ROLLUP nor CUBE expresses alone
    (SURVEY §2.6 'not present' family, completing cube/rollup). Spark
    side: CUBE + a grouping_id filter — Catalyst expands both to the
    same Expand node, and the filter prunes the unwanted (flag-only)
    grouping BEFORE the aggregate, so the shuffle carries exactly the
    three requested groupings. Decimal-disciplined like q1."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    cubed = (
        j.cube("l_returnflag", "o_orderpriority")
        .agg(
            F.round(F.sum(rev), 4).cast("double").alias("revenue"),
            F.grouping_id().alias("_gid"),
        )
        # keep (flag,priority)=0b00, (priority)=0b10, ()=0b11; drop 0b01
        .filter(F.col("_gid") != 1)
    )
    return cubed.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "revenue",
    )


X_GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY GROUPING SETS ((l_returnflag, o_orderpriority), (o_orderpriority), ())
"""

QUERIES["x_grouping_sets"] = x_grouping_sets
ORACLE["x_grouping_sets"] = X_GROUPING_SETS_SQL


# ---------------------------------------------------------------------------
# Count-min sketch (bounded-memory frequency estimation)
# ---------------------------------------------------------------------------

_CMS_SEEDS = 3
_CMS_BUCKETS = 1024


def x_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: k=3 seeded hash rows ×
    m=1024 buckets — the bounded-memory frequency summary (Cormode &
    Muthukrishnan 2005) whose size is k·m REGARDLESS of corpus scale
    (vs the unbounded exact term dictionary). Estimate = min over rows
    of the bucket counters; by construction est ≥ true count, with
    overestimate bounded by collisions. Output: the 10 most frequent
    terms with exact AND sketch counts — the deterministic md5 bucket
    hashes make the sketch itself bit-identical cross-engine, so this
    oracle checks VALUES, not just the ≥ invariant.

    Scale shape (r10 rewrite, guide §2.3 "aggregate before you shuffle"):
    ONE grouping-sets aggregation computes the exact head grouping
    (term, b0, b1, b2) AND the three per-seed bucket totals — the gid
    filter in each consuming branch is pushed into its Expand, so every
    branch's corpus pass projects exactly the columns that grouping
    needs (the old spelling ran one full-width head pass plus three
    separate sketch group-bys over re-derived token streams). The probe
    then joins the 10-row head against the three ≤1024-row sketch
    slices. Values identical (collect-compared at sf0.1)."""
    from webscale_multimodal_datapipeline_spark.functions import text as TX

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(TX.norm_tokens("text")).alias("term"))
    # TERM-FIRST aggregation (r10 second rewrite, guide §2.3 "aggregate
    # before you shuffle" taken one step further): the bucket hashes
    # depend only on the TERM, so count terms exactly once — a map-side
    # combinable aggregate whose exchange carries (term, partial count),
    # no Expand, no per-token md5 — and derive the 3 md5 bucket keys on
    # the VOCABULARY-sized result. Sketch row s is then a sum of term
    # counts grouped by bucket (identical totals), and the exact head is
    # the top-10 of the same table. All four consumers sit on the one
    # term exchange (AQE stage reuse). The r10s1 groupingSets spelling
    # Expand-ed the token stream ×4 and hashed every token 3×.
    buckets = [
        F.pmod(TX.md5_long(F.concat(F.col("term"), F.lit(f"#c{s}"))), F.lit(_CMS_BUCKETS)).alias(f"_b{s}")
        for s in range(_CMS_SEEDS)
    ]
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    keyed = freq.select("term", "_c", *buckets)
    head = (
        keyed.select(
            "term",
            *[f"_b{s}" for s in range(_CMS_SEEDS)],
            F.col("_c").alias("exact_cnt"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(10)
    )
    probe = head
    for s in range(_CMS_SEEDS):
        srow = keyed.groupBy(F.col(f"_b{s}").alias(f"_k{s}")).agg(
            F.sum("_c").alias(f"_c{s}")
        )
        probe = probe.join(F.broadcast(srow), F.col(f"_b{s}") == F.col(f"_k{s}"))
    est = F.least(*[F.col(f"_c{s}") for s in range(_CMS_SEEDS)])
    return probe.select(
        "term",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        est.cast("bigint").alias("cms_est"),
        (est >= F.col("exact_cnt")).alias("no_underestimate"),
    )


_CMS_BUCKET_SQL = {
    s: OQ.sql_md5_long(f"concat(term, '#c{s}')") + f" % {_CMS_BUCKETS}"
    for s in range(_CMS_SEEDS)
}

X_CMS_SQL = f"""
WITH toks AS (
  SELECT unnest({OQ.sql_tokens(OQ.sql_norm('text'))}) AS term FROM documents
), keyed AS (
  SELECT term, {", ".join(f"{_CMS_BUCKET_SQL[s]} AS b{s}" for s in range(_CMS_SEEDS))}
  FROM toks
), head AS (
  SELECT term, b0, b1, b2, COUNT(*) AS exact_cnt
  FROM keyed GROUP BY 1, 2, 3, 4
  ORDER BY exact_cnt DESC, term ASC LIMIT 10
),{", ".join(f'''
sk{s} AS (SELECT b{s} AS b, COUNT(*) AS c FROM keyed GROUP BY 1)''' for s in range(_CMS_SEEDS))}
SELECT head.term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(LEAST(sk0.c, sk1.c, sk2.c) AS BIGINT) AS cms_est,
       LEAST(sk0.c, sk1.c, sk2.c) >= exact_cnt AS no_underestimate
FROM head
JOIN sk0 ON head.b0 = sk0.b
JOIN sk1 ON head.b1 = sk1.b
JOIN sk2 ON head.b2 = sk2.b
"""

QUERIES["x_countmin_topk"] = x_countmin_topk
ORACLE["x_countmin_topk"] = X_CMS_SQL


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — multi-objective curation shortlist
# ---------------------------------------------------------------------------


def x_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier of parts on (retailprice ↓ better,
    size ↑ better) — the skyline operator (Börzsönyi et al. 2001), the
    shape used to shortlist "cheapest at each capability level" (and in
    curation: best quality at each length band). Distinct-value skyline:
    exact (price, size) duplicates collapse first, so dominance needs no
    strictness case-split.

    NO pairwise dominance join (that's O(n²) per brand): sort each brand
    by (price asc, size desc) and keep rows whose size exceeds the running
    max over all STRICTLY EARLIER rows — a single partitioned WindowExec
    after one shuffle on brand; any earlier row has price ≤ mine (or equal
    price with larger size), so ``prev_max ≥ my size`` ⇔ dominated."""
    p = (
        load_table(spark, sf_dir, "part")
        .select("p_brand", "p_retailprice", "p_size")
        .distinct()
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        p.withColumn("_prev_max", F.max("p_size").over(w))
        .where(F.col("_prev_max").isNull() | (F.col("p_size") > F.col("_prev_max")))
        .select("p_brand", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size"))
        .orderBy("p_brand", "p_retailprice")
    )


X_PARETO_SQL = """
WITH d AS (
  SELECT DISTINCT p_brand, p_retailprice, p_size FROM part
), flagged AS (
  SELECT p_brand, p_retailprice, p_size,
         MAX(p_size) OVER (
           PARTITION BY p_brand ORDER BY p_retailprice ASC, p_size DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM d
)
SELECT p_brand, p_retailprice, CAST(p_size AS BIGINT) AS p_size
FROM flagged
WHERE prev_max IS NULL OR p_size > prev_max
ORDER BY p_brand, p_retailprice
"""

QUERIES["x_pareto_frontier"] = x_pareto_frontier
ORACLE["x_pareto_frontier"] = X_PARETO_SQL


def x_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median unit price per supplier (weights =
    quantities) — the robust per-entity price statistic approx-percentile
    can't give you exactly. Cumulative-weight crossing point: the
    smallest price whose running quantity share reaches half the total.

    Scale shape: ONE window pass per supplier key (millions of keys —
    hash-distributed, no global sort) + a min-conditional aggregate on
    the same partitioning; the within-price tie order can shift which
    ROW crosses the half-line but never which PRICE, so the result is
    deterministic under any shuffle order (ordering still pinned by
    (price, orderkey, linenumber) so both engines walk identically)."""
    l = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_suppkey")
    cum = (
        l.withColumn("_cum", F.sum("l_quantity").over(w))
        .withColumn("_tot", F.sum("l_quantity").over(wt))
    )
    return (
        cum.groupBy("l_suppkey")
        .agg(
            F.min(
                F.when(2 * F.col("_cum") >= F.col("_tot"), F.col("l_extendedprice"))
            ).alias("weighted_median_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


X_WEIGHTED_MEDIAN_SQL = """
WITH cum AS (
  SELECT l_suppkey, l_extendedprice,
         SUM(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(l_quantity) OVER (PARTITION BY l_suppkey) AS t
  FROM lineitem
)
SELECT l_suppkey,
       MIN(CASE WHEN 2 * c >= t THEN l_extendedprice END) AS weighted_median_price,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM cum GROUP BY l_suppkey
"""

QUERIES["x_weighted_median"] = x_weighted_median
ORACLE["x_weighted_median"] = X_WEIGHTED_MEDIAN_SQL


# ---------------------------------------------------------------------------
# Native median + deterministic mode
# ---------------------------------------------------------------------------


def x_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation central-tendency profile: exact interpolated ``median``
    (the native aggregate — percentile(0.5), avg-of-middle-two on even
    counts, identical interpolation in DuckDB) plus the deterministic
    MODE of the market segment (most frequent; ties broken to the
    lexicographically smallest — native ``mode()`` is tie-arbitrary in
    both engines, so the deterministic form is a count rollup + one
    row_number over the tiny (nation, segment) table, the
    ``x_argmax_agg`` discipline).

    Scale shape: median is one partial-aggregatable pass per nation key;
    the mode rollup's window runs on a |nations|×|segments| table —
    bounded, never data-scale."""
    c = load_table(spark, sf_dir, "customer")
    med = c.groupBy("c_nationkey").agg(
        F.median("c_acctbal").alias("median_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    seg_counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cnt"), F.asc("c_mktsegment")
    )
    mode = (
        seg_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"))
    )
    return (
        med.join(mode, "c_nationkey")
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "n_customers",
            F.round("median_acctbal", 4).alias("median_acctbal"),
            "mode_segment",
        )
        .orderBy("nationkey")
    )


X_MODE_MEDIAN_SQL = """
WITH med AS (
  SELECT c_nationkey, MEDIAN(c_acctbal) AS median_acctbal,
         COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
), seg AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY c_nationkey, c_mktsegment
), mode AS (
  SELECT c_nationkey, c_mktsegment AS mode_segment
  FROM (
    SELECT c_nationkey, c_mktsegment,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY cnt DESC, c_mktsegment ASC) AS rn
    FROM seg
  ) WHERE rn = 1
)
SELECT CAST(med.c_nationkey AS BIGINT) AS nationkey, n_customers,
       ROUND(median_acctbal, 4) AS median_acctbal, mode_segment
FROM med JOIN mode ON med.c_nationkey = mode.c_nationkey
ORDER BY nationkey
"""

QUERIES["x_mode_median"] = x_mode_median
ORACLE["x_mode_median"] = X_MODE_MEDIAN_SQL


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


def x_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    data-quality screen for fabricated or truncated numeric columns
    (synthetic generators and unit bugs rarely reproduce the log
    distribution). Emits per-digit observed counts, observed share in
    exact basis points, and the Benford expectation log10(1+1/d) rounded
    to 4 dp — the reviewer compares columns, no chi-square verdict is
    baked in (sample-size policy belongs to the caller).

    Scale shape: one map-side-combinable aggregate over a 9-value key;
    the first digit comes from string math (no float log in the hot
    path). Bounded 9-row output."""
    import math

    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(F.regexp_replace(F.col("o_totalprice").cast("string"), r"[^1-9]", ""), 1, 1)
    # rows with no extractable first digit (NULL price) are outside the
    # audit's domain in BOTH the counts and the denominator
    counts = (
        o.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull() & (F.col("digit") != ""))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("tot"))
    expected = {str(d): round(math.log10(1 + 1 / d), 4) for d in range(1, 10)}
    exp_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in expected.items() for x in kv]),
        F.col("digit"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("n * 10000 div tot").alias("observed_bps"),
            exp_col.alias("benford_expected"),
        )
        .orderBy("digit")
    )


_BENFORD_MAP = ", ".join(
    f"('{d}', {round(__import__('math').log10(1 + 1 / d), 4)})" for d in range(1, 10)
)

X_BENFORD_SQL = f"""
WITH counts AS (
  SELECT digit, COUNT(*) AS n FROM (
    SELECT substr(regexp_replace(CAST(o_totalprice AS VARCHAR), '[^1-9]', '', 'g'), 1, 1) AS digit
    FROM orders
  ) WHERE digit IS NOT NULL AND digit <> ''
  GROUP BY 1
), total AS (SELECT SUM(n) AS tot FROM counts),
exp_map(digit, benford_expected) AS (VALUES {_BENFORD_MAP})
SELECT c.digit, c.n,
       CAST(c.n * 10000 // t.tot AS BIGINT) AS observed_bps,
       e.benford_expected
FROM counts c CROSS JOIN total t JOIN exp_map e ON c.digit = e.digit
ORDER BY c.digit
"""

QUERIES["x_benford_audit"] = x_benford_audit
ORACLE["x_benford_audit"] = X_BENFORD_SQL


# ---------------------------------------------------------------------------
# Correlation matrix (exact power sums)
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def x_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every pair of lineitem measures from ONE
    aggregation pass of exact decimal power sums (n, Σx, Σx², Σxy — the
    ``a_welch_ab_test`` discipline extended to covariance): inputs have
    ≤2 dp so the decimal sums are merge-order-free, and each correlation
    is a single identical float expression tree in both engines.

    Scale shape: one map-side-combinable global aggregate (a dozen
    decimal accumulators), 6-row bounded output — the naive per-pair
    ``corr()`` calls would scan the fact table C(4,2) times."""
    l = load_table(spark, sf_dir, "lineitem")
    d2, d4 = "decimal(24,2)", "decimal(30,4)"
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast(d2)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c).cast(d2) * F.col(c).cast(d2)).cast(d4))
            .cast("double")
            .alias(f"ss_{c}")
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            aggs.append(
                F.sum((F.col(a).cast(d2) * F.col(b).cast(d2)).cast(d4))
                .cast("double")
                .alias(f"sp_{a}_{b}")
            )
    sums = l.agg(*aggs)
    # all 6 pairs explode out of the ONE aggregate row (a 6-arm union of
    # selects over `sums` would let the physical plan recompute the fact
    # scan per arm)
    pair_structs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            n = F.col("n")
            cov = F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / n
            va = F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / n
            vb = F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / n
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(cov / F.sqrt(va * vb), 6).alias("pearson_r"),
                )
            )
    return (
        sums.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.pearson_r")
        .orderBy("col_a", "col_b")
    )


def _corr_arm_sql(a: str, b: str) -> str:
    n = "CAST(COUNT(*) AS DOUBLE)"
    s = lambda c: f"CAST(SUM(CAST({c} AS DECIMAL(24,2))) AS DOUBLE)"  # noqa: E731
    ss = lambda c: f"CAST(SUM(CAST(CAST({c} AS DECIMAL(24,2)) * CAST({c} AS DECIMAL(24,2)) AS DECIMAL(30,4))) AS DOUBLE)"  # noqa: E731
    sp = f"CAST(SUM(CAST(CAST({a} AS DECIMAL(24,2)) * CAST({b} AS DECIMAL(24,2)) AS DECIMAL(30,4))) AS DOUBLE)"
    return f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       ROUND(({sp} - {s(a)} * {s(b)} / {n})
             / sqrt(({ss(a)} - {s(a)} * {s(a)} / {n})
                    * ({ss(b)} - {s(b)} * {s(b)} / {n})), 6) AS pearson_r
FROM lineitem"""


X_CORR_SQL = (
    "\nUNION ALL\n".join(
        _corr_arm_sql(a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    )
    + "\nORDER BY col_a, col_b"
)

QUERIES["x_correlation"] = x_correlation
ORACLE["x_correlation"] = X_CORR_SQL


# ---------------------------------------------------------------------------
# Market-basket co-occurrence
# ---------------------------------------------------------------------------

_BASKET_TOPK = 15


def x_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequently-bought-together: support counts for part pairs that
    co-occur in an order, with lift against independent popularity —
    the co-occurrence mining shape (recommendations, bundle detection,
    and in corpus work co-citation / co-download graphs).

    Scale shape: the pair explode is bounded by C(items-per-order, 2) —
    TPC-H orders hold ≤ 7 lineitems, so fanout is ≤ 21 pairs/order,
    never corpus-quadratic (the g_triangle_count guard). Support
    aggregates map-side; lift = support·N / (pop_a·pop_b) computes on
    the bounded top-k only, with popularity joined from the part-keyed
    rollup. Integer support ranks deterministically; lift in exact
    micros (non-negative integer div)."""
    l = load_table(spark, sf_dir, "lineitem")
    # keyless lineitems belong to no basket: Spark's .distinct().count()
    # would count a NULL orderkey that SQL's COUNT(DISTINCT) excludes,
    # skewing every lift denominator (section 28)
    items = (
        l.select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .distinct()
    )
    n_orders = items.select("l_orderkey").distinct().count()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(_BASKET_TOPK)
    )
    pop = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pop"))
    return (
        pairs.join(pop.alias("pa"), F.col("part_a") == F.col("pa.l_partkey"))
        .join(pop.alias("pb"), F.col("part_b") == F.col("pb.l_partkey"))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr(f"support * {n_orders} * 1000000 div (pa.pop * pb.pop)").alias(
                "lift_micros"
            ),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


X_BASKET_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY support DESC, part_a, part_b
  LIMIT {_BASKET_TOPK}
), pop AS (
  SELECT l_partkey, COUNT(*) AS pop FROM items GROUP BY 1
)
SELECT part_a, part_b, support,
       CAST(support * (SELECT n_orders FROM n) * 1000000
            // (pa.pop * pb.pop) AS BIGINT) AS lift_micros
FROM pairs JOIN pop pa ON part_a = pa.l_partkey
           JOIN pop pb ON part_b = pb.l_partkey
ORDER BY support DESC, part_a, part_b
"""

QUERIES["x_market_basket"] = x_market_basket
ORACLE["x_market_basket"] = X_BASKET_SQL


# ---------------------------------------------------------------------------
# Entity resolution (block -> match -> cluster)
# ---------------------------------------------------------------------------


def x_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over part names — the three-stage ER
    pipeline (Fellegi-Sunter shape) composed from the engine's own
    parts: (1) BLOCKING by (first token, name length); (2) MATCH with
    ``levenshtein ≤ 2`` inside blocks; (3) CLUSTER via transitive
    closure. Output: the cluster-size histogram + entity/cluster totals,
    the dedup-rate readout an MDM pipeline reports.

    Round 8 (sf1 sweep): matching and closure run at the DISTINCT-NAME
    level, with per-name entity counts expanded only into the final
    cluster sizes. Value-IDENTICAL to the entity-level formulation —
    identical names always match (same block, distance 0), so an entity
    cluster is exactly the union of its name cluster's entities — but
    the pair set and the closure graph are bounded by distinct names,
    not rows: the entity-level spelling built 312M pairs at sf1 (64
    names over 200K parts; quadratic in the duplication factor) where
    this builds at most 64·63/2.

    Scale shape: one groupBy for name multiplicities; the self-join and
    the closure touch the distinct-name relation only."""
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        connected_components,
    )

    p = load_table(spark, sf_dir, "part")
    ncnt = (
        p.groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    blocked = ncnt.select(
        "name",
        F.concat_ws(
            "|", F.split("name", " ")[0], F.length("name").cast("string")
        ).alias("blk"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 2)
        .select(F.col("a.name").alias("id_l"), F.col("b.name").alias("id_r"))
    )
    comp = connected_components(pairs)
    labeled = ncnt.join(comp, ncnt["name"] == comp["id"], "left").select(
        F.coalesce(F.col("comp"), F.col("name")).alias("comp"), "cnt"
    )
    sizes = labeled.groupBy("comp").agg(
        F.sum("cnt").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


X_ER_SQL = """
WITH RECURSIVE ncnt AS (
  SELECT p_name AS name, COUNT(*) AS cnt FROM part GROUP BY p_name
), blocked AS (
  SELECT name,
         concat_ws('|', string_split(name, ' ')[1], CAST(length(name) AS VARCHAR)) AS blk
  FROM ncnt
), npairs AS (
  SELECT a.name AS id_l, b.name AS id_r
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 2
), edges AS (
  SELECT id_l AS src, id_r AS dst FROM npairs
  UNION ALL
  SELECT id_r AS src, id_l AS dst FROM npairs
), nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
), labeled AS (
  SELECT COALESCE(c.comp, n.name) AS comp, n.cnt
  FROM ncnt n LEFT JOIN comp c ON n.name = c.id
), sizes AS (
  SELECT comp, CAST(SUM(cnt) AS BIGINT) AS cluster_size FROM labeled GROUP BY comp
)
SELECT cluster_size, COUNT(*) AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""
QUERIES["x_entity_resolution"] = x_entity_resolution
ORACLE["x_entity_resolution"] = X_ER_SQL


# ---------------------------------------------------------------------------
# Chi-square deviation cells
# ---------------------------------------------------------------------------


def x_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence audit for (market segment × nation): the top-10
    contingency cells by chi-square contribution — "which combinations
    are over/under-represented" (the mix-shift screen run on corpus
    metadata before attributing a metric move to quality).

    Determinism: observed/row/col/total counts are exact integers; each
    cell's contribution (o − e)²/e = (o·n − rt·ct)² / (n·rt·ct) is ONE
    float division of exact integer products (decimal(38,0) numerators),
    so every emitted value is a single identical expression tree — no
    cross-cell float sum is ever formed (a total chi² would accumulate
    in engine-specific order; consumers can sum the bounded cells).

    Scale shape: one (seg, nation) rollup, two bounded marginal rollups
    joined back on bounded keys; top-10 deterministic."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("o")
    )
    rt = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("rt"))
    ct = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("ct"))
    n = c.count()
    dec = "decimal(38,0)"
    joined = cells.join(rt, "c_mktsegment").join(ct, "c_nationkey")
    contrib = (
        (F.col("o").cast(dec) * F.lit(n) - F.col("rt").cast(dec) * F.col("ct")).cast(
            "double"
        )
        ** 2
    ) / (
        F.lit(float(n)) * F.col("rt").cast("double") * F.col("ct").cast("double")
    )
    return (
        joined.select(
            "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "o",
            F.round(contrib, 6).alias("chi2_contrib"),
        )
        .orderBy(F.desc("chi2_contrib"), "c_mktsegment", "nationkey")
        .limit(10)
    )


X_CHI2_SQL = """
WITH cells AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS o
  FROM customer GROUP BY 1, 2
), rt AS (SELECT c_mktsegment, COUNT(*) AS rt FROM customer GROUP BY 1),
ct AS (SELECT c_nationkey, COUNT(*) AS ct FROM customer GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM customer)
SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nationkey, o,
       ROUND(pow(CAST(o * n.n - rt.rt * ct.ct AS DOUBLE), 2)
             / (CAST(n.n AS DOUBLE) * CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)),
             6) AS chi2_contrib
FROM cells JOIN rt USING (c_mktsegment) JOIN ct USING (c_nationkey), n
ORDER BY chi2_contrib DESC, c_mktsegment, nationkey
LIMIT 10
"""

QUERIES["x_chi2_cells"] = x_chi2_cells
ORACLE["x_chi2_cells"] = X_CHI2_SQL


# ---------------------------------------------------------------------------
# Cramér's V (categorical association strength)
# ---------------------------------------------------------------------------


def x_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for (event type × hour of day): the normalized 0-1
    "are these two categoricals associated" number that makes chi-square
    comparable across tables — the one-glance answer to "is traffic mix
    time-of-day dependent" before hour-stratified sampling is worth it.
    Extends ``x_chi2_cells`` (which ranks cells) to the corpus-level
    statistic.

    Determinism: each cell contribution ``(o·n − rt·ct)²/(n·rt·ct)`` is
    one float division of exact integer products (the x_chi2_cells
    discipline), rounded to 6 and summed as DECIMAL — no engine-ordered
    float accumulation; V = sqrt(χ² / (n·min(r−1, c−1))) is a single
    expression over that exact sum.

    Scale shape: one (type × hour) rollup — both domains bounded — two
    bounded marginals, scalar output.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    cells = ev.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = cells.groupBy("hr").agg(F.sum("o").alias("ct"))
    dims = (
        rt.agg(F.count(F.lit(1)).alias("r"), F.sum("rt").alias("n"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("c")))
    )
    contrib = F.round(
        (
            (F.col("o") * F.col("n") - F.col("rt") * F.col("ct")).cast("double")
            * (F.col("o") * F.col("n") - F.col("rt") * F.col("ct")).cast(
                "double"
            )
        )
        / (F.col("n") * F.col("rt") * F.col("ct")).cast("double"),
        6,
    ).cast("decimal(18,6)")
    return (
        cells.join(rt, "event_type")
        .join(ct, "hr")
        .crossJoin(F.broadcast(dims))
        .select("n", "r", "c", contrib.alias("t"))
        .groupBy("n", "r", "c")
        .agg(F.sum("t").cast("double").alias("chi2"))
        .select(
            F.col("n").cast("bigint").alias("n_events"),
            F.col("r").cast("bigint").alias("n_rows"),
            F.col("c").cast("bigint").alias("n_cols"),
            "chi2",
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1)
                    ).cast("double")
                ),
                6,
            ).alias("cramers_v"),
        )
    )


X_CRAMERS_SQL = """
WITH ev AS (SELECT event_type, hour(ts) AS hr FROM events),
cells AS (SELECT event_type, hr, COUNT(*) AS o FROM ev GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY 1),
ct AS (SELECT hr, SUM(o) AS ct FROM cells GROUP BY 1),
dims AS (SELECT (SELECT COUNT(*) FROM rt) AS r, (SELECT COUNT(*) FROM ct) AS c,
                (SELECT SUM(rt) FROM rt) AS n)
SELECT CAST(n AS BIGINT) AS n_events, CAST(r AS BIGINT) AS n_rows,
       CAST(c AS BIGINT) AS n_cols,
       CAST(SUM(CAST(ROUND(
           (CAST(o * n - rt.rt * ct.ct AS DOUBLE)
            * CAST(o * n - rt.rt * ct.ct AS DOUBLE))
           / CAST(n * rt.rt * ct.ct AS DOUBLE), 6) AS DECIMAL(18,6)))
         AS DOUBLE) AS chi2,
       ROUND(sqrt(CAST(SUM(CAST(ROUND(
           (CAST(o * n - rt.rt * ct.ct AS DOUBLE)
            * CAST(o * n - rt.rt * ct.ct AS DOUBLE))
           / CAST(n * rt.rt * ct.ct AS DOUBLE), 6) AS DECIMAL(18,6)))
         AS DOUBLE) / CAST(n * least(r - 1, c - 1) AS DOUBLE)), 6) AS cramers_v
FROM cells JOIN rt USING (event_type) JOIN ct USING (hr), dims
GROUP BY n, r, c
"""

QUERIES["x_cramers_v"] = x_cramers_v
ORACLE["x_cramers_v"] = X_CRAMERS_SQL


# ---------------------------------------------------------------------------
# Id-space gap audit (ingestion-loss forensics)
# ---------------------------------------------------------------------------

_GAP_RANGE = 1000
_GAP_TOPK = 20


def x_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where did the ids go? Deficit census of an id space: count keys
    present per fixed 1000-wide range between the subset's min and max
    and surface the ranges missing the most — the ingestion-loss /
    filter-loss forensic that finds a dropped shard, a truncated
    export, or a range-localized rejection spike WITHOUT enumerating
    the (output-unbounded) individual gaps. Audited here on the
    finished-order subset (``o_orderstatus = 'F'``), whose id space is
    naturally sparse — the deficit per range IS the non-finished mass.

    Deliberately WINDOW-FREE: the classic gaps-and-islands
    ``key − row_number()`` needs a data-sized global sort; the range
    rollup is one map-side-combinable aggregate at any scale, and the
    tail range's expected count is clamped to the actual key span. All
    exact integers.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    rng = o.groupBy(
        F.expr(f"o_orderkey div {_GAP_RANGE}").alias("range_id")
    ).agg(F.count(F.lit(1)).alias("n_present"))
    span = o.agg(F.min("o_orderkey").alias("kmin"), F.max("o_orderkey").alias("kmax"))
    expected = F.least(
        F.lit(_GAP_RANGE),
        F.col("kmax") - F.col("range_id") * _GAP_RANGE + 1,
    ) - F.greatest(
        F.lit(0), F.col("kmin") - F.col("range_id") * _GAP_RANGE
    )
    return (
        rng.crossJoin(F.broadcast(span))
        .select(
            (F.col("range_id") * _GAP_RANGE).cast("bigint").alias("range_start"),
            F.col("n_present").cast("bigint").alias("n_present"),
            (expected - F.col("n_present")).cast("bigint").alias("n_missing"),
        )
        .filter(F.col("n_missing") > 0)
        .orderBy(F.desc("n_missing"), "range_start")
        .limit(_GAP_TOPK)
    )


X_ID_GAP_SQL = f"""
WITH sub AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
rng AS (
  SELECT o_orderkey // {_GAP_RANGE} AS range_id, COUNT(*) AS n_present
  FROM sub GROUP BY 1
), span AS (SELECT MIN(o_orderkey) AS kmin, MAX(o_orderkey) AS kmax FROM sub)
SELECT CAST(range_id * {_GAP_RANGE} AS BIGINT) AS range_start,
       CAST(n_present AS BIGINT) AS n_present,
       CAST(least({_GAP_RANGE}, kmax - range_id * {_GAP_RANGE} + 1)
            - greatest(0, kmin - range_id * {_GAP_RANGE})
            - n_present AS BIGINT) AS n_missing
FROM rng, span
WHERE least({_GAP_RANGE}, kmax - range_id * {_GAP_RANGE} + 1)
      - greatest(0, kmin - range_id * {_GAP_RANGE}) - n_present > 0
ORDER BY n_missing DESC, range_start
LIMIT {_GAP_TOPK}
"""

QUERIES["x_id_gap_audit"] = x_id_gap_audit
ORACLE["x_id_gap_audit"] = X_ID_GAP_SQL


def x_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics audit: for the two workhorse TPC-H joins
    (customer⋈orders on custkey, orders⋈lineitem on orderkey), compare
    the uniform-NDV join-size estimate every cost-based optimizer starts
    from — |A|·|B| / max(ndv_A, ndv_B), Selinger 1979 — against the
    EXACT output size Σ_k cnt_A(k)·cnt_B(k), and report the q-error
    (max(est,actual)/min(est,actual), the standard estimator metric).
    This is the query a data engineer runs to see WHERE the uniformity
    assumption breaks (skewed keys → underestimate).

    All-integer algebra until the final two divisions; the exact size
    comes from joining the two sides' per-key count rollups (keys-only
    traffic — never materializing the join itself), which is the scale
    shape: at 100 TB the rollups are each side's group-by, and the
    estimate needs only 4 scalars."""
    out = []
    specs = (
        ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
        ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    )
    res = None
    for name, ta, ka, tb, kb in specs:
        # NULL join keys can never match, so they are excluded from BOTH
        # the row counts and the NDV by spec (SQL's COUNT(DISTINCT) also
        # ignores NULLs; without the filter Spark's rollup would carry a
        # NULL-key group the estimate denominator must not see — §24)
        a = (
            load_table(spark, sf_dir, ta)
            .filter(F.col(ka).isNotNull())
            .groupBy(F.col(ka).alias("k"))
            .agg(F.count(F.lit(1)).alias("ca"))
        )
        b = (
            load_table(spark, sf_dir, tb)
            .filter(F.col(kb).isNotNull())
            .groupBy(F.col(kb).alias("k"))
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        stats_a = a.agg(
            F.sum("ca").cast("long").alias("rows_a"),
            F.count(F.lit(1)).cast("long").alias("ndv_a"),
        )
        stats_b = b.agg(
            F.sum("cb").cast("long").alias("rows_b"),
            F.count(F.lit(1)).cast("long").alias("ndv_b"),
        )
        actual = a.join(b, "k").agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("long")
            .alias("actual_rows")
        )
        row = (
            stats_a.crossJoin(stats_b)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("join_name"),
                "rows_a",
                "rows_b",
                F.greatest("ndv_a", "ndv_b").cast("long").alias("ndv_max"),
                F.round(
                    F.col("rows_a").cast("double")
                    * F.col("rows_b").cast("double")
                    / F.greatest("ndv_a", "ndv_b").cast("double"),
                    6,
                ).alias("est_uniform"),
                "actual_rows",
            )
        )
        res = row if res is None else res.unionByName(row)
    q_err = F.greatest(
        F.col("est_uniform"), F.col("actual_rows").cast("double")
    ) / F.least(F.col("est_uniform"), F.col("actual_rows").cast("double"))
    return res.select(
        "join_name", "rows_a", "rows_b", "ndv_max", "est_uniform", "actual_rows",
        F.round(q_err, 6).alias("q_error"),
    ).orderBy("join_name")


X_JOIN_CARD_SQL = """
WITH spec AS (
  SELECT 'customer_orders' AS join_name,
         (SELECT COUNT(*) FROM customer WHERE c_custkey IS NOT NULL) AS rows_a,
         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL) AS rows_b,
         GREATEST((SELECT COUNT(DISTINCT c_custkey) FROM customer),
                  (SELECT COUNT(DISTINCT o_custkey) FROM orders)) AS ndv_max,
         (SELECT COALESCE(SUM(ca * cb), 0) FROM
            (SELECT c_custkey AS k, COUNT(*) AS ca FROM customer
             WHERE c_custkey IS NOT NULL GROUP BY 1) a
            JOIN (SELECT o_custkey AS k, COUNT(*) AS cb FROM orders
                  WHERE o_custkey IS NOT NULL GROUP BY 1) b
            USING (k)) AS actual_rows
  UNION ALL
  SELECT 'orders_lineitem',
         (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NOT NULL),
         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
         GREATEST((SELECT COUNT(DISTINCT o_orderkey) FROM orders),
                  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)),
         (SELECT COALESCE(SUM(ca * cb), 0) FROM
            (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders
             WHERE o_orderkey IS NOT NULL GROUP BY 1) a
            JOIN (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem
                  WHERE l_orderkey IS NOT NULL GROUP BY 1) b
            USING (k))
)
SELECT join_name,
       CAST(rows_a AS BIGINT) AS rows_a,
       CAST(rows_b AS BIGINT) AS rows_b,
       CAST(ndv_max AS BIGINT) AS ndv_max,
       ROUND(CAST(rows_a AS DOUBLE) * CAST(rows_b AS DOUBLE) / CAST(ndv_max AS DOUBLE), 6) AS est_uniform,
       CAST(actual_rows AS BIGINT) AS actual_rows,
       ROUND(GREATEST(CAST(rows_a AS DOUBLE) * CAST(rows_b AS DOUBLE) / CAST(ndv_max AS DOUBLE),
                      CAST(actual_rows AS DOUBLE))
             / LEAST(CAST(rows_a AS DOUBLE) * CAST(rows_b AS DOUBLE) / CAST(ndv_max AS DOUBLE),
                     CAST(actual_rows AS DOUBLE)), 6) AS q_error
FROM spec ORDER BY join_name
"""

QUERIES["x_join_cardinality_estimate"] = x_join_cardinality_estimate
ORACLE["x_join_cardinality_estimate"] = X_JOIN_CARD_SQL
