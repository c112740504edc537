"""Relational core: scans, filters, joins, aggregations, windows, sorts,
limits, set ops over the TPC-H-ish star schema (SURVEY §7 step 2).

The reference has no SQL layer (SURVEY §2.7: joins "None implemented"),
but its analytics/report layer does group-by aggregation
(``framework/metrics/reporter.py:689-701``) and its blocklist/rejected-rows
logic is semantically semi/anti-join. This module makes all of that
first-class, plus the join/agg/window coverage a real engine needs.

Plan-shape notes (verified via .explain):
- dimension joins (region/nation/supplier/customer) broadcast — no shuffle
  of the fact table for them;
- filters and projections push into the parquet scan (PushedFilters /
  ReadSchema);
- decimal accumulation: see plans/__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table

DEC = "decimal(18,6)"


def _dec(c):
    if isinstance(c, str):
        c = F.col(c)
    return c.cast(DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg over lineitem, 8 aggregates.
    One shuffle (partial agg map-side); filter pushes to parquet."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    # charge uses scale-4 casts so the triple product stays within
    # decimal(38,12) — exact in both engines (inputs all have <= 2 dp).
    dec4 = "decimal(12,4)"
    charge = (
        F.col("l_extendedprice").cast(dec4)
        * (1 - F.col("l_discount")).cast(dec4)
        * (1 + F.col("l_tax")).cast(dec4)
    )
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 4).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            (F.round(F.sum(_dec("l_quantity")), 4).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum(_dec("l_extendedprice")), 4).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum(_dec("l_discount")), 4).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4)) * CAST(1 + l_tax AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_charge,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + group + deterministic top-10.
    orders⋈lineitem shuffles on orderkey once. customer carries NO
    broadcast hint: it scales linearly with the corpus (hundreds of
    millions of rows at 100 TB), so a forced broadcast would OOM
    executors — AQE picks broadcast on its own when the filtered side
    is genuinely small. Hints stay only on bounded dims
    (nation/region/supplier)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    revenue = F.sum(_dec("l_extendedprice") * _dec(1 - F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; fixed-cardinality dims
    (nation=25, region=5) broadcast, SF-scaling supplier left to AQE,
    single fact shuffle for the final group-by."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(_dec("l_extendedprice") * _dec(1 - F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue, 4).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filter+agg — the predicate-pushdown
    showcase (all three filters reach the parquet reader)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) — the blocklist / rejected-rows shape
    (reference ``url_filter.py:217-234`` blocklist membership;
    ``framework/operator.py:240-265`` rejected split)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group: rank customers by acctbal within nation
    (deterministic tie-break on custkey)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", F.col("c_acctbal").alias("acctbal"), "rnk")
    )


Q_TOPCUST_SQL = """
SELECT n_name, c_custkey, c_acctbal AS acctbal, rnk
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rnk <= 3
"""


def q_running_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window running total: monthly order revenue + cumulative sum per
    order-status (funnel/timeline shape from the reference's report layer,
    ``metrics/reporter.py:762-773``)."""
    # undated orders are off the revenue timeline by spec: a NULL month
    # sorts FIRST in Spark's window order and LAST in DuckDB's, putting
    # the same row at opposite ends of the cumulative sum (section 28)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    monthly = (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
        )
        .agg(F.sum(_dec("o_totalprice")).alias("_rev_dec"), F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("status").orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "status",
        "month",
        F.round(F.col("_rev_dec"), 4).cast("double").alias("revenue"),
        "n_orders",
        F.round(F.sum("_rev_dec").over(w), 4).cast("double").alias("cum_revenue"),
    )


Q_RUNNING_SQL = """
SELECT status, month,
       CAST(ROUND(rev_dec, 4) AS DOUBLE) AS revenue,
       n_orders,
       CAST(ROUND(SUM(rev_dec) OVER (PARTITION BY status ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS cum_revenue
FROM (
  SELECT o_orderstatus AS status,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec,
         COUNT(*) AS n_orders
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
)
"""


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by over a dimension + distinct agg + percentile-free stats
    (the reference's A2/A3 aggregate shapes)."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_brand").alias("n_brands"),
        (F.round(F.sum(_dec("p_retailprice")), 4).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


Q_PARTTYPE_SQL = """
SELECT p_type,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT p_brand) AS n_brands,
       CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,6))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
       MIN(p_size) AS min_size,
       MAX(p_size) AS max_size
FROM part GROUP BY p_type
"""


def q_segment_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: custkeys with open ('O') orders EXCEPT custkeys with 'F'
    orders, UNION custkeys with acctbal > 9000 — union/except coverage
    (reference merges rejected streams via list-extend,
    ``framework/operator.py:419-430`` → unionByName)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    f_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return open_c.distinct().subtract(f_c).unionByName(rich).distinct()


Q_SETOPS_SQL = """
SELECT DISTINCT c_custkey FROM (
  SELECT c_custkey FROM (
    SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
  )
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
)
"""


def q_supplier_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (grouping-sets family): revenue by
    (nation, supplier) with subtotals — coverage beyond the reference
    (SURVEY §2.6 'not present' → first-class here)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .rollup("n_name", "s_name")
        .agg(F.round(F.sum(_dec("l_extendedprice")), 4).cast("double").alias("revenue"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("s_name", F.lit("ALL")).alias("supplier"),
            "revenue",
        )
    )


Q_ROLLUP_SQL = """
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(s_name, 'ALL') AS supplier,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, s_name)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_order_priority_count": q_order_priority_count,
    "q_customers_without_orders": q_customers_without_orders,
    "q_top_customers_per_nation": q_top_customers_per_nation,
    "q_running_revenue_by_month": q_running_revenue_by_month,
    "q_part_type_stats": q_part_type_stats,
    "q_segment_setops": q_segment_nation_setops,
    "q_supplier_rollup": q_supplier_cube,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q4_order_priority_count": Q4_SQL,
    "q_customers_without_orders": Q_ANTI_SQL,
    "q_top_customers_per_nation": Q_TOPCUST_SQL,
    "q_running_revenue_by_month": Q_RUNNING_SQL,
    "q_part_type_stats": Q_PARTTYPE_SQL,
    "q_segment_setops": Q_SETOPS_SQL,
    "q_supplier_rollup": Q_ROLLUP_SQL,
}
