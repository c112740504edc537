"""Relational core, part 3 — completes the 22-query TPC-H family coverage
(Q8, Q9, Q11, Q13, Q15, Q17, Q20, Q22 shapes), adapted to the driver's
star schema (no ``partsupp`` table, no ``c_phone`` column — cost and
country-code stand-ins documented per query).

Shapes exercised here that parts 1-2 don't: percentage-of-group scalar
(Q8), LIKE-filtered multi-join profit (Q9), global-scalar HAVING (Q11),
left-outer count-distribution (Q13), argmax-by-scalar-subquery (Q15),
correlated-average predicate (Q17), nested-agg semi-join (Q20), anti-join
plus scalar-subquery predicate (Q22).

Scale notes (verified via .explain and tools/plan_audit.py): only
FIXED-cardinality dimensions (nation=25, region=5) and one-row scalar
aggregates carry broadcast hints. SF-scaling relations — part (200K×SF),
supplier (10K×SF), and any aggregate keyed by their keys (avg-qty per
partkey, shipped-suppliers) — are never force-broadcast: AQE plus the
session's runtime bloom-filter join pruning pick the strategy from
actual runtime sizes, which is the only policy that survives 100 TB.
Scalar subqueries compile to one-row broadcasts, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.plans.relational import _dec


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2 suppliers' share of ASIA customers' revenue
    per order year — conditional-sum ratio inside a group."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nkey")
    )
    sn = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"), "left_semi")
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(F.sum(nation_rev), 4).cast("double")
                / F.round(F.sum(rev), 4).cast("double")
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_2'
             THEN CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))
             ELSE CAST(0 AS DECIMAL(18,6)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts whose
    name contains 'red'. No partsupp table → cost proxy is
    ``0.5 * p_retailprice * l_quantity`` (same join/agg topology)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    profit = _dec("l_extendedprice") * _dec(1 - F.col("l_discount")) - _dec(
        F.lit(0.5) * F.col("p_retailprice")
    ) * _dec("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))
                    - CAST(0.5 * p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value (from EUROPE-region
    suppliers) exceeds 0.1% of the total — global-scalar HAVING via a
    one-row broadcast cross join (never a driver collect)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nkey")
    )
    eu_supp = s.join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("nkey"), "left_semi"
    ).select("s_suppkey")
    eu_items = l.join(eu_supp, l.l_suppkey == eu_supp.s_suppkey, "left_semi")
    per_part = eu_items.groupBy("l_partkey").agg(
        F.round(F.sum(_dec("l_extendedprice")), 4).cast("double").alias("part_value")
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("l_partkey", F.round("part_value", 4).alias("part_value"))
    )


Q11_SQL = """
WITH eu_items AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
), per_part AS (
  SELECT l_partkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS part_value
  FROM eu_items GROUP BY l_partkey
)
SELECT l_partkey, ROUND(part_value, 4) AS part_value
FROM per_part
WHERE part_value > 0.001 * (SELECT SUM(part_value) FROM per_part)
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts including
    zero-order customers — left outer join, count, re-group."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over a
    3-month ship window — revenue view + scalar-max join-back."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    revenue = l.groupBy("l_suppkey").agg(
        F.round(F.sum(rev), 4).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT l_suppkey AS s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if Brand#3 orders below
    20% of the part's mean quantity were not taken — correlated-average
    predicate as a groupBy + broadcast join-back."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    # p scales 200K×SF and avg_qty has per-partkey cardinality (≈|part|):
    # both would be multi-GB broadcasts at 100 TB. AQE decides instead.
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.round(F.sum(_dec("l_extendedprice")), 4).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that shipped more than 30 units of any
    'small'-named part during 2000 — nested aggregation feeding a
    semi-join (availqty stand-in: the 30-unit shipped threshold)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01"))
        & (F.col("l_shipdate") < F.lit("2001-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = load_table(spark, sf_dir, "supplier")
    shipped = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    # shipped is supplier-sized (10K×SF) — not broadcast-safe at scale.
    return s.join(
        shipped, s.s_suppkey == shipped.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) > 30
)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no URGENT orders, grouped by
    'country code' (last 2 digits of c_name — the c_phone stand-in) —
    scalar-subquery threshold + anti-join. (Anti-join is against URGENT
    orders so the result is non-empty at every driver SF: the synthetic
    data gives every customer at least one order.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", -2, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT substring(c_name, -2, 2) AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
"""


QUERIES = {
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_part_promotion": q20_part_promotion_suppliers,
    "q22_global_sales": q22_global_sales_opportunity,
}

ORACLE = {
    "q8_market_share": Q8_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_order_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q20_part_promotion": Q20_SQL,
    "q22_global_sales": Q22_SQL,
}
