"""Relational core, part 2 — the TPC-H query families not covered in
``relational.py``: correlated/nested subqueries (min-per-group join-back,
NOT EXISTS with condition), disjunctive multi-predicate joins, HAVING,
distinct aggregation, CASE bucketing, percentage-of-total. All decimal
disciplined (see plans/__init__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.plans.relational import _dec


def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: supplier(s) offering each part's minimum lineitem
    price — correlated-min subquery as a groupBy + join-back."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    # min_p has per-partkey cardinality (≈|part|, which scales with SF) and
    # supplier scales 10K×SF — neither is broadcast-safe at 100 TB. No hints:
    # AQE + runtime bloom-filter pruning pick the strategy at actual size.
    min_p = l.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        l.join(min_p, ["l_partkey"])
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .select("l_partkey", "s_name", F.col("min_price").alias("price"))
        .distinct()
    )


Q_MINPRICE_SQL = """
SELECT DISTINCT l_partkey, s_name, l_extendedprice AS price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_extendedprice = (
  SELECT MIN(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
)
"""


def q2_argmax_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated-min rewritten as ONE argmin aggregate — the
    supplier with each part's minimum lineitem price, computed with
    ``min_by`` keyed on a (price, suppkey) struct so ties resolve
    deterministically to the smallest suppkey (reference behavior is
    first-seen-wins, nondeterministic — SURVEY §7 risk register).

    Scale shape vs q2_min_price_supplier: the groupBy + join-back +
    distinct (three lineitem-sized shuffles) collapse to one partial-agg
    combinable aggregate plus one supplier equi-join that AQE sizes —
    the map-side combine means only |part| rows ever reach the exchange."""
    # price-less or supplier-less lineitems can't win the argmin: Spark's
    # struct comparator sorts a NULL price FIRST (min_by would pick it)
    # while the oracle's ORDER BY sorts it LAST — excluded by spec in
    # both engines (section 28)
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    s = load_table(spark, sf_dir, "supplier")
    best = l.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("price"),
        F.min_by(
            "l_suppkey", F.struct("l_extendedprice", "l_suppkey")
        ).alias("best_suppkey"),
    )
    return best.join(s, best.best_suppkey == s.s_suppkey).select(
        "l_partkey", "s_name", "price"
    )


Q2_ARGMAX_SQL = """
SELECT l_partkey, s_name, price
FROM (
  SELECT l_partkey, l_suppkey, l_extendedprice AS price,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_suppkey) AS rn
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_suppkey IS NOT NULL
) t JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nation pairs by year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    vol = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(vol), 4).cast("double").alias("revenue"))
    )


Q_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q_RETURNED_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-bucketed counts — high/low priority per
    return flag (no shipmode column; returnflag plays its role)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_priority_count"),
            F.sum(1 - high).alias("low_priority_count"),
        )
    )


Q_SHIPMODE_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage-of-total — PROMO part revenue share."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    # part scales 200K×SF — never force-broadcast; AQE decides at runtime.
    j = l.join(p, l.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))), 4).cast("double")
            / F.round(F.sum(rev), 4).cast("double")
            * 100.0
        ).alias("promo_pct")
    )


Q_PROMO_SQL = """
SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE)
       * 100.0 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over grouped sum — orders with total
    quantity > 150."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return big.join(o, big.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_totalprice",
        "total_qty",
    )


Q_LARGE_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) JOIN orders ON l_orderkey = o_orderkey
"""


def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicates (brand/size/qty bands)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    pred = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(5, 20)) & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(10, 40)) & (F.col("l_quantity").between(20, 50)))
    )
    rev = _dec("l_extendedprice") * _dec(1 - F.col("l_discount"))
    return j.filter(pred).agg(
        F.round(F.sum(rev), 4).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q_DISJ_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
"""


def q_supplier_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavor: suppliers with lineitems in multi-supplier 'F'
    orders where they're the only supplier shipping late (> 2000-01-01) —
    nested EXISTS / NOT EXISTS as semi/anti joins."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = l.filter(F.col("l_shipdate") > F.lit("2000-01-01"))
    l1 = late.alias("l1")
    others = l.alias("l2")
    # exists another supplier in the same order
    has_other = l1.join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # no OTHER supplier shipped late in that order
    other_late = late.alias("l3")
    no_other_late = has_other.join(
        other_late,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        no_other_late.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .groupBy(F.col("l1.l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q_WAIT_SQL = """
SELECT l1.l_suppkey AS s_suppkey, COUNT(*) AS numwait
FROM lineitem l1
WHERE l1.l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > TIMESTAMP '2000-01-01 00:00:00')
  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
GROUP BY l1.l_suppkey
"""


def q_distinct_brands_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-agg with NOT IN exclusion — brands per
    part type, excluding two brands."""
    p = load_table(spark, sf_dir, "part").filter(~F.col("p_brand").isin("Brand#1", "Brand#2"))
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q_DISTINCT_SQL = """
SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
GROUP BY p_type, p_size
"""


def q_approx_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL pre-dedup cardinality estimate (SURVEY §2.6: free win the
    reference lacks) next to the exact count. Oracle-checkable form: the
    exact counts hash-match DuckDB, and the HLL estimate is exposed as a
    bounded-relative-error boolean (default rsd 0.05; bound 0.15 = 3σ)
    that the oracle pins to TRUE."""
    l = load_table(spark, sf_dir, "lineitem")
    exact_parts = F.countDistinct("l_partkey")
    exact_orders = F.countDistinct("l_orderkey")
    approx_parts = F.approx_count_distinct("l_partkey")
    approx_orders = F.approx_count_distinct("l_orderkey")
    return l.agg(
        exact_parts.alias("exact_parts"),
        exact_orders.alias("exact_orders"),
        (F.abs(approx_parts - exact_parts) <= 0.15 * exact_parts).alias(
            "approx_parts_ok"
        ),
        (F.abs(approx_orders - exact_orders) <= 0.15 * exact_orders).alias(
            "approx_orders_ok"
        ),
    )


Q_APPROX_CARD_SQL = """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS approx_parts_ok,
       TRUE AS approx_orders_ok
FROM lineitem
"""


QUERIES = {
    "q2_min_price_supplier": q_min_price_supplier,
    "q2_argmax_min_price": q2_argmax_min_price,
    "q7_volume_shipping": q_volume_shipping,
    "q10_returned_items": q_returned_items,
    "q12_shipmode_priority": q_shipmode_priority,
    "q14_promo_revenue_pct": q_promo_revenue_pct,
    "q18_large_orders": q_large_orders,
    "q19_disjunctive_predicates": q_disjunctive_predicates,
    "q21_supplier_wait": q_supplier_wait,
    "q16_distinct_brands": q_distinct_brands_not_in,
    "q_approx_cardinality": q_approx_cardinality,
}

ORACLE = {
    "q2_min_price_supplier": Q_MINPRICE_SQL,
    "q2_argmax_min_price": Q2_ARGMAX_SQL,
    "q7_volume_shipping": Q_VOLUME_SQL,
    "q10_returned_items": Q_RETURNED_SQL,
    "q12_shipmode_priority": Q_SHIPMODE_SQL,
    "q14_promo_revenue_pct": Q_PROMO_SQL,
    "q18_large_orders": Q_LARGE_SQL,
    "q19_disjunctive_predicates": Q_DISJ_SQL,
    "q21_supplier_wait": Q_WAIT_SQL,
    "q16_distinct_brands": Q_DISTINCT_SQL,
    "q_approx_cardinality": Q_APPROX_CARD_SQL,
}
