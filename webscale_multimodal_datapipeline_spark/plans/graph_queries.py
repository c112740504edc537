"""Graph analytics over relational edges (SURVEY §2.10d family: iterative
distributed algorithms beyond connected components).

``g_pagerank`` is the canonical "iterative join + aggregate" workload: each
iteration is ONE shuffle on the node key (contributions grouped by dst), and
the rank vector scales with the node count, so nothing here is collected or
broadcast. The iteration count is fixed (K=3) — that makes the computation
expressible as an unrolled SQL oracle AND mirrors how web-scale PageRank is
actually run (fixed sweep count, not convergence-to-epsilon, e.g. the
Kiveris-style MapReduce formulations). The dedup-components operators
(``operators/dedup.py``) cover the data-dependent-round case; this covers
the fixed-round case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table

QUERIES = {}
ORACLE = {}

_DAMP = 0.85
_ITERS = 3
_TOPK = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer–supplier graph: an edge per distinct
    (o_custkey, l_suppkey) trading pair, emitted in both directions so
    every node has out-degree ≥ 1 (no dangling-mass correction needed).
    The distinct is a map-side-combinable shuffle on the pair key."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionByName(rev)


def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the bipartite
    customer↔supplier trading graph; top-20 nodes by rank.

    Scale shape: ranks live as a (node, rank, outdeg) DataFrame — never
    collected, never broadcast (the rank vector is node-cardinality, i.e.
    SF-scaling). One iteration = join ranks⋈edges on src (hash shuffle on
    the node key, reused across iterations since both sides keep the same
    partitioning expression) + groupBy dst (partial aggregation map-side).
    Per-edge contribution ``rank/outdeg`` is computed BEFORE the shuffle so
    the exchange carries one double per edge. Display values are rounded to
    8 dp — summation order across engines differs in the last ulp only."""
    # Materialize the edge list and degree table ONCE (localCheckpoint =
    # the iterative-algorithm lineage-truncation policy shared with
    # connected_components_star): without it the orders⋈lineitem+distinct
    # subtree re-executes inside every iteration's join — 7 scans of the
    # fact tables instead of 1 (measured 17.6 s → ~4 s at sf0.1).
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # scalar driver-side: node COUNT only, not node data
    # Attach the DESTINATION's outdegree to each edge once, so an iteration
    # is one join + one aggregate (no per-iteration rank⋈degree join-back).
    e2 = (
        edges.alias("e")
        .join(deg.alias("dd"), F.col("e.dst") == F.col("dd.src"))
        .select(
            F.col("e.src").alias("src"),
            F.col("e.dst").alias("dst"),
            F.col("dd.outdeg").alias("dst_outdeg"),
        )
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(1.0 / n).alias("rank"),
        "outdeg",
    )
    for _ in range(_ITERS):
        # every node has in-edges (undirected emission) → inner join is total
        ranks = (
            ranks.alias("r")
            .join(e2.alias("e"), F.col("r.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                F.col("e.dst_outdeg").alias("outdeg"),
                (F.col("r.rank") / F.col("r.outdeg")).alias("c"),
            )
            .groupBy("node", "outdeg")
            .agg(
                (F.lit((1.0 - _DAMP) / n) + F.lit(_DAMP) * F.sum("c")).alias("rank")
            )
            .select("node", "rank", "outdeg")
        )
    return (
        ranks.select(
            "node",
            F.round(F.col("rank"), 8).alias("rank"),
            F.col("outdeg").cast("bigint").alias("degree"),
        )
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(_TOPK)
    )


G_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg
), r0 AS (
  SELECT src AS node, 1.0 / nn.n AS rank, outdeg FROM deg, nn
), r1 AS (
  SELECT e.dst AS node,
         (1 - {_DAMP}) / ANY_VALUE(nn.n) + {_DAMP} * SUM(p.rank / p.outdeg) AS rank,
         ANY_VALUE(d.outdeg) AS outdeg
  FROM r0 p JOIN edges e ON p.node = e.src
  JOIN deg d ON e.dst = d.src, nn
  GROUP BY e.dst
), r2 AS (
  SELECT e.dst AS node,
         (1 - {_DAMP}) / ANY_VALUE(nn.n) + {_DAMP} * SUM(p.rank / p.outdeg) AS rank,
         ANY_VALUE(d.outdeg) AS outdeg
  FROM r1 p JOIN edges e ON p.node = e.src
  JOIN deg d ON e.dst = d.src, nn
  GROUP BY e.dst
), r3 AS (
  SELECT e.dst AS node,
         (1 - {_DAMP}) / ANY_VALUE(nn.n) + {_DAMP} * SUM(p.rank / p.outdeg) AS rank,
         ANY_VALUE(d.outdeg) AS outdeg
  FROM r2 p JOIN edges e ON p.node = e.src
  JOIN deg d ON e.dst = d.src, nn
  GROUP BY e.dst
)
SELECT node, ROUND(rank, 8) AS rank, CAST(outdeg AS BIGINT) AS degree
FROM r3
ORDER BY rank DESC, node ASC
LIMIT {_TOPK}
"""

QUERIES["g_pagerank"] = g_pagerank
ORACLE["g_pagerank"] = G_PAGERANK_SQL


def g_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the trading graph — the standard first-look
    graph profile (and the skew diagnostic that decides whether the
    PageRank shuffle needs salting: a power-law head shows up here before
    it shows up as a straggler task). Two map-side-combinable aggregates;
    output bounded by |distinct degrees|."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_nodes")
        .orderBy("degree")
    )


G_DEGREE_SQL = """
WITH pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS degree FROM edges GROUP BY src
)
SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""

QUERIES["g_degree_histogram"] = g_degree_histogram
ORACLE["g_degree_histogram"] = G_DEGREE_SQL
