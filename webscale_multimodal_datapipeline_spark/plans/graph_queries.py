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

import os

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
    # distinct on the INT pair, node names concatenated after: the
    # dedup shuffle carries two longs per row instead of two strings
    # (same edge set — concat of equal ints is the equal string)
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
        )
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


def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the supplier co-occurrence graph (suppliers
    sharing at least one order) — the degree-orientation algorithm that
    makes distributed triangle counting tractable (Cohen 2009 / Suri &
    Vassilvitskii 2011 "MapReduce triangles").

    Edge derivation never goes quadratic: the lineitem self-join is on
    ``l_orderkey`` with a bounded per-order fanout (TPC-H orders hold
    <= 7 items, so <= 21 pairs/order), then distinct-ed. Each undirected
    edge is oriented from the lower-(degree, id) endpoint to the higher —
    every wedge is then generated at exactly one node, and the wedge
    count per node is O(d_out^2) where d_out <= sqrt(2|E|) regardless of
    how skewed the raw degree distribution is (the orientation is THE
    fix for the celebrity-node blowup at 100 TB). Triangles = wedges
    that close: one more join against the oriented edge set.

    Output: (n_nodes, n_edges, n_triangles) — exact, oracle-matched
    AND known-answer-tested on hand-computed graphs (K4, K4−e, stars) in
    ``tests/test_advanced.py`` — the oracle mirrors this algorithm, so a
    shared algorithmic bug would pass both engines; the fixtures can't.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = l.alias("a"), l.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    return triangle_stats(edges)


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle counting over an undirected edge list
    ``(u, v)`` with u < v, already distinct. See ``g_triangle_count``."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): src = smaller endpoint under that order
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    w1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    ).unionAll(oriented.select(F.col("dst").alias("b"), F.col("src").alias("c")))
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


G_TRIANGLE_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
), deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY n
), oriented AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
  FROM edges e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
), wedges AS (
  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
  FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst
), closing AS (
  SELECT src AS b, dst AS c FROM oriented
  UNION ALL SELECT dst, src FROM oriented
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT w.a, w.b, w.c FROM wedges w JOIN closing x ON w.b = x.b AND w.c = x.c)
"""
# No DISTINCT on the closing join (round 8): wedges are unique triples by
# construction (oriented is a set; (b, c) ordered per a) and exactly ONE
# closing row can match a wedge (the orientation is a strict order, so
# oriented never holds both b->c and c->b — the symmetric-union table has
# one row with b in the b-slot). Multiplicity is provably 1, and dropping
# the DISTINCT turns a multi-GB triple materialization (55 GB DuckDB spill
# at sf1) into a streaming join + count with the identical value.

QUERIES["g_triangle_count"] = g_triangle_count
ORACLE["g_triangle_count"] = G_TRIANGLE_SQL


# ---------------------------------------------------------------------------
# Bounded-depth BFS (recursive-CTE workload)
# ---------------------------------------------------------------------------

_BFS_DEPTH = 4


def g_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop distance (bounded depth 4) from a seed set — suppliers
    whose key ≡ 1 (mod 10) — over the bipartite trading graph; output is
    the hop-distance histogram (≤ depth+1 rows).

    This is the recursive-CTE workload class (DuckDB oracle runs a genuine
    ``WITH RECURSIVE``); Spark has no recursive CTE, so the idiomatic
    form is iterative frontier expansion. Round-10 shape (guide §2.3/§2.4
    "shuffle fewer bytes / remove shuffles outright"; §3.1 broadcast):

    * **Directed long-keyed pairs, not doubled string edges.** The graph
      is bipartite, so one (custkey, suppkey) LONG pair row encodes both
      directions — the former representation materialized BOTH directions
      with concatenated string node names ('C123'/'S45'), i.e. 2× the
      rows at ~3× the bytes per row, and every BFS round shuffled them.
      Node identity is a bijection (side + key), so the hop histogram is
      unchanged.
    * **Frontier-broadcast rounds under a scale gate.** A BFS round only
      needs the frontier ON EVERY PAIR PARTITION — when the frontier is
      small, broadcasting it makes the round a map-side semi-join and the
      big pairs table is NEVER shuffled (the §8 lesson: move the heavy
      side once — here, zero times). Frontier size is bounded by the pair
      count, measured once on the materialized table; under
      ``SPARK_GRAFT_BFS_BCAST_ROWS`` (default 2^22, env-parameterized for
      clusters) every frontier/visited set broadcasts, above it the
      rounds fall back to node-keyed hash joins exactly as before (a
      100-TB graph takes the fallback automatically — the gate reads the
      DATA, not the deployment).
    * **Parity pruning** (round 5, kept): a node's hop distance has the
      parity of its side, so round ``i`` anti-joins only frontiers
      ``i-2, i-4, …`` instead of the whole visited set.
    * **Lazy checkpoints** (round 5, kept): per-round lineage truncation
      that materializes inside the final job, not one eager job per round.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # NO pair-level distinct (r10, guide §2.4 "a distinct on data that is
    # already unique"): 97.8% of (custkey, suppkey) pairs are unique at
    # sf0.1, every BFS round consumes the table through a SEMI join (dup
    # rows can't change the match set), and each round's frontier is
    # re-distincted anyway — so the dedup exchange over the whole pair
    # table bought nothing. A corpus with heavy pair duplication can
    # reinstate it as a pre-pass; the result is identical either way.
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .localCheckpoint(eager=True)
    )
    seeds = pairs.select("s").distinct().filter(F.col("s") % 10 == 1)
    return bipartite_bfs_histogram(pairs, seeds)


def bipartite_bfs_histogram(
    pairs: DataFrame, seeds: DataFrame, depth: int = _BFS_DEPTH
) -> DataFrame:
    """Reusable BFS core of ``g_bfs_hops`` (also driven by the scaling
    probe at replicated sizes) over a DIRECTED bipartite pair table
    ``(c, s)`` — one row per undirected edge, both columns integral node
    keys, pre-materialized (``localCheckpoint``/persist) by the caller.
    ``seeds`` must expose an ``s`` column (seed nodes on the s side).

    Odd rounds expand s→c, even rounds c→s; the frontier (and the
    same-parity visited sets) broadcast when the pair count is under the
    ``SPARK_GRAFT_BFS_BCAST_ROWS`` gate, so no round shuffles the pair
    table — see ``g_bfs_hops`` for the full rationale."""
    bcast_rows = int(os.environ.get("SPARK_GRAFT_BFS_BCAST_ROWS", str(1 << 22)))
    # scalar count over the already-materialized RDD — cheap, data-adaptive
    small = pairs.count() <= bcast_rows
    hint = F.broadcast if small else (lambda df: df)
    fronts = [seeds.select(F.col("s").alias("node")).localCheckpoint(eager=False)]
    for i in range(1, depth + 1):
        src, dst = ("s", "c") if i % 2 == 1 else ("c", "s")
        cand = (
            pairs.join(
                hint(fronts[-1].select(F.col("node").alias(src))), src, "left_semi"
            )
            .select(F.col(dst).alias("node"))
            .distinct()
        )
        # bipartite parity: only same-parity earlier frontiers can contain
        # a rediscovery — anti-join against those alone
        for j, f in enumerate(fronts):
            if j % 2 == i % 2:
                cand = cand.join(hint(f), "node", "left_anti")
        fronts.append(cand.localCheckpoint(eager=False))
    dist = fronts[0].select(F.lit(0).alias("d"))
    for i, f in enumerate(fronts[1:], start=1):
        dist = dist.unionByName(f.select(F.lit(i).alias("d")))
    return (
        dist.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("d").cast("int").alias("hops"), "n_nodes")
        .orderBy("hops")
    )


G_BFS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), seeds AS (
  SELECT DISTINCT src FROM edges
  WHERE src LIKE 'S%' AND CAST(substr(src, 2) AS BIGINT) % 10 = 1
), bfs(node, d) AS (
  SELECT src, 0 FROM seeds
  UNION
  SELECT e.dst, b.d + 1
  FROM bfs b JOIN edges e ON b.node = e.src
  WHERE b.d < {_BFS_DEPTH}
), best AS (
  SELECT node, MIN(d) AS d FROM bfs GROUP BY node
)
SELECT CAST(d AS INTEGER) AS hops, COUNT(*) AS n_nodes
FROM best GROUP BY d ORDER BY hops
"""

QUERIES["g_bfs_hops"] = g_bfs_hops
ORACLE["g_bfs_hops"] = G_BFS_SQL


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor scores for non-edges
# ---------------------------------------------------------------------------

_CN_MAX_DEGREE = 50
_CN_TOPK = 15


def g_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the supplier co-occurrence
    graph (same edge derivation as ``g_triangle_count``): for every pair
    of suppliers NOT yet sharing an order, count the suppliers adjacent
    to both — the classic "who will trade next" score (Liben-Nowell &
    Kleinberg 2003); top-15 candidate links.

    Hub suppression is part of the SEMANTICS, not a shortcut: wedges are
    generated only at centers with degree ≤ ``_CN_MAX_DEGREE`` (common
    neighbors via celebrity hubs carry no signal — every pair shares
    them), which also bounds the wedge fanout at Σd² ≤ D·Σd, i.e.
    linear in |E| at any corpus size. Candidate pairs are anti-joined
    against the edge set; all counts exact integers.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = l.alias("a"), l.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    centers = adj.join(
        deg.filter(F.col("d") <= _CN_MAX_DEGREE).select("u"), "u", "left_semi"
    )
    w1 = centers.select(F.col("u").alias("c"), F.col("v").alias("x"))
    w2 = centers.select(F.col("u").alias("c"), F.col("v").alias("y"))
    pairs = (
        w1.join(w2, "c")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    candidates = pairs.join(
        edges,
        (pairs.x == edges.u) & (pairs.y == edges.v),
        "left_anti",
    )
    return (
        candidates.select(
            F.col("x").cast("bigint").alias("supp_a"),
            F.col("y").cast("bigint").alias("supp_b"),
            F.col("common_neighbors").cast("bigint").alias("common_neighbors"),
        )
        .orderBy(F.desc("common_neighbors"), "supp_a", "supp_b")
        .limit(_CN_TOPK)
    )


G_COMMON_NEIGHBORS_SQL = f"""
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
), adj AS (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
), deg AS (
  SELECT u, COUNT(*) AS d FROM adj GROUP BY u
), centers AS (
  SELECT adj.u, adj.v FROM adj
  WHERE adj.u IN (SELECT u FROM deg WHERE d <= {_CN_MAX_DEGREE})
), pairs AS (
  SELECT w1.v AS x, w2.v AS y, COUNT(*) AS common_neighbors
  FROM centers w1 JOIN centers w2 ON w1.u = w2.u AND w1.v < w2.v
  GROUP BY w1.v, w2.v
)
SELECT CAST(x AS BIGINT) AS supp_a, CAST(y AS BIGINT) AS supp_b,
       CAST(common_neighbors AS BIGINT) AS common_neighbors
FROM pairs
WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = pairs.x AND e.v = pairs.y)
ORDER BY common_neighbors DESC, supp_a, supp_b
LIMIT {_CN_TOPK}
"""

QUERIES["g_common_neighbors"] = g_common_neighbors
ORACLE["g_common_neighbors"] = G_COMMON_NEIGHBORS_SQL
