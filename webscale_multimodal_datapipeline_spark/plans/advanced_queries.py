"""Advanced coverage queries: exact percentiles, pivot, as-of join,
BPE-ish token counting, semantic dedup (k-means bucketed), deep-MLP
scoring — the SURVEY §2.6/§2.8 "not present in the reference" surface
made first-class, plus the guide's common-OLAP patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ

# ---------------------------------------------------------------------------
# Exact percentiles (the reference's p50/p95/p99 latency stats, A1
# operator.py:160-168 — here exact `percentile` over event values; Spark's
# interpolation matches DuckDB's quantile_cont)
# ---------------------------------------------------------------------------


def a_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


A_PCTL_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Pivot (reporter-style wide table; SURVEY §2.8 — not in reference)
# ---------------------------------------------------------------------------

_STATUSES = ("O", "F", "P")


def a_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders count pivoted by status per priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
        )
    )


A_PIVOT_SQL = f"""
SELECT o_orderpriority,
       {', '.join(f"CAST(COUNT(*) FILTER (WHERE o_orderstatus = '{s}') AS BIGINT) AS n_{s}" for s in _STATUSES)}
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# As-of join (guide: Spark lacks a native one → window formulation):
# for each purchase, the user's most recent prior click.
# ---------------------------------------------------------------------------


def a_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_type").isin("click", "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = sub.withColumn(
        "prev_click_id",
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
        ).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    return lagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "prev_click_id",
    )


A_ASOF_SQL = """
SELECT event_id AS purchase_id, user_id, prev_click_id
FROM (
  SELECT event_id, user_id, event_type,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_id
  FROM events WHERE event_type IN ('click', 'purchase')
)
WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish) — training-pipeline text analysis
# ---------------------------------------------------------------------------


def a_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").cast("bigint").alias("ws_tokens"),
        TX.bpe_ish_token_count("text").cast("bigint").alias("bpe_tokens"),
    )


A_TOKENS_SQL = f"""
SELECT doc_id,
       CAST({OQ.sql_token_count('text')} AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
            + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Semantic dedup (reference D4 design: cluster as dedup bucket,
# backend.py:89-93 + models/kmeans) — k-means cluster column, then
# within-cluster near-dup removal. Iterative → rows-only check.
# ---------------------------------------------------------------------------


def a_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means clusters as LSH-bucket
    analogs, within-cluster pairwise cosine >= 0.9 marks the larger
    ``vec_id`` of each near-pair as a duplicate (reference designed-only
    D4, ``framework/backend.py:89-93``).

    k-means is iterative, so the oracle pins run invariants instead of
    cluster contents (the ``m_clip_embedding`` pattern): survivors are a
    subset of the input ids, at least one row survives per nonempty
    cluster (the minimum ``vec_id`` of a cluster can never be marked —
    removal requires a smaller surviving id in the same cluster), and the
    survivor count is within [1, n]."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import types as ST

    from webscale_multimodal_datapipeline_spark.functions import vectors as VX
    from webscale_multimodal_datapipeline_spark.operators.dedup import (
        _gemm_bucket_partials,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")  # contentless vectors can't cluster
    )
    n_input = e.count()
    # Cluster count SCALES with the corpus (round 8, found by the sf1
    # sweep: fixed k=10 means cluster size n/10 and within-cluster pairs
    # n²/100 — the §32 fixed-plane quadratic in k-means clothing; 881 s at
    # 16K rows). target ~200 rows/cluster holds pair work linear; fixture
    # sizes (500/2,000) keep the historical k=10 so recorded row counts
    # are unchanged.
    k = max(10, n_input // 200)
    vec = e.withColumn("features", array_to_vector(VX.to_double_array("embedding")))
    model = KMeans(k=k, seed=42, maxIter=20).fit(vec.select("features"))
    clustered = model.transform(vec).withColumnRenamed("prediction", "cluster_id")
    # within-cluster verify via the bucket-grouped BLAS kernel (cluster =
    # LSH bucket analog; embeddings cross the Arrow boundary once per
    # cluster, O(rows) not O(pairs) — decision-identical to the SQL
    # cosine spelling, same kernel the embedding-dedup GEMM path uses)
    id_type = clustered.schema["vec_id"].dataType
    partials = (
        clustered.select("vec_id", "embedding", "cluster_id")
        .groupBy("cluster_id")
        .applyInPandas(
            lambda pdf: _gemm_bucket_partials(
                pdf.drop(columns=["cluster_id"]), "vec_id", "embedding", 0.9
            ),
            ST.StructType(
                [ST.StructField("vec_id", id_type), ST.StructField("_rep", id_type)]
            ),
        )
    )
    survivors = clustered.join(
        partials.select("vec_id").distinct(), "vec_id", "left_anti"
    )
    not_in_input = survivors.join(e.select("vec_id"), "vec_id", "left_anti").count()
    clusters_nonempty = clustered.select("cluster_id").distinct()
    clusters_with_survivor = survivors.select("cluster_id").distinct()
    uncovered = clusters_nonempty.join(
        clusters_with_survivor, "cluster_id", "left_anti"
    ).count()
    return survivors.agg(F.count(F.lit(1)).alias("_n")).select(
        F.lit(n_input).alias("n_input"),
        F.lit(not_in_input == 0).alias("survivors_subset"),
        F.lit(uncovered == 0).alias("cluster_coverage"),
        ((F.col("_n") >= 1) & (F.col("_n") <= n_input)).alias("count_ok"),
    )


A_SEMDEDUP_SQL = """
SELECT COUNT(*) AS n_input, TRUE AS survivors_subset,
       TRUE AS cluster_coverage, TRUE AS count_ok
FROM embeddings
WHERE embedding IS NOT NULL
  AND len(list_filter(embedding, x -> x IS NULL)) = 0
"""
# mirrors the engine's is_valid_vector ingestion filter


# ---------------------------------------------------------------------------
# Deep MLP scoring UDF (R6 aesthetic head shape: 5-layer MLP over
# precomputed embeddings, image_aesthetic_quality.py:45-69) — numpy pandas
# UDF with fixed deterministic weights; parity-tested in pytest.
# ---------------------------------------------------------------------------

MLP_DIMS = (64, 32, 16, 1)


def _mlp_weights():
    """Deterministic pseudo-random weights (no RNG — reproducible)."""
    import numpy as np

    layers = []
    for li, (a, b) in enumerate(zip(MLP_DIMS[:-1], MLP_DIMS[1:])):
        w = np.array(
            [[(((i * 31 + j * 17 + li * 7) % 13) - 6) / 12.0 for j in range(b)] for i in range(a)]
        )
        bias = np.array([(((j * 5 + li) % 7) - 3) / 10.0 for j in range(b)])
        layers.append((w, bias))
    return layers


def mlp_forward_py(mat):
    """Parity spec: ReLU MLP forward pass over a (n, 64) matrix."""
    import numpy as np

    x = mat
    layers = _mlp_weights()
    for i, (w, b) in enumerate(layers):
        x = x @ w + b
        if i < len(layers) - 1:
            x = np.maximum(x, 0.0)
    return x[:, 0]


def a_mlp_deep_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vectorized MLP inference via pandas UDF — the per-executor
    model-singleton pattern (weights built once per worker, reference
    lazy model loading ``image_visual_degradations.py:73-102``).

    The oracle is genuinely differential: the same deterministic weights
    are rendered into DuckDB list-lambda SQL (an independent matmul
    implementation), and both sides emit the score in integer micro-units
    — numpy-vs-SQL association error is ~1e-13, five orders below the
    rounding grain."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    # NB: no type annotations — `from __future__ import annotations` turns
    # them into strings, which pandas_udf's signature inspection rejects.
    @pandas_udf(T.DoubleType())
    def _score(embs):
        mat = np.stack(embs.to_numpy())
        return pd.Series(mlp_forward_py(mat.astype(np.float64)))

    from webscale_multimodal_datapipeline_spark.functions import vectors as VX

    # contentless vectors can't be scored (np.stack raises on None rows)
    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")
    )
    return e.select(
        "vec_id",
        F.round(_score(F.col("embedding")) * 1e5)
        .cast("long")
        .alias("deep_score_e5"),
    )


def _mlp_oracle_sql() -> str:
    """Render the deterministic MLP weights as DuckDB list literals and the
    forward pass as list-lambda matmuls — an independent implementation of
    ``mlp_forward_py`` for the differential oracle."""
    layers = _mlp_weights()
    lits = []
    for w, b in layers:
        wl = "[" + ",".join(
            "[" + ",".join(repr(float(v)) for v in row) + "]" for row in w
        ) + "]"
        bl = "[" + ",".join(repr(float(v)) for v in b) + "]"
        lits.append((wl, bl))
    d0, d1, d2 = MLP_DIMS[0], MLP_DIMS[1], MLP_DIMS[2]
    return f"""
WITH params AS (
  SELECT {lits[0][0]} AS w0, {lits[0][1]} AS b0,
         {lits[1][0]} AS w1, {lits[1][1]} AS b1,
         {lits[2][0]} AS w2, {lits[2][1]} AS b2
), x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, v -> v IS NULL)) = 0
), h1 AS (
  SELECT vec_id, list_transform(range(1, {d1 + 1}), j ->
           greatest(0.0, b0[j] + list_sum(list_transform(range(1, {d0 + 1}),
             i -> x[i] * w0[i][j])))) AS h
  FROM x, params
), h2 AS (
  SELECT vec_id, list_transform(range(1, {d2 + 1}), j ->
           greatest(0.0, b1[j] + list_sum(list_transform(range(1, {d1 + 1}),
             i -> h[i] * w1[i][j])))) AS h
  FROM h1, params
), s AS (
  SELECT vec_id, b2[1] + list_sum(list_transform(range(1, {d2 + 1}),
           i -> h[i] * w2[i][1])) AS score
  FROM h2, params
)
SELECT vec_id, CAST(ROUND(score * 1e5) AS BIGINT) AS deep_score_e5 FROM s
"""


A_MLP_DEEP_SQL = _mlp_oracle_sql()


QUERIES = {
    "a_value_percentiles": a_value_percentiles,
    "a_orders_pivot": a_orders_pivot,
    "a_asof_click_before_purchase": a_asof_click_before_purchase,
    "a_token_counts": a_token_counts,
    "a_semantic_dedup": a_semantic_dedup,
    "a_mlp_deep_score": a_mlp_deep_score,
}

ORACLE = {
    "a_value_percentiles": A_PCTL_SQL,
    "a_orders_pivot": A_PIVOT_SQL,
    "a_asof_click_before_purchase": A_ASOF_SQL,
    "a_token_counts": A_TOKENS_SQL,
    # a_semantic_dedup is iterative k-means — the oracle checks run
    # invariants (subset/coverage/count), not cluster contents.
    "a_semantic_dedup": A_SEMDEDUP_SQL,
    # a_mlp_deep_score: differential — same weights, independent DuckDB
    # list-lambda matmul.
    "a_mlp_deep_score": A_MLP_DEEP_SQL,
}


# ---------------------------------------------------------------------------
# Unpivot / melt (the inverse of a_orders_pivot — wide metrics back to
# tidy rows; Spark's native unpivot == SQL UNPIVOT / pandas melt)
# ---------------------------------------------------------------------------


def a_orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: pivot per-priority status counts wide, then ``unpivot``
    back to (priority, status, n) tidy rows — pinning that melt is lossless
    (the oracle computes the tidy form directly)."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
        )
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=[f"n_{s}" for s in _STATUSES],
            variableColumnName="status",
            valueColumnName="n",
        )
        .withColumn("status", F.expr("substring(status, 3)"))
        .filter(F.col("n") > 0)
    )


A_UNPIVOT_SQL = """
SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""

QUERIES["a_orders_unpivot"] = a_orders_unpivot
ORACLE["a_orders_unpivot"] = A_UNPIVOT_SQL


def a_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a max-staleness tolerance: each purchase gets its
    latest preceding click by the same user only if it happened within 30
    minutes — older matches are nulled out (the ad-attribution /
    sensor-staleness contract; plain as-of joins silently attribute to
    arbitrarily old events).

    Same single user-partitioned window as the tolerance-free
    ``a_asof_click_before_purchase`` (no join at all — the union-window
    form carries both streams through one sort), plus the matched
    timestamp so the gap test is one comparison."""
    TOL_MIN = 30
    ev = load_table(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    lagged = sub.withColumn(
        "_pc_id", F.last(click_id, ignorenulls=True).over(w)
    ).withColumn("_pc_ts", F.last(click_ts, ignorenulls=True).over(w))
    in_tol = (
        F.col("_pc_ts").isNotNull()
        & (F.col("ts").cast("long") - F.col("_pc_ts").cast("long") <= TOL_MIN * 60)
    )
    return lagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(in_tol, F.col("_pc_id")).alias("click_id"),
        F.when(
            in_tol, (F.col("ts").cast("long") - F.col("_pc_ts").cast("long"))
        ).alias("gap_seconds"),
    )


A_ASOF_TOL_SQL = """
SELECT purchase_id, user_id,
       CASE WHEN ok THEN pc_id END AS click_id,
       CASE WHEN ok THEN gap END AS gap_seconds
FROM (
  SELECT event_id AS purchase_id, user_id, event_type, pc_id,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(pc_ts)) AS BIGINT) AS gap,
         pc_ts IS NOT NULL
           AND CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(pc_ts)) AS BIGINT) <= 1800 AS ok
  FROM (
    SELECT event_id, user_id, event_type, ts,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc_id,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc_ts
    FROM events WHERE event_type IN ('click', 'purchase')
  )
)
WHERE event_type = 'purchase'
"""

QUERIES["a_asof_tolerance_join"] = a_asof_tolerance_join
ORACLE["a_asof_tolerance_join"] = A_ASOF_TOL_SQL


# ---------------------------------------------------------------------------
# Welch two-sample test (experimentation / data-ablation readout)
# ---------------------------------------------------------------------------


def a_welch_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-statistic per event type, comparing a
    deterministic 50/50 user split (md5-hash parity — the same
    hash-assignment rule as ``t_dataset_split``) — the A/B readout layer
    every experimentation pipeline bolts onto its event stream.

    Exact-decimal discipline (the ``x_distribution_moments`` pattern):
    per-(type, variant) power sums n/Σv/Σv² accumulate in DECIMAL (values
    have 2 dp — sums are exact, merge-order-free), fold to A/B columns in
    ONE conditional aggregate pass, then mean/var/t are derived with an
    identical float expression tree in both engines — bit-equal, no
    tolerance. |t| > 1.96 is emitted as the decision boolean.

    Scale shape: one map-side-combinable aggregate over (type, parity),
    5-row output; zero UDF, zero extra shuffle beyond the group-by."""
    ev = load_table(spark, sf_dir, "events")
    variant = F.pmod(TX.md5_long(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))), F.lit(2))
    v = F.col("value").cast("decimal(12,2)")
    vv = v * v
    is_a = variant == 0
    sums = ev.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("double").alias("nb"),
        F.sum(F.when(is_a, v).otherwise(F.lit(0).cast("decimal(12,2)"))).cast("double").alias("sa"),
        F.sum(F.when(~is_a, v).otherwise(F.lit(0).cast("decimal(12,2)"))).cast("double").alias("sb"),
        F.sum(F.when(is_a, vv).otherwise(F.lit(0).cast("decimal(25,4)"))).cast("double").alias("ssa"),
        F.sum(F.when(~is_a, vv).otherwise(F.lit(0).cast("decimal(25,4)"))).cast("double").alias("ssb"),
    )
    na, nb, sa, sb, ssa, ssb = (F.col(c) for c in ("na", "nb", "sa", "sb", "ssa", "ssb"))
    # degenerate arms (n<2, or zero pooled variance) make t undefined ->
    # NULL in both engines (bare division raises under ANSI mode; this is
    # the kappa guard class)
    diff = F.when((na > 0) & (nb > 0), sa / na - sb / nb)
    var_a = (ssa - sa * sa / na) / (na - 1)
    var_b = (ssb - sb * sb / nb) / (nb - 1)
    den2 = F.when((na > 1) & (nb > 1), var_a / na + var_b / nb)
    t = F.when(den2 > 0, diff / F.sqrt(den2))
    return sums.select(
        "event_type",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant_95"),
    ).orderBy("event_type")


# || not concat(): a NULL user must land in NEITHER arm in both engines
# (DuckDB's concat() would hash the bare '#ab' salt and assign one)
_AB_HASH = OQ.sql_md5_long("(user_id || '#ab')")

A_WELCH_SQL = f"""
WITH sums AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 = 0 THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS sa,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 <> 0 THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS sb,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 = 0 THEN CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2)) ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) AS ssa,
         CAST(SUM(CASE WHEN {_AB_HASH} % 2 <> 0 THEN CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2)) ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) AS ssb
  FROM events
  GROUP BY event_type
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND(diff, 6) AS mean_diff,
       ROUND(t, 6) AS t_stat,
       abs(t) > 1.96 AS significant_95
FROM (
  SELECT event_type, na, nb, diff,
         CASE WHEN den2 > 0 THEN diff / sqrt(den2) END AS t
  FROM (
    SELECT event_type, na, nb,
           CASE WHEN na > 0 AND nb > 0 THEN sa / na - sb / nb END AS diff,
           CASE WHEN na > 1 AND nb > 1
                THEN ((ssa - sa * sa / na) / (na - 1)) / na
                     + ((ssb - sb * sb / nb) / (nb - 1)) / nb END AS den2
    FROM sums
  )
)
ORDER BY event_type
"""

QUERIES["a_welch_ab_test"] = a_welch_ab_test
ORACLE["a_welch_ab_test"] = A_WELCH_SQL


# ---------------------------------------------------------------------------
# Grouped-agg + grouped-map pandas UDF surfaces (Arrow group paths)
# ---------------------------------------------------------------------------


def a_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDF surface (Arrow-batched per-group
    reduction — the API tier for group reductions Spark lacks natively,
    e.g. trimmed means or custom robust estimators): here the reduction
    is an exact integer cents sum via numpy int64, so the result is
    value-pinned against plain SQL SUM — validating the Arrow group
    transport and the UDAF registration, not approximating.

    Scale shape: grouped-agg pandas UDFs receive each group as one Arrow
    batch — fine for bounded group counts (5 priorities); data-scale
    group-bys stay on native aggregates (the UDF-tier discipline,
    ARCHITECTURE §3)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringizes hints, so the Series->scalar inference
    # can't see pd.Series here
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def cents_sum(v):
        import numpy as np

        arr = v.to_numpy(dtype=np.float64)
        arr = arr[~np.isnan(arr)]  # SQL SUM semantics: NULLs don't count
        if arr.size == 0:
            return None  # all-NULL group: SUM is NULL (NaN->int64 is LONG_MIN)
        return int(np.round(arr * 100).astype(np.int64).sum())

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(cents_sum(F.col("o_totalprice")).alias("total_cents"))
        .orderBy("o_orderpriority")
    )


A_GROUPED_AGG_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["a_grouped_agg_pandas"] = a_grouped_agg_pandas
ORACLE["a_grouped_agg_pandas"] = A_GROUPED_AGG_SQL


def a_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch ``applyInPandas`` (grouped-map) surface — each nation's
    customers arrive as one pandas frame and leave re-shaped: per-row
    within-group rank position in exact basis points via numpy argsort
    (the per-group imperative tier for logic that genuinely needs the
    whole group in memory; the streaming twin is
    ``streaming/stateful.py``). Output is integer-exact, value-pinned
    against the window-function oracle — Arrow round-trip, schema
    contract, and group partitioning all verified, not just plumbing.

    Scale shape: groups must fit an executor's memory by contract (the
    applyInPandas caveat) — nations are bounded; corpus-keyed grouped
    maps belong to mapInPandas or native windows."""
    import pandas as pd

    o = load_table(spark, sf_dir, "customer")

    def rank_bps(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cents = np.round(pdf["c_acctbal"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((pdf["c_custkey"].to_numpy(), cents))
        rnk = np.empty(len(pdf), dtype=np.int64)
        rnk[order] = np.arange(1, len(pdf) + 1)
        n = len(pdf)
        pos = (rnk - 1) * 10_000 // max(n - 1, 1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "pos_bps": pos,
            }
        )

    return (
        o.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(
            rank_bps, "c_custkey long, c_nationkey long, pos_bps long"
        )
        .orderBy("c_custkey")
    )


A_GROUPED_MAP_SQL = """
WITH ranked AS (
  SELECT c_custkey, c_nationkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(round(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT), c_custkey
         ) AS rnk,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
)
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST((rnk - 1) * 10000 // GREATEST(n - 1, 1) AS BIGINT) AS pos_bps
FROM ranked ORDER BY c_custkey
"""

QUERIES["a_grouped_map_rank"] = a_grouped_map_rank
ORACLE["a_grouped_map_rank"] = A_GROUPED_MAP_SQL
