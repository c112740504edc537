"""Mergeable-sketch aggregation — the 100-TB cardinality/quantile path.

At cluster scale the exact forms (COUNT(DISTINCT …), exact percentile)
shuffle every distinct value / sort every group; the production pattern is
a bounded-size MERGEABLE sketch per shard, re-aggregated upward (Spark's
DataSketches HLL via ``hll_sketch_agg``/``hll_union_agg``, and the
Greenwald–Khanna-style ``percentile_approx``). These queries exercise the
two-level roll-up (per-fine-group sketch → union to coarse group) and gate
the estimates against the exact answers computed in the same plan — the
oracle checks the exact columns by value and the estimate columns by
invariant (within documented error bounds, emitted as booleans).

Reference analogue: the metrics layer's cross-worker aggregation
(``mega_data_factory/framework/metrics/aggregator.py``) merges per-worker
partial stats; HLL/GK sketches are the principled version of that merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table

QUERIES = {}
ORACLE = {}

# DataSketches HLL at the default lgConfigK=12 has RSE ≈ 1.04/√2¹² ≈ 1.6%;
# 5% is a ≥3-sigma gate — tight enough to catch a wiring bug (wrong column,
# wrong union level), loose enough to never flake.
_HLL_TOL = 0.05


def x_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via two-level HLL roll-up: per-(day, event_type)
    sketches union-merged to per-day, estimate gated against the exact
    distinct count computed alongside.

    Scale shape: the sketch path shuffles ONE ~2 KB binary per fine group
    (map-side partial sketch merge — ObjectHashAggregate), then re-merges
    per day; the raw user_ids never cross the wire a second time. The exact
    branch exists only as the gate; at 100 TB you'd drop it and keep the
    sketch branch unchanged."""
    # NULL-ts events are unwindowable (section 24): Spark's inner join on
    # day silently dropped the NULL-day rollup the oracle's GROUP BY kept
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    keyed = ev.select(F.to_date("ts").alias("day"), "event_type", "user_id")
    fine = keyed.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("_sk")
    )
    coarse = fine.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    exact = keyed.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        exact.join(coarse, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                <= F.lit(_HLL_TOL) * F.col("exact_users")
            ).alias("est_within_5pct"),
        )
        .orderBy("day")
    )


X_HLL_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS est_within_5pct
FROM events
WHERE ts IS NOT NULL
GROUP BY CAST(ts AS DATE)
ORDER BY day
"""

QUERIES["x_hll_merge"] = x_hll_merge
ORACLE["x_hll_merge"] = X_HLL_SQL


# percentile_approx with accuracy 10000 bounds RANK error at n/10000; the
# gate brackets each estimate between the exact interpolated percentiles
# ±0.01 rank out (value-relative tolerances flake on sparse tails).
_PCT_ACC = 10_000


def x_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95 via the mergeable quantile sketch
    (``percentile_approx``), gated against the exact interpolated
    percentile computed in the same aggregate.

    Scale shape: the sketch is fixed-size per group regardless of row
    count and merges associatively across partitions (partial_percentile_
    approx map-side) — no per-group sort, no full-value shuffle. Exact
    p50/p95 are emitted (rounded) for the value gate; the sketch estimates
    are emitted as within-tolerance booleans."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(0.5D, 0.95D, 0.45D, 0.55D, 0.94D, 0.96D))"
        ).alias("_ex"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(_PCT_ACC)).alias("_ap"),
    )

    def ok(i: int, lo: int, hi: int):
        # rank-safe bracket: the sketch returns an actual sample whose rank
        # error is ≤ n/accuracy, so its VALUE must lie between the exact
        # interpolated percentiles one band out (±0.01 rank ≫ the sketch's
        # rank error at any n) — a gate that never flakes on sparse tails,
        # unlike a relative-value tolerance.
        ap = F.col("_ap")[i]
        return (ap >= F.col("_ex")[lo]) & (ap <= F.col("_ex")[hi])

    return agg.select(
        "event_type",
        F.round(F.col("_ex")[0], 6).alias("exact_p50"),
        F.round(F.col("_ex")[1], 6).alias("exact_p95"),
        ok(0, 2, 3).alias("p50_in_band"),
        ok(1, 4, 5).alias("p95_in_band"),
    ).orderBy("event_type")


X_PCT_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
       ROUND(quantile_cont(value, 0.95), 6) AS exact_p95,
       CASE WHEN quantile_cont(value, 0.5) IS NULL THEN NULL ELSE TRUE END
         AS p50_in_band,
       CASE WHEN quantile_cont(value, 0.95) IS NULL THEN NULL ELSE TRUE END
         AS p95_in_band
FROM events
GROUP BY event_type
ORDER BY event_type
"""
# a group with NO values (all-NULL) has no percentile to band: the
# in-band comparison is NULL in Spark, so the invariant pin is too

QUERIES["x_approx_percentile_sketch"] = x_approx_percentile_sketch
ORACLE["x_approx_percentile_sketch"] = X_PCT_SQL


def x_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass distribution moments per group — sample stddev/variance,
    correlation, covariance, closed-form OLS of extendedprice on quantity —
    with the EXACT-decimal-sums discipline: the streaming co-moment
    aggregates (``var_samp``/``corr``/``regr_slope``) accumulate in float
    and their value depends on partition merge order, so instead the six
    power sums (n, Σx, Σy, Σxy, Σx², Σy²) are computed as exact decimals
    (inputs have ≤ 4 dp → products/sums are exact in both engines), cast to
    double once, and every moment is derived with an IDENTICAL float
    expression tree on both sides — bit-equal results, no tolerance.

    Scale shape: one map-side-combinable aggregate, one shuffle on the
    3-value group key, zero UDF. The textbook formulas are numerically
    unsafe in float but exact on decimal sums — the point of the pattern."""
    l = load_table(spark, sf_dir, "lineitem")
    d4 = "decimal(18,4)"  # Spark: (18,4)^2 -> (37,8), exact; the SQL uses
    # DECIMAL(19,4) because DuckDB only takes the int128 product path at p>18
    q = F.col("l_quantity").cast(d4)
    p = F.col("l_extendedprice").cast(d4)
    sums = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("qx"),
        F.sum(p).cast("double").alias("px"),
        F.sum(q * p).cast("double").alias("qp"),
        F.sum(q * q).cast("double").alias("qq"),
        F.sum(p * p).cast("double").alias("pp"),
    )
    n, qx, px, qp, qq, pp = (F.col(c) for c in ("n", "qx", "px", "qp", "qq", "pp"))
    cov_num = qp - qx * px / n
    slope = (n * qp - qx * px) / (n * qq - qx * qx)
    # NO terminal ROUND (round 8): the moments are bit-identical by
    # construction (identical float trees over identical correctly-rounded
    # doubles), and rounding DERIVED DOUBLES is itself a cross-engine trap
    # — DuckDB's ROUND(x, 6) scales by 10^6 in float and can cross a .5
    # boundary the exact HALF_UP (Spark's BigDecimal round) does not
    # (found by the sf1 sweep: var_price .988516 vs .988517 on the SAME
    # double). Un-rounded doubles compare exactly at any scale.
    return sums.select(
        "l_returnflag",
        F.sqrt((qq - qx * qx / n) / (n - 1)).alias("sd_qty"),
        ((pp - px * px / n) / (n - 1)).alias("var_price"),
        (
            (n * qp - qx * px)
            / (F.sqrt(n * qq - qx * qx) * F.sqrt(n * pp - px * px))
        ).alias("corr_qty_price"),
        (cov_num / (n - 1)).alias("covar_qty_price"),
        slope.alias("ols_slope"),
        ((px - slope * qx) / n).alias("ols_intercept"),
    ).orderBy("l_returnflag")


X_MOMENTS_SQL = """
WITH sums AS (
  -- decimal -> double goes THROUGH VARCHAR: DuckDB's direct decimal cast
  -- is not correctly rounded once the scaled integer passes 2^53 (found
  -- by the round-8 sf1 sweep: pp for group A is x.487 ulps and the direct
  -- cast rounds UP; string -> double is correctly rounded in both engines,
  -- and Spark's decimal cast already is)
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS qx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS px,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS qp,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS qq,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS pp
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       sqrt((qq - qx * qx / n) / (n - 1)) AS sd_qty,
       (pp - px * px / n) / (n - 1) AS var_price,
       (n * qp - qx * px) / (sqrt(n * qq - qx * qx) * sqrt(n * pp - px * px)) AS corr_qty_price,
       (qp - qx * px / n) / (n - 1) AS covar_qty_price,
       (n * qp - qx * px) / (n * qq - qx * qx) AS ols_slope,
       (px - ((n * qp - qx * px) / (n * qq - qx * qx)) * qx) / n AS ols_intercept
FROM sums
ORDER BY l_returnflag
"""

QUERIES["x_distribution_moments"] = x_distribution_moments
ORACLE["x_distribution_moments"] = X_MOMENTS_SQL


# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002.
# Unlike the HLL gate above (estimate checked only by invariant — Spark's
# DataSketches binary isn't reproducible in DuckDB), KMV built on the shared
# 60-bit md5 hash is EXACTLY reproducible cross-engine: both engines rank the
# same hashes, pick the same k-th order statistic, and the estimate
# (k−1)·2⁶⁰/h₍ₖ₎ is the same IEEE-754 division — so the oracle checks the
# ESTIMATE by value, not by tolerance.
# ---------------------------------------------------------------------------

_KMV_K = 16
# (k−1)·2⁶⁰ as an exact double (4 significant bits — representable):
_KMV_NUM = float((_KMV_K - 1) * (1 << 60))


def x_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-content estimate from a k=16 minimum-values
    sketch over the md5 content fingerprint, gated against the exact
    distinct count computed alongside — plus a ``__union__`` row whose
    sketch is re-ranked from the POOLED per-source sketches (k smallest
    of the union of k-smallest = the union sketch: KMV's mergeability,
    the property that lets 1000 executors each keep 16 longs and still
    answer the global cardinality).

    Scale shape: after the distinct, each source contributes at most k
    hashes to the pool (n_sources × k rows — driver-bounded), and the
    union re-rank runs on that bounded pool, never the corpus. NULL text
    is excluded by spec (no content, no fingerprint)."""
    from webscale_multimodal_datapipeline_spark.functions import text as TXT

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    h = docs.select(
        "source", TXT.fingerprint("text").alias("_h")
    ).dropDuplicates(["source", "_h"])
    w = Window.partitionBy("source").orderBy("_h")
    sketch = h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= _KMV_K
    )
    per = h.groupBy("source").agg(F.count(F.lit(1)).alias("exact_distinct"))
    agg = sketch.groupBy("source").agg(
        F.count(F.lit(1)).alias("sketch_n"),
        F.max(F.when(F.col("_rn") == _KMV_K, F.col("_h"))).alias("kth_hash"),
    )
    pool = sketch.select("_h").distinct()
    wu = Window.orderBy("_h")
    upool = pool.withColumn("_rn", F.row_number().over(wu)).filter(
        F.col("_rn") <= _KMV_K
    )
    uagg = (
        upool.agg(
            F.count(F.lit(1)).alias("sketch_n"),
            F.max(F.when(F.col("_rn") == _KMV_K, F.col("_h"))).alias("kth_hash"),
        )
        .withColumn("source", F.lit("__union__"))
    )
    uexact = (
        h.select("_h")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
        .withColumn("source", F.lit("__union__"))
    )
    rows = per.join(agg, "source").unionByName(uexact.join(uagg, "source"))
    est_raw = F.when(
        F.col("sketch_n") < _KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise(F.lit(_KMV_NUM) / F.col("kth_hash").cast("double"))
    return rows.select(
        "source",
        "exact_distinct",
        "sketch_n",
        "kth_hash",
        F.round(est_raw, 4).alias("kmv_estimate"),
        F.round(
            F.abs(est_raw - F.col("exact_distinct")) / F.col("exact_distinct"), 4
        ).alias("rel_err"),
    ).orderBy("source")


X_KMV_SQL = """
WITH h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT) AS h
  FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h
), sk AS (SELECT * FROM ranked WHERE rn <= 16),
per AS (SELECT source, COUNT(*) AS exact_distinct FROM h GROUP BY source),
agg AS (
  SELECT source, COUNT(*) AS sketch_n,
         MAX(CASE WHEN rn = 16 THEN h END) AS kth_hash
  FROM sk GROUP BY source
), upool AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sk)
), uagg AS (
  SELECT '__union__' AS source, COUNT(*) AS sketch_n,
         MAX(CASE WHEN rn = 16 THEN h END) AS kth_hash
  FROM upool WHERE rn <= 16
), uexact AS (
  SELECT '__union__' AS source, COUNT(DISTINCT h) AS exact_distinct FROM h
), rows_ AS (
  SELECT p.source, p.exact_distinct, a.sketch_n, a.kth_hash
  FROM per p JOIN agg a USING (source)
  UNION ALL
  SELECT ue.source, ue.exact_distinct, ua.sketch_n, ua.kth_hash
  FROM uexact ue JOIN uagg ua USING (source)
)
SELECT source, exact_distinct, sketch_n, kth_hash,
       ROUND(CASE WHEN sketch_n < 16 THEN CAST(exact_distinct AS DOUBLE)
                  ELSE 17293822569102704640.0 / CAST(kth_hash AS DOUBLE) END, 4)
         AS kmv_estimate,
       ROUND(ABS(CASE WHEN sketch_n < 16 THEN CAST(exact_distinct AS DOUBLE)
                      ELSE 17293822569102704640.0 / CAST(kth_hash AS DOUBLE) END
                 - exact_distinct) / exact_distinct, 4) AS rel_err
FROM rows_
ORDER BY source
"""

QUERIES["x_kmv_distinct"] = x_kmv_distinct
ORACLE["x_kmv_distinct"] = X_KMV_SQL


def x_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra between two sources: |A∪B| from the pooled sketch
    (k smallest of the two k-minimums — mergeability), |A∩B| by
    inclusion–exclusion on the estimates, and the implied Jaccard —
    gated against the exact contents. The estimator-side set algebra is
    what lets a 100-TB catalog answer "how much NEW content does source
    B add" from per-source sketch rows without ever co-shuffling the two
    corpora. Same exact-parity property as ``x_kmv_distinct``: both
    engines rank the same md5 hashes, so the ESTIMATES match by value.

    Under-full sketches (distinct < k) degrade to the exact counts, so
    the algebra stays defined at any fixture scale."""
    from webscale_multimodal_datapipeline_spark.functions import text as TXT

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isin("src0", "src1"))
        .select("source", TXT.fingerprint("text").alias("_h"))
        .dropDuplicates(["source", "_h"])
    )
    w = Window.partitionBy("source").orderBy("_h")
    sk = docs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= _KMV_K
    )

    def est(n_col: Column, kth_col: Column, exact_col: Column) -> Column:
        return F.when(n_col < _KMV_K, exact_col.cast("double")).otherwise(
            F.lit(_KMV_NUM) / kth_col.cast("double")
        )

    from pyspark.sql import Column

    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("exact"))
    agg = sk.groupBy("source").agg(
        F.count(F.lit(1)).alias("sn"),
        F.max(F.when(F.col("_rn") == _KMV_K, F.col("_h"))).alias("kth"),
    )
    ab = (
        per.join(agg, "source")
        .groupBy()
        .pivot("source", ["src0", "src1"])
        .agg(
            F.first("exact").alias("exact"),
            F.first("sn").alias("sn"),
            F.first("kth").alias("kth"),
        )
    )
    upool = (
        sk.select("_h")
        .distinct()
        .withColumn("_rn", F.row_number().over(Window.orderBy("_h")))
        .filter(F.col("_rn") <= _KMV_K)
    )
    uagg = upool.agg(
        F.count(F.lit(1)).alias("u_sn"),
        F.max(F.when(F.col("_rn") == _KMV_K, F.col("_h"))).alias("u_kth"),
    )
    exact_union = docs.select("_h").distinct().agg(
        F.count(F.lit(1)).alias("exact_union")
    )
    exact_int = (
        docs.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_ns"))
        .filter(F.col("_ns") == 2)
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    row = ab.crossJoin(uagg).crossJoin(exact_union).crossJoin(exact_int)
    ea = est(F.col("src0_sn"), F.col("src0_kth"), F.col("src0_exact"))
    eb = est(F.col("src1_sn"), F.col("src1_kth"), F.col("src1_exact"))
    eu = est(F.col("u_sn"), F.col("u_kth"), F.col("exact_union"))
    ei = F.greatest(F.lit(0.0), ea + eb - eu)
    return row.select(
        F.col("src0_exact").alias("n_a"),
        F.col("src1_exact").alias("n_b"),
        "exact_union",
        "exact_intersection",
        F.round(eu, 4).alias("est_union"),
        F.round(ei, 4).alias("est_intersection"),
        F.round(ei / eu, 4).alias("est_jaccard"),
    )


X_KMV_SETOPS_SQL = f"""
WITH h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT) AS h
  FROM documents
  WHERE text IS NOT NULL AND source IN ('src0', 'src1')
), sk AS (
  SELECT source, h, rn FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM h
  ) WHERE rn <= {_KMV_K}
), per AS (
  SELECT
    MAX(CASE WHEN source = 'src0' THEN exact END) AS a_exact,
    MAX(CASE WHEN source = 'src1' THEN exact END) AS b_exact,
    MAX(CASE WHEN source = 'src0' THEN sn END) AS a_sn,
    MAX(CASE WHEN source = 'src1' THEN sn END) AS b_sn,
    MAX(CASE WHEN source = 'src0' THEN kth END) AS a_kth,
    MAX(CASE WHEN source = 'src1' THEN kth END) AS b_kth
  FROM (
    SELECT p.source, p.exact, a.sn, a.kth
    FROM (SELECT source, COUNT(*) AS exact FROM h GROUP BY source) p
    JOIN (SELECT source, COUNT(*) AS sn,
                 MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
          FROM sk GROUP BY source) a USING (source)
  )
), u AS (
  SELECT COUNT(*) AS u_sn, MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS u_kth
  FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE rn <= {_KMV_K}
), ex AS (
  SELECT (SELECT COUNT(DISTINCT h) FROM h) AS exact_union,
         (SELECT COUNT(*) FROM (
            SELECT h FROM h GROUP BY h HAVING COUNT(*) = 2
          )) AS exact_intersection
), est AS (
  SELECT *,
    CASE WHEN a_sn < {_KMV_K} THEN CAST(a_exact AS DOUBLE)
         ELSE {_KMV_NUM!r} / CAST(a_kth AS DOUBLE) END AS ea,
    CASE WHEN b_sn < {_KMV_K} THEN CAST(b_exact AS DOUBLE)
         ELSE {_KMV_NUM!r} / CAST(b_kth AS DOUBLE) END AS eb,
    CASE WHEN u_sn < {_KMV_K} THEN CAST(exact_union AS DOUBLE)
         ELSE {_KMV_NUM!r} / CAST(u_kth AS DOUBLE) END AS eu
  FROM per, u, ex
)
SELECT a_exact AS n_a, b_exact AS n_b, exact_union, exact_intersection,
       ROUND(eu, 4) AS est_union,
       ROUND(greatest(0.0, ea + eb - eu), 4) AS est_intersection,
       ROUND(greatest(0.0, ea + eb - eu) / eu, 4) AS est_jaccard
FROM est
"""

QUERIES["x_kmv_setops"] = x_kmv_setops
ORACLE["x_kmv_setops"] = X_KMV_SETOPS_SQL
