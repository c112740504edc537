"""Data-selection & distribution-diagnostic queries — the statistical
layer a training-data pipeline runs BEFORE committing to a corpus mix:
DSIR importance weighting (Xie et al. 2023), CCNet-style perplexity
bucketing, deterministic weighted reservoir sampling
(Efraimidis–Spirakis 2006), a two-sample Kolmogorov–Smirnov drift test,
leave-one-shard-out jackknife error bars, diagonal-Mahalanobis OOD
scoring over embeddings, and per-source KL divergence from the corpus
mix.

Reference parity: the reference has no statistics layer — its analytics
stop at funnel/rejection counts (`mega_data_factory/framework/metrics/
reporter.py:689-701`). These queries extend that layer with the
selection/drift battery a 100-TB curation run needs, following VERDICT
r1-r3's standing instruction to treat LLM-pipeline operators as
first-class alongside SURVEY §2.

Float discipline (house standard, see ``t_unigram_logprob``): every
transcendental term is ROUND()ed to a fixed number of decimals and
accumulated as DECIMAL (exact, order-independent); integer counts stay
integer until a final double division whose operands are bit-identical
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ
from webscale_multimodal_datapipeline_spark.plans import text_queries as TQ

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

# ---------------------------------------------------------------------------
# DSIR: hashed-n-gram importance resampling weights
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64


def s_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    importance weights: fit hashed-unigram bag models of a TARGET slice
    (here: ``lang = 'en'`` documents, standing in for "looks like the
    eval domain") and of the RAW corpus, then weight every document by
    the sum of per-token log likelihood-ratios. Top-weighted documents
    are the ones importance resampling would keep.

    Laplace-smoothed over ``DSIR_BUCKETS`` hash buckets:
    ``lr(b) = ln( ((ct_b+1)·(Nr+B)) / ((cr_b+1)·(Nt+B)) )`` — a single
    expression tree over exact integer counts, rounded to 4 decimals and
    summed as DECIMAL per document.

    Scale shape: one explode → ONE bucket rollup (map-side combinable,
    B=64 groups) with conditional target counts; the 64-row ratio table
    is bounded BY CONSTRUCTION, so its broadcast is free at any corpus
    size; one per-doc aggregate. Two shuffles total.
    """
    d = load_table(spark, sf_dir, "documents")
    tb = d.select(
        "doc_id",
        "lang",
        F.explode(TX.norm_tokens("text")).alias("term"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(TX.md5_long(F.col("term")), F.lit(DSIR_BUCKETS)).alias("b"),
    )
    buckets = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    tot = buckets.agg(
        F.sum("cr").alias("nr"),
        F.sum("ct").alias("nt"),
    )
    lr = buckets.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1) * (F.col("nr") + DSIR_BUCKETS)).cast("double")
                / ((F.col("cr") + 1) * (F.col("nt") + DSIR_BUCKETS)).cast("double")
            ),
            4,
        )
        .cast("decimal(18,4)")
        .alias("lr"),
    )
    return (
        tb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr").alias("_w"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("_w").cast("double").alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(20)
    )


S_DSIR_SQL = f"""
WITH tb AS (
  SELECT doc_id, lang,
         {OQ.sql_md5_long('term')} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang,
               unnest({OQ.sql_tokens(OQ.sql_norm('text'))}) AS term
        FROM documents)
), buckets AS (
  SELECT b, COUNT(*) AS cr,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct
  FROM tb GROUP BY b
), tot AS (
  SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM buckets
), lr AS (
  SELECT b,
         CAST(ROUND(ln(CAST((ct + 1) * (nr + {DSIR_BUCKETS}) AS DOUBLE)
                       / CAST((cr + 1) * (nt + {DSIR_BUCKETS}) AS DOUBLE)), 4)
              AS DECIMAL(18,4)) AS lr
  FROM buckets, tot
)
SELECT tb.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(lr.lr) AS DOUBLE) AS dsir_weight
FROM tb JOIN lr USING (b)
GROUP BY tb.doc_id
ORDER BY dsir_weight DESC, doc_id
LIMIT 20
"""

QUERIES["s_dsir_importance"] = s_dsir_importance
ORACLE["s_dsir_importance"] = S_DSIR_SQL


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail per source)
# ---------------------------------------------------------------------------


def s_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    document with the unigram-LM perplexity proxy (``t_unigram_logprob``
    — reused, one source of truth), then cut each SOURCE into perplexity
    terciles and report the per-(source, tercile) census. CCNet keeps
    the head/middle; the tail census is what you inspect before
    deciding.

    Scale shape: the LM scoring is ``t_unigram_logprob``'s audited
    two-shuffle plan; the tercile is ONE ntile window partitioned by
    source (hash-distributed over sources — no global sort), then a
    bounded (source × 3) rollup. Determinism: ntile order is pinned by
    (avg_logprob DESC, doc_id); avg_logprob itself is bit-identical in
    both engines by the decimal-accumulation discipline.
    """
    lp = TQ.t_unigram_logprob(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(F.desc("avg_logprob"), "doc_id")
    return (
        lp.join(src, "doc_id")
        .withColumn("tercile", F.ntile(3).over(w))
        .groupBy("source", "tercile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_logprob").alias("min_lp"),
            F.max("avg_logprob").alias("max_lp"),
        )
        .orderBy("source", "tercile")
    )


S_PPL_BUCKETS_SQL = f"""
WITH lp AS ({TQ.T_UNIGRAM_SQL}),
scored AS (
  SELECT d.source, lp.avg_logprob,
         NTILE(3) OVER (PARTITION BY d.source
                        ORDER BY lp.avg_logprob DESC, lp.doc_id) AS tercile
  FROM lp JOIN documents d USING (doc_id)
)
SELECT source, tercile, COUNT(*) AS n_docs,
       MIN(avg_logprob) AS min_lp, MAX(avg_logprob) AS max_lp
FROM scored GROUP BY source, tercile
ORDER BY source, tercile
"""

QUERIES["s_perplexity_buckets"] = s_perplexity_buckets
ORACLE["s_perplexity_buckets"] = S_PPL_BUCKETS_SQL


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis deterministic weighted sampling
# ---------------------------------------------------------------------------

_ES_DENOM = float(1 << 60)  # md5_long range


def s_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, one distributed pass:
    Efraimidis–Spirakis (2006) assign each row the key
    ``ln(u) / w`` (monotone in ``u^(1/w)``) with ``u`` uniform and
    ``w = n_chars``, and keep the top-k keys — longer documents are
    proportionally likelier, yet the draw is exactly reproducible
    because ``u`` derives from ``md5(doc_id)`` (the repo's seeded-hash
    randomness convention, cf. ``t_hash_sample``).

    Scale shape: a pure row-local key expression followed by
    ``TakeOrderedAndProject`` top-k — no shuffle beyond the final k-row
    gather; exactly the plan a 100-TB weighted draw needs.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (TX.md5_long(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(
        _ES_DENOM
    )
    key = F.round(F.log(u) / F.col("n_chars"), 8)
    return (
        d.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(25)
    )


S_WSAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       ROUND(ln(CAST({OQ.sql_md5_long('CAST(doc_id AS VARCHAR)')} + 1 AS DOUBLE)
                / {_ES_DENOM!r}) / n_chars, 8) AS sample_key
FROM documents
WHERE n_chars > 0
ORDER BY sample_key DESC, doc_id
LIMIT 25
"""

QUERIES["s_weighted_sample"] = s_weighted_sample
ORACLE["s_weighted_sample"] = S_WSAMPLE_SQL


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test
# ---------------------------------------------------------------------------


def s_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test of the document-length distribution, English
    vs everything else — the standard "did the corpus drift?" check run
    between crawl snapshots. The D statistic is computed EXACTLY: with
    per-value integer counts, ``|F1(v) − F2(v)|`` has the integer
    numerator ``|cum1·n2 − cum2·n1|``, so the max is found in integer
    space and only the final D and the α=0.05 critical value touch
    floats.

    Scale shape: one bounded per-value rollup (distinct document
    lengths — a few thousand values at any corpus size), ONE cumulative
    window over that bounded aggregate (the single-partition sort is
    over ≤ |length domain| rows, not data-sized), then a scalar max.
    """
    d = load_table(spark, sf_dir, "documents")
    per_v = d.groupBy("n_chars").agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("c1"),
        F.count(F.when(F.col("lang") != "en", 1)).alias("c2"),
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))).alias(
                "dnum"
            ),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.round(
                F.col("dnum").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("d_stat"),
            F.round(
                F.lit(1.3581)
                * F.sqrt(
                    (F.col("n1") + F.col("n2")).cast("double")
                    / (F.col("n1") * F.col("n2")).cast("double")
                ),
                6,
            ).alias("crit_05"),
        )
    )


S_KS_SQL = """
WITH per_v AS (
  SELECT n_chars,
         COUNT(*) FILTER (WHERE lang = 'en') AS c1,
         COUNT(*) FILTER (WHERE lang <> 'en') AS c2
  FROM documents GROUP BY n_chars
), cum AS (
  SELECT SUM(c1) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum1,
         SUM(c2) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum2
  FROM per_v
), tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             / CAST(n1 * n2 AS DOUBLE), 6) AS d_stat,
       ROUND(1.3581 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)),
             6) AS crit_05
FROM cum, tot
GROUP BY n1, n2
"""

QUERIES["s_ks_test"] = s_ks_test
ORACLE["s_ks_test"] = S_KS_SQL


# ---------------------------------------------------------------------------
# Leave-one-shard-out jackknife error bars
# ---------------------------------------------------------------------------

JK_SHARDS = 10


def s_shard_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-shard jackknife for the mean document length: split
    the corpus into ``JK_SHARDS`` deterministic md5 shards, recompute
    the mean leaving each shard out, and emit the leave-one-out means
    and Tukey pseudovalues — the cheap error bar for any pipeline metric
    when a closed-form variance is unavailable (the spread of the
    pseudovalues IS the jackknife variance, left to the consumer so no
    cross-shard float sum is ever formed here).

    Scale shape: ONE map-side-combinable rollup to 10 shard partials
    (exact integer sums/counts) + a 1-row total joined back; every float
    is a double quotient of exact integers, identical in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy(
        F.pmod(TX.md5_long(F.col("doc_id").cast("string")), F.lit(JK_SHARDS)).alias(
            "shard"
        )
    ).agg(
        F.sum("n_chars").alias("s_k"),
        F.count(F.lit(1)).alias("c_k"),
    )
    tot = per.agg(F.sum("s_k").alias("s_all"), F.sum("c_k").alias("c_all"))
    loo_raw = (F.col("s_all") - F.col("s_k")).cast("double") / (
        F.col("c_all") - F.col("c_k")
    ).cast("double")
    all_mean = F.col("s_all").cast("double") / F.col("c_all").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            F.col("c_k").cast("bigint").alias("n_docs"),
            F.round(loo_raw, 6).alias("loo_mean"),
            F.round(JK_SHARDS * all_mean - (JK_SHARDS - 1) * loo_raw, 6).alias(
                "pseudovalue"
            ),
        )
        .orderBy("shard")
    )


S_JACKKNIFE_SQL = f"""
WITH per AS (
  SELECT {OQ.sql_md5_long('CAST(doc_id AS VARCHAR)')} % {JK_SHARDS} AS shard,
         SUM(n_chars) AS s_k, COUNT(*) AS c_k
  FROM documents GROUP BY shard
), tot AS (SELECT SUM(s_k) AS s_all, SUM(c_k) AS c_all FROM per)
SELECT shard, CAST(c_k AS BIGINT) AS n_docs,
       ROUND(CAST(s_all - s_k AS DOUBLE) / CAST(c_all - c_k AS DOUBLE), 6)
         AS loo_mean,
       ROUND({JK_SHARDS} * (CAST(s_all AS DOUBLE) / CAST(c_all AS DOUBLE))
             - {JK_SHARDS - 1}
               * (CAST(s_all - s_k AS DOUBLE) / CAST(c_all - c_k AS DOUBLE)),
             6) AS pseudovalue
FROM per, tot
ORDER BY shard
"""

QUERIES["s_shard_jackknife"] = s_shard_jackknife
ORACLE["s_shard_jackknife"] = S_JACKKNIFE_SQL


# ---------------------------------------------------------------------------
# Diagonal-Mahalanobis OOD scoring over embeddings
# ---------------------------------------------------------------------------

_MAHA_DIMS = 8
_MAHA_SCALE = 16384  # 2^14: power-of-two quantization is exact in doubles


def s_mahalanobis_ood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution screening with a diagonal Mahalanobis
    distance (Lee et al. 2018's simplest variant): fit per-dimension
    mean/variance of the embedding corpus in ONE aggregation pass, score
    every vector by ``Σ_d (x_d − μ_d)² / σ_d²`` over the first
    ``_MAHA_DIMS`` dimensions, and surface the top-20 outliers — the
    embedding-space analogue of the Gopher outlier rules.

    Exactness: each coordinate is quantized ``q = floor(x · 2^14)``
    (power-of-two scaling is exact; floor has no tie rule), so means and
    variances are EXACT integer algebra — ``n²·σ² = n·Σq² − (Σq)²`` and
    ``n·(q − μ) = q·n − Σq`` — and the per-dimension term
    ``(q·n − Σq)² / (n·Σq² − (Σq)²)`` is one double division of exact
    decimals; the 8-term sum is a fixed left fold. No rounding until the
    final score.

    Scale shape: one scalar aggregate (16 decimal sums + count,
    map-side combinable), broadcast back as a 1-row cross join, then a
    row-local score and ``TakeOrderedAndProject`` top-k. One shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qc = [
        F.floor(F.col("embedding")[i].cast("double") * _MAHA_SCALE)
        .cast("long")
        .alias(f"q{i}")
        for i in range(_MAHA_DIMS)
    ]
    base = e.select("vec_id", *qc)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(_MAHA_DIMS):
        aggs.append(F.sum(F.col(f"q{i}").cast("decimal(38,0)")).alias(f"s{i}"))
        aggs.append(
            F.sum((F.col(f"q{i}") * F.col(f"q{i}")).cast("decimal(38,0)")).alias(
                f"ss{i}"
            )
        )
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats))
    term = None
    for i in range(_MAHA_DIMS):
        num = (
            F.col(f"q{i}").cast("decimal(38,0)") * F.col("n") - F.col(f"s{i}")
        ).cast("double")
        den = (
            F.col("n").cast("decimal(38,0)") * F.col(f"ss{i}")
            - F.col(f"s{i}") * F.col(f"s{i}")
        ).cast("double")
        # A constant (or constant-after-quantization) dimension has zero
        # variance → den = 0; guard it to contribute 0 instead of a NaN/Inf
        # that would silently poison the top-k ranking.
        t = F.when(den > 0, (num * num) / den).otherwise(F.lit(0.0))
        term = t if term is None else term + t
    return (
        scored.select("vec_id", F.round(term, 6).alias("ood_score"))
        .orderBy(F.desc("ood_score"), "vec_id")
        .limit(20)
    )


def _maha_sql() -> str:
    qs = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * {_MAHA_SCALE}) AS BIGINT)"
        f" AS q{i}"
        for i in range(_MAHA_DIMS)
    )
    aggs = ["COUNT(*) AS n"]
    for i in range(_MAHA_DIMS):
        aggs.append(f"SUM(CAST(q{i} AS DECIMAL(38,0))) AS s{i}")
        aggs.append(f"SUM(CAST(q{i} * q{i} AS DECIMAL(38,0))) AS ss{i}")
    terms = []
    for i in range(_MAHA_DIMS):
        num = f"CAST(CAST(q{i} AS DECIMAL(38,0)) * n - s{i} AS DOUBLE)"
        den = f"CAST(CAST(n AS DECIMAL(38,0)) * ss{i} - s{i} * s{i} AS DOUBLE)"
        terms.append(
            f"(CASE WHEN ({den}) > 0 THEN (({num}) * ({num})) / ({den}) "
            "ELSE 0.0 END)"
        )
    score = " + ".join(terms)
    return f"""
WITH base AS (SELECT vec_id, {qs} FROM embeddings),
stats AS (SELECT {", ".join(aggs)} FROM base)
SELECT vec_id, ROUND({score}, 6) AS ood_score
FROM base, stats
ORDER BY ood_score DESC, vec_id
LIMIT 20
"""


QUERIES["s_mahalanobis_ood"] = s_mahalanobis_ood
ORACLE["s_mahalanobis_ood"] = _maha_sql()


# ---------------------------------------------------------------------------
# Per-source KL divergence from the corpus length mix
# ---------------------------------------------------------------------------

_KL_BUCKET = 100


def s_kl_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the document-length histogram from
    the corpus-wide mix — the drift score that flags a source whose
    length profile departs from the blend (a crawler gone shallow, a
    boilerplate farm). ``KL(p_s ‖ p) = Σ_b p_sb · ln(p_sb / p_b)`` over
    ``n_chars DIV 100`` buckets; zero-count source buckets contribute 0
    by convention and never appear (inner join on observed cells).

    Determinism: the log argument ``(c_sb · n) / (c_b · n_s)`` is a
    ratio of exact integer products; each term is rounded to 6 decimals
    into DECIMAL and the per-source sum is order-independent.

    Scale shape: one (source × bucket) rollup — both domains bounded —
    two bounded marginal rollups joined back on bounded keys, one 1-row
    total. All map-side combinable; no data-sized shuffle.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", (F.col("n_chars") / _KL_BUCKET).cast("long").alias("bucket")
    )
    cells = d.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c_sb"))
    srcs = cells.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    glob = cells.groupBy("bucket").agg(F.sum("c_sb").alias("c_b"))
    tot = srcs.agg(F.sum("n_s").alias("n"))
    term = F.round(
        (F.col("c_sb").cast("double") / F.col("n_s").cast("double"))
        * F.log(
            (F.col("c_sb") * F.col("n")).cast("double")
            / (F.col("c_b") * F.col("n_s")).cast("double")
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        cells.join(glob, "bucket")
        .join(srcs, "source")
        .crossJoin(F.broadcast(tot))
        .select("source", "n_s", term.alias("t"))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_docs"),
            F.sum("t").cast("double").alias("kl_divergence"),
        )
        .orderBy("source")
    )


S_KL_SQL = f"""
WITH d AS (
  SELECT source, CAST(n_chars // {_KL_BUCKET} AS BIGINT) AS bucket FROM documents
), cells AS (
  SELECT source, bucket, COUNT(*) AS c_sb FROM d GROUP BY source, bucket
), srcs AS (SELECT source, SUM(c_sb) AS n_s FROM cells GROUP BY source),
gmarg AS (SELECT bucket, SUM(c_sb) AS c_b FROM cells GROUP BY bucket),
tot AS (SELECT SUM(n_s) AS n FROM srcs)
SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(ROUND((CAST(c_sb AS DOUBLE) / CAST(n_s AS DOUBLE))
                           * ln(CAST(c_sb * n AS DOUBLE)
                                / CAST(c_b * n_s AS DOUBLE)), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS kl_divergence
FROM cells JOIN gmarg USING (bucket) JOIN srcs USING (source), tot
GROUP BY source
ORDER BY source
"""

QUERIES["s_kl_per_source"] = s_kl_per_source
ORACLE["s_kl_per_source"] = S_KL_SQL


# ---------------------------------------------------------------------------
# Population Stability Index (snapshot drift)
# ---------------------------------------------------------------------------

_PSI_BUCKET = 50_000


def s_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    baseline (orders through 1997) vs current (1998 onward) — the
    industry-standard "has the incoming distribution shifted" score
    (PSI < 0.1 stable, > 0.25 action), computed on fixed-width value
    buckets with +1 smoothing so empty cells never blow up the log.

    Determinism: ``psi = Σ_b (pc_b − pb_b)·ln(pc_b / pb_b)`` where each
    p is a double quotient of exact smoothed integers; per-bucket terms
    are rounded to 6 decimals and summed as DECIMAL. Scale shape: ONE
    bucket rollup with conditional counts (bounded bucket domain), a
    1-row total, scalar output.
    """
    o = load_table(spark, sf_dir, "orders")
    # explicit floor: CAST(double AS BIGINT) truncates in Spark but ROUNDS
    # in DuckDB (the ts_seasonal_naive lesson) — floor is identical in both
    cells = o.groupBy(
        F.floor(F.col("o_totalprice") / _PSI_BUCKET).cast("long").alias("bucket")
    ).agg(
        F.count(F.when(F.year("o_orderdate") <= 1997, 1)).alias("cb"),
        F.count(F.when(F.year("o_orderdate") > 1997, 1)).alias("cc"),
    )
    tot = cells.agg(
        F.sum("cb").alias("nb"),
        F.sum("cc").alias("nc"),
        F.count(F.lit(1)).alias("nbuckets"),
    )
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("nbuckets")).cast(
        "double"
    )
    pc = (F.col("cc") + 1).cast("double") / (F.col("nc") + F.col("nbuckets")).cast(
        "double"
    )
    term = F.round((pc - pb) * F.log(pc / pb), 6).cast("decimal(18,6)")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select("nb", "nc", "nbuckets", term.alias("t"))
        .groupBy("nb", "nc", "nbuckets")
        .agg(F.sum("t").cast("double").alias("psi"))
        .select(
            F.col("nb").cast("bigint").alias("n_base"),
            F.col("nc").cast("bigint").alias("n_curr"),
            F.col("nbuckets").cast("bigint").alias("n_buckets"),
            "psi",
        )
    )


S_PSI_SQL = f"""
WITH cells AS (
  SELECT CAST(floor(o_totalprice / {_PSI_BUCKET}) AS BIGINT) AS bucket,
         COUNT(*) FILTER (WHERE year(o_orderdate) <= 1997) AS cb,
         COUNT(*) FILTER (WHERE year(o_orderdate) > 1997) AS cc
  FROM orders GROUP BY 1
), tot AS (
  SELECT SUM(cb) AS nb, SUM(cc) AS nc, COUNT(*) AS nbuckets FROM cells
)
SELECT CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_curr,
       CAST(nbuckets AS BIGINT) AS n_buckets,
       CAST(SUM(CAST(ROUND(
         (CAST(cc + 1 AS DOUBLE) / CAST(nc + nbuckets AS DOUBLE)
          - CAST(cb + 1 AS DOUBLE) / CAST(nb + nbuckets AS DOUBLE))
         * ln((CAST(cc + 1 AS DOUBLE) / CAST(nc + nbuckets AS DOUBLE))
              / (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbuckets AS DOUBLE))), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS psi
FROM cells, tot
GROUP BY nb, nc, nbuckets
"""

QUERIES["s_psi_drift"] = s_psi_drift
ORACLE["s_psi_drift"] = S_PSI_SQL


# ---------------------------------------------------------------------------
# Mann–Whitney U rank test (nonparametric two-sample drift)
# ---------------------------------------------------------------------------


def s_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test of document length, English vs the rest —
    the nonparametric companion to ``s_ks_test`` (KS asks "any
    distributional difference"; U asks the directional "does one group
    tend to run longer"). Exact to the last bit before the z-score:
    with per-value counts, doubled midrank sums and the tie-correction
    term ``Σ(t³−t)`` are plain integer algebra —
    ``2·R1 = Σ c1·(2r + t + 1)``, ``2·U1 = 2·R1 − n1(n1+1)`` (the
    standard scipy convention: U1 = R1 − n1(n1+1)/2, so z > 0 means
    group 1 tends LARGER) — and only the final normal approximation
    divides doubles.

    Scale shape: the ``s_ks_test`` plan — bounded per-length rollup, ONE
    cumulative window over the bounded value domain, scalar output.
    """
    d = load_table(spark, sf_dir, "documents")
    per_v = d.groupBy("n_chars").agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("c1"),
        F.count(F.when(F.col("lang") != "en", 1)).alias("c2"),
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    runs = per_v.select(
        "c1",
        (F.col("c1") + F.col("c2")).alias("t"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0)).alias(
            "r"
        ),
    )
    agg = runs.agg(
        F.sum(F.col("c1") * (2 * F.col("r") + F.col("t") + 1)).alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    u1x2 = F.col("r1x2") - n1 * (n1 + 1)
    mu_x2 = n1 * n2  # 2·μ_U = n1·n2
    var = (
        (n1 * n2).cast("double")
        / 12.0
        * (
            (nn + 1).cast("double")
            - F.col("ties").cast("double") / (nn * (nn - 1)).cast("double")
        )
    )
    z = (u1x2 - mu_x2).cast("double") / (2.0 * F.sqrt(var))
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        (u1x2.cast("double") / 2.0).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )


S_MWU_SQL = """
WITH per_v AS (
  SELECT n_chars,
         COUNT(*) FILTER (WHERE lang = 'en') AS c1,
         COUNT(*) FILTER (WHERE lang <> 'en') AS c2
  FROM documents GROUP BY n_chars
), runs AS (
  SELECT c1, c1 + c2 AS t,
         COALESCE(SUM(c1 + c2) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
  FROM per_v
), agg AS (
  SELECT SUM(c1 * (2 * r + t + 1)) AS r1x2,
         SUM(t * t * t - t) AS ties,
         SUM(c1) AS n1, SUM(t - c1) AS n2
  FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_stat,
       ROUND(CAST((r1x2 - n1 * (n1 + 1)) - n1 * n2 AS DOUBLE)
             / (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                 * (CAST(n1 + n2 + 1 AS DOUBLE)
                    - CAST(ties AS DOUBLE)
                      / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))), 6)
         AS z_score
FROM agg
"""

QUERIES["s_mannwhitney_u"] = s_mannwhitney_u
ORACLE["s_mannwhitney_u"] = S_MWU_SQL


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-source drift tests
# ---------------------------------------------------------------------------

_BH_ALPHA = "0.05"  # spelled as a literal so both engines parse the same token


def s_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (BH 1995) over per-source
    length-drift tests: for each ``source``, a Chebyshev-bounded p-value
    for "this source's mean document length differs from the corpus
    mean", then the BH step-up rule at α=0.05 — the multiple-testing
    discipline a curation run needs when it screens dozens of sources
    at once (raw per-test α would flag ~α·m sources by chance alone).

    Exactness: with per-source (n_s, s_s=Σ len) and corpus (N, S=Σ len,
    Q=Σ len²) integer sums, the mean deviation is ``dev = N·s_s − n_s·S``
    (exact BIGINT) and Chebyshev gives
    ``p_s = min(1, n_s·(N·Q − S²) / dev²)`` — a double ratio of exact
    integers, bit-identical operands in both engines (dev² computed as
    double: dev ~1e10 would overflow BIGINT when squared). ``dev = 0``
    (a source exactly at the corpus mean) is p=1 by convention. The BH
    step-up ``k = max{i : p_(i) ≤ i·α/m}`` ranks by (p, source) so ties
    are bit-determined.

    Scale shape: ONE pass over documents → per-source rollup (m groups,
    m = # sources, bounded by contract), a 1-row corpus total broadcast,
    and windows over the m-row table only. The fact table never crosses
    the wire unaggregated.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("n_chars").cast("long").alias("s_s"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n_chars").cast("long").alias("ss"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("qq"),
    )
    dev = F.col("nn") * F.col("s_s") - F.col("n_s") * F.col("ss")
    p_raw = (
        F.col("n_s").cast("double")
        * (F.col("nn") * F.col("qq") - F.col("ss") * F.col("ss")).cast("double")
        / (dev.cast("double") * dev.cast("double"))
    )
    scored = (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            # coalesce: a source whose every length is NULL yields NULL sums
            # -> NULL p; "no evidence" is p = 1.0 by the dev == 0 convention
            # (and keeps NULL out of the rank ordering, where Spark sorts
            # NULLs first but DuckDB last)
            F.coalesce(
                F.round(
                    F.when(dev == 0, F.lit(1.0)).otherwise(
                        F.least(F.lit(1.0), p_raw)
                    ),
                    8,
                ),
                F.lit(1.0),
            ).alias("p_value"),
        )
    )
    wr = Window.orderBy(F.col("p_value").asc(), F.col("source").asc())
    m = Window.partitionBy()  # m-row table: bounded by contract
    ranked = scored.select(
        "source",
        "n_s",
        "p_value",
        F.row_number().over(wr).alias("bh_rank"),
        F.count(F.lit(1)).over(m).alias("m"),
    )
    passes = F.when(
        F.col("p_value")
        <= F.col("bh_rank").cast("double")
        * F.lit(float(_BH_ALPHA))
        / F.col("m").cast("double"),
        F.col("bh_rank"),
    )
    return (
        ranked.select(
            "source",
            "n_s",
            "p_value",
            "bh_rank",
            F.max(passes).over(m).alias("k"),
        )
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            "p_value",
            F.col("bh_rank").cast("long").alias("bh_rank"),
            (F.col("bh_rank") <= F.coalesce(F.col("k"), F.lit(0)))
            .cast("int")
            .alias("bh_reject"),
        )
    )


S_BH_FDR_SQL = f"""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(SUM(n_chars) AS BIGINT) AS s_s
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(n_chars) AS BIGINT) AS ss,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS qq
  FROM documents
), scored AS (
  SELECT source, n_s,
         COALESCE(ROUND(CASE WHEN nn * s_s - n_s * ss = 0 THEN 1.0
           ELSE LEAST(1.0,
             CAST(n_s AS DOUBLE) * CAST(nn * qq - ss * ss AS DOUBLE)
             / (CAST(nn * s_s - n_s * ss AS DOUBLE)
                * CAST(nn * s_s - n_s * ss AS DOUBLE)))
           END, 8), 1.0) AS p_value
  FROM per, tot
), ranked AS (
  SELECT source, n_s, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value ASC, source ASC) AS bh_rank,
         COUNT(*) OVER () AS m
  FROM scored
), kk AS (
  SELECT source, n_s, p_value, bh_rank,
         MAX(CASE WHEN p_value <= CAST(bh_rank AS DOUBLE) * {_BH_ALPHA}
                                  / CAST(m AS DOUBLE)
                  THEN bh_rank END) OVER () AS k
  FROM ranked
)
SELECT source, n_s AS n_docs, p_value, CAST(bh_rank AS BIGINT) AS bh_rank,
       CAST(bh_rank <= COALESCE(k, 0) AS INT) AS bh_reject
FROM kk
"""

QUERIES["s_bh_fdr"] = s_bh_fdr
ORACLE["s_bh_fdr"] = S_BH_FDR_SQL


# ---------------------------------------------------------------------------
# Poisson bootstrap (hash-deterministic replicate weights)
# ---------------------------------------------------------------------------

_BOOT_REPS = 32
# Inverse CDF of Poisson(1) over u ~ U[0,1) scaled to integers per 1e6:
# P(0)=.367879, P(<=1)=.735759, P(<=2)=.919699, P(<=3)=.981012, else 4.
_BOOT_CUTS = (367879, 735759, 919699, 981012)


def _boot_weight_spark(u):
    from pyspark.sql import functions as FF

    w = FF.when(u < _BOOT_CUTS[0], 0)
    for i, c in enumerate(_BOOT_CUTS[1:], start=1):
        w = w.when(u < c, i)
    return w.otherwise(4)


def _boot_weight_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {i}" for i, c in enumerate(_BOOT_CUTS)
    )
    return f"(CASE {cases} ELSE 4 END)"


def s_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap standard error + empirical CI for the corpus
    mean document length (Chamandy et al. 2012, "Estimating Uncertainty
    for Massive Data Streams" — THE bootstrap that works on data too big
    to resample: replicate b weights each row by an independent
    Poisson(1) draw, so no replicate ever materializes). Weights are
    hash-DETERMINISTIC: ``u = md5(doc_id|b) mod 1e6`` through the exact
    integer inverse-CDF of Poisson(1), so both engines draw identical
    replicates and the whole statistic is reproducible run-to-run.

    Exactness: per-replicate (Σ w·len, Σ w) are exact integers in ONE
    scan (2·B conditional aggregates, map-side combinable — no row
    fanout, the scale-critical choice vs the explode-by-B shape);
    replicate means are rounded to 6 decimals and accumulated as
    DECIMAL, so the bootstrap SE's power sums are order-independent.
    CI bounds are the 2nd / 31st order statistics of the 32 replicate
    means (the ~±2σ empirical band).
    """
    d = load_table(spark, sf_dir, "documents")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("s_all"),
    ]
    for b in range(_BOOT_REPS):
        u = F.pmod(
            TX.md5_long(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(str(b)))),
            F.lit(1_000_000),
        )
        w = _boot_weight_spark(u)
        aggs.append(F.sum(w * F.col("n_chars")).cast("long").alias(f"_s{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"_c{b}"))
    tot = d.agg(*aggs)
    means = tot.select(
        "n_docs",
        "s_all",
        F.explode(
            F.array(
                *[
                    F.round(
                        F.col(f"_s{b}").cast("double") / F.col(f"_c{b}").cast("double"),
                        6,
                    ).cast("decimal(18,6)")
                    for b in range(_BOOT_REPS)
                ]
            )
        ).alias("m"),
    )
    nb = _BOOT_REPS
    return (
        means.groupBy("n_docs", "s_all")
        .agg(
            F.sum("m").alias("_sm"),
            F.sum(F.col("m") * F.col("m")).alias("_sm2"),
            F.array_sort(F.collect_list("m")).alias("_ms"),
        )
        .select(
            "n_docs",
            F.lit(nb).cast("int").alias("n_reps"),
            F.round(
                F.col("s_all").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("mean_chars"),
            F.round(F.col("_sm").cast("double") / nb, 6).alias("boot_mean"),
            # double-FIRST algebra: 32·Σm² and (Σm)² overflow DecimalType's
            # 38-digit cap in Spark (silently rounded) while DuckDB keeps
            # DECIMAL(38,12) exact — casting the two decimal sums to double
            # BEFORE the power-sum algebra makes the operands bit-identical
            F.round(
                F.sqrt(
                    (
                        nb * F.col("_sm2").cast("double")
                        - F.col("_sm").cast("double") * F.col("_sm").cast("double")
                    )
                    / (nb * (nb - 1))
                ),
                6,
            ).alias("boot_se"),
            F.element_at("_ms", 2).cast("double").alias("ci_lo"),
            F.element_at("_ms", nb - 1).cast("double").alias("ci_hi"),
        )
    )


def _poisson_bootstrap_sql() -> str:
    nb = _BOOT_REPS
    u = OQ.sql_md5_long("CAST(doc_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)") + " % 1000000"
    w = _boot_weight_sql(f"({u})")
    return f"""
WITH reps AS (
  SELECT b, CAST(SUM({w} * n_chars) AS BIGINT) AS s,
         CAST(SUM({w}) AS BIGINT) AS c
  FROM documents CROSS JOIN (SELECT unnest(range(0, {nb})) AS b)
  GROUP BY b
), means AS (
  SELECT CAST(ROUND(CAST(s AS DOUBLE) / CAST(c AS DOUBLE), 6) AS DECIMAL(18,6)) AS m,
         ROW_NUMBER() OVER (ORDER BY CAST(s AS DOUBLE) / CAST(c AS DOUBLE) ASC) AS rk
  FROM reps
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS s_all
  FROM documents
)
SELECT n_docs, CAST({nb} AS INT) AS n_reps,
       ROUND(CAST(s_all AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_chars,
       ROUND(CAST(SUM(m) AS DOUBLE) / {nb}, 6) AS boot_mean,
       ROUND(sqrt(({nb} * CAST(SUM(m * m) AS DOUBLE)
                   - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE))
                  / ({nb} * {nb - 1})), 6) AS boot_se,
       CAST(MIN(CASE WHEN rk = 2 THEN m END) AS DOUBLE) AS ci_lo,
       CAST(MIN(CASE WHEN rk = {nb - 1} THEN m END) AS DOUBLE) AS ci_hi
FROM means, tot
GROUP BY n_docs, s_all
"""


QUERIES["s_poisson_bootstrap"] = s_poisson_bootstrap
ORACLE["s_poisson_bootstrap"] = _poisson_bootstrap_sql()


# ---------------------------------------------------------------------------
# Neyman allocation for stratified sampling
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000


def s_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation (Neyman 1934) over
    sources: for a fixed audit budget of n=10,000 documents, the
    allocation ``n_h ∝ N_h·σ_h`` minimizes the variance of the
    estimated corpus mean — put the samples where the strata are big
    AND internally diverse. Output per source: stratum size, length σ,
    the proportional and Neyman allocations, and their ratio (the
    "how much does optimal differ from naive" dial a quality-audit
    pipeline reads before spending labeling budget).

    Exactness: σ_h = sqrt((N_h·Q_h − S_h²)/N_h²) over exact integer
    power sums; stratum weights w_h = N_h·σ_h are rounded to 6 decimals
    and DECIMAL-summed so the denominator is order-independent;
    integer allocations use ``floor(x + 0.5)`` (identical operand
    expressions in both engines — no HALF_UP/HALF_EVEN divergence).

    Scale shape: ONE pass over documents → m-source-bounded rollup, a
    1-row weight total broadcast back. Constant-size output.
    """
    n = _NEYMAN_BUDGET
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("n_chars").cast("long").alias("s_h"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("q_h"),
    )
    sigma = F.sqrt(
        (F.col("n_h") * F.col("q_h") - F.col("s_h") * F.col("s_h")).cast("double")
        / (F.col("n_h") * F.col("n_h")).cast("double")
    )
    w = F.round(F.col("n_h").cast("double") * sigma, 6).cast("decimal(24,6)")
    weighted = per.select("source", "n_h", sigma.alias("_sig"), w.alias("_w"))
    tot = weighted.agg(
        F.sum("_w").alias("_wsum"), F.sum("n_h").cast("long").alias("_ntot")
    )
    n_prop = F.floor(
        F.lit(float(n)) * F.col("n_h").cast("double") / F.col("_ntot").cast("double")
        + F.lit(0.5)
    ).cast("long")
    n_ney = F.floor(
        F.lit(float(n))
        * (F.col("_w").cast("double") / F.col("_wsum").cast("double"))
        + F.lit(0.5)
    ).cast("long")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_h").alias("n_docs"),
            F.round(F.col("_sig"), 6).alias("sigma_len"),
            n_prop.alias("n_prop"),
            n_ney.alias("n_neyman"),
            F.round(n_ney.cast("double") / n_prop.cast("double"), 4).alias(
                "alloc_ratio"
            ),
        )
    )


S_NEYMAN_SQL = f"""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(n_chars) AS BIGINT) AS s_h,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS q_h
  FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_h,
         sqrt(CAST(n_h * q_h - s_h * s_h AS DOUBLE)
              / CAST(n_h * n_h AS DOUBLE)) AS sig,
         CAST(ROUND(CAST(n_h AS DOUBLE)
              * sqrt(CAST(n_h * q_h - s_h * s_h AS DOUBLE)
                     / CAST(n_h * n_h AS DOUBLE)), 6) AS DECIMAL(24,6)) AS w
  FROM per
), tot AS (
  SELECT SUM(w) AS wsum, CAST(SUM(n_h) AS BIGINT) AS ntot FROM weighted
)
SELECT source, n_h AS n_docs, ROUND(sig, 6) AS sigma_len,
       CAST(floor(CAST({_NEYMAN_BUDGET} AS DOUBLE) * CAST(n_h AS DOUBLE)
                  / CAST(ntot AS DOUBLE) + 0.5) AS BIGINT) AS n_prop,
       CAST(floor(CAST({_NEYMAN_BUDGET} AS DOUBLE)
                  * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE)) + 0.5) AS BIGINT) AS n_neyman,
       ROUND(CAST(floor(CAST({_NEYMAN_BUDGET} AS DOUBLE)
                        * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE)) + 0.5) AS DOUBLE)
             / CAST(floor(CAST({_NEYMAN_BUDGET} AS DOUBLE) * CAST(n_h AS DOUBLE)
                          / CAST(ntot AS DOUBLE) + 0.5) AS DOUBLE), 4)
         AS alloc_ratio
FROM weighted, tot
"""

QUERIES["s_neyman_allocation"] = s_neyman_allocation
ORACLE["s_neyman_allocation"] = S_NEYMAN_SQL


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test (sequence randomness)
# ---------------------------------------------------------------------------


def s_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz RUNS test on the daily order-count series: are
    above-median and below-median days randomly interleaved, or does
    the series cluster (trends/regimes) or alternate (oscillation)?
    The sequence-randomness complement to ``ts_autocorrelation``'s
    lag-linear view: runs catch non-linear regime structure ACF can't.

    Exact formulation: the median cut uses the exact lower median from
    the count histogram (ties: days AT the median are assigned below —
    a fixed convention, stated here, mirrored in both engines); the run
    count is 1 + Σ(sign flips) via one lag over the calendar-bounded
    daily rollup; under H0, ``μ = 2·n1·n0/n + 1`` and
    ``σ² = (μ−1)(μ−2)/(n−1)`` — both double expressions of exact BIGINT
    counts; z = (R − μ)/σ. |z| > 1.96 rejects randomness.

    Scale shape: one daily rollup, one bounded-domain lag window, one
    scalar aggregate — 1-row output.
    """
    from webscale_multimodal_datapipeline_spark.functions import stats as ST

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(F.count(F.lit(1)).alias("c"))
    med = ST.exact_lower_median(daily, "c").select(F.col("median").alias("_med"))
    signed = daily.crossJoin(F.broadcast(med)).select(
        "o_orderdate", (F.col("c") > F.col("_med")).cast("int").alias("s")
    )
    lagged = signed.select(
        "s", F.lag("s").over(Window.orderBy("o_orderdate")).alias("_prev")
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n0"),
        (
            F.count(F.when(F.col("_prev").isNotNull() & (F.col("s") != F.col("_prev")), 1))
            + 1
        )
        .cast("long")
        .alias("runs"),
    )
    mu = (
        F.lit(2.0) * F.col("n1").cast("double") * F.col("n0").cast("double")
        / F.col("n").cast("double")
        + F.lit(1.0)
    )
    var = (mu - 1.0) * (mu - 2.0) / (F.col("n").cast("double") - 1.0)
    return agg.select(
        "n",
        "n1",
        "n0",
        "runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round((F.col("runs").cast("double") - mu) / F.sqrt(var), 6).alias("z"),
    )


S_RUNS_SQL = f"""
WITH daily AS (
  SELECT o_orderdate, COUNT(*) AS c FROM orders GROUP BY 1
), med AS (
  SELECT {OQ.sql_lower_median('c', 'daily')} AS m
), signed AS (
  SELECT o_orderdate, CAST(c > m AS INT) AS s FROM daily, med
), lagged AS (
  SELECT s, LAG(s) OVER (ORDER BY o_orderdate) AS prev FROM signed
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(s) AS BIGINT) AS n1,
       CAST(COUNT(*) - SUM(s) AS BIGINT) AS n0,
       CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL AND s <> prev) + 1 AS BIGINT)
         AS runs,
       ROUND(CAST(2 AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
             * CAST(COUNT(*) - SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             + CAST(1 AS DOUBLE), 6) AS expected_runs,
       ROUND((CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL AND s <> prev) + 1
                   AS DOUBLE)
              - (CAST(2 AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                 * CAST(COUNT(*) - SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 + CAST(1 AS DOUBLE)))
             / sqrt((CAST(2 AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                     * CAST(COUNT(*) - SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(2 AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                       * CAST(COUNT(*) - SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       - CAST(1 AS DOUBLE))
                    / (CAST(COUNT(*) AS DOUBLE) - CAST(1 AS DOUBLE))), 6) AS z
FROM lagged
"""

QUERIES["s_runs_test"] = s_runs_test
ORACLE["s_runs_test"] = S_RUNS_SQL


# ---------------------------------------------------------------------------
# DSIR effective sample size
# ---------------------------------------------------------------------------


def s_dsir_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the DSIR importance weights (Kong 1992:
    ``ESS = (Σw)²/Σw²``) — the one number that says whether importance
    resampling is USABLE: ESS ≈ n means the target and raw distributions
    barely differ (reweighting is cheap), ESS ≪ n means a few documents
    carry all the weight and the resampled corpus will be tiny and
    high-variance. Runs the same hashed-unigram log-ratio pipeline as
    ``s_dsir_importance`` over ALL documents (no top-k cut).

    Determinism: per-doc log-weights are the DECIMAL sums of the rounded
    lr table (exact, order-free); weights are exp(lw − max lw) — the max
    is an exact decimal scalar, the shift cancels in ESS algebraically
    and bounds exp at 1 numerically — rounded to 8 decimals and
    DECIMAL-summed; the final ESS divides double casts of the two exact
    sums (the double-FIRST discipline from ``s_poisson_bootstrap``).

    Scale shape: the ``s_dsir_importance`` plan (bounded 64-row ratio
    broadcast, one per-doc aggregate) plus one 1-row max broadcast and
    one scalar aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    tb = d.select(
        "doc_id",
        "lang",
        F.explode(TX.norm_tokens("text")).alias("term"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(TX.md5_long(F.col("term")), F.lit(DSIR_BUCKETS)).alias("b"),
    )
    buckets = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    tot = buckets.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    lr = buckets.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1) * (F.col("nr") + DSIR_BUCKETS)).cast("double")
                / ((F.col("cr") + 1) * (F.col("nt") + DSIR_BUCKETS)).cast("double")
            ),
            4,
        )
        .cast("decimal(18,4)")
        .alias("lr"),
    )
    lw = (
        tb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("_lw"))
    )
    mx = lw.agg(F.max("_lw").alias("_mx"))
    e = F.round(F.exp((F.col("_lw") - F.col("_mx")).cast("double")), 8).cast(
        "decimal(18,8)"
    )
    sums = (
        lw.crossJoin(F.broadcast(mx))
        .select(e.alias("_e"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_e").alias("_se"),
            F.sum(F.col("_e") * F.col("_e")).alias("_se2"),
        )
    )
    ess = (
        F.col("_se").cast("double") * F.col("_se").cast("double")
    ) / F.col("_se2").cast("double")
    return sums.select(
        "n_docs",
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n_docs").cast("double"), 6).alias("ess_ratio"),
    )


S_DSIR_ESS_SQL = f"""
WITH tb AS (
  SELECT doc_id, lang,
         {OQ.sql_md5_long('term')} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang,
               unnest({OQ.sql_tokens(OQ.sql_norm('text'))}) AS term
        FROM documents)
), buckets AS (
  SELECT b, COUNT(*) AS cr,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct
  FROM tb GROUP BY b
), tot AS (
  SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM buckets
), lr AS (
  SELECT b,
         CAST(ROUND(ln(CAST((ct + 1) * (nr + {DSIR_BUCKETS}) AS DOUBLE)
                       / CAST((cr + 1) * (nt + {DSIR_BUCKETS}) AS DOUBLE)), 4)
              AS DECIMAL(18,4)) AS lr
  FROM buckets, tot
), lw AS (
  SELECT tb.doc_id, SUM(lr.lr) AS lw
  FROM tb JOIN lr USING (b) GROUP BY tb.doc_id
), mx AS (
  SELECT MAX(lw) AS m FROM lw
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(e) AS se, SUM(e * e) AS se2
  FROM (SELECT CAST(ROUND(exp(CAST(lw - m AS DOUBLE)), 8) AS DECIMAL(18,8)) AS e
        FROM lw, mx)
)
SELECT n_docs,
       ROUND(CAST(se AS DOUBLE) * CAST(se AS DOUBLE) / CAST(se2 AS DOUBLE), 4)
         AS ess,
       ROUND(CAST(se AS DOUBLE) * CAST(se AS DOUBLE) / CAST(se2 AS DOUBLE)
             / CAST(n_docs AS DOUBLE), 6) AS ess_ratio
FROM sums
"""

QUERIES["s_dsir_ess"] = s_dsir_ess
ORACLE["s_dsir_ess"] = S_DSIR_ESS_SQL


# ---------------------------------------------------------------------------
# SPRT — Wald's sequential probability ratio test (round 6)
# ---------------------------------------------------------------------------

# H0: p = 0.4 vs H1: p = 0.5 for P(value > 50); alpha = beta = 0.05.
# Literal float constants are embedded with full repr precision in BOTH
# engines' expressions, so the double arithmetic is bit-identical.
_SPRT_C1 = repr(__import__("math").log(0.5 / 0.4))
_SPRT_C0 = repr(__import__("math").log(0.5 / 0.6))
_SPRT_A = repr(__import__("math").log(19.0))   # ln((1-beta)/alpha)
_SPRT_B = repr(-__import__("math").log(19.0))  # ln(beta/(1-alpha))


def s_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT (1945) over each event type's stream in event-time
    order — the early-stopping monitor an experimentation pipeline runs
    instead of a fixed-horizon test: outcome = (value > 50), cumulative
    log-likelihood ratio LLR_t = s_t·ln(p1/p0) + (t−s_t)·ln((1−p1)/(1−p0))
    for H0: p=0.4 vs H1: p=0.5, decision boundaries ±ln(19) (α=β=0.05).
    Emits, per event type, the final LLR, the first boundary-crossing
    sample index, and the sequential decision at that crossing
    ('accept_h1' / 'accept_h0' / 'continue').

    Cross-engine determinism: the walk order is (ts, event_id) — unique —
    LLR derives from integer cumulative counts with shared float literal
    constants, so both engines produce bit-equal doubles. NULL ts or
    value rows are excluded by spec (unorderable / no outcome — §24).

    Scale shape: the window partitions by event_type (the metric being
    monitored), which is exactly the per-metric sequential scan SPRT
    defines — no global sort, no single-partition exchange."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type", "ts", "event_id",
            (F.col("value") > 50.0).cast("long").alias("succ"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.sum(F.lit(1)).over(w)
    s = F.sum("succ").over(w)
    llr = s.cast("double") * F.lit(float(_SPRT_C1)) + (t - s).cast("double") * F.lit(
        float(_SPRT_C0)
    )
    walk = ev.select(
        "event_type",
        t.alias("t"),
        s.alias("s"),
        llr.alias("llr"),
    )
    up = F.min(F.when(F.col("llr") >= float(_SPRT_A), F.col("t")))
    lo = F.min(F.when(F.col("llr") <= float(_SPRT_B), F.col("t")))
    agg = walk.groupBy("event_type").agg(
        F.max("t").cast("long").alias("n_total"),
        F.max("s").cast("long").alias("n_success"),
        F.round(F.max(F.struct(F.col("t"), F.col("llr"))).getField("llr"), 6).alias(
            "llr_final"
        ),
        up.cast("long").alias("_up"),
        lo.cast("long").alias("_lo"),
    )
    first = (
        F.when(F.col("_up").isNull() & F.col("_lo").isNull(), F.lit(None).cast("long"))
        .when(F.col("_up").isNull(), F.col("_lo"))
        .when(F.col("_lo").isNull(), F.col("_up"))
        .otherwise(F.least("_up", "_lo"))
    )
    decision = (
        F.when(first.isNull(), F.lit("continue"))
        .when(F.col("_lo").isNull() | (F.col("_up") <= F.col("_lo")), F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
    )
    return (
        agg.select(
            "event_type",
            "n_total",
            "n_success",
            "llr_final",
            first.alias("first_cross_n"),
            decision.alias("decision"),
        )
        .orderBy("event_type")
    )


S_SPRT_SQL = f"""
WITH walk AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS t,
         SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), scored AS (
  SELECT event_type, t, s,
         CAST(s AS DOUBLE) * ({_SPRT_C1}) + CAST(t - s AS DOUBLE) * ({_SPRT_C0}) AS llr
  FROM walk
), agg AS (
  SELECT event_type,
         CAST(MAX(t) AS BIGINT) AS n_total,
         CAST(MAX(s) AS BIGINT) AS n_success,
         ROUND(arg_max(llr, t), 6) AS llr_final,
         CAST(MIN(CASE WHEN llr >= ({_SPRT_A}) THEN t END) AS BIGINT) AS up,
         CAST(MIN(CASE WHEN llr <= ({_SPRT_B}) THEN t END) AS BIGINT) AS lo
  FROM scored GROUP BY event_type
)
SELECT event_type, n_total, n_success, llr_final,
       CASE WHEN up IS NULL AND lo IS NULL THEN NULL
            WHEN up IS NULL THEN lo WHEN lo IS NULL THEN up
            ELSE LEAST(up, lo) END AS first_cross_n,
       CASE WHEN up IS NULL AND lo IS NULL THEN 'continue'
            WHEN lo IS NULL OR up <= lo THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM agg ORDER BY event_type
"""

QUERIES["s_sprt_boundary"] = s_sprt_boundary
ORACLE["s_sprt_boundary"] = S_SPRT_SQL


def s_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood-ratio goodness of fit) of the documents
    source distribution against uniform — the chi²-family companion the
    x_chi2_cells query lacks (G is additive across cells and the LRT-
    exact form). Emits one row per source with its observed count,
    uniform expectation and G contribution 2·o·ln(o/e); per-cell rows
    (the ``s_kl_per_source`` pattern) keep every float expression
    row-local on exact integers, so no cross-engine sum-order issue
    exists. NULL source would be its own cell; the fixture has none and
    a NULL group key groups identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("observed"))
    tot = counts.agg(
        F.sum("observed").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    e = F.col("_n") / F.col("_k")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("observed").cast("long").alias("observed"),
            F.round(e, 6).alias("expected_uniform"),
            F.round(
                2.0 * F.col("observed").cast("double")
                * F.log(F.col("observed").cast("double") / e),
                6,
            ).alias("g_term"),
        )
        .orderBy("source")
    )


S_G_TEST_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS observed FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(observed) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS k
  FROM counts
)
SELECT source,
       CAST(observed AS BIGINT) AS observed,
       ROUND(n / k, 6) AS expected_uniform,
       ROUND(2.0 * CAST(observed AS DOUBLE) * ln(CAST(observed AS DOUBLE) / (n / k)), 6) AS g_term
FROM counts, tot ORDER BY source
"""

QUERIES["s_g_test"] = s_g_test
ORACLE["s_g_test"] = S_G_TEST_SQL
