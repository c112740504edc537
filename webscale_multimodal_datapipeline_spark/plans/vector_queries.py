"""Embedding / vector queries over ``embeddings`` (reference R4-R7 output
shapes + D4 semantic dedup + the similarity-search extension).

Covers: L2 norms & normalization, linear (MLP-head) scoring over
precomputed embeddings (R6/R7 shape), hyperplane-LSH bucketing, cosine
near-dup dedup, exact brute-force cosine top-k and LSH-bucketed top-k,
k-means clustering (pyspark.ml — replaces the reference's 547-line
hand-rolled distributed Lloyd's, ``models/kmeans/distributed_trainer.py``).

Floating-point parity: all sums are left-folds over double-cast elements
and the DuckDB oracle generates the same fold order — results are
bit-identical, no tolerance needed (see plans/oracle_fragments.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.catalog import load_table
from webscale_multimodal_datapipeline_spark.functions import vectors as VX
from webscale_multimodal_datapipeline_spark.operators import dedup as OD
from webscale_multimodal_datapipeline_spark.operators import similarity as OS
from webscale_multimodal_datapipeline_spark.plans import oracle_fragments as OQ

DIM = 64
MLP_WEIGHTS = [((i * 7) % 11 - 5) / 10.0 for i in range(DIM)]
MLP_BIAS = 0.1
COSINE_DEDUP_THRESHOLD = 0.9
N_QUERIES = 3
TOP_K = 5


def v_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per embedding (R4/R5 normalization building block)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", VX.l2_norm("embedding").alias("l2_norm"), "label")


V_NORMS_SQL = f"""
SELECT vec_id, {OQ.sql_l2_norm('embedding', DIM)} AS l2_norm, label
FROM embeddings
"""


def v_mlp_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear scoring head over embeddings (R6 aesthetic / R7 AIGC shape,
    ``image_aesthetic_quality.py:195-233``) + thresholded boolean (R7's
    ``image_is_aigc`` = score > 0.5, ``image_aigc_detector.py:228-233``)."""
    e = load_table(spark, sf_dir, "embeddings")
    score = VX.mlp_score("embedding", MLP_WEIGHTS, MLP_BIAS)
    return e.select(
        "vec_id",
        score.alias("mlp_score"),
        (score > 0.5).alias("is_positive"),
    )


V_MLP_SQL = f"""
SELECT vec_id,
       {OQ.sql_mlp_score('embedding', MLP_WEIGHTS, MLP_BIAS)} AS mlp_score,
       ({OQ.sql_mlp_score('embedding', MLP_WEIGHTS, MLP_BIAS)} > 0.5) AS is_positive
FROM embeddings
"""


def v_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket histogram (semantic-dedup bucketing, reference
    D4 design ``backend.py:89-93``)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.withColumn("bucket", OD.hyperplane_bucket("embedding", DIM))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


V_BUCKETS_SQL = f"""
SELECT {OQ.sql_hyperplane_bucket('embedding', DIM)} AS bucket, COUNT(*) AS n
FROM embeddings GROUP BY 1
"""


def v_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal (LSH bucket → cosine >= 0.9 →
    drop higher id); survivors. DEFAULT flags — i.e. ``center="auto"``:
    the round-8 cone auto-gate runs inside the operator and the oracle
    below replays its integer decision, so this row now value-checks the
    gate + both candidate arms, not just the raw one."""
    e = load_table(spark, sf_dir, "embeddings")
    return OD.embedding_cosine_dedup(
        e, dim=DIM, threshold=COSINE_DEDUP_THRESHOLD
    ).select("vec_id", "label")


# The oracle replays center="auto" structurally: g = the exact-integer
# cone gate (sql_cone_gate, bit-identical to cone_gate_decision), and the
# bucketed relation b is the raw arm when NOT gated, the mean-centered
# arm when gated — the fixtures sit far on the balanced side (119 buckets
# / 1.25 % max share at sf0.1 vs the <64 / >25 % trip line), so the
# pinned hashes are unchanged; the gated arm is exercised by
# v_autogate_cone_dedup below, whose data trips the gate.
V_COSINE_DEDUP_SQL = f"""
WITH g AS (SELECT {OQ.sql_cone_gate('embedding', DIM)} AS gated),
st AS (
  {OQ.sql_hyperplane_bias_select('embedding', DIM, OD.EMB_LSH_PLANES, 'embeddings')}
), b AS (
  SELECT vec_id, embedding, {OQ.sql_hyperplane_bucket('embedding', DIM)} AS bucket
  FROM embeddings WHERE NOT (SELECT gated FROM g)
  UNION ALL
  SELECT vec_id, embedding,
         {OQ.sql_centered_hyperplane_bucket('embedding', DIM, OD.EMB_LSH_PLANES)} AS bucket
  FROM embeddings, st WHERE (SELECT gated FROM g)
), dup AS (
  SELECT DISTINCT l.vec_id AS vid
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id > r.vec_id
  WHERE {OQ.sql_cosine('l.embedding', 'r.embedding', DIM)} >= {COSINE_DEDUP_THRESHOLD}
)
SELECT vec_id, label FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.vid = e.vec_id)
"""
# NOT EXISTS, not NOT IN: a NULL vec_id row makes `vec_id NOT IN (...)`
# NULL (row silently dropped) while Spark's left_anti keeps it — id-less
# rows pass through dedup untouched by spec (they can never be ordered
# against a representative). The ARCHITECTURE §24 anti-join class.


def v_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (query set = vec_id < 3, broadcast)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return OS.cosine_topk(e, q, k=TOP_K)


V_TOPK_SQL = f"""
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
) WHERE rank <= {TOP_K}
"""


def v_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (the scale path — bucket equi-join instead of cross join)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return OS.lsh_topk(e, q, dim=DIM, k=TOP_K, planes=4)


V_LSH_TOPK_SQL = f"""
WITH cb AS (
  SELECT vec_id, embedding, {OQ.sql_hyperplane_bucket('embedding', DIM, 4)} AS bucket
  FROM embeddings
), qb AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket
  FROM cb WHERE vec_id < {N_QUERIES}
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT qb.query_id, cb.vec_id,
         {OQ.sql_cosine('cb.embedding', 'qb.qe', DIM)} AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY qb.query_id
           ORDER BY {OQ.sql_cosine('cb.embedding', 'qb.qe', DIM)} DESC,
                    cb.vec_id ASC) AS rank
  FROM cb JOIN qb ON cb.bucket = qb.bucket
) WHERE rank <= {TOP_K}
"""


def v_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over embeddings via pyspark.ml (replaces the reference's
    hand-rolled distributed Lloyd's iteration wholesale — SURVEY §2.10).

    The iteration itself is not SQL-expressible, so the oracle pins the
    invariants any correct Lloyd's run guarantees (the ``m_clip_embedding``
    invariant-oracle pattern): every row is assigned to exactly one of at
    most k clusters (sizes sum to n), and every centroid coordinate lies
    inside the global per-dimension [min, max] envelope (a centroid is a
    mean of member points, so this must hold). The k=10/seed=42 cluster
    *sizes* remain covered by the recall/shape assertions in pytest."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    K = 10
    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")  # contentless vectors can't train
    )
    vec = e.select(
        "vec_id", array_to_vector(VX.to_double_array("embedding")).alias("features")
    )
    model = KMeans(k=K, seed=42, maxIter=20).fit(vec)
    pred = model.transform(vec)

    # Per-dimension data envelope (one tiny 2*DIM-column row) vs centroids
    # (k x DIM, driver-side metadata — not a data-path collect).
    env = e.select(
        *[F.min(F.col("embedding")[i]).alias(f"mn{i}") for i in range(DIM)],
        *[F.max(F.col("embedding")[i]).alias(f"mx{i}") for i in range(DIM)],
    ).first()
    eps = 1e-6  # float32 storage vs double centroid arithmetic
    centroids_in_range = all(
        env[f"mn{i}"] - eps <= float(c[i]) <= env[f"mx{i}"] + eps
        for c in model.clusterCenters()
        for i in range(DIM)
    )

    n_total = e.count()
    sizes = pred.groupBy("prediction").agg(F.count(F.lit(1)).alias("n"))
    agg = sizes.agg(
        F.count(F.lit(1)).alias("k_used"), F.sum("n").alias("n_assigned")
    )
    return agg.select(
        F.col("n_assigned").cast("long").alias("n_rows"),
        ((F.col("k_used") >= 1) & (F.col("k_used") <= K)).alias("k_ok"),
        (F.col("n_assigned") == F.lit(n_total)).alias("sizes_sum_ok"),
        F.lit(bool(centroids_in_range)).alias("centroids_in_range"),
    )


V_KMEANS_SQL = """
SELECT COUNT(*) AS n_rows, TRUE AS k_ok, TRUE AS sizes_sum_ok,
       TRUE AS centroids_in_range
FROM embeddings
WHERE embedding IS NOT NULL
  AND len(list_filter(embedding, x -> x IS NULL)) = 0
"""
# the invariant pin mirrors the engine's is_valid_vector ingestion filter


def v_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with an exhaustive probe (``n_probe == n_clusters``):
    every cluster is scanned, so the result is exactly brute-force cosine
    top-k and the oracle is the same SQL as ``v_cosine_topk`` — this
    oracle-checks the whole IVF machinery (assignment, probe ranking,
    cluster equi-join, scoring). The approximate path (``n_probe=3``)
    keeps its recall-vs-exact assertion in ``tests/test_advanced.py``."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return OS.ivf_topk(e, q, k=TOP_K, n_clusters=8, n_probe=8)


QUERIES = {
    "v_embedding_norms": v_embedding_norms,
    "v_ivf_topk": v_ivf_topk,
    "v_mlp_score": v_mlp_score,
    "v_lsh_buckets": v_lsh_buckets,
    "v_cosine_dedup": v_cosine_dedup,
    "v_cosine_topk": v_cosine_topk,
    "v_lsh_topk": v_lsh_topk,
    "v_kmeans_clusters": v_kmeans_clusters,
}

ORACLE = {
    "v_embedding_norms": V_NORMS_SQL,
    "v_ivf_topk": V_TOPK_SQL,
    "v_mlp_score": V_MLP_SQL,
    "v_lsh_buckets": V_BUCKETS_SQL,
    "v_cosine_dedup": V_COSINE_DEDUP_SQL,
    "v_cosine_topk": V_TOPK_SQL,
    "v_lsh_topk": V_LSH_TOPK_SQL,
    # v_kmeans_clusters is iterative; the oracle checks run invariants
    # (assignment totality + centroid envelope), not cluster contents.
    "v_kmeans_clusters": V_KMEANS_SQL,
}


# ---------------------------------------------------------------------------
# int8 embedding quantization (4x storage cut for the ANN index tier)
# ---------------------------------------------------------------------------


def v_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) — the standard storage layout for a
    billion-vector ANN index (4x smaller than float32, dot products stay
    SIMD-friendly). Pure codegen'd array expressions, zero UDF/shuffle;
    the int codes compare exactly cross-engine (joined to CSV because the
    driver hashes scalar columns), the reconstruction error pins the
    dequantization math."""
    e = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    base = (
        e.withColumn("scale", mx.cast("double") / F.lit(127.0))
        .filter(F.col("scale") > 0)
        # materialize the codes once and derive the error from them (the
        # error of the *stored* codes is the semantically right quantity).
        # Both lambdas pair against array_repeat(scale) instead of
        # capturing F.col("scale"): the capture re-evaluates the inlined
        # array_max definition per ELEMENT (r10 HOF-capture fix, see
        # functions.vectors.div_elements) — values bit-identical.
        .withColumn(
            "q",
            F.zip_with(
                "embedding",
                F.array_repeat(F.col("scale"), F.size("embedding")),
                lambda x, s: F.round(x / s).cast("int"),
            ),
        )
        # err must be materialized BEFORE the output select: that select
        # re-aliases round(scale, 6) under the same name "scale", and an
        # unresolved F.col("scale") inside a sibling lambda would bind to
        # the ROUNDED value (name shadowing), skewing the error by up to
        # 5e-7 per code unit.
        .withColumn(
            "_deq",
            F.zip_with(
                "q",
                F.array_repeat(F.col("scale"), F.size("q")),
                lambda qi, s: qi.cast("double") * s,
            ),
        )
        .withColumn(
            "_err",
            F.array_max(
                F.zip_with(
                    "embedding",
                    "_deq",
                    lambda x, d: F.abs(x - d),
                )
            ),
        )
    )
    return base.select(
        "vec_id",
        "label",
        F.array_join(
            F.transform("q", lambda v: v.cast("string")), ","
        ).alias("q_csv"),
        F.round("scale", 6).cast("double").alias("scale"),
        F.round("_err", 6).cast("double").alias("max_err"),
    )


V_QUANT_SQL = """
WITH s AS (
  SELECT vec_id, label, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0
           AS scale
  FROM embeddings
)
SELECT vec_id, label,
       array_to_string(
         list_transform(embedding, x -> CAST(round(x / scale) AS INT)), ','
       ) AS q_csv,
       CAST(ROUND(scale, 6) AS DOUBLE) AS scale,
       CAST(ROUND(list_max(list_transform(embedding,
            x -> abs(x - round(x / scale) * scale))), 6) AS DOUBLE) AS max_err
FROM s WHERE scale > 0
"""

QUERIES["v_quantize_int8"] = v_quantize_int8
ORACLE["v_quantize_int8"] = V_QUANT_SQL


def v_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): per-subspace KMeans
    codebooks → m-code encoding → asymmetric-distance top-k from a
    broadcast lookup table (`operators/similarity.py::pq_train_encode /
    pq_adc_topk`). The compression tier of the IVF-PQ layout every
    billion-vector deployment runs — codes are 64x smaller than the
    float vectors they score.

    KMeans codebooks are iterative and not SQL-expressible, so the
    oracle pins run invariants (the ``v_kmeans_clusters`` pattern):
    result cardinality (k rows per query), non-negative distances, and
    recall@k ≥ 0.2 against the EXACT squared-L2 top-k computed
    in-engine (m=16/k=16 measures 0.40-0.53 across fixtures — uniform synthetic
    vectors are PQ's worst case, so the 2x margin holds across fixture
    regenerations; the pytest pins a tighter bound plus determinism)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes, books = OS.pq_train_encode(e, dim=DIM, m=16, k=16)
    pq = OS.pq_adc_topk(codes, books, q, dim=DIM, k=TOP_K)
    exact = OS.l2_topk(e, q, k=TOP_K)
    hits = pq.join(exact.select("query_id", "vec_id"), ["query_id", "vec_id"])
    agg = pq.agg(
        F.count(F.lit(1)).alias("n_results"),
        F.min("adc_dist").alias("_min_d"),
    ).crossJoin(hits.agg(F.count(F.lit(1)).alias("_n_hit")))
    return agg.select(
        F.col("n_results").cast("long").alias("n_results"),
        (F.col("_min_d") >= 0).alias("dists_nonneg"),
        (
            F.col("_n_hit").cast("double")
            >= F.lit(0.2) * F.lit(int(N_QUERIES * TOP_K))
        ).alias("recall_ok"),
    )


V_PQ_SQL = f"""
SELECT CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_results,
       TRUE AS dists_nonneg, TRUE AS recall_ok
"""

QUERIES["v_pq_adc_topk"] = v_pq_adc_topk
ORACLE["v_pq_adc_topk"] = V_PQ_SQL


# ---------------------------------------------------------------------------
# MaxSim late-interaction scoring (ColBERT-style multi-vector retrieval)
# ---------------------------------------------------------------------------

MAXSIM_GROUP = 4  # token-vectors per pseudo-document / per query


def v_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim late interaction: documents are BAGS of token
    vectors (pseudo-docs of 4 consecutive embeddings here), the query is
    a 4-vector bag, and score(doc) = Σ_q max_d cosine(q, d) — the
    multi-vector retrieval model single-vector top-k can't express.

    Scale shape: the query bag broadcasts (queries are always tiny);
    per-(doc, query-vector) maxes fold map-side in ONE aggregate, and the
    bag-sum is a fixed-width conditional pivot over that aggregate — an
    explicit left-fold of 4 doubles, never an order-nondeterministic
    float SUM, so the score is bit-identical cross-engine. The final
    top-k window runs over doc-count rows (one per pseudo-doc), the same
    already-reduced shape as ``v_cosine_topk``; an IVF-style coarse
    filter slots in front unchanged when the corpus outgrows brute force.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < MAXSIM_GROUP).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )
    c = e.select(
        F.floor(F.col("vec_id") / MAXSIM_GROUP).cast("bigint").alias("gid"),
        "embedding",
    )
    cos = VX.guarded_div(
        VX.dot(F.col("embedding"), F.col("qe")),
        VX.l2_norm("embedding") * VX.l2_norm("qe"),
    )
    # ONE conditional-pivot aggregate (r10, guide §2.4): the former
    # per-(gid, qid) max + second pivot aggregate was two exchanges for
    # what is algebraically a single grouped max — max(case qid=i) over
    # (gid) partitions the same values identically, and the partial
    # aggregation still folds map-side. One exchange, one stage fewer;
    # bit-identical scores.
    piv = (
        c.crossJoin(q)
        # cosine projected ONCE per (doc, qvec) row — inlining `cos` into
        # each conditional max would re-evaluate the 64-term fold 4× per
        # row (no CSE across aggregate buffers)
        .select("gid", "qid", cos.alias("_cos"))
        .groupBy("gid")
        .agg(
            *[
                F.max(F.when(F.col("qid") == i, F.col("_cos"))).alias(f"m{i}")
                for i in range(MAXSIM_GROUP)
            ]
        )
    )
    score = F.col("m0")
    for i in range(1, MAXSIM_GROUP):
        score = score + F.col(f"m{i}")
    w = Window.orderBy(F.col("score").desc(), F.col("gid").asc())
    return (
        piv.select("gid", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("rank", "gid", "score")
    )


V_MAXSIM_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {MAXSIM_GROUP}
), c AS (
  SELECT CAST(FLOOR(vec_id / {MAXSIM_GROUP}) AS BIGINT) AS gid, embedding
  FROM embeddings
), per_qvec AS (
  SELECT gid, qid, MAX({OQ.sql_cosine('c.embedding', 'q.qe', DIM)}) AS m
  FROM c CROSS JOIN q GROUP BY gid, qid
), piv AS (
  SELECT gid,
         {", ".join(f"MAX(CASE WHEN qid = {i} THEN m END) AS m{i}" for i in range(MAXSIM_GROUP))}
  FROM per_qvec GROUP BY gid
)
SELECT rank, gid, score FROM (
  SELECT gid, ((({'m0 + m1'}) + m2) + m3) AS score,
         ROW_NUMBER() OVER (ORDER BY ((({'m0 + m1'}) + m2) + m3) DESC, gid ASC) AS rank
  FROM piv
) WHERE rank <= {TOP_K}
"""

QUERIES["v_maxsim_topk"] = v_maxsim_topk
ORACLE["v_maxsim_topk"] = V_MAXSIM_SQL


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive training-data prep)
# ---------------------------------------------------------------------------


def v_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the rows a retrieval trainer wants as in-batch negatives
    (the highest-scoring wrong answers).

    Scale shape: identical to ``cosine_topk`` (broadcast query set, one
    corpus scan, codegen'd dot product, per-query top-k window over a
    label-filtered stream) — the label inequality is pushed below the
    window so ranked rows never include positives."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_q_emb"),
            F.col("label").alias("_q_label"),
            VX.l2_norm("embedding").alias("_q_norm"),
        )
    )
    scored = (
        e.withColumn("_c_norm", VX.l2_norm("embedding"))
        .crossJoin(q)
        .filter(F.col("label") != F.col("_q_label"))
        .select(
            "query_id",
            "vec_id",
            VX.guarded_div(
                VX.dot(F.col("embedding"), F.col("_q_emb")),
                F.col("_c_norm") * F.col("_q_norm"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "rank")
    )


V_HARDNEG_SQL = f"""
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings c
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
  WHERE c.label <> q.label
) WHERE rank <= {TOP_K}
"""

QUERIES["v_hard_negatives"] = v_hard_negatives
ORACLE["v_hard_negatives"] = V_HARDNEG_SQL


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension agreement (embedding truncation audit)
# ---------------------------------------------------------------------------

MATRYOSHKA_DIM = 16
MATRYOSHKA_K = 10


def v_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: how well does top-k retrieval
    under the TRUNCATED prefix embedding (first 16 of 64 dims — the
    MRL deployment trick: score cheap at 1/4 the FLOPs/bytes, rerank
    full-dim) agree with full-dim retrieval? Output per query: the size
    of the intersection of the two top-10 id sets.

    Scale shape: both rankings come from ONE corpus scan (two codegen'd
    dot products per row), two windows over the same broadcast-query
    stream, and a k-row-per-query semi-intersection — no second pass
    over the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_q_emb"),
            VX.l2_norm("embedding").alias("_q_norm"),
            F.slice("embedding", 1, MATRYOSHKA_DIM).alias("_q_pre"),
            VX.l2_norm(F.slice("embedding", 1, MATRYOSHKA_DIM)).alias("_q_pren"),
        )
    )
    scored = (
        e.withColumn("_pre", F.slice("embedding", 1, MATRYOSHKA_DIM))
        .withColumn("_c_norm", VX.l2_norm("embedding"))
        .withColumn("_c_pren", VX.l2_norm(F.col("_pre")))
        .crossJoin(q)
        .select(
            "query_id",
            "vec_id",
            VX.guarded_div(
                VX.dot(F.col("embedding"), F.col("_q_emb")),
                F.col("_c_norm") * F.col("_q_norm"),
            ).alias("_full"),
            VX.guarded_div(
                VX.dot(F.col("_pre"), F.col("_q_pre")),
                F.col("_c_pren") * F.col("_q_pren"),
            ).alias("_prefix"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("_full").desc(), F.col("vec_id").asc())
    wp = Window.partitionBy("query_id").orderBy(F.col("_prefix").desc(), F.col("vec_id").asc())
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.row_number().over(wf).alias("_rf"),
        F.row_number().over(wp).alias("_rp"),
    ).filter((F.col("_rf") <= MATRYOSHKA_K) | (F.col("_rp") <= MATRYOSHKA_K))
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(
                F.when((F.col("_rf") <= MATRYOSHKA_K) & (F.col("_rp") <= MATRYOSHKA_K), 1).otherwise(0)
            ).cast("bigint").alias("n_overlap"),
            F.lit(MATRYOSHKA_K).cast("int").alias("k"),
        )
    )


V_MATRYOSHKA_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         embedding[1:{MATRYOSHKA_DIM}] AS qp
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id,
         {OQ.sql_cosine('c.embedding', 'q.qe', DIM)} AS f,
         {OQ.sql_cosine('c.embedding[1:%d]' % MATRYOSHKA_DIM, 'q.qp', MATRYOSHKA_DIM)} AS p
  FROM embeddings c CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY f DESC, vec_id ASC) AS rf,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY p DESC, vec_id ASC) AS rp
  FROM scored
)
SELECT query_id,
       CAST(SUM(CASE WHEN rf <= {MATRYOSHKA_K} AND rp <= {MATRYOSHKA_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CAST({MATRYOSHKA_K} AS INTEGER) AS k
FROM ranked
WHERE rf <= {MATRYOSHKA_K} OR rp <= {MATRYOSHKA_K}
GROUP BY query_id
"""

QUERIES["v_matryoshka_overlap"] = v_matryoshka_overlap
ORACLE["v_matryoshka_overlap"] = V_MATRYOSHKA_SQL


# ---------------------------------------------------------------------------
# ANN recall audit (approximate vs exact retrieval agreement)
# ---------------------------------------------------------------------------


def v_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed approximate retrieval against exact
    brute-force cosine — THE metric an ANN deployment is judged by
    (bucket recall trades against the candidate-set shrink that makes
    LSH scan-free at 100 TB). Output per query: hits in the exact
    top-k, k, and the k-row-join recall numerator — exact cross-engine
    because both rankings are deterministic (tie-break by vec_id).

    Scale shape: both sides reuse the existing top-k plans (broadcast
    query set, one corpus scan each); the final join touches 2·k·|Q|
    rows — negligible at any scale."""
    exact = OS.cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding"),
        k=TOP_K,
    ).select("query_id", "vec_id")
    approx = v_lsh_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("_av")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.vec_id == approx._av),
        "left_semi",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        .select("query_id", "n_hits", F.lit(TOP_K).cast("int").alias("k"))
    )


V_RECALL_SQL = f"""
WITH exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rank
    FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
  ) WHERE rank <= {TOP_K}
), cb AS (
  SELECT vec_id, embedding, {OQ.sql_hyperplane_bucket('embedding', DIM, 4)} AS bucket
  FROM embeddings
), qb AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket FROM cb WHERE vec_id < {N_QUERIES}
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT qb.query_id, cb.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY qb.query_id
             ORDER BY {OQ.sql_cosine('cb.embedding', 'qb.qe', DIM)} DESC,
                      cb.vec_id ASC) AS rank
    FROM cb JOIN qb ON cb.bucket = qb.bucket
  ) WHERE rank <= {TOP_K}
)
SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits, CAST({TOP_K} AS INTEGER) AS k
FROM exact e
WHERE EXISTS (SELECT 1 FROM approx a
              WHERE a.query_id = e.query_id AND a.vec_id = e.vec_id)
GROUP BY e.query_id
"""

QUERIES["v_recall_at_k"] = v_recall_at_k
ORACLE["v_recall_at_k"] = V_RECALL_SQL


# ---------------------------------------------------------------------------
# Two-stage ANN: PQ-ADC candidate generation → exact re-rank
# ---------------------------------------------------------------------------

_RERANK_CAND = 10 * TOP_K  # candidate pool per query for the exact stage


def v_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN retrieval path (IVF-PQ deployments, Jégou et al.
    2011 §V): a cheap PQ asymmetric-distance pass over the compressed
    codes selects ``10·k`` candidates per query, then ONLY those rows'
    float vectors are fetched and re-ranked with the exact metric. The
    corpus-wide scan touches 16 uint8 codes per vector; the float
    embeddings are read for candidate rows alone (candidate-keyed
    semi-join — at 100 TB that is the difference between scanning 64-dim
    float arrays for 10¹⁰ rows and for 10·k·|queries| rows).

    The re-rank theorem makes this oracle-gateable: the exact top-k
    within a candidate SUPERSET of the ADC top-k always has recall ≥ the
    ADC top-k itself (any true top-k member among the candidates wins the
    exact re-rank; ties broken by vec_id both sides). Emitted invariants:
    result cardinality, non-negative distances, recall(rerank) ≥
    recall(ADC@k), recall(rerank) ≥ the 0.2 floor ``v_pq_adc_topk`` pins
    (measured 0.67-1.0 across fixtures at m=16)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # Coarser codebooks than v_pq_adc_topk (m=8, 5 KMeans sweeps): the
    # exact re-rank stage absorbs quantization error, so candidate
    # generation only has to land true neighbors in the 10.k pool — half
    # the training jobs for the same gated recall.
    codes, books = OS.pq_train_encode(e, dim=DIM, m=8, k=16, max_iter=5)
    cand = OS.pq_adc_topk(codes, books, q, dim=DIM, k=_RERANK_CAND)
    adc5 = cand.filter(F.col("rank") <= TOP_K)

    qb = F.broadcast(q.select("query_id", F.col("embedding").alias("_qe")))
    cand_emb = cand.select("query_id", "vec_id").join(e, "vec_id")
    l2 = F.aggregate(
        F.zip_with(
            VX.to_double_array("embedding"),
            VX.to_double_array("_qe"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("vec_id").asc()
    )
    rerank = (
        cand_emb.join(qb, "query_id")
        .select("query_id", "vec_id", l2.alias("l2_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
    exact = OS.l2_topk(e, q, k=TOP_K).select("query_id", "vec_id")
    hits_rr = rerank.join(exact, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("_h_rr")
    )
    hits_adc = adc5.join(exact, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("_h_adc")
    )
    agg = rerank.agg(
        F.count(F.lit(1)).alias("n_results"),
        F.min("l2_dist").alias("_min_d"),
    )
    return (
        agg.crossJoin(hits_rr)
        .crossJoin(hits_adc)
        .select(
            F.col("n_results").cast("long").alias("n_results"),
            (F.col("_min_d") >= 0).alias("dists_nonneg"),
            (F.col("_h_rr") >= F.col("_h_adc")).alias("rerank_ge_adc"),
            (
                F.col("_h_rr").cast("double")
                >= F.lit(0.2) * F.lit(int(N_QUERIES * TOP_K))
            ).alias("recall_ok"),
        )
    )


V_PQ_RERANK_SQL = f"""
SELECT CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_results,
       TRUE AS dists_nonneg, TRUE AS rerank_ge_adc, TRUE AS recall_ok
"""

QUERIES["v_pq_rerank_topk"] = v_pq_rerank_topk
ORACLE["v_pq_rerank_topk"] = V_PQ_RERANK_SQL


def v_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subset selection (the SemDeDup / DataComp
    diversity-sampling shape, Abbas et al. 2023): k-means the embedding
    space, then take at most CAP deterministic representatives per
    cluster — hash-ordered, so the selection is reproducible and
    cluster-size-independent. This is how a 100-TB curation run keeps
    topical diversity while cutting volume: dense clusters (near-dup
    mass) are capped, sparse clusters survive intact.

    Scale shape: KMeans assignment is one ml pipeline; per-cluster
    capping is a rank-over-hash window on the cluster key (many keys,
    no global sort); nothing is collected. Iterative clustering is not
    SQL-expressible, so the oracle pins the selection invariants (the
    v_kmeans_clusters pattern): per-cluster cap respected, every
    nonempty cluster represented, selection deterministic, total =
    sum(min(cap, cluster_size))."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    K, CAP = 8, 20
    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")  # contentless vectors can't train
    )
    vec = e.select(
        "vec_id", array_to_vector(VX.to_double_array("embedding")).alias("features")
    )
    pred = KMeans(k=K, seed=42, maxIter=20).fit(vec).transform(vec)
    w = Window.partitionBy("prediction").orderBy(
        F.xxhash64(F.col("vec_id")), F.col("vec_id")
    )
    picked = pred.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= CAP)
    sizes = pred.groupBy("prediction").agg(F.count(F.lit(1)).alias("n"))
    psize = picked.groupBy("prediction").agg(F.count(F.lit(1)).alias("np"))
    j = sizes.join(psize, "prediction", "left")
    return j.agg(
        F.sum("np").cast("long").alias("n_selected_check"),
    ).crossJoin(
        j.agg(
            F.min((F.coalesce(F.col("np"), F.lit(0)) >= F.least(F.col("n"), F.lit(CAP))).cast("int")).alias("_cov"),
            F.min((F.coalesce(F.col("np"), F.lit(0)) <= F.lit(CAP)).cast("int")).alias("_cap"),
            F.sum(F.least(F.col("n"), F.lit(CAP))).alias("_expected"),
        ).select(
            (F.col("_cov") == 1).alias("coverage_ok"),
            (F.col("_cap") == 1).alias("cap_ok"),
            F.col("_expected").cast("long").alias("n_expected"),
        )
    ).select(
        # cluster sizes (and so the exact selected count) depend on the
        # non-SQL-expressible clustering; pin the bounds + exactness
        # invariants instead (v_kmeans_clusters pattern)
        (
            (F.col("n_selected_check") >= 1)
            & (F.col("n_selected_check") <= F.lit(K * CAP))
        ).alias("n_in_bounds"),
        (F.col("n_selected_check") == F.col("n_expected")).alias("count_ok"),
        "coverage_ok",
        "cap_ok",
    )


V_CLUSTER_SAMPLE_SQL = """
SELECT TRUE AS n_in_bounds, TRUE AS count_ok, TRUE AS coverage_ok, TRUE AS cap_ok
"""

QUERIES["v_cluster_balanced_sample"] = v_cluster_balanced_sample
ORACLE["v_cluster_balanced_sample"] = V_CLUSTER_SAMPLE_SQL


def v_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — top-k under a metadata predicate (the
    retrieval pattern every RAG/vector-DB workload runs: "nearest docs
    WHERE lang = 'en'"). The predicate joins the documents table on the
    id BEFORE scoring, so the cosine never evaluates on filtered-out
    rows and the predicate itself pushes into the documents parquet scan
    — pre-filtering, not post-filtering (post-filtering returns < k
    results when the filter is selective; this never does while k
    matches survive).

    Scale shape: documents side reduces to an id list (semi-join); the
    corpus scan + codegen'd dot product and the broadcast query set are
    exactly the v_cosine_topk plan on the reduced corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    keep = d.filter(F.col("lang") == "en").select(F.col("doc_id").alias("vec_id"))
    corpus = e.join(keep, "vec_id", "left_semi")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return OS.cosine_topk(corpus, q, k=TOP_K)


V_FILTERED_ANN_SQL = f"""
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id,
         {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                    c.vec_id ASC) AS rank
  FROM (SELECT * FROM embeddings
        WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')) c
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
) WHERE rank <= {TOP_K}
"""

QUERIES["v_filtered_ann_topk"] = v_filtered_ann_topk
ORACLE["v_filtered_ann_topk"] = V_FILTERED_ANN_SQL


# ---------------------------------------------------------------------------
# Binary quantization (1-bit sign) + hamming candidate scan + exact rerank
# ---------------------------------------------------------------------------

_BQ_CAND = 50  # hamming candidates per query fed to the exact rerank


def _sign_word(col: str, off: int) -> F.Column:
    """Pack dims [off, off+32) of an array<float> into a 32-bit sign
    bitmap held in a long: bit i set iff element > 0. Bits are distinct
    powers of two, so the OR is written as a SUM — the same expression
    shape the oracle generates, and fully codegen'd (no UDF)."""
    word = F.lit(0).cast("long")
    for i in range(32):
        word = word + F.when(
            F.element_at(F.col(col), off + i + 1) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0)).cast("long")
    return word


def _sql_sign_word(col: str, off: int) -> str:
    terms = " + ".join(
        f"CASE WHEN {col}[{off + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


def v_binary_quantize_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (the RaBitQ/BQ tier below int8 and PQ): 64-dim
    float vectors compress to TWO 32-bit sign bitmaps (64 bits total —
    a 32× storage cut vs float32); the corpus scan ranks by hamming
    distance (xor + bit_count, whole-stage codegen), the top ``_BQ_CAND``
    candidates per query are exact-cosine re-ranked, and the final top-k
    is emitted with both distances.

    Scale shape: the shuffle/window tier carries 2 longs per row (in a
    production index the sign words are a STORED column and the scan
    itself reads 16 bytes/vector; here they derive inline from the float
    column, so the scan reads floats once but drops them before the
    exchange), and the exact cosine evaluates for candidate rows ONLY
    via the candidate-keyed join back (the ``v_pq_rerank_topk``
    contract — plan-asserted in tests/test_scale.py). Per-query top-C
    rewrites to a partial WindowGroupLimit below the shuffle; ties break
    on vec_id both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    # the corpus-wide pass reads ONLY the two sign words per row — the
    # float embedding column must not appear below the candidate filter
    # (projecting it there would make the scan read 256 bytes/row and
    # compute a 64-dim cosine for every pair; see v_pq_rerank_topk)
    coded = e.select(
        "vec_id",
        _sign_word("embedding", 0).alias("w0"),
        _sign_word("embedding", 32).alias("w1"),
    )
    q = coded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
    )
    w_q = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    cands = (
        coded.crossJoin(F.broadcast(q))  # query set: bounded by contract
        .select("query_id", "vec_id", ham.cast("int").alias("hamming"))
        .withColumn("h_rank", F.row_number().over(w_q))
        .filter(F.col("h_rank") <= _BQ_CAND)
    )
    # exact metric for candidate rows ONLY: candidate-keyed join back to
    # the float vectors (|queries|·C rows), then the query-side vector
    # joins in from the bounded query set
    q_emb = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rescored = (
        cands.join(e.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "vec_id",
            "hamming",
            VX.cosine("embedding", "q_emb").alias("cosine"),
        )
    )
    w_c = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w_c))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "hamming", "cosine", "rank")
    )


V_BQ_RERANK_SQL = f"""
WITH coded AS (
  SELECT vec_id, embedding,
         {_sql_sign_word('embedding', 0)} AS w0,
         {_sql_sign_word('embedding', 32)} AS w1
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, w0 AS qw0, w1 AS qw1
  FROM coded WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, c.vec_id,
         CAST(bit_count(xor(c.w0, q.qw0)) + bit_count(xor(c.w1, q.qw1)) AS INTEGER) AS hamming,
         {OQ.sql_cosine('c.embedding', 'q.q_emb', DIM)} AS cosine
  FROM coded c CROSS JOIN q
), cands AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS h_rank
  FROM scored
)
SELECT query_id, vec_id, hamming, cosine, rank FROM (
  SELECT query_id, vec_id, hamming, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM cands WHERE h_rank <= {_BQ_CAND}
) WHERE rank <= {TOP_K}
"""

QUERIES["v_binary_quantize_rerank"] = v_binary_quantize_rerank
ORACLE["v_binary_quantize_rerank"] = V_BQ_RERANK_SQL


# ---------------------------------------------------------------------------
# Embedding drift monitor (reference vs current snapshot)
# ---------------------------------------------------------------------------


def v_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift between a reference snapshot (even
    vec_id) and the current one (odd vec_id) — the model/data-drift
    monitor a production embedding pipeline runs per ingest batch: when a
    label's centroid swings, the upstream encoder or source mix changed.

    Deterministic-aggregation discipline: raw float element sums are
    merge-order-dependent, so elements are first quantized to exact
    fixed-point millis codes (``round(x*1000)`` — the ``v_quantize_int8``
    rule at fixed scale), and the per-(label, dim) sums are exact
    integers. Cosine is scale-invariant, so the centroid cosine equals
    the cosine of the raw SUM vectors — no division ever enters the
    accumulation, and the final float expression tree is identical in
    both engines (bit-equal, no tolerance).

    Scale shape: one posexplode (64× fanout of the embedding stream, the
    standard dimension-pivot) into a (label, dim)-keyed exact aggregate,
    then a |labels|-bounded rollup; decimal(38,0) dot/norm accumulators
    hold |Σcode|² sums at any SF."""
    e = load_table(spark, sf_dir, "embeddings")
    codes = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "label",
        "half",
        "dim",
        F.round(F.col("x").cast("double") * 1000).cast("long").alias("code"),
    )
    per_dim = codes.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("code")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("code")).otherwise(0)).alias("sb"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
    )
    # cast BEFORE the multiply: |Σcode| can exceed 3e9 at billions of rows
    # per label, so an int64 product would silently wrap in Spark (and
    # error in DuckDB) — decimal(19,0)×decimal(19,0) promotes to a wide
    # decimal product instead
    dec19 = "decimal(19,0)"
    sa, sb = F.col("sa").cast(dec19), F.col("sb").cast(dec19)
    dec = "decimal(38,0)"
    agg = per_dim.groupBy("label").agg(
        F.sum((sa * sb).cast(dec)).alias("dot"),
        F.sum((sa * sa).cast(dec)).alias("n2a"),
        F.sum((sb * sb).cast(dec)).alias("n2b"),
        F.max("na").cast("long").alias("n_ref"),
        F.max("nb").cast("long").alias("n_cur"),
    )
    cos = VX.guarded_div(
        F.col("dot").cast("double"),
        F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double")),
    )
    return agg.select(
        "label",
        "n_ref",
        "n_cur",
        cos.alias("centroid_cosine"),
        (cos < F.lit(0.99)).alias("drift_alarm"),
    ).orderBy("label")


V_DRIFT_SQL = """
WITH codes AS (
  SELECT label, vec_id % 2 AS half, i AS dim,
         CAST(round(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000) AS BIGINT) AS code
  FROM embeddings, unnest(range(1, 65)) AS t(i)
  WHERE embedding IS NOT NULL
  -- posexplode of a NULL array emits ZERO rows; the index cross-join
  -- would fabricate 64 NULL-code rows per NULL embedding and inflate
  -- na/nb — NULL embeddings contribute nothing by spec (§24)
), per_dim AS (
  SELECT label, dim,
         SUM(CASE WHEN half = 0 THEN code ELSE 0 END) AS sa,
         SUM(CASE WHEN half = 1 THEN code ELSE 0 END) AS sb,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS nb
  FROM codes GROUP BY label, dim
), agg AS (
  SELECT label,
         SUM(CAST(CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS dot,
         SUM(CAST(CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS n2a,
         SUM(CAST(CAST(sb AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS n2b,
         CAST(MAX(na) AS BIGINT) AS n_ref,
         CAST(MAX(nb) AS BIGINT) AS n_cur
  FROM per_dim GROUP BY label
)
SELECT label, n_ref, n_cur,
       (CASE WHEN (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) <> 0
             THEN CAST(dot AS DOUBLE)
                  / (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) END)
         AS centroid_cosine,
       ((CASE WHEN (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) <> 0
              THEN CAST(dot AS DOUBLE)
                   / (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) END)
         < 0.99) AS drift_alarm
FROM agg ORDER BY label
"""

QUERIES["v_embedding_drift"] = v_embedding_drift
ORACLE["v_embedding_drift"] = V_DRIFT_SQL


# ---------------------------------------------------------------------------
# Trained embedding classifier (FineWeb-Edu / DataComp filtering-model shape)
# ---------------------------------------------------------------------------


def v_trained_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-classifier TRAINING loop every modern corpus pipeline
    runs (FineWeb-Edu's educational-value model, DataComp's fasttext
    filters, the reference's offline MLP-head trainers,
    ``models/image_aigc_detector/trainer.py``): fit a logistic-regression
    head on a labeled seed split of the embedding space, score the
    held-out split, and gate on held-out accuracy before the model is
    allowed to filter the corpus.

    Teacher labels are the deterministic linear rule ``v_mlp_score``
    exposes (mlp_score > 0.5) — linearly separable, so a correct
    distributed LBFGS must clear a 90% held-out accuracy floor by a wide
    margin; the floor (not exact weights) is the pinned invariant, the
    ``v_kmeans_clusters`` oracle pattern for iterative ML.

    Scale shape: training is MLlib's treeAggregate (map-side gradient
    combine, driver holds only the 64-dim coefficient vector); inference
    is a broadcast-coefficient dot per row (map-only, no shuffle) — at
    100 TB the scoring pass is embarrassingly parallel and the model is
    bytes, the exact production layout for classifier-based filtering."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")  # contentless vectors can't train/score
    )
    lab = e.select(
        "vec_id",
        array_to_vector(VX.to_double_array("embedding")).alias("features"),
        (VX.mlp_score("embedding", MLP_WEIGHTS, MLP_BIAS) > 0.5)
        .cast("double")
        .alias("label"),
    )
    train = lab.filter(F.col("vec_id") % 2 == 0)
    test = lab.filter(F.col("vec_id") % 2 == 1)
    model = LogisticRegression(maxIter=25, regParam=0.01).fit(train)
    pred = model.transform(test)
    agg = pred.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col("prediction") == F.col("label")).cast("long")).alias("n_correct"),
        F.min("prediction").alias("pmin"),
        F.max("prediction").alias("pmax"),
    )
    return agg.select(
        F.col("n_test").cast("long").alias("n_test"),
        (F.col("n_correct") * 10000 >= F.col("n_test") * 9000).alias("acc_floor_ok"),
        ((F.col("pmin") >= 0) & (F.col("pmax") <= 1)).alias("pred_range_ok"),
    )


V_TRAINED_CLF_SQL = """
SELECT CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       TRUE AS acc_floor_ok, TRUE AS pred_range_ok
FROM embeddings
WHERE embedding IS NOT NULL
  AND len(list_filter(embedding, x -> x IS NULL)) = 0
"""

QUERIES["v_trained_classifier"] = v_trained_classifier
# iterative ML: the oracle pins held-out-accuracy/range invariants plus the
# exact test-split cardinality, not the learned weights (v_kmeans pattern).
ORACLE["v_trained_classifier"] = V_TRAINED_CLF_SQL


# ---------------------------------------------------------------------------
# Classifier calibration curve (reliability diagram)
# ---------------------------------------------------------------------------


def v_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the linear scoring head (``v_mlp_score``):
    rank rows by score into deciles and compare each decile's mean score
    against its empirical positive rate — the calibration audit run
    before a classifier threshold is allowed to gate a corpus (a model
    can rank well and still be mis-calibrated; thresholds assume
    calibration).

    Determinism discipline: scores are quantized to exact micros codes
    (``round(score*1e6)``) before any cross-row aggregation, so decile
    mean = integer sum DIV count (bit-identical), and the "positive"
    ground truth is the deterministic teacher rule at a DIFFERENT
    threshold (0.6) than the score bucketing — deciles are formed by
    row_number over (code, vec_id), no ntile float edges.

    Scale shape: the global rank uses the range-repartition +
    broadcast-offset pattern (``t_tokenize_ids`` / ``x_acctbal_deciles``
    — partition ids are globally ordered by the sort key, ranks are
    local, tiny per-partition offsets are added back), NOT an
    unpartitioned window (which moves the whole corpus to one task);
    the rollup is 10 rows."""
    e = load_table(spark, sf_dir, "embeddings")
    score = VX.mlp_score("embedding", MLP_WEIGHTS, MLP_BIAS)
    coded = e.select(
        "vec_id",
        F.round(score.cast("double") * 1_000_000).cast("long").alias("code"),
        (VX.mlp_score("embedding", MLP_WEIGHTS, MLP_BIAS) > 0.6)
        .cast("long")
        .alias("pos"),
    ).filter(F.col("code").isNotNull())
    # unscorable rows (NULL/NULL-element embedding -> NULL score) are
    # excluded from calibration by spec: a NULL code would otherwise sit at
    # opposite ends of the rank (Spark ASC = NULLS FIRST, DuckDB default =
    # NULLS LAST) and shift every decile boundary (ARCHITECTURE section 28)
    num_parts = 32
    ranged = coded.repartitionByRange(
        num_parts, F.col("code").asc(), F.col("vec_id").asc()
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
    offs = (
        hist.alias("l")
        .join(hist.alias("r"), F.col("r._pid") < F.col("l._pid"), "left")
        .groupBy(F.col("l._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("r._cnt"), F.lit(0)).alias("_off"))
    )
    total = hist.agg(F.sum("_cnt").alias("n"))
    wl = Window.partitionBy("_pid").orderBy("code", "vec_id")
    ranked = (
        ranged.withColumn("_lr", F.row_number().over(wl))
        .join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn("rnk", F.col("_off") + F.col("_lr"))
    )
    dec = F.least(F.expr("(rnk - 1) * 10 div n"), F.lit(9))
    return (
        ranked.groupBy(dec.alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("code").alias("sum_score_micros"),  # exact; mean = sum/n, and
            # integer DIV of a possibly-negative sum truncates in Spark but
            # floors in DuckDB — the sum avoids the divergence class entirely
            F.expr("sum(pos) * 10000 div count(1)").alias("positive_bps"),
        )
        .orderBy("decile")
    )


V_CALIBRATION_SQL = f"""
WITH coded AS (
  SELECT vec_id,
         CAST(round(CAST({OQ.sql_mlp_score('embedding', MLP_WEIGHTS, MLP_BIAS)} AS DOUBLE) * 1000000) AS BIGINT) AS code,
         CASE WHEN {OQ.sql_mlp_score('embedding', MLP_WEIGHTS, MLP_BIAS)} > 0.6 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), coded_valid AS (
  SELECT * FROM coded WHERE code IS NOT NULL
), ranked AS (
  SELECT code, pos,
         ROW_NUMBER() OVER (ORDER BY code, vec_id) AS rnk,
         COUNT(*) OVER () AS n
  FROM coded_valid
)
SELECT LEAST((rnk - 1) * 10 // n, 9) AS decile,
       COUNT(*) AS n_rows,
       CAST(SUM(code) AS BIGINT) AS sum_score_micros,
       CAST(SUM(pos) * 10000 // COUNT(*) AS BIGINT) AS positive_bps
FROM ranked GROUP BY LEAST((rnk - 1) * 10 // n, 9)
ORDER BY decile
"""

QUERIES["v_calibration_curve"] = v_calibration_curve
ORACLE["v_calibration_curve"] = V_CALIBRATION_SQL


# ---------------------------------------------------------------------------
# MMR diverse retrieval
# ---------------------------------------------------------------------------

_MMR_POOL = 20
_MMR_K = 5
_MMR_LAMBDA = 0.7


def v_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): diverse
    top-k — each pick maximizes ``λ·relevance − (1−λ)·max-sim-to-picked``
    so near-duplicate results don't crowd the slate (the dedup-aware
    retrieval layer RAG rerankers bolt onto ANN output).

    Scale shape: production MMR is exactly this two-phase plan — a
    DISTRIBUTED relevance pass pools the top ``_MMR_POOL`` candidates
    (TakeOrderedAndProject over the corpus; the only data-scale stage),
    then the greedy selection runs over the BOUNDED pool (≤ C² pairwise
    sims, K unrolled argmax steps — each a Catalyst job over ≤ C rows,
    nothing collected). The oracle unrolls the same K greedy steps as
    CTEs; argmax comparisons run on bit-identical floats, so selection
    order matches exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    pool = (
        e.crossJoin(F.broadcast(q))  # single query vector by contract
        .select("vec_id", "embedding", VX.cosine("embedding", "q_emb").alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint(eager=True)  # bounded pool, reused K times
    )
    a, b = pool.alias("a"), pool.alias("b")
    sims = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            VX.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    selected = (
        pool.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select("vec_id", "rel", F.lit(1).alias("mmr_rank"))
    )
    for step in range(2, _MMR_K + 1):
        sel_ids = selected.select(F.col("vec_id").alias("sid"))
        msim = (
            sims.join(sel_ids, sims.vb == F.col("sid"), "left_semi")
            .groupBy("va")
            .agg(F.max("sim").alias("ms"))
        )
        pick = (
            pool.join(sel_ids, pool.vec_id == F.col("sid"), "left_anti")
            .join(msim, pool.vec_id == msim.va)
            .withColumn(
                "score",
                F.lit(_MMR_LAMBDA) * F.col("rel") - F.lit(1 - _MMR_LAMBDA) * F.col("ms"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "rel", F.lit(step).alias("mmr_rank"))
        )
        selected = selected.unionByName(pick)
    return selected.select(
        "mmr_rank", "vec_id", F.round("rel", 6).alias("relevance")
    ).orderBy("mmr_rank")


def _mmr_sql() -> str:
    lam, mu = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    cos = OQ.sql_cosine("c.embedding", "q.q_emb", DIM)
    parts = [
        f"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
pool AS MATERIALIZED (
  SELECT vec_id, embedding, rel FROM (
    SELECT c.vec_id, c.embedding, {cos} AS rel,
           ROW_NUMBER() OVER (ORDER BY {cos} DESC, c.vec_id ASC) AS rk
    FROM embeddings c CROSS JOIN q
  ) WHERE rk <= {_MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         {OQ.sql_cosine('a.embedding', 'b.embedding', DIM)} AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
sel1 AS MATERIALIZED (
  SELECT vec_id, rel, 1 AS mmr_rank FROM pool
  ORDER BY rel DESC, vec_id ASC LIMIT 1
)"""
    ]
    for step in range(2, _MMR_K + 1):
        prev = f"sel{step - 1}"
        parts.append(
            f""",
pick{step} AS MATERIALIZED (
  SELECT p.vec_id, p.rel, {step} AS mmr_rank
  FROM pool p
  JOIN (SELECT va, MAX(sim) AS ms FROM sims
        WHERE vb IN (SELECT vec_id FROM {prev}) GROUP BY va) m
    ON p.vec_id = m.va
  WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
  ORDER BY {lam} * p.rel - {mu} * m.ms DESC, p.vec_id ASC LIMIT 1
),
sel{step} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{step})"""
        )
    parts.append(
        f"""
SELECT mmr_rank, vec_id, ROUND(rel, 6) AS relevance
FROM sel{_MMR_K} ORDER BY mmr_rank"""
    )
    return "".join(parts)


QUERIES["v_mmr_diverse_topk"] = v_mmr_diverse_topk
ORACLE["v_mmr_diverse_topk"] = _mmr_sql()


# ---------------------------------------------------------------------------
# LSH bucket label purity (bucketing-quality diagnostic)
# ---------------------------------------------------------------------------


def v_lsh_bucket_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does hyperplane-LSH bucketing respect the label structure? Per
    bucket: the majority label and its share (ppm) — the cheap proxy for
    "will bucketed semantic dedup/ANN mostly compare like with like".
    Low-purity buckets are where the LSH scale path loses recall vs the
    exact path (read next to ``v_recall_at_k``).

    Determinism: buckets and labels are integers; the majority pick is
    an exact-count argmax with ties to the smaller label; purity is
    integer ppm. Scale shape: one (bucket × label) rollup — both bounded
    — then a per-bucket argmax window over label cells (≤ |labels| rows
    per bucket).
    """
    e = load_table(spark, sf_dir, "embeddings")
    cells = (
        e.withColumn("bucket", OD.hyperplane_bucket("embedding", DIM))
        .groupBy("bucket", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n"), "label")
    return (
        cells.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_vecs", F.sum("n").over(Window.partitionBy("bucket")))
        .filter(F.col("_rk") == 1)
        .select(
            "bucket",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.col("label").cast("bigint").alias("top_label"),
            F.expr("n * 1000000 div n_vecs").alias("purity_ppm"),
        )
        .orderBy("bucket")
    )


V_BUCKET_PURITY_SQL = f"""
WITH cells AS (
  SELECT {OQ.sql_hyperplane_bucket('embedding', DIM)} AS bucket, label,
         COUNT(*) AS n
  FROM embeddings GROUP BY 1, 2
), ranked AS (
  SELECT bucket, label, n,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, label) AS rk,
         SUM(n) OVER (PARTITION BY bucket) AS n_vecs
  FROM cells
)
SELECT bucket, CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(label AS BIGINT) AS top_label,
       CAST(n * 1000000 // n_vecs AS BIGINT) AS purity_ppm
FROM ranked WHERE rk = 1
ORDER BY bucket
"""

QUERIES["v_lsh_bucket_purity"] = v_lsh_bucket_purity
ORACLE["v_lsh_bucket_purity"] = V_BUCKET_PURITY_SQL


# ---------------------------------------------------------------------------
# k-NN label classification (embedding-space label propagation)
# ---------------------------------------------------------------------------

KNN_K = 5
KNN_QUERIES = 10


def v_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification: hold out the first
    ``KNN_QUERIES`` vectors, predict each one's label from its ``KNN_K``
    cosine-nearest neighbors in the rest of the corpus, and report
    prediction vs truth per query — the embedding-space label-propagation
    primitive (auto-labeling a new slice from a labeled corpus) built
    ENTIRELY from the audited ``cosine_topk`` plan.

    Determinism: neighbor selection is ``cosine_topk``'s
    (score DESC, vec_id) ranking — bit-identical floats in both engines;
    the vote is an exact-count argmax with ties to the smaller label.
    """
    e = load_table(spark, sf_dir, "embeddings")
    holdout = e.filter(F.col("vec_id") < KNN_QUERIES)
    corpus = e.filter(F.col("vec_id") >= KNN_QUERIES)
    q = holdout.select(F.col("vec_id").alias("query_id"), "embedding")
    nn = OS.cosine_topk(corpus, q, k=KNN_K)
    votes = (
        nn.join(
            corpus.select("vec_id", F.col("label").alias("nn_label")), "vec_id"
        )
        # unlabeled neighbors can't vote (and a NULL label in the
        # tie-break ORDER BY would diverge: Spark ASC = NULLS FIRST,
        # DuckDB default = NULLS LAST — §24)
        .filter(F.col("nn_label").isNotNull())
        .groupBy("query_id", "nn_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), "nn_label")
    pred = votes.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    )
    return (
        pred.join(
            holdout.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("true_label"),
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("nn_label").cast("bigint").alias("pred_label"),
            F.col("true_label").cast("bigint").alias("true_label"),
            "votes",
        )
        .orderBy("query_id")
    )


V_KNN_SQL = f"""
WITH nn AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rank
    FROM (SELECT * FROM embeddings WHERE vec_id >= {KNN_QUERIES}) c
    CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {KNN_QUERIES}) q
  ) WHERE rank <= {KNN_K}
), votes AS (
  SELECT nn.query_id, c.label AS nn_label, COUNT(*) AS votes
  FROM nn JOIN embeddings c USING (vec_id)
  WHERE c.label IS NOT NULL
  GROUP BY nn.query_id, c.label
), pred AS (
  SELECT query_id, nn_label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, nn_label) AS rk
  FROM votes
)
SELECT query_id, CAST(nn_label AS BIGINT) AS pred_label,
       CAST(q.label AS BIGINT) AS true_label, votes
FROM pred JOIN embeddings q ON pred.query_id = q.vec_id
WHERE rk = 1
ORDER BY query_id
"""

QUERIES["v_knn_classify"] = v_knn_classify
ORACLE["v_knn_classify"] = V_KNN_SQL


# ---------------------------------------------------------------------------
# Multi-probe LSH recall/cost sweep
# ---------------------------------------------------------------------------

_MP_MAX_LVL = 2  # probe buckets up to Hamming distance 2 from the query code


def v_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH sweep (Lv et al. 2007): recall@k AND candidate
    cost of hyperplane-LSH retrieval when each query probes every bucket
    within Hamming distance p of its own 8-bit code, for p ∈ {0,1,2}
    (1 / 9 / 37 buckets of 256). THE tuning table for a bucketed ANN
    tier: multi-probe buys recall with extra probes instead of extra
    hash tables, so the index stays single-copy at 100 TB while recall
    climbs — this query shows exactly what each probe level pays
    (candidates scanned) and buys (exact-top-k hits).

    Scale shape: probe codes are enumerated on the QUERY side (≤ 37 per
    query, broadcast by the query-set contract); the corpus side is a
    bucket EQUI-join — never a cross join — and each candidate is scored
    once, with the 3-row level table fanning out only the bounded
    candidate set. Exact top-k reuses the broadcast-query corpus scan.
    Determinism: ranking ties break by vec_id; all counts integer.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cb = e.withColumn(
        "_bucket", OD.hyperplane_bucket("embedding", DIM)
    ).withColumn("_c_norm", VX.l2_norm("embedding"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_q_emb"),
        VX.l2_norm("embedding").alias("_q_norm"),
        OD.hyperplane_bucket("embedding", DIM).alias("_qb"),
    )
    probes = q.select(
        "query_id",
        "_q_emb",
        "_q_norm",
        "_qb",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.lit(255)),
                lambda c: F.bit_count(c.bitwiseXOR(F.col("_qb"))) <= _MP_MAX_LVL,
            )
        ).alias("_bucket"),
    ).withColumn("_lvl", F.bit_count(F.col("_bucket").bitwiseXOR(F.col("_qb"))))
    exact = OS.cosine_topk(
        e,
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=TOP_K,
    ).select("query_id", "vec_id", F.lit(1).alias("_ex"))
    scored = (
        cb.join(F.broadcast(probes), "_bucket")
        .select(
            "query_id",
            "vec_id",
            "_lvl",
            VX.guarded_div(
                VX.dot(F.col("embedding"), F.col("_q_emb")),
                F.col("_c_norm") * F.col("_q_norm"),
            ).alias("_cos"),
        )
        .join(F.broadcast(exact), ["query_id", "vec_id"], "left")
    )
    levels = scored.crossJoin(
        F.broadcast(
            spark.range(0, _MP_MAX_LVL + 1).select(
                F.col("id").cast("int").alias("probe_level")
            )
        )
    ).filter(F.col("_lvl") <= F.col("probe_level"))
    w = Window.partitionBy("probe_level", "query_id").orderBy(
        F.col("_cos").desc(), F.col("vec_id").asc()
    )
    return (
        levels.withColumn("_rank", F.row_number().over(w))
        .groupBy("probe_level", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(
                F.when((F.col("_rank") <= TOP_K) & (F.col("_ex") == 1), 1)
            ).alias("n_hits"),
        )
        .select(
            "probe_level",
            "query_id",
            "n_candidates",
            "n_hits",
            F.lit(TOP_K).cast("int").alias("k"),
        )
    )


def _multiprobe_sql() -> str:
    bucket = OQ.sql_hyperplane_bucket("embedding", DIM)
    return f"""
WITH cb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, {bucket} AS qb
  FROM embeddings WHERE vec_id < {N_QUERIES}
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {OQ.sql_cosine('c.embedding', 'q.embedding', DIM)} DESC,
                      c.vec_id ASC) AS rank
    FROM embeddings c
    CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
  ) WHERE rank <= {TOP_K}
), probes AS (
  SELECT query_id, q_emb, qb,
         unnest(list_filter(range(0, 256),
           c -> bit_count(CAST(xor(c, qb) AS BIGINT)) <= {_MP_MAX_LVL})) AS bucket
  FROM q
), scored AS (
  SELECT p.query_id, c.vec_id,
         bit_count(CAST(xor(p.bucket, p.qb) AS BIGINT)) AS lvl,
         {OQ.sql_cosine('c.embedding', 'p.q_emb', DIM)} AS cos,
         CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS ex
  FROM cb c JOIN probes p ON c.bucket = p.bucket
  LEFT JOIN exact e ON e.query_id = p.query_id AND e.vec_id = c.vec_id
), leveled AS (
  SELECT s.*, l.probe_level,
         ROW_NUMBER() OVER (
           PARTITION BY l.probe_level, s.query_id
           ORDER BY s.cos DESC, s.vec_id ASC) AS rank
  FROM scored s
  JOIN (SELECT unnest(range(0, {_MP_MAX_LVL + 1})) AS probe_level) l
    ON s.lvl <= l.probe_level
)
SELECT CAST(probe_level AS INT) AS probe_level, query_id,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(*) FILTER (WHERE rank <= {TOP_K} AND ex = 1) AS BIGINT)
         AS n_hits,
       CAST({TOP_K} AS INT) AS k
FROM leveled
GROUP BY probe_level, query_id
"""


QUERIES["v_multiprobe_recall"] = v_multiprobe_recall
ORACLE["v_multiprobe_recall"] = _multiprobe_sql()


# ---------------------------------------------------------------------------
# Hyperplane-LSH recall audit (VERDICT r6 #3): measured recall of the
# banded OR-construction at the near-dup threshold, under the plane
# schedule. The d_lsh_s_curve house pattern applied to hyperplane LSH.
# ---------------------------------------------------------------------------

_HP_RECALL_THRESHOLD = 0.98
_HP_RECALL_BANDS = (1, 2, 4)


def _perturbed_embedding() -> "F.Column":
    """Deterministic ~0.98-cosine twin of ``embedding``: per-coordinate
    multiplicative noise in ±0.35, md5-keyed by (vec_id, coordinate) — the
    §32 replicator rule (HASH-random offsets; any algebraic structure in
    synthetic near-dups eventually aligns with the operator's own
    geometry). Both engines build the identical array: Spark's transform
    index is 0-based, DuckDB's 1-based, so the SQL mirror hashes (i-1)."""
    from webscale_multimodal_datapipeline_spark.functions import text as TXF

    return F.transform(
        VX.to_double_array("embedding"),
        lambda v, i: v
        * (
            F.lit(1.0)
            + (
                TXF.md5_long(
                    F.concat(
                        F.col("vec_id").cast("string"),
                        F.lit("|"),
                        i.cast("string"),
                        F.lit("|pert"),
                    )
                )
                % 1001
                - 500
            )
            * F.lit(0.0007)
        ),
    )


def v_hyperplane_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of hyperplane-LSH candidate generation at the
    semantic-dedup threshold (0.98), for bands ∈ {1, 2, 4} of 8 planes
    each (8 = what ``scaled_planes`` resolves to at this corpus size, so
    the audit measures the shipped default's recall and the banded
    remedy's). Each vector is paired with a deterministic noisy twin
    (true cosine computed exactly, pairs kept iff >= 0.98); a pair is
    CAUGHT by a config iff any of its band keys match. Because band key
    spaces are disjoint, "any band matches" = any position-wise equality,
    and bands=k uses the first k entries of the bands=4 key array —
    recall(k) is monotone in k by construction, the S-curve's OR axis."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        VX.is_valid_vector("embedding")
        & (F.size("embedding") == DIM)
        & F.col("vec_id").isNotNull()
    )
    kmax = max(_HP_RECALL_BANDS)
    # localCheckpoint barrier (the word_shingles PERF pitfall): the band
    # keys below read _p via 2,048 element_at accesses, and CollapseProject
    # would re-inline the 64-element md5-perturbation tree into EVERY one —
    # a multi-million-node expression that OOMs a vanilla 1g driver at plan
    # build. The barrier materializes the two arrays once; values unchanged.
    base = e.select(
        "vec_id",
        VX.to_double_array("embedding").alias("_e"),
        _perturbed_embedding().alias("_p"),
    ).localCheckpoint(eager=True)
    base = base.select(
        "vec_id",
        VX.guarded_div(
            VX.dot("_e", "_p"), VX.l2_norm("_e") * VX.l2_norm("_p")
        ).alias("_cos"),
        OD.hyperplane_band_keys("_e", DIM, kmax).alias("_bke"),
        OD.hyperplane_band_keys("_p", DIM, kmax).alias("_bkp"),
    )
    match = [
        (F.element_at("_bke", j) == F.element_at("_bkp", j)).cast("long")
        for j in range(1, kmax + 1)
    ]
    caught = {
        k: F.greatest(*match[:k]) if k > 1 else match[0]
        for k in _HP_RECALL_BANDS
    }
    agg = base.filter(F.col("_cos") >= _HP_RECALL_THRESHOLD).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(caught[k]).alias(f"_c{k}") for k in _HP_RECALL_BANDS],
    )
    stacked = agg.selectExpr(
        "stack("
        + str(len(_HP_RECALL_BANDS))
        + ", "
        + ", ".join(f"{k}, _c{k}" for k in _HP_RECALL_BANDS)
        + ") AS (bands, caught)",
        "_n AS true_pairs",
    )
    return stacked.select(
        F.col("bands").cast("int").alias("bands"),
        F.col("true_pairs").cast("long").alias("true_pairs"),
        F.col("caught").cast("long").alias("caught"),
        F.when(
            F.col("true_pairs") > 0, F.col("caught") / F.col("true_pairs")
        ).alias("recall"),
    )


def _hyperplane_recall_sql() -> str:
    kmax = max(_HP_RECALL_BANDS)
    md5l = OQ.sql_md5_long("(vec_id::VARCHAR || '|' || (i - 1)::VARCHAR || '|pert')")
    pert = (
        "list_transform(embedding, (v, i) -> "
        f"v::DOUBLE * (1.0 + ((({md5l} % 1001) - 500) * 0.0007)))"
    )
    bke = OQ.sql_hyperplane_band_keys("e", DIM, kmax)
    bkp = OQ.sql_hyperplane_band_keys("p", DIM, kmax)
    caught = {
        k: "(CASE WHEN "
        + " OR ".join(f"bke[{j}] = bkp[{j}]" for j in range(1, k + 1))
        + " THEN 1 ELSE 0 END)"
        for k in _HP_RECALL_BANDS
    }
    sums = ", ".join(f"SUM({caught[k]}) AS c{k}" for k in _HP_RECALL_BANDS)
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS bands, n AS true_pairs,"
        f" CAST(c{k} AS BIGINT) AS caught,"
        f" CASE WHEN n > 0 THEN c{k} / n END AS recall FROM agg"
        for k in _HP_RECALL_BANDS
    )
    return f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, v -> v::DOUBLE) AS e,
         {pert} AS p
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(embedding) = {DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), keyed AS (
  SELECT vec_id, {OQ.sql_cosine('e', 'p', DIM)} AS cos,
         {bke} AS bke, {bkp} AS bkp
  FROM base
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}
  FROM keyed WHERE cos >= {_HP_RECALL_THRESHOLD}
)
{tail}
"""


QUERIES["v_hyperplane_recall"] = v_hyperplane_recall
ORACLE["v_hyperplane_recall"] = _hyperplane_recall_sql()


# ---------------------------------------------------------------------------
# Mean-centered hyperplane LSH (ARCHITECTURE §33's recorded escalation for
# cone-concentrated corpora): the bias statistics are exact decimal sums,
# so both the bucket histogram and the centered dedup are value-checked
# cross-engine, not just shape-checked.
# ---------------------------------------------------------------------------


def v_centered_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket histogram under MEAN-CENTERED projections
    (``operators/dedup.py::centered_hyperplane_bucket``). On a
    cone-concentrated corpus (CLIP-style embeddings, §33) raw sign buckets
    collapse — every plane agrees on the cone direction — while centered
    buckets keep the fixture's balanced profile; this query pins the
    centered bucket VALUES cross-engine (exact-decimal bias, bit-equal
    double chains), so the escalation path is oracle-checked before a
    deployment ever needs it."""
    e = load_table(spark, sf_dir, "embeddings")
    stats = OD.hyperplane_bias_stats(e, "embedding", DIM, OD.EMB_LSH_PLANES)
    return (
        e.crossJoin(F.broadcast(stats))
        .withColumn(
            "bucket", OD.centered_hyperplane_bucket("embedding", DIM, OD.EMB_LSH_PLANES)
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


V_CENTERED_BUCKETS_SQL = f"""
WITH st AS (
  {OQ.sql_hyperplane_bias_select('embedding', DIM, OD.EMB_LSH_PLANES, 'embeddings')}
)
SELECT {OQ.sql_centered_hyperplane_bucket('embedding', DIM, OD.EMB_LSH_PLANES)} AS bucket,
       COUNT(*) AS n
FROM embeddings, st GROUP BY 1
"""


def v_centered_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal with MEAN-CENTERED LSH candidate
    generation (``embedding_cosine_dedup(center=True)``): same verified
    contract as ``v_cosine_dedup`` (cosine >= 0.9 on ORIGINAL vectors,
    drop higher id), different candidate buckets — the §33 escalation a
    cone-concentrated corpus needs, value-checked end to end."""
    e = load_table(spark, sf_dir, "embeddings")
    return OD.embedding_cosine_dedup(
        e, dim=DIM, threshold=COSINE_DEDUP_THRESHOLD, center=True
    ).select("vec_id", "label")


V_CENTERED_COSINE_DEDUP_SQL = f"""
WITH st AS (
  {OQ.sql_hyperplane_bias_select('embedding', DIM, OD.EMB_LSH_PLANES, 'embeddings')}
), b AS (
  SELECT vec_id, embedding,
         {OQ.sql_centered_hyperplane_bucket('embedding', DIM, OD.EMB_LSH_PLANES)} AS bucket
  FROM embeddings, st
), dup AS (
  SELECT DISTINCT l.vec_id AS vid
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id > r.vec_id
  WHERE {OQ.sql_cosine('l.embedding', 'r.embedding', DIM)} >= {COSINE_DEDUP_THRESHOLD}
)
SELECT vec_id, label FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.vid = e.vec_id)
"""
# NOT EXISTS (not NOT IN): the ARCHITECTURE §24 anti-join class — id-less
# rows pass through dedup untouched, same as v_cosine_dedup.

QUERIES["v_centered_lsh_buckets"] = v_centered_lsh_buckets
ORACLE["v_centered_lsh_buckets"] = V_CENTERED_BUCKETS_SQL
QUERIES["v_centered_cosine_dedup"] = v_centered_cosine_dedup
ORACLE["v_centered_cosine_dedup"] = V_CENTERED_COSINE_DEDUP_SQL


def v_lsh_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cone DETECTOR (ARCHITECTURE §35): per bucketing scheme (raw
    sign-of-projection vs mean-centered), the bucket count, the largest
    bucket, and its corpus share. A cone-concentrated corpus shows the
    raw arm with a pinned-small bucket count and a dominant max bucket
    (the §35 probe read 8 buckets / 63% share under a +8.0 cone) while
    the centered arm keeps the balanced profile — the one-query check an
    operator runs BEFORE paying for a near-dup pass, to decide
    ``center=True``. Exact integers + one guarded rounded ratio."""
    e = load_table(spark, sf_dir, "embeddings")
    stats = OD.hyperplane_bias_stats(e, "embedding", DIM, OD.EMB_LSH_PLANES)
    raw = e.select(
        OD.hyperplane_bucket("embedding", DIM, OD.EMB_LSH_PLANES).alias("b")
    )
    cen = e.crossJoin(F.broadcast(stats)).select(
        OD.centered_hyperplane_bucket("embedding", DIM, OD.EMB_LSH_PLANES).alias("b")
    )
    arms = []
    for scheme, src in (("raw", raw), ("centered", cen)):
        per = src.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
        arms.append(
            per.agg(
                F.lit(scheme).alias("scheme"),
                F.count(F.lit(1)).cast("long").alias("n_buckets"),
                F.max("n").cast("long").alias("max_bucket_n"),
                F.sum("n").cast("long").alias("n_rows"),
            ).select(
                "scheme",
                "n_buckets",
                "max_bucket_n",
                F.when(
                    F.col("n_rows") > 0,
                    F.round(
                        F.col("max_bucket_n").cast("double")
                        / F.col("n_rows").cast("double"),
                        4,
                    ),
                ).alias("max_share"),
            )
        )
    return arms[0].unionByName(arms[1])


def _lsh_skew_audit_sql() -> str:
    bias = OQ.sql_hyperplane_bias_select(
        "embedding", DIM, OD.EMB_LSH_PLANES, "embeddings"
    )
    raw_b = OQ.sql_hyperplane_bucket("embedding", DIM, OD.EMB_LSH_PLANES)
    cen_b = OQ.sql_centered_hyperplane_bucket("embedding", DIM, OD.EMB_LSH_PLANES)
    def arm(scheme, inner):
        return f"""
SELECT '{scheme}' AS scheme,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MAX(n) AS BIGINT) AS max_bucket_n,
       CASE WHEN SUM(n) > 0
            THEN ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 4)
       END AS max_share
FROM (SELECT b, COUNT(*) AS n FROM ({inner}) GROUP BY b)"""
    return f"""
WITH st AS ({bias})
{arm('raw', f'SELECT {raw_b} AS b FROM embeddings')}
UNION ALL
{arm('centered', f'SELECT {cen_b} AS b FROM embeddings, st')}
"""


QUERIES["v_lsh_skew_audit"] = v_lsh_skew_audit
ORACLE["v_lsh_skew_audit"] = _lsh_skew_audit_sql()


# ---------------------------------------------------------------------------
# Round 8: the cone AUTO-GATE, value-checked end to end on data that TRIPS it
# (VERDICT r7 #1 "done =" condition). The corpus is the fixture embeddings
# pushed onto a CLIP-style cone (a +8.0 float32 shift on the first 32
# coordinates — the §35 probe's geometry, expressed as a deterministic
# transform both engines spell identically), then deduped at DEFAULT flags.
# ---------------------------------------------------------------------------

CONE_SHIFT = 8.0
CONE_SHIFT_COORDS = 32


def _cone_embeddings(e: DataFrame) -> DataFrame:
    """Fixture embeddings concentrated onto a cone: float32 ``+8.0`` on the
    first 32 coordinates. Rows whose array is NULL or not exactly DIM long
    pass through UNCHANGED (the SQL mirror's list constructor would
    otherwise null-pad / truncate where Spark's transform preserves
    length)."""
    shifted = F.transform(
        "embedding",
        lambda x, i: F.when(
            i < CONE_SHIFT_COORDS, x + F.lit(CONE_SHIFT).cast("float")
        ).otherwise(x),
    )
    return e.withColumn(
        "embedding",
        F.when(
            F.col("embedding").isNull() | (F.size("embedding") != DIM),
            F.col("embedding"),
        ).otherwise(shifted),
    )


def _sql_cone_embedding(col: str = "embedding") -> str:
    """DuckDB mirror of ``_cone_embeddings``'s per-row transform: an
    explicit DIM-element list constructor (float32 adds, term-identical to
    Spark's float arithmetic), guarded so NULL / wrong-length arrays pass
    through unchanged."""
    items = ", ".join(
        f"{col}[{i + 1}] + CAST({CONE_SHIFT!r} AS FLOAT)"
        if i < CONE_SHIFT_COORDS
        else f"{col}[{i + 1}]"
        for i in range(DIM)
    )
    return (
        f"CASE WHEN {col} IS NULL OR len({col}) <> {DIM} THEN {col}"
        f" ELSE [{items}] END"
    )


def v_autogate_cone_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal at DEFAULT flags on a
    cone-concentrated corpus: ``center="auto"`` must detect the collapsed
    raw bucket profile (the gate's integer tell) and escalate to
    mean-centered candidate generation — the oracle replays the gate AND
    the centered arm on the same rows, so a gate that fails to fire (or
    fires with different bucket keys) hash-mismatches."""
    e = load_table(spark, sf_dir, "embeddings")
    return OD.embedding_cosine_dedup(
        _cone_embeddings(e), dim=DIM, threshold=COSINE_DEDUP_THRESHOLD
    ).select("vec_id", "label")


def _autogate_cone_dedup_sql() -> str:
    cone = _sql_cone_embedding()
    return f"""
WITH c AS (
  SELECT vec_id, label, {cone} AS embedding FROM embeddings
), g AS (SELECT {OQ.sql_cone_gate('embedding', DIM, OD.EMB_LSH_PLANES, 'c')} AS gated),
st AS (
  {OQ.sql_hyperplane_bias_select('embedding', DIM, OD.EMB_LSH_PLANES, 'c')}
), b AS (
  SELECT vec_id, embedding, {OQ.sql_hyperplane_bucket('embedding', DIM)} AS bucket
  FROM c WHERE NOT (SELECT gated FROM g)
  UNION ALL
  SELECT vec_id, embedding,
         {OQ.sql_centered_hyperplane_bucket('embedding', DIM, OD.EMB_LSH_PLANES)} AS bucket
  FROM c, st WHERE (SELECT gated FROM g)
), dup AS (
  SELECT DISTINCT l.vec_id AS vid
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id > r.vec_id
  WHERE {OQ.sql_cosine('l.embedding', 'r.embedding', DIM)} >= {COSINE_DEDUP_THRESHOLD}
)
SELECT vec_id, label FROM c e
WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.vid = e.vec_id)
"""


QUERIES["v_autogate_cone_dedup"] = v_autogate_cone_dedup
ORACLE["v_autogate_cone_dedup"] = _autogate_cone_dedup_sql()


def v_autogate_cone_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cone auto-gate on the BANDED OR-construction path (VERDICT r8 #6):
    with ``bands=4`` the gate profiles band 0's key off the materialized
    projection (``element_at(_bk, 1)`` — raw 8-plane bucket, offset 0,
    base 0) and a trip escalates ALL four bands to mean-centered keys.
    The oracle replays the gate AND both banded arms, so this row
    hash-verifies the gate's banded key-extraction path, not just the
    single-bucket arm ``v_autogate_cone_dedup`` covers."""
    e = load_table(spark, sf_dir, "embeddings")
    return OD.embedding_cosine_dedup(
        _cone_embeddings(e), dim=DIM, threshold=COSINE_DEDUP_THRESHOLD, bands=4
    ).select("vec_id", "label")


def _autogate_cone_banded_sql(bands: int = 4) -> str:
    cone = _sql_cone_embedding()
    planes = OD.EMB_LSH_PLANES
    raw_keys = OQ.sql_hyperplane_band_keys("embedding", DIM, bands, planes)
    cen_keys = OQ.sql_centered_hyperplane_band_keys("embedding", DIM, bands, planes)
    return f"""
WITH c AS (
  SELECT vec_id, label, {cone} AS embedding FROM embeddings
), g AS (SELECT {OQ.sql_cone_gate('embedding', DIM, planes, 'c')} AS gated),
st AS (
  {OQ.sql_hyperplane_bias_select('embedding', DIM, planes * bands, 'c')}
), b AS MATERIALIZED (
  -- MATERIALIZED: the bucket-key arrays are bands*planes*dim-term
  -- expressions; the self-join below reads b twice, and an inlined CTE
  -- re-evaluates the keys per probe side (observed: the sf1 oracle ran
  -- past a 600 s interrupt; materialized it finishes in minutes)
  SELECT vec_id, embedding, UNNEST({raw_keys}) AS bucket
  FROM c WHERE NOT (SELECT gated FROM g)
  UNION ALL
  SELECT vec_id, embedding, UNNEST({cen_keys}) AS bucket
  FROM c, st WHERE (SELECT gated FROM g)
), dup AS (
  SELECT DISTINCT l.vec_id AS vid
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id > r.vec_id
  WHERE {OQ.sql_cosine('l.embedding', 'r.embedding', DIM)} >= {COSINE_DEDUP_THRESHOLD}
)
SELECT vec_id, label FROM c e
WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.vid = e.vec_id)
"""


QUERIES["v_autogate_cone_banded"] = v_autogate_cone_banded
ORACLE["v_autogate_cone_banded"] = _autogate_cone_banded_sql()


# ---------------------------------------------------------------------------
# Spherical k-means (round 9, session 2) — deterministic unrolled Lloyd's
# under cosine geometry (operators/similarity.py::spherical_kmeans_assign).
# Unlike v_kmeans_clusters (pyspark.ml, Euclidean, invariant-oracled),
# every pass here is replayed by the oracle: init, both assignments, and
# the decimal-exact spherical centroid update — so the hash check covers
# the ITERATION, not just invariants. Floats stay unrounded end-to-end
# (§43 rule: identical float trees compare exactly; ROUND on derived
# doubles subtracts parity).
# ---------------------------------------------------------------------------

_SKM_K = OS.SPHERICAL_K
_SKM_ITERS = OS.SPHERICAL_ITERS


def _skm_cte(dim: int = DIM, k: int = _SKM_K, iters: int = _SKM_ITERS) -> str:
    """CTE chain ending in ``a{iters}`` = (vec_id, u, cluster, sim)."""
    valid = (
        "embedding IS NOT NULL AND len(embedding) = %d AND "
        "len(list_filter(embedding, x -> x IS NULL)) = 0" % dim
    )
    sums = ", ".join(
        f"SUM(CAST(u[{i + 1}] AS DECIMAL(27,10))) AS s{i}" for i in range(dim)
    )
    means = ", ".join(f"CAST(s{i} AS DOUBLE) / n" for i in range(dim))
    parts = [
        f"""nv AS (
  SELECT vec_id, {OQ.sql_l2_norm('embedding', dim)} AS nrm, embedding AS v
  FROM embeddings WHERE {valid}
), u AS (
  SELECT vec_id, list_transform(v, x -> CAST(x AS DOUBLE) / nrm) AS u
  FROM nv WHERE nrm > 0
), c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
         u AS c
  FROM (SELECT vec_id, u FROM u ORDER BY vec_id LIMIT {k})
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, u, cluster, sim FROM (
    SELECT vec_id, u, cluster, sim,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY sim DESC, cluster ASC) AS rk
    FROM (
      SELECT x.vec_id, x.u, y.cluster, {OQ.sql_dot('x.u', 'y.c', dim)} AS sim
      FROM u x CROSS JOIN c{t - 1} y
    )
  ) WHERE rk = 1
)"""
        )
        if t < iters:
            parts.append(
                f"""s{t} AS (
  SELECT cluster, COUNT(*) AS n, {sums} FROM a{t} GROUP BY cluster
), m{t} AS (
  SELECT cluster, [{means}] AS m FROM s{t}
), c{t} AS (
  SELECT cluster,
         CASE WHEN {OQ.sql_l2_norm('m', dim)} > 0
              THEN list_transform(m, x -> x / {OQ.sql_l2_norm('m', dim)})
              ELSE m END AS c
  FROM m{t}
)"""
            )
    return ",\n".join(parts)


def v_spherical_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector cluster assignment + cosine-to-centroid after the
    deterministic 2-pass spherical Lloyd's (first-k-by-id init). The
    SemDeDup front half: cluster on the unit sphere, then prune
    within-cluster (a_semantic_dedup does the pruning)."""
    e = load_table(spark, sf_dir, "embeddings")
    return OS.spherical_kmeans_assign(
        e, "embedding", "vec_id", dim=DIM, k=_SKM_K, iters=_SKM_ITERS
    ).orderBy("vec_id")


V_SPHERICAL_KMEANS_SQL = f"""
WITH {_skm_cte()}
SELECT vec_id, cluster, sim FROM a{_SKM_ITERS} ORDER BY vec_id
"""


def v_spherical_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cohesion profile after the final pass: size and exact-sum
    mean/min cosine-to-centroid — the per-cluster signal SemDeDup
    thresholds. Mean = decimal-exact sim sum over the cluster divided in
    double (order-independent; partitioning can't move it)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = OS.spherical_kmeans_assign(
        e, "embedding", "vec_id", dim=DIM, k=_SKM_K, iters=_SKM_ITERS
    )
    return (
        a.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (
                F.sum(F.col("sim").cast("decimal(27,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_sim"),
            F.min("sim").alias("min_sim"),
        )
        .orderBy("cluster")
    )


V_SPHERICAL_KMEANS_PROFILE_SQL = f"""
WITH {_skm_cte()}
SELECT cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CAST(sim AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS mean_sim,
       MIN(sim) AS min_sim
FROM a{_SKM_ITERS} GROUP BY cluster ORDER BY cluster
"""

QUERIES["v_spherical_kmeans"] = v_spherical_kmeans
ORACLE["v_spherical_kmeans"] = V_SPHERICAL_KMEANS_SQL
QUERIES["v_spherical_kmeans_profile"] = v_spherical_kmeans_profile
ORACLE["v_spherical_kmeans_profile"] = V_SPHERICAL_KMEANS_PROFILE_SQL
