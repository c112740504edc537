"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline; hyperplane-LSH bucketed
top-k and an IVF (KMeans coarse-quantizer) index as the scale paths. At
100 TB the approximate variants replace the cross join with a
bucket/cluster equi-join — the probe side is broadcast when the query set
is small, and the corpus can be written partitioned by cluster id so a
probe touches only ``n_probe / n_clusters`` of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions import vectors as VX
from webscale_multimodal_datapipeline_spark.operators.dedup import hyperplane_bucket


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity.

    ``queries`` is expected to be small → broadcast; the corpus is scanned
    once, similarity is a codegen'd expression, and the per-query top-k is a
    window over (query, score). Ties broken by corpus id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(emb_col).alias("_q_emb"),
            VX.l2_norm(emb_col).alias("_q_norm"),
        )
    )
    # corpus norm precomputed once per row; cosine in the join is a single
    # dot product + multiply (identical values to cosine()).
    scored = (
        corpus.withColumn("_c_norm", VX.l2_norm(emb_col))
        .crossJoin(q)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (VX.dot(F.col(emb_col), F.col("_q_emb")) / (F.col("_c_norm") * F.col("_q_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    n_clusters: int = 8,
    seed: int = 42,
    emb_col: str = "embedding",
    max_iter: int = 20,
):
    """Fit the IVF coarse quantizer and assign every corpus row a cluster.

    KMeans via ``pyspark.ml`` (replaces the reference's hand-rolled
    distributed Lloyd's loop, ``models/kmeans/distributed_trainer.py`` —
    SURVEY §2.10). Returns ``(assigned_df, centroids)`` where
    ``assigned_df`` has a ``_cluster`` int column and ``centroids`` is the
    small driver-side list (n_clusters × dim) used to pick probe targets.

    Scale: the fit can run on a ``.sample()`` of the corpus; assignment is
    one model.transform pass. Writing the corpus ``partitionBy("_cluster")``
    turns every later probe into a partition-pruned scan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = corpus.withColumn(
        "_v", array_to_vector(F.col(emb_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="_v", predictionCol="_cluster"
    ).fit(vec)
    assigned = model.transform(vec).drop("_v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest KMeans
    centroid; each query scores only the ``n_probe`` clusters whose
    centroids are nearest (squared-L2) to it.

    The centroid table is tiny (n_clusters rows) → the query→probe-cluster
    expansion is a broadcast cross join; the corpus-side join is a cluster
    equi-join, never a cross join. Recall tunes via ``n_probe``.
    """
    spark = corpus.sparkSession
    assigned, centroids = ivf_assign(corpus, n_clusters, seed, emb_col)
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(cid, c) for cid, c in enumerate(centroids)],
            f"_cluster int, _centroid array<double>",
        )
    )
    # squared L2 distance query↔centroid, rank, keep n_probe per query
    d2 = F.aggregate(
        F.zip_with(
            F.col(emb_col).cast("array<double>"),
            F.col("_centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_d2").asc(), F.col("_cluster").asc())
    probes = (
        queries.crossJoin(cent_df)
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select(
            F.col(query_id_col),
            F.col(emb_col).alias("_q_emb"),
            VX.l2_norm(emb_col).alias("_q_norm"),
            "_cluster",
        )
    )
    scored = (
        assigned.withColumn("_c_norm", VX.l2_norm(emb_col))
        .join(F.broadcast(probes), "_cluster")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                VX.dot(F.col(emb_col), F.col("_q_emb"))
                / (F.col("_c_norm") * F.col("_q_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane-LSH
    bucket are scored. Recall is tunable via ``planes`` (fewer planes →
    bigger buckets → higher recall, more compute)."""
    cb = corpus.withColumn("_bucket", hyperplane_bucket(emb_col, dim, planes)).withColumn(
        "_c_norm", VX.l2_norm(emb_col)
    )
    qb = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(emb_col).alias("_q_emb"),
            VX.l2_norm(emb_col).alias("_q_norm"),
            hyperplane_bucket(emb_col, dim, planes).alias("_bucket"),
        )
    )
    scored = cb.join(qb, "_bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        (VX.dot(F.col(emb_col), F.col("_q_emb")) / (F.col("_c_norm") * F.col("_q_norm"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the vector-COMPRESSION scale tier. IVF prunes
# which vectors a probe scans; PQ shrinks what each vector costs to store
# and score (m uint8 codes instead of dim floats — 64x smaller at
# dim=64/m=4). Together they are the IVF-PQ layout every billion-vector
# ANN deployment runs. (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search".)
# ---------------------------------------------------------------------------


def pq_train_encode(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    seed: int = 42,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 20,
):
    """Train per-subspace KMeans codebooks and encode every vector as its
    ``m`` nearest-centroid codes.

    Splits the ``dim``-dim embedding into ``m`` contiguous subvectors and
    fits an independent ``k``-centroid KMeans per subspace (``pyspark.ml``
    — distributed, seeded). Returns ``(codes_df, codebooks)`` where
    ``codes_df`` is ``(id, code_0..code_{m-1})`` and ``codebooks`` is the
    ``m × k × dim/m`` nested list of centroid coordinates (driver-side
    model metadata, ~m·k·dim floats — NOT a data collect).

    Scale shape: training samples could subsample at 100 TB (codebooks
    need ~1e5 vectors, not the corpus); encoding is ``m`` independent
    model.transform passes — row-local, no shuffle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    enc = corpus.select(id_col, emb_col)
    codebooks = []
    for j in range(m):
        sub = F.slice(VX.to_double_array(emb_col), j * d_sub + 1, d_sub)
        feat = enc.withColumn("_feat", array_to_vector(sub))
        model = KMeans(
            k=k, seed=seed + j, maxIter=max_iter, featuresCol="_feat",
            predictionCol=f"code_{j}",
        ).fit(feat)
        enc = model.transform(feat).drop("_feat")
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    return enc.drop(emb_col), codebooks


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approximate squared-L2 =
    sum over subspaces of ||q_sub − centroid(code_j)||², looked up from a
    per-query distance table.

    The LUT is tiny (n_queries · m · k rows) and broadcast; the corpus
    side ships only its ``m`` uint8 codes — never the original floats.
    Plan: unpivot codes → broadcast-join the LUT on (subspace, code) →
    one groupBy(id, query) sum → per-query top-k window. One shuffle over
    (m · corpus) skinny rows; at 100 TB this is the memory-bound layout
    PQ exists to enable.
    """
    m = len(codebooks)
    kcb = len(codebooks[0])
    d_sub = dim // m

    # per-query LUT rows (query_id, j, code, pdist) — driver-built from
    # the broadcast-sized query set x codebook metadata
    qrows = queries.select(query_id_col, emb_col).collect()
    lut = []
    for qr in qrows:
        qe = [float(x) for x in qr[emb_col]]
        for j in range(m):
            qs = qe[j * d_sub : (j + 1) * d_sub]
            for c in range(kcb):
                cc = codebooks[j][c]
                pd_ = sum((a - b) ** 2 for a, b in zip(qs, cc))
                lut.append((qr[query_id_col], j, c, pd_))
    spark = codes_df.sparkSession
    lut_df = F.broadcast(
        spark.createDataFrame(lut, f"{query_id_col} long, _j int, _code int, _pd double")
    )

    unpivoted = codes_df.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"code_{j}") for j in range(m)])).alias(
            "_j", "_code"
        ),
    )
    scored = (
        unpivoted.join(lut_df, ["_j", "_code"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_pd").alias("adc_dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact squared-L2 top-k (the ground truth PQ approximates)."""
    q = F.broadcast(
        queries.select(query_id_col, F.col(emb_col).alias("_q_emb"))
    )
    scored = corpus.crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        F.aggregate(
            F.zip_with(
                VX.to_double_array(emb_col),
                VX.to_double_array("_q_emb"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("l2_sq"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("l2_sq").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "l2_sq", "rank")
    )
