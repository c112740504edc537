"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline; hyperplane-LSH bucketed
top-k as the scale path (candidates from matching buckets only). At 100 TB
the bucketed variant replaces the cross join with a bucket equi-join — the
probe side is broadcast when the query set is small.
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
