"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` — every implemented operator as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (value-hash gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical curation pipeline shape
    (load → refine → filter → dedup → aggregate) over documents at
    sf0.001 — SURVEY §7 step 1."""
    from webscale_multimodal_datapipeline_spark.catalog import load_table
    from webscale_multimodal_datapipeline_spark.functions import text as TX
    from webscale_multimodal_datapipeline_spark.operators.base import chain
    from webscale_multimodal_datapipeline_spark.operators.dedup import text_exact_dedup
    from webscale_multimodal_datapipeline_spark.operators.filters import (
        text_length_filter,
        url_filter,
    )
    from webscale_multimodal_datapipeline_spark.operators.refiners import (
        quality_score_refiner,
        text_stats_refiner,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    curated = chain(
        docs,
        text_stats_refiner(),
        quality_score_refiner(),
        text_length_filter(50, 10_000, length_col="n_chars"),
        url_filter(blocklist=("src1", "src7"), quality_sources=("src3",)),
        text_exact_dedup(),
    )
    return curated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
        F.avg("quality_score").alias("avg_quality"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from webscale_multimodal_datapipeline_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from webscale_multimodal_datapipeline_spark.plans.registry import ORACLE

    return dict(ORACLE)
