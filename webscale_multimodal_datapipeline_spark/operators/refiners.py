"""Refiner operators — add columns, never drop rows (reference
``framework/operator.py:206-223`` contract; ``operators/refiners/*``).

Text refiners are pure column expressions. Image/model refiners take the
pandas-UDF path (the Spark analogue of the reference's Rust/torch batch
kernels) — see ``operators/multimodal.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.functions import text as TX
from webscale_multimodal_datapipeline_spark.functions import vectors as VX
from webscale_multimodal_datapipeline_spark.operators.base import RefinerOperator


def text_stats_refiner(text_col: str = "text", name: str = "text_stats_refiner") -> RefinerOperator:
    """Adds text_length / token_count / punct_ratio / stopword_ratio /
    mean_word_length (the text analogue of ImageMetadataRefiner R1)."""
    return RefinerOperator(
        name,
        {
            "text_length": F.length(F.col(text_col)).cast("bigint"),
            "token_count": TX.token_count(text_col).cast("bigint"),
            "punct_ratio": TX.punct_ratio(text_col).cast("double"),
            "stopword_ratio": TX.stopword_ratio(text_col).cast("double"),
            "mean_word_length": TX.mean_word_length(text_col).cast("double"),
        },
    )


def quality_score_refiner(text_col: str = "text", name: str = "quality_score_refiner") -> RefinerOperator:
    """Adds the composite quality score (R2-shaped: derived quality metrics)."""
    return RefinerOperator(name, {"quality_score": TX.quality_score(text_col).cast("double")})


def lang_id_refiner(text_col: str = "text", name: str = "lang_id_refiner") -> RefinerOperator:
    """Adds lang_pred via the stopword-evidence heuristic."""
    return RefinerOperator(name, {"lang_pred": TX.lang_id(text_col)})


def fingerprint_refiner(text_col: str = "text", name: str = "fingerprint_refiner") -> RefinerOperator:
    """Adds a 60-bit md5-backed document fingerprint (dedup key material,
    reference ``text_exact_dedup.py:74-83``)."""
    return RefinerOperator(name, {"fingerprint": TX.fingerprint(text_col)})


def embedding_norm_refiner(
    emb_col: str = "embedding", name: str = "embedding_norm_refiner"
) -> RefinerOperator:
    """Adds the L2 norm and the L2-normalized embedding (reference refiners
    emit normalized embeddings, ``image_clip_embedding.py:150-158``)."""
    return RefinerOperator(
        name,
        {
            "embedding_norm": VX.l2_norm(emb_col).cast("double"),
            "embedding_unit": VX.l2_normalize(emb_col),
        },
    )


def mlp_score_refiner(
    weights: list[float],
    bias: float,
    emb_col: str = "embedding",
    out_col: str = "mlp_score",
    name: str = "mlp_score_refiner",
) -> RefinerOperator:
    """Linear scoring head over a precomputed embedding column — the shape
    of R6 (aesthetic MLP) / R7 (AIGC head) applied to R4/R5 output
    (``image_aesthetic_quality.py:195-233``, ``image_aigc_detector.py``).
    """
    return RefinerOperator(name, {out_col: VX.mlp_score(emb_col, weights, bias).cast("double")})


def compression_ratio_py(text: str | None, level: int = 6) -> float | None:
    """Reference model for the UDF: zlib-compressed size / raw size.

    The Gopher-era repetition heuristic: highly repetitive (low-quality)
    text compresses far below typical prose (~0.4-0.6); near-random text
    approaches 1.0. Deterministic for a fixed zlib level."""
    import zlib

    if text is None:
        return None
    raw = text.encode("utf-8")
    if not raw:
        return 1.0
    return len(zlib.compress(raw, level)) / len(raw)


def compression_ratio_refiner(
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
    name: str = "compression_ratio_refiner",
) -> RefinerOperator:
    """Adds the zlib compression-ratio quality signal as an Arrow-batched
    pandas UDF (no DuckDB zlib → no SQL oracle; parity-tested against
    ``compression_ratio_py`` instead, the repo's rows-only convention).

    Scale: CPU-bound narrow map — zlib level 6 runs ~100 MB/s/core, so
    size the stage by bytes/core; level 1 trades ~2x speed for slightly
    coarser ratios (the FILTER decision is threshold-based, so coarse is
    usually fine)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    # DataType object, not a DDL string — string parsing needs an active
    # SparkContext, and operator factories must build session-free
    @pandas_udf(T.DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    return RefinerOperator(name, {out_col: _ratio(F.col(text_col))})
