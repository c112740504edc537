"""Operator factories (Refiner / Filter / Deduplicator / similarity).

Mirrors the reference's four operator kinds (``framework/operator.py:206,
226,271,385``) as ``DataFrame -> DataFrame`` transforms. Operators compose
by plain function composition; Catalyst fuses adjacent projections/filters
into one whole-stage-codegen pass (the built-in equivalent of the
reference's ``CombinedOperator``).
"""

from webscale_multimodal_datapipeline_spark.operators.base import Operator, OperatorResult
from webscale_multimodal_datapipeline_spark.operators.registry import OPERATORS, register

__all__ = ["Operator", "OperatorResult", "OPERATORS", "register"]
