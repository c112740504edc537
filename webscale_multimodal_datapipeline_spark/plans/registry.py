"""Assembled query catalog — the single source for ``__spark_entry__.py``.

Every implemented operator from SURVEY §2 has a named query here; most have
a DuckDB oracle (the exceptions are iterative/ML ops, which get the
driver's rows-only check).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from webscale_multimodal_datapipeline_spark.plans import (
    advanced_queries,
    dedup_queries,
    events_queries,
    misc_queries,
    multimodal_queries,
    pipeline_queries,
    relational,
    relational2,
    relational3,
    text_queries,
    timeseries_queries,
    url_queries,
    vector_queries,
)

# Dict order doubles as the driver's recording order (CORRECTNESS_r{N}.json
# caps at 50 entries per round): modules whose queries lack a recorded driver
# row are listed first so every query accumulates a green row across rounds.
_MODULES = (
    vector_queries,
    events_queries,
    pipeline_queries,
    multimodal_queries,
    advanced_queries,
    timeseries_queries,
    url_queries,
    misc_queries,
    relational,
    relational2,
    relational3,
    text_queries,
    dedup_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        assert _name not in QUERIES, f"duplicate query name {_name}"
        QUERIES[_name] = _fn
    for _name, _sql in _m.ORACLE.items():
        assert _name in _m.QUERIES, f"oracle without query: {_name}"
        ORACLE[_name] = _sql
