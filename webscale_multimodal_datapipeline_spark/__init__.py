"""webscale_multimodal_datapipeline_spark — a PySpark-native analytics /
data-curation engine with the query and data-processing capabilities of the
reference `duoan/webscale-multimodal-datapipeline` ("Mega Data Factory").

The reference is a Ray-actor ETL pipeline (YAML config → loader → operator
stages → writer). This package re-expresses the same semantics Spark-first:

- operators are ``DataFrame -> DataFrame`` transforms (reference
  ``framework/operator.py:206,226,271,385`` Refiner/Filter/Deduplicator/
  CombinedOperator) compiled into one lazy Catalyst plan;
- the distributed dedup-backend actor service (``framework/backend.py``)
  becomes a hash-shuffle (``dropDuplicates`` / window winner selection);
- batch kernels (``src/image_ops.rs``, ``src/text_ops.rs``) become
  Arrow-vectorized pandas UDFs;
- the metrics layer (``framework/metrics/*``) becomes ``observe()`` +
  DataFrame aggregation.

Layout:
- ``session``    — SparkSession factory tuned for the local[32] harness.
- ``catalog``    — test-table loading / temp-view registration.
- ``functions/`` — column-expression libraries (text, hashing, vectors).
- ``operators/`` — Refiner/Filter/Dedup/similarity operator factories.
- ``plans/``     — named queries + DuckDB oracle SQL (driver contract).
- ``sources/``   — readers beyond plain parquet (WARC, HF-style layouts).
- ``streaming/`` — Structured Streaming variants (watermark dedup, windows).
"""

__version__ = "0.1.0"
