"""Named query plans + DuckDB oracle SQL (the driver contract).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]``; ``plans.registry`` assembles them for
``__spark_entry__.py``.

Cross-engine determinism rules (applied everywhere):
- SUM over doubles accumulates in DECIMAL (exact in both engines), then
  casts to DOUBLE — identical bits, no float-order divergence.
- timestamps/dates are emitted as formatted strings.
- DuckDB integer sums are cast to BIGINT (its SUM(int) yields HUGEINT).
- every computed column is aliased identically on both sides; LIMIT
  queries carry a total deterministic ORDER BY.
"""
