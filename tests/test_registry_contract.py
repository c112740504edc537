"""Registry/driver-contract invariants (cheap, no Spark execution):
every query is callable, every oracle references a registered query and
only known tables, names are unique and stable-ordered for the driver."""

from __future__ import annotations

import re

from webscale_multimodal_datapipeline_spark.catalog import TABLES
from webscale_multimodal_datapipeline_spark.plans.registry import ORACLE, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_queries_are_callable_with_two_args():
    import inspect

    for name, fn in QUERIES.items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name}: expected (spark, sf_dir) signature"


def test_oracle_sql_references_only_known_tables():
    # every FROM/JOIN <identifier> must be a registered view or a CTE name
    ident = re.compile(r"\b(?:FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)", re.I)
    for name, sql in ORACLE.items():
        # Neutralize single-quoted string literals FIRST (a literal
        # containing '--' would otherwise make the comment-strip eat the
        # rest of its line, hiding real FROM/JOIN refs from the scan),
        # THEN strip comments — prose, not references ("-- the self-join
        # below" scanned as JOIN below; round 9).
        sql = re.sub(r"'(?:[^']|'')*'", "''", sql)
        sql = re.sub(r"--[^\n]*", "", sql)
        # `x IS NOT DISTINCT FROM y` is an operator, not a relation ref
        sql = re.sub(r"IS\s+NOT\s+DISTINCT\s+FROM", "IS_NOT_DISTINCT_OP", sql, flags=re.I)
        ctes = set(
            re.findall(
                r"(?:WITH\s+RECURSIVE|WITH|,)\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s+(?:(?:NOT\s+)?MATERIALIZED\s+)?\(",
                sql,
                re.I,
            )
        )
        for ref in ident.findall(sql):
            assert ref.lower() in {t.lower() for t in TABLES} | {c.lower() for c in ctes} | {
                "unnest", "generate_series", "values", "range",
            }, f"{name}: unknown relation {ref!r}"


def test_duckdb_can_prepare_every_oracle():
    """Parse-check each oracle against empty same-schema views — catches
    SQL syntax/semantic drift without paying full execution."""
    import duckdb
    import pyarrow.parquet as pq

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet' WHERE 1=0"
        )
    for name, sql in ORACLE.items():
        try:
            con.sql(sql)  # lazy relation: binds + plans, no execution
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name}: oracle fails to bind: {e}") from e


def test_priority_order_front_loads_unrecorded_queries():
    """The driver records ~50 rows/round: no already-recorded query may
    appear before any still-unrecorded one, so every new query gets its
    driver CORRECTNESS row in the round it lands."""
    from webscale_multimodal_datapipeline_spark.plans.registry import (
        _RECORDED,
        _RERECORD,
    )

    names = list(QUERIES)
    seen_recorded = False
    for n in names:
        # _RERECORD queries are recorded but their oracle changed — they
        # deliberately order with the unrecorded block to get a fresh row
        if n in _RECORDED and n not in _RERECORD:
            seen_recorded = True
        else:
            assert not seen_recorded, f"unrecorded {n!r} ordered after recorded queries"


def test_no_shadowed_query_assignments_within_modules():
    """A module assigning QUERIES["name"] twice silently overwrites the
    first definition (dict semantics — the cross-module assert in
    registry.py cannot see it; a round-5 draft shadowed
    d_bloom_prefilter exactly this way). Grep each plans module source
    for duplicate registration keys."""
    import inspect
    import re as _re

    from webscale_multimodal_datapipeline_spark.plans import registry

    for mod in registry._MODULES:
        src = inspect.getsource(mod)
        for kind in ("QUERIES", "ORACLE"):
            names = _re.findall(kind + r'\["([A-Za-z0-9_]+)"\]\s*=', src)
            dupes = {n for n in names if names.count(n) > 1}
            assert not dupes, f"{mod.__name__}: duplicate {kind} assignment {dupes}"
