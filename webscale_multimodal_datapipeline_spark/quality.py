"""Declarative data-quality expectations (deequ / DLT-expectations shape).

The reference validates rows imperatively inside operators (e.g. the
metadata checks in ``operators/refiners/image_metadata.py:38-66`` and the
writer-side schema sampling in ``writers/iceberg_writer.py:81-116``); a
Spark-first engine owns this as a declarative layer: a list of named
constraints compiled into ONE aggregation pass over the table (every
check is a conditional count inside the same Aggregate — no per-check
scans), plus an optional row-level enforcement filter.

Row-level expectations (not-null / range / set / regex) double as
enforcement predicates; table-level ones (uniqueness) only report —
exactly the warn/drop split Delta Live Tables draws.

At 100 TB: the report is one map-side-combinable aggregate over the scan
(cost ≈ one extra projection on a pass the pipeline already makes);
``enforce`` composes the row predicates into a single Filter that
whole-stage-codegens with everything else.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named constraint.

    ``predicate`` is the ROW-LEVEL pass condition (None for table-level
    checks); ``violations`` is the aggregate expression counting failing
    rows (derived from the predicate when not given).
    """

    name: str
    predicate: Column | None = None
    violations: Column | None = field(default=None, compare=False)
    row_level: bool = True

    def violation_count(self) -> Column:
        if self.violations is not None:
            return self.violations
        # a NULL predicate result counts as a violation (three-valued
        # logic would otherwise silently pass NULLs through ``NOT pred``)
        return F.sum(
            F.when(self.predicate.isNull() | ~self.predicate, 1).otherwise(0)
        )


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNotNull())


def expect_in_range(col: str, lo, hi) -> Expectation:
    return Expectation(f"in_range({col})", F.col(col).between(F.lit(lo), F.lit(hi)))


def expect_in_set(col: str, values: tuple) -> Expectation:
    return Expectation(f"in_set({col})", F.col(col).isin(*values))


def expect_regex(col: str, pattern: str) -> Expectation:
    return Expectation(f"regex({col})", F.col(col).rlike(pattern))


def expect_unique(col: str) -> Expectation:
    """Table-level: duplicate rows beyond the first of each key count as
    violations (count - distinct-count)."""
    return Expectation(
        f"unique({col})",
        predicate=None,
        violations=F.count(F.col(col)) - F.countDistinct(F.col(col)),
        row_level=False,
    )


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Report (expectation, n_rows, n_violations, violation_rate, passed)
    — one aggregation pass for ALL expectations, then an unpivot of the
    single wide row into one row per expectation."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        e.violation_count().cast("bigint").alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        "_n",
        F.posexplode(F.array(*[F.col(f"_v{i}") for i in range(len(expectations))])).alias(
            "_i", "n_violations"
        ),
    )
    names = F.array(*[F.lit(e.name) for e in expectations])
    return stacked.select(
        F.element_at(names, F.col("_i") + 1).alias("expectation"),
        F.col("_n").cast("bigint").alias("n_rows"),
        F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        F.round(
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("double") / F.col("_n"), 6
        ).alias("violation_rate"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
    )


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Drop rows failing ANY row-level expectation (NULL predicate results
    drop, matching ``evaluate``'s violation counting). Table-level
    expectations are report-only and ignored here."""
    preds = [e.predicate for e in expectations if e.row_level and e.predicate is not None]
    if not preds:
        return df
    cond = preds[0]
    for p in preds[1:]:
        cond = cond & p
    return df.filter(cond.isNotNull() & cond)
