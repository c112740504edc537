"""HTML metrics report — the render layer over the A3 analytics queries.

The reference emits a plotly HTML report (funnel, Sankey, timeline,
bottleneck, latency heatmap — ``framework/metrics/reporter.py:126-1314``).
Here the same report sections are rendered as dependency-free static HTML:
the *analytics* are the Spark SQL aggregates in ``metrics.py`` (funnel /
bottleneck / stage rollups); only their tiny driver-side results are
formatted. Pass-rate "charts" are inline-CSS bars, so the file opens
anywhere with no JS.

Collecting here is correct, not a hot-path anti-pattern: the inputs are
per-(stage, operator) aggregate rows — dozens of rows regardless of how
many trillions of records the run processed.
"""

from __future__ import annotations

import html as _html
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscale_multimodal_datapipeline_spark.metrics import (
    bottleneck_report,
    funnel_report,
    run_metrics_df,
    stage_metrics_df,
)

_CSS = """
body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 2em; color: #222; }
h1 { border-bottom: 2px solid #444; padding-bottom: .2em; }
h2 { margin-top: 1.6em; color: #333; }
table { border-collapse: collapse; margin-top: .6em; }
th, td { border: 1px solid #ccc; padding: .35em .7em; text-align: right; }
th { background: #f0f0f0; }
td.name, th.name { text-align: left; }
.bar { background: #4a90d9; height: 12px; display: inline-block; vertical-align: middle; }
.barbox { width: 160px; background: #eee; display: inline-block; }
.muted { color: #888; font-size: .85em; }
"""


def _esc(v) -> str:
    return _html.escape("" if v is None else str(v))


def _fmt(v) -> str:
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:,.3f}"
    return f"{v:,}"


def _pass_bar(rate: float | None) -> str:
    r = 0.0 if rate is None else max(0.0, min(float(rate), 1.0))
    return (
        f'<span class="barbox"><span class="bar" style="width:{r * 160:.0f}px">'
        f"</span></span> {r:6.1%}"
    )


def _table(headers: list[str], rows: list[list[str]], name_cols: int = 1) -> str:
    head = "".join(
        f'<th class="name">{h}</th>' if i < name_cols else f"<th>{h}</th>"
        for i, h in enumerate(headers)
    )
    body = "".join(
        "<tr>"
        + "".join(
            f'<td class="name">{c}</td>' if i < name_cols else f"<td>{c}</td>"
            for i, c in enumerate(r)
        )
        + "</tr>"
        for r in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def render_html_report(
    operators: DataFrame,
    title: str = "Pipeline Report",
    rejected: DataFrame | None = None,
    debug_samples_per_operator: int = 20,
) -> str:
    """Render the funnel / bottleneck / stage-rollup sections from the
    operators metrics table (the ``operators_*.parquet`` shape).

    ``rejected`` (the pipeline's rejected side-output) adds a debug
    section with up to ``debug_samples_per_operator`` sample rows per
    rejecting operator (reference ``config.py:120`` /
    ``reporter.py:132-168`` semantics) — sampled with ONE partitioned
    window pass, not a job per operator."""
    stages = stage_metrics_df(operators)
    runs = run_metrics_df(operators, stages).collect()
    funnel = funnel_report(operators).orderBy("first_seen", "stage_name").collect()
    bottleneck = bottleneck_report(operators).collect()
    stage_rows = stages.orderBy("stage_name").collect()

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{_esc(title)}</h1>",
        f"<p class='muted'>generated {time.strftime('%Y-%m-%d %H:%M:%S')}</p>",
    ]

    # Run summary (reporter.py run header semantics)
    parts.append("<h2>Run summary</h2>")
    parts.append(
        _table(
            ["run", "stages", "input", "output", "pass rate", "duration (s)"],
            [
                [
                    _esc(r.run_id),
                    _fmt(r.num_stages),
                    _fmt(r.total_input_records),
                    _fmt(r.total_output_records),
                    _pass_bar(r.overall_pass_rate),
                    _fmt(r.duration),
                ]
                for r in runs
            ],
        )
    )

    # Funnel (reporter.py:689-701): input→output per operator in pipeline order
    parts.append("<h2>Funnel</h2>")
    parts.append(
        _table(
            ["stage", "operator", "input", "output", "pass rate"],
            [
                [
                    _esc(r.stage_name),
                    _esc(r.operator_name),
                    _fmt(r.total_input),
                    _fmt(r.total_output),
                    _pass_bar(r.mean_pass_rate),
                ]
                for r in funnel
            ],
            name_cols=2,
        )
    )

    # Stage rollups (timeline stand-in: stage totals in order)
    parts.append("<h2>Stages</h2>")
    parts.append(
        _table(
            ["stage", "operators", "input", "output", "pass rate", "bottleneck time (s)"],
            [
                [
                    _esc(r.stage_name),
                    _fmt(r.num_operators),
                    _fmt(r.input_records),
                    _fmt(r.output_records),
                    _pass_bar(r.pass_rate),
                    _fmt(r.total_time),
                ]
                for r in stage_rows
            ],
        )
    )

    # Rejection flow (reporter.py Sankey semantics as a table): every
    # operator's drop count + share of total input — where rows went
    total_in = max((r.total_input for r in funnel), default=0) or 1
    drops = [
        (r.stage_name, r.operator_name, r.total_input - r.total_output)
        for r in funnel
        if (r.total_input or 0) > (r.total_output or 0)
    ]
    parts.append("<h2>Rejection flow</h2>")
    parts.append(
        _table(
            ["stage", "operator", "rejected", "share of input"],
            [
                [
                    _esc(s),
                    _esc(o),
                    _fmt(d),
                    _pass_bar(d / total_in),
                ]
                for s, o, d in sorted(drops, key=lambda x: -x[2])
            ],
            name_cols=2,
        )
    )

    # Waterfall (reporter.py waterfall chart): surviving rows after each
    # operator, in pipeline order
    parts.append("<h2>Waterfall</h2>")
    parts.append(
        _table(
            ["stage", "operator", "rows remaining", "of input"],
            [
                [
                    _esc(r.stage_name),
                    _esc(r.operator_name),
                    _fmt(r.total_output),
                    _pass_bar((r.total_output or 0) / total_in),
                ]
                for r in funnel
            ],
            name_cols=2,
        )
    )

    # Bottleneck (reporter.py:962): slowest operators first
    parts.append("<h2>Bottlenecks</h2>")
    parts.append(
        _table(
            ["operator", "mean throughput (rec/s)", "mean time (s)"],
            [
                [_esc(r.operator_name), _fmt(r.mean_throughput), _fmt(r.mean_time)]
                for r in bottleneck
            ],
        )
    )

    # Rejected-sample debug section (reference reporter.py:132-168)
    if rejected is not None and debug_samples_per_operator > 0:
        from pyspark.sql import Window

        from webscale_multimodal_datapipeline_spark.operators.base import (
            REJECTION_COL,
        )

        w = Window.partitionBy(f"{REJECTION_COL}.operator").orderBy(
            F.monotonically_increasing_id()
        )
        sampled = (
            rejected.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= debug_samples_per_operator)
            .drop("_rn")
            .collect()
        )
        by_op: dict[str, list] = {}
        for r in sampled:
            det = r[REJECTION_COL]
            by_op.setdefault(det["operator"], []).append((det["reason"], r))
        parts.append("<h2>Rejected samples (debug)</h2>")
        show_cols = [c for c in (rejected.columns) if c != REJECTION_COL][:6]
        for op_name in sorted(by_op):
            parts.append(f"<h3>{_esc(op_name)}</h3>")
            parts.append(
                _table(
                    ["reason", *show_cols],
                    [
                        [
                            _esc(reason),
                            *[
                                _esc(str(row[c])[:80]) if row[c] is not None else ""
                                for c in show_cols
                            ],
                        ]
                        for reason, row in by_op[op_name]
                    ],
                )
            )

    parts.append("</body></html>")
    return "".join(parts)


def write_html_report(
    operators: DataFrame,
    path: str,
    title: str = "Pipeline Report",
    rejected: DataFrame | None = None,
    debug_samples_per_operator: int = 20,
) -> str:
    """Render and write the report; returns the path."""
    html_text = render_html_report(
        operators,
        title,
        rejected=rejected,
        debug_samples_per_operator=debug_samples_per_operator,
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(html_text)
    return path
