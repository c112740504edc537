"""URL canonicalization column expressions.

The reference's URLFilter normalizes URLs before matching
(``url_filter.py:107-180``: scheme strip, case-fold, www/port handling).
This module implements the full canonical form used for URL-level dedup in
web-crawl curation:

- lowercase scheme and host;
- strip a default ``:443``/``:80`` port;
- drop the fragment;
- drop tracking query params (``utm_*``, ``ref``), sort the rest;
- strip a trailing ``/`` from the path.

Pure column expressions (regexp extraction + array ops) — codegen'd, and
mirrored token-for-token by the DuckDB oracle fragment in
``plans/curation_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|ref)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_hostport(col: Column | str) -> Column:
    return F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)


def url_host(col: Column | str) -> Column:
    """Lowercased host with default https/http port stripped."""
    return F.lower(F.regexp_replace(url_hostport(col), r":(443|80)$", ""))


def url_path(col: Column | str) -> Column:
    """Path with any trailing slash removed ('' for no path)."""
    p = F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return F.regexp_replace(p, r"/$", "")


def url_query_canonical(col: Column | str) -> Column:
    """Query string with tracking params removed and the rest sorted;
    '' when nothing survives."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.when(q == "", F.lit("")).otherwise(
        F.concat_ws("&", F.array_sort(params))
    )


def canonical_url(col: Column | str) -> Column:
    """Full canonical form (see module docstring)."""
    q = url_query_canonical(col)
    return F.concat(
        url_scheme(col),
        F.lit("://"),
        url_host(col),
        url_path(col),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
