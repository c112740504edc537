"""PII detection / redaction primitives (emails, IPv4 addresses, phone
numbers) — the scrubbing stage a web-scale training-data pipeline runs
before publishing a corpus (the reference has no PII stage; this follows
the public C4/FineWeb practice of regex-level redaction).

All patterns are deliberately within the common subset of Java regex
(Spark) and RE2 (DuckDB): no lookarounds, ASCII ``\\d``/``\\b`` — so the
oracle mirrors them verbatim and the driver's value-hash gate pins both
engines to identical redactions.

Scale shape: pure ``regexp_replace``/``regexp_extract_all`` column
expressions — narrow, no shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{4}\b|\b\d{3}-\d{3}-\d{4}\b"

# Redaction applies email -> ip -> phone, in that order: emails may embed
# digits (never the reverse), and the phone alternation cannot overlap a
# dotted quad, so the chain is order-stable.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (before redaction)."""
    c = _c(col)
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its placeholder token."""
    out = _c(col)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def sql_pii_counts(col: str = "text") -> dict[str, str]:
    """DuckDB mirror of :func:`pii_counts` (RE2 runs the same patterns)."""
    return {
        f"n_{kind}": f"len(regexp_extract_all({col}, '{pat}'))"
        for kind, pat, _ in PII_PATTERNS
    }


def sql_redact_pii(col: str = "text") -> str:
    """DuckDB mirror of :func:`redact_pii` (same pattern order)."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
