"""PII detection and redaction over text columns.

Training-data pipelines scrub personally-identifiable strings before a
corpus ships: email addresses, bare IPv4 addresses (PII under GDPR),
phone-shaped digit runs. The reference repo EXTRACTS IPs for routing
analysis (modules/extract_routing.py:27, modules/split_ip.py) but never
redacts; this module is the inverse surface — same pattern family,
opposite action — and is part of the added training-data operator set.

Engine parity: the patterns below restrict themselves to character
classes, bounded repetition, and alternation — constructs with
IDENTICAL semantics in Java regex (Spark JVM expressions), RE2
(DuckDB) and Python ``re`` — so the census and redacted text are
value-exact across all three. No lookaround, no backreferences.

Scale design: everything here is a single narrow projection pass of
pure JVM ``regexp_replace`` / ``regexp_extract_all`` expressions —
whole-stage-codegen'd, zero shuffle, zero Python. At 100 TB this is a
map-only job whose cost is the parquet scan itself; the patterns are
applied most-specific-first so redaction placeholders never overlap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern constants — shared verbatim by the Spark expressions, the
# DuckDB oracle SQL, and tests. Keep RE2/Java/re-portable (see module
# docstring) — do not add lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{3,10}"

# Redaction order matters: emails first (an email's host part could
# otherwise be clipped by a later pattern), then phones, then bare IPs.
REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def pii_count(col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``col``
    (long; left-to-right scan — same in Java regex, RE2, Python re)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def redact_pii(col: Column) -> Column:
    """Apply every redaction in :data:`REDACTIONS`, in order."""
    out = col
    for pat, token in REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` over SQL expression ``expr``
    (``regexp_replace(..., 'g')`` = replace-all, Spark's default)."""
    out = expr
    for pat, token in REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def count_sql(expr: str, pattern: str) -> str:
    """DuckDB twin of :func:`pii_count`."""
    return f"CAST(len(regexp_extract_all({expr}, '{pattern}')) AS BIGINT)"
