"""PII census + redaction (functions/pii.py) — value tests plus the
three-engine pattern-parity check (Spark JVM regex vs Python re; the
DuckDB twin is exercised by the driver contract and check_contract)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from juniper_syslog_filter_spark.functions import pii as PII

SAMPLES = [
    "plain text, nothing to scrub",
    "mail me at jane.doe+spam@mail-host.example.org today",
    "conn 10.0.0.1/22 > 203.0.113.9/443 proto=tcp",
    "a@b.io and c_d%e@f.co plus +44-201-3344556 and 192.168.1.1",
    "",
    "edge: 999.999.999.999 still matches the shape rule",
]


def test_counts_match_python_re(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i: int, t: string")
    got = {
        r["i"]: (r["ne"], r["np"], r["ni"])
        for r in df.select(
            "i",
            PII.pii_count(F.col("t"), PII.EMAIL_RE).alias("ne"),
            PII.pii_count(F.col("t"), PII.PHONE_RE).alias("np"),
            PII.pii_count(F.col("t"), PII.IPV4_RE).alias("ni"),
        ).collect()
    }
    for i, s in enumerate(SAMPLES):
        want = tuple(
            len(re.findall(p, s)) for p in (PII.EMAIL_RE, PII.PHONE_RE, PII.IPV4_RE)
        )
        assert got[i] == want, (i, s, got[i], want)


def test_redaction_matches_python_re(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i: int, t: string")
    got = {
        r["i"]: r["red"]
        for r in df.select("i", PII.redact_pii(F.col("t")).alias("red")).collect()
    }
    for i, s in enumerate(SAMPLES):
        want = s
        for pat, token in PII.REDACTIONS:
            want = re.sub(pat, token, want)
        assert got[i] == want, (i, s)


def test_redaction_removes_all_pii(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t: string")
    red = df.select(PII.redact_pii(F.col("t")).alias("red"))
    leftovers = red.where(
        F.col("red").rlike(PII.EMAIL_RE)
        | F.col("red").rlike(PII.PHONE_RE)
        | F.col("red").rlike(PII.IPV4_RE)
    ).count()
    assert leftovers == 0
