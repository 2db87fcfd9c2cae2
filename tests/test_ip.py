"""IP classifier tests — the reference's boundary table verbatim
(tests/test_classify_ip.py:38-67) against BOTH the Catalyst expression and
the driver-local twin."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from juniper_syslog_filter_spark.functions.ip import (
    classify_ip_address,
    classify_ip_expr,
    classify_ips,
    is_private_ip,
)

CASES = [
    ("10.0.0.1", "private"),
    ("10.255.255.255", "private"),
    ("172.16.0.1", "private"),
    ("172.31.255.255", "private"),
    ("172.15.0.1", "global"),
    ("172.32.0.1", "global"),
    ("192.168.0.1", "private"),
    ("192.168.255.254", "private"),
    ("192.167.0.1", "global"),
    ("8.8.8.8", "global"),
    ("203.0.113.10", "global"),
    ("", ""),
    ("   ", ""),
    ("invalid", "global"),
    ("1.2.3", "global"),
    ("1.2.3.4.5", "global"),
    ("256.1.1.1", "global"),
    ("10.0.0.256", "global"),
    ("-1.2.3.4", "global"),
    ("a.b.c.d", "global"),
    ("010.0.0.1", "private"),  # int("010") == 10 in both engines
]


@pytest.mark.parametrize("ip,expected", CASES)
def test_local_twin(ip, expected):
    assert classify_ip_address(ip) == expected


def test_expression_matches_reference_table(spark):
    pdf = pd.DataFrame({"ip": [c[0] for c in CASES]})
    out = (
        spark.createDataFrame(pdf)
        .select("ip", classify_ip_expr(F.col("ip")).alias("t"))
        .collect()
    )
    got = {r.ip: r.t for r in out}
    for ip, expected in CASES:
        assert got[ip] == expected, ip


def test_null_ip_maps_to_empty(spark):
    df = spark.createDataFrame([(None,)], "ip string")
    assert df.select(classify_ip_expr(F.col("ip")).alias("t")).collect()[0].t == ""


def test_classify_ips_column_order(spark):
    """Column-order contract (reference tests/test_classify_ip.py:121-133)."""
    df = spark.createDataFrame(
        [("t", "h", "a", "10.0.0.1 > 8.8.8.8", "10.0.0.1", "8.8.8.8", "m")],
        "Timestamp string, Hostname string, AppName string, routing string, srcIP string, dstIP string, Message string",
    )
    out = classify_ips(df)
    assert out.columns == [
        "Timestamp",
        "Hostname",
        "AppName",
        "routing",
        "srcIP",
        "srcIP_type",
        "dstIP",
        "dstIP_type",
        "Message",
    ]
    r = out.collect()[0]
    assert r.srcIP_type == "private" and r.dstIP_type == "global"


def test_is_private_matches_twin(spark):
    ips = [c[0] for c in CASES]
    for ip in ips:
        py = is_private_ip(ip)
        assert (classify_ip_address(ip) == "private") == py
