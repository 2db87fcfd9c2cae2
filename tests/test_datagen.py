"""Generator determinism + grammar conformance (SURVEY §5 rebuild plan a)."""

from __future__ import annotations

import re

import numpy as np

from juniper_syslog_filter_spark.datagen import gen_pages_pandas, generate_pages
from juniper_syslog_filter_spark.functions.parse import (
    LOG_BLOCK_PATTERN,
    ROUTING_PATTERN,
)


def test_deterministic_and_partition_independent(spark):
    ids = np.arange(200)
    a = gen_pages_pandas(ids, seed=42)
    b = gen_pages_pandas(ids, seed=42)
    assert (a["html"] == b["html"]).all()
    # Distributed generation matches the local kernel byte-for-byte per url,
    # at two different partition counts.
    for parts in (2, 7):
        dist = (
            generate_pages(spark, 200, seed=42, num_partitions=parts)
            .orderBy("url")
            .collect()
        )
        local = a.sort_values("url").reset_index(drop=True)
        assert len(dist) == 200
        for i, row in enumerate(dist):
            assert row.url == local["url"][i]
            assert bytes(row.html) == local["html"][i]


def test_grammar_embedded(spark):
    pdf = gen_pages_pandas(np.arange(500), seed=42, record_ratio=1.0)
    hits = 0
    for h in pdf["html"]:
        m = re.search(LOG_BLOCK_PATTERN, h.decode("utf-8"))
        assert m is not None
        msg = m.group(4)
        assert re.search(ROUTING_PATTERN, msg)
        assert re.search(r"SeverityLevel=(\d)", msg)
        sev = re.search(r"Severity=(\w+)", msg).group(1)
        assert sev in {"CRITICAL", "WARNING", "INFO", "NOTICE"}
        hits += 1
    assert hits == 500


def test_record_ratio_and_skew():
    pdf = gen_pages_pandas(np.arange(5000), seed=42, record_ratio=0.9)
    with_rec = pdf["html"].map(lambda b: b'<pre class="log">' in b).sum()
    assert 0.85 < with_rec / 5000 < 0.95
    hosts = pdf["url"].str.extract(r"https://([^/]+)/")[0]
    top = hosts.value_counts()
    # Power-law skew: the heaviest host carries far more than uniform share.
    assert top.iloc[0] > 5 * (5000 / hosts.nunique())
