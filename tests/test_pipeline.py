"""End-to-end pipeline tests: per-sink counts vs a pandas oracle, routed
row-set equality, aggregate==sink-count invariant, idempotent resume."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from juniper_syslog_filter_spark.datagen import (
    gen_pages_pandas,
    severity_dim,
    write_pages,
)
from juniper_syslog_filter_spark.enrich import enrich_severity
from juniper_syslog_filter_spark.functions import parse as P
from juniper_syslog_filter_spark.functions.ip import classify_ip_address
from juniper_syslog_filter_spark.pipeline import run_pipeline

N = 2000


def _oracle(pdf: pd.DataFrame, keyword=None, severity=None) -> pd.DataFrame:
    """Independent pandas re-implementation of parse→enrich→route."""
    rows = []
    block = re.compile(P.LOG_BLOCK_PATTERN)
    for _, r in pdf.iterrows():
        m = block.search(r["html"].decode("utf-8"))
        if not m:
            continue
        msg = m.group(4)
        if keyword is not None and keyword not in msg:
            continue
        rt = re.search(P.ROUTING_PATTERN, msg)
        sev = re.search(P.SEVERITY_PATTERN, msg)
        sev = sev.group(1) if sev else ""
        if severity is not None and sev != severity:
            continue
        rows.append(
            {
                "url": r["url"],
                "lang": r["lang"],
                "date": pd.Timestamp(r["warc_ts"]).date(),
                "Severity": sev,
                "srcIP": rt.group(1) if rt else "",
                "dstIP": rt.group(2) if rt else "",
                "srcIP_type": classify_ip_address(rt.group(1) if rt else ""),
                "dstIP_type": classify_ip_address(rt.group(2) if rt else ""),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages(spark, path, N, seed=42, num_partitions=6)
    return path


def test_pipeline_counts_and_rowsets(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")
    res = run_pipeline(spark, pages_path, out)
    oracle = _oracle(gen_pages_pandas(np.arange(N), seed=42))

    assert res.rows_routed == len(oracle)

    routed = spark.read.parquet(res.routed_path)
    # routed-row set equality (north rule): compare sorted url sets + IP types.
    got = routed.select("url", "Severity", "srcIP_type", "dstIP_type").toPandas()
    got = got.sort_values("url").reset_index(drop=True)
    exp = oracle[["url", "Severity", "srcIP_type", "dstIP_type"]].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    # aggregate == per-sink counts, exactly (north rule).
    agg = spark.read.parquet(res.agg_path).toPandas()
    exp_agg = (
        oracle.groupby(["Severity", "lang", "date"]).size().reset_index(name="n")
    )
    merged = agg.merge(
        exp_agg,
        left_on=["severity", "lang", "date"],
        right_on=["Severity", "lang", "date"],
        how="outer",
        suffixes=("_got", "_exp"),
    )
    assert (merged["n_got"] == merged["n_exp"]).all()
    # and the physical sink partitions carry the same counts
    sink_counts = routed.groupBy("Severity", "lang").count().collect()
    exp_sink = oracle.groupby(["Severity", "lang"]).size().to_dict()
    for r in sink_counts:
        assert exp_sink[(r.Severity, r.lang)] == r["count"]


def test_keyword_and_severity_params(spark, pages_path, tmp_path):
    out = str(tmp_path / "out_kw")
    res = run_pipeline(
        spark, pages_path, out, keyword="RT_IDP_ATTACK", severity_filter="CRITICAL"
    )
    oracle = _oracle(
        gen_pages_pandas(np.arange(N), seed=42),
        keyword="RT_IDP_ATTACK",
        severity="CRITICAL",
    )
    assert res.rows_routed == len(oracle)
    routed = spark.read.parquet(res.routed_path)
    assert routed.count() == len(oracle)
    assert set(r.url for r in routed.select("url").collect()) == set(oracle["url"])


def test_idempotent_resume(spark, pages_path, tmp_path):
    out = str(tmp_path / "out_resume")
    res1 = run_pipeline(spark, pages_path, out)
    total = spark.read.parquet(res1.routed_path).count()

    # Second run: nothing pending → no-op, no duplicates.
    res2 = run_pipeline(spark, pages_path, out)
    assert res2.units_processed == 0
    assert spark.read.parquet(res1.routed_path).count() == total

    # Lineage rows exist with per-unit metrics.
    log = spark.read.parquet(f"{out}/_checkpoint")
    assert log.count() == res1.units_processed
    assert log.agg(F.sum("rows_routed")).collect()[0][0] == total


def test_crash_between_write_and_commit_replaces_not_duplicates(
    spark, pages_path, tmp_path
):
    """The idempotency protocol's crash window (checkpoint.py:9-19): a
    batch that dies AFTER the fan-out write but BEFORE the checkpoint
    commit must be replaced, never duplicated, on re-run — the pending
    set is unchanged, so the deterministic batch id recurs and dynamic
    partition overwrite swaps the same batch partitions."""
    import glob
    import os

    out = str(tmp_path / "out_crash")
    res1 = run_pipeline(spark, pages_path, out)
    total = spark.read.parquet(res1.routed_path).count()
    assert total == res1.rows_routed

    # Simulate the crash: sink data landed, commit file(s) never did.
    commits = glob.glob(f"{out}/_checkpoint/*.parquet")
    assert commits, "expected at least one commit file"
    for c in commits:
        os.remove(c)

    res2 = run_pipeline(spark, pages_path, out)
    assert res2.units_processed == res1.units_processed  # full replay
    assert res2.batch_id == res1.batch_id  # deterministic batch key
    # Replaced, not duplicated: exactly N rows, and agg matches the sink.
    assert spark.read.parquet(res2.routed_path).count() == total
    agg_total = spark.read.parquet(res2.agg_path).agg(F.sum("n")).collect()[0][0]
    assert agg_total == total


def test_incremental_new_files_only(spark, tmp_path):
    """New files appended to the source are processed as their own batch;
    old batches are untouched (idempotent, no duplication)."""
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    from juniper_syslog_filter_spark.datagen import generate_pages

    generate_pages(spark, 500, seed=42, num_partitions=2).write.mode("overwrite").parquet(src)
    res1 = run_pipeline(spark, src, out)
    n1 = spark.read.parquet(f"{out}/routed").count()

    generate_pages(spark, 300, seed=7, num_partitions=1).write.mode("append").parquet(src)
    res2 = run_pipeline(spark, src, out)
    assert res2.units_processed >= 1
    n2 = spark.read.parquet(f"{out}/routed").count()
    assert n2 == n1 + res2.rows_routed
    # Aggregates across batches sum to the sink total.
    agg_total = (
        spark.read.parquet(f"{out}/agg").agg(F.sum("n")).collect()[0][0]
    )
    assert agg_total == n2


def test_enrich_severity_dim(spark):
    df = spark.createDataFrame(
        [("CRITICAL",), ("DEBUG",), ("",)], "Severity string"
    )
    out = enrich_severity(df, severity_dim(spark)).collect()
    got = {r.Severity: (r.severity_class, r.severity_level_ref) for r in out}
    assert got["CRITICAL"] == ("critical-band", 2)
    assert got["DEBUG"] == ("info-band", 7)
    assert got[""] == ("", None)
