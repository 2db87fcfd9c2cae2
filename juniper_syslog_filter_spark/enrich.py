"""Enrich stage: broadcast lookup joins + IP classification.

Reference Phase 6 (modules/classify_ip.py:104-206) plus the north rule's
"broadcast lookup join enriches each record with severity-class and device
metadata". Both dimensions are tiny (8 and ~1k rows) → ``F.broadcast`` is
mandatory, not advisory: at 100 TB a shuffle join here would move the
entire fact table for a kilobyte of dimension data.

Empty-string discipline: left joins can introduce nulls for unmatched
keys; every enrich output column is wrapped in ``coalesce(_, "")``
(reference never emits nulls, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.ip import classify_ips


def enrich_severity(records: DataFrame, severity_dim: DataFrame) -> DataFrame:
    """Broadcast-join severity name → (level, class).

    Adds ``severity_class`` and ``severity_level_ref``; unmatched
    severities get "" / null-level (reference rows always match — the dim
    is the closed RFC-5424 set, scripts/genarate_logs.py:69-78).
    """
    dim = severity_dim.select(
        F.col("severity").alias("_sev_key"),
        F.col("severity_level").alias("severity_level_ref"),
        F.col("severity_class"),
    )
    out = records.join(
        F.broadcast(dim), records["Severity"] == dim["_sev_key"], "left"
    ).drop("_sev_key")
    return out.withColumn("severity_class", F.coalesce("severity_class", F.lit("")))


def enrich_device(records: DataFrame, device_dim: DataFrame) -> DataFrame:
    """Broadcast-join hostname → device metadata (site, model)."""
    dim = device_dim.select(
        F.col("hostname").alias("_host_key"),
        F.col("site"),
        F.col("model"),
    )
    out = records.join(
        F.broadcast(dim), records["Hostname"] == dim["_host_key"], "left"
    ).drop("_host_key")
    return out.withColumn("site", F.coalesce("site", F.lit(""))).withColumn(
        "model", F.coalesce("model", F.lit(""))
    )


def enrich(records: DataFrame, severity_dim: DataFrame, device_dim: DataFrame) -> DataFrame:
    """Full enrich: IP classify (pure expressions) + both broadcast joins."""
    return enrich_device(enrich_severity(classify_ips(records), severity_dim), device_dim)
