"""Grouped Arrow-UDF surfaces — completing the custom-UDF matrix.

The engine already exercises scalar ``pandas_udf`` (functions/*),
``mapInPandas`` (sources + dedup kernels) and
``applyInPandasWithState`` (streaming.py). This module covers the
remaining three Spark surfaces a pipeline author reaches for
(SURVEY.md §2.8):

* ``groupBy().applyInPandas``          — grouped MAP (whole group in,
  frame out): per-group model fits, normalizations;
* ``pandas_udf`` grouped AGGREGATE     — Series → scalar inside
  ``groupBy().agg`` alongside built-ins;
* ``cogroup().applyInPandas``          — two grouped sides streamed to
  one kernel: per-key merges (as-of, interval align) in pandas.

Scale contract, stated plainly: these shapes shuffle each GROUP to one
task and hold ONE group's frame in memory. They are the right tool
when the group count is large and each group is bounded (sources,
hosts, users) — the grouped-map stage parallelizes across groups and
per-task memory is the largest group. For unbounded groups (the whole
corpus under one key) use the declarative window/aggregate forms
instead; nothing here is used in the north-rule hot path.

Engine parity: the OLS kernel computes its moments in EXACT integer
arithmetic and derives floats through single pinned-order divisions,
so a SQL twin restating the same integer moments gets bit-identical
doubles (same discipline as operators/similarity._l2sq). The median is
the LOWER median — an element of the data, exact in int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_residuals(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y ~ x`` via
    ``applyInPandas``; emits each row's residual.

    Float determinism: moments Σx, Σy, Σxy, Σx² are exact int64 sums
    (inputs are integers; Python ints after ``.sum()`` — no overflow);
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` is ONE double division
    of exactly-representable integers, ``intercept = (Σy − slope·Σx)/n``
    and ``resid = y − (intercept + slope·x)`` keep a pinned association
    order — a SQL twin stating the same expressions is bit-identical.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(np.int64)
        y = pdf[y_col].to_numpy(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
        intercept = (float(sy) - slope * float(sx)) / float(n)
        resid = y.astype(np.float64) - (intercept + slope * x.astype(np.float64))
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "resid": resid}
        )

    return df.groupBy(group_col).applyInPandas(
        fit, schema=f"{id_col} long, {group_col} string, resid double"
    )


def lower_median_udf():
    """Grouped-AGGREGATE pandas UDF: the lower median (element at
    1-based rank ``(n+1)//2`` of the ascending sort) — an actual
    element of the data, exact in int64, no midpoint averaging to race
    across engines. Usable in ``groupBy().agg`` beside built-ins."""

    def med(s: pd.Series) -> int:
        a = np.sort(s.to_numpy(np.int64))
        return int(a[(len(a) - 1) // 2])

    return F.pandas_udf(med, "long")


def group_count_udf():
    """Series→scalar count as a grouped-agg pandas UDF — exists because
    Spark disallows mixing group-agg pandas UDFs with built-in
    aggregates in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT), so any
    companion statistic must itself be a pandas aggregate."""

    def cnt(s: pd.Series) -> int:
        return len(s)

    return F.pandas_udf(cnt, "long")


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_col: str,
    id_col: str,
) -> DataFrame:
    """As-of merge via ``cogroup().applyInPandas``: for each left row,
    the right side's ``payload_col`` at the greatest ``right_ts`` ≤
    ``left_ts`` (ties → greatest payload); left rows with no match are
    dropped. Semantically the w4 as-of join — here executed as a
    per-key pandas ``merge_asof`` to exercise the cogroup surface: both
    sides shuffle ONCE on the key and each key's pair of frames streams
    through the kernel. Right side is renamed to the left key before
    grouping."""

    r = right.select(
        F.col(right_key).alias(key),
        F.col(right_ts).alias("_rts"),
        F.col(payload_col),
    )
    l = left.select(id_col, key, F.col(left_ts).alias("_lts"))

    def merge(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty or rf.empty:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 key: pd.Series(dtype="int64"),
                 payload_col: pd.Series(dtype="int64")}
            )
        lf = lf.sort_values("_lts", kind="mergesort")
        rf = rf.sort_values(["_rts", payload_col], kind="mergesort")
        lf["_lts"] = pd.to_datetime(lf["_lts"])
        rf["_rts"] = pd.to_datetime(rf["_rts"])
        out = pd.merge_asof(
            lf, rf[["_rts", payload_col]],
            left_on="_lts", right_on="_rts", direction="backward",
        )
        out = out.dropna(subset=[payload_col])
        return pd.DataFrame(
            {id_col: out[id_col].astype("int64"),
             key: out[key].astype("int64"),
             payload_col: out[payload_col].astype("int64")}
        )

    return (
        l.groupBy(key)
        .cogroup(r.groupBy(key))
        .applyInPandas(
            merge, schema=f"{id_col} long, {key} long, {payload_col} long"
        )
    )
