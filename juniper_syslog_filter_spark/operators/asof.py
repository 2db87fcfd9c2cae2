"""As-of (point-in-time) join — a time-series operator Spark lacks as a
built-in (reference has none either; this is part of the training-data/
telemetry surface the rebuild adds).

Semantics: for each left row, attach the payload of the LAST right row
with the same key whose timestamp is <= the left timestamp; ties on the
right timestamp resolve to the greatest tie-break column. Rows with no
prior right match are dropped (inner as-of).

Scale design: the naive formulation is an inequality join (left × every
earlier right row per key — quadratic per key, and Spark would execute
key-equi + ts-range as a join with a residual filter, exploding on hot
keys). This implementation is the standard union-sort-window shape
instead: tag both sides, union, ONE shuffle on the key, and a running
``last(payload, ignorenulls)`` over (ts, side, tie) ordering carries the
newest right payload forward to each left row — O(n log n) per key,
skew-bounded by the window sort, no pair explosion. DuckDB's native
ASOF JOIN is deliberately NOT the oracle (its right-timestamp ties are
unspecified); the oracle is an explicit row_number formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Inner as-of join; returns all left columns + ``payload_cols``.

    ``tie_col`` must be one of ``payload_cols`` (or the right ts) and
    unique per (key, ts) for fully deterministic output.
    """
    payload = F.struct(
        F.col(right_ts).alias("_pts"), *[F.col(c) for c in payload_cols]
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        payload.alias("_rv"),
    )
    l_cols = left.columns
    lft = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *l_cols,
    )
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1) → the
    # match is inclusive (right_ts <= left_ts); among equal right ts the
    # greatest _tie sorts last and wins.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lft.unionByName(r.select(*lft.columns[:5], *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols])) \
        .withColumn("_last_rv", F.last("_rv", ignorenulls=True).over(w))
    return (
        carried.filter((F.col("_side") == 1) & F.col("_last_rv").isNotNull())
        .select(*l_cols, *[F.col(f"_last_rv.{c}").alias(c) for c in payload_cols])
    )
