"""Banded time-range join — interval joins without pair explosion.

A time-range join with no equi-key ("rows within the last W of each
row") is a scale-killer if written naively: Spark plans a pure
inequality join as BroadcastNestedLoopJoin — O(n·m) pairs and an
un-splittable broadcast. The banded form quantizes time into
window-sized bins so the range predicate becomes an EQUI-join on the
bin plus an exact residual filter:

- every right row lands in exactly ONE bin (no duplicate counting);
- a left row's half-open window ``[t - W, t)`` spans exactly TWO
  consecutive bins, so the left side explodes 2× and joins on the bin;
- the join is an ordinary shuffled hash/sort-merge join — partitioned,
  AQE-splittable on hot bins, candidates O(n · per-bin density) — and
  the residual micros comparison restores exact window semantics.

This is the standard range-join bin optimization (as in Databricks'
``range_join`` hint and Flink's interval join). Bin arithmetic is
integer-exact: ``(us - us % W) / W`` divides an exact multiple of W,
so the double division is exact — no boundary misbinning.

The reference repo has no time-range surface; this belongs to the
added telemetry/training-data family (with the as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prior_window_count(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    window_sec: int,
    out_col: str = "n_prior",
) -> DataFrame:
    """For every row: the count of rows (any key) whose timestamp lies
    in the half-open window ``[ts - window_sec, ts)``. Returns
    (``id_col``, ``out_col``) with zeros preserved — equivalent to the
    SQL inequality self-join ``LEFT JOIN ON r.ts >= l.ts - W AND
    r.ts < l.ts`` aggregated per left row, at O(n·density) cost."""
    w_us = window_sec * 1_000_000
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # integer-exact bin: subtract the remainder first so the division's
    # dividend is an exact multiple of w_us (see module docstring)
    bin_of = lambda us: ((us - F.pmod(us, F.lit(w_us))) / w_us).cast("long")  # noqa: E731
    right = df.select(micros.alias("_rus")).withColumn("_bin", bin_of(F.col("_rus")))
    left = (
        df.select(F.col(id_col), micros.alias("_lus"))
        .withColumn("_b", bin_of(F.col("_lus")))
        .select(
            id_col,
            "_lus",
            F.explode(F.array(F.col("_b") - 1, F.col("_b"))).alias("_bin"),
        )
    )
    in_window = (F.col("_rus") >= F.col("_lus") - w_us) & (
        F.col("_rus") < F.col("_lus")
    )
    # LEFT join keeps empty-window rows; the conditional sum (not a
    # filter+count) keeps their zero counts without a second join back.
    return (
        left.join(right, "_bin", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(in_window, 1).otherwise(0)).alias(out_col)
        )
    )


def interval_peak_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    out_col: str = "peak",
) -> DataFrame:
    """Per-key peak number of simultaneously-open intervals — the
    sweep-line census (half-open ``[start, end)`` semantics).

    Each interval contributes a ``+1`` delta at ``start`` and a ``-1``
    at ``end``; a running sum over the per-key total order
    ``(t, delta, id)`` is the live concurrency after each boundary, and
    its max is the peak. Ordering ``delta`` ascending puts the ``-1``
    of an interval ending at *t* BEFORE the ``+1`` of one starting at
    *t* — exactly half-open semantics — and ``id`` makes the order
    total, so the running sum (and therefore the peak) is
    deterministic on any engine.

    Scale shape: the sweep is keyed — one Exchange on ``key_col``,
    per-key sort, running-sum window, max aggregate reusing the same
    partitioning. No self-join, no pair explosion: O(n log n) per key
    versus the O(n·density) of the banded-join count above, which is
    why concurrency censuses sweep instead of join. A GLOBAL (unkeyed)
    sweep would serialize into one task — at scale, range-partition by
    time and stitch boundary sums (documented here as the upgrade
    path; the keyed form covers the per-entity telemetry question).
    """
    deltas = df.select(
        F.col(key_col).alias("_k"),
        F.col(start_col).alias("_t"),
        F.lit(1).alias("_d"),
        F.col(id_col).alias("_id"),
    ).unionAll(
        df.select(
            F.col(key_col).alias("_k"),
            F.col(end_col).alias("_t"),
            F.lit(-1).alias("_d"),
            F.col(id_col).alias("_id"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_d"), F.asc("_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    live = deltas.withColumn("_live", F.sum("_d").over(w))
    return live.groupBy(F.col("_k").alias(key_col)).agg(
        F.max("_live").cast("long").alias(out_col)
    )
