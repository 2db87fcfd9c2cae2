"""State-history operators — SCD2 validity intervals over a stream.

``scd2_intervals`` compacts a per-key event stream into the
slowly-changing-dimension type-2 form: one row per state RUN (maximal
span of consecutive equal states), carrying ``valid_from`` (first
event of the run) and ``valid_to`` (start of the next run, or a
far-future sentinel for the current state). This is the history twin
of keep-latest compaction (u2): latest-state keeps row N, SCD2 keeps
every change point with its validity window.

Execution shape: two window passes over the SAME partitioning
(``key``, ordered by the total order ``order_cols``) — lag to mark
change points, filter, lead to close the intervals. Spark plans one
Exchange + one sort; the second window reuses the first's ordering
(no re-shuffle, no re-sort: same partition keys, same sort keys).
At 100 TB this is the minimal shape — one shuffle of the raw stream,
keyed by entity, and the output is the (much smaller) change-point
set.

The far-future sentinel (9999-12-31) rather than NULL keeps the
output hash-stable across engines and makes range predicates
(``valid_from <= t < valid_to``) work without null branches —
standard warehouse SCD2 practice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FAR_FUTURE = "9999-12-31 00:00:00"


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    order_cols: Sequence[Column | str] = (),
) -> DataFrame:
    """One row per maximal run of equal ``state_col`` per ``key_col``.

    ``order_cols`` must extend ``ts_col`` to a total order within each
    key (e.g. a unique event id) so run boundaries are deterministic.
    Returns ``(key, state, valid_from, valid_to)`` with ``valid_to``
    of the final run pinned to :data:`FAR_FUTURE`.
    """
    order = [F.asc(ts_col)] + [
        c if isinstance(c, Column) else F.asc(c) for c in order_cols
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = df.withColumn(
        "_prev", F.lag(state_col).over(w)
    ).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))
    )
    # second pass: same partitioning+ordering — Catalyst reuses the sort
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changes.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col).alias("valid_from"),
        F.coalesce(
            F.lead(ts_col).over(w2),
            F.lit(FAR_FUTURE).cast("timestamp"),
        ).alias("valid_to"),
    )
