"""As-of join tests: inclusive boundary, tie-break, no-match drop,
carry-forward across multiple left rows."""

from __future__ import annotations

from juniper_syslog_filter_spark.operators.asof import asof_join

RIGHT = [
    # key, ts, payload(orderkey)
    (1, 10, 100),
    (1, 20, 200),
    (1, 20, 201),  # tie on ts → greatest orderkey wins
    (2, 50, 500),
]
LEFT = [
    # id, key, ts
    (1, 1, 5),    # before any right row → dropped (inner as-of)
    (2, 1, 10),   # equal ts → inclusive match 100
    (3, 1, 15),   # carry-forward 100
    (4, 1, 20),   # tie at 20 → 201
    (5, 1, 99),   # latest overall → 201
    (6, 2, 49),   # before key-2's only row → dropped
    (7, 2, 50),   # → 500
    (8, 3, 50),   # key with no right rows → dropped
]


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(LEFT, "id long, k long, ts long")
    right = spark.createDataFrame(RIGHT, "rk long, rts long, orderkey long")
    out = asof_join(
        left, right,
        left_key="k", right_key="rk", left_ts="ts", right_ts="rts",
        payload_cols=["orderkey"], tie_col="orderkey",
    )
    got = {r.id: r.orderkey for r in out.collect()}
    assert got == {2: 100, 3: 100, 4: 201, 5: 201, 7: 500}


def test_asof_join_single_shuffle_no_pair_explosion(spark):
    """The plan must be union+window (one exchange on the key), not a
    range join: no Join node at all in the physical plan."""
    left = spark.createDataFrame(LEFT, "id long, k long, ts long")
    right = spark.createDataFrame(RIGHT, "rk long, rts long, orderkey long")
    out = asof_join(
        left, right,
        left_key="k", right_key="rk", left_ts="ts", right_ts="rts",
        payload_cols=["orderkey"], tie_col="orderkey",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
