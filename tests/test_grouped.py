"""Grouped Arrow-UDF surfaces (operators/grouped.py): grouped-map OLS,
grouped-agg lower median, cogrouped as-of merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from juniper_syslog_filter_spark.operators.grouped import (
    cogroup_asof,
    group_count_udf,
    lower_median_udf,
    ols_residuals,
)

SF = "/root/testdata/sf0.001"


def test_ols_exact_fit_gives_zero_residuals(spark):
    """y = 3x + 7 exactly → every residual is exactly 0.0 (the integer
    moment arithmetic guarantees it, no epsilon needed)."""
    rows = [(i, "a", i, 3 * i + 7) for i in range(10)] + [
        (100 + i, "b", i, 5 * i + 1) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, x long, y long")
    out = ols_residuals(df, "grp", "x", "y", "id").collect()
    assert len(out) == 18
    assert all(r.resid == 0.0 for r in out)


def test_ols_partitioning_independent(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").alias("x"),
        (F.col("id") * 2 + F.col("id") % 7).alias("y"),
    )
    a = {r.id: r.resid for r in ols_residuals(df, "grp", "x", "y", "id").collect()}
    b = {
        r.id: r.resid
        for r in ols_residuals(df.repartition(7), "grp", "x", "y", "id").collect()
    }
    assert a == b


def test_lower_median_even_and_odd(spark):
    df = spark.createDataFrame(
        [("a", v) for v in (10, 20, 30, 40)] + [("b", v) for v in (5, 1, 9)],
        "grp string, v long",
    )
    med = lower_median_udf()
    cnt = group_count_udf()
    got = {
        r.grp: (r.m, r.n)
        for r in df.groupBy("grp").agg(med("v").alias("m"), cnt("v").alias("n")).collect()
    }
    # even count -> LOWER median (20, not 25); odd -> middle element
    assert got == {"a": (20, 4), "b": (5, 3)}


def test_cogroup_asof_matches_declarative_asof(spark):
    """The cogrouped pandas merge must equal the w4 union-sort-window
    as-of join on the same inputs."""
    from juniper_syslog_filter_spark.datagen import load_table
    from juniper_syslog_filter_spark.operators.asof import asof_join

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, SF, "orders")
    got = {
        r.event_id: r.o_orderkey
        for r in cogroup_asof(
            ev, orders,
            key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            payload_col="o_orderkey", id_col="event_id",
        ).collect()
    }
    want = {
        r.event_id: r.o_orderkey
        for r in asof_join(
            ev, orders,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            payload_cols=["o_orderkey"], tie_col="o_orderkey",
        ).collect()
        if r.o_orderkey is not None
    }
    assert got == want


def test_cogroup_asof_empty_right_group_drops_rows(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-02 00:00:00"), (2, 20, "2024-01-02 00:00:00")],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01", 77)], "o_custkey long, o_orderdate string, o_orderkey long"
    ).select("o_custkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderkey")
    out = cogroup_asof(
        left, right,
        key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload_col="o_orderkey", id_col="event_id",
    ).collect()
    assert {(r.event_id, r.o_orderkey) for r in out} == {(1, 77)}
