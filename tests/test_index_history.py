"""Unit tests for the index/history/sweep-line operators: posting-list
build with the df band (skew guard), per-group top n-grams with the
deterministic tie-break, SCD2 validity intervals with the far-future
sentinel, and half-open interval peak concurrency."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from juniper_syslog_filter_spark.operators.history import (
    FAR_FUTURE,
    scd2_intervals,
)
from juniper_syslog_filter_spark.operators.index import (
    inverted_index,
    top_ngrams_per_group,
)
from juniper_syslog_filter_spark.operators.rangejoin import (
    interval_peak_concurrency,
)


def test_inverted_index_postings_sorted_and_band_applied(spark):
    docs = spark.createDataFrame(
        [
            (3, "a b c"),
            (1, "a b"),
            (2, "a c c"),  # repeated term counts once per doc
            (4, "d"),
        ],
        ["doc_id", "text"],
    )
    # dfs: a=3, b=2, c=2, d=1 — band [2, 2] keeps only b and c
    rows = {
        r["term"]: r
        for r in inverted_index(docs, "doc_id", "text", 2, 2).collect()
    }
    assert set(rows) == {"b", "c"}
    assert rows["b"]["df"] == 2 and rows["b"]["postings"] == "1,3"
    assert rows["c"]["df"] == 2 and rows["c"]["postings"] == "2,3"


def test_top_ngrams_tie_break_is_lexicographic(spark):
    df = spark.createDataFrame(
        [("en", ["x y", "a b", "x y", "a b", "m n"])],
        ["lang", "grams"],
    )
    rows = top_ngrams_per_group(df, "lang", F.col("grams"), 2).collect()
    got = [(r["gram"], r["n"], r["rk"]) for r in sorted(rows, key=lambda r: r["rk"])]
    # counts tie at 2 -> "a b" before "x y" lexicographically
    assert got == [("a b", 2, 1), ("x y", 2, 2)]


def test_scd2_runs_and_sentinel(spark):
    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [
            (1, "A", t0, 0),
            (1, "A", t0 + sec, 1),  # same state: folded into the run
            (1, "B", t0 + 2 * sec, 2),
            (1, "A", t0 + 3 * sec, 3),  # A again: NEW run, not merged
            (2, "Z", t0, 4),
        ],
        ["user_id", "state", "ts", "event_id"],
    )
    rows = scd2_intervals(ev, "user_id", "state", "ts", ["event_id"]).collect()
    far = dt.datetime.fromisoformat(FAR_FUTURE)
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["valid_from"])):
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = by_user[1]
    assert [r["state"] for r in u1] == ["A", "B", "A"]
    # intervals tile: each valid_to equals the next valid_from
    assert u1[0]["valid_from"] == t0
    assert u1[0]["valid_to"] == u1[1]["valid_from"] == t0 + 2 * sec
    assert u1[1]["valid_to"] == u1[2]["valid_from"] == t0 + 3 * sec
    assert u1[2]["valid_to"] == far
    assert by_user[2][0]["valid_to"] == far


def test_peak_concurrency_half_open_touching_intervals_dont_overlap(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    iv = spark.createDataFrame(
        [
            # key "u": [0,2) [2,4) touch -> never concurrent (peak from
            # the triple overlap below)
            ("u", t0, t0 + 2 * m, 1),
            ("u", t0 + 2 * m, t0 + 4 * m, 2),
            # triple overlap at minute 5.5
            ("u", t0 + 5 * m, t0 + 7 * m, 3),
            ("u", t0 + 5 * m + m / 2, t0 + 6 * m, 4),
            ("u", t0 + 5 * m + m / 2, t0 + 8 * m, 5),
            # key "v": disjoint singletons
            ("v", t0, t0 + m, 6),
            ("v", t0 + 9 * m, t0 + 10 * m, 7),
        ],
        ["k", "s", "e", "id"],
    )
    rows = {
        r["k"]: r["peak"]
        for r in interval_peak_concurrency(iv, "k", "s", "e", "id").collect()
    }
    assert rows == {"u": 3, "v": 1}
