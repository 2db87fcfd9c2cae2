"""Table-layer tests (parquet fallback path; Iceberg branch is gated on
the runtime jar, absent in this sandbox)."""

from __future__ import annotations

from juniper_syslog_filter_spark.tables import have_iceberg, read_table, write_table


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [("CRITICAL", "en", 1), ("WARNING", "de", 2), ("CRITICAL", "de", 3)],
        "Severity string, lang string, v int",
    )
    path = str(tmp_path / "t")
    write_table(df, path, ["Severity", "lang"], mode="replace")
    back = read_table(spark, path)
    assert back.count() == 3
    assert {tuple(r) for r in back.select("Severity", "lang", "v").collect()} == {
        ("CRITICAL", "en", 1), ("WARNING", "de", 2), ("CRITICAL", "de", 3),
    }


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    path = str(tmp_path / "t2")
    base = spark.createDataFrame(
        [("CRITICAL", 1), ("WARNING", 2)], "Severity string, v int"
    )
    write_table(base, path, ["Severity"], mode="replace")
    # re-write only the CRITICAL partition with a new value
    delta = spark.createDataFrame([("CRITICAL", 9)], "Severity string, v int")
    write_table(delta, path, ["Severity"], mode="overwrite_partitions")
    got = {tuple(r) for r in read_table(spark, path).select("Severity", "v").collect()}
    assert got == {("CRITICAL", 9), ("WARNING", 2)}


def test_have_iceberg_is_false_in_sandbox(spark):
    assert have_iceberg(spark) is False
