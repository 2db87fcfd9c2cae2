"""Table layer: Iceberg when the runtime is present, parquet otherwise.

The north rule targets Iceberg tables; this sandbox ships no
iceberg-spark-runtime jar (checked: /opt/spark/jars), so every pipeline
sink goes through this thin seam instead of hard-coding either format.
On a cluster with Iceberg configured (catalog ``spark_catalog`` or any
custom catalog), pass ``catalog.db.table`` identifiers and the same
calls become Iceberg DSv2 writes — partitioned, snapshot-isolated, with
``overwritePartitions()`` giving the idempotent batch replacement the
checkpoint protocol needs (checkpoint.py docstring, step 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 - Py4J raises wrapped JVM errors
        return False


def _is_path(identifier: str) -> bool:
    return "/" in identifier or identifier.startswith("file:")


def write_table(
    df: DataFrame,
    identifier: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite_partitions",
) -> None:
    """Write a table by identifier (Iceberg) or path (parquet fallback).

    ``mode``: 'overwrite_partitions' (idempotent batch replace),
    'append', or 'replace' (full overwrite).
    """
    spark = df.sparkSession
    partition_cols = partition_cols or []
    if not _is_path(identifier) and have_iceberg(spark):
        from pyspark.sql.functions import col

        writer = df.writeTo(identifier)
        if partition_cols:
            writer = writer.partitionedBy(*[col(c) for c in partition_cols])
        if mode == "append":
            writer.append()
        elif mode == "replace":
            writer.createOrReplace()
        else:
            writer.overwritePartitions()
        return
    # Parquet path fallback: dynamic partition overwrite ≈ overwritePartitions.
    if mode == "overwrite_partitions":
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = df.write.mode("append" if mode == "append" else "overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(identifier)


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    if not _is_path(identifier) and have_iceberg(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)
