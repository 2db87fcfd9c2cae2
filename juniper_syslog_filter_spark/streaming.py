"""Structured Streaming surface: the same parse→enrich→route dataflow
over an unbounded file source.

The reference's only "streaming" is the Phase-1 consume-one-ZIP-and-
delete loop (run.py:75-103) — a hand-rolled at-most-once file queue.
Structured Streaming's file source is its principled replacement:
exactly-once tracking of processed files in the checkpoint log (the
streaming analogue of our batch CheckpointTable), automatic discovery of
new files, and the identical transformation chain — ``parse_pages`` and
``enrich`` are reused verbatim, since mapInPandas and stream-static
broadcast joins are both streaming-capable.

Late data: the windowed aggregate applies a watermark on ``warc_ts``;
closed windows are emitted append-mode (no updates to published rows —
what a downstream Iceberg sink needs).

Scale notes: the file source lists incrementally (maxFilesPerTrigger
bounds micro-batch size → bounded executor memory at any input rate);
state for the windowed agg is per (window, Severity, lang) — tiny. The
fan-out parquet sink partitions by the same route keys as the batch
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .datagen import PAGES_SCHEMA, device_dim, severity_dim
from .enrich import enrich
from .functions.parse import parse_pages
from .pipeline import ROUTE_KEYS


def read_pages_stream(
    spark: SparkSession,
    pages_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a pages directory (parquet file source)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_path)


def stream_routed(
    spark: SparkSession,
    pages: DataFrame,
    keyword: str | None = None,
    severity_filter: str | None = None,
) -> DataFrame:
    """parse→enrich over a streaming pages frame — same operators as the
    batch path (pipeline.build_routed), minus file-path lineage (the
    streaming checkpoint log owns per-file progress instead)."""
    records = parse_pages(pages, keyword=keyword, with_lineage=False)
    out = enrich(records, severity_dim(spark), device_dim(spark))
    if severity_filter is not None:
        out = out.filter(F.col("Severity") == severity_filter)
    return out


def windowed_severity_counts(
    records: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time windowed per-sink counts with late-data bound — the
    streaming twin of pipeline.aggregate_counts."""
    return (
        records.withWatermark("warc_ts", watermark_delay)
        .groupBy(
            F.window("warc_ts", window_duration).alias("win"),
            F.col("Severity").alias("severity"),
            F.col("lang"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            "severity",
            "lang",
            "n",
        )
    )


def start_routed_sink(
    routed: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Fan-out parquet sink partitioned by the route keys; exactly-once
    via the streaming checkpoint + file-sink manifest."""
    writer = (
        routed.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy(*ROUTE_KEYS)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_agg_sink(
    agg: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Append-mode sink for the windowed aggregate (closed windows only,
    as bounded by the watermark)."""
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_once(
    spark: SparkSession,
    pages_path: str,
    output_dir: str,
    keyword: str | None = None,
    severity_filter: str | None = None,
) -> dict[str, int]:
    """Drain all currently-available input (availableNow) through the
    routed sink; returns row counts per sink stage. Re-running after new
    files arrive processes only the delta (checkpoint log) — the
    streaming counterpart of pipeline.run_pipeline's resume."""
    pages = read_pages_stream(spark, pages_path)
    routed = stream_routed(
        spark, pages, keyword=keyword, severity_filter=severity_filter
    )
    q = start_routed_sink(
        routed, f"{output_dir}/routed", f"{output_dir}/_ckpt_routed"
    )
    q.awaitTermination()
    n_routed = spark.read.parquet(f"{output_dir}/routed").count()
    return {"rows_routed": n_routed}
