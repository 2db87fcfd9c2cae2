"""Parse-stage throughput at realistic Common-Crawl page sizes.

The synthetic driver pages are ~364 B, which understates the value of
the JVM-side first-marker narrowing in ``parse_pages`` (functions/
parse.py): at real 10-100 KB pages the Arrow IPC + Python decode bytes
are dominated by the html prefix before the log block. This script pads
each generated page with ``--prefix-bytes`` of incompressible-ish ASCII
(per-page sha2 chains, so parquet can't dictionary-collapse it), writes
the padded table, and times ``parse_pages`` end-to-end on local[N].

Usage: python scripts/bench_pagesize.py [--rows 100000]
         [--prefix-bytes 19200] [--cpus 32] [--runs 4]

Prints one JSON line:
  {"metric": "parse_pages_padded", "avg_html_bytes": ..., "walls": [...],
   "best_sec": ..., "pages_per_sec": ..., "rows": ..., "cpus": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--prefix-bytes", type=int, default=19_200)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from juniper_syslog_filter_spark.datagen import write_pages
    from juniper_syslog_filter_spark.functions.parse import parse_pages
    from juniper_syslog_filter_spark.session import build_session

    spark = build_session(
        app_name="bench-pagesize",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # NB: `from __future__ import annotations` stringifies hints, which
    # pandas_udf type inference rejects — declare the eval type explicitly.
    _warm = F.pandas_udf(lambda s: s, "long", F.PandasUDFType.SCALAR)

    spark.range(1_000_000).repartition(args.cpus).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    tmp = tempfile.mkdtemp(prefix="bench_pagesize_")
    try:
        raw = os.path.join(tmp, "raw")
        padded = os.path.join(tmp, "padded")
        write_pages(spark, raw, args.rows, num_partitions=args.cpus)
        n_chunks = max(1, args.prefix_bytes // 64)  # sha2-256 hex = 64 chars
        pfx = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_chunks - 1)),
                lambda i: F.sha2(F.concat(F.col("url"), i.cast("string")), 256),
            ),
        )
        (
            spark.read.parquet(raw)
            .withColumn("html", F.concat(F.encode(pfx, "UTF-8"), F.col("html")))
            .write.mode("overwrite")
            .parquet(padded)
        )
        pg = spark.read.parquet(padded)
        avg_bytes = pg.select(F.avg(F.length("html"))).first()[0]

        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            parse_pages(pg).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        best = min(walls)
        print(
            json.dumps(
                {
                    "metric": "parse_pages_padded",
                    "avg_html_bytes": round(avg_bytes, 1),
                    "walls": walls,
                    "best_sec": best,
                    "pages_per_sec": round(args.rows / best, 1),
                    "rows": args.rows,
                    "cpus": args.cpus,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
