"""Decompose the 2-vs-8-core scaling loss: which stage stops scaling?

Runs THREE variants of the north-rule job at one core count in a fresh
JVM and prints per-variant walls (min of N_TIMED):

  compute  parse→enrich→count (observe-only; no shuffle, no sink)
  shuffle  parse→enrich→route_repartition→count (adds the wide exchange)
  full     run_pipeline (adds the partitioned parquet sink + agg/lineage)

Usage: python scripts/scaling_decompose.py CPUS PAGES_PATH [N_TIMED]

Compare the per-variant efficiency between two invocations (e.g. 2 and
8 cores) to attribute the loss: if `compute` scales ~1.0 but `full`
doesn't, the single-VM shared disk — not the dataflow — is the ceiling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from juniper_syslog_filter_spark.pipeline import (  # noqa: E402
    build_routed,
    route_repartition,
    run_pipeline,
)
from juniper_syslog_filter_spark.session import build_session  # noqa: E402


def main(cpus: int, pages_path: str, n_timed: int = 2) -> int:
    extra = {}
    if os.environ.get("JSF_MAXPB"):
        extra["spark.sql.files.maxPartitionBytes"] = os.environ["JSF_MAXPB"]
    spark = build_session(
        app_name=f"decomp-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.environ.get("JSF_WARMUP_PATH", pages_path)

    def timed(fn, warm_fn) -> list[float]:
        warm_fn()
        walls = []
        for _ in range(n_timed):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        return walls

    def compute(path):
        return lambda: build_routed(spark, spark.read.parquet(path)).agg(
            F.count(F.lit(1))
        ).collect()

    def shuffled(path):
        def go():
            df = route_repartition(build_routed(spark, spark.read.parquet(path)))
            df.write.format("noop").mode("overwrite").save()
        return go

    out_root = tempfile.mkdtemp(prefix=f"decomp{cpus}_")

    def full(path, tag):
        def go():
            out = os.path.join(out_root, tag)
            shutil.rmtree(out, ignore_errors=True)
            run_pipeline(spark, path, out, incremental=False)
        return go

    res = {
        "cpus": cpus,
        "compute": timed(compute(pages_path), compute(warm)),
        "shuffle": timed(shuffled(pages_path), shuffled(warm)),
        "full": timed(full(pages_path, "t"), full(warm, "w")),
    }
    shutil.rmtree(out_root, ignore_errors=True)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(
        int(sys.argv[1]), sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    ))
