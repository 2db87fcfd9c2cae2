"""Per-stage diagnosis of the scaling bench: run the north-rule pipeline
R times at local[CPUS] with the Spark event log on, then decompose each
run into per-stage wall, task-time sum, executor CPU time, and shuffle
bytes. This separates "the dataflow doesn't scale" from "a host
resource is the floor" — per-stage CPU/wall ratios show whether tasks
are computing or stalled.

Usage: python scripts/diag_stages.py CPUS PAGES_PATH [RUNS]
Prints one JSON line per run with a per-stage breakdown.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from juniper_syslog_filter_spark.pipeline import run_pipeline  # noqa: E402
from juniper_syslog_filter_spark.session import build_session  # noqa: E402


def parse_eventlog(path: str) -> list[dict]:
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                subm = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:48],
                    "tasks": si.get("Number of Tasks"),
                    "wall_s": round((comp - subm) / 1000.0, 1) if subm and comp else None,
                }
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {"stage": sid})
                agg["run_ms"] = agg.get("run_ms", 0) + m.get("Executor Run Time", 0)
                agg["cpu_ms"] = agg.get("cpu_ms", 0) + m.get("Executor CPU Time", 0) // 1_000_000
                agg["gc_ms"] = agg.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                agg["deser_ms"] = agg.get("deser_ms", 0) + m.get("Executor Deserialize Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                agg["shuf_w_mb"] = round(
                    agg.get("shuf_w_mb", 0) + sw.get("Shuffle Bytes Written", 0) / 1e6, 1
                )
                agg["shuf_wr_ms"] = agg.get("shuf_wr_ms", 0) + sw.get("Shuffle Write Time", 0) // 1_000_000
                sr = m.get("Shuffle Read Metrics") or {}
                agg["fetch_ms"] = agg.get("fetch_ms", 0) + sr.get("Fetch Wait Time", 0)
                inm = m.get("Input Metrics") or {}
                agg["in_mb"] = round(agg.get("in_mb", 0) + inm.get("Bytes Read", 0) / 1e6, 1)
                out = m.get("Output Metrics") or {}
                agg["out_mb"] = round(agg.get("out_mb", 0) + out.get("Bytes Written", 0) / 1e6, 1)
    return [stages[k] for k in sorted(stages) if stages[k].get("wall_s")]


def main(cpus: int, pages_path: str, runs: int = 3) -> int:
    log_dir = tempfile.mkdtemp(prefix="diaglog_")
    out_base = tempfile.mkdtemp(prefix="diagout_")
    spark = build_session(
        app_name=f"diag-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            # $JSF_MAXPB: scan split size override — align split count to
            # a multiple of the slot count to kill wave quantization.
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "JSF_MAXPB", str(128 * 1024 * 1024)
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import time

    prev = None
    for i in range(runs):
        if prev:
            shutil.rmtree(prev, ignore_errors=True)
        t0 = time.time()
        run_pipeline(
            spark, pages_path, f"{out_base}/r{i}",
            keyword=None, severity_filter=None, incremental=False,
        )
        wall = time.time() - t0
        print(json.dumps({"cpus": cpus, "run": i, "wall_s": round(wall, 1)}), flush=True)
        prev = f"{out_base}/r{i}"
    spark.stop()
    # one event log for the whole app; stages are globally ordered so
    # runs appear in sequence.
    for p in glob.glob(f"{log_dir}/*"):
        for st in parse_eventlog(p):
            print(json.dumps(st), flush=True)
    shutil.rmtree(out_base, ignore_errors=True)
    shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(
        int(sys.argv[1]), sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) > 3 else 3,
    ))
