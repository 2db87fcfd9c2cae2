"""One scaling-bench trial: run the north-rule pipeline at a given core
count in THIS process's fresh JVM and print a JSON result line.

Usage: python scripts/bench_scaling_worker.py CPUS PAGES_PATH OUT_DIR [N_TIMED]

Run via subprocess by scripts/bench_scaling.py so each parallelism level
gets its own JVM (`local[N]` is fixed at session creation). N_TIMED
(default 4) is the timed-run count — large inputs amortize host stalls
over minutes of runtime, so 2 timed runs suffice there while small
inputs need min-of-4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from juniper_syslog_filter_spark.pipeline import run_pipeline  # noqa: E402
from juniper_syslog_filter_spark.session import build_session  # noqa: E402


def main(cpus: int, pages_path: str, out_dir: str, n_timed: int = 4) -> int:
    # $JSF_MAXPB: scan split size override. The generator writes equal
    # 64-file inputs; the default 128 MB split packs them into a ragged
    # split count (e.g. 21 for 2.6 GB → 3 uneven waves on 8 slots, a
    # measured ~9% wall tax at the 4N level). Setting the split size to
    # one file yields a split count divisible by every slot count, so
    # both levels run whole waves. At real scale the same knob aligns
    # splits to the cluster's total slot count.
    extra = {}
    if os.environ.get("JSF_MAXPB"):
        extra["spark.sql.files.maxPartitionBytes"] = os.environ["JSF_MAXPB"]
    spark = build_session(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up (JVM JIT, codegen, Python worker pool, OS page cache): run
    # the full pipeline once untimed, then measure the second run. Both
    # parallelism levels get the identical treatment, so the ratio is
    # fair and the fixed spin-up cost doesn't bias against the 4N run.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # $JSF_WARMUP_PATH: optional smaller input for the untimed warm-up —
    # the warm-up exists to exercise JIT/codegen/Python-worker spin-up
    # and heap first-touch, which a quarter-size input does equally well
    # at a fraction of the wall (a full-input warm-up at local[2] costs
    # ~30 min by itself). Timed runs always read the real input.
    warm_path = os.environ.get("JSF_WARMUP_PATH", pages_path)
    t0 = time.time()
    run_pipeline(
        spark, warm_path, out_dir + "_warmup",
        keyword=None, severity_filter=None, incremental=False,
    )
    warmup = time.time() - t0

    # Several timed runs, report the min: the host shows multi-second
    # exogenous stalls (shared VM) and lazy heap faulting that keeps
    # improving over the first few runs; min-of-N estimates the
    # machine's steady-state capability at each parallelism level.
    # Each timed run must start from the same disk state: at large inputs
    # a run leaves ~GBs of dirty pages whose background writeback bleeds
    # into the NEXT run's wall (measured: 0.37 "efficiency" at 64M pages
    # purely from cross-run writeback + page-cache pressure). Deleting
    # the previous run's output before starting cancels most of that
    # writeback (unflushed deleted pages never reach disk).
    walls = []
    prev_out = out_dir + "_warmup"
    for i in range(n_timed):
        shutil.rmtree(prev_out, ignore_errors=True)
        # Old runs' shuffle files are only deleted once the JVM GCs their
        # ShuffleDependency; in a tight loop they pile up on the same disk
        # the sink writes to. Nudge the cleaner between (not during) runs.
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        res = run_pipeline(
            spark, pages_path, f"{out_dir}_r{i}",
            keyword=None, severity_filter=None, incremental=False,
        )
        walls.append(time.time() - t0)
        prev_out = f"{out_dir}_r{i}"
    print(json.dumps({
        "cpus": cpus,
        "wall_sec": round(min(walls), 3),
        "walls": [round(w, 3) for w in walls],
        "warmup_sec": round(warmup, 3),
        "rows_routed": res.rows_routed,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(
        int(sys.argv[1]), sys.argv[2], sys.argv[3],
        int(sys.argv[4]) if len(sys.argv) > 4 else 4,
    ))
