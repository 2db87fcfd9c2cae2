"""Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency N→4N).

No real cluster exists in this sandbox, so per the round contract the
same job runs at two parallelism levels — ``local[N]`` and ``local[4N]``
— in FRESH subprocess JVMs over the SAME pre-generated pages parquet,
and we report throughput at both plus strong-scaling efficiency::

    eff = (pages_per_sec@4N) / (4 × pages_per_sec@N)

Usage: python scripts/bench_scaling.py [N] [N_PAGES]
Defaults: N=8 (→ 8 vs 32 cores), 1,000,000 pages.

Prints one JSON line; paste it into BENCH.md's scaling section.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")


def run_worker(cpus: int, pages_path: str, out_dir: str, n_timed: int = 4) -> dict:
    proc = subprocess.run(
        [sys.executable, "scripts/bench_scaling_worker.py", str(cpus), pages_path, out_dir, str(n_timed)],
        capture_output=True, text=True, check=False,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"worker local[{cpus}] failed")
    lines = proc.stdout.strip().splitlines()
    for ln in lines[:-1]:  # pass through phase-trace lines etc.
        print(f"  [worker {cpus}] {ln}", flush=True)
    return json.loads(lines[-1])


def main(n: int = 8, n_pages: int = 1_000_000, rounds: int = 2, n_timed: int = 4) -> int:
    """rounds × interleaved A/B workers per level for small inputs;
    large inputs (≥10 M pages) amortize per-run host stalls, so one
    round suffices — but each worker still needs min-of-4 timed runs
    because a fresh JVM warms in over several executions (BENCH.md)."""
    tmp = tempfile.mkdtemp(prefix="scaling_")
    pages_path = os.path.join(tmp, "pages")
    try:
        # Generate once; both trials read the identical files. Generator
        # output is partition-count-independent (datagen.py), so content
        # is the same regardless of how it was produced. Run in a
        # subprocess so its JVM fully exits before the timed trials
        # (spark.stop() leaves the py4j gateway JVM alive in-process).
        proc = subprocess.run(
            [sys.executable, "-m", "juniper_syslog_filter_spark", "gen",
             "--rows", str(n_pages), "--out", pages_path, "--partitions", "64"],
            capture_output=True, text=True, check=False,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError("generation failed")

        # Interleaved A/B trials, min per level: the host has exogenous
        # multi-second stalls, and a single polluted trial at either
        # level produces nonsense ratios (observed 0.17x AND 5.2x for
        # the same code). Each worker is itself warm-up + min-of-2.
        lo_trials, hi_trials = [], []
        for r in range(rounds):
            lo_trials.append(run_worker(n, pages_path, os.path.join(tmp, f"out{n}_{r}"), n_timed))
            hi_trials.append(run_worker(4 * n, pages_path, os.path.join(tmp, f"out{4 * n}_{r}"), n_timed))
        lo = min(lo_trials, key=lambda d: d["wall_sec"])
        hi = min(hi_trials, key=lambda d: d["wall_sec"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    thr_lo = n_pages / lo["wall_sec"]
    thr_hi = n_pages / hi["wall_sec"]
    eff = thr_hi / (4.0 * thr_lo)
    assert lo["rows_routed"] == hi["rows_routed"], "row counts must match across parallelism"
    print(json.dumps({
        "metric": "scaling_efficiency_Nx4",
        "n_pages": n_pages,
        "rows_routed": lo["rows_routed"],
        "cpus_lo": n,
        "cpus_hi": 4 * n,
        "wall_lo_sec": lo["wall_sec"],
        "wall_hi_sec": hi["wall_sec"],
        "pages_per_sec_lo": round(thr_lo, 1),
        "pages_per_sec_hi": round(thr_hi, 1),
        "speedup": round(thr_hi / thr_lo, 3),
        "efficiency": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # n_timed stays 4 at every size: a fresh JVM warms in over several
    # full runs (see BENCH.md), so min-of-2 still measures the VM.
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else (1 if pages >= 10_000_000 else 2)
    n_timed = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    sys.exit(main(n, pages, rounds, n_timed))
