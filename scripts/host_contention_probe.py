"""Measure per-core throughput degradation vs host load — the evidence
behind BENCH.md's choice of parallelism levels for the scaling bench.

Two probes, each a pinned single-thread workload timed alone and then
alongside K busy "spinner" cores:

- ``cpu``: a pure-Python integer loop (cache-resident, no syscalls) —
  sensitive to SMT sharing / turbo downclocking, blind to memory.
- ``mem``: a 200 MB numpy streaming pass (far beyond L3) — sensitive to
  the host's aggregate memory bandwidth; spinners stream memory too.

Usage: python scripts/host_contention_probe.py [cpu|mem|both]

Measured on the 32-vCPU bench VM (2026-08-17):

    cpu: spinners=0 0.467s, =11 0.503s, =23 0.492s, =29 0.511s
         -> <= 1.09x at 30 busy cores: SMT/turbo effects are negligible.
    mem: spinners=0 0.201s, =11 0.229s, =23 0.306s
         -> 1.52x at 24 busy cores: the host tops out around
         24 x 0.2 GB / 0.306 s ~= 16 GB/s aggregate; per-core
         memory-streaming throughput falls ~35% once ~24 cores stream.

Consequence for scaling benches on this host: the pipeline's dominant
stage is memory-streaming (regex parse over strings + Arrow IPC), so
any parallelism level whose host-core footprint approaches ~24 busy
cores is bandwidth-capped and under-reports the dataflow's scaling —
an artifact of the single shared memory controller that a real cluster
does not have (4N executors bring 4N memory controllers). Both levels
of an N->4N comparison must stay well below the ceiling.
"""

from __future__ import annotations

import subprocess
import sys
import time


def cpu_work(n: int = 4_000_000) -> int:
    s = 0
    for i in range(n):
        s += i * i ^ (i >> 3)
    return s


def best_of(fn, reps: int = 5) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_probe(kind: str, spinner_counts=(0, 11, 23)) -> None:
    if kind == "cpu":
        spin_cmd = ["bash", "-c", "while :; do :; done"]
        probe = cpu_work
    else:
        import numpy as np

        a = np.random.randint(0, 255, 200_000_000, dtype=np.uint8)
        spin_cmd = [
            sys.executable, "-c",
            "import numpy as np\n"
            "a = np.random.randint(0, 255, 200_000_000, dtype=np.uint8)\n"
            "while True: ((a >> 2) + 7).sum()",
        ]

        def probe() -> int:
            return int(((a >> 2) + 7).sum())

    for k in spinner_counts:
        procs = [
            subprocess.Popen(["taskset", "-c", str(i + 1), *spin_cmd])
            for i in range(k)
        ]
        try:
            time.sleep(6 if kind == "mem" else 1)  # let mem spinners allocate
            print(f"{kind} spinners={k} best={best_of(probe):.4f}s", flush=True)
        finally:
            for p in procs:
                p.kill()
            for p in procs:
                p.wait()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    # Pin the probe itself to core 0 (spinners take 1..K).
    import os

    os.sched_setaffinity(0, {0})
    for kind in (["cpu", "mem"] if which == "both" else [which]):
        run_probe(kind)
