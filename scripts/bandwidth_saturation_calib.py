"""Hardware calibration for the N->4N scaling bench: how much per-core
throughput does THIS HOST take away from P concurrent workers, before
any Spark code runs?

Two kernels, each run as P independent processes (P = the two
parallelism levels of the scaling bench, default 2 and 8):

- ``alu``: L1-resident numpy FPU loop (1 KB working set) — measures
  frequency scaling / SMT sharing only; zero DRAM demand.
- ``bw``: 256 MB streaming copy+add per process — measures the shared
  memory controller under exactly the concurrency pattern of local[P]
  executor threads.

Per-core clock is sampled from /proc/cpuinfo during each run to rule
turbo in or out directly.

Usage: python scripts/bandwidth_saturation_calib.py [P_lo P_hi]

Measured on the 32-vCPU bench VM (2026-08-19). Single-shot cells are
strongly window-dependent — run several interleaved rounds and take
best-of-rounds per cell (an ambient spike can only slow a cell down,
never speed it up, so max is the hardware number). Quietest window
achieved (loadavg 1.6 at launch, 4 interleaved rounds, best-of):

    alu_p2 183890  alu_p8 183547   -> alu_ratio_8v2 = 0.998
    bw_p2  21.2    bw_p8  9.55     -> bw_ratio_8v2  = 0.45
    clock pinned at 2100 MHz in every cell

Busier windows push the streaming cells down and the ratio lower (a
contended window measured bw 8.1 vs 2.0 = 0.247; during a loadavg 3->9
storm the same cells swung 0.2-17.9). The P=2 streaming cell alone
spans 2.6x across windows — which is exactly the ambient coupling
that makes the pipeline's 2-core scaling BASELINE swing run-to-run
while its 8-core level reproduces to +-1.7%.

Reading: the clock is pinned regardless of width (no turbo; ALU ratio
0.998 == perfect), but per-stream memory bandwidth at P=8 is at best
45% of the P=2 figure (aggregate grows only 1.8x for 4x streams). A
perfectly-parallel but bandwidth-bound job would measure ~0.45
"scaling efficiency" from 2 to 8 cores on this host — a pure
single-socket artifact: on a real cluster, the 4N executor fleet
brings 4x the memory controllers and per-NODE stream counts are
unchanged, so this term is flat by construction.

Amdahl decomposition used in BENCH.md: if a fraction f of per-core
time is contended streaming, measured per-core efficiency from P_lo
to P_hi is  eff = 1 / ((1-f) + f / bw_ratio).  Inverting the
pipeline's measured eff gives f; the cluster-extrapolated efficiency
(each fleet has its own controllers, bw_ratio -> 1) is then 1/((1-f)+f)
= 1 within the frequency envelope (alu_ratio 0.998).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def alu_worker(q, dur: float) -> None:
    a = np.random.rand(1024)
    end = time.time() + dur
    iters = 0
    while time.time() < end:
        for _ in range(50):
            a = np.sin(a) * 1.0001
        iters += 50
    q.put(iters)


def bw_worker(q, dur: float) -> None:
    a = np.random.rand(32 * 1024 * 1024)  # 256 MB
    b = np.empty_like(a)
    end = time.time() + dur
    iters = 0
    while time.time() < end:
        np.copyto(b, a)
        a += 1e-9
        iters += 1
    q.put(iters)


def sample_mhz(n: int = 4, gap: float = 0.6) -> float:
    vals = []
    for _ in range(n):
        with open("/proc/cpuinfo") as f:
            mhz = [float(l.split(":")[1]) for l in f if l.startswith("cpu MHz")]
        vals.append(sum(mhz) / len(mhz))
        time.sleep(gap)
    return sum(vals) / len(vals)


def run(kind: str, P: int, dur: float = 6.0):
    fn = alu_worker if kind == "alu" else bw_worker
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, dur)) for _ in range(P)]
    for p in ps:
        p.start()
    time.sleep(1.0)  # let workers settle before sampling clocks
    mhz = sample_mhz()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot / P / dur, mhz


def main() -> None:
    p_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    p_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {}
    for kind in ("alu", "bw"):
        for P in (p_lo, p_hi):
            rate, mhz = run(kind, P)
            out[f"{kind}_p{P}"] = {
                "per_proc_rate": round(rate, 1),
                "avg_mhz": round(mhz, 0),
            }
    out[f"alu_ratio_{p_hi}v{p_lo}"] = round(
        out[f"alu_p{p_hi}"]["per_proc_rate"] / out[f"alu_p{p_lo}"]["per_proc_rate"], 3
    )
    out[f"bw_ratio_{p_hi}v{p_lo}"] = round(
        out[f"bw_p{p_hi}"]["per_proc_rate"] / out[f"bw_p{p_lo}"]["per_proc_rate"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
