"""Memory-bandwidth ceiling probe: STREAM-triad-shaped, pinned, 8 vs 32.

cpu_probe.py measures the host's pure-ALU scaling ceiling (jaro over short
strings — register/L1 resident, no DRAM traffic). This probe measures the
OTHER hardware ceiling this box imposes: each worker streams a numpy triad
(a = b + s*c) over arrays far beyond L3, so per-worker throughput is DRAM
bandwidth, which on one socket does NOT grow 4x when 8 pinned workers
become 32. The 8->32 efficiency of this kernel is the bandwidth ceiling
any shuffle/join/spill-heavy stage is bounded by on this single box — on a
real N -> 4N EXECUTOR cluster the memory channels scale with the executor
count and this ceiling does not apply.

The measured job sits between the two probes: its per-stage event-log
profile (scripts/stage_profile.py + stage_compare.py) shows pure-Python
parse stages at ~1.0x CPU-time parity across core counts and the big
shuffle stages at 1.5-2.8x CPU-time inflation at 32c — i.e. the job's
scaling ceiling is a mix of the ALU ceiling (~0.85-1.0 under ballast) and
this bandwidth ceiling.

Usage: python scripts/mem_probe.py [mb_per_worker] [repeats]
Prints one JSON line. Frequency discipline: the 8-worker level runs under
SCHED_IDLE ballast on the complement cores (pure-ALU spinners do not touch
DRAM, so they pin clocks without stealing the measured resource).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ballast import ballast_on, complement_of  # noqa: E402


def _worker(core: int, mb: int, iters: int, barrier, out) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    n = mb * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.zeros(n)
    # touch everything once (page-in), then synchronize
    a += b + 2.0 * c
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(iters):
        np.add(b, c, out=a)      # a = b + c      (3 streams)
        np.multiply(a, 0.5, out=a)  # a *= s      (2 streams)
    dt = time.perf_counter() - t0
    # bytes moved: (read b + read c + write a) + (read a + write a)
    moved = iters * (3 + 2) * n * 8
    out.put(moved / dt / 1e9)


def run_level(cores: list[int], mb: int, iters: int) -> float:
    """Aggregate GB/s across one pinned worker per core."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(len(cores))
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(c, mb, iters, barrier, q))
        for c in cores
    ]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ncpu = os.cpu_count() or 32
    eight = list(range(8))
    full = list(range(ncpu))
    res: dict[str, list[float]] = {"bw8": [], "bw32": []}
    iters = 20
    for _ in range(repeats):
        with ballast_on(complement_of(eight)):
            res["bw8"].append(run_level(eight, mb, iters))
        res["bw32"].append(run_level(full, mb, iters))
    best8, best32 = max(res["bw8"]), max(res["bw32"])
    print(
        json.dumps(
            {
                "kernel": "numpy triad, %d MiB/worker (beyond L3)" % mb,
                "gbps_8workers_ballast": round(best8, 1),
                "gbps_32workers": round(best32, 1),
                "all": {k: [round(x, 1) for x in v] for k, v in res.items()},
                "speedup_8_to_32": round(best32 / best8, 3),
                "bandwidth_ceiling_8_to_32": round(best32 / best8 / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
