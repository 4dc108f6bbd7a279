"""Host CPU-scaling ceiling probe (no Spark).

Measures a pure-Python CPU workload (the same jaro kernel the verify stage
runs) under multiprocessing at 8 and 32 pinned processes on this box. Spark
is absent, shuffles are absent, the work is embarrassingly parallel — so the
ratio printed here is the HARDWARE ceiling (shared memory bus / SMT /
frequency scaling) that any 8-vs-32-core comparison on this single VM is
bounded by. Referenced from BASELINE.md's scaling-efficiency caveat.

Usage: python scripts/cpu_probe.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITEMS_PER_PROC = 40_000


def _worker(core: int, barrier, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import random

    from biblib_spark.kernels.similarity import jaro_winkler

    rng = random.Random(core)
    words = [
        "analysis", "treatment", "renal", "outcomes", "clinical",
        "randomized", "cohort", "imaging", "vascular", "protein",
    ]
    titles = [
        "".join(rng.choice(words) for _ in range(6)) for _ in range(2000)
    ]
    # barrier AFTER imports + setup: process spawn and the numpy/pandas
    # import storm must not leak into the measured compute window (they
    # contend harder at 32 procs than at 8, which biased earlier probes)
    barrier.wait()
    t0 = time.time()
    acc = 0.0
    for i in range(ITEMS_PER_PROC):
        a = titles[i % 2000]
        b = titles[(i * 7 + 1) % 2000]
        acc += jaro_winkler(a, b)
    out_q.put((ITEMS_PER_PROC, time.time() - t0, acc))


def run_level(nproc: int) -> float:
    """Aggregate items/sec across nproc pinned processes, compute window
    only (all workers barrier-synced past imports before the clock starts;
    level throughput = total items / slowest worker)."""
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(nproc)
    procs = [
        mp.Process(target=_worker, args=(i, barrier, q)) for i in range(nproc)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    slowest = max(r[1] for r in results)
    total_items = sum(r[0] for r in results)
    return total_items / slowest


def main() -> None:
    # warm one proc (imports, pyc)
    run_level(1)
    # interleaved best-of-3 per level: host throughput drifts +-15% on
    # minutes-apart windows even at zero external load
    thr8 = max(run_level(8) for _ in range(3))
    thr32 = max(run_level(32) for _ in range(3))
    print(
        json.dumps(
            {
                "workload": "pure-python jaro_winkler, pinned multiprocessing",
                "items_per_proc": ITEMS_PER_PROC,
                "throughput_8proc": round(thr8, 1),
                "throughput_32proc": round(thr32, 1),
                "speedup_8_to_32": round(thr32 / thr8, 3),
                "efficiency_8_to_32": round((thr32 / thr8) / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
