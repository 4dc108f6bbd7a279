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


def _worker(core: int, out_q) -> None:
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
    t0 = time.time()
    acc = 0.0
    for i in range(ITEMS_PER_PROC):
        a = titles[i % 2000]
        b = titles[(i * 7 + 1) % 2000]
        acc += jaro_winkler(a, b)
    out_q.put((ITEMS_PER_PROC, time.time() - t0, acc))


def run_level(nproc: int) -> float:
    """Returns aggregate items/sec across nproc pinned processes."""
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(i, q)) for i in range(nproc)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    total_items = sum(r[0] for r in results)
    return total_items / wall


def main() -> None:
    # warm one proc (imports, pyc)
    run_level(1)
    thr8 = run_level(8)
    thr32 = run_level(32)
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
