"""Host SMT-mapping diagnostic (no Spark).

The guest advertises 32 single-thread cores (lscpu: Thread(s) per core: 1),
but a KVM host commonly pins vCPU i and vCPU i+16 onto the two SMT threads
of one physical core — a mapping the guest cannot see. This probe detects it
behaviorally: run the same pure-CPU kernel on 8 pinned processes under three
different vCPU sets and compare aggregate throughput.

  spread   = {0..7}            (8 distinct physical cores if siblings are i/i+16)
  paired   = {0,16,1,17,2,18,3,19}  (4 physical cores fully SMT-loaded)
  spread_hi= {8..15}           (control: a different spread octet)

If paired is materially slower (SMT threads share one core's pipelines),
the host maps (i, i+16) as siblings — and an 8-vs-32 scaling comparison
pinned to {0..7} gives the small level BETTER per-vCPU hardware than the
32-vCPU level (where every vCPU shares a physical core), understating
scaling efficiency. The faithful emulation of "N vs 4N executors with
identical per-executor hardware" then pins the small level to SMT-paired
vCPUs. Referenced from BASELINE.md's scaling-protocol section.

Usage: python scripts/smt_probe.py [repeats]  ->  one JSON line.
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
    titles = ["".join(rng.choice(words) for _ in range(6)) for _ in range(2000)]
    barrier.wait()
    t0 = time.time()
    acc = 0.0
    for i in range(ITEMS_PER_PROC):
        acc += jaro_winkler(titles[i % 2000], titles[(i * 7 + 1) % 2000])
    out_q.put((ITEMS_PER_PROC, time.time() - t0, acc))


def run_set(cores: list[int]) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(len(cores))
    procs = [mp.Process(target=_worker, args=(c, barrier, q)) for c in cores]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    slowest = max(r[1] for r in results)
    return len(cores) * ITEMS_PER_PROC / slowest


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sets = {
        "spread_0_7": list(range(8)),
        "paired_4phys": [0, 16, 1, 17, 2, 18, 3, 19],
        "spread_8_15": list(range(8, 16)),
    }
    run_set([0])  # warm imports
    out: dict[str, object] = {}
    # interleave the sets within each repeat so a host-frequency window
    # shift hits all three sets equally
    thr: dict[str, list[float]] = {k: [] for k in sets}
    for _ in range(repeats):
        for k, cores in sets.items():
            thr[k].append(run_set(cores))
    for k in sets:
        out[f"throughput_{k}"] = round(max(thr[k]), 1)
        out[f"all_{k}"] = [round(x, 1) for x in thr[k]]
    ratio = max(thr["paired_4phys"]) / max(thr["spread_0_7"])
    out["paired_over_spread"] = round(ratio, 3)
    out["verdict"] = (
        "host SMT-pairs (i,i+16): paired set is sharing physical cores"
        if ratio < 0.8
        else "no SMT-sibling penalty detected between these sets"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
