"""A/B the aggregation-parallelism hypothesis for the 4M-payload slowdown.

Per-record cost rises ~1.55x going 3.06M -> 10.2M records (37.7k -> 24.2k
rec/s at 32 cores) although every pipeline volume (tier keys, pairs, edges)
scales linearly — the suspect is per-task aggregation state: at
shuffle.partitions = 32, the ~220M-row tier-key groupBy holds ~7M rows of
(bounded) collect_list state per task (14M at the 8-core level's 16
partitions), crossing from in-memory hash aggregation into sort/spill merge
passes.

Two knobs, both honored by biblib_spark.session.get_spark:
  partsN -> SPARK_GRAFT_SHUFFLE_PARTS=N   (raise sql.shuffle.partitions)
  initN  -> SPARK_GRAFT_INITIAL_PARTS=N   (AQE initialPartitionNum: shuffles
            START wide, AQE coalesces small stages back to advisory size —
            the idiomatic fix that should not slow the many small stages)
  base   -> defaults (shuffle.partitions = cores)

Usage: python scripts/ab_partitions.py <cores> <payloads> <arm...>
e.g.   python scripts/ab_partitions.py 32 4000000 base parts128 init256

Runs scripts/cluster_job.py once per arm (cold process, taskset-pinned, same
warmup/meter protocol) and prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def arm_env(arm: str) -> dict:
    env = dict(os.environ)
    if arm.startswith("parts"):
        env["SPARK_GRAFT_SHUFFLE_PARTS"] = arm[len("parts"):]
    elif arm.startswith("init"):
        env["SPARK_GRAFT_INITIAL_PARTS"] = arm[len("init"):]
    elif arm != "base":
        raise SystemExit(f"unknown arm {arm!r} (want base|partsN|initN)")
    return env


def main() -> None:
    cores = int(sys.argv[1])
    payloads = int(sys.argv[2])
    arms = sys.argv[3:] or ["base", "parts128", "init256"]
    results = {}
    for arm in arms:
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
               os.path.join(REPO, "scripts", "cluster_job.py"),
               str(cores), str(payloads), "42", "2"]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             env=arm_env(arm))
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results[arm] = r
        print(json.dumps({"arm": arm, **r}), flush=True)
    best = min(results, key=lambda a: results[a]["seconds"])
    print(json.dumps({"best_arm": best,
                      "seconds": {a: r["seconds"] for a, r in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
