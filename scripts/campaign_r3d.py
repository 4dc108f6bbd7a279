"""Round-3 campaign tail: 10M-payload headroom re-run + partition-count A/B.

The first 10M attempt OOM'd: shuffle files from completed stages are only
deleted when driver GC runs (ContextCleaner), the 30-min default periodic GC
outlives a run, and ~100 GB of dead shuffle accumulated on the tmpfs local
dir until the kernel killed the JVM. Two mitigations now in place:

- session.py sets spark.cleaner.periodicGC.interval=60s (live set ~1 stage);
- this campaign additionally splits the local dir across tmpfs + /tmp disk
  (Spark round-robins block dirs), halving tmpfs RAM pressure.

Then the A/B from scripts/ab_partitions.py at the 4M scaling-gate size:
base (shuffle.partitions=32) vs parts128 vs init256 (AQE initialPartitionNum)
— testing whether per-task aggregation state explains the 1.55x per-record
cost rise from 3.06M to 10.2M records.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r03")
EXT_GATE = 1.5


def run_job(cores: int, payloads: int, repeats: int, extra_env: dict | None = None) -> dict:
    env = dict(os.environ, **(extra_env or {}))
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "scripts", "cluster_job.py"),
           str(cores), str(payloads), "42", str(repeats)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, env=env)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print("proc done:", json.dumps(r), flush=True)
    return r


def level(name: str, cores: int, payloads: int, repeats: int,
          extra_env: dict | None = None) -> dict:
    runs = [run_job(cores, payloads, repeats, extra_env)]
    tries = 0
    while tries < 2 and not any(
        r["external_cores_best_run"] <= EXT_GATE for r in runs
    ):
        runs.append(run_job(cores, payloads, repeats, extra_env))
        tries += 1
    quiet = [r for r in runs if r["external_cores_best_run"] <= EXT_GATE]
    best = min(quiet or runs, key=lambda r: r["seconds"])
    best = dict(best, all_processes=[r["runs"] for r in runs],
                all_external=[r["external_cores_during_runs"] for r in runs])
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(best, f)
    print(name, "->", best["seconds"], "ext", best["external_cores_best_run"],
          flush=True)
    return best


def main() -> None:
    split_dirs = {"SPARK_LOCAL_DIRS": "/dev/shm/spark-local,/tmp/spark-local"}
    level("headroom_32c_10M.json", 32, 10_000_000, 2, split_dirs)

    for arm, env in (
        ("parts128", {"SPARK_GRAFT_SHUFFLE_PARTS": "128"}),
        ("init256", {"SPARK_GRAFT_INITIAL_PARTS": "256"}),
    ):
        r = run_job(32, 4_000_000, 2, env)
        with open(os.path.join(OUT, f"ab_4m_{arm}.json"), "w") as f:
            json.dump(dict(r, arm=arm), f)
    print("CAMPAIGN_DONE", flush=True)


if __name__ == "__main__":
    main()
