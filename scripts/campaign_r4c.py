"""Round-4 final scaling campaign: shipped defaults, one window.

bench.py-protocol-exact with the session.py GCLocker retry fix as the
shipped default (commit 5aefc2e) and the trimmed best-of-4 budget: host
ceilings first (ballast_probe ALU, mem_probe DRAM bandwidth), then the 32c
level (cold JVM, taskset 0-31, 4 in-process repeats after the same-plan
warmup), then the 8c level (taskset 0-7, SCHED_IDLE ballast on 8-31,
4 repeats).  Purpose: the GCLocker A/B (ab_gclocker_summary.json) measured
its two levels in adjacent-but-separate invocations; this records the
headline pair under the shipped code in one campaign artifact.

Run: nohup python scripts/campaign_r4c.py > /tmp/campaign_r4c.log 2>&1 &
Writes bench_runs/r04/final_{32c,8c,probes,summary}.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r04")
SEED = 42
PAYLOADS = 4_000_000
REPEATS = 4


def _run_pinned(cores: int, repeats: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable,
        os.path.join(REPO, "scripts", "cluster_job.py"),
        str(cores), str(PAYLOADS), str(SEED), str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _probe(script: str, *args: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def _save(name: str, obj: dict) -> None:
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1)
    print(name, json.dumps(obj)[:500], flush=True)


def main() -> None:
    t0 = time.strftime("%H:%M")
    alu = _probe("ballast_probe.py", "2")
    bw = _probe("mem_probe.py", "64", "2")
    _save("final_probes.json", {"alu": alu, "mem": bw})

    big = _run_pinned(32, REPEATS)
    _save("final_32c.json", big)
    small = _run_pinned(8, REPEATS)
    _save("final_8c.json", small)

    thr_big = big["records"] / big["seconds"]
    thr_small = small["records"] / small["seconds"]
    eff = round((thr_big / thr_small) / 4, 3)
    ceiling = bw["bandwidth_ceiling_8_to_32"]
    _save("final_summary.json", {
        "protocol": (
            "shipped defaults (GCLocker retry fix, commit 5aefc2e), "
            "symmetric best-of-4 in-process repeats, cold JVM per level, "
            "taskset pinning, page-cache pre-touch, same-plan warmup, "
            f"SCHED_IDLE ballast on the 8c complement; window {t0}-"
            + time.strftime("%H:%M")
        ),
        "payloads": PAYLOADS,
        "records": big["records"],
        "seconds_32c": big["seconds"],
        "runs_32c": big["runs"],
        "ext_32c": big["external_cores_during_runs"],
        "seconds_8c_ballast": small["seconds"],
        "runs_8c": small["runs"],
        "ext_8c": small["external_cores_during_runs"],
        "throughput_32c_rps": round(thr_big, 1),
        "throughput_8c_rps": round(thr_small, 1),
        "efficiency_8_to_32": eff,
        "host_alu_ceiling_ballast": alu["ceiling_ballast"],
        "host_bandwidth_ceiling": ceiling,
        "host_bandwidth_gbps": {
            "w8": bw["gbps_8workers_ballast"],
            "w32": bw["gbps_32workers"],
        },
        "efficiency_vs_bandwidth_ceiling": round(eff / ceiling, 3),
    })


if __name__ == "__main__":
    main()
