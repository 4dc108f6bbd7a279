"""Round-4 same-window scaling campaign, bench.py-protocol-exact.

Sequence (identical to bench.py's scaling block): host ceilings first
(ballast_probe ALU, mem_probe DRAM bandwidth), then the 32c level (cold JVM,
taskset 0-31, 3 in-process repeats after the same-plan warmup), then the 8c
level (taskset 0-7, SCHED_IDLE ballast on cores 8-31, 3 repeats).  Purpose:
the r04 gate campaign (scale4m_summary.json, eff 0.725) recorded its 32c
level BEFORE the orphaned-spill-dir sweep landed (6e3ff2d) and read 182 s;
the post-sweep spill-attack control read 141 s on the same input — this
re-measures both levels in ONE clean window with the shipped code.

Run: nohup python scripts/campaign_r4b.py > /tmp/campaign_r4b.log 2>&1 &
Writes bench_runs/r04/scale4m_b_{32c,8c,probes,summary}.json
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


def _wait_quiet(max_wait: int = 600, gate: float = 2.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] <= gate:
            return
        time.sleep(15)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    _wait_quiet()
    alu = _probe("ballast_probe.py", "2")
    bw = _probe("mem_probe.py", "64", "2")
    _save("scale4m_b_probes.json", {"alu": alu, "bandwidth": bw})

    _wait_quiet()
    big = _run_pinned(32, repeats=3)
    _save("scale4m_b_32c.json", big)

    _wait_quiet()
    small = _run_pinned(8, repeats=3)
    _save("scale4m_b_8c.json", small)

    thr_b = big["records"] / big["seconds"]
    thr_s = small["records"] / small["seconds"]
    eff = round((thr_b / thr_s) / 4, 3)
    ceiling = bw["bandwidth_ceiling_8_to_32"]
    _save("scale4m_b_summary.json", {
        "protocol": "bench.py-exact: probes, cold JVM per level, taskset, "
                    "page-cache pre-touch, same-plan warmup, best-of-3 "
                    "in-process repeats, SCHED_IDLE ballast on 8c complement",
        "payloads": PAYLOADS,
        "records": big["records"],
        "seconds_32c": big["seconds"],
        "runs_32c": big["runs"],
        "ext_32c": big["external_cores_during_runs"],
        "seconds_8c_ballast": small["seconds"],
        "runs_8c": small["runs"],
        "ext_8c": small["external_cores_during_runs"],
        "throughput_32c_rps": round(thr_b, 1),
        "throughput_8c_rps": round(thr_s, 1),
        "efficiency_8_to_32": eff,
        "host_alu_ceiling_ballast": alu["ceiling_ballast"],
        "host_bandwidth_ceiling": ceiling,
        "efficiency_vs_bandwidth_ceiling": round(eff / ceiling, 3),
    })


if __name__ == "__main__":
    main()
