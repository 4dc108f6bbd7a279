"""Detached campaign (round-3 close-out):

1. Re-validate the citation-arm scaling gate at the 4M-payload size with the
   CURRENT code (the narrow-verify split d696cf0 landed after the
   scale4m_* campaign; the driver's BENCH_r03 will run the new plan, so the
   committed artifact must be measured on the same plan).
   -> bench_runs/r03/scale4m_32c_narrow.json / scale4m_8c_narrow.json
      / scale4m_narrow_summary.json

2. Code-arm scaling campaign (north_rule's own input shape): probe the
   throughput at 32c on a mid-size corpus, pick num_origins so the 32-core
   wall is ~350-500 s (same fixed-cost discipline as the citation arm: the
   per-job core-count-independent time must be a small share of the measured
   window or the ratio reads the constant, not the job), then measure
   32c (3 repeats) and 8c (2 repeats) on the same input.
   -> bench_runs/r03/code_probe_32c.json, code_scale_32c.json,
      code_scale_8c.json, code_scale_summary.json

Run: nohup python scripts/campaign_r3f.py > /tmp/campaign_r3f.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r03")
SEED = 42


def _run(script: str, cores: int, size: int, repeats: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable,
        os.path.join(REPO, "scripts", script),
        str(cores), str(size), str(SEED), str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _save(name: str, obj: dict) -> None:
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1)
    print(name, json.dumps(obj)[:400], flush=True)


def _wait_quiet(max_wait: int = 900, gate: float = 2.0) -> None:
    """Block until machine loadavg drops under `gate` (bounded)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] <= gate:
            return
        time.sleep(20)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # ---- 1. citation arm, current code, 4M payloads ----
    _wait_quiet()
    big = _run("cluster_job.py", 32, 4_000_000, repeats=3)
    _save("scale4m_32c_narrow.json", big)
    _wait_quiet()
    small = _run("cluster_job.py", 8, 4_000_000, repeats=2)
    _save("scale4m_8c_narrow.json", small)
    thr_b = big["records"] / big["seconds"]
    thr_s = small["records"] / small["seconds"]
    _save("scale4m_narrow_summary.json", {
        "payloads": 4_000_000,
        "records": big["records"],
        "throughput_32c_rps": round(thr_b, 1),
        "throughput_8c_rps": round(thr_s, 1),
        "seconds_32c": big["seconds"],
        "seconds_8c": small["seconds"],
        "external_cores_best": [big["external_cores_best_run"],
                                small["external_cores_best_run"]],
        "efficiency": round((thr_b / thr_s) / 4, 3),
    })

    # ---- 2. code arm: probe then campaign ----
    _wait_quiet()
    probe = _run("code_cluster_job.py", 32, 150_000, repeats=2)
    _save("code_probe_32c.json", probe)
    # pick origins for a ~420 s 32-core wall, capped to keep the 8c level
    # under ~35 min; files-per-origin ~4.05
    fps = probe["files"] / probe["seconds"]
    target_origins = int(min(2_000_000, max(
        150_000, 420 * fps / 4.05)))
    # round to 10k for reproducible corpus paths
    target_origins = (target_origins // 10_000) * 10_000
    print("target_origins", target_origins, flush=True)

    _wait_quiet()
    cbig = _run("code_cluster_job.py", 32, target_origins, repeats=3)
    _save("code_scale_32c.json", cbig)
    _wait_quiet()
    csmall = _run("code_cluster_job.py", 8, target_origins, repeats=2)
    _save("code_scale_8c.json", csmall)
    thr_b = cbig["files"] / cbig["seconds"]
    thr_s = csmall["files"] / csmall["seconds"]
    _save("code_scale_summary.json", {
        "num_origins": target_origins,
        "files": cbig["files"],
        "throughput_32c_fps": round(thr_b, 1),
        "throughput_8c_fps": round(thr_s, 1),
        "seconds_32c": cbig["seconds"],
        "seconds_8c": csmall["seconds"],
        "external_cores_best": [cbig["external_cores_best_run"],
                                csmall["external_cores_best_run"]],
        "efficiency": round((thr_b / thr_s) / 4, 3),
    })


if __name__ == "__main__":
    main()
