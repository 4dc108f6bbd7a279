"""Round-5 citation-arm headroom point (round-4 verdict ask #3).

One time-paired round [bw probe, 32c, 8c-ballast, bw probe] of the full
citation pipeline at 10M payloads (~25.5M records) — the size whose r04
32c run (1,069 s, bench_runs/r04/headroom25m_32c.json) predates the final
paired-round protocol and never had an 8c partner. The local dir is
size-gated by cluster_job.py to round-robin tmpfs+disk above 6M payloads
(the all-tmpfs OOM diagnosis, headroom25m_oom_diagnosis.json), so this
also measures the gate ratio under the mixed-dir regime.

Usage: nohup python scripts/campaign_r5_cite25m.py [payloads] [repeats] \
    > /tmp/campaign_r5_cite25m.log 2>&1 &
Writes bench_runs/r05/cite25m_{32c,8c,probes,summary}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r05")
SEED = 42
CORES_BIG, CORES_SMALL = 32, 8
EXT_GATE = 1.5


def _run_pinned(cores: int, payloads: int, repeats: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable,
        os.path.join(REPO, "scripts", "cluster_job.py"),
        str(cores), str(payloads), str(SEED), str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _probe() -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "mem_probe.py"),
         "64", "1"],
        capture_output=True, text=True, check=True,
    )
    p = json.loads(r.stdout.strip().splitlines()[-1])
    return {
        "gbps_8w": p["gbps_8workers_ballast"],
        "gbps_32w": p["gbps_32workers"],
        "ceiling": p["bandwidth_ceiling_8_to_32"],
    }


def _save(name: str, obj: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1)
    print(name, json.dumps(obj)[:400], flush=True)


def main() -> None:
    payloads = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.strftime("%H:%M")

    pre = _probe()
    big = _run_pinned(CORES_BIG, payloads, repeats)
    _save("cite25m_32c.json", big)
    small = _run_pinned(CORES_SMALL, payloads, repeats)
    _save("cite25m_8c.json", small)
    post = _probe()
    _save("cite25m_probes.json", {"pre": pre, "post": post})

    thr_b = big["records"] / big["seconds"]
    thr_s = small["records"] / small["seconds"]
    drift = abs(post["gbps_32w"] - pre["gbps_32w"]) / max(pre["gbps_32w"], 1e-9)
    eff = round((thr_b / thr_s) / 4, 3)
    _save("cite25m_summary.json", {
        "protocol": (
            "one time-paired round [bw probe, 32c, 8c-ballast, bw probe], "
            f"cold JVM per level, taskset, best-of-{repeats}; mixed "
            "tmpfs+disk local dir (size-gated); window "
            f"{t0}-" + time.strftime("%H:%M")
        ),
        "payloads": payloads,
        "records": big["records"],
        "seconds_32c": big["seconds"],
        "seconds_8c_ballast": small["seconds"],
        "runs_32c": big["runs"],
        "runs_8c": small["runs"],
        "ext_32c": big["external_cores_during_runs"],
        "ext_8c": small["external_cores_during_runs"],
        "throughput_32c_rps": round(thr_b, 1),
        "throughput_8c_rps": round(thr_s, 1),
        "efficiency": eff,
        "quiet": bool(
            big["external_cores_best_run"] <= EXT_GATE
            and small["external_cores_best_run"] <= EXT_GATE
        ),
        "bw_before": pre,
        "bw_after": post,
        "window_drift": round(drift, 3),
        "bandwidth_ceiling": round((pre["ceiling"] + post["ceiling"]) / 2, 3),
    })


if __name__ == "__main__":
    main()
