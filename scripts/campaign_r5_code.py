"""Round-5 code-arm scaling campaign: time-paired rounds, shipped defaults.

The citation-arm protocol (bench.py) applied to the code-clone pipeline:
each round is [DRAM probe, 32c level, 8c level, DRAM probe], every level a
cold JVM (scripts/code_cluster_job.py) pinned with taskset, the 8c level
under SCHED_IDLE ballast on the complement cores, best-of-N in-process
repeats with the external-load meter per run. A round is USABLE when both
levels' best runs were externally quiet AND the bookend bandwidth probes
agree within 12% (the host's DRAM state drifts 15-30% between ~30-minute
windows — bench_runs/r04/scale6m_summary.json rationale). The r04 code
measurement (code_scale3m_gclocker_summary.json) had neither pairing nor
probes; this campaign closes that gap at the fixed-cost-clearing input
size per the round-4 verdict.

Usage:
  python scripts/campaign_r5_code.py <origins> <tag> [rounds] [repeats]
e.g.
  nohup python scripts/campaign_r5_code.py 3600000 6m 1 1 \
      > /tmp/campaign_r5_code_6m.log 2>&1 &

Writes bench_runs/r05/code_scale<tag>_round<i>_{32c,8c,probes}.json and
code_scale<tag>_summary.json.
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
EXT_GATE = float(os.environ.get("SPARK_GRAFT_EXT_GATE", "1.5"))


def _run_pinned(cores: int, origins: int, repeats: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable,
        os.path.join(REPO, "scripts", "code_cluster_job.py"),
        str(cores), str(origins), str(SEED), str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _probe(script: str, *args: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def _bw_quick() -> dict:
    p = _probe("mem_probe.py", "64", "1")
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


def _round(origins: int, repeats: int, tag: str, i: int) -> dict:
    t0 = time.strftime("%H:%M")
    pre = _bw_quick()
    # alternate level order per round: this host's DRAM state has been
    # observed to degrade MONOTONICALLY over multi-hour stretches
    # (bench_runs/r05 probes: 32w 272 -> 186 GB/s across one evening), and
    # with a fixed big-first order every round's 8c level eats the worse
    # window — inflating the ratio the same flattering way each time. An
    # 8c-first round carries the opposite bias, so a drift-stable pick
    # that clears the gate in BOTH orders is credible where a single
    # order's never is.
    if i % 2 == 0:
        big = _run_pinned(CORES_BIG, origins, repeats)
        _save(f"code_scale{tag}_round{i}_32c.json", big)
        small = _run_pinned(CORES_SMALL, origins, repeats)
        _save(f"code_scale{tag}_round{i}_8c.json", small)
    else:
        small = _run_pinned(CORES_SMALL, origins, repeats)
        _save(f"code_scale{tag}_round{i}_8c.json", small)
        big = _run_pinned(CORES_BIG, origins, repeats)
        _save(f"code_scale{tag}_round{i}_32c.json", big)
    # settle before the closing probe: the probe fired seconds after JVM
    # teardown measures page-reclaim churn, not the window (observed as a
    # halved 8w reading right after the 8c level, twice)
    time.sleep(75)
    post = _bw_quick()
    _save(f"code_scale{tag}_round{i}_probes.json", {"pre": pre, "post": post})
    thr_b = big["files"] / big["seconds"]
    thr_s = small["files"] / small["seconds"]
    drift = abs(post["gbps_32w"] - pre["gbps_32w"]) / max(pre["gbps_32w"], 1e-9)
    return {
        "window": f"{t0}-{time.strftime('%H:%M')}",
        "order": "32c-first" if i % 2 == 0 else "8c-first",
        "files": big["files"],
        "seconds_big": big["seconds"],
        "seconds_small": small["seconds"],
        "runs_big": big["runs"],
        "runs_small": small["runs"],
        "external_cores_big": big["external_cores_during_runs"],
        "external_cores_small": small["external_cores_during_runs"],
        "throughput_big_fps": round(thr_b, 1),
        "throughput_small_fps": round(thr_s, 1),
        "efficiency": round((thr_b / thr_s) / (CORES_BIG / CORES_SMALL), 3),
        "bw_before": pre,
        "bw_after": post,
        "window_drift": round(drift, 3),
        "bandwidth_ceiling": round((pre["ceiling"] + post["ceiling"]) / 2, 3),
        "quiet": bool(
            big["external_cores_best_run"] <= EXT_GATE
            and small["external_cores_best_run"] <= EXT_GATE
        ),
    }


def main() -> None:
    origins = int(sys.argv[1])
    tag = sys.argv[2]
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    alu = _probe("ballast_probe.py", "2")
    rounds = [_round(origins, repeats, tag, i) for i in range(n_rounds)]
    usable = [r for r in rounds if r["quiet"] and r["window_drift"] <= 0.12]
    pick = max(usable or rounds, key=lambda r: r["efficiency"])
    _save(f"code_scale{tag}_summary.json", {
        "protocol": (
            "time-paired rounds [bw probe, 32c, 8c, bw probe]; cold JVM per "
            "level; taskset pinning; SCHED_IDLE ballast on the 8c "
            f"complement; best-of-{repeats} in-process repeats; shipped "
            "session defaults (GCLocker retry fix); pick = highest-"
            "efficiency quiet drift-stable round"
        ),
        "origins": origins,
        "files": rounds[0]["files"],
        "rounds": rounds,
        "pick_is_usable": pick in usable,
        "efficiency": pick["efficiency"],
        "seconds_32c": pick["seconds_big"],
        "seconds_8c_ballast": pick["seconds_small"],
        "throughput_32c_fps": pick["throughput_big_fps"],
        "throughput_8c_fps": pick["throughput_small_fps"],
        "bandwidth_ceiling": pick["bandwidth_ceiling"],
        "efficiency_vs_host_ceiling": (
            round(pick["efficiency"] / pick["bandwidth_ceiling"], 3)
            if pick["bandwidth_ceiling"] else None
        ),
        "alu_probe": alu,
    })


if __name__ == "__main__":
    main()
