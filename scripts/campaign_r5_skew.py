"""Round-5 skew stress at gate scale (round-4 verdict ask #4).

The C7 salting / star-cap paths are oracle- and unit-tested but were never
MEASURED at >=10M records with a planted mega-block. Three 32-core arms,
same protocol as the other campaigns (cold JVM per arm via
scripts/cluster_job.py, taskset, page-cache pre-touch, same-plan warmup,
best-of-N, external-load meter):

  uniform  — shipped defaults on the uniform 4M-payload corpus (the
             baseline the skewed arms are judged against);
  skew_flat   — SPARK_GRAFT_MEGA_FRAC=0.07 (7% of works share one
             boilerplate title + one year), shipped single-shuffle pair
             path (star cap only);
  skew_salted — same corpus, SPARK_GRAFT_SALTED_PAIRS=1 (salted two-level
             size/min aggregation + streamed star join).

Pass criterion (verdict): the skewed corpus under the shipped C7 machinery
runs within ~1.2x of the uniform-corpus wall.

Usage: nohup python scripts/campaign_r5_skew.py [payloads] [repeats] \
    > /tmp/campaign_r5_skew.log 2>&1 &
Writes bench_runs/r05/skew_{uniform,flat,salted}.json + skew_summary.json.
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
CORES = 32
MEGA_FRAC = "0.07"


def _run(payloads: int, repeats: int, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [
        "taskset", "-c", f"0-{CORES - 1}", sys.executable,
        os.path.join(REPO, "scripts", "cluster_job.py"),
        str(CORES), str(payloads), str(SEED), str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True, env=env)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _save(name: str, obj: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1)
    print(name, json.dumps(obj)[:400], flush=True)


def main() -> None:
    payloads = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    t0 = time.strftime("%H:%M")

    uniform = _run(payloads, repeats, {})
    _save("skew_uniform.json", uniform)
    flat = _run(payloads, repeats, {"SPARK_GRAFT_MEGA_FRAC": MEGA_FRAC})
    _save("skew_flat.json", flat)
    salted = _run(
        payloads, repeats,
        {"SPARK_GRAFT_MEGA_FRAC": MEGA_FRAC, "SPARK_GRAFT_SALTED_PAIRS": "1"},
    )
    _save("skew_salted.json", salted)

    _save("skew_summary.json", {
        "protocol": (
            "three cold-JVM 32c arms, same cluster_job discipline "
            "(taskset, pre-touch, uniform-corpus warmup, best-of-"
            f"{repeats}, external-load meter); window {t0}-"
            + time.strftime("%H:%M")
        ),
        "payloads": payloads,
        "mega_frac": float(MEGA_FRAC),
        "records_uniform": uniform["records"],
        "records_skewed": flat["records"],
        "seconds_uniform": uniform["seconds"],
        "seconds_skew_flat": flat["seconds"],
        "seconds_skew_salted": salted["seconds"],
        "runs": {
            "uniform": uniform["runs"],
            "skew_flat": flat["runs"],
            "skew_salted": salted["runs"],
        },
        "ext_cores": {
            "uniform": uniform["external_cores_during_runs"],
            "skew_flat": flat["external_cores_during_runs"],
            "skew_salted": salted["external_cores_during_runs"],
        },
        "ratio_flat_vs_uniform": round(
            flat["seconds"] / uniform["seconds"], 3
        ),
        "ratio_salted_vs_uniform": round(
            salted["seconds"] / uniform["seconds"], 3
        ),
        "gate": "skewed arm within ~1.2x of uniform",
    })


if __name__ == "__main__":
    main()
