"""Detached campaign: per-stage profiles at 1.2M / 4M / 10M payloads on 32
cores to locate the superlinear per-record cost (24.2k -> 12.0k rec/s going
10.2M -> 25.5M records; the aggregation-parallelism A/B rejected the
hash-agg-spill hypothesis, see bench_runs/r03/ab_4m_*.json).

Writes bench_runs/r03/profile_{payloads}_32c.json per size.
Run: nohup python scripts/campaign_r3e.py > /tmp/campaign_r3e.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r03")

SIZES = [(1_200_000, 2), (4_000_000, 2), (10_000_000, 2)]


def main() -> None:
    for payloads, repeats in SIZES:
        cmd = [
            "taskset", "-c", "0-31", sys.executable,
            os.path.join(REPO, "scripts", "profile_stages.py"),
            "32", str(payloads), "42", str(repeats),
        ]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"FAILED {payloads}: {r.stderr[-2000:]}", flush=True)
            continue
        line = r.stdout.strip().splitlines()[-1]
        path = os.path.join(OUT, f"profile_{payloads}_32c.json")
        with open(path, "w") as f:
            f.write(line + "\n")
        print(f"done {payloads}: {line}", flush=True)
    print("CAMPAIGN_DONE", flush=True)


if __name__ == "__main__":
    main()
