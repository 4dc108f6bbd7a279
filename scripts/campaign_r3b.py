"""Round-3 measurement campaign (v2): scaling gate at 4M payloads + 10M headroom.

Same per-measurement protocol as bench.py (cold taskset-pinned process via
scripts/cluster_job.py, warmup prefix, page-cache pre-touch, best-of-R with
the external-contention meter) plus the same quiet-window retry: a level whose
best sample ran under external load > EXT_GATE cores is re-run (bounded).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "r03")
EXT_GATE = 1.5


def run_job(cores: int, payloads: int, repeats: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "scripts", "cluster_job.py"),
           str(cores), str(payloads), "42", str(repeats)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print("proc done:", json.dumps(r), flush=True)
    return r


def level(name: str, cores: int, payloads: int, repeats: int) -> dict:
    runs = [run_job(cores, payloads, repeats)]
    tries = 0
    while tries < 2 and not any(
        r["external_cores_best_run"] <= EXT_GATE for r in runs
    ):
        runs.append(run_job(cores, payloads, repeats))
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
    big = level("scale4m_32c.json", 32, 4_000_000, 4)
    small = level("scale4m_8c.json", 8, 4_000_000, 3)
    thr_b = big["records"] / big["seconds"]
    thr_s = small["records"] / small["seconds"]
    eff = (thr_b / thr_s) / 4
    summary = {"payloads": 4_000_000, "records": big["records"],
               "thr_32c": round(thr_b, 1), "thr_8c": round(thr_s, 1),
               "seconds_32c": big["seconds"], "seconds_8c": small["seconds"],
               "efficiency": round(eff, 3)}
    with open(os.path.join(OUT, "scale4m_summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary), flush=True)

    shutil.rmtree("/tmp/biblib_corpus_v5_10000000_42.parquet",
                  ignore_errors=True)
    level("headroom_32c_10M.json", 32, 10_000_000, 2)
    print("CAMPAIGN_DONE", flush=True)


if __name__ == "__main__":
    main()
