"""Benchmark harness — prints ONE JSON line.

Headline: the full citation pipeline (synthesize corpus -> parse -> tiered
dedup -> CC -> election) plus document/embedding operators on
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Scaling protocol (BASELINE.json north_rule, sandbox form): the same
clustering job on the same input at N and 4N local cores, each measurement
in its own cold process (scripts/cluster_job.py) with a warmup prefix, so
JIT/session state can't bias either side. efficiency = (thr_4N / thr_N) / 4.
Set SPARK_GRAFT_SCALING=0 to skip.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
# payload count scales with sf; sf0.1 -> 20k payloads (~50k citation records)
NUM_PAYLOADS = max(400, int(200_000 * _SF))
# the N-vs-4N scaling protocol needs a compute-dominated input; below ~500k
# records the local job is coordination-bound and the ratio is meaningless
SCALING_PAYLOADS = int(os.environ.get("SPARK_GRAFT_SCALE_PAYLOADS", "300000"))
SEED = 42


def _run_cluster_job(cores: int, payloads: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "cluster_job.py"),
           str(cores), str(payloads), str(SEED)]
    # pin the whole process tree (JVM + python workers) to `cores` physical
    # CPUs: local[N] only limits task slots, but each task spawns python UDF
    # workers that would otherwise escape onto all cores, silently giving the
    # "small cluster" the big cluster's hardware
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from pyspark.sql import functions as F

    from biblib_spark.session import get_spark

    queries: dict[str, float] = {}

    # headline pipeline at full cores (cold process, warmed JVM)
    big = _run_cluster_job(CPUS, SCALING_PAYLOADS)
    queries["parse_dedupe_cluster"] = big["seconds"]
    thr_big = big["records"] / big["seconds"]

    # operator queries on the sf tables
    spark = get_spark("bench_queries", cores=CPUS, shuffle_partitions=CPUS)
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    for name in (
        "near_dup_minhash",
        "ann_topk",
        "exact_dedup",
        "doc_stats",
        "tpch_q1",
        "top_customers",
    ):
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        df.agg(F.count(F.lit(1))).collect()
        queries[name] = round(time.time() - t0, 3)
    spark.stop()

    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        small_cores = max(2, CPUS // 4)
        small = _run_cluster_job(small_cores, SCALING_PAYLOADS)
        thr_small = small["records"] / small["seconds"]
        scaling = {
            "cores_small": small_cores,
            "cores_big": CPUS,
            "seconds_small": small["seconds"],
            "seconds_big": big["seconds"],
            "throughput_small_rps": round(thr_small, 1),
            "throughput_big_rps": round(thr_big, 1),
            "efficiency": round((thr_big / thr_small) / (CPUS / small_cores), 3),
        }
        queries[f"parse_dedupe_cluster_c{small_cores}"] = small["seconds"]

    out = {
        "metric": "citation_pipeline_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": _SF,
        "records_clustered": big["records"],
        "records_per_sec": round(thr_big, 1),
    }
    if scaling is not None:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
