"""Benchmark harness — prints ONE JSON line.

Headline: the full citation pipeline (synthesize corpus -> parse -> tiered
dedup -> CC -> election) plus document/embedding operators on
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Scaling protocol (BASELINE.json north_rule, sandbox form): the same
clustering job on the same input at N and 4N local cores, each measurement
in its own cold process (scripts/cluster_job.py) with a same-plan-shape
warmup prefix, so JIT/session state can't bias either side. The two levels
are INTERLEAVED (4N, N, 4N, N) and each process takes best-of-R in-process
repeats — this box shows +-25% noisy-neighbor variance on minutes-apart
windows, and interleaving keeps one level from eating a whole contention
spike. efficiency = (thr_4N / thr_N) / 4. Set SPARK_GRAFT_SCALING=0 to skip,
SPARK_GRAFT_SCALE_ROUNDS to change the per-level process count (default 2).
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
# the N-vs-4N scaling protocol needs a compute-dominated input: the job has
# ~8 s of core-count-independent cost (driver scheduling, AQE planning,
# stage barriers) that dilutes the ratio at small inputs — 400k payloads
# (~1.02M records) amortizes it (measured: efficiency 0.63 at 300k -> 0.71
# at 600k on the same quiet window) while keeping the whole bench inside
# ~11 min even on a contended window
SCALING_PAYLOADS = int(os.environ.get("SPARK_GRAFT_SCALE_PAYLOADS", "400000"))
SEED = 42


def _run_cluster_job(cores: int, payloads: int, repeats: int | None = None) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "cluster_job.py"),
           str(cores), str(payloads), str(SEED)]
    if repeats is not None:
        cmd.append(str(repeats))
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
    small_cores = max(2, CPUS // 4)
    scale_rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

    # headline pipeline at full cores (cold process, warmed JVM), interleaved
    # with the small-cluster level when the scaling protocol is on; best-of
    # 2 repeats x 2 processes per level keeps the whole bench inside ~10 min
    # quiet / ~16 min contended
    big_runs: list[dict] = [_run_cluster_job(CPUS, SCALING_PAYLOADS, repeats=2)]
    small_runs: list[dict] = []
    if do_scaling:
        for i in range(scale_rounds):
            small_runs.append(
                _run_cluster_job(small_cores, SCALING_PAYLOADS, repeats=2)
            )
            if i + 1 < scale_rounds:
                big_runs.append(
                    _run_cluster_job(CPUS, SCALING_PAYLOADS, repeats=2)
                )

    big = min(big_runs, key=lambda r: r["seconds"])
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

    # ANN recall@5 vs brute force, measured on planted high-cosine neighbors
    # (the synthetic table's organic neighbors are near-orthogonal, a
    # geometry where no sublinear index works — see cosine_topk_lsh)
    from biblib_spark.operators.ann import (
        cosine_topk,
        cosine_topk_lsh,
        plant_neighbors,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(10))
    table = plant_neighbors(spark, emb, qids, per_query=5, noise=0.05)
    table = table.localCheckpoint(eager=True)

    def _recall(approx_rows, exact_rows):
        ex: dict[int, set] = {}
        ap: dict[int, set] = {}
        for r in exact_rows:
            ex.setdefault(r.query_id, set()).add(r.neighbor_id)
        for r in approx_rows:
            ap.setdefault(r.query_id, set()).add(r.neighbor_id)
        return round(
            sum(len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex) / len(ex), 3
        )

    exact_rows = cosine_topk(table, query_ids=qids, k=5).collect()
    ann = {
        "recall_at_5_single_lookup": _recall(
            cosine_topk_lsh(table, query_ids=qids, k=5, n_planes=12,
                            n_tables=1, probe_bits=0).collect(),
            exact_rows,
        ),
        "recall_at_5_multiprobe_4tables": _recall(
            cosine_topk_lsh(table, query_ids=qids, k=5, n_planes=12,
                            n_tables=4, probe_bits=3).collect(),
            exact_rows,
        ),
    }
    spark.stop()

    scaling = None
    if do_scaling:
        small = min(small_runs, key=lambda r: r["seconds"])
        thr_small = small["records"] / small["seconds"]
        scaling = {
            "cores_small": small_cores,
            "cores_big": CPUS,
            "seconds_small": small["seconds"],
            "seconds_big": big["seconds"],
            "all_runs_small": [r["runs"] for r in small_runs],
            "all_runs_big": [r["runs"] for r in big_runs],
            "loadavg_small": [r.get("loadavg_after_runs") for r in small_runs],
            "loadavg_big": [r.get("loadavg_after_runs") for r in big_runs],
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
        "ann": ann,
    }
    if scaling is not None:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
