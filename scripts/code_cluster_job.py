"""Standalone runner for the CODE-arm scaling protocol: one cold JVM per
measurement of the clone-clustering pipeline (operators/codedup.py) over the
input_hint table (repo, path, commit, lang, content).

Usage: python scripts/code_cluster_job.py <cores> <num_origins> [seed] [repeats]
Prints one JSON line {"files": N, "seconds": S, "cores": C, "runs": [...]}.

Same measurement discipline as the citation arm (scripts/cluster_job.py):
the input table is materialized to parquet FIRST (synthesis is not part of
the measured window), its pages pre-touched, a same-plan-shape warmup run
executes at a size big enough to take the big-input AQE plan branches, and
the reported figure is best-of-N in-process repeats with the external-load
meter recording what the rest of the machine was doing during each run.
Round 4 adds the frequency-pinning ballast: a level pinned below the
machine's core count runs with SCHED_IDLE spinners on the complement cores
(scripts/ballast.py), so both levels measure at the all-core clock state.
Disable with SPARK_GRAFT_BALLAST=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_ORIGINS = 20_000  # ~35k files: big enough to keep the shuffled-join plans


def _corpus_path(spark, num_origins: int, seed: int) -> str:
    from biblib_spark.codecorpus import make_code_corpus

    path = f"/tmp/code_corpus_v1_{num_origins}_{seed}.parquet"
    if not os.path.exists(path):
        make_code_corpus(spark, num_origins, seed=seed).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _touch_pages(path: str) -> None:
    """One sequential read of the corpus files so the first measured repeat
    is not a disk cold-read benchmark (same rationale as cluster_job.py)."""
    buf = bytearray(1 << 20)
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                with open(os.path.join(root, fn), "rb", buffering=0) as f:
                    while f.readinto(buf):
                        pass
            except OSError:
                pass


def main() -> None:
    cores = int(sys.argv[1])
    num_origins = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    repeats = (
        int(sys.argv[4])
        if len(sys.argv) > 4
        else int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    )

    from biblib_spark.operators.codedup import code_dup_clusters
    from biblib_spark.session import get_spark

    spark = get_spark(f"code_cluster_job_{cores}", cores=cores)

    main_path = _corpus_path(spark, num_origins, seed)
    _touch_pages(main_path)
    files = spark.read.parquet(main_path)
    warm = spark.read.parquet(_corpus_path(spark, WARMUP_ORIGINS, seed))
    code_dup_clusters(warm).count()

    import contextlib

    from biblib_spark.hostload import ExternalLoadMeter
    from scripts.ballast import ballast_on, complement_of

    use_ballast = (
        os.environ.get("SPARK_GRAFT_BALLAST", "1") != "0"
        and cores < (os.cpu_count() or cores)
    )
    stack = contextlib.ExitStack()
    ballast_pids: frozenset[int] = frozenset()
    ballast_cores: list[int] = []
    if use_ballast:
        ballast_cores = complement_of(range(cores))
        procs = stack.enter_context(ballast_on(ballast_cores))
        ballast_pids = frozenset(p.pid for p in procs if p.pid)

    meter = ExternalLoadMeter(
        pinned_cores=cores if cores < os.cpu_count() else None,
        ballast_pids=ballast_pids,
    )
    runs = []
    ext_loads = []
    steals = []
    utils = []
    ballast_utils = []
    n = 0
    for _ in range(repeats):
        meter.start()
        t0 = time.time()
        n = code_dup_clusters(files).count()
        el = time.time() - t0
        runs.append(round(el, 3))
        ext_loads.append(round(meter.stop(), 2))
        steals.append(round(meter.last_steal_cores, 2))
        utils.append(round(meter.last_own_cores - meter.last_ballast_cores, 1))
        ballast_utils.append(round(meter.last_ballast_cores, 1))
        # drop CC checkpoint blocks between repeats (same tmpfs discipline
        # as cluster_job.py)
        from biblib_spark.plans.spill import cleanup_all

        cleanup_all()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    stack.close()
    spark.stop()
    best = min(range(len(runs)), key=lambda i: runs[i])
    print(
        json.dumps(
            {
                "files": n,
                "seconds": runs[best],
                "cores": cores,
                "runs": runs,
                "external_cores_during_runs": ext_loads,
                "external_cores_best_run": ext_loads[best],
                "steal_cores_during_runs": steals,
                "own_cores_during_runs": utils,
                "ballast": {
                    "enabled": use_ballast,
                    "cores": ballast_cores,
                    "cores_during_runs": ballast_utils,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
