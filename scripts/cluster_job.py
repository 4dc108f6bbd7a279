"""Standalone runner for the scaling protocol: one cold JVM per measurement.

Usage: python scripts/cluster_job.py <cores> <num_payloads> [seed]
Prints one JSON line {"records": N, "seconds": S, "cores": C}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    num_payloads = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42

    from biblib_spark.corpus import make_corpus
    from biblib_spark.operators.dedupe import dedupe_corpus
    from biblib_spark.session import get_spark

    spark = get_spark(f"cluster_job_{cores}", cores=cores)

    # materialize the input table first — the north_rule pipeline reads an
    # Iceberg/parquet table, so input synthesis is not part of the measured
    # clustering window
    corpus_path = f"/tmp/biblib_corpus_v5_{num_payloads}_{seed}.parquet"
    if not os.path.exists(corpus_path):
        make_corpus(spark, num_payloads, records_per_payload=6, seed=seed).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # warm up JVM/JIT + python workers on a small prefix so the measured
    # window is compute, not first-stage initialization
    warm = make_corpus(spark, 50, records_per_payload=6, seed=seed)
    dedupe_corpus(warm).count()

    # the sandbox VM has noisy-neighbor variance (same job measured ±25%
    # minutes apart); take the best of N repeats
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    best = None
    n = 0
    for _ in range(repeats):
        t0 = time.time()
        clusters = dedupe_corpus(corpus)
        n = clusters.count()
        secs = time.time() - t0
        best = secs if best is None else min(best, secs)
    spark.stop()
    print(json.dumps({"records": n, "seconds": round(best, 3), "cores": cores}))


if __name__ == "__main__":
    main()
