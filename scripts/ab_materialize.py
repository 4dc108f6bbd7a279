"""A/B: feature-table materialization — parquet spill vs localCheckpoint.

Usage: [taskset -c 0-N] python scripts/ab_materialize.py <cores> <payloads> [repeats]
Alternates the two modes inside ONE warm process (same JIT, same page cache,
interleaved so a load spike hits both arms equally) and reports best-of per
mode plus the external-contention figure for each repeat.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    payloads = int(sys.argv[2])
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from scripts.cluster_job import WARMUP_PAYLOADS, _corpus_path, _touch_pages

    from biblib_spark.hostload import ExternalLoadMeter
    from biblib_spark.operators.dedupe import dedupe_corpus
    from biblib_spark.plans.spill import cleanup_all
    from biblib_spark.session import get_spark

    spark = get_spark(f"ab_materialize_{cores}", cores=cores)
    main_path = _corpus_path(spark, payloads, 42)
    _touch_pages(main_path)
    corpus = spark.read.parquet(main_path)
    warm = spark.read.parquet(_corpus_path(spark, WARMUP_PAYLOADS, 42))
    for mode in ("parquet", "checkpoint"):
        dedupe_corpus(warm, materialize=mode).count()

    meter = ExternalLoadMeter()
    times: dict[str, list[float]] = {"parquet": [], "checkpoint": []}
    exts: dict[str, list[float]] = {"parquet": [], "checkpoint": []}
    for _ in range(repeats):
        for mode in ("parquet", "checkpoint"):
            meter.start()
            t0 = time.time()
            dedupe_corpus(corpus, materialize=mode).count()
            times[mode].append(round(time.time() - t0, 3))
            exts[mode].append(round(meter.stop(), 2))
            cleanup_all()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "payloads": payloads,
                "best": {m: min(v) for m, v in times.items()},
                "runs": times,
                "external_cores": exts,
            }
        )
    )


if __name__ == "__main__":
    main()
