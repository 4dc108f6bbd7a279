"""Per-stage profile of the clustering job at a given core count.

Usage: [taskset -c 0-N] python scripts/profile_stages.py <cores> <payloads> [seed]
Prints one JSON line with per-stage seconds and row counts. Each stage is
eagerly materialized (localCheckpoint) so timings don't overlap.
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
    from biblib_spark.operators.candidates import candidate_pairs
    from biblib_spark.operators.components import assign_clusters
    from biblib_spark.operators.dedupe import (
        DedupConfig,
        dedupe_corpus,
        features_from_corpus,
    )
    from biblib_spark.operators.election import elect_representatives
    from biblib_spark.operators.verify import verify_pairs
    from biblib_spark.session import get_spark

    spark = get_spark(f"profile_{cores}", cores=cores)
    cfg = DedupConfig()

    corpus_path = f"/tmp/biblib_corpus_v5_{num_payloads}_{seed}.parquet"
    if not os.path.exists(corpus_path):
        make_corpus(spark, num_payloads, records_per_payload=6, seed=seed).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # warmup (JIT, python workers)
    dedupe_corpus(make_corpus(spark, 50, records_per_payload=6, seed=seed)).count()

    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def mat(name, df):
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        counts[name] = out.count()
        stages[name] = round(time.time() - t0, 3)
        return out

    t_all = time.time()
    feat = mat("features", features_from_corpus(corpus, cfg))
    pairs = mat("candidates", candidate_pairs(feat, cfg))
    edges = mat(
        "verify",
        verify_pairs(
            pairs, feat, containment=cfg.containment_verify,
            containment_min_len=cfg.containment_min_len,
        ),
    )
    clustered = mat("components", assign_clusters(feat.select("rid"), edges))
    enriched = clustered.join(
        feat.select("rid", "source", "abstract_text", "doi"), "rid"
    )
    elected = mat(
        "election", elect_representatives(enriched, cfg.source_preferences)
    )
    total = round(time.time() - t_all, 3)
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "payloads": num_payloads,
                "stages": stages,
                "counts": counts,
                "total": total,
            }
        )
    )


if __name__ == "__main__":
    main()
