"""Per-tier wall-time profile of the code-clone pipeline.

Usage: python scripts/profile_code.py [num_origins] [cores]
Prints one JSON line with per-stage seconds so the slow tier is obvious.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_origins = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from biblib_spark import codecorpus
    from biblib_spark.operators import codedup
    from biblib_spark.session import get_spark

    spark = get_spark("profile_code", cores=cores)
    path = f"/tmp/code_corpus_v1_{num_origins}_42.parquet"
    if not os.path.exists(path):
        codecorpus.make_code_corpus(spark, num_origins).write.mode(
            "overwrite"
        ).parquet(path)
    files = spark.read.parquet(path)
    out = {"files": files.count(), "origins": num_origins, "cores": cores}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 2)
        print(name, out[name], flush=True)
        return r

    from biblib_spark.plans.spill import spill_to_parquet

    t0 = time.time()
    feat, _ = spill_to_parquet(codedup.code_features(files), "prof-feat")
    out["features_s"] = round(time.time() - t0, 2)
    print("features_s", out["features_s"], flush=True)

    e = clock("tier_exact_s", lambda: codedup._star_edges(feat, "sha")
              .cache()) or codedup._star_edges(feat, "sha")
    clock("tier_exact_count", lambda: e.count())

    n = codedup._star_edges(feat, "norm_hash").cache()
    clock("tier_norm_s", lambda: n.count())

    cand = codedup.minhash_candidate_pairs(feat).cache()
    clock("tier_minhash_cand_s", lambda: cand.count())

    m = codedup.jaccard_verified_pairs(feat, cand).cache()
    clock("tier_jaccard_verify_s", lambda: m.count())

    w = codedup.containment_verified_pairs(feat).cache()
    clock("tier_containment_s", lambda: w.count())

    edges = codedup.code_dup_edges(feat).cache()
    clock("edges_union_s", lambda: edges.count())
    out["edge_rows"] = edges.count()

    clock("cc_s", lambda: codedup.clusters_from_edges(feat, edges).count())

    clock("end_to_end_s", lambda: codedup.code_dup_clusters(files).count())

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
