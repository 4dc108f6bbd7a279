"""Sub-step profile of the candidate stage (the scaling bottleneck found in
round 3: 46.2s @ 8 cores -> 41.6s @ 32 cores, efficiency 0.28).

Usage: [taskset] python scripts/profile_candidates.py <cores> <payloads>
Materializes each sub-DAG of candidate_pairs separately to locate the
non-scaling mass.
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
    seed = 42

    from pyspark.sql import functions as F

    from biblib_spark.operators.candidates import (
        IDENTITY_TIERS,
        _group_keyed,
        identity_keyed,
        pairs_from_rid_lists,
        self_join_pairs,
    )
    from biblib_spark.operators.dedupe import (
        DedupConfig,
        dedupe_corpus,
        features_from_corpus,
    )
    from biblib_spark.session import get_spark

    spark = get_spark(f"profcand_{cores}", cores=cores)
    cfg = DedupConfig()
    corpus_path = f"/tmp/biblib_corpus_v5_{num_payloads}_{seed}.parquet"
    corpus = spark.read.parquet(corpus_path)
    warm_path = f"/tmp/biblib_corpus_v5_30000_{seed}.parquet"
    if os.path.exists(warm_path):
        dedupe_corpus(spark.read.parquet(warm_path)).count()

    feat = features_from_corpus(corpus, cfg).localCheckpoint(eager=True)
    feat.count()

    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def mat(name, df):
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        counts[name] = out.count()
        stages[name] = round(time.time() - t0, 3)
        return out

    tkey = F.xxhash64(F.lit("tg"), F.col("norm_title"))
    tg = mat(
        "tg_groupby",
        feat.groupBy("year_key", tkey.alias("tkey")).agg(
            F.sort_array(F.collect_list("rid")).alias("rids"),
            F.first("norm_title").alias("norm_title"),
            F.first("lsh_keys").alias("lsh_keys"),
            F.first("simhash_keys").alias("simhash_keys"),
        ).withColumn("tgid", F.col("rids")[0]),
    )
    wg_pairs = mat("wg_pairs", pairs_from_rid_lists(tg, cfg.max_bucket))
    keyed = mat(
        "group_keyed", _group_keyed(tg.filter(F.col("norm_title") != ""), cfg)
    )
    tg_pairs = mat(
        "tg_selfjoin",
        self_join_pairs(keyed, ["year_key", "bkey"], cfg.max_bucket).distinct(),
    )
    mem = tg.select("tgid", F.slice("rids", 1, cfg.max_bucket).alias("mrids"))
    cross = mat(
        "cross_expand",
        tg_pairs.join(
            mem.select(F.col("tgid").alias("a"), F.col("mrids").alias("arids")), "a"
        )
        .join(mem.select(F.col("tgid").alias("b"), F.col("mrids").alias("brids")), "b")
        .select(F.explode("arids").alias("x"), "brids")
        .select("x", F.explode("brids").alias("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")),
    )
    id_pairs = mat(
        "id_pairs",
        self_join_pairs(
            identity_keyed(feat, IDENTITY_TIERS), ["year_key", "bkey"],
            cfg.max_bucket,
        ),
    )
    final = mat(
        "final_distinct",
        wg_pairs.unionByName(id_pairs).unionByName(cross).distinct(),
    )
    spark.stop()
    print(
        json.dumps(
            {"cores": cores, "stages": stages, "counts": counts}
        )
    )


if __name__ == "__main__":
    main()
