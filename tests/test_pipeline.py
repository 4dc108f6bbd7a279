"""End-to-end pipeline: checkpoint/resume (C8), quarantine, fused-path parity."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from biblib_spark.corpus import make_corpus
from biblib_spark.plans.checkpoint import read_marker
from biblib_spark.plans.pipeline import run_pipeline


def test_pipeline_resume(spark):
    work = tempfile.mkdtemp(prefix="pipeline_test_")
    try:
        corpus = make_corpus(spark, 150, seed=11)
        t0 = time.time()
        n1 = run_pipeline(spark, corpus, work).count()
        t1 = time.time() - t0
        assert n1 > 0
        for stage in ("parsed", "quarantine", "clusters"):
            marker = read_marker(os.path.join(work, stage))
            assert "rows" in marker and "lineage" in marker
            assert marker["lineage"]["input_rows"] == 150

        # full resume: all stages skipped, much faster, same rows
        t0 = time.time()
        n2 = run_pipeline(spark, corpus, work).count()
        t2 = time.time() - t0
        assert n2 == n1
        assert t2 < t1 / 3, f"resume took {t2:.1f}s vs first run {t1:.1f}s"

        # partial resume: only the deleted stage rebuilds, reusing parsed
        shutil.rmtree(os.path.join(work, "clusters"))
        n3 = run_pipeline(spark, corpus, work).count()
        assert n3 == n1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_fused_path_matches_staged_path(spark):
    from biblib_spark.operators.dedupe import (
        dedupe_corpus,
        dedupe_records,
        records_from_parsed,
    )
    from biblib_spark.sources.parse import parse_corpus

    corpus = make_corpus(spark, 120, seed=23)
    staged = dedupe_records(records_from_parsed(parse_corpus(corpus)))
    fused = dedupe_corpus(corpus)
    s = {(r.rid, r.cluster_id, r.is_unique) for r in staged.collect()}
    f = {(r.rid, r.cluster_id, r.is_unique) for r in fused.collect()}
    assert s == f and len(s) > 0


def test_source_preferences_cross_format(spark):
    """M12 end-to-end: clusters span RIS and PubMed payloads; preferring the
    PubMed source must elect a PubMed-parsed record in mixed clusters."""
    from pyspark.sql import functions as F

    from biblib_spark.operators.dedupe import (
        DedupConfig,
        dedupe_features,
        features_from_corpus,
    )

    corpus = make_corpus(spark, 160, seed=31)
    cfg = DedupConfig(source_preferences=["PubMed", "RIS"])
    feat = features_from_corpus(corpus, cfg).localCheckpoint(eager=True)
    out = dedupe_features(feat, cfg)

    stats = (
        out.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("source").alias("n_sources"),
            F.max(F.when(F.col("is_unique"), F.col("source"))).alias("winner"),
        )
    )
    mixed = stats.filter(F.col("n_sources") > 1)
    n_mixed = mixed.count()
    assert n_mixed > 5, "expected cross-format clusters"
    assert mixed.filter(F.col("winner") != "PubMed").count() == 0
