"""Structured Streaming ingest: incremental parse over a growing directory."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from biblib_spark.corpus import make_corpus


def _write_batch(spark, out_dir: str, n: int, seed: int, offset: int) -> None:
    (
        make_corpus(spark, n, seed=seed)
        .withColumn("row_id", F.col("row_id") + offset)
        .coalesce(1)
        .write.mode("append")
        .parquet(out_dir)
    )


def test_stream_parse_incremental(spark):
    from biblib_spark.streaming.ingest import stream_features, stream_parse

    work = tempfile.mkdtemp(prefix="stream_test_")
    in_dir = os.path.join(work, "landing")
    out_dir = os.path.join(work, "parsed_sink")
    try:
        _write_batch(spark, in_dir, 30, seed=5, offset=0)

        def run_once():
            # file sink + checkpoint: exactly-once incremental processing
            # (each availableNow trigger consumes only the unseen files)
            q = (
                stream_parse(spark, in_dir)
                .drop("citation", "error_span")  # keep the sink schema flat
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out_dir)
                .option(
                    "checkpointLocation", os.path.join(work, "ckpt_parse")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(out_dir)

        first = run_once().count()
        assert first > 0

        # a second batch lands; only the DELTA is parsed on the next trigger
        _write_batch(spark, in_dir, 20, seed=6, offset=1_000)
        total = run_once().count()
        assert total > first

        # exactly-once: every payload parsed once across the two triggers
        from biblib_spark.sources.parse import parse_with_diagnostics

        expected = parse_with_diagnostics(spark.read.parquet(in_dir)).count()
        assert total == expected
        assert spark.read.parquet(in_dir).count() == 50

        # stateful exact dedup: a payload re-landing in a later microbatch
        # is dropped by the checkpointed state store
        from biblib_spark.streaming.ingest import stream_exact_dedup

        dup_dir = os.path.join(work, "landing_dup")
        dedup_out = os.path.join(work, "dedup_sink")
        _write_batch(spark, dup_dir, 10, seed=5, offset=0)

        def run_dedup():
            q = (
                stream_exact_dedup(spark, dup_dir)
                .select("row_id", "content_sha")
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", dedup_out)
                .option("checkpointLocation", os.path.join(work, "ckpt_dd"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(dedup_out).count()

        n1 = run_dedup()
        assert n1 == 10
        # batch 2: 5 exact re-lands (same content, shifted row_id) + 5 new
        _write_batch(spark, dup_dir, 10, seed=5, offset=100_000)
        _write_batch(spark, dup_dir, 5, seed=99, offset=200_000)
        n2 = run_dedup()
        assert n2 == n1 + 5  # the 10 duplicate payloads were suppressed

        # feature stream reuses the fused kernel unchanged
        qf = (
            stream_features(spark, in_dir)
            .writeStream.format("memory")
            .queryName("stream_feat")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt_feat"))
            .trigger(availableNow=True)
            .start()
        )
        qf.awaitTermination(120)
        feats = spark.sql("select * from stream_feat")
        assert feats.count() > 0
        assert "lsh_keys" in feats.columns and "norm_title" in feats.columns
    finally:
        shutil.rmtree(work, ignore_errors=True)
