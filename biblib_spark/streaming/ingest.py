"""Streaming ingest: incremental parse of a growing corpus directory.

The batch kernels are stateless per payload, so they lift onto Structured
Streaming unchanged: ``readStream`` (file source, exactly-once via source +
sink checkpointing) -> ``mapInPandas`` parse -> streaming sink. At 100 TB
this is the landing-zone pattern — new corpus files appear, only the delta
is parsed, ``maxFilesPerTrigger`` bounds per-microbatch work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from biblib_spark.schema import CORPUS_SCHEMA


def read_corpus_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of corpus-shaped parquet under ``input_dir``."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_parse(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming diagnostics union (citations + quarantine rows, one parse).

    The batch ``parse_with_diagnostics`` applies unchanged: sha projection
    and ``mapInPandas`` are stateless row-local transforms, which Structured
    Streaming executes per microbatch.
    """
    from biblib_spark.sources.parse import parse_with_diagnostics

    return parse_with_diagnostics(
        read_corpus_stream(spark, input_dir, max_files_per_trigger)
    )


def stream_exact_dedup(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming exact dedup: first sighting of each content hash wins,
    ACROSS microbatches — `dropDuplicates` on a streaming DataFrame keeps
    the seen-keys set in the checkpointed state store, so a payload that
    re-lands in a later batch is dropped exactly once per key forever.
    (Unbounded key state; at 100 TB bound it with
    ``withWatermark`` + `dropDuplicatesWithinWatermark` or a TTL'd
    applyInPandasWithState variant.)"""
    from pyspark.sql import functions as F

    stream = read_corpus_stream(spark, input_dir, max_files_per_trigger)
    return stream.withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    ).dropDuplicates(["content_sha"])


def stream_features(
    spark: SparkSession,
    input_dir: str,
    cfg=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming dedup features (the fused parse+normalize+MinHash pass).

    Emits match-ready feature rows incrementally; a downstream batch (or a
    future ``applyInPandasWithState`` union-find) joins them against the
    accumulated signature store.
    """
    from biblib_spark.operators.dedupe import DedupConfig, features_from_corpus

    return features_from_corpus(
        read_corpus_stream(spark, input_dir, max_files_per_trigger),
        cfg or DedupConfig(),
    )
