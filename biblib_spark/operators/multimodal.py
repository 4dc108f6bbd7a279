"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline treats media as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas``. The decode is REAL for PNG and WAV — a pure numpy + stdlib
zlib codec (kernels/media.py), no PIL/ffmpeg needed — and an honestly
labeled deterministic fake only for kinds with no in-container parser.
Video is gated behind a per-process capability probe
(kernels/media.py:video_decoder): on a cluster with ffmpeg, frames are
really decoded (PNG-over-pipe, parsed by the same numpy codec) and
``decoded = true``; in this sandbox the probe finds nothing and those
items keep ``decoded = false`` with a content-hash embedding. The feature
schema is identical on both paths — swapping capability changes values,
never shape. Images outside the numpy codec's subset (JPEG, 16-bit PNG)
similarly use PIL iff importable.

Feature rows are DuckDB-oracle-checked against a fixture built by the SAME
kernel (fixtures.ensure_media_fixture — the codefixtures.py pattern), so
the Spark plumbing is verified end-to-end, not rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from biblib_spark.kernels.media import (
    media_feature_row,
    synth_media_row,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("data", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_crc", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("decoded", BooleanType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

_FEATURE_COLS = [f.name for f in FEATURE_SCHEMA.fields]


def extract_media_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Media table -> per-item features via one Arrow-batched pass.

    PNG and WAV items are genuinely decoded (dimensions, luminance, RMS,
    zero-crossing rate, a centered perceptual embedding — kernels/media.py);
    undecodable items fall back to the labeled content-hash embedding with
    ``decoded = false``. Column pruning to (media_id, kind, data) keeps the
    scan narrow; the blob never leaves the executor.
    """

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                feats = media_feature_row(kind, blob)
                feats["media_id"] = int(mid)
                feats["kind"] = kind
                rows.append(feats)
            yield pd.DataFrame(rows, columns=_FEATURE_COLS)

    return media.select("media_id", "kind", "data").mapInPandas(
        _fn, schema=FEATURE_SCHEMA
    )


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact binary dedup: sha2 over the blob, JVM-side (no Python)."""
    return (
        media.groupBy(F.sha2(F.col("data"), 256).alias("content_sha"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("media_id").alias("rep_id"))
        .filter(F.col("n_copies") > 1)
    )


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per planned frame via a
    JVM-side sequence explode (the decode itself would attach per-row).
    Demonstrates the explode-shaped fan-out a real sampler uses.
    """
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        video.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames)))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("ts_ms"),
        )
    )


def make_synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with exact-duplicate structure (every third
    item repeats the blob of i - i % 3). Image blobs are real PNGs, audio
    real WAVs (kernels/media.py synthesis — shared with the oracle fixture
    builder); video is an opaque deterministic blob."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [synth_media_row(int(i), seed) for i in pdf["id"]]
            )

    return spark.range(0, n).mapInPandas(_gen, schema=MEDIA_SCHEMA)
