"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline treats media as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas``. The image/audio codec libraries are NOT in this container,
so the decode step is a clearly-marked deterministic FAKE (seeded from the
content hash) behind the same UDF signature and batch shape the real decoder
would use — the Spark-side plumbing (schema, partitioning, batch iteration)
is real and tested. Swap ``_fake_decode`` for a PIL/ffmpeg call on a real
cluster.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _fake_decode(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: a unit-norm vector
    seeded from the content bytes. Identical bytes -> identical embedding, so
    dedup-by-embedding behaves like a real perceptual hash for exact copies.
    """
    h = hashlib.sha256(data).digest()
    raw = np.frombuffer(
        b"".join(hashlib.sha256(h + bytes([i])).digest() for i in range(dim // 8 + 1)),
        dtype=np.uint8,
    )[: dim * 2]
    vec = raw.astype(np.float32).reshape(dim, 2).sum(axis=1) - 255.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def extract_media_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Media table -> per-item features via one Arrow-batched pass.

    On a real cluster the inner loop calls the codec; everything around it
    (column pruning to (media_id, kind, data), Arrow batching, output schema)
    is exactly what production would run.
    """

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [],
                "content_crc": [], "embedding": [],
            }
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(blob))
                out["content_crc"].append(zlib.crc32(blob))
                out["embedding"].append(
                    [float(x) for x in _fake_decode(blob, dim)]
                )
            yield pd.DataFrame(out)

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
    item repeats the blob of i - i % 3)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base = i - (i % 3) if i % 3 == 2 else i  # every 3rd is a copy
                kind = kinds[(base // 3) % 3]
                blob = hashlib.sha256(f"media|{seed}|{base}".encode()).digest() * 8
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": mimes[kind],
                        "data": blob,
                        "width": 64 + base % 512 if kind == "image" else None,
                        "height": 64 + base % 256 if kind == "image" else None,
                        "duration_ms": 3000 + base % 9000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(_gen, schema=MEDIA_SCHEMA)
