"""Similarity search over embedding columns.

Brute-force cosine top-k as the correctness baseline (pure JVM expressions:
zip_with + aggregate, no Python in the hot path), and an LSH-bucketed
variant (random hyperplane signs) as the scale path — at 10^9 vectors the
cross join is replaced by sign-bucket equi-joins, trading recall for a
~bucket-count fan-in reduction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    Output: (query_id, neighbor_id, rank, sim) — rank 1 is most similar.
    The query side is tiny and broadcast; the candidate side streams.
    """
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("vnorm", _norm(F.col("vec")))
    queries = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vnorm").alias("qnorm"),
        )
    )
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))
    scored = joined.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def make_hyperplane_bucket_udf(dim: int, n_planes: int, seed: int):
    """Random-hyperplane LSH: sign pattern of n_planes projections -> bucket."""
    key = f"annlsh|{seed}"
    raw = b"".join(
        hashlib.sha256(f"{key}|{i}".encode()).digest()
        for i in range((dim * n_planes * 8) // 32 + 1)
    )
    planes = (
        np.frombuffer(raw[: dim * n_planes * 8], dtype="<u8").astype(np.float64)
        / np.float64(1 << 64)
        - 0.5
    ).reshape(n_planes, dim)

    @pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            arr = np.asarray(v, dtype=np.float64)
            signs = (planes @ arr) > 0
            out[i] = int(np.packbits(signs.astype(np.uint8)).tobytes().hex(), 16)
        return pd.Series(out)

    return bucket_udf


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 12,
    seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Scale path for the brute-force baseline; recall depends on n_planes.
    """
    bucket = make_hyperplane_bucket_udf(dim, n_planes, seed)
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("bucket", bucket("vec")).withColumn("vnorm", _norm(F.col("vec")))
    queries = base.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(queries), F.col("bucket") == F.col("qbucket")
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )
