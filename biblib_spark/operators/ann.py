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


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Brute-force all-pairs baseline — correctness anchor and fine up to ~10^5
    vectors per group; at 10^9+ swap the pair source for the multi-table LSH
    buckets (``make_table_buckets_udf``) and keep this cosine filter as the
    verify arm, exactly like MinHash-LSH + Jaccard on the text side.
    """
    base = embeddings.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    ).withColumn("na", _norm(F.col("va")))
    other = base.select(
        F.col("a").alias("b"), F.col("va").alias("vb"), F.col("na").alias("nb")
    )
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        base.crossJoin(F.broadcast(other))
        .filter(F.col("a") < F.col("b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("a", "b", F.round("sim", 4).alias("sim"))
    )


def _planes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    key = f"annlsh|{seed}"
    total = dim * n_planes * n_tables * 8
    raw = b"".join(
        hashlib.sha256(f"{key}|{i}".encode()).digest()
        for i in range(total // 32 + 1)
    )
    return (
        np.frombuffer(raw[:total], dtype="<u8").astype(np.float64)
        / np.float64(1 << 64)
        - 0.5
    ).reshape(n_tables, n_planes, dim)


def _pack(table: int, signs: np.ndarray) -> int:
    # (table id, sign pattern) in one int64 join key; the sign pattern must
    # fit below the table-id bits
    assert len(signs) <= 40, "n_planes > 40 would collide with the table id"
    return (table << 40) | int(
        np.packbits(signs.astype(np.uint8)).tobytes().hex(), 16
    )


def plant_neighbors(
    spark,
    embeddings: DataFrame,
    query_ids: list[int],
    per_query: int = 5,
    noise: float = 0.05,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Test/benchmark harness: union ``per_query`` high-cosine perturbed
    copies of each query vector into the table (ids 1_000_000+). ANN recall
    is only meaningful when true neighbors are actually close — uniform
    random vectors have near-orthogonal 'neighbors' no sublinear index can
    find — so recall harnesses measure retrieval of these planted points."""
    rng = np.random.default_rng(seed)
    qrows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    rows = []
    for r in qrows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        v = v / np.linalg.norm(v)
        for j in range(per_query):
            p = v + noise * rng.standard_normal(len(v))
            rows.append(
                (1_000_000 + int(r[id_col]) * 100 + j, [float(x) for x in p])
            )
    planted = spark.createDataFrame(
        rows, schema=f"{id_col} long, {vec_col} array<double>"
    )
    return embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).unionByName(planted)


def make_table_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Multi-TABLE random-hyperplane LSH, index side: each vector hashes to
    one bucket PER table (classic L-tables construction — the index is
    replicated n_tables times, the standard storage/recall trade)."""
    planes = _planes(dim, n_planes, n_tables, seed)

    @pandas_udf("array<long>")
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            arr = np.asarray(v, dtype=np.float64)
            out.append(
                [_pack(t, (planes[t] @ arr) > 0) for t in range(n_tables)]
            )
        return pd.Series(out)

    return buckets_udf


def make_probe_buckets_udf(
    dim: int, n_planes: int, n_tables: int, seed: int, probe_bits: int
):
    """Query-side multi-probe: per table, the vector's own bucket plus every
    bucket reachable by flipping one of the ``probe_bits`` planes whose
    projection is CLOSEST to zero — near-zero projections are exactly the
    planes a true neighbor most likely lands on the other side of, so probing
    them recovers most of the recall a single lookup loses, at
    n_tables * (probe_bits + 1) bucket lookups instead of 2^n_planes."""
    planes = _planes(dim, n_planes, n_tables, seed)

    @pandas_udf("array<long>")
    def probes_udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            arr = np.asarray(v, dtype=np.float64)
            probes = []
            for t in range(n_tables):
                proj = planes[t] @ arr
                signs = proj > 0
                probes.append(_pack(t, signs))
                for i in np.argsort(np.abs(proj))[:probe_bits]:
                    flipped = signs.copy()
                    flipped[i] = ~flipped[i]
                    probes.append(_pack(t, flipped))
            out.append(probes)
        return pd.Series(out)

    return probes_udf


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 1,
    seed: int = 7,
    dim: int = 64,
    probe_bits: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH buckets.

    Classic (L tables x b hyperplanes) construction with query-side
    multi-probe: the index side emits one bucket per table (n_tables-way
    replication — the standard LSH storage/recall trade); the tiny broadcast
    query side fans out to n_tables * (probe_bits + 1) probe buckets.
    Collision probability per plane is 1 - angle/pi, so recall is governed by
    the NEIGHBOR SIMILARITY the workload actually has: for near-duplicate
    embeddings (cos >= 0.9) a single 12-bit table probes ~0.02% of the index
    at recall ~0.9; for near-orthogonal "neighbors" (cos ~0.3, e.g. uniform
    random vectors) NO sublinear index works — use the brute-force baseline.
    probe_bits=None defaults to half the planes; 0 = plain lookup.
    """
    if probe_bits is None:
        probe_bits = n_planes // 2
    buckets = make_table_buckets_udf(dim, n_planes, n_tables, seed)
    probes = make_probe_buckets_udf(dim, n_planes, n_tables, seed, probe_bits)
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("vnorm", _norm(F.col("vec")))
    indexed = base.select(
        "neighbor_id", "vec", "vnorm", F.explode(buckets("vec")).alias("bucket")
    )
    queries = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vnorm").alias("qnorm"),
            F.explode(probes("vec")).alias("qbucket"),
        )
    )
    cand = (
        indexed.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair can collide in several tables/probes: score each pair once
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.first("vec").alias("vec"),
            F.first("vnorm").alias("vnorm"),
            F.first("qvec").alias("qvec"),
            F.first("qnorm").alias("qnorm"),
        )
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# IVF-Flat: k-means coarse quantizer -> inverted cells -> probe + exact rerank
# ---------------------------------------------------------------------------


def train_ivf(vecs: np.ndarray, nlist: int, seed: int = 7,
              iters: int = 8) -> np.ndarray:
    """Spherical k-means coarse quantizer (the IVF training step).

    Pure numpy, deterministic for (vecs, nlist, seed): seeded init choice,
    Lloyd iterations with argmax-cosine assignment, centroids re-normalized
    each round (spherical variant — the metric is cosine). Empty cells keep
    their previous centroid (no RNG inside the loop). This is the SHARED
    KERNEL: the Spark operator and the DuckDB oracle fixture both call it,
    so cell assignments are bit-identical.

    Training on a bounded sample is the standard IVF practice (FAISS trains
    its quantizer on ~max(10k, 39*nlist) sampled vectors regardless of index
    size) — at 10^9+ rows the sample, not the table, bounds driver memory.
    """
    X = np.asarray(vecs, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    nlist = min(nlist, len(X))
    centroids = X[rng.choice(len(X), size=nlist, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ centroids.T, axis=1)
        for j in range(nlist):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                norm = np.linalg.norm(c)
                if norm > 1e-12:
                    centroids[j] = c / norm
    return centroids


def make_ivf_cell_udf(centroids: np.ndarray):
    """vec -> owning cell id (argmax dot against unit centroids; dividing by
    |v| cannot change the argmax, so raw dot IS the cosine assignment)."""
    ct = np.ascontiguousarray(centroids.T)

    @pandas_udf(LongType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        m = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        return pd.Series(np.argmax(m @ ct, axis=1).astype(np.int64))

    return cell_udf


def make_ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """query vec -> its nprobe nearest cells (stable argsort: ties broken by
    cell id, reproducible across sessions)."""
    from pyspark.sql.types import ArrayType

    ct = np.ascontiguousarray(centroids.T)

    @pandas_udf(ArrayType(LongType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        m = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        order = np.argsort(-(m @ ct), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int64).tolist() for row in order])

    return probe_udf


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    iters: int = 8,
    train_sample: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF-Flat index (the second scale path next
    to :func:`cosine_topk_lsh`).

    Shape: train a spherical-k-means quantizer on a DETERMINISTIC bounded
    sample (first ``train_sample`` rows by id — FAISS-style sample training;
    the collect is bounded by the constant, never by table size), assign
    every vector to its nearest centroid (one Arrow pass, ONE cell per
    vector — no n_tables storage replication, unlike LSH), probe the
    ``nprobe`` nearest cells per query, exact-cosine rerank inside the
    probed cells only.

    Scale: candidates ~ (nprobe/nlist) of the table per query; the index
    side adds one int64 column; the query side is broadcast. Because cells
    partition the index, a (query, neighbor) pair can surface at most once
    — no candidate dedup stage at all (LSH needs one per table/probe).
    Recall is governed by cell-boundary effects: for near-duplicate
    workloads (the north_rule's geometry) the true neighbors share the
    query's cell almost surely and nprobe covers boundary cases.
    """
    sample = (
        embeddings.orderBy(id_col)
        .limit(train_sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    centroids = train_ivf(
        np.asarray([r[0] for r in sample], dtype=np.float64), nlist, seed, iters
    )
    cell_udf = make_ivf_cell_udf(centroids)
    probe_udf = make_ivf_probe_udf(centroids, nprobe)

    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("vnorm", _norm(F.col("vec")))
    indexed = base.withColumn("cell", cell_udf("vec"))
    queries = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vnorm").alias("qnorm"),
            F.explode(probe_udf("vec")).alias("cell"),
        )
    )
    cand = indexed.join(F.broadcast(queries), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("vnorm") * F.col("qnorm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )
