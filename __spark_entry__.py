"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-duplicate clustering over the
sf0.001 documents table (MinHash-LSH candidates -> Jaccard verify ->
connected components -> representative election). ``queries()`` /
``oracle_sql()`` pair each implemented operator from SURVEY.md §2 with an
ANSI-SQL DuckDB oracle at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup clustering of the sf0.001 documents table."""
    from biblib_spark.operators.components import assign_clusters
    from biblib_spark.operators.textops import near_dup_pairs_minhash

    docs = _docs(spark, SF0001)
    pairs = near_dup_pairs_minhash(docs, threshold=0.5).select("a", "b")
    clustered = assign_clusters(
        docs.select(F.col("doc_id").alias("rid")), pairs
    )
    from pyspark.sql.window import Window

    stats = docs.select(F.col("doc_id").alias("rid"), "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("rid").asc()
    )
    return (
        clustered.join(stats, "rid")
        .withColumn("is_unique", F.row_number().over(w) == 1)
        .select(F.col("rid").alias("doc_id"), "cluster_id", "is_unique")
    )


# ---------------------------------------------------------------------------
# queries + DuckDB oracles
# ---------------------------------------------------------------------------


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_id")
    )


def _q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import norm_text_col

    docs = _docs(spark, sf_dir)
    return docs.groupBy(
        F.md5(norm_text_col(F.col("text"))).alias("norm_hash")
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_id"))


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import doc_stats

    return doc_stats(_docs(spark, sf_dir)).withColumn(
        "token_count", F.col("token_count").cast("long")
    ).withColumn("char_count", F.col("char_count").cast("long"))


def _q_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import lang_summary

    return lang_summary(_docs(spark, sf_dir)).withColumn(
        "total_tokens", F.col("total_tokens").cast("long")
    )


def _q_lang_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import elect_lang_representative

    return elect_lang_representative(_docs(spark, sf_dir))


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.ann import cosine_topk

    return cosine_topk(_emb(spark, sf_dir), query_ids=[0, 1, 2], k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.topk import topk_ranked

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    joined = rev.join(
        F.broadcast(customer), rev["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_custkey").alias("custkey"), "c_name", "revenue", "n_orders"
    )
    # parallel top-k (TakeOrderedAndProject) + k-row broadcast rank — no
    # global window, no single-partition shuffle of the aggregated result
    return topk_ranked(
        joined, [("revenue", "desc"), ("custkey", "asc")], 20
    ).select("custkey", "c_name", "revenue", "n_orders", "rnk")


def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): 3-way join, filter both sides
    pushed to the scans, top-10 by revenue without a global window."""
    from biblib_spark.operators.topk import topk_ranked

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    joined = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return topk_ranked(
        joined, [("revenue", "desc"), ("l_orderkey", "asc")], 10
    ).select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue", "rnk")


def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 6-way join through
    region/nation; the three dimension tables broadcast."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    dims = (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("n_nationkey")),
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def _q_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.topk import topk_ranked

    li = _lineitem(spark, sf_dir)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_partkey", "p_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )
    return topk_ranked(
        rev, [("revenue", "desc"), ("p_partkey", "asc")], 15
    ).select("p_partkey", "p_name", "revenue", "total_qty", "rnk")


def _q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_gap = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return with_gap.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_session").alias("n_sessions"),
        F.countDistinct("event_type").alias("n_types"),
    )


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import quality_signals

    return quality_signals(_docs(spark, sf_dir))


def _q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


def _q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import token_frequencies

    return token_frequencies(_docs(spark, sf_dir), k=50)


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import lang_id_heuristic

    return lang_id_heuristic(_docs(spark, sf_dir))


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: synthetic binary media (real PNG/WAV blobs) -> REAL
    decode features (dimensions, luminance, RMS, zero-crossing rate —
    kernels/media.py pure-numpy codecs) + exact-dup groups. Oracle: the
    fixture persists the same kernel's per-item features
    (fixtures.ensure_media_fixture); DuckDB replays the dup grouping/join
    independently over content_crc. Embeddings stay pytest-covered (float
    arrays hash engine-dependently)."""
    from biblib_spark.operators.multimodal import (
        extract_media_features,
        make_synthetic_media,
        media_dedup_exact,
    )

    media = make_synthetic_media(spark, 300)
    feats = extract_media_features(media)
    dups = media_dedup_exact(media)
    return feats.join(
        dups.select(F.col("rep_id").alias("media_id"), "n_copies"),
        "media_id",
        "left",
    ).select(
        "media_id", "kind", "n_bytes", "content_crc", "width", "height",
        "duration_ms", "mean_luma", "rms", "zcr",
        F.col("decoded").cast("int").alias("decoded"), "n_copies",
    )


def _q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-3-gram Jaccard near-dup pairs, entirely JVM-side
    (sequence/transform/array_distinct/array_intersect — no Python). The
    same-lang equi-join + length-band filter is the small-scale candidate
    policy; at 10^12 docs the MinHash-LSH tier (near_dup_minhash) generates
    candidates and THIS computation is the verify arm. The input is
    EXPLICITLY capped at doc_id < 20000 (a no-op at the sf0.01 gate scale)
    so the contract entry's plan is bounded-quadratic, never
    quadratic-in-table-size."""
    from biblib_spark.operators.winnow import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 20000), threshold=0.5
    )


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed word-4-gram fingerprints (MOSS selection; window 5). Pure
    JVM array pipeline, zero shuffle — the indexable-fraction fingerprint
    table a 100 TB corpus joins on."""
    from biblib_spark.operators.winnow import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir))


def _q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level dup CLUSTERS (exact-Jaccard edges -> CC -> sizes): the
    keep-one-per-cluster operation a training pipeline actually executes.
    Input capped at doc_id < 20000 (no-op at gate scale) like the pair
    entry, so the edge plan stays bounded-quadratic."""
    from biblib_spark.operators.winnow import doc_dup_clusters

    return doc_dup_clusters(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 20000), threshold=0.5
    )


def _q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plan: one row per planned frame (JVM
    sequence explode). Rows-only check (synthetic binary media)."""
    from biblib_spark.operators.multimodal import (
        frame_sample_plan,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, 120)
    video = media.filter(F.col("kind") == "video")
    return frame_sample_plan(video, every_ms=500).select(
        "media_id", "frame_idx", "ts_ms"
    )


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine near-dup — the correctness anchor for the LSH-bucket
    scale path (see ann.embedding_near_dup docstring). Input EXPLICITLY
    capped at vec_id < 20000 (no-op at gate scale) so the plan is
    bounded-quadratic, never quadratic-in-table-size."""
    from biblib_spark.operators.ann import embedding_near_dup

    return embedding_near_dup(
        _emb(spark, sf_dir).filter(F.col("vec_id") < 20000), threshold=0.4
    )


def _q_near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level SimHash near-dup (quarter-key candidates + JVM hamming
    verify). Oracle: the (rid, simhash64) fixture parquet — built pure-Python
    from the same kernel (biblib_spark/docfixtures.py) — lets DuckDB replay
    quarter keys, star cap, and bit_count(xor) exactly."""
    from biblib_spark.docfixtures import ensure_doc_fixture
    from biblib_spark.operators.textops import near_dup_pairs_simhash

    ensure_doc_fixture()
    return near_dup_pairs_simhash(_docs(spark, sf_dir), max_hamming=20)


def _q_near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates + exact 3-gram Jaccard verify. Oracle: the
    (rid, band_key) fixture parquet replays the bucket join + star cap; the
    Jaccard verify arm is plain ANSI SQL over the documents view."""
    from biblib_spark.docfixtures import ensure_doc_fixture
    from biblib_spark.operators.textops import near_dup_pairs_minhash

    ensure_doc_fixture()
    return near_dup_pairs_minhash(_docs(spark, sf_dir), threshold=0.5)


def _q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.docfixtures import ensure_doc_fixture
    from biblib_spark.operators.ann import cosine_topk_lsh

    ensure_doc_fixture()
    # 6 hyperplanes -> 64 sign buckets; at sf0.01 (500 vectors) that keeps
    # ~8 candidates per bucket so top-5 is usually fillable. Oracle: the
    # (query_id, neighbor_id) probe-candidate fixture + exact cosine rank.
    return cosine_topk_lsh(
        _emb(spark, sf_dir), query_ids=[0, 1, 2], k=5, n_planes=6
    ).withColumn("rank", F.col("rank").cast("long"))


def _q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-k (ann.cosine_topk_ivf): spherical-k-means
    quantizer trained on a deterministic bounded sample, one-cell-per-vector
    inverted index, nprobe-cell probe + exact cosine rerank. Oracle: the
    (vec_id, cell) and (query_id, cell) fixtures from the SAME train_ivf
    kernel; DuckDB replays the probe join and the exact rerank in SQL."""
    from biblib_spark.docfixtures import (
        IVF_ITERS,
        IVF_NLIST,
        IVF_NPROBE,
        IVF_SEED,
        IVF_TRAIN,
        ensure_doc_fixture,
    )
    from biblib_spark.operators.ann import cosine_topk_ivf

    ensure_doc_fixture()
    return cosine_topk_ivf(
        _emb(spark, sf_dir), query_ids=[0, 1, 2], k=5, nlist=IVF_NLIST,
        nprobe=IVF_NPROBE, seed=IVF_SEED, iters=IVF_ITERS,
        train_sample=IVF_TRAIN,
    ).withColumn("rank", F.col("rank").cast("long"))


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate in the contract: recall@5 of the multi-table
    multi-probe LSH (12 planes x 4 tables, 3 probe bits) vs exact cosine
    top-5 over the seeded planted-neighbor table (docfixtures.py — no
    runtime collect). A multi-probe regression below ~0.9 trips the hash."""
    from biblib_spark.docfixtures import ANN_PLANTED, ensure_doc_fixture
    from biblib_spark.operators.ann import cosine_topk, cosine_topk_lsh

    ensure_doc_fixture()
    planted = spark.read.parquet(ANN_PLANTED)
    exact = cosine_topk(planted, [0, 1, 2], k=5)
    lsh = cosine_topk_lsh(
        planted, [0, 1, 2], k=5, n_planes=12, n_tables=4, probe_bits=3, seed=7
    )
    hits = exact.join(
        lsh.select("query_id", "neighbor_id").withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / 5.0, 2))
    )


def _q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF twin of the ann_recall gate: recall@5 of the IVF-Flat index
    (nlist=16, nprobe=4) vs exact cosine top-5 over the same seeded
    planted-neighbor table. A cell-assignment or probe regression below the
    planted-recall level trips the hash."""
    from biblib_spark.docfixtures import (
        ANN_PLANTED,
        IVF_ITERS,
        IVF_NLIST,
        IVF_NPROBE,
        IVF_SEED,
        IVF_TRAIN,
        ensure_doc_fixture,
    )
    from biblib_spark.operators.ann import cosine_topk, cosine_topk_ivf

    ensure_doc_fixture()
    planted = spark.read.parquet(ANN_PLANTED)
    exact = cosine_topk(planted, [0, 1, 2], k=5)
    ivf = cosine_topk_ivf(
        planted, [0, 1, 2], k=5, nlist=IVF_NLIST, nprobe=IVF_NPROBE,
        seed=IVF_SEED, iters=IVF_ITERS, train_sample=IVF_TRAIN,
    )
    hits = exact.join(
        ivf.select("query_id", "neighbor_id").withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / 5.0, 2))
    )


def _q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biblib_spark.operators.textops import fingerprint_col

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_col(F.col("text")).alias("fingerprint")
    )


def _code_files(spark: SparkSession) -> DataFrame:
    """The deterministic code-corpus fixture as the raw input_hint table —
    both the Spark pipeline and the DuckDB oracle read these bytes."""
    from biblib_spark.codefixtures import CODE_FILES, ensure_code_fixture

    ensure_code_fixture()
    return spark.read.parquet(CODE_FILES)


def _q_code_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier E of the code-clone pipeline: sha256(content) identity groups
    (the input_hint per-row invariant doubles as the exact-dup key). Oracle:
    DuckDB recomputes sha256 from the same raw bytes — a true end-to-end
    hash-equality check of the ingest invariant."""
    return (
        _code_files(spark)
        .groupBy(F.sha2(F.col("content"), 256).alias("sha"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("row_id").alias("rep_id"),
        )
    )


def _q_code_norm_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-twin normalization check: type-1 groups keyed by md5 of the
    comment-stripped whitespace-collapsed text, Spark JVM regexp
    (codedup.normalize_code_col) vs the same chain replayed in DuckDB RE2
    from raw content — engine-independent agreement on the hash. (The
    production pipeline keys tier N on the lexer-grade normalizer instead;
    see code_norm_lexed_groups.)"""
    from biblib_spark.operators.codedup import normalize_code_col

    return (
        _code_files(spark)
        .groupBy(F.md5(normalize_code_col(F.col("content"))).alias("norm_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("row_id").alias("rep_id"),
        )
    )


def _q_code_norm_lexed_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production tier N: type-1 clone groups keyed by md5 of the
    string-literal-safe lexer normalization (kernels/codelex.py), computed
    inside the one-pass Arrow feature UDF. The normalizer itself is
    pytest-covered (string-literal round-trips, per-lang comment semantics,
    regex-twin agreement on marker-free code); this entry checks the Spark
    plumbing end-to-end against the kernel-built fixture hash."""
    from biblib_spark.operators.codedup import code_features

    return (
        code_features(_code_files(spark))
        .groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("rid").alias("rep_id"),
        )
    )


def _q_code_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier M: banded MinHash-LSH candidates over the identifier-canonicalized
    token stream, star-capped (C7), verified by exact token-4-gram Jaccard in
    JVM codegen. Oracle: the (rid, lang, bkey) fixture replays the bucket
    join + cap; the token grams are re-derived in SQL from the ctoks fixture
    (same Python kernel the Arrow UDF runs)."""
    from biblib_spark.operators.codedup import (
        code_features,
        jaccard_verified_pairs,
        minhash_candidate_pairs,
    )

    feat = code_features(_code_files(spark))
    return jaccard_verified_pairs(feat, minhash_candidate_pairs(feat))


def _q_code_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full north_rule pipeline over the input_hint table: exact +
    normalized + MinHash-LSH + winnowing-containment tiers -> connected
    components -> (row_id, cluster_id, cluster_size). Oracle: every tier
    replayed independently in SQL (sha256/norm from raw bytes, band/fp
    buckets from the kernel-twin fixtures, Jaccard + containment verify in
    list algebra) + a recursive-CTE min-label fixpoint for CC."""
    from biblib_spark.operators.codedup import code_dup_clusters

    return code_dup_clusters(_code_files(spark))


def _q_citation_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full citation pipeline (parse -> tiered dedup -> CC -> election) on
    the deterministic synthetic corpus, from raw payload bytes. Oracle: the
    ENTIRE pipeline replayed in DuckDB over the kernel-built e2e fixture
    (fixtures.ensure_e2e_fixture + _e2e_citation_sql) — parse features and
    similarity-tier keys from the same kernels, every operator (tiers, caps,
    verify arms, CC, election) re-implemented independently in SQL."""
    from biblib_spark.corpus import make_corpus
    from biblib_spark.operators.dedupe import dedupe_records, records_from_parsed
    from biblib_spark.sources.parse import parse_corpus

    corpus = make_corpus(spark, num_payloads=200, records_per_payload=6, seed=42)
    parsed = parse_corpus(corpus)
    return dedupe_records(records_from_parsed(parsed)).select(
        "rid", "cluster_id", F.col("is_unique").cast("int").alias("is_unique")
    )


# ---------------------------------------------------------------------------
# citation-engine fixture queries (oracle-checked M/C operators)
#
# The fixture parquet (built pure-Python from the same kernels — see
# biblib_spark/fixtures.py) is read by BOTH the Spark query and the DuckDB
# oracle; the oracle re-implements the operator independently in SQL.
# DuckDB's jaro_similarity matches the strsim-parity kernel bit-for-bit on
# the fixture; jaro_winkler is recomputed in SQL (uncapped-prefix Winkler
# correction, strsim 0.11.1 semantics) because DuckDB's builtin caps the
# prefix at 4 chars.
# ---------------------------------------------------------------------------


def _fixture(spark: SparkSession):
    from biblib_spark.fixtures import (
        CLUSTERS,
        FEATURES,
        PAIRS,
        ensure_oracle_fixture,
    )

    ensure_oracle_fixture()
    return (
        spark.read.parquet(FEATURES),
        spark.read.parquet(PAIRS),
        spark.read.parquet(CLUSTERS),
    )


def _q_cite_verify_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4-M8: the reference duplicate predicate over all within-year pairs."""
    from biblib_spark.operators.verify import verify_pairs

    feat, pairs, _ = _fixture(spark)
    return verify_pairs(pairs, feat)


def _q_cite_identity_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact-identity candidate pairs (doi / pmid / accession_number)."""
    from biblib_spark.operators.candidates import identity_keyed, self_join_pairs

    feat, _, _ = _fixture(spark)
    keyed = identity_keyed(feat)
    # max_bucket 1<<20 = effectively uncapped: this oracle row replays the
    # RAW identity tier so the DuckDB SQL can mirror it without the star
    # rewrite; production paths go through the capped flat_candidate_keys /
    # candidate_pairs (MAX_BUCKET 64 + salting) — fixture scale only
    return self_join_pairs(keyed, ["year_key", "bkey"], max_bucket=1 << 20).distinct()


def _q_cite_year_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: year blocking (null year -> block 0)."""
    feat, _, _ = _fixture(spark)
    return feat.groupBy("year_key").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.count(F.when(F.col("doi").isNotNull() & (F.col("doi") != ""), 1)).alias(
            "n_with_doi"
        ),
        F.min("rid").alias("min_rid"),
    )


def _q_cite_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4-M8 + C6 + M11: verify -> connected components -> singleton passthrough."""
    from biblib_spark.operators.components import assign_clusters
    from biblib_spark.operators.verify import verify_pairs

    feat, pairs, _ = _fixture(spark)
    edges = verify_pairs(pairs, feat)
    return assign_clusters(feat.select("rid"), edges)


def _q_cite_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: affix-key admission (prefix/suffix slices) + substring verify arm,
    entirely JVM-side expressions."""
    from biblib_spark.operators.candidates import affix_keyed, self_join_pairs
    from biblib_spark.operators.verify import containment_pairs

    feat, _, _ = _fixture(spark)
    keyed = affix_keyed(feat, "prefix", 24).unionByName(
        affix_keyed(feat, "suffix", 24)
    )
    # uncapped for the same reason as _q_cite_identity_tiers: raw-tier
    # oracle replay at fixture scale; production uses the capped paths
    cand = self_join_pairs(keyed, ["year_key", "bkey"], max_bucket=1 << 20).distinct()
    return containment_pairs(cand, feat, min_len=20)


def _q_cite_election_prefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 arm 1: source-preference cascade (PubMed > RIS)."""
    from biblib_spark.operators.election import elect_representatives

    _, _, clusters = _fixture(spark)
    return elect_representatives(clusters, ["PubMed", "RIS"]).select(
        "rid", "cluster_id", F.col("is_unique").cast("int").alias("is_unique")
    )


def _q_cite_election_abstract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 arm 2: no preferences -> abstract/DOI cascade."""
    from biblib_spark.operators.election import elect_representatives

    _, _, clusters = _fixture(spark)
    return elect_representatives(clusters, []).select(
        "rid", "cluster_id", F.col("is_unique").cast("int").alias("is_unique")
    )


def _doc_oracles() -> dict[str, str]:
    """Oracles for the kernel-backed doc/embedding operators. The non-SQL
    parts (simhash, band keys, LSH buckets) come from the pure-Python-built
    fixture parquet (docfixtures.py, same kernels as the UDFs); the operator
    itself — star-capped bucket self-join (C7), hamming / Jaccard / cosine
    verify, top-k rank — is re-implemented here independently in SQL."""
    from biblib_spark.docfixtures import (
        ANN_CAND_IVF_PLANTED,
        ANN_CAND_PLAIN,
        ANN_CAND_PLANTED,
        ANN_CELLS_IVF,
        ANN_PLANTED,
        ANN_PROBES_IVF,
        DOC_BANDS,
        DOC_SIMHASH,
        ensure_doc_fixture,
    )

    ensure_doc_fixture()
    return {
        "near_dup_simhash": (
            f"WITH s AS (SELECT rid, sh FROM read_parquet('{DOC_SIMHASH}')),"
            " k AS (SELECT rid, (q::BIGINT << 16) | ((sh >> (16*q)) & 65535)"
            "  AS bkey FROM s, range(4) t(q)),"
            " g AS (SELECT bkey, count(*) AS n, min(rid) AS mn FROM k"
            "  GROUP BY bkey),"
            " small AS (SELECT k1.rid AS a, k2.rid AS b FROM k k1"
            "  JOIN k k2 ON k1.bkey = k2.bkey AND k1.rid < k2.rid"
            "  JOIN g ON g.bkey = k1.bkey AND g.n <= 64),"
            " big AS (SELECT g.mn AS a, k.rid AS b FROM k"
            "  JOIN g ON g.bkey = k.bkey AND g.n > 64 AND k.rid <> g.mn),"
            " cand AS (SELECT DISTINCT a, b FROM"
            "  (SELECT * FROM small UNION ALL SELECT * FROM big))"
            " SELECT c.a, c.b, bit_count(xor(s1.sh, s2.sh))::INT AS hamming"
            " FROM cand c JOIN s s1 ON c.a = s1.rid JOIN s s2 ON c.b = s2.rid"
            " WHERE bit_count(xor(s1.sh, s2.sh)) <= 20"
        ),
        "near_dup_minhash": (
            f"WITH kk AS (SELECT rid, lsh_key FROM read_parquet('{DOC_BANDS}')),"
            " g AS (SELECT lsh_key, count(*) AS n, min(rid) AS mn FROM kk"
            "  GROUP BY lsh_key),"
            " small AS (SELECT k1.rid AS a, k2.rid AS b FROM kk k1"
            "  JOIN kk k2 ON k1.lsh_key = k2.lsh_key AND k1.rid < k2.rid"
            "  JOIN g ON g.lsh_key = k1.lsh_key AND g.n <= 64),"
            " big AS (SELECT g.mn AS a, kk.rid AS b FROM kk"
            "  JOIN g ON g.lsh_key = kk.lsh_key AND g.n > 64 AND kk.rid <> g.mn),"
            " cand AS (SELECT DISTINCT a, b FROM"
            "  (SELECT * FROM small UNION ALL SELECT * FROM big)),"
            " t AS (SELECT doc_id,"
            "  regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt"
            "  FROM documents),"
            " gs AS (SELECT doc_id, CASE WHEN length(nt) >= 3 THEN"
            "   list_distinct([substring(nt, i, 3)"
            "     FOR i IN range(1, length(nt) - 1)])"
            "  WHEN length(nt) > 0 THEN [nt] ELSE [] END AS grams FROM t),"
            " j AS (SELECT c.a, c.b,"
            "  len(list_intersect(g1.grams, g2.grams))::DOUBLE"
            "   / len(list_distinct(g1.grams || g2.grams)) AS jaccard"
            "  FROM cand c JOIN gs g1 ON c.a = g1.doc_id"
            "  JOIN gs g2 ON c.b = g2.doc_id)"
            " SELECT a, b, round(jaccard, 4) AS jaccard FROM j"
            " WHERE jaccard >= 0.5"
        ),
        "ann_topk_lsh": (
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec"
            "  FROM embeddings),"
            f" c AS (SELECT query_id, neighbor_id"
            f"  FROM read_parquet('{ANN_CAND_PLAIN}')),"
            " scored AS (SELECT c.query_id, c.neighbor_id,"
            "  list_dot_product(b.vec, q.vec)"
            "   / (sqrt(list_dot_product(b.vec, b.vec))"
            "    * sqrt(list_dot_product(q.vec, q.vec))) AS s"
            "  FROM c JOIN base b ON c.neighbor_id = b.vec_id"
            "  JOIN base q ON c.query_id = q.vec_id),"
            " ranked AS (SELECT query_id, neighbor_id, row_number() OVER"
            "  (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank,"
            "  round(s, 4) AS sim FROM scored)"
            " SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5"
        ),
        "ann_topk_ivf": (
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec"
            "  FROM embeddings),"
            f" cells AS (SELECT vec_id, cell"
            f"  FROM read_parquet('{ANN_CELLS_IVF}')),"
            f" probes AS (SELECT query_id, cell"
            f"  FROM read_parquet('{ANN_PROBES_IVF}')),"
            " cand AS (SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id"
            "  FROM probes p JOIN cells c USING (cell)"
            "  WHERE c.vec_id <> p.query_id),"
            " scored AS (SELECT cand.query_id, cand.neighbor_id,"
            "  list_dot_product(b.vec, q.vec)"
            "   / (sqrt(list_dot_product(b.vec, b.vec))"
            "    * sqrt(list_dot_product(q.vec, q.vec))) AS s"
            "  FROM cand JOIN base b ON cand.neighbor_id = b.vec_id"
            "  JOIN base q ON cand.query_id = q.vec_id),"
            " ranked AS (SELECT query_id, neighbor_id, row_number() OVER"
            "  (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank,"
            "  round(s, 4) AS sim FROM scored)"
            " SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5"
        ),
        "ann_recall": (
            f"WITH base AS (SELECT vec_id, embedding AS vec"
            f"  FROM read_parquet('{ANN_PLANTED}')),"
            " q AS (SELECT vec_id AS query_id, vec AS qvec FROM base"
            "  WHERE vec_id IN (0, 1, 2)),"
            " scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,"
            "  list_dot_product(b.vec, q.qvec)"
            "   / (sqrt(list_dot_product(b.vec, b.vec))"
            "    * sqrt(list_dot_product(q.qvec, q.qvec))) AS s"
            "  FROM base b, q WHERE b.vec_id <> q.query_id),"
            " exact5 AS (SELECT query_id, neighbor_id FROM"
            "  (SELECT query_id, neighbor_id, row_number() OVER"
            "   (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn"
            "   FROM scored) WHERE rn <= 5),"
            f" cand AS (SELECT query_id, neighbor_id"
            f"  FROM read_parquet('{ANN_CAND_PLANTED}')),"
            " lsh5 AS (SELECT query_id, neighbor_id FROM"
            "  (SELECT sc.query_id, sc.neighbor_id, row_number() OVER"
            "   (PARTITION BY sc.query_id ORDER BY sc.s DESC,"
            "    sc.neighbor_id ASC) AS rn"
            "   FROM scored sc JOIN cand USING (query_id, neighbor_id))"
            "  WHERE rn <= 5)"
            " SELECT e.query_id, count(l.neighbor_id)::BIGINT AS n_hits,"
            "  round(count(l.neighbor_id) / 5.0, 2) AS recall"
            " FROM exact5 e LEFT JOIN lsh5 l"
            "  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id"
            " GROUP BY e.query_id"
        ),
        "ann_recall_ivf": (
            f"WITH base AS (SELECT vec_id, embedding AS vec"
            f"  FROM read_parquet('{ANN_PLANTED}')),"
            " q AS (SELECT vec_id AS query_id, vec AS qvec FROM base"
            "  WHERE vec_id IN (0, 1, 2)),"
            " scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,"
            "  list_dot_product(b.vec, q.qvec)"
            "   / (sqrt(list_dot_product(b.vec, b.vec))"
            "    * sqrt(list_dot_product(q.qvec, q.qvec))) AS s"
            "  FROM base b, q WHERE b.vec_id <> q.query_id),"
            " exact5 AS (SELECT query_id, neighbor_id FROM"
            "  (SELECT query_id, neighbor_id, row_number() OVER"
            "   (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn"
            "   FROM scored) WHERE rn <= 5),"
            f" cand AS (SELECT query_id, neighbor_id"
            f"  FROM read_parquet('{ANN_CAND_IVF_PLANTED}')),"
            " ivf5 AS (SELECT query_id, neighbor_id FROM"
            "  (SELECT sc.query_id, sc.neighbor_id, row_number() OVER"
            "   (PARTITION BY sc.query_id ORDER BY sc.s DESC,"
            "    sc.neighbor_id ASC) AS rn"
            "   FROM scored sc JOIN cand USING (query_id, neighbor_id))"
            "  WHERE rn <= 5)"
            " SELECT e.query_id, count(l.neighbor_id)::BIGINT AS n_hits,"
            "  round(count(l.neighbor_id) / 5.0, 2) AS recall"
            " FROM exact5 e LEFT JOIN ivf5 l"
            "  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id"
            " GROUP BY e.query_id"
        ),
    }


def _code_oracles() -> dict[str, str]:
    from biblib_spark.codefixtures import (
        CODE_BANDS,
        CODE_CTOKS,
        CODE_FILES,
        CODE_WFPS,
        ensure_code_fixture,
    )

    ensure_code_fixture()
    # JVM regexp chain of codedup.normalize_code_col replayed in RE2
    norm = (
        r"trim(regexp_replace(regexp_replace(regexp_replace("
        r"regexp_replace(content, '(?s)/\*.*?\*/', ' ', 'g'),"
        r" '//[^\n]*', ' ', 'g'), '#[^\n]*', ' ', 'g'), '\s+', ' ', 'g'))"
    )
    # token-4-gram md5 arrays from the canonicalized token stream — an
    # INDEPENDENT re-derivation of codedup's gram sets (Spark hashes grams
    # to int64 in code_feature_rows; only intersect/union COUNTS meet the
    # contract, and those agree for any collision-free hash)
    grams = (
        f"t AS (SELECT rid, ctoks, string_split(ctoks, ' ') AS words"
        f"  FROM read_parquet('{CODE_CTOKS}')),"
        " gs AS (SELECT rid, CASE WHEN len(words) >= 4 THEN"
        "   list_distinct([md5(array_to_string(words[i:i+3], ' '))"
        "     FOR i IN range(1, len(words) - 2)])"
        "  ELSE [md5(ctoks)] END AS grams FROM t)"
    )
    # star-capped bucket self-join replay (C7, cap 64) over a (rid, lang, key)
    # table named {src}; emits cand_{tag}(a, b) rows per shared bucket
    def _bucket_pairs(src: str, key: str, tag: str) -> str:
        return (
            f" g_{tag} AS (SELECT lang, {key}, count(*) AS n, min(rid) AS mn"
            f"  FROM {src} GROUP BY lang, {key}),"
            f" small_{tag} AS (SELECT k1.rid AS a, k2.rid AS b FROM {src} k1"
            f"  JOIN {src} k2 ON k1.lang = k2.lang AND k1.{key} = k2.{key}"
            f"   AND k1.rid < k2.rid"
            f"  JOIN g_{tag} ON g_{tag}.lang = k1.lang"
            f"   AND g_{tag}.{key} = k1.{key} AND g_{tag}.n <= 64),"
            f" big_{tag} AS (SELECT g_{tag}.mn AS a, {src}.rid AS b FROM {src}"
            f"  JOIN g_{tag} ON g_{tag}.lang = {src}.lang"
            f"   AND g_{tag}.{key} = {src}.{key} AND g_{tag}.n > 64"
            f"   AND {src}.rid <> g_{tag}.mn),"
            f" cand_{tag} AS (SELECT a, b FROM"
            f"  (SELECT * FROM small_{tag} UNION ALL SELECT * FROM big_{tag}))"
        )

    minhash_verified = (
        f"kk AS (SELECT rid, lang, bkey FROM read_parquet('{CODE_BANDS}')),"
        + _bucket_pairs("kk", "bkey", "m")
        + f", {grams},"
        " jm AS (SELECT c.a, c.b,"
        "  round(len(list_intersect(g1.grams, g2.grams))::DOUBLE"
        "   / len(list_distinct(g1.grams || g2.grams)), 4) AS jac"
        "  FROM (SELECT a, b FROM cand_m GROUP BY a, b"
        "   HAVING count(*) >= 2) c"  # >=2 shared bands (MINHASH_MIN_BANDS)
        "  JOIN gs g1 ON c.a = g1.rid JOIN gs g2 ON c.b = g2.rid),"
        " vm AS (SELECT a, b, jac FROM jm WHERE jac >= 0.6)"
    )

    return {
        "code_exact_dup_groups": (
            f"SELECT sha256(content) AS sha, count(*) AS n_files,"
            f" min(row_id) AS rep_id FROM read_parquet('{CODE_FILES}')"
            " GROUP BY 1"
        ),
        "code_norm_dup_groups": (
            f"SELECT md5({norm}) AS norm_hash, count(*) AS n_files,"
            f" min(row_id) AS rep_id FROM read_parquet('{CODE_FILES}')"
            " GROUP BY 1"
        ),
        "code_norm_lexed_groups": (
            f"SELECT norm_hash, count(*) AS n_files, min(rid) AS rep_id"
            f" FROM read_parquet('{CODE_CTOKS}') GROUP BY 1"
        ),
        "code_minhash_pairs": (
            f"WITH {minhash_verified} SELECT a, b, jac FROM vm"
        ),
        "code_dup_clusters": (
            "WITH RECURSIVE "
            f"files AS (SELECT * FROM read_parquet('{CODE_FILES}')),"
            # tier E + N: same-key groups connect member -> min rid
            " sh AS (SELECT row_id AS rid, lang, sha256(content) AS k"
            "  FROM files),"
            # tier N key: the lexer-grade normalization is a state machine
            # (kernels/codelex.py), not SQL-expressible — the oracle reads
            # the kernel-built hash fixture like it reads bands/fingerprints
            f" nh AS (SELECT rid, lang, norm_hash AS k"
            f"  FROM read_parquet('{CODE_CTOKS}')),"
            " ex AS (SELECT min(rid) OVER (PARTITION BY lang, k) AS a,"
            "  rid AS b FROM sh),"
            " nm AS (SELECT min(rid) OVER (PARTITION BY lang, k) AS a,"
            "  rid AS b FROM nh),"
            f" {minhash_verified},"
            # tier W: winnowed-fingerprint candidates (>=2 shared fps under
            # the same cap) verified by token-gram containment >= 0.7
            f" wk AS (SELECT rid, lang, fp FROM read_parquet('{CODE_WFPS}')),"
            + _bucket_pairs("wk", "fp", "w")
            + ","
            " wc AS (SELECT a, b FROM cand_w GROUP BY a, b"
            "  HAVING count(*) >= 2),"
            " wv AS (SELECT wc.a, wc.b FROM wc"
            "  JOIN gs g1 ON wc.a = g1.rid JOIN gs g2 ON wc.b = g2.rid"
            "  WHERE round(len(list_intersect(g1.grams, g2.grams))::DOUBLE"
            "   / least(len(g1.grams), len(g2.grams)), 4) >= 0.7),"
            " edges0 AS (SELECT a, b FROM ex WHERE a <> b"
            "  UNION SELECT a, b FROM nm WHERE a <> b"
            "  UNION SELECT a, b FROM vm UNION SELECT a, b FROM wv),"
            " edges AS (SELECT a AS src, b AS dst FROM edges0"
            "  UNION ALL SELECT b, a FROM edges0),"
            " cc(rid, label) AS ("
            "  SELECT row_id, row_id FROM files"
            "  UNION"
            "  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.rid),"
            " lab AS (SELECT rid, min(label) AS cluster_id FROM cc GROUP BY rid),"
            " sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab"
            "  GROUP BY cluster_id)"
            " SELECT lab.rid AS row_id, lab.cluster_id, sz.cluster_size"
            " FROM lab JOIN sz USING (cluster_id)"
        ),
    }


def _cite_oracles() -> dict[str, str]:
    from biblib_spark.fixtures import CLUSTERS, FEATURES, PAIRS

    # shared CTE chain: field matches + strsim-parity similarity + the M4-M8
    # arm predicate over predefined CTEs f(features) and p(a, b) candidates
    # (reference src/dedupe.rs:594-655) — used by the fixture-pair entries
    # below and by the flagship e2e replay (_e2e_oracle)
    verify_chain = (
        " j AS (SELECT p.a, p.b, f1.norm_title AS t1, f2.norm_title AS t2,"
        "  f1.doi AS d1, f2.doi AS d2,"
        "  (coalesce(f1.norm_journal = f2.norm_journal, false)"
        "   OR coalesce(f1.norm_journal_abbr = f2.norm_journal_abbr, false)"
        "   OR coalesce(f1.norm_journal = f2.norm_journal_abbr, false)"
        "   OR coalesce(f1.norm_journal_abbr = f2.norm_journal, false)) AS jm,"
        "  coalesce(list_has_any(f1.norm_issn, f2.norm_issn), false) AS im,"
        "  (f1.norm_volume <> '' AND f2.norm_volume <> ''"
        "   AND f1.norm_volume = f2.norm_volume) AS vm,"
        "  (f1.pages IS NOT NULL AND f2.pages IS NOT NULL"
        "   AND f1.pages = f2.pages) AS pm,"
        "  (f1.year IS NOT DISTINCT FROM f2.year) AS ym"
        "  FROM p JOIN f f1 ON p.a = f1.rid JOIN f f2 ON p.b = f2.rid),"
        " s AS (SELECT *,"
        "  (d1 IS NOT NULL AND d1 <> '' AND d2 IS NOT NULL AND d2 <> '') AS both_doi,"
        "  CASE WHEN t1 = '' AND t2 = '' THEN 1.0"
        "       ELSE jaro_similarity(t1, t2) END AS jsim,"
        "  coalesce(list_min([i FOR i IN range(1,"
        "    least(length(t1), length(t2)) + 1)"
        "    IF substring(t1, i, 1) <> substring(t2, i, 1)]),"
        "   least(length(t1), length(t2)) + 1) - 1 AS pref"
        "  FROM j),"
        " v AS (SELECT *, CASE WHEN t1 = '' AND t2 = '' THEN 1.0"
        "   ELSE least(jsim + 0.1 * pref * (1 - jsim), 1.0) END AS jwsim FROM s),"
        " verified AS (SELECT a, b FROM v WHERE CASE WHEN both_doi THEN"
        "   (coalesce(d1 = d2, false) AND jsim >= 0.85 AND (jm OR im))"
        "   OR (coalesce(d1 = d2, false) AND jsim >= 0.99 AND (vm OR pm))"
        "   OR (jsim >= 0.99 AND ym AND (vm OR pm) AND (jm OR im))"
        "  ELSE"
        "   (jwsim >= 0.93 AND (vm OR pm) AND (jm OR im))"
        "   OR (jwsim >= 0.99 AND ym AND vm AND pm)"
        "  END)"
    )

    scored = (
        f"f AS (SELECT * FROM read_parquet('{FEATURES}')),"
        f" p AS (SELECT * FROM read_parquet('{PAIRS}')),"
        + verify_chain
    )

    election = (
        f"WITH c AS (SELECT * FROM read_parquet('{CLUSTERS}')),"
        " e AS (SELECT *, {pref} AS pref,"
        "  CASE WHEN abstract_text IS NOT NULL THEN 1 ELSE 0 END AS ab,"
        "  CASE WHEN abstract_text IS NOT NULL AND doi IS NOT NULL"
        "   AND doi <> '' THEN 1 ELSE 0 END AS abdoi FROM c),"
        " w AS (SELECT *, min(pref) OVER (PARTITION BY cluster_id) AS min_pref,"
        "  sum(ab) OVER (PARTITION BY cluster_id) AS n_abs FROM e),"
        " sc AS (SELECT *, CASE"
        "  WHEN min_pref < 1073741824 THEN"
        "   (CASE WHEN pref = min_pref THEN 0 ELSE 1 END)"
        "  WHEN n_abs = 0 THEN 0"
        "  WHEN n_abs = 1 THEN 1 - ab"
        "  WHEN abdoi = 1 THEN 0 WHEN ab = 1 THEN 1 ELSE 2 END AS sort_class"
        "  FROM w)"
        " SELECT rid, cluster_id, (row_number() OVER (PARTITION BY cluster_id"
        "  ORDER BY sort_class ASC, rid ASC) = 1)::INT AS is_unique FROM sc"
    )

    return {
        "cite_verify_predicate": f"WITH {scored} SELECT a, b FROM verified",
        "cite_identity_tiers": (
            f"WITH f AS (SELECT * FROM read_parquet('{FEATURES}')),"
            " k AS ("
            "  SELECT year_key, 'doi' AS tier, doi AS key, rid FROM f"
            "   WHERE doi IS NOT NULL AND doi <> ''"
            "  UNION ALL SELECT year_key, 'pmid', pmid, rid FROM f"
            "   WHERE pmid IS NOT NULL AND pmid <> ''"
            "  UNION ALL SELECT year_key, 'accn', accession_number, rid FROM f"
            "   WHERE accession_number IS NOT NULL AND accession_number <> '')"
            " SELECT DISTINCT k1.rid AS a, k2.rid AS b FROM k k1 JOIN k k2"
            "  ON k1.year_key = k2.year_key AND k1.tier = k2.tier"
            "  AND k1.key = k2.key AND k1.rid < k2.rid"
        ),
        "cite_year_blocks": (
            f"SELECT year_key, count(*) AS n_records,"
            " count(*) FILTER (doi IS NOT NULL AND doi <> '') AS n_with_doi,"
            f" min(rid) AS min_rid FROM read_parquet('{FEATURES}')"
            " GROUP BY year_key"
        ),
        "cite_clusters": (
            # C6 as a recursive CTE: min reachable rid over the symmetric
            # verified edge set; vertices seeded with their own rid covers
            # singleton passthrough (M11)
            f"WITH RECURSIVE {scored},"
            " edges AS (SELECT a AS src, b AS dst FROM verified"
            "  UNION ALL SELECT b, a FROM verified),"
            " cc(rid, label) AS ("
            "  SELECT rid, rid FROM f"
            "  UNION"
            "  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.rid)"
            " SELECT rid, min(label) AS cluster_id FROM cc GROUP BY rid"
        ),
        "cite_containment": (
            f"WITH f AS (SELECT * FROM read_parquet('{FEATURES}')),"
            " keyed AS ("
            "  SELECT year_key, 'p' AS tier, substring(norm_title, 1, 24) AS key,"
            "   rid FROM f WHERE length(norm_title) >= 24"
            "  UNION ALL SELECT year_key, 's',"
            "   substring(norm_title, length(norm_title) - 23, 24), rid"
            "   FROM f WHERE length(norm_title) >= 24),"
            " cand AS (SELECT DISTINCT k1.rid AS a, k2.rid AS b FROM keyed k1"
            "  JOIN keyed k2 ON k1.year_key = k2.year_key AND k1.tier = k2.tier"
            "  AND k1.key = k2.key AND k1.rid < k2.rid),"
            " j AS (SELECT cand.a, cand.b,"
            "  f1.norm_title AS t1, f2.norm_title AS t2,"
            "  (coalesce(f1.norm_journal = f2.norm_journal, false)"
            "   OR coalesce(f1.norm_journal_abbr = f2.norm_journal_abbr, false)"
            "   OR coalesce(f1.norm_journal = f2.norm_journal_abbr, false)"
            "   OR coalesce(f1.norm_journal_abbr = f2.norm_journal, false)) AS jm,"
            "  coalesce(list_has_any(f1.norm_issn, f2.norm_issn), false) AS im,"
            "  (f1.norm_volume <> '' AND f2.norm_volume <> ''"
            "   AND f1.norm_volume = f2.norm_volume) AS vm,"
            "  (f1.pages IS NOT NULL AND f2.pages IS NOT NULL"
            "   AND f1.pages = f2.pages) AS pm,"
            "  (f1.year IS NOT DISTINCT FROM f2.year) AS ym"
            "  FROM cand JOIN f f1 ON cand.a = f1.rid JOIN f f2 ON cand.b = f2.rid)"
            " SELECT a, b FROM j WHERE least(length(t1), length(t2)) >= 20"
            "  AND (CASE WHEN length(t1) <= length(t2) THEN contains(t2, t1)"
            "       ELSE contains(t1, t2) END)"
            "  AND ym AND (vm OR pm) AND (jm OR im)"
        ),
        "cite_election_prefs": election.format(
            pref=(
                "CASE WHEN source = 'PubMed' THEN 0"
                " WHEN source = 'RIS' THEN 1 ELSE 1073741824 END"
            )
        ),
        "cite_election_abstract": election.format(pref="1073741824"),
        "citation_clusters": _e2e_citation_sql(verify_chain),
    }


def _e2e_citation_sql(verify_chain: str) -> str:
    """Full-pipeline replay for the flagship e2e entry (codefixtures.py
    pattern on the citation arm): the features and similarity-tier keys come
    from the kernel-built fixture over the SAME corpus the Spark query
    parses from raw bytes (fixtures.ensure_e2e_fixture); every OPERATOR —
    tier admission with the C7 star cap (max_bucket 64), C5 pair dedup, the
    M4-M8 verify arms, the C4 containment arm, C6 connected components, the
    M10 abstract/DOI election — is re-implemented here independently in SQL.
    Tier keys are tag-prefixed strings where Spark uses tier-salted xxhash64
    (flat_candidate_keys): bucket partitions agree for any collision-free
    hash."""
    from biblib_spark.fixtures import (
        E2E_FEATURES,
        E2E_LSH,
        E2E_SIM,
        ensure_e2e_fixture,
    )

    ensure_e2e_fixture()
    return (
        "WITH RECURSIVE "
        f"f AS (SELECT * FROM read_parquet('{E2E_FEATURES}')),"
        # tier keys: identity (C1) from feature columns, LSH bands / SimHash
        # quarters (C2-C3) from the kernel-built fixtures, affix slices (C4
        # admission) derived in SQL — tag-prefixed so tiers never merge
        " keyed AS ("
        "  SELECT rid, year_key, 'd|' || doi AS kb FROM f"
        "   WHERE doi IS NOT NULL AND doi <> ''"
        "  UNION ALL SELECT rid, year_key, 'm|' || pmid FROM f"
        "   WHERE pmid IS NOT NULL AND pmid <> ''"
        "  UNION ALL SELECT rid, year_key, 'a|' || accession_number FROM f"
        "   WHERE accession_number IS NOT NULL AND accession_number <> ''"
        "  UNION ALL SELECT rid, year_key, 'l|' || k::VARCHAR"
        f"  FROM read_parquet('{E2E_LSH}')"
        "  UNION ALL SELECT rid, year_key, 's|' || k::VARCHAR"
        f"  FROM read_parquet('{E2E_SIM}')"
        "  UNION ALL SELECT rid, year_key, 'p|' || substring(norm_title, 1, 24)"
        "   FROM f WHERE length(norm_title) >= 24"
        "  UNION ALL SELECT rid, year_key,"
        "   'x|' || substring(norm_title, length(norm_title) - 23, 24)"
        "   FROM f WHERE length(norm_title) >= 24),"
        # C7 star-cap replay on (year_key, kb), cap 64: small buckets emit
        # all pairs, oversize buckets star against the min rid
        " g AS (SELECT year_key, kb, count(*) AS n, min(rid) AS mn FROM keyed"
        "  GROUP BY 1, 2),"
        " ksml AS (SELECT k1.rid AS a, k2.rid AS b FROM keyed k1"
        "  JOIN keyed k2 ON k1.year_key = k2.year_key AND k1.kb = k2.kb"
        "   AND k1.rid < k2.rid"
        "  JOIN g ON g.year_key = k1.year_key AND g.kb = k1.kb AND g.n <= 64),"
        " kbig AS (SELECT g.mn AS a, keyed.rid AS b FROM keyed"
        "  JOIN g ON g.year_key = keyed.year_key AND g.kb = keyed.kb"
        "   AND g.n > 64 AND keyed.rid <> g.mn),"
        # C5: one verify per unordered pair
        " p AS (SELECT DISTINCT a, b FROM"
        "  (SELECT a, b FROM ksml UNION ALL SELECT a, b FROM kbig)),"
        + verify_chain
        + ","
        # C4 containment verify arm (verify_pairs(containment=True)): the
        # shorter title a strict substring of the longer, same-year +
        # volume/pages + journal/issn corroboration
        " contained AS (SELECT a, b FROM v"
        "  WHERE least(length(t1), length(t2)) >= 20"
        "  AND (CASE WHEN length(t1) <= length(t2) THEN contains(t2, t1)"
        "       ELSE contains(t1, t2) END)"
        "  AND ym AND (vm OR pm) AND (jm OR im)),"
        " edges0 AS (SELECT a, b FROM verified"
        "  UNION SELECT a, b FROM contained),"
        " edges AS (SELECT a AS src, b AS dst FROM edges0"
        "  UNION ALL SELECT b, a FROM edges0),"
        # C6 min-label fixpoint; vertices seeded with their own rid (M11)
        " cc(rid, label) AS ("
        "  SELECT rid, rid FROM f"
        "  UNION"
        "  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.rid),"
        " lab AS (SELECT rid, min(label) AS cluster_id FROM cc GROUP BY rid),"
        # M10 election, no source preferences -> abstract/DOI cascade
        " el AS (SELECT lab.rid, lab.cluster_id,"
        "  CASE WHEN f.abstract_text IS NOT NULL THEN 1 ELSE 0 END AS ab,"
        "  CASE WHEN f.abstract_text IS NOT NULL AND f.doi IS NOT NULL"
        "   AND f.doi <> '' THEN 1 ELSE 0 END AS abdoi"
        "  FROM lab JOIN f ON lab.rid = f.rid),"
        " w AS (SELECT *, sum(ab) OVER (PARTITION BY cluster_id) AS n_abs"
        "  FROM el),"
        " sc AS (SELECT *, CASE WHEN n_abs = 0 THEN 0"
        "  WHEN n_abs = 1 THEN 1 - ab"
        "  WHEN abdoi = 1 THEN 0 WHEN ab = 1 THEN 1 ELSE 2 END AS sort_class"
        "  FROM w)"
        " SELECT rid, cluster_id, (row_number() OVER (PARTITION BY cluster_id"
        "  ORDER BY sort_class ASC, rid ASC) = 1)::INT AS is_unique FROM sc"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "normalized_dedup": _q_normalized_dedup,
        "doc_stats": _q_doc_stats,
        "lang_summary": _q_lang_summary,
        "lang_representatives": _q_lang_representatives,
        "ann_topk": _q_ann_topk,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "top_customers": _q_top_customers,
        "ngram_jaccard_dups": _q_ngram_jaccard_dups,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "doc_dup_clusters": _q_doc_dup_clusters,
        "embedding_near_dup": _q_embedding_near_dup,
        "events_by_type": _q_events_by_type,
        "parts_revenue": _q_parts_revenue,
        "user_sessions": _q_user_sessions,
        "lang_id": _q_lang_id,
        "quality_filter": _q_quality_filter,
        "repetition_filter": _q_repetition_filter,
        "token_freq": _q_token_freq,
        # citation-engine operators over the shared oracle fixture
        "cite_verify_predicate": _q_cite_verify_predicate,
        "cite_identity_tiers": _q_cite_identity_tiers,
        "cite_year_blocks": _q_cite_year_blocks,
        "cite_clusters": _q_cite_clusters,
        "cite_containment": _q_cite_containment,
        "cite_election_prefs": _q_cite_election_prefs,
        "cite_election_abstract": _q_cite_election_abstract,
        # kernel-backed operators over the doc/embedding oracle fixture
        "near_dup_minhash": _q_near_dup_minhash,
        "near_dup_simhash": _q_near_dup_simhash,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "ann_recall": _q_ann_recall,
        "ann_recall_ivf": _q_ann_recall_ivf,
        "doc_fingerprints": _q_doc_fingerprints,
        # source-code clone pipeline over the input_hint table
        "code_exact_dup_groups": _q_code_exact_dup_groups,
        "code_norm_dup_groups": _q_code_norm_dup_groups,
        "code_norm_lexed_groups": _q_code_norm_lexed_groups,
        "code_minhash_pairs": _q_code_minhash_pairs,
        "code_dup_clusters": _q_code_dup_clusters,
        # flagship e2e: raw payloads -> clusters, full-pipeline SQL replay
        "citation_clusters": _q_citation_clusters,
        # multimodal: real PNG/WAV decode, fixture-replayed oracle
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
    }


def _media_oracles() -> dict[str, str]:
    """Media-entry oracles over the kernel-built feature fixture
    (fixtures.ensure_media_fixture — same codefixtures.py pattern): the
    per-item decode features come from the SAME pure-numpy kernel the Arrow
    UDF runs (persisted pure-Python, no Spark); the exact-dup grouping
    (media_dedup_exact's n_copies on the representative) and the
    frame-sampling explode are re-implemented independently in SQL."""
    from biblib_spark.fixtures import MEDIA_FEATURES, ensure_media_fixture

    ensure_media_fixture()
    return {
        "media_features": (
            "WITH g AS (SELECT *,"
            "  count(*) OVER (PARTITION BY content_crc) AS grp_n,"
            "  min(media_id) OVER (PARTITION BY content_crc) AS grp_rep"
            f" FROM read_parquet('{MEDIA_FEATURES}'))"
            " SELECT media_id, kind, n_bytes, content_crc, width, height,"
            "  duration_ms, mean_luma, rms, zcr, CAST(decoded AS INT) AS decoded,"
            "  CASE WHEN grp_n > 1 AND media_id = grp_rep THEN grp_n END"
            "   AS n_copies"
            " FROM g"
        ),
        "media_frames": (
            "SELECT media_id, f.frame_idx AS frame_idx,"
            "  f.frame_idx * 500 AS ts_ms"
            f" FROM read_parquet('{MEDIA_FEATURES}')"
            " CROSS JOIN LATERAL unnest(generate_series(0,"
            "   CAST(floor(meta_duration_ms / 500.0) AS INT))) AS f(frame_idx)"
            " WHERE kind = 'video' AND media_id < 120"
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        **_cite_oracles(),
        **_doc_oracles(),
        **_code_oracles(),
        **_media_oracles(),
        "exact_dedup": (
            "SELECT md5(text) AS text_hash, count(*) AS n_docs,"
            " min(doc_id) AS rep_id FROM documents GROUP BY md5(text)"
        ),
        "normalized_dedup": (
            "SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))"
            " AS norm_hash, count(*) AS n_docs, min(doc_id) AS rep_id"
            " FROM documents GROUP BY 1"
        ),
        "doc_stats": (
            "SELECT doc_id,"
            " length(string_split_regex(trim(text), '\\s+'))::BIGINT AS token_count,"
            " length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS char_count,"
            " ((length(text) - length(replace(text, ' the ', ''))) / 5)::BIGINT"
            "   AS the_count,"
            " round(length(regexp_replace(text, '\\s', '', 'g'))"
            "   / length(string_split_regex(trim(text), '\\s+')), 4)"
            "   AS avg_token_len"
            " FROM documents"
        ),
        "lang_summary": (
            "SELECT lang, count(*) AS n_docs,"
            " sum(length(string_split_regex(trim(text), '\\s+')))::BIGINT"
            "   AS total_tokens,"
            " round(avg(n_chars), 2) AS avg_chars"
            " FROM documents GROUP BY lang"
        ),
        "lang_representatives": (
            "SELECT lang, doc_id AS rep_doc_id, n_chars FROM ("
            " SELECT lang, doc_id, n_chars,"
            "  row_number() OVER (PARTITION BY lang"
            "    ORDER BY n_chars DESC, doc_id ASC) AS rn"
            " FROM documents) WHERE rn = 1"
        ),
        "ann_topk": (
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),"
            " q AS (SELECT vec_id AS query_id, vec AS qvec FROM base"
            "   WHERE vec_id IN (0, 1, 2)),"
            " scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,"
            "   list_dot_product(b.vec, q.qvec) /"
            "   (sqrt(list_dot_product(b.vec, b.vec))"
            "    * sqrt(list_dot_product(q.qvec, q.qvec))) AS s"
            "  FROM base b, q WHERE b.vec_id <> q.query_id),"
            " ranked AS (SELECT query_id, neighbor_id,"
            "   row_number() OVER (PARTITION BY query_id"
            "     ORDER BY s DESC, neighbor_id ASC) AS rank,"
            "   round(s, 4) AS sim FROM scored)"
            " SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus,"
            " round(sum(l_quantity), 2) AS sum_qty,"
            " round(sum(l_extendedprice), 2) AS sum_base_price,"
            " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,"
            " round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)"
            "   AS sum_charge,"
            " round(avg(l_quantity), 4) AS avg_qty,"
            " count(*) AS count_order"
            " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
            " GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q3": (
            "WITH j AS (SELECT l_orderkey, o_orderdate, o_orderpriority,"
            "  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            " FROM customer JOIN orders ON c_custkey = o_custkey"
            "  JOIN lineitem ON o_orderkey = l_orderkey"
            " WHERE c_mktsegment = 'BUILDING'"
            "  AND o_orderdate < TIMESTAMP '1998-03-15'"
            "  AND l_shipdate > TIMESTAMP '1998-03-15'"
            " GROUP BY 1, 2, 3),"
            " ranked AS (SELECT *, row_number() OVER"
            "  (ORDER BY revenue DESC, l_orderkey ASC) AS rnk FROM j)"
            " SELECT l_orderkey, o_orderdate, o_orderpriority, revenue, rnk"
            " FROM ranked WHERE rnk <= 10"
        ),
        "tpch_q5": (
            "SELECT n_name,"
            " round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
            " count(*) AS n_items"
            " FROM region JOIN nation ON n_regionkey = r_regionkey"
            "  JOIN supplier ON s_nationkey = n_nationkey"
            "  JOIN lineitem ON l_suppkey = s_suppkey"
            "  JOIN orders ON l_orderkey = o_orderkey"
            "  JOIN customer ON o_custkey = c_custkey"
            "   AND c_nationkey = n_nationkey"
            " WHERE r_name = 'ASIA'"
            "  AND o_orderdate >= TIMESTAMP '1997-01-01'"
            "  AND o_orderdate < TIMESTAMP '1998-01-01'"
            " GROUP BY n_name"
        ),
        "ngram_jaccard_dups": (
            "WITH g AS (SELECT doc_id, lang, n_chars,"
            "  list_distinct([substring(text, i, 3)"
            "    FOR i IN range(1, length(text) - 1)]) AS grams"
            " FROM documents WHERE doc_id < 20000),"
            " p AS (SELECT g1.doc_id AS a, g2.doc_id AS b,"
            "   g1.grams AS ga, g2.grams AS gb"
            "  FROM g g1 JOIN g g2 ON g1.lang = g2.lang"
            "   AND g1.doc_id < g2.doc_id"
            "   AND abs(g1.n_chars - g2.n_chars) <= 20)"
            " SELECT a, b, round(len(list_intersect(ga, gb))::DOUBLE"
            "  / len(list_distinct(ga || gb)), 4) AS jac"
            " FROM p WHERE round(len(list_intersect(ga, gb))::DOUBLE"
            "  / len(list_distinct(ga || gb)), 4) >= 0.5"
        ),
        "winnow_fingerprints": (
            "WITH w AS (SELECT doc_id, string_split_regex(text, ' +') AS ws,"
            "  text FROM documents),"
            " g AS (SELECT doc_id, CASE WHEN len(ws) >= 4 THEN"
            "   list_transform(generate_series(1, len(ws)-3),"
            "    i -> md5(array_to_string(list_slice(ws, i, i+3), ' ')))"
            "  ELSE [md5(text)] END AS gs FROM w),"
            " s AS (SELECT doc_id, CASE WHEN len(gs) >= 5 THEN"
            "   list_distinct(list_transform(generate_series(1, len(gs)-4),"
            "    p -> list_min(list_slice(gs, p, p+4))))"
            "  ELSE [list_min(gs)] END AS sel FROM g)"
            " SELECT doc_id, unnest(sel) AS fp FROM s"
        ),
        "doc_dup_clusters": (
            "WITH RECURSIVE g AS (SELECT doc_id, lang, n_chars,"
            "  list_distinct([substring(text, i, 3)"
            "    FOR i IN range(1, length(text) - 1)]) AS grams"
            " FROM documents WHERE doc_id < 20000),"
            " p AS (SELECT g1.doc_id AS a, g2.doc_id AS b FROM g g1 JOIN g g2"
            "  ON g1.lang = g2.lang AND g1.doc_id < g2.doc_id"
            "  AND abs(g1.n_chars - g2.n_chars) <= 20"
            "  WHERE round(len(list_intersect(g1.grams, g2.grams))::DOUBLE"
            "   / len(list_distinct(g1.grams || g2.grams)), 4) >= 0.5),"
            " edges AS (SELECT a AS src, b AS dst FROM p"
            "  UNION ALL SELECT b, a FROM p),"
            " cc(rid, label) AS ("
            "  SELECT doc_id, doc_id FROM documents WHERE doc_id < 20000"
            "  UNION"
            "  SELECT e.src, cc.label FROM edges e JOIN cc ON e.dst = cc.rid),"
            " lab AS (SELECT rid, min(label) AS cluster_id FROM cc GROUP BY rid),"
            " sz AS (SELECT cluster_id, count(*) AS cluster_size"
            "  FROM lab GROUP BY cluster_id)"
            " SELECT lab.rid AS doc_id, lab.cluster_id, sz.cluster_size"
            " FROM lab JOIN sz ON lab.cluster_id = sz.cluster_id"
        ),
        "top_customers": (
            "WITH rev AS ("
            " SELECT o_custkey,"
            "  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
            "  count(DISTINCT o_orderkey) AS n_orders"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " GROUP BY o_custkey),"
            " joined AS (SELECT c_custkey AS custkey, c_name, revenue, n_orders"
            "  FROM rev JOIN customer ON o_custkey = c_custkey),"
            " ranked AS (SELECT *, row_number() OVER"
            "  (ORDER BY revenue DESC, custkey ASC) AS rnk FROM joined)"
            " SELECT custkey, c_name, revenue, n_orders, rnk"
            " FROM ranked WHERE rnk <= 20"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events,"
            " count(DISTINCT user_id) AS n_users,"
            " round(avg(value), 4) AS avg_value,"
            " round(sum(value), 2) AS sum_value"
            " FROM events GROUP BY event_type"
        ),
        "parts_revenue": (
            "WITH rev AS (SELECT p_partkey, p_name,"
            "  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
            "  round(sum(l_quantity), 2) AS total_qty"
            " FROM lineitem JOIN part ON l_partkey = p_partkey"
            " GROUP BY p_partkey, p_name),"
            " ranked AS (SELECT *, row_number() OVER"
            "  (ORDER BY revenue DESC, p_partkey ASC) AS rnk FROM rev)"
            " SELECT p_partkey, p_name, revenue, total_qty, rnk"
            " FROM ranked WHERE rnk <= 15"
        ),
        "lang_id": (
            "WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),"
            " m AS (SELECT doc_id,"
            "  ((length(t) - length(replace(t, ' the ', ''))) / 5)::BIGINT AS en_markers,"
            "  ((length(t) - length(replace(t, ' la ', ''))) / 4)::BIGINT AS es_markers,"
            "  ((length(t) - length(replace(t, ' der ', ''))) / 5)::BIGINT AS de_markers"
            " FROM p)"
            " SELECT doc_id, en_markers, es_markers, de_markers,"
            "  CASE WHEN en_markers >= es_markers AND en_markers >= de_markers THEN 'en'"
            "       WHEN es_markers >= de_markers THEN 'es' ELSE 'de' END"
            "    AS predicted_lang"
            " FROM m"
        ),
        "doc_fingerprints": (
            "SELECT doc_id, md5(list_aggregate("
            " [md5(substring(text, i*64+1, 64))"
            "  FOR i IN range(0, greatest(ceil(length(text)/64.0)::INT, 1))],"
            " 'string_agg', '')) AS fingerprint FROM documents"
        ),
        "embedding_near_dup": (
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v"
            "  FROM embeddings WHERE vec_id < 20000)"
            " SELECT a.vec_id AS a, b.vec_id AS b,"
            "  round(list_dot_product(a.v, b.v)"
            "   / (sqrt(list_dot_product(a.v, a.v))"
            "    * sqrt(list_dot_product(b.v, b.v))), 4) AS sim"
            " FROM base a JOIN base b ON a.vec_id < b.vec_id"
            " WHERE list_dot_product(a.v, b.v)"
            "   / (sqrt(list_dot_product(a.v, a.v))"
            "    * sqrt(list_dot_product(b.v, b.v))) >= 0.4"
        ),
        "quality_filter": (
            "WITH t AS (SELECT doc_id, text,"
            "  string_split_regex(trim(text), '\\s+') AS toks FROM documents)"
            " SELECT doc_id, len(toks)::BIGINT AS token_count,"
            "  round(length(regexp_replace(text, '\\s', '', 'g'))"
            "   / len(toks), 4) AS avg_token_len,"
            "  round(len([x FOR x IN toks"
            "   IF x IN ('the', 'a', 'of', 'and', 'in')])::DOUBLE"
            "   / len(toks), 4) AS stopword_ratio,"
            "  (len(toks) >= 30 AND round(len([x FOR x IN toks"
            "   IF x IN ('the', 'a', 'of', 'and', 'in')])::DOUBLE"
            "   / len(toks), 4) >= 0.03)::INT AS keep"
            " FROM t"
        ),
        "repetition_filter": (
            "WITH t AS (SELECT doc_id,"
            "  string_split_regex(trim(text), '\\s+') AS toks FROM documents)"
            " SELECT doc_id, len(toks)::BIGINT AS token_count,"
            "  len(list_distinct(toks))::BIGINT AS distinct_tokens,"
            "  round(list_max(map_values(list_histogram(toks)))::DOUBLE"
            "   / len(toks), 4) AS top_token_ratio,"
            "  (round(list_max(map_values(list_histogram(toks)))::DOUBLE"
            "   / len(toks), 4) <= 0.2)::INT AS keep"
            " FROM t"
        ),
        "token_freq": (
            "WITH c AS (SELECT token, count(*) AS n FROM ("
            "  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token"
            "  FROM documents) GROUP BY token),"
            " ranked AS (SELECT *, row_number() OVER"
            "  (ORDER BY n DESC, token ASC) AS rnk FROM c)"
            " SELECT token, n, rnk FROM ranked WHERE rnk <= 50"
        ),
        "user_sessions": (
            "WITH g AS (SELECT user_id, event_type,"
            "  CASE WHEN lag(ts) OVER (PARTITION BY user_id"
            "         ORDER BY ts ASC, event_id ASC) IS NULL"
            "    OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id"
            "         ORDER BY ts ASC, event_id ASC)) > 1800"
            "  THEN 1 ELSE 0 END AS new_session FROM events)"
            " SELECT user_id, count(*) AS n_events,"
            "  sum(new_session)::BIGINT AS n_sessions,"
            "  count(DISTINCT event_type) AS n_types"
            " FROM g GROUP BY user_id"
        ),
    }
