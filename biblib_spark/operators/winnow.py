"""Winnowing fingerprints and document-level dup clustering.

Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm) is
the standard fingerprint-selection scheme for code-clone / document-overlap
detection at scale: hash every word k-gram, then keep only the minimum hash
of each sliding window of ``window`` consecutive k-grams. Guarantees: any
shared substring of at least ``k + window - 1`` words produces at least one
shared selected fingerprint, while storing ~2/(window+1) of the k-gram
hashes. That density bound is what makes a 100 TB corpus indexable — the
fingerprint table is a small constant fraction of the corpus, and matching
docs is an equi-join on ``fp``.

Everything here is pure JVM (split / transform / sequence / slice / md5 /
array_min / array_distinct inside whole-stage codegen, then one explode):
no Python in the row path, no shuffle at all for fingerprint extraction.
The md5-hex min is taken lexicographically, which both Spark and ANSI SQL
(the DuckDB oracle) define identically over ASCII hex strings.

The reference has no counterpart (biblib is citation-record dedup); these
are the LLM-training-pipeline operators mandated by the brief, shaped for
the north_rule's source-code-corpus input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, window: int = 5
) -> DataFrame:
    """(doc_id, text) -> (doc_id, fp): winnowed word-k-gram fingerprints.

    Per-row array pipeline (zero shuffle, zero Python):
      words   = regex-split on runs of spaces
      grams_i = md5(words[i..i+k-1] joined by ' ')   for each k-gram
      sel_p   = min(grams[p..p+window-1])            for each window
      out     = distinct(sel)                        exploded to rows

    Degenerate inputs follow the winnowing convention: a doc shorter than k
    words contributes md5(text) as its single gram; fewer than ``window``
    grams select the single global min.
    """
    words = F.split(F.col("text"), " +")
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: F.md5(F.array_join(F.slice(words, i, k), " ")),
        ),
    ).otherwise(F.array(F.md5(F.col("text"))))
    g = docs.select("doc_id", grams.alias("gs"))
    sel = F.when(
        F.size(F.col("gs")) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("gs")) - (window - 1)),
                lambda p: F.array_min(F.slice(F.col("gs"), p, window)),
            )
        ),
    ).otherwise(F.array(F.array_min(F.col("gs"))))
    return g.select("doc_id", F.explode(sel).alias("fp"))


def winnow_overlap_pairs(
    docs: DataFrame, k: int = 4, window: int = 5, min_shared: int = 2,
    max_bucket: int = 64,
) -> DataFrame:
    """Docs sharing >= ``min_shared`` winnowed fingerprints -> (a, b, shared).

    The scale path for substring-overlap detection: one equi-join on ``fp``
    (star-capped against boilerplate fingerprints, C7 discipline) then a
    count aggregation — never an all-pairs comparison. Any shared run of
    ``k + window - 1`` words is guaranteed caught by the winnowing bound.
    """
    from biblib_spark.operators.candidates import self_join_pairs

    fps = winnow_fingerprints(docs, k=k, window=window).withColumnRenamed(
        "doc_id", "rid"
    )
    pairs = self_join_pairs(fps, ["fp"], max_bucket)
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, length_band: int = 20
) -> DataFrame:
    """Exact char-3-gram Jaccard pairs >= threshold, entirely JVM-side.

    Same-lang equi-join + length-band prefilter; callers cap the input
    (bounded-quadratic verify arm — at 10^12 docs the MinHash-LSH tier
    generates the candidates and this is the verify predicate only).
    """
    d = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(
            "CASE WHEN length(text) >= 3 THEN"
            " array_distinct(transform(sequence(1, length(text) - 2),"
            " i -> substring(text, i, 3)))"
            " ELSE array() END"
        ).alias("grams"),
    )
    a = d.select(
        F.col("doc_id").alias("a"),
        "lang",
        F.col("n_chars").alias("a_chars"),
        F.col("grams").alias("a_grams"),
    )
    b = d.select(
        F.col("doc_id").alias("b"),
        F.col("lang").alias("b_lang"),
        F.col("n_chars").alias("b_chars"),
        F.col("grams").alias("b_grams"),
    )
    pairs = a.join(
        b, (F.col("lang") == F.col("b_lang")) & (F.col("a") < F.col("b"))
    ).filter(F.abs(F.col("a_chars") - F.col("b_chars")) <= length_band)
    jac = F.size(F.array_intersect("a_grams", "b_grams")) / F.size(
        F.array_union("a_grams", "b_grams")
    )
    return (
        pairs.withColumn("jac", F.round(jac, 4))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", "jac")
    )


def doc_dup_clusters(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Document-level dup clusters: exact-Jaccard edges -> connected
    components -> (doc_id, cluster_id, cluster_size). Singletons keep their
    own id (M11 at doc granularity). This is the operation a training-data
    pipeline actually runs after pair detection: keep one doc per cluster,
    drop the rest — pair lists alone don't dedupe anything.
    """
    edges = ngram_jaccard_pairs(docs, threshold=threshold)
    from biblib_spark.operators.components import assign_clusters

    rids = docs.select(F.col("doc_id").alias("rid"))
    cc = assign_clusters(rids, edges)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("rid").alias("doc_id"), "cluster_id", "cluster_size")
    )
