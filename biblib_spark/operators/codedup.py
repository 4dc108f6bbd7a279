"""Source-code near-duplicate detection + clustering (north_rule pipeline).

The tiered matcher over the input_hint table
``(repo, path, commit, lang, content)``, re-using the citation engine's
scale machinery (C5 pair dedup, C7 star cap, C6 connected components) with
code-shaped tiers — the classic clone-type ladder:

- tier E  (exact):      sha256(content) equality — type-0 clones. Edges are
  emitted as rep-stars via a groupBy + equi-join (linear in group size; a
  million-file boilerplate group produces a million edges, never a
  collect_list or a pair explosion).
- tier N  (normalized): md5 of comment-stripped whitespace-collapsed text —
  type-1 clones. Same linear star shape. Pure JVM regexp.
- tier M  (MinHash-LSH): char-shingle MinHash over the **identifier-
  canonicalized** token stream (type-2 clones rename every identifier, so
  shingles must be computed after alpha-rename normalization), banded LSH
  keys, star-capped bucket self-join (C7), then an exact token-4-gram
  Jaccard verify entirely in JVM codegen — type-2/3 clones.
- tier W  (winnowing):  shared winnowed fingerprints (operators/winnow.py,
  MOSS selection) verified by a containment coefficient
  |A∩B| / min(|A|,|B|) — catches a file embedded inside a much larger one,
  where Jaccard dilutes below any near-dup threshold.

All tiers key within ``lang`` (blocking: candidates never cross languages,
the M1 discipline at code granularity). Edges union -> connected components
-> (row_id, cluster_id, cluster_size).

100 TB scale notes: the only Python in the pipeline is the Arrow-batched
identifier-canonicalization UDF (one regex findall + dict map per row) and
the MinHash band-key UDF (vectorized numpy, functions/minhash.py); both are
single-scan map stages. Every join is an equi-join on a bounded-cardinality
key with the C7 cap; exact/normalized tiers never materialize within-group
pairs. At 10^12 files the fingerprint/band tables are the shuffle payload:
slim (rid, key) longs, salted by the existing candidates machinery.

Reference parity: biblib has no code-clone counterpart (it is citation-record
dedup, /root/reference/src/dedupe.rs); the tier *disciplines* mirror its
strategy chain — identity tier, LSH tier, containment tier, CC, caps — at
the same shingle/signature config as the document arm (k=5 char shingles,
128 perms, 32 bands, seed 97; docfixtures.py constants).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from biblib_spark.functions.minhash import make_band_keys_udf
from biblib_spark.operators.candidates import self_join_pairs
from biblib_spark.operators.components import assign_clusters

# contract config — shared with the oracle fixture (codefixtures.py)
MINHASH_K, MINHASH_PERMS, MINHASH_BANDS, MINHASH_SEED = 5, 128, 32, 97
JACCARD_THRESHOLD = 0.6
CONTAINMENT_THRESHOLD = 0.7
TOKEN_GRAM = 4
WINNOW_K, WINNOW_WINDOW, WINNOW_MIN_SHARED = 4, 5, 2
MAX_BUCKET = 64

#: keywords + builtins the canonicalizer must NOT rename (union over the four
#: corpus languages; renaming a keyword would let an alpha-renamed clone
#:  diverge from its origin's canonical stream)
_KEYWORDS = frozenset(
    """def return if else elif for while in not and or None True False lambda
    class import from pass break continue yield with as try except finally
    raise global nonlocal assert del print len range
    static long int void public private final class new this null true false
    switch case default do throw throws extends implements interface package
    function let const var typeof undefined export module require use strict
    func go defer chan map struct type interface select fallthrough package
    nil var range make append copy println
    __all__""".split()
)

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^A-Za-z0-9_\s]")


def normalize_code_col(content: Column) -> Column:
    """Comment-strip + whitespace-collapse, entirely JVM-side.

    Strips ``/* */`` block comments, ``//`` and ``#`` line comments, then
    collapses all whitespace runs to single spaces. Language-agnostic on
    purpose: ``#`` only ever starts a comment in the corpus languages where
    it appears, and string literals in the synthetic corpus never contain
    comment markers (documented limitation — a lexer-grade normalizer is a
    per-lang pandas UDF swap behind this same column contract).
    """
    c = F.regexp_replace(content, r"(?s)/\*.*?\*/", " ")
    c = F.regexp_replace(c, r"//[^\n]*", " ")
    c = F.regexp_replace(c, r"#[^\n]*", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_code_py(content: str) -> str:
    """Pure-Python twin of :func:`normalize_code_col` (oracle fixture +
    parity tests)."""
    c = re.sub(r"(?s)/\*.*?\*/", " ", content)
    c = re.sub(r"//[^\n]*", " ", c)
    c = re.sub(r"#[^\n]*", " ", c)
    c = re.sub(r"\s+", " ", c)
    return c.strip()


#: tokens that open a new function scope in the corpus languages — the
#: canonicalizer restarts identifier numbering here so an edit to one
#: function never renumbers (and so re-shingles) the rest of the file
_SCOPE_STARTERS = frozenset(["def", "function", "func", "static"])


def canonical_tokens_py(norm: str) -> str:
    """Identifier-canonicalized token stream of already-normalized code.

    Tokenizes, then maps every non-keyword identifier to ``v{i}`` by first
    occurrence **within its function scope** (numbering restarts at each
    function keyword — scope-local alpha-renaming, the standard type-2
    canonicalization in clone detection; file-global numbering would let a
    single dropped function renumber every identifier after it and collapse
    the Jaccard of an otherwise near-identical pair). A type-2 (consistently
    alpha-renamed) clone therefore produces the *identical* stream, and a
    type-3 edit perturbs only the edited function's shingles.
    Pure function — used by the Arrow UDF, the oracle fixture and tests.
    """
    out = []
    seen: dict[str, str] = {}
    for tok in _TOKEN_RE.findall(norm):
        if tok in _SCOPE_STARTERS:
            seen = {}
            out.append(tok)
        elif (tok[0].isalpha() or tok[0] == "_") and tok not in _KEYWORDS:
            mapped = seen.get(tok)
            if mapped is None:
                mapped = f"v{len(seen)}"
                seen[tok] = mapped
            out.append(mapped)
        else:
            out.append(tok)
    return " ".join(out)


def _canonical_tokens_udf():
    """Arrow-batched canonicalizer (built lazily — pandas_udf registration
    needs an active session)."""

    @pandas_udf("string")
    def canon(norm: pd.Series) -> pd.Series:
        return norm.map(canonical_tokens_py)

    return canon


def code_features(files: DataFrame) -> DataFrame:
    """One scan: (rid, lang, sha, norm_hash, ctoks) from raw files.

    ``sha`` is the input_hint per-row invariant (sha256 of raw content);
    ``norm_hash`` keys the type-1 tier; ``ctoks`` feeds MinHash + winnowing.
    """
    norm = normalize_code_col(F.col("content"))
    return files.select(
        F.col("row_id").alias("rid"),
        "lang",
        F.sha2(F.col("content"), 256).alias("sha"),
        F.md5(norm).alias("norm_hash"),
        _canonical_tokens_udf()(norm).alias("ctoks"),
    )


def _star_edges(feat: DataFrame, key: str) -> DataFrame:
    """Rep-star edges (a=group min rid, b=member) for an exact-equality key.

    Two shuffles of slim rows, zero collect_list: groups of any size emit
    edges linear in membership — the C7-safe shape for mega-groups
    (boilerplate files, vendored licenses).
    """
    keyed = feat.select("lang", key, "rid")
    reps = keyed.groupBy("lang", key).agg(F.min("rid").alias("a"))
    return (
        keyed.join(reps, ["lang", key])
        .filter(F.col("rid") != F.col("a"))
        .select("a", F.col("rid").alias("b"))
    )


def _token_grams(ctoks: Column, n: int = TOKEN_GRAM) -> Column:
    """Distinct md5'd token n-grams of a space-joined token stream — JVM
    array pipeline (same construction as winnow_fingerprints grams)."""
    words = F.split(ctoks, " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.md5(F.array_join(F.slice(words, i, n), " ")),
            )
        ),
    ).otherwise(F.array(F.md5(ctoks)))


def minhash_candidate_pairs(
    feat: DataFrame, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """Tier M candidates: banded LSH keys over char-shingled ctoks, lang
    prepended into the bucket key, one star-capped self-join (C5+C7)."""
    bands_udf = make_band_keys_udf(
        MINHASH_K, MINHASH_PERMS, MINHASH_BANDS, MINHASH_SEED
    )
    keyed = (
        feat.select("rid", "lang", bands_udf(F.col("ctoks")).alias("bkeys"))
        .select("rid", "lang", F.explode("bkeys").alias("bkey"))
    )
    return self_join_pairs(keyed, ["lang", "bkey"], max_bucket).distinct()


def jaccard_verified_pairs(
    feat: DataFrame,
    cand: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact token-4-gram Jaccard >= threshold over candidate pairs — pure
    codegen verify (array_intersect/array_union), the narrow-verify shape:
    candidates join only (rid, grams)."""
    g = feat.select("rid", _token_grams(F.col("ctoks")).alias("grams"))
    a = g.select(F.col("rid").alias("a"), F.col("grams").alias("a_g"))
    b = g.select(F.col("rid").alias("b"), F.col("grams").alias("b_g"))
    jac = F.size(F.array_intersect("a_g", "b_g")) / F.size(
        F.array_union("a_g", "b_g")
    )
    return (
        cand.join(a, "a").join(b, "b")
        .withColumn("jac", F.round(jac, 4))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", "jac")
    )


def containment_verified_pairs(
    feat: DataFrame,
    max_bucket: int = MAX_BUCKET,
    min_shared: int = WINNOW_MIN_SHARED,
    threshold: float = CONTAINMENT_THRESHOLD,
) -> DataFrame:
    """Tier W: winnowed-fingerprint candidates verified by token-gram
    containment |A∩B| / min(|A|,|B|) >= threshold.

    The containment coefficient is the right statistic for embedded copies:
    a file pasted wholesale into one twice its size has containment ~1.0
    while its Jaccard is ~0.5 and falling with the host's growth.
    """
    from biblib_spark.operators.winnow import winnow_fingerprints

    docs = feat.select(
        F.col("rid").alias("doc_id"), F.col("ctoks").alias("text")
    )
    fps = winnow_fingerprints(docs, k=WINNOW_K, window=WINNOW_WINDOW)
    keyed = feat.select("rid", "lang").join(
        fps.withColumnRenamed("doc_id", "rid"), "rid"
    )
    cand = (
        self_join_pairs(keyed, ["lang", "fp"], max_bucket)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .select("a", "b")
    )
    g = feat.select("rid", _token_grams(F.col("ctoks")).alias("grams"))
    a = g.select(F.col("rid").alias("a"), F.col("grams").alias("a_g"))
    b = g.select(F.col("rid").alias("b"), F.col("grams").alias("b_g"))
    cont = F.size(F.array_intersect("a_g", "b_g")) / F.least(
        F.size("a_g"), F.size("b_g")
    )
    return (
        cand.join(a, "a").join(b, "b")
        .withColumn("containment", F.round(cont, 4))
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "containment")
    )


def code_dup_edges(feat: DataFrame) -> DataFrame:
    """All-tier duplicate edges (a < b), deduplicated across tiers (C5)."""
    e = _star_edges(feat, "sha")
    n = _star_edges(feat, "norm_hash")
    cand = minhash_candidate_pairs(feat)
    m = jaccard_verified_pairs(feat, cand).select("a", "b")
    w = containment_verified_pairs(feat).select("a", "b")
    return (
        e.unionByName(n).unionByName(m).unionByName(w)
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )


def clusters_from_edges(feat: DataFrame, edges: DataFrame) -> DataFrame:
    """(row_id, cluster_id, cluster_size) from features + verified edges.

    cluster_id = min row_id of the component (C6 min-label convention);
    singletons pass through with their own id (M11). Split out so the
    checkpointed pipeline (plans/code_pipeline.py) can resume from a
    persisted edge stage without re-running the tiers.
    """
    rids = feat.select("rid")
    cc = assign_clusters(rids, edges)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("rid").alias("row_id"), "cluster_id", "cluster_size")
    )


def code_dup_clusters(files: DataFrame) -> DataFrame:
    """(row_id, cluster_id, cluster_size) over the input_hint table."""
    feat = code_features(files).localCheckpoint(eager=False)
    return clusters_from_edges(feat, code_dup_edges(feat))
