"""Winnowing fingerprints + doc-level dup clusters.

Property anchor: the winnowing guarantee (Schleimer et al. 2003) — two docs
sharing a run of >= k + window - 1 words share at least one selected
fingerprint — plus a scalar-Python reference implementation for exact
parity on the selection itself.
"""

from __future__ import annotations

import hashlib

import pytest

from biblib_spark.operators.winnow import (
    doc_dup_clusters,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _ref_winnow(text: str, k: int = 4, window: int = 5) -> set[str]:
    words = [w for w in text.split(" ") if w]
    if len(words) >= k:
        grams = [
            hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()
            for i in range(len(words) - k + 1)
        ]
    else:
        grams = [hashlib.md5(text.encode()).hexdigest()]
    if len(grams) >= window:
        return {
            min(grams[p : p + window]) for p in range(len(grams) - window + 1)
        }
    return {min(grams)}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (1, "a b", "en"),  # shorter than k words
    (2, "one two three four five", "en"),  # grams < window
    (3, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (4, "pad pad the quick brown fox jumps over the lazy dog tail", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, lang, len(t)) for i, t, lang in DOCS],
        schema="doc_id long, text string, lang string, n_chars long",
    )


def test_matches_reference_selection(spark, docs_df):
    got: dict[int, set[str]] = {}
    for r in winnow_fingerprints(docs_df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text, _ in DOCS:
        assert got[doc_id] == _ref_winnow(text), f"doc {doc_id}"


def test_shared_run_guarantee(spark, docs_df):
    """Docs 0 and 4 share an 8-word run (>= k + window - 1 = 8): winnowing
    must select at least one common fingerprint, and the overlap-pair join
    must surface the pair."""
    fps = {
        (r.doc_id, r.fp) for r in winnow_fingerprints(docs_df).collect()
    }
    common = {f for d, f in fps if d == 0} & {f for d, f in fps if d == 4}
    assert common, "winnowing guarantee violated"
    pairs = {
        (r.a, r.b)
        for r in winnow_overlap_pairs(docs_df, min_shared=1).collect()
    }
    assert (0, 4) in pairs or (0, 3) in pairs


def test_identical_docs_share_all_fps(spark, docs_df):
    by_doc: dict[int, set[str]] = {}
    for r in winnow_fingerprints(docs_df).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] == by_doc[3]


def test_doc_dup_clusters(spark, docs_df):
    rows = {r.doc_id: r for r in doc_dup_clusters(docs_df).collect()}
    assert len(rows) == len(DOCS)
    # identical docs 0 and 3 cluster together under min-id labeling
    assert rows[0].cluster_id == rows[3].cluster_id == 0
    assert rows[0].cluster_size >= 2
    # the 2-word doc is a singleton
    assert rows[1].cluster_id == 1 and rows[1].cluster_size == 1
