"""Narrow-first verify must be pair-set-identical to the single-join plan.

The two-stage verify (operators/verify.py verify_pairs narrow_first=True)
moves the title-similarity evaluation into a narrow (rid, norm_title, doi)
join and defers the wide field-match join to the survivors. Its stage-1
threshold is the exact per-pair minimum any reference arm accepts, so the
output pair set must equal the single-join plan's on any input — asserted
here on the synthetic corpus with containment both off and on.
"""

from __future__ import annotations

from biblib_spark.corpus import make_corpus
from biblib_spark.operators.candidates import candidate_pairs
from biblib_spark.operators.dedupe import (
    DedupConfig,
    features_from_corpus,
)
from biblib_spark.operators.verify import verify_pairs


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_narrow_first_verify_pair_set_identical(spark):
    cfg = DedupConfig()
    corpus = make_corpus(spark, num_payloads=200, records_per_payload=5, seed=23)
    feat = features_from_corpus(corpus, cfg).localCheckpoint(eager=True)
    cand = candidate_pairs(feat, cfg).localCheckpoint(eager=True)
    assert cand.count() > 100

    for containment in (False, True):
        wide = _pairs(
            verify_pairs(cand, feat, containment=containment, narrow_first=False)
        )
        narrow = _pairs(
            verify_pairs(cand, feat, containment=containment, narrow_first=True)
        )
        assert narrow == wide, (
            f"containment={containment}: narrow-first verify diverged "
            f"(+{len(narrow - wide)} / -{len(wide - narrow)})"
        )
        assert len(wide) > 0
