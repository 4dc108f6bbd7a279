"""Pair verification — the reference duplicate predicate (M4-M8).

reference: src/dedupe.rs:594-655. Field matches are native SQL expressions
(whole-stage codegen); only the title similarity crosses into Python, as one
Arrow-batched pandas UDF computing jaro (both DOIs present) or jaro_winkler
(otherwise) per pair — strsim-0.11.1-parity kernels.

Null semantics preserved exactly:
- journal_match: 4-way equality over normalized journal/abbr; NULL never
  matches, but ''=='' does (format_journal_name("") == Some("")).
- issn_match: any pairwise equality; empty lists never match.
- volumes_match: both normalized non-empty and equal.
- pages_match: both non-NULL and RAW strings equal (pages were already
  format_page_numbers'd at parse time — dedupe.rs:619-621).
- years_match: NULL == NULL is TRUE (dedupe.rs:622-623,707-709) -> eqNullSafe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from biblib_spark.kernels.similarity import jaro_batch

DOI_TITLE_SIMILARITY_THRESHOLD = 0.85  # dedupe.rs:141
NO_DOI_TITLE_SIMILARITY_THRESHOLD = 0.93  # dedupe.rs:142

_FEATURE_COLS = [
    "rid",
    "norm_title",
    "norm_journal",
    "norm_journal_abbr",
    "norm_volume",
    "norm_issn",
    "pages",
    "doi",
    "year",
]


@pandas_udf(DoubleType())
def _title_sim_udf(t1: pd.Series, t2: pd.Series, both_doi: pd.Series) -> pd.Series:
    """Numpy-batched jaro/jaro_winkler (strsim-0.11.1 parity, property-tested
    against the scalar kernels in tests/test_similarity.py).

    Fast path: strsim parity gives jaro(x, x) == jaro_winkler(x, x) == 1.0
    (also for ""), and most true duplicates normalize to IDENTICAL titles —
    only unequal pairs enter the vectorized block kernel.
    """
    a = t1.fillna("")
    b = t2.fillna("")
    out = np.ones(len(a), dtype=np.float64)
    neq = (a != b).to_numpy()
    if neq.any():
        idx = np.nonzero(neq)[0]
        winkler = ~both_doi.fillna(False).to_numpy(dtype=bool)[idx]
        a_l = a.to_numpy(dtype=object)
        b_l = b.to_numpy(dtype=object)
        out[idx] = jaro_batch(
            [a_l[i] for i in idx], [b_l[i] for i in idx], winkler=winkler
        )
    return pd.Series(out)


def _side(feat: DataFrame, side: str) -> DataFrame:
    return feat.select(
        *[F.col(c).alias(f"{side}_{c}") for c in _FEATURE_COLS]
    )


def _coal(c):
    return F.coalesce(c, F.lit(False))


def _field_matches() -> dict:
    """The M6-M8 field-match expressions over a joined a_/b_ pair row."""
    journal_match = _coal(
        (F.col("a_norm_journal") == F.col("b_norm_journal"))
    ) | _coal(
        (F.col("a_norm_journal_abbr") == F.col("b_norm_journal_abbr"))
    ) | _coal(
        (F.col("a_norm_journal") == F.col("b_norm_journal_abbr"))
    ) | _coal(
        (F.col("a_norm_journal_abbr") == F.col("b_norm_journal"))
    )
    return {
        "journal_match": journal_match,
        "issn_match": _coal(F.arrays_overlap("a_norm_issn", "b_norm_issn")),
        "volumes_match": (
            (F.col("a_norm_volume") != "")
            & (F.col("b_norm_volume") != "")
            & (F.col("a_norm_volume") == F.col("b_norm_volume"))
        ),
        "pages_match": (
            F.col("a_pages").isNotNull()
            & F.col("b_pages").isNotNull()
            & (F.col("a_pages") == F.col("b_pages"))
        ),
        "years_match": F.col("a_year").eqNullSafe(F.col("b_year")),
    }


def _join_sides(pairs: DataFrame, feat: DataFrame) -> DataFrame:
    """Two hash joins pull in both sides' preprocessed features (M3:
    normalized once, never recomputed per pair)."""
    return (
        pairs.join(_side(feat, "a"), pairs["a"] == F.col("a_rid"))
        .join(_side(feat, "b"), pairs["b"] == F.col("b_rid"))
    )


def _containment_arm(m: dict, min_len: int):
    """C4 substring/containment arm (north_star's suffix-array substring
    pass, re-expressed): the shorter normalized title is a strict substring
    of the longer — a truncated export, a '[Abstract] '-style prefix, an
    appended subtitle — which jaro scores too low to reach the reference
    thresholds. Corroboration requirements mirror the no-DOI reference arm
    (journal/issn AND volume/pages) plus same year, so precision stays at
    reference level. JVM-side `contains` — no Python in this arm."""
    t_a, t_b = F.col("a_norm_title"), F.col("b_norm_title")
    la, lb = F.length(t_a), F.length(t_b)
    contained = F.when(la <= lb, t_b.contains(t_a)).otherwise(t_a.contains(t_b))
    return (
        (F.least(la, lb) >= min_len)
        & contained
        & m["years_match"]
        & (m["volumes_match"] | m["pages_match"])
        & (m["journal_match"] | m["issn_match"])
    )


def verify_pairs(
    pairs: DataFrame,
    feat: DataFrame,
    containment: bool = False,
    containment_min_len: int = 20,
) -> DataFrame:
    """Candidate pairs (a, b) -> verified duplicate pairs (a, b).

    With ``containment=False`` this is exactly the reference predicate
    (src/dedupe.rs:594-655). ``containment=True`` ORs in the C4 substring
    arm for truncated/containment duplicates the reference's jaro thresholds
    miss (gated by DedupConfig.containment_verify in the pipeline).
    """
    j = _join_sides(pairs, feat)
    m = _field_matches()

    a_doi_ok = F.col("a_doi").isNotNull() & (F.col("a_doi") != "")
    b_doi_ok = F.col("b_doi").isNotNull() & (F.col("b_doi") != "")
    both_doi = a_doi_ok & b_doi_ok
    doi_eq = _coal(F.col("a_doi") == F.col("b_doi"))

    sim = _title_sim_udf(F.col("a_norm_title"), F.col("b_norm_title"), both_doi)

    with_doi = (
        (doi_eq & (sim >= DOI_TITLE_SIMILARITY_THRESHOLD) & (m["journal_match"] | m["issn_match"]))
        | (doi_eq & (sim >= 0.99) & (m["volumes_match"] | m["pages_match"]))
        | (
            (sim >= 0.99)
            & m["years_match"]
            & (m["volumes_match"] | m["pages_match"])
            & (m["journal_match"] | m["issn_match"])
        )
    )
    without_doi = (
        (
            (sim >= NO_DOI_TITLE_SIMILARITY_THRESHOLD)
            & (m["volumes_match"] | m["pages_match"])
            & (m["journal_match"] | m["issn_match"])
        )
        | ((sim >= 0.99) & m["years_match"] & m["volumes_match"] & m["pages_match"])
    )

    is_dup = F.when(both_doi, with_doi).otherwise(without_doi)
    if containment:
        is_dup = is_dup | _containment_arm(m, containment_min_len)
    return j.filter(is_dup).select("a", "b")


def containment_pairs(
    pairs: DataFrame, feat: DataFrame, min_len: int = 20
) -> DataFrame:
    """Pairs passing ONLY the C4 containment arm — pure JVM expressions
    end-to-end (no similarity UDF), so the whole check stays in codegen."""
    j = _join_sides(pairs, feat)
    return j.filter(_containment_arm(_field_matches(), min_len)).select("a", "b")
