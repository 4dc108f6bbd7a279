"""Property-based robustness tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these are an added layer:
every kernel must be total (never raise) on arbitrary input and respect its
structural invariants.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from biblib_spark.kernels.bib import parse_bib
from biblib_spark.kernels.csvfmt import parse_csv, parse_ictrp_csv
from biblib_spark.kernels.detect import detect_format
from biblib_spark.kernels.endnote_xml import parse_endnote_xml
from biblib_spark.kernels.enw import parse_enw
from biblib_spark.kernels.ictrp_xml import parse_ictrp_xml
from biblib_spark.kernels.norm import format_issn, normalize_string, normalize_volume
from biblib_spark.kernels.pubmed import parse_pubmed
from biblib_spark.kernels.ris import parse_ris
from biblib_spark.kernels.similarity import jaro, jaro_winkler
from biblib_spark.kernels.text import format_doi, format_page_numbers, split_issns

TEXT = st.text(max_size=300)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_parsers_total(payload):
    """No payload may crash any parser or the dispatcher."""
    detect_format(payload)
    for parser in (
        parse_ris, parse_pubmed, parse_enw, parse_csv, parse_ictrp_csv,
        parse_endnote_xml, parse_ictrp_xml, parse_bib,
    ):
        citations, errors = parser(payload)
        assert isinstance(citations, list) and isinstance(errors, list)
        for c in citations:
            assert isinstance(c["title"], str)
            assert isinstance(c["citation_type"], list)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_normalizers_total(s):
    normalize_string(s)
    normalize_volume(s)
    format_issn(s)
    format_doi(s)
    format_page_numbers(s)
    split_issns(s)


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_similarity_bounds_and_symmetry(a, b):
    j = jaro(a, b)
    jw = jaro_winkler(a, b)
    assert 0.0 <= j <= 1.0
    assert 0.0 <= jw <= 1.0
    assert jw >= j - 1e-12  # prefix boost never decreases
    assert abs(jaro(b, a) - j) < 1e-12  # jaro is symmetric
    assert jaro(a, a) == 1.0


@given(st.integers(min_value=0, max_value=5000))
@settings(max_examples=100, deadline=None)
def test_corpus_payloads_always_parse(p):
    from biblib_spark.corpus import payload_format, payload_text

    text = payload_text(p, 6, seed=42)
    if not text.strip():
        return
    assert detect_format(text) == payload_format(p)
    parser = parse_ris if payload_format(p) == "RIS" else parse_pubmed
    citations, errors = parser(text)
    assert errors == []
    assert all(c["title"] for c in citations)


@given(st.lists(st.text(max_size=60), max_size=20))
@settings(max_examples=60, deadline=None)
def test_lsh_batch_matches_scalar(titles):
    """Batched MinHash band keys == per-record path, for arbitrary unicode."""
    from biblib_spark.functions.minhash import (
        _perm_params,
        band_keys,
        lsh_keys_batch,
        minhash_signature,
        shingles,
    )

    a, b = _perm_params(64, 1815)
    batch = lsh_keys_batch(titles, 4, a, b, 16)
    for t, keys in zip(titles, batch):
        if not t:
            assert keys == []
        else:
            sig = minhash_signature(shingles(t, 4), a, b)
            assert keys == ([] if sig is None else band_keys(sig, 16))


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_total_and_symmetric_distance(t1, t2):
    from biblib_spark.functions.simhash import simhash64_batch

    h1, h2 = simhash64_batch([t1, t2], 4)
    assert -(1 << 63) <= h1 < (1 << 63)  # fits Spark LongType
    # equal inputs -> equal hashes; distance symmetric by construction
    assert simhash64_batch([t1], 4)[0] == h1
    if t1 == t2:
        assert h1 == h2
