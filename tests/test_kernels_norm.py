"""Parity tests for dedup normalizations. Sources: /root/reference/src/dedupe.rs:972-1138."""

import pytest

from biblib_spark.kernels.norm import (
    convert_unicode_string,
    format_issn,
    format_journal_name,
    normalize_string,
    normalize_volume,
)


def test_normalize_string():
    assert (
        normalize_string("Machine Learning! (2<sup>nd</sup> Edition)")
        == "machinelearning2ndedition"
    )
    assert normalize_string("[&lt;sup&gt;11&lt;/sup&gt;C] benzo") == "11cbenzo"
    assert normalize_string("") is None
    # greek replacements (dedupe.rs:156-160): "beta"->"b" then "alpha"->"a", "γ"->"g"
    assert normalize_string("Alpha-beta γ test") == "abgtest"


def test_convert_unicode_string():
    assert convert_unicode_string("2<U+0391>-amino-4<U+0391>") == "2Α-amino-4Α"
    assert convert_unicode_string("Hello <U+03A9>orld <U+03A3>cience") == "Hello Ωorld Σcience"
    assert convert_unicode_string("Normal String") == "Normal String"
    assert convert_unicode_string("") == ""
    assert convert_unicode_string("Mixed <U+0394> Unicode <U+03A9> Test") == "Mixed Δ Unicode Ω Test"
    assert convert_unicode_string("<U+0391><U+0392><U+0393>") == "ΑΒΓ"


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("61", "61"),
        ("61 (Supplement 1)", "61"),
        ("9 (8) (no pagination)", "9"),
        ("3)", "3"),
        ("Part A. 242", "242"),
        ("55 (10 SUPPL 1)", "55"),
        ("161A", "161"),
        ("74 Suppl 1", "74"),
        ("20 (2)", "20"),
        ("9 (FEB) (no pagination)", "9"),
        ("", ""),
        ("no digits", ""),
    ],
)
def test_normalize_volume(inp, expected):
    assert normalize_volume(inp) == expected


def test_format_journal_name():
    assert (
        format_journal_name(
            "Heart. Conference: British Atherosclerosis Society BAS/British Society"
            " for Cardiovascular Research BSCR Annual Meeting"
        )
        == "heart"
    )
    assert (
        format_journal_name("The FASEB Journal. Conference: Experimental Biology")
        == "thefasebjournal"
    )
    assert (
        format_journal_name(
            "Arteriosclerosis Thrombosis and Vascular Biology. Conference: American"
            " Heart Association's Arteriosclerosis Thrombosis and Vascular Biology"
        )
        == "arteriosclerosisthrombosisandvascularbiology"
    )
    assert format_journal_name(None) is None
    assert format_journal_name("") == ""
    assert (
        format_journal_name("Diabetologie und Stoffwechsel. Conference")
        == "diabetologieundstoffwechsel"
    )


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("1234-5678", "1234-5678"),
        ("12345678", "1234-5678"),
        ("1234-567X", "1234-567X"),
        ("1234-567X (Electronic)", "1234-567X"),
        ("1234-5678 (Print)", "1234-5678"),
        ("1234-5678 (Linking)", "1234-5678"),
        ("invalid", None),
        ("1234-56789", None),
        ("123-45678", None),
    ],
)
def test_format_issn(inp, expected):
    assert format_issn(inp) == expected
