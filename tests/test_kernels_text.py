"""Parity tests for text kernels — literal cases from the reference.

Sources: /root/reference/src/utils.rs:499-650 test tables.
"""

import pytest

from biblib_spark.kernels.text import (
    format_doi,
    format_page_numbers,
    newline_delimiter_of,
    split_issns,
)


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("1234-45", "1234-1245"),
        ("1234", "1234"),
        ("123-456", "123-456"),
        ("e071674", "e071674"),
        ("R575-82", "R575-R582"),
        ("12-345", "12-345"),
        ("5-10", "5-10"),
        ("A94-A95", "A94-A95"),
        ("01-Apr", "01-Apr"),
        ("iii613-iii614", "iii613-iii614"),
        ("101-101", "101"),
        ("", ""),
        ("100-110", "100-110"),
    ],
)
def test_format_page_numbers(inp, expected):
    assert format_page_numbers(inp) == expected


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("10.1000/test", "10.1000/test"),
        ("10.1000/test [doi]", "10.1000/test"),
        ("https://doi.org/10.1000/test", "10.1000/test"),
        ("http://dx.doi.org/10.1000/test", "10.1000/test"),
        (" https://doi.org/10.1000/test ", "10.1000/test"),
        ("doi:10.1000/test", "10.1000/test"),
        ("DOI:10.1000/test", "10.1000/test"),
        ("doi: 10.1000/test", "10.1000/test"),
        ("avn 10.1000/test", "10.1000/test"),
        ("dhs\r10.1000/test", "10.1000/test"),
        ("DOI: 10.1000/test", "10.1000/test"),
        ("DOI:10.1000/TEST", "10.1000/test"),
        ("DOI 10.1000/TEST", "10.1000/test"),
        ("DOI10.1000/TEST", "10.1000/test"),
        ("10.1000/TEST", "10.1000/test"),
        ("HTTPS://DOI.ORG/10.1000/TEST", "10.1000/test"),
        ("https://doi.org/10.1000/test [doi]", "10.1000/test"),
        ("", None),
        ("invalid", None),
    ],
)
def test_format_doi(inp, expected):
    assert format_doi(inp) == expected


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("1234-5678", ["1234-5678"]),
        ("1234-5678 (Print)", ["1234-5678 (Print)"]),
        ("1234-5678 (Print) 5678-1234", ["1234-5678 (Print)", "5678-1234"]),
        (
            "1234-5678 (Print) 1234-5678 (Linking)",
            ["1234-5678 (Print)", "1234-5678 (Linking)"],
        ),
        ("1234-5678 5678-1234 9876-5432", ["1234-5678", "5678-1234", "9876-5432"]),
        ("1234-5678\n5678-1234\n9876-5432", ["1234-5678", "5678-1234", "9876-5432"]),
        (
            "1234-5678\\n5678-1234\\r\\n9876-5432",
            ["1234-5678", "5678-1234", "9876-5432"],
        ),
        ("  1234-5678  \n\n  5678-1234  \n", ["1234-5678", "5678-1234"]),
        (
            "1234-5678 (Print)\n5678-1234 (Electronic)",
            ["1234-5678 (Print)", "5678-1234 (Electronic)"],
        ),
        ("", []),
    ],
)
def test_split_issns(inp, expected):
    assert split_issns(inp) == expected


@pytest.mark.parametrize(
    ("inp", "expected"),
    [
        ("", "\n"),
        ("hello world", "\n"),
        ("hello\nworld", "\n"),
        ("\n", "\n"),
        ("\nhello\nworld\n", "\n"),
        ("hello\r\nworld", "\r\n"),
        ("hello\r\nworld\r\n", "\r\n"),
    ],
)
def test_newline_delimiter_of(inp, expected):
    assert newline_delimiter_of(inp) == expected
