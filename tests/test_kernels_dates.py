"""Parity tests for date kernels. Sources: /root/reference/src/utils.rs:652-849."""

import pytest

from biblib_spark.kernels.dates import (
    parse_bib_date,
    parse_bib_year_month,
    parse_endnote_date,
    parse_enw_date,
    parse_month_name,
    parse_pubmed_date,
    parse_ris_date,
    parse_year_only,
)


def test_parse_pubmed_date():
    assert parse_pubmed_date("2020 Jun 9") == (2020, 6, 9)
    assert parse_pubmed_date("2023 May") == (2023, 5, None)
    assert parse_pubmed_date("2023") == (2023, None, None)
    assert parse_pubmed_date("") is None
    # unknown month token -> month None, not an error (utils.rs:216-218)
    assert parse_pubmed_date("2023 Smarch 3") == (2023, None, 3)
    # non-numeric year -> None
    assert parse_pubmed_date("May 2023") is None


def test_parse_ris_date():
    assert parse_ris_date("1999/12/25/Christmas edition") == (1999, 12, 25)
    assert parse_ris_date("2023/05") == (2023, 5, None)
    assert parse_ris_date("2023") == (2023, None, None)
    assert parse_ris_date("2023//") == (2023, None, None)
    assert parse_ris_date("") is None
    # out-of-range month dropped, day still parsed (guarded lets)
    assert parse_ris_date("2023/13/05") == (2023, None, 5)


def test_parse_endnote_date():
    assert parse_endnote_date(2023, 5, 30) == (2023, 5, 30)
    assert parse_endnote_date(2023, None, None) == (2023, None, None)
    assert parse_endnote_date(None, 12, 25) is None


def test_parse_enw_date():
    assert parse_enw_date("2023") == (2023, None, None)
    assert parse_enw_date("2023-05-30") == (2023, 5, 30)
    assert parse_enw_date("May 30, 2023") == (2023, 5, 30)
    assert parse_enw_date("2023 May 30") == (2023, 5, 30)
    assert parse_enw_date("not-a-date") is None
    assert parse_enw_date("2007-05-02") == (2007, 5, 2)
    assert parse_enw_date("2023/05/30") == (2023, 5, 30)


def test_parse_bib_date():
    assert parse_bib_date("2024-05-02") == (2024, 5, 2)
    assert parse_bib_date("2024/05") == (2024, 5, None)
    assert parse_bib_date("2024") == (2024, None, None)
    assert parse_bib_date("bad-date") is None
    # delimiter present but no month part -> None (parts.get(1)? in utils.rs:346)
    assert parse_bib_date("2024-") is None


def test_parse_bib_year_month():
    assert parse_bib_year_month("2024", "jan") == (2024, 1, None)
    assert parse_bib_year_month("2024", "11") == (2024, 11, None)
    assert parse_bib_year_month("2024", "bogus") is None


def test_parse_year_only():
    assert parse_year_only("2023") == (2023, None, None)
    assert parse_year_only("2023/") == (2023, None, None)
    assert parse_year_only("") is None


def test_parse_month_name():
    assert parse_month_name("Jan") == 1
    assert parse_month_name("january") == 1
    assert parse_month_name("Feb") == 2
    assert parse_month_name("december") == 12
    assert parse_month_name("invalid") is None
