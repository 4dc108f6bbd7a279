"""CSV + ICTRP CSV parser parity tests.

Sources: /root/reference/src/csv/{parse.rs:225-354,structure.rs:276-386,
mod.rs}, src/ictrp/csv.rs:185-289, src/ictrp/common.rs:89-128.
"""

from biblib_spark.kernels.csvfmt import (
    CsvConfig,
    dedupe_urls,
    parse_csv,
    parse_ictrp_compact_date,
    parse_ictrp_csv,
    parse_ictrp_standard_date,
)
from biblib_spark.kernels.detect import looks_like_ictrp_csv


def test_csv_parse_basic():
    citations, errors = parse_csv("Title,Author,Year\nTest Article,Smith J,2023")
    assert errors == []
    c = citations[0]
    assert c["title"] == "Test Article"
    assert len(c["authors"]) == 1
    assert c["authors"][0]["name"] == "Smith"
    assert c["date"] == {"year": 2023, "month": None, "day": None}
    assert c["citation_type"] == ["Journal Article"]


def test_csv_parse_no_headers():
    cfg = CsvConfig(has_header=False)
    citations, errors = parse_csv("Test Article,Smith J,2023", cfg)
    # Column1..3 are unknown headers -> extra fields; no title -> quarantine
    assert citations == []
    assert errors[0]["error_kind"] == "missing_value"


def test_csv_custom_delimiter():
    cfg = CsvConfig(delimiter=";")
    citations, _ = parse_csv("Title;Author;Year\nTest Article;Smith J;2023", cfg)
    assert citations[0]["title"] == "Test Article"


def test_csv_quotes():
    citations, _ = parse_csv(
        'Title,Author,Year\n"Test Article with, comma","Smith, John",2023'
    )
    assert citations[0]["title"] == "Test Article with, comma"
    assert citations[0]["authors"][0]["name"] == "Smith"


def test_csv_multiple_authors_and_keywords():
    citations, _ = parse_csv(
        'Title,Authors,Keywords\nT,"Smith, John; Doe, Jane","k1; k2; k3"'
    )
    a = citations[0]["authors"]
    assert [x["name"] for x in a] == ["Smith", "Doe"]
    assert citations[0]["keywords"] == ["k1", "k2", "k3"]


def test_csv_strict_field_count():
    # extra field in strict mode fails the payload (parse.rs:297-304)
    citations, errors = parse_csv("Title,Author\nTest Article,Smith J,Extra Field")
    assert citations == []
    assert errors[0]["error_kind"] == "syntax"

    # missing field errors at line 2 (parse.rs:342-353)
    citations, errors = parse_csv("Title,Author\nTest Article")
    assert citations == []
    assert errors[0]["error_line"] == 2


def test_csv_flexible_mode():
    cfg = CsvConfig(flexible=True)
    citations, errors = parse_csv("Title,Author\nTest Article,Smith J,Extra Field", cfg)
    assert errors == []
    assert citations[0]["title"] == "Test Article"


def test_csv_empty_input():
    assert parse_csv("") == ([], [])


def test_csv_issn_and_doi_normalization():
    citations, _ = parse_csv(
        "Title,ISSN,DOI\nT,1234-5678 (Print) 5678-1234,https://doi.org/10.1000/X\n"
    )
    assert citations[0]["issn"] == ["1234-5678 (Print)", "5678-1234"]
    assert citations[0]["doi"] == "10.1000/x"


def test_csv_unknown_headers_to_extra():
    citations, _ = parse_csv("Title,Custom Column\nT,custom value\n")
    assert citations[0]["extra_fields"] == {"Custom Column": ["custom value"]}


def test_looks_like_ictrp_csv():
    input_ = (
        "TrialID,Public title,Scientific title,Date registration,Source Register\n"
        "NCT00000001,Public,Scientific,01/05/2026,ClinicalTrials.gov\n"
    )
    assert looks_like_ictrp_csv(input_)
    assert not looks_like_ictrp_csv("Title,Author\nT,A\n")


def test_parse_ictrp_csv():
    input_ = (
        "TrialID,Public title,Scientific title,Primary sponsor,Date registration,"
        "Date registration3,Study type,web address,results url link,Secondary ID,"
        "Source Register\n"
        "NCT00000001,Public title,Scientific title,Sponsor,01/05/2026,20260501,"
        "Interventional,https://example.test/study,https://example.test/results,"
        "ABC-123,ClinicalTrials.gov\n"
    )
    citations, errors = parse_ictrp_csv(input_)
    assert errors == []
    c = citations[0]
    assert c["accession_number"] == "NCT00000001"
    assert c["title"] == "Scientific title"
    assert c["publisher"] == "Sponsor"
    assert c["citation_type"] == ["Clinical Trial", "Interventional"]
    assert c["date"] == {"year": 2026, "month": 5, "day": 1}
    assert c["extra_fields"]["Public title"] == ["Public title"]
    assert c["extra_fields"]["Secondary ID"] == ["ABC-123"]
    assert len(c["urls"]) == 2


def test_ictrp_public_title_fallback():
    input_ = (
        "TrialID,Public title,Scientific title,Date registration,Source Register\n"
        "NCT00000002,Public title,,01/05/2026,ClinicalTrials.gov\n"
    )
    c = parse_ictrp_csv(input_)[0][0]
    assert c["title"] == "Public title"
    assert c["citation_type"] == ["Clinical Trial"]


def test_ictrp_no_duplicate_clinical_trial():
    input_ = (
        "TrialID,Public title,Scientific title,Study type,Date registration,Source Register\n"
        "NCT00000003,Public title,Scientific title,Clinical Trial,01/05/2026,ClinicalTrials.gov\n"
    )
    c = parse_ictrp_csv(input_)[0][0]
    assert c["citation_type"] == ["Clinical Trial"]


def test_ictrp_tolerates_extra_row_fields():
    input_ = (
        "TrialID,Public title,Scientific title,Primary sponsor,Date registration,Source Register\n"
        "NCT00000004,Public title,Scientific title,Sponsor,01/05/2026,"
        "ClinicalTrials.gov,unexpected,overflow\n"
    )
    c = parse_ictrp_csv(input_)[0][0]
    assert c["accession_number"] == "NCT00000004"
    assert c["title"] == "Scientific title"


def test_ictrp_dates():
    assert parse_ictrp_compact_date("20260501") == (2026, 5, 1)
    assert parse_ictrp_standard_date("01/05/2026") == (2026, 5, 1)
    assert parse_ictrp_standard_date("2026/05/01") == (2026, 5, 1)
    assert parse_ictrp_standard_date("2026-05-01") == (2026, 5, 1)
    assert parse_ictrp_compact_date("2026051") is None
    assert parse_ictrp_standard_date("garbage") is None

    input_ = (
        "TrialID,Public title,Scientific title,Date registration,Source Register\n"
        "NCT00000005,Public title,Scientific title,2026-05-01,ClinicalTrials.gov\n"
    )
    c = parse_ictrp_csv(input_)[0][0]
    assert c["date"] == {"year": 2026, "month": 5, "day": 1}


def test_dedupe_urls():
    assert dedupe_urls(["a", "b", "a", "  ", "c"]) == ["a", "b", "c"]
