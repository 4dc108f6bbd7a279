"""RIS parser parity tests. Sources: /root/reference/src/ris/mod.rs:84-381,
src/ris/parse.rs:320-548, src/ris/structure.rs:421-587."""

from biblib_spark.kernels.ris import (
    parse_ris,
    ris_parse_raw,
    split_and_parse_authors,
)


def test_parse_simple_ris():
    input_ = (
        "TY  - JOUR\nTI  - Test Article Title\nAU  - Smith, John\nJO  - Test Journal\n"
        "PY  - 2023/12/25/Christmas edition\nVL  - 10\nIS  - 2\nSP  - 100\nEP  - 110\n"
        "DO  - 10.1000/test\nAB  - This is a test abstract.\nKW  - Keyword1\nKW  - Keyword2\n"
        "ER  -\n\n"
    )
    citations, errors = parse_ris(input_)
    assert errors == []
    assert len(citations) == 1
    c = citations[0]
    assert c["citation_type"][0] == "Journal Article"
    assert c["title"] == "Test Article Title"
    assert len(c["authors"]) == 1
    assert c["authors"][0]["name"] == "Smith"
    assert c["authors"][0]["given_name"] == "John"
    assert c["date"] == {"year": 2023, "month": 12, "day": 25}
    assert c["pages"] == "100-110"
    assert c["keywords"] == ["Keyword1", "Keyword2"]
    assert c["journal"] == "Test Journal"  # JO priority 3, only journal tag
    assert c["doi"] == "10.1000/test"
    assert c["volume"] == "10"
    assert c["issue"] == "2"


def test_parse_gs_format():
    input_ = (
        "TY  - JOUR\n"
        "T1  - Albendazole therapy in children with focal seizures\n"
        "A1  - Baranwal, Arun K\nA1  - Singhi, Pratibha D\nA1  - Khandelwal, N\n"
        "A1  - Singhi, Sunit C\n"
        "JO  - The Pediatric infectious disease journal\nVL  - 17\nIS  - 8\n"
        "SP  - 696\nEP  - 700\nSN  - 0891-3668\nY1  - 1998///\nPB  - LWW\nER  - \n\n\n"
        "TY  - JOUR\n"
        "T1  - High-dose praziquantel with cimetidine for refractory neurocysticercosis\n"
        "A1  - Yee, Thomas\nA1  - Barakos, Jerome A\nA1  - Knight, Robert T\n"
        "JO  - Western journal of medicine\nVL  - 170\nIS  - 2\nSP  - 112\n"
        "Y1  - 1999\nPB  - BMJ Publishing Group\nER  - \n\n"
    )
    citations, errors = parse_ris(input_)
    assert errors == []
    assert len(citations) == 2
    assert citations[0]["date"]["year"] == 1998
    assert citations[1]["date"]["year"] == 1999
    assert len(citations[0]["authors"]) == 4
    assert citations[0]["issn"] == ["0891-3668"]
    assert citations[0]["publisher"] == "LWW"
    # SP only → formatted start page
    assert citations[1]["pages"] == "112"


def test_parse_url_with_doi_extraction():
    input_ = (
        "TY  - JOUR\nTI  - Test Article\nUR  - https://doi.org/10.1000/test\n"
        "L1  - https://example.com/pdf\nER  -"
    )
    citations, _ = parse_ris(input_)
    c = citations[0]
    assert len(c["urls"]) == 2
    assert "https://doi.org/10.1000/test" in c["urls"]
    assert "https://example.com/pdf" in c["urls"]
    # L1 comes before UR in output order (structure.rs:280-287)
    assert c["urls"][0] == "https://example.com/pdf"
    assert c["doi"] == "10.1000/test"


def test_accession_number_and_id_extra_field():
    input_ = "TY  - JOUR\nTI  - Test Article\nAN  - ACC-123\nID  - REF-456\nER  -"
    citations, _ = parse_ris(input_)
    c = citations[0]
    assert c["accession_number"] == "ACC-123"
    assert c["pmid"] is None
    assert c["extra_fields"].get("ID") == ["REF-456"]


def test_missing_title_reports_first_citation_line():
    input_ = "TY  - JOUR\nAU  - Smith, John\nER  -\n"
    citations, errors = parse_ris(input_)
    assert citations == []
    assert len(errors) == 1
    assert errors[0]["error_line"] == 1
    assert errors[0]["error_span"]["start"] == 0
    assert errors[0]["error_span"]["end"] > 0


def test_missing_title_reports_second_citation_line():
    input_ = (
        "TY  - JOUR\nTI  - First\nER  -\n\nTY  - JOUR\nAU  - Doe, J\nER  -\n"
    )
    citations, errors = parse_ris(input_)
    assert len(citations) == 1
    assert len(errors) == 1
    assert errors[0]["error_line"] == 5
    first = "TY  - JOUR\nTI  - First\nER  -\n\n"
    assert errors[0]["error_span"]["start"] >= len(first.encode())


def test_m3_included_in_citation_type():
    input_ = "TY  - JOUR\nTI  - Test\nM3  - Randomized Controlled Trial\nER  -\n"
    citations, _ = parse_ris(input_)
    assert "Randomized Controlled Trial" in citations[0]["citation_type"]
    assert "Journal Article" in citations[0]["citation_type"]


def test_abstract_priority_and_joins():
    c, _ = parse_ris("TY  - JOUR\nTI  - Test\nN2  - Abstract from N2 field.\nER  -\n")
    assert c[0]["abstract_text"] == "Abstract from N2 field."

    c, _ = parse_ris(
        "TY  - JOUR\nTI  - Test\nAB  - Primary abstract.\nN2  - Fallback abstract.\nER  -\n"
    )
    assert c[0]["abstract_text"] == "Primary abstract."
    assert "N2" not in c[0]["extra_fields"]

    c, _ = parse_ris(
        "TY  - JOUR\nTI  - Test\nAB  - First paragraph.\nAB  - Second paragraph.\n"
        "AB  - Third paragraph.\nER  -\n"
    )
    assert (
        c[0]["abstract_text"]
        == "First paragraph.\n\nSecond paragraph.\n\nThird paragraph."
    )

    c, _ = parse_ris(
        "TY  - JOUR\nTI  - Test\nN2  - First fallback paragraph.\n"
        "N2  - Second fallback paragraph.\nER  -\n"
    )
    assert (
        c[0]["abstract_text"]
        == "First fallback paragraph.\n\nSecond fallback paragraph."
    )


def test_n2_multiline_no_indent():
    input_ = (
        "TY  - JOUR\nTI  - Test\nN2  - Brief Summary\n"
        "At present, there are no relevant studies.\nER  -\n"
    )
    citations, _ = parse_ris(input_)
    assert (
        citations[0]["abstract_text"]
        == "Brief Summary At present, there are no relevant studies."
    )


def test_metadata_lines_skipped():
    input_ = (
        "Record #1 of 2\nProvider: Test Provider\nDatabase: Test DB\n\n"
        "TY  - JOUR\nTI  - Test Article\nAU  - Smith, John\nER  -"
    )
    citations, _ = parse_ris(input_)
    assert len(citations) == 1
    assert citations[0]["title"] == "Test Article"


def test_invalid_lines_ignored():
    raw = ris_parse_raw("TY  - JOUR\nTI  - Title\n!!  - bad\nER  -\n")
    assert len(raw) == 1
    assert len(raw[0].ignored_lines) == 1
    assert raw[0].ignored_lines[0][0] == 3


def test_separator_variants():
    # "TY Content" / "TY-Content" variants (parse.rs:326-332)
    citations, _ = parse_ris("TY-JOUR\nTI- Some Title\nER-\n")
    assert len(citations) == 1
    assert citations[0]["title"] == "Some Title"
    assert citations[0]["citation_type"] == ["Journal Article"]


def test_split_authors():
    assert [a["name"] for a in split_and_parse_authors("Smith, J.; Doe, A.; Brown, B.")] == [
        "Smith", "Doe", "Brown",
    ]
    assert [a["name"] for a in split_and_parse_authors("Smith, J. & Doe, A.")] == [
        "Smith", "Doe",
    ]
    assert [a["name"] for a in split_and_parse_authors("Smith, J. and Doe, A.")] == [
        "Smith", "Doe",
    ]
    assert [a["name"] for a in split_and_parse_authors("Smith, J.; Doe, A. & Brown, B.")] == [
        "Smith", "Doe", "Brown",
    ]
    # commas never split (parse.rs:507-514)
    assert [a["name"] for a in split_and_parse_authors("Abebe, T., Alemu, B., & Teshome, M")] == [
        "Abebe", "Teshome",
    ]
    assert split_and_parse_authors("") == []


def test_empty_input():
    assert parse_ris("") == ([], [])
    assert parse_ris("Record #1 of 0\nProvider: Test Provider") == ([], [])


def test_journal_priority():
    # JF > T2 > JO with blank-first skipping (structure.rs:574-586)
    input_ = (
        "TY  - JOUR\nTI  - T\nJF  - \nT2  - Secondary Journal\n"
        "JO  - Alt Journal\nJA  - Abbrev J\nJ2  - Alt Abbrev\nER  -\n"
    )
    citations, _ = parse_ris(input_)
    assert citations[0]["journal"] == "Secondary Journal"
    assert citations[0]["journal_abbr"] == "Abbrev J"


def test_space_separator_fallback_ascii_fast_path():
    """Regression: the ASCII fast path must keep the bytes path's
    space-separator fallback (reference src/ris/parse.rs:139-210). A line
    with leading whitespace is NOT a continuation (first char not alnum),
    and its stripped form 'TI Example' parses via the ' ' fallback."""
    from biblib_spark.kernels.ris import _parse_ris_line, parse_ris

    assert _parse_ris_line("TI Example title") == ("TI", "Example title")
    assert _parse_ris_line("TI- Example") == ("TI", "Example")
    assert _parse_ris_line("TI") is None
    # non-ascii content takes the bytes path; same fallback
    assert _parse_ris_line("TI Exämple") == ("TI", "Exämple")

    text = "TY  - JOUR\n TI Example title\nER  -\n"
    cits, errors = parse_ris(text)
    assert len(cits) == 1
    assert cits[0]["title"] == "Example title"
