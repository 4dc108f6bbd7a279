"""PubMed parser parity tests. Sources: /root/reference/src/pubmed/mod.rs:88-410,
split.rs:51-79, whole_lines.rs:82-116, author.rs:195-385."""

from biblib_spark.kernels.pubmed import (
    _AuthorName,
    blank_line_split,
    parse_pubmed,
    resolve_authors,
    whole_lines,
)


def test_parse_simple_citation():
    input_ = (
        "PMID- 12345678\nTI- Test Article Title\nFAU- Smith, John\nJT- Test Journal\n"
        "DP- 2023 Jan 23\nVI- 10\nIP- 2\nPG- 100-110\nLID- 10.1000/test [doi]\n"
        "AB- This is a test abstract.\nMH- Keyword1\nMH- Keyword2\n\n"
    )
    citations, errors = parse_pubmed(input_)
    assert errors == []
    assert len(citations) == 1
    c = citations[0]
    assert c["pmid"] == "12345678"
    assert c["title"] == "Test Article Title"
    assert c["authors"][0]["name"] == "Smith"
    assert c["authors"][0]["given_name"] == "John"
    assert c["date"] == {"year": 2023, "month": 1, "day": 23}
    assert c["mesh_terms"] == ["Keyword1", "Keyword2"]
    assert c["doi"] == "10.1000/test"
    assert c["pages"] == "100-110"


def test_parse_three_citations():
    input_ = "PMID- 123\nTI- One\n\nPMID- 456\nTI- Two\n\nPMID- 789\nTI- Three\n"
    citations, _ = parse_pubmed(input_)
    assert [c["title"] for c in citations] == ["One", "Two", "Three"]
    assert [c["pmid"] for c in citations] == ["123", "456", "789"]


def test_affiliation_continuation():
    input_ = (
        "PMID- 12345678\nTI  - Test Article Title\nFAU - Smith, John\n"
        "AD  - Department of Science, Test University\n"
        "      New York, NY 10021, USA\nJT  - Test Journal\n\n"
    )
    citations, _ = parse_pubmed(input_)
    assert (
        "Department of Science, Test University New York, NY 10021, USA"
        in citations[0]["authors"][0]["affiliations"]
    )


def test_journal_names_and_fallback():
    c, _ = parse_pubmed("PMID- 1\nTI  - T\nJT  - Journal of Testing\nTA  - J Test\n\n")
    assert c[0]["journal"] == "Journal of Testing"
    assert c[0]["journal_abbr"] == "J Test"
    c, _ = parse_pubmed("PMID- 1\nTI  - T\nTA  - J Test\n\n")
    assert c[0]["journal"] is None
    assert c[0]["journal_abbr"] == "J Test"


def test_issn_list():
    c, _ = parse_pubmed("PMID- 1\nTI  - T\nIS  - 1234-5678\nIS  - 8765-4321\n\n")
    assert c[0]["issn"] == ["1234-5678", "8765-4321"]


def test_au_only_authors():
    c, _ = parse_pubmed("PMID- 1\nTI  - T\nAU  - Smith J\nAU  - Jones B\n\n")
    a = c[0]["authors"]
    assert len(a) == 2
    assert (a[0]["name"], a[0]["given_name"]) == ("Smith", "J")
    assert (a[1]["name"], a[1]["given_name"]) == ("Jones", "B")


def test_fau_precedence_over_au():
    c, _ = parse_pubmed(
        "PMID- 1\nTI  - T\nFAU - Li, Yun\nAU  - Li Y\nFAU - Zhang, Huajun\nAU  - Zhang H\n\n"
    )
    a = c[0]["authors"]
    assert len(a) == 2
    assert (a[0]["name"], a[0]["given_name"]) == ("Li", "Yun")
    assert (a[1]["name"], a[1]["given_name"]) == ("Zhang", "Huajun")


def test_crlf_endings():
    c, _ = parse_pubmed(
        "PMID- 123\r\nTI- Windows\r\nFAU- Gates, Bill\r\nFAU- Cutler, Dave"
    )
    assert c[0]["pmid"] == "123"
    assert c[0]["title"] == "Windows"
    assert (c[0]["authors"][0]["name"], c[0]["authors"][0]["given_name"]) == (
        "Gates", "Bill",
    )
    assert (c[0]["authors"][1]["name"], c[0]["authors"][1]["given_name"]) == (
        "Cutler", "Dave",
    )


def test_continued_lines():
    input_ = (
        "PMID- 31181385\nDP  - 2019 Dec\n"
        "TI  - Fantastic yeasts and where to find them: the hidden diversity of dimorphic fungal \n"
        "      pathogens.\n"
        "AB  - This is a long abstract that spans\n      multiple lines for testing purposes.\n"
        "FAU - Van Dyke, Marley C Caballero\nAU  - Van Dyke MCC\n"
    )
    citations, _ = parse_pubmed(input_)
    c = citations[0]
    assert c["title"] == (
        "Fantastic yeasts and where to find them: the hidden diversity of"
        " dimorphic fungal pathogens."
    )
    assert c["abstract_text"] == (
        "This is a long abstract that spans multiple lines for testing purposes."
    )
    assert len(c["authors"]) == 1
    assert c["date"] == {"year": 2019, "month": 12, "day": None}


def test_hyphen_continuation_no_space():
    out = whole_lines(["LONG- Self-", "      assembled structures are important"])
    assert out == ["LONG- Self-assembled structures are important"]


def test_empty_inputs():
    assert parse_pubmed("") == ([], [])
    assert parse_pubmed("   \n  \t  ") == ([], [])


def test_doi_extraction_rules():
    c, _ = parse_pubmed("PMID- 1\nTI- T\nAID- 10.1234/aid.test [doi]\n\n")
    assert c[0]["doi"] == "10.1234/aid.test"
    c, _ = parse_pubmed(
        "PMID- 1\nTI- T\nLID- 10.1000/lid.doi [doi]\nAID- 10.1234/aid.doi [doi]\n\n"
    )
    assert c[0]["doi"] == "10.1000/lid.doi"
    c, _ = parse_pubmed(
        "PMID- 1\nTI- T\nLID- S1234-5678(23)00001-X [pii]\n"
        "AID- 10.1016/j.example.2023.01.001 [doi]\n\n"
    )
    assert c[0]["doi"] == "10.1016/j.example.2023.01.001"


def test_missing_title_errors_and_spans():
    citations, errors = parse_pubmed("PMID- 12345678\nAU  - Smith, John\n\n")
    assert citations == []
    assert errors[0]["error_line"] == 1
    assert errors[0]["error_span"]["start"] == 0
    assert errors[0]["error_span"]["end"] > 0

    first = "PMID- 1\nTI  - First\n\n"
    citations, errors = parse_pubmed(first + "PMID- 2\nAU  - Doe, J\n\n")
    assert len(citations) == 1
    assert errors[0]["error_line"] == 4
    assert errors[0]["error_span"]["start"] >= len(first.encode())


def test_bad_date_is_hard_error():
    citations, errors = parse_pubmed("PMID- 1\nTI  - Title\nDP  - not-a-date\n\n")
    assert citations == []
    assert errors[0]["error_kind"] == "bad_value"
    assert errors[0]["error_line"] == 1


def test_third_citation_line_number():
    input_ = (
        "PMID- 1\nTI  - One\n\n"
        "PMID- 2\nTI  - Two\n\n"
        "PMID- 3\nAU  - Doe, J\n\n"
    )
    citations, errors = parse_pubmed(input_)
    assert len(citations) == 2
    assert errors[0]["error_line"] == 7


def test_blank_line_split_cases():
    # split.rs:58-74
    cases = [
        ("", []),
        ("\n", [(1, "\n")]),
        ("\n\n", [(1, "\n\n")]),
        ("one", [(1, "one")]),
        ("\none", [(1, "\n"), (2, "one")]),
        ("\n\none", [(1, "\n\n"), (3, "one")]),
        ("one\n", [(1, "one\n")]),
        ("one\ntwo\nthree\n", [(1, "one\ntwo\nthree\n")]),
        ("one\ntwo\nthree\n\n\n", [(1, "one\ntwo\nthree\n\n\n")]),
        (
            "one\ntwo\nthree\n\napple\nbat\ncat\n",
            [(1, "one\ntwo\nthree\n\n"), (5, "apple\nbat\ncat\n")],
        ),
        (
            "\n\none\ntwo\nthree\n\n\n\napple\nbat\ncat\n",
            [(1, "\n\n"), (3, "one\ntwo\nthree\n\n\n\n"), (9, "apple\nbat\ncat\n")],
        ),
    ]
    for text, expected in cases:
        got = [(ln, chunk) for ln, _b, chunk in blank_line_split(text, "\n")]
        assert got == expected, f"for {text!r}"


def test_author_name_semantics():
    # author.rs:201-250
    cases = [
        ("Einstein A", "Einstein, Albert", "Einstein", "A", "Albert"),
        ("Watson JD", "Watson, James D", "Watson", "JD", "James D"),
        ("Crick FHC", "Crick, Francis Harry Compton", "Crick", "FHC",
         "Francis Harry Compton"),
        ("van der Valk JPM", "van der Valk, J P M", "van der Valk", "JPM", "J P M"),
    ]
    for au, fau, last, initials, given in cases:
        f = _AuthorName(fau, full=True)
        assert f.last_name() == last
        assert f.first_initials() == initials
        assert f.given_name() == given
        s = _AuthorName(au, full=False)
        assert s.last_name() == last
        assert s.first_initials() == initials

    # consecutive identical AU lines = two authors (author.rs:252-266)
    authors, _ = resolve_authors([("AU", "Watson JD"), ("AU", "Watson JD")])
    assert len(authors) == 2

    # leading affiliations are dropped from authors (author.rs:343-384)
    authors, leading = resolve_authors(
        [
            ("AD", "Lab of Unknown Stuff"),
            ("FAU", "Einstein, Albert"),
            ("AU", "Einstein A"),
            ("AD", "University of Zurich"),
        ]
    )
    assert leading == ["Lab of Unknown Stuff"]
    assert len(authors) == 1
    assert authors[0].affiliations == ["University of Zurich"]
