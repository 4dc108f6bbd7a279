"""ENW parser parity tests. Source: /root/reference/src/enw/mod.rs:55-323."""

from biblib_spark.kernels.enw import parse_enw


def test_parse_sample_enw_record():
    input_ = (
        "%0 Edited Book\n%@ 978-3-8309-1689-5\n%E Handke, Jürgen\n%E Franke, Peter\n"
        "%T The virtual linguistics campus\n%D 2006\n%C Münster\n%I Waxmann\n"
        "%J Strategies and concepts for successful e-learning\n%P 324 S.\n%K E-Learning\n"
    )
    citations, errors = parse_enw(input_)
    assert errors == []
    c = citations[0]
    assert c["citation_type"] == ["Edited Book"]
    assert c["title"] == "The virtual linguistics campus"
    assert c["journal"] == "Strategies and concepts for successful e-learning"
    assert c["publisher"] == "Waxmann"
    assert c["pages"] == "324 S."
    assert c["keywords"] == ["E-Learning"]
    assert c["date"]["year"] == 2006
    assert c["issn"] == ["978-3-8309-1689-5"]
    assert len(c["authors"]) == 2
    assert len(c["extra_fields"]["%E"]) == 2
    assert c["extra_fields"]["%C"] == ["Münster"]


def test_parse_multiple_records():
    input_ = (
        "%0 Journal Article\n%T First\n%A Smith, John\n\n"
        "%0 Report\n%T Second\n%A Doe, Jane\n"
    )
    citations, _ = parse_enw(input_)
    assert [c["title"] for c in citations] == ["First", "Second"]
    assert citations[0]["citation_type"] == ["Journal Article"]
    assert citations[1]["citation_type"] == ["Report"]


def test_type_dedup():
    input_ = (
        "%0 Journal Article\n%9 Randomized Controlled Trial\n"
        "%9 Randomized Controlled Trial\n%T Example\n"
    )
    citations, _ = parse_enw(input_)
    assert citations[0]["citation_type"] == [
        "Journal Article", "Randomized Controlled Trial",
    ]


def test_contributor_roles():
    input_ = (
        "%0 Book\n%T Example\n%A Smith, John\n%E Doe, Jane\n%Y Brown, Alex\n"
        "%? Helper, Sam\n%H Translator, Terry\n"
    )
    c = parse_enw(input_)[0][0]
    assert len(c["authors"]) == 5
    assert "%A" not in c["extra_fields"]
    assert c["extra_fields"]["%E"] == ["Doe, Jane"]
    assert c["extra_fields"]["%Y"] == ["Brown, Alex"]
    assert c["extra_fields"]["%?"] == ["Helper, Sam"]
    assert c["extra_fields"]["%H"] == ["Translator, Terry"]


def test_container_priority():
    input_ = (
        "%0 Journal Article\n%T Example\n%S Tertiary Title\n%B Conference Name\n"
        "%J Journal Name\n"
    )
    c = parse_enw(input_)[0][0]
    assert c["journal"] == "Journal Name"
    assert c["extra_fields"]["%B"] == ["Conference Name"]
    assert c["extra_fields"]["%S"] == ["Tertiary Title"]
    assert "%J" not in c["extra_fields"]


def test_date_priority():
    c = parse_enw("%0 Journal Article\n%T Example\n%D 2006\n%8 2007-05-02\n")[0][0]
    assert c["date"] == {"year": 2007, "month": 5, "day": 2}
    assert c["extra_fields"]["%D"] == ["2006"]

    c = parse_enw("%0 Journal Article\n%T Example\n%D 2006\n%8 not-a-date\n")[0][0]
    assert c["date"] == {"year": 2006, "month": None, "day": None}
    assert c["extra_fields"]["%8"] == ["not-a-date"]


def test_doi_extraction():
    input_ = (
        "%0 Journal Article\n%T Example\n%R 10.1000/example\n%R PMID-12345\n"
        "%U https://doi.org/10.1000/url-fallback\n%> https://example.com/full.pdf\n"
    )
    c = parse_enw(input_)[0][0]
    assert c["doi"] == "10.1000/example"
    assert c["urls"] == [
        "https://doi.org/10.1000/url-fallback",
        "https://example.com/full.pdf",
    ]
    assert c["extra_fields"]["%R"] == ["PMID-12345"]


def test_continuation_lines():
    c = parse_enw(
        "%0 Journal Article\n%T Example\n%X First line\nSecond line continues here.\n"
    )[0][0]
    assert c["abstract_text"] == "First line\nSecond line continues here."


def test_author_only_record_is_valid():
    c = parse_enw("%0 Personal Communication\n%A Smith, John\n")[0][0]
    assert c["title"] == ""
    assert len(c["authors"]) == 1


def test_missing_content_quarantined():
    citations, errors = parse_enw("%0 Generic\n%K keyword\n")
    assert citations == []
    assert errors[0]["error_line"] == 1
    assert errors[0]["error_kind"] == "missing_value"
    assert errors[0]["error_span"]["start"] == 0
    assert errors[0]["error_span"]["end"] > 0


def test_malformed_tag_fails_payload():
    citations, errors = parse_enw("%0 Journal Article\n%AB bad\n%T Example\n")
    assert citations == []
    assert errors[0]["error_line"] == 2
    assert errors[0]["error_kind"] == "syntax"


def test_pre_record_tags_ignored():
    # %-lines before the first %0 are skipped (parse.rs:223-224)
    c, errors = parse_enw("%T Stray Title\n%0 Journal Article\n%T Real Title\n")
    assert errors == []
    assert c[0]["title"] == "Real Title"
