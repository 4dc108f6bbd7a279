"""Bib parser parity tests. Source: /root/reference/src/bib/mod.rs:60-267."""

from biblib_spark.kernels.bib import (
    parse_bib,
    parse_people_list,
    split_top_level_and,
)
from biblib_spark.kernels.detect import looks_like_bib


def test_parse_simple_article():
    input_ = (
        "@article{smith2024,\n  title = {Example Article},\n"
        "  author = {Smith, John and Doe, Jane},\n  date = {2024-05-02},\n"
        "  doi = {10.1000/example},\n  url = {https://doi.org/10.1000/example}\n}"
    )
    citations, errors = parse_bib(input_)
    assert errors == []
    c = citations[0]
    assert c["citation_type"] == ["article"]
    assert c["title"] == "Example Article"
    assert [(a["name"], a["given_name"]) for a in c["authors"]] == [
        ("Smith", "John"), ("Doe", "Jane"),
    ]
    assert c["doi"] == "10.1000/example"
    assert c["urls"] == ["https://doi.org/10.1000/example"]
    assert c["date"] == {"year": 2024, "month": 5, "day": 2}


def test_three_authors():
    c = parse_bib(
        "@article{x, title = {T}, author = {Smith, John and Doe, Jane and Brown, Alex}}"
    )[0][0]
    assert [a["name"] for a in c["authors"]] == ["Smith", "Doe", "Brown"]


def test_title_subtitle_and_editor():
    c = parse_bib(
        "@book{t, title = {Main Title}, subtitle = {Practical Guide},"
        " editor = {Doe, Jane}}"
    )[0][0]
    assert c["title"] == "Main Title: Practical Guide"
    assert c["authors"][0]["name"] == "Doe"
    # editor stays in extra_fields even when used for authors
    assert c["extra_fields"]["editor"] == ["Doe, Jane"]


def test_journal_priority():
    c = parse_bib(
        "@article{j, title = {Example}, author = {Smith, John},"
        " journaltitle = {Journal Title}, journal = {Fallback Journal},"
        " booktitle = {Proceedings Title}}"
    )[0][0]
    assert c["journal"] == "Journal Title"
    assert c["extra_fields"]["journal"] == ["Fallback Journal"]
    assert c["extra_fields"]["booktitle"] == ["Proceedings Title"]


def test_string_macros_and_concat():
    input_ = (
        "@string{jmlr = {Journal of Machine Learning Research}}\n"
        "@article{m, title = {Example}, author = {Smith, John},\n"
        "  journaltitle = jmlr # { Archive},\n  year = {2024},\n  month = jan\n}"
    )
    c = parse_bib(input_)[0][0]
    assert c["journal"] == "Journal of Machine Learning Research Archive"
    assert c["date"] == {"year": 2024, "month": 1, "day": None}


def test_crossref_and_xdata_inheritance():
    input_ = (
        "@xdata{xcommon,\n  publisher = {Shared Publisher},\n  langid = {english}\n}\n\n"
        "@proceedings{conf2024,\n  title = {Conference Proceedings},\n  year = {2024},\n"
        "  booktitle = {Conference Proceedings},\n  xdata = {xcommon}\n}\n\n"
        "@inproceedings{child2024,\n  title = {Child Paper},\n  author = {Doe, Jane},\n"
        "  crossref = {conf2024}\n}"
    )
    citations, errors = parse_bib(input_)
    assert errors == []
    # xdata entries are skipped from output
    assert len(citations) == 2
    child = next(c for c in citations if c["title"] == "Child Paper")
    assert child["publisher"] == "Shared Publisher"
    assert child["language"] == "english"
    assert child["journal"] == "Conference Proceedings"
    assert child["extra_fields"]["crossref"] == ["conf2024"]


def test_missing_parent_soft_failure():
    c = parse_bib(
        "@article{m, title = {Example}, author = {Smith, John}, crossref = {unknown-parent}}"
    )[0][0]
    assert c["extra_fields"]["crossref"] == ["unknown-parent"]


def test_unresolved_macro_raw_preserved():
    c = parse_bib(
        "@article{u, title = {Example}, author = {Smith, John},"
        " note = unknownmacro # { appendix}}"
    )[0][0]
    assert c["extra_fields"]["note"] == ["unknownmacro # { appendix}"]


def test_detect_looks_like_bib():
    assert looks_like_bib("@article{a, title={Example}}")
    assert looks_like_bib(" \n\t@string{name = {Value}}")
    assert not looks_like_bib("article{a, title={Example}}")
    assert not looks_like_bib("@ not really bib")


def test_unterminated_brace_is_error():
    citations, errors = parse_bib(
        "@article{broken,\n  title = {Example,\n  author = {Smith, John}\n}"
    )
    assert citations == []
    assert errors[0]["error_kind"] == "syntax"
    assert errors[0]["error_line"] is not None


def test_identity_less_entry_errors():
    citations, errors = parse_bib("@misc{empty,\n  note = {Only a note}\n}")
    assert citations == []
    assert errors[0]["error_kind"] == "missing_value"
    assert errors[0]["error_line"] == 1


def test_corporate_and_particle_names():
    people = parse_people_list("{Corporate Name Inc.} and von Neumann, John")
    assert people[0]["name"] == "Corporate Name Inc."
    assert people[0]["given_name"] is None
    assert people[1]["name"] == "von Neumann"

    # particle heuristic on unstructured names
    people = parse_people_list("John von Neumann and Ada Lovelace")
    assert people[0]["name"] == "von Neumann"
    assert people[0]["given_name"] == "John"
    assert people[1]["name"] == "Lovelace"
    assert people[1]["given_name"] == "Ada"


def test_jr_three_part_name():
    # "Last, Jr, First" -> given = "First Jr" (parse.rs:1109-1114)
    people = parse_people_list("Smith, Jr, John")
    assert people[0]["name"] == "Smith"
    assert people[0]["given_name"] == "John"
    assert people[0]["middle_name"] == "Jr"


def test_split_top_level_and_brace_aware():
    assert split_top_level_and("{A and B} and C") == ["{A and B}", "C"]


def test_keywords_separators():
    c = parse_bib("@article{k, title={T}, keywords = {ml; health; ml}}")[0][0]
    assert c["keywords"] == ["ml", "health"]
    c = parse_bib("@article{k, title={T}, keywords = {ml, health}}")[0][0]
    assert c["keywords"] == ["ml", "health"]
    c = parse_bib('@article{k, title={T}, keywords = {one\ntwo}}')[0][0]
    assert c["keywords"] == ["one", "two"]


def test_isbn_appended_to_issn():
    c = parse_bib(
        "@article{i, title={T}, issn = {1234-5678 (Print) 5678-1234},"
        " isbn = {978-3-16-148410-0}}"
    )[0][0]
    assert c["issn"] == ["1234-5678 (Print)", "5678-1234", "978-3-16-148410-0"]


def test_pmid_accession_fallbacks():
    c = parse_bib("@article{p, title={T}, pmid = {123456}}")[0][0]
    assert c["pmid"] == "123456"
    assert c["accession_number"] == "123456"
    c = parse_bib("@article{p, title={T}, eid = {2-s2.0-12345}}")[0][0]
    assert c["accession_number"] == "2-s2.0-12345"


def test_comment_preamble_skipped():
    input_ = (
        "@comment{this { is } ignored}\n@preamble{\"some preamble\"}\n"
        "% line comment\n@article{x, title = {Kept}}"
    )
    citations, errors = parse_bib(input_)
    assert errors == []
    assert citations[0]["title"] == "Kept"


def test_parentheses_delimiters():
    c = parse_bib("@article(p, title = {Paren Entry})")[0][0]
    assert c["title"] == "Paren Entry"


def test_pages_formatted():
    c = parse_bib("@article{p, title={T}, pages = {1234-45}}")[0][0]
    assert c["pages"] == "1234-1245"
