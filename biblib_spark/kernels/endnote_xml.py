"""EndNote XML parser kernel.

Reference parity: src/endnote_xml/parse.rs in revidiumhq/biblib. Event-driven
(expat) with the reference's text-assembly rule — a field's text is every
character event until its closing tag (nested markup contributes text only) —
and the ORDER-SENSITIVE title cascade:

- <title>            -> title
- <secondary-title>  -> title if title still empty, else journal
- <alt-title>        -> title if no title and no journal; else journal if
                        unset; else journal_abbr
"""

from __future__ import annotations

import xml.parsers.expat
from typing import Any

from .authors import parse_author_name, split_given_and_middle
from .citation import ParseErr, author, date_from_tuple, empty_citation
from .dates import _parse_i32, _parse_u8, parse_endnote_date
from .text import format_doi, format_page_numbers, split_issns

FORMAT_LABEL = "EndNote XML"

# elements whose inner text becomes a field (reference parse.rs:204-410)
_CAPTURE_TAGS = frozenset(
    {
        "title", "author", "secondary-title", "alt-title", "custom2",
        "accession-num", "volume", "number", "pages",
        "electronic-resource-num", "url", "abstract", "keyword", "language",
        "publisher", "isbn", "year",
    }
)


class _RecordState:
    def __init__(self, start_byte: int, start_line: int) -> None:
        self.citation = empty_citation()
        self.start_byte = start_byte
        self.start_line = start_line


class _Parser:
    def __init__(self, content: str) -> None:
        self.content = content
        self.records: list[_RecordState] = []
        self.errors: list[dict[str, Any]] = []
        self.cur: _RecordState | None = None
        self.capture_tag: str | None = None
        self.capture_buf: list[str] = []
        self.year_attrs: tuple[int | None, int | None, int | None] | None = None

    # -- expat handlers -----------------------------------------------------

    def start(self, p, name: str, attrs: dict[str, str]) -> None:
        if name == "record" and self.cur is None:
            self.cur = _RecordState(p.CurrentByteIndex, p.CurrentLineNumber)
            return
        if self.cur is None or self.capture_tag is not None:
            return
        if name == "ref-type":
            v = attrs.get("name")
            if v is not None:
                self.cur.citation["citation_type"].append(v)
            return
        if name == "year":
            y = _parse_i32(attrs["year"]) if "year" in attrs else None
            m = _parse_u8(attrs.get("month", "")) if "month" in attrs else None
            if m is not None and not (1 <= m <= 12):
                m = None
            d = _parse_u8(attrs.get("day", "")) if "day" in attrs else None
            if d is not None and not (1 <= d <= 31):
                d = None
            self.year_attrs = (y, m, d)
            self.capture_tag = "year"
            self.capture_buf = []
            return
        if name in _CAPTURE_TAGS:
            self.capture_tag = name
            self.capture_buf = []

    def chardata(self, data: str) -> None:
        if self.capture_tag is not None:
            self.capture_buf.append(data)

    def end(self, p, name: str) -> None:
        if self.capture_tag is not None:
            if name != self.capture_tag:
                return  # nested element end inside a capture
            text = "".join(self.capture_buf).strip()
            tag = self.capture_tag
            self.capture_tag = None
            self._apply(tag, text)
            return
        if name == "record" and self.cur is not None:
            c = self.cur.citation
            if c["title"] == "" and not c["authors"]:
                self.errors.append(
                    ParseErr(
                        fmt=FORMAT_LABEL, kind="missing_value",
                        msg="Missing required field title or author",
                        line=self.cur.start_line,
                        span=(self.cur.start_byte, p.CurrentByteIndex),
                    ).to_row()
                )
            else:
                self.records.append(self.cur)
            self.cur = None

    # -- field application (parse.rs:204-410) --------------------------------

    def _apply(self, tag: str, text: str) -> None:
        assert self.cur is not None
        c = self.cur.citation
        if tag == "title":
            c["title"] = text
        elif tag == "author":
            family, given = parse_author_name(text)
            if given == "":
                c["authors"].append(author(family))
            else:
                g, m = split_given_and_middle(given)
                c["authors"].append(author(family, g, m))
        elif tag == "secondary-title":
            if c["title"] == "":
                c["title"] = text
            else:
                c["journal"] = text
        elif tag == "alt-title":
            if c["title"] == "" and c["journal"] is None:
                c["title"] = text
            elif c["journal"] is None:
                c["journal"] = text
            else:
                c["journal_abbr"] = text
        elif tag == "custom2":
            if "pmc" in text.lower() or text.startswith("PMC"):
                c["pmc_id"] = text
        elif tag == "accession-num":
            c["accession_number"] = text
        elif tag == "volume":
            c["volume"] = text
        elif tag == "number":
            c["issue"] = text
        elif tag == "pages":
            c["pages"] = format_page_numbers(text)
        elif tag == "electronic-resource-num":
            c["doi"] = format_doi(text)
        elif tag == "url":
            if c["doi"] is None and "doi.org" in text:
                c["doi"] = format_doi(text)
            c["urls"].append(text)
        elif tag == "abstract":
            c["abstract_text"] = text
        elif tag == "keyword":
            c["keywords"].append(text)
        elif tag == "language":
            c["language"] = text
        elif tag == "publisher":
            c["publisher"] = text
        elif tag == "isbn":
            c["issn"].extend(split_issns(text))
        elif tag == "year":
            y, m, d = self.year_attrs or (None, None, None)
            self.year_attrs = None
            if y is None:
                y = _parse_i32(text)
            c["date"] = date_from_tuple(parse_endnote_date(y, m, d))


def parse_endnote_xml(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse an EndNote XML payload into (citations, quarantine rows)."""
    if not text.strip():
        return [], []
    state = _Parser(text)
    p = xml.parsers.expat.ParserCreate()
    p.buffer_text = True
    p.StartElementHandler = lambda name, attrs: state.start(p, name, attrs)
    p.EndElementHandler = lambda name: state.end(p, name)
    p.CharacterDataHandler = state.chardata
    try:
        p.Parse(text, True)
    except xml.parsers.expat.ExpatError as e:
        # payload-level XML syntax failure (reference is fail-fast)
        state.errors.append(
            ParseErr(
                fmt=FORMAT_LABEL, kind="syntax",
                msg=f"XML parsing error: {e}",
                line=getattr(e, "lineno", None),
            ).to_row()
        )
        return [], state.errors
    return [r.citation for r in state.records], state.errors
