"""ICTRP XML (WHO export) parser kernel.

Reference parity: src/ictrp/xml.rs in revidiumhq/biblib. One ``<Trial>``
element per registry record; every child element's text is a raw field;
markup normalization (``<br>`` -> newline, escaped comparisons, soft-wrap
collapse) and contact splitting applied per field; the citation mapping
mirrors the ICTRP CSV path. Golden oracle:
tests/fixtures/ictrp/expected-output.json.
"""

from __future__ import annotations

import xml.parsers.expat
from typing import Any

from .citation import ParseErr, date_from_tuple, empty_citation
from .csvfmt import dedupe_urls, parse_ictrp_compact_date, parse_ictrp_standard_date

FORMAT_LABEL = "ICTRP XML"

# reference: src/ictrp/common.rs:3-10 (underscore variants are the XML keys)
URL_FIELD_KEYS = frozenset(
    {
        "web address", "results url link", "results url protocol",
        "web_address", "results_url_link", "results_url_protocol",
    }
)

CONTACT_FIELDS = frozenset(
    {
        "Contact_Firstname", "Contact_Lastname", "Contact_Email",
        "Contact_Tel", "Contact_Affiliation",
    }
)

_PUNCT_ONLY = set(";,/\\-+")


def _starts_new_block(line: str) -> bool:
    """``- `` bullets or ``N. `` numbered items. reference: xml.rs:385-406."""
    if line.startswith("- "):
        return True
    i = 0
    while i < len(line) and line[i].isascii() and line[i].isdigit():
        i += 1
    if i == 0 or i >= len(line) or line[i] != ".":
        return False
    return i + 1 < len(line) and line[i + 1].isspace()


def collapse_soft_wrapped_lines(value: str) -> str:
    """reference: src/ictrp/xml.rs:352-383."""
    output = ""
    for line in value.split("\n"):
        trimmed = line.strip()
        if not trimmed:
            if not output.endswith("\n\n") and output:
                output += "\n\n"
            continue
        if not output:
            output = trimmed
            continue
        if output.endswith("\n\n") or _starts_new_block(trimmed):
            if not output.endswith("\n"):
                output += "\n"
            output += trimmed
        else:
            output += " " + trimmed
    return output


def normalize_embedded_markup(value: str) -> str:
    """reference: src/ictrp/xml.rs:318-350."""
    n = value.replace("\r\n", "\n")
    n = (
        n.replace("\r<br />", "<br />")
        .replace("\r<br/>", "<br/>")
        .replace("\r<br>", "<br>")
    )
    n = (
        n.replace("&lt;br /&gt;", "\n")
        .replace("&lt;br/&gt;", "\n")
        .replace("&lt;br&gt;", "\n")
        .replace("<br />", "\n")
        .replace("<br/>", "\n")
        .replace("<br>", "\n")
    )
    n = n.replace("\r", "\n")
    n = (
        n.replace("&lt;=", "<=")
        .replace("&gt;=", ">=")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    )
    n = "\n".join(line.strip() for line in n.split("\n")).strip()
    return collapse_soft_wrapped_lines(n)


def split_contact_field_values(value: str) -> list[str]:
    """reference: src/ictrp/xml.rs:184-196."""
    out = []
    for part in value.split(";"):
        part = part.strip()
        if not part:
            continue
        if all(ch in _PUNCT_ONLY for ch in part):
            continue
        out.append(part)
    return out


def _store_field(
    fields: dict[str, list[str]], urls: list[str], key: str, value: str
) -> None:
    """reference: src/ictrp/xml.rs:128-157."""
    trimmed = value.strip()
    if not trimmed:
        return
    if key in URL_FIELD_KEYS:
        urls.append(trimmed)
        fields.setdefault(key, []).append(trimmed)
        return
    if key in CONTACT_FIELDS:
        values = split_contact_field_values(normalize_embedded_markup(trimmed))
    else:
        n = normalize_embedded_markup(trimmed)
        values = [n] if n else []
    if not values:
        return
    entry = fields.setdefault(key, [])
    for v in values:
        if v not in entry:
            entry.append(v)


def _first_value(fields: dict[str, list[str]], key: str) -> str | None:
    values = fields.get(key)
    if not values:
        return None
    return next((v for v in values if v.strip()), None)


def _take_first_value(fields: dict[str, list[str]], key: str) -> str | None:
    values = fields.get(key)
    if not values:
        return None
    idx = next((i for i, v in enumerate(values) if v.strip()), None)
    if idx is None:
        return None
    value = values.pop(idx)
    if not values:
        del fields[key]
    return value


def _build_trial(
    fields: dict[str, list[str]],
    urls: list[str],
    start_line: int,
    span: tuple[int, int],
) -> dict[str, Any]:
    """reference: src/ictrp/xml.rs:198-290."""
    accession = _take_first_value(fields, "TrialID")
    if accession is None:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="missing_value",
            msg="Missing required field accession_number (key TrialID)",
            line=start_line, span=span,
        )
    title = _take_first_value(fields, "Scientific_title")
    if title is None:
        title = _take_first_value(fields, "Public_title")
    if title is None:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="missing_value",
            msg="Missing required field title (key Scientific_title/Public_title)",
            line=start_line, span=span,
        )

    compact = _first_value(fields, "Date_registration3")
    fallback = _first_value(fields, "Date_registration")
    date = None
    if compact is not None:
        date = parse_ictrp_compact_date(compact)
    if date is None and fallback is not None:
        date = parse_ictrp_standard_date(fallback)
    # remove only the date source actually used (xml.rs:240-252)
    if compact is not None and parse_ictrp_compact_date(compact) is not None:
        fields.pop("Date_registration3", None)
    elif fallback is not None and parse_ictrp_standard_date(fallback) is not None:
        fields.pop("Date_registration", None)

    publisher = _take_first_value(fields, "Primary_sponsor")
    citation_type = ["Clinical Trial"]
    study_type = _take_first_value(fields, "Study_type")
    if study_type is not None and study_type.strip() and study_type != "Clinical Trial":
        citation_type.append(study_type)

    for k in ("web_address", "results_url_link", "results_url_protocol"):
        fields.pop(k, None)

    c = empty_citation()
    c["citation_type"] = citation_type
    c["title"] = title
    c["date"] = date_from_tuple(date)
    c["accession_number"] = accession
    c["publisher"] = publisher
    c["urls"] = dedupe_urls(urls)
    c["extra_fields"] = fields
    return c


class _Parser:
    def __init__(self) -> None:
        self.citations: list[dict[str, Any]] = []
        self.errors: list[dict[str, Any]] = []
        self.in_trial = False
        self.trial_start: tuple[int, int] = (0, 1)  # (byte, line)
        self.fields: dict[str, list[str]] = {}
        self.urls: list[str] = []
        self.capture_tag: str | None = None
        self.capture_buf: list[str] = []

    def start(self, p, name: str, attrs: dict[str, str]) -> None:
        if name == "Trial" and not self.in_trial:
            self.in_trial = True
            self.trial_start = (p.CurrentByteIndex, p.CurrentLineNumber)
            self.fields = {}
            self.urls = []
            return
        if self.in_trial and self.capture_tag is None:
            self.capture_tag = name
            self.capture_buf = []

    def chardata(self, data: str) -> None:
        if self.capture_tag is not None:
            self.capture_buf.append(data)

    def end(self, p, name: str) -> None:
        if self.capture_tag is not None:
            if name != self.capture_tag:
                return
            _store_field(
                self.fields, self.urls, self.capture_tag, "".join(self.capture_buf)
            )
            self.capture_tag = None
            return
        if name == "Trial" and self.in_trial:
            self.in_trial = False
            start_byte, start_line = self.trial_start
            try:
                self.citations.append(
                    _build_trial(
                        self.fields, self.urls, start_line,
                        (start_byte, p.CurrentByteIndex),
                    )
                )
            except ParseErr as e:
                self.errors.append(e.to_row())


def parse_ictrp_xml(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse an ICTRP XML payload into (citations, quarantine rows)."""
    if not text.strip():
        return [], []
    state = _Parser()
    p = xml.parsers.expat.ParserCreate()
    p.buffer_text = True
    p.StartElementHandler = lambda name, attrs: state.start(p, name, attrs)
    p.EndElementHandler = lambda name: state.end(p, name)
    p.CharacterDataHandler = state.chardata
    try:
        p.Parse(text, True)
    except xml.parsers.expat.ExpatError as e:
        state.errors.append(
            ParseErr(
                fmt=FORMAT_LABEL, kind="syntax",
                msg=f"XML parsing error: {e}",
                line=getattr(e, "lineno", None),
            ).to_row()
        )
        return [], state.errors
    return state.citations, state.errors
