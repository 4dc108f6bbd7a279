"""EndNote Tagged (.enw) parser kernel.

Reference parity: src/enw/parse.rs in revidiumhq/biblib. ``%0`` starts a
record; bare lines append to the last tag's value with a newline; %-lines
before the first ``%0`` are ignored; malformed %-lines fail the payload
(reference is fail-fast at payload level — we quarantine and stop).
"""

from __future__ import annotations

from typing import Any

from .authors import parse_author_name, split_given_and_middle
from .citation import ParseErr, author, date_from_tuple, empty_citation, iter_rust_lines
from .dates import parse_enw_date, parse_year_only
from .text import format_doi, format_page_numbers, split_issns

FORMAT_LABEL = "EndNote Tagged"

CONTRIBUTOR_TAGS = frozenset("AEY?H")  # %A %E %Y %? %H (parse.rs:125-134)


class _RawEnw:
    def __init__(self) -> None:
        self.data: dict[str, list[str]] = {}
        self.authors: list[dict[str, Any]] = []
        self.start_line: int | None = None
        self.span: list[int] | None = None

    def add(self, tag: str, value: str) -> None:
        self.data.setdefault(tag, []).append(value)

    def has_content(self) -> bool:
        return bool(self.data) or bool(self.authors)

    def has_started(self) -> bool:
        return self.start_line is not None

    def extend_span(self, end: int) -> None:
        if self.span is not None:
            self.span[1] = end

    def remove_all(self, tag: str) -> list[str]:
        return self.data.pop(tag, [])

    def take_first_non_empty(self, tag: str) -> str | None:
        """Remove and return the first non-blank value, keeping the rest.
        reference: parse.rs:181-189."""
        values = self.data.pop(tag, None)
        if values is None:
            return None
        idx = next((i for i, v in enumerate(values) if v.strip()), None)
        if idx is None:
            return None
        value = values.pop(idx)
        if values:
            self.data[tag] = values
        return value


def _parse_enw_line(line: str, line_number: int, span: tuple[int, int]) -> tuple[str, str]:
    """(tag_char, value) or raises. reference: parse.rs:254-303."""
    if len(line.encode("utf-8")) < 2:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="syntax",
            msg=f"ENW line too short: '{line}'", line=line_number, span=span,
        )
    chars = list(line[:3])
    percent = chars[0] if len(chars) > 0 else None
    tag_char = chars[1] if len(chars) > 1 else None
    separator = chars[2] if len(chars) > 2 else None
    if percent != "%" or tag_char is None:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="syntax",
            msg=f"Malformed ENW tag line: '{line}'", line=line_number, span=span,
        )
    if separator is not None and separator != " ":
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="syntax",
            msg=f"Malformed ENW tag separator after %{tag_char}: '{line}'",
            line=line_number, span=span,
        )
    raw = line.encode("utf-8")
    value = "" if len(raw) <= 2 else raw[3:].decode("utf-8", "replace").strip()
    return tag_char, value


def _parse_author(author_str: str) -> dict[str, Any]:
    family, given = parse_author_name(author_str)
    if given == "":
        return author(family)
    g, m = split_given_and_middle(given)
    return author(family, g, m)


def _push_unique(values: list[str], value: str) -> None:
    t = value.strip()
    if t and t not in values:
        values.append(t)


def _looks_like_isbn(value: str) -> bool:
    """reference: parse.rs:513-527."""
    compact = "".join(c for c in value if not c.isspace() and c != "-")
    if len(compact) == 10:
        return all(
            c.isascii() and c.isdigit() or (i == 9 and c in "Xx")
            for i, c in enumerate(compact)
        )
    if len(compact) == 13:
        return all(c.isascii() and c.isdigit() for c in compact)
    return False


def _join_field_values(values: list[str]) -> str | None:
    joined = "\n\n".join(v.strip() for v in values if v.strip())
    return joined if joined else None


def _raw_to_citation(raw: _RawEnw) -> dict[str, Any]:
    """reference: parse.rs:326-407."""
    c = empty_citation()
    citation_type: list[str] = []
    for v in raw.remove_all("0"):
        _push_unique(citation_type, v)
    for v in raw.remove_all("9"):
        _push_unique(citation_type, v)
    c["citation_type"] = citation_type

    title = raw.take_first_non_empty("T")
    if title is None:
        title = raw.take_first_non_empty("Q")
    title = title or ""

    # container priority %J > %B > %S (parse.rs:416-420)
    journal = (
        raw.take_first_non_empty("J")
        or raw.take_first_non_empty("B")
        or raw.take_first_non_empty("S")
    )

    # date: %8 if parseable else %D year-only; unparsed values stay in data
    date = None
    vals = raw.data.get("8")
    if vals:
        text = next((v for v in vals if v.strip()), None)
        if text is not None:
            parsed = parse_enw_date(text)
            if parsed is not None:
                raw.take_first_non_empty("8")
                date = parsed
    if date is None:
        vals = raw.data.get("D")
        if vals:
            text = next((v for v in vals if v.strip()), None)
            if text is not None:
                parsed = parse_year_only(text)
                if parsed is not None:
                    raw.take_first_non_empty("D")
                    date = parsed

    volume = raw.take_first_non_empty("V")
    issue = raw.take_first_non_empty("N")
    pages = raw.take_first_non_empty("P")
    if pages is not None:
        pages = format_page_numbers(pages)
    accession = raw.take_first_non_empty("M")
    publisher = raw.take_first_non_empty("I")
    language = raw.take_first_non_empty("G")
    keywords = raw.remove_all("K")
    abstract = _join_field_values(raw.remove_all("X"))

    # DOI from %R (leftovers preserved), then doi.org URLs (parse.rs:448-477)
    doi = None
    leftovers = []
    for v in raw.remove_all("R"):
        if doi is None:
            cand = format_doi(v)
            if cand is not None:
                doi = cand
                continue
        leftovers.append(v)
    if leftovers:
        raw.data["R"] = leftovers
    urls: list[str] = []
    for tag in ("U", ">"):
        for url in raw.remove_all(tag):
            if doi is None and "doi.org" in url:
                doi = format_doi(url)
            urls.append(url)

    # %@ ISBN kept intact; ISSN split (parse.rs:479-500)
    issn: list[str] = []
    for v in raw.remove_all("@"):
        t = v.strip()
        if not t:
            continue
        if _looks_like_isbn(t):
            issn.append(t)
            continue
        split = split_issns(t)
        issn.extend(split if split else [t])

    raw.remove_all("A")  # %A values live in authors

    if title == "" and not raw.authors:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="missing_value",
            msg="Missing required field title or author",
            line=raw.start_line,
            span=tuple(raw.span) if raw.span else None,
        )

    c["title"] = title
    c["authors"] = raw.authors
    c["journal"] = journal
    c["date"] = date_from_tuple(date)
    c["volume"] = volume
    c["issue"] = issue
    c["pages"] = pages
    c["issn"] = issn
    c["doi"] = doi
    c["accession_number"] = accession
    c["abstract_text"] = abstract
    c["keywords"] = keywords
    c["urls"] = urls
    c["language"] = language
    c["publisher"] = publisher
    c["extra_fields"] = {f"%{tag}": values for tag, values in raw.data.items()}
    return c


def parse_enw(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse an .enw payload into (citations, quarantine rows)."""
    records: list[_RawEnw] = []
    cur = _RawEnw()
    last_tag: str | None = None
    errors: list[dict[str, Any]] = []
    for line_number, (raw_line, byte_start, byte_end) in enumerate(
        iter_rust_lines(text), start=1
    ):
        if not raw_line.strip():
            continue
        if raw_line.startswith("%"):
            try:
                tag, value = _parse_enw_line(
                    raw_line, line_number, (byte_start, byte_end)
                )
            except ParseErr as e:
                # reference is fail-fast for the whole payload (parse.rs:214)
                errors.append(e.to_row())
                return [], errors
            if tag == "0":
                if cur.has_content():
                    records.append(cur)
                    cur = _RawEnw()
                cur.start_line = line_number
                cur.span = [byte_start, byte_end]
            elif not cur.has_started():
                continue
            else:
                cur.extend_span(byte_end)
            cur.add(tag, value)
            last_tag = tag
            if tag in CONTRIBUTOR_TAGS:
                cur.authors.append(_parse_author(value))
        elif cur.has_started():
            cur.extend_span(byte_end)
            if last_tag is not None:
                vals = cur.data.get(last_tag)
                if vals:
                    vals[-1] = vals[-1] + "\n" + raw_line.strip()
    if cur.has_content():
        records.append(cur)

    citations: list[dict[str, Any]] = []
    for raw in records:
        try:
            citations.append(_raw_to_citation(raw))
        except ParseErr as e:
            errors.append(e.to_row())
    return citations, errors
