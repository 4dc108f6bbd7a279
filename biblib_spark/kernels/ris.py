"""RIS format parser kernel (pure Python, runs inside pandas UDFs).

Reference parity: src/ris/{parse.rs,structure.rs,tags.rs} in revidiumhq/biblib.
Framing: ``TY`` starts a record, ``ER`` ends it; bare lines whose first two
bytes are ASCII alphanumerics but lack a separator are continuations of the
previous tag; ``Record #/Provider:/Content:/Database:`` metadata lines are
skipped; other invalid lines are recorded as ignored.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .authors import parse_author_name, split_given_and_middle
from .citation import ParseErr, author, date_from_tuple, empty_citation, iter_rust_lines
from .dates import parse_ris_date
from .text import format_doi, format_page_numbers

FORMAT_LABEL = "RIS"

AUTHOR_TAGS = frozenset({"AU", "A1", "A2", "A3", "A4"})

# reference: src/ris/structure.rs:380-418
RIS_TYPE_MAP = {
    "ABST": "Abstract",
    "ADVS": "Audiovisual Material",
    "ART": "Art Work",
    "BILL": "Bill/Resolution",
    "BOOK": "Book",
    "CASE": "Case",
    "CHAP": "Book Chapter",
    "COMP": "Computer Program",
    "CONF": "Conference Proceeding",
    "CTLG": "Catalog",
    "DATA": "Data File",
    "ELEC": "Electronic Citation",
    "GEN": "Generic",
    "HEAR": "Hearing",
    "ICOMM": "Internet Communication",
    "INPR": "In Press",
    "JFULL": "Journal/Periodical (Full)",
    "JOUR": "Journal Article",
    "MAP": "Map",
    "MGZN": "Magazine Article",
    "MPCT": "Motion Picture",
    "MUSIC": "Music Score",
    "NEWS": "Newspaper",
    "PAMP": "Pamphlet",
    "PAT": "Patent",
    "PCOMM": "Personal Communication",
    "RPRT": "Report",
    "SER": "Serial Publication",
    "SLIDE": "Slide",
    "SOUND": "Sound Recording",
    "STAT": "Statute",
    "UNBILL": "Unenacted Bill/Resolution",
    "UNPB": "Unpublished Work",
    "VIDEO": "Video Recording",
}

# reference: src/ris/tags.rs:205-226
_JOURNAL_PRIORITY = {"JF": 1, "T2": 2, "JO": 3}
_JOURNAL_ABBR_PRIORITY = {"JA": 1, "J2": 2}


@dataclass
class RawRis:
    """IR #1 — raw tag multimap per record (src/ris/structure.rs:19-31)."""

    data: dict[str, list[str]] = field(default_factory=dict)
    authors: list[dict[str, Any]] = field(default_factory=list)
    ignored_lines: list[tuple[int, str]] = field(default_factory=list)
    start_line: int | None = None
    span: list[int] | None = None  # [start, end) byte offsets

    def add(self, tag: str, value: str) -> None:
        self.data.setdefault(tag, []).append(value)

    def first(self, tag: str) -> str | None:
        vals = self.data.get(tag)
        return vals[0] if vals else None

    def pop(self, tag: str) -> list[str] | None:
        return self.data.pop(tag, None)

    def has_content(self) -> bool:
        return bool(self.data) or bool(self.authors)


def _is_continuation_line(raw: bytes) -> bool:
    """reference: src/ris/parse.rs:285-310 (operates on bytes)."""
    if len(raw) < 2:
        return True
    b0, b1 = raw[0], raw[1]
    if not (_is_ascii_alnum(b0) and _is_ascii_alnum(b1)):
        return False  # invalid tag chars — goes to the error/ignored path
    if len(raw) >= 6 and raw[2:6] == b"  - ":
        return False
    if len(raw) >= 5 and raw[2:5] == b"  -":
        return False
    if len(raw) >= 4 and raw[2:4] == b"- ":
        return False
    if len(raw) >= 3 and raw[2] == ord("-"):
        return False
    return True


def _is_continuation_line_ascii(line: str) -> bool:
    """str fast path of ``_is_continuation_line`` for ``line.isascii()``
    inputs, where byte indexing equals char indexing. Same decision table
    (slice comparisons imply the length guards of the bytes version)."""
    if len(line) < 2:
        return True
    if not (_ASCII_ALNUM.get(line[0]) and _ASCII_ALNUM.get(line[1])):
        return False
    if (
        line[2:6] == "  - "
        or line[2:5] == "  -"
        or line[2:4] == "- "
        or line[2:3] == "-"
    ):
        return False
    return True


def _is_ascii_alnum(b: int) -> bool:
    return (48 <= b <= 57) or (65 <= b <= 90) or (97 <= b <= 122)


_ASCII_ALNUM = {
    chr(b): True
    for b in range(128)
    if (48 <= b <= 57) or (65 <= b <= 90) or (97 <= b <= 122)
}


def _is_metadata_line(line: str) -> bool:
    """reference: src/ris/parse.rs:313-318."""
    return line.startswith(("Record #", "Provider:", "Content:", "Database:"))


def _parse_ris_line(line: str) -> tuple[str, str] | None:
    """(tag, content) or None on syntax error. reference: src/ris/parse.rs:139-210."""
    if line.isascii():  # fast path: byte indexing == char indexing
        if len(line) < 2:
            return None
        if not (_ASCII_ALNUM.get(line[0]) and _ASCII_ALNUM.get(line[1])):
            return None
        tag = line[:2]
        if line[2:6] == "  - ":
            return tag, line[6:].strip()
        if line[2:5] == "  -":
            return tag, line[5:].strip()
        if line[2:4] == "- ":
            return tag, line[4:].strip()
        if line[2:3] == "-":
            return tag, line[3:].strip()
        if len(line) > 2 and line[2] == " ":
            # space-separator fallback, same as the bytes path below
            return tag, line[2:].strip()
        return None
    raw = line.encode("utf-8")
    if len(raw) < 2:
        return None
    tag_bytes = raw[:2]
    if not all(_is_ascii_alnum(b) for b in tag_bytes):
        return None
    tag = tag_bytes.decode("ascii")
    # separator variants, byte-indexed like the reference
    if len(raw) >= 6 and raw[2:6] == b"  - ":
        return tag, raw[6:].decode("utf-8", "replace").strip()
    if len(raw) >= 5 and raw[2:5] == b"  -":
        return tag, raw[5:].decode("utf-8", "replace").strip()
    if len(raw) >= 4 and raw[2:4] == b"- ":
        return tag, raw[4:].decode("utf-8", "replace").strip()
    if len(raw) >= 3 and raw[2:3] == b"-":
        return tag, raw[3:].decode("utf-8", "replace").strip()
    if len(raw) > 2:
        third = chr(raw[2]) if raw[2] < 128 else ""
        if third == " " or third == "-":
            return tag, raw[2:].decode("utf-8", "replace").strip()
    return None


def _parse_author(author_str: str) -> dict[str, Any]:
    """reference: src/ris/parse.rs:260-273."""
    family, given = parse_author_name(author_str)
    if given == "":
        return author(family)
    g, m = split_given_and_middle(given)
    return author(family, g, m)


def split_and_parse_authors(author_str: str) -> list[dict[str, Any]]:
    """Split multi-author lines on ';', ' & ', ' and '. reference: src/ris/parse.rs:220-257."""
    trimmed = author_str.strip()
    if not trimmed:
        return []
    authors: list[dict[str, Any]] = []
    for segment in trimmed.split(";"):
        segment = segment.strip()
        if not segment:
            continue
        subs: list[str] = []
        for s in segment.split(" & "):
            subs.extend(s.split(" and "))
        for sub in subs:
            sub = sub.strip()
            if sub:
                authors.append(_parse_author(sub))
    if not authors:
        authors.append(_parse_author(trimmed))
    return authors


def ris_parse_raw(text: str) -> list[RawRis]:
    """Pass 1: frame records and collect raw tag data. reference: src/ris/parse.rs:14-136."""
    if not text.strip():
        return []
    citations: list[RawRis] = []
    cur = RawRis()
    last_tag: str | None = None
    for line_number, (raw_line, byte_start, byte_end) in enumerate(
        iter_rust_lines(text), start=1
    ):
        # fast path: the canonical "XX  - value" tag line (the overwhelming
        # majority of real RIS lines). First two chars ASCII-alnum plus the
        # exact "  - " separator is never a continuation, never metadata,
        # never blank, and parses to (tag, line[6:].strip()) on both the str
        # and bytes paths (the 6-char prefix is ASCII, so char offset ==
        # byte offset) — one slice comparison replaces the strip /
        # continuation / metadata / separator dispatch chain.
        if (
            raw_line[2:6] == "  - "
            and _ASCII_ALNUM.get(raw_line[0])
            and _ASCII_ALNUM.get(raw_line[1])
        ):
            parsed = (raw_line[:2], raw_line[6:].strip())
        else:
            parsed = None
            if not raw_line.strip():
                continue
            is_cont = (
                _is_continuation_line_ascii(raw_line)
                if raw_line.isascii()
                else _is_continuation_line(raw_line.encode("utf-8"))
            )
            if is_cont:
                if last_tag is not None:
                    if cur.span is not None:
                        cur.span[1] = byte_end
                    vals = cur.data.get(last_tag)
                    if vals:
                        vals[-1] = vals[-1] + " " + raw_line.strip()
                else:
                    cur.ignored_lines.append((line_number, raw_line.strip()))
                continue
            line = raw_line.strip()
            if _is_metadata_line(line):
                continue
            parsed = _parse_ris_line(line)
            if parsed is None:
                if cur.span is not None:
                    cur.span[1] = byte_end
                last_tag = None
                cur.ignored_lines.append((line_number, line))
                continue
        tag, content = parsed
        if tag == "TY":
            if cur.has_content():
                citations.append(cur)
                cur = RawRis()
            last_tag = None
            cur.start_line = line_number
            cur.span = [byte_start, byte_end]
            cur.add(tag, content)
        elif tag == "ER":
            if cur.span is not None:
                cur.span[1] = byte_end
            last_tag = None
            if cur.has_content():
                citations.append(cur)
                cur = RawRis()
        elif tag in AUTHOR_TAGS:
            if cur.span is not None:
                cur.span[1] = byte_end
            last_tag = None
            cur.authors.extend(split_and_parse_authors(content))
        else:
            if cur.span is not None:
                cur.span[1] = byte_end
            last_tag = tag
            cur.add(tag, content)
    if cur.has_content():
        citations.append(cur)
    return citations


def _best_by_priority(raw: RawRis, priorities: dict[str, int]) -> str | None:
    """First value of the highest-priority tag whose first value is non-blank.

    reference: src/ris/structure.rs:79-109.
    """
    best_val: str | None = None
    best_pri = 1 << 30
    for tag, values in raw.data.items():
        pri = priorities.get(tag)
        if pri is not None and pri < best_pri and values and values[0].strip():
            best_pri = pri
            best_val = values[0]
    return best_val


def _join_field_values(values: list[str]) -> str | None:
    """Trim, drop empties, join with blank line. reference: src/ris/structure.rs:341-350."""
    joined = "\n\n".join(v.strip() for v in values if v.strip())
    return joined if joined else None


def raw_to_citation(raw: RawRis) -> dict[str, Any]:
    """Pass 2: shape RawRis into a citation record. reference: src/ris/structure.rs:112-374.

    Raises ParseErr for a missing/blank title (quarantined by the caller).
    """
    c = empty_citation()

    citation_type = [RIS_TYPE_MAP.get(t, t) for t in raw.pop("TY") or []]
    for wt in raw.pop("M3") or []:
        if wt.strip() and wt not in citation_type:
            citation_type.append(wt)
    c["citation_type"] = citation_type

    # title: TI else T1, blank-skipped (structure.rs:170-203)
    title = raw.first("TI")
    if title is None or not title.strip():
        title = raw.first("T1")
    if title is None or not title.strip():
        raise ParseErr(
            fmt=FORMAT_LABEL,
            kind="missing_value",
            msg="Missing required field title (key TI)",
            line=raw.start_line,
            span=tuple(raw.span) if raw.span else None,
        )
    raw.pop("TI")
    raw.pop("T1")
    c["title"] = title

    c["journal"] = _best_by_priority(raw, _JOURNAL_PRIORITY)
    c["journal_abbr"] = _best_by_priority(raw, _JOURNAL_ABBR_PRIORITY)
    for t in ("JF", "JO", "JA", "J2", "T2"):
        raw.pop(t)

    # date: PY preferred over Y1 (structure.rs:221-237); Y2 discarded
    date_str = raw.first("PY")
    if date_str is None:
        date_str = raw.first("Y1")
    c["date"] = date_from_tuple(parse_ris_date(date_str)) if date_str is not None else None
    for t in ("PY", "Y1", "Y2"):
        raw.pop(t)

    vol = raw.pop("VL")
    c["volume"] = vol[0] if vol else None
    iss = raw.pop("IS")
    c["issue"] = iss[0] if iss else None
    sp = raw.pop("SP")
    ep = raw.pop("EP")
    start_page = sp[0] if sp else None
    end_page = ep[0] if ep else None
    if start_page is not None and end_page is not None:
        c["pages"] = format_page_numbers(f"{start_page}-{end_page}")
    elif start_page is not None:
        c["pages"] = format_page_numbers(start_page)
    elif end_page is not None:
        c["pages"] = end_page

    # DOI two-pass (structure.rs:271-305)
    do = raw.pop("DO")
    doi = format_doi(do[0]) if do else None
    urls: list[str] = []
    for tag in ("L1", "L2", "L3", "L4", "UR", "LK"):
        tag_urls = raw.pop(tag)
        if tag_urls:
            if doi is None:
                for url in tag_urls:
                    if "doi.org" in url:
                        extracted = format_doi(url)
                        if extracted is not None:
                            doi = extracted
                            break
            urls.extend(tag_urls)
    c["doi"] = doi
    c["urls"] = urls

    an = raw.pop("AN")
    c["accession_number"] = an[0] if an else None
    # pmid always None for RIS; C2 kept only when it mentions PMC (structure.rs:314-321)
    c2 = raw.pop("C2")
    if c2 and "PMC" in c2[0]:
        c["pmc_id"] = c2[0]

    ab = raw.pop("AB")
    abstract = _join_field_values(ab) if ab else None
    if abstract is None:
        n2 = raw.pop("N2")
        abstract = _join_field_values(n2) if n2 else None
    raw.pop("AB")
    raw.pop("N2")
    c["abstract_text"] = abstract

    c["keywords"] = raw.pop("KW") or []
    c["issn"] = raw.pop("SN") or []
    la = raw.pop("LA")
    c["language"] = la[0] if la else None
    pb = raw.pop("PB")
    c["publisher"] = pb[0] if pb else None

    raw.pop("ER")
    c["authors"] = raw.authors
    c["extra_fields"] = {tag: values for tag, values in raw.data.items()}
    return c


def parse_ris(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse a RIS payload into (citations, quarantine rows)."""
    citations: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    for raw in ris_parse_raw(text):
        try:
            citations.append(raw_to_citation(raw))
        except ParseErr as e:
            errors.append(e.to_row())
    return citations, errors
