"""PubMed/MEDLINE .nbib parser kernel.

Reference parity: src/pubmed/{split.rs,whole_lines.rs,parse.rs,author.rs,
structure.rs,tags.rs} in revidiumhq/biblib.

Pipeline per payload: blank-line record split (R2) -> continuation-line join
with the hyphen rule (R3) -> tag/value split on the first '-' -> stateless
tag multimap + ordered FAU/AU/AD stream -> author resolution (A4/A5) ->
citation shaping. A bad ``DP`` date is the one hard error among all formats
(quarantined); missing TI/BTI also quarantines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .authors import split_given_and_middle
from .citation import ParseErr, date_from_tuple, empty_citation
from .dates import parse_pubmed_date
from .text import newline_delimiter_of

FORMAT_LABEL = "PubMed"

# reference: src/pubmed/tags.rs:192-285 (from_tag)
KNOWN_TAGS = frozenset(
    """AB AD AID AU AUID BTI CI CIN CN COI CON CP CRDT CRF CRI CTDT CTI DCOM
    DDIN DRIN DEP DP DRDT ECF ECI EDAT EFR EIN ED EN FAU FED FIR FPS GN GR GS
    IP IR IRAD IS ISBN JID JT LA LID LR MH MHDA MID NM OAB OABL OCI OID ORI
    OT OTO OWN PB PG PHST PL PMC PMCR PMID PS PST PT RF RIN RN ROF RPF RPI
    RRI RRF SB SFM SI SO SPIN STAT TA TI TT UIN UOF VI VTI""".split()
)

CONSECUTIVE_TAGS = frozenset({"AU", "FAU", "AD"})


def blank_line_split(text: str, line_break: str) -> list[tuple[int, int, str]]:
    """Chunks of consecutive non-blank lines with trailing blank lines
    attached. Returns (start_line, start_byte, chunk). reference:
    src/pubmed/split.rs:21-49 (split_inclusive semantics).
    """
    out: list[tuple[int, int, str]] = []
    pos = 0
    line_no = 1
    n = len(text)
    lb = line_break
    lb_len = len(lb)
    while pos < n:
        start = pos
        start_line = line_no
        lines = 0
        # consume lines until (and including) the first blank line
        while pos < n:
            nl = text.find(lb, pos)
            if nl < 0:
                line_no += 1
                lines += 1
                pos = n
                break
            piece_len = nl + lb_len - pos
            blank = piece_len == lb_len
            pos = nl + lb_len
            line_no += 1
            lines += 1
            if blank:
                break
        # absorb consecutive additional blank lines
        while text.startswith(lb, pos):
            pos += lb_len
            line_no += 1
        out.append((start_line, start, text[start:pos]))
    return out


def _join_lines(parts: list[str]) -> str:
    """Space-join except after '-' / ' ' / empty. reference: whole_lines.rs:63-72."""
    acc = ""
    for e in parts:
        if acc.endswith("-") or acc.endswith(" ") or acc == "":
            acc += e
        else:
            acc += " " + e
    return acc


def whole_lines(lines: list[str]) -> list[str]:
    """Join continuation lines (leading space). reference: whole_lines.rs:23-80."""
    out: list[str] = []
    cur: list[str] | None = None
    for line in lines:
        if cur is None:
            cur = [line]
        elif line.startswith(" "):
            cur.append(line.lstrip())
        else:
            out.append(_join_lines(cur))
            cur = [line]
    if cur is not None:
        out.append(_join_lines(cur))
    return out


def _parse_entry(line: str) -> tuple[str, str] | None:
    """Split on the first '-'; known tag or None. reference: parse.rs:66-82."""
    if "-" not in line:
        return None
    k, v = line.split("-", 1)
    k = k.rstrip()
    v = v.lstrip()
    if k in KNOWN_TAGS:
        return k, v
    return None


@dataclass
class _AuthorName:
    name: str
    full: bool  # FAU vs AU

    def last_name(self) -> str:
        parts = (
            self.name.split(", ", 1) if self.full else self.name.rsplit(" ", 1)
        )
        return parts[0] if len(parts) == 2 else self.name

    def given_name(self) -> str | None:
        parts = (
            self.name.split(", ", 1) if self.full else self.name.rsplit(" ", 1)
        )
        return parts[1] if len(parts) == 2 else None

    def first_initials(self) -> str:
        if self.full:
            parts = self.name.split(", ", 1)
            if len(parts) != 2:
                return ""
            # map_while: stop at the first empty token (author.rs:105-112)
            chars = []
            for tok in parts[1].split(" "):
                if not tok:
                    break
                chars.append(tok[0])
            return "".join(chars)
        parts = self.name.rsplit(" ", 1)
        return parts[1] if len(parts) == 2 else ""

    def au_equals(self, au: str) -> bool:
        """AU may omit middle initials. reference: author.rs:79-83."""
        parts = au.rsplit(" ", 1)
        last, initials = (parts[0], parts[1]) if len(parts) == 2 else (au, "")
        return self.last_name() == last and self.first_initials().startswith(initials)


@dataclass
class _PubmedAuthor:
    name: _AuthorName
    affiliations: list[str] = field(default_factory=list)


def resolve_authors(
    entries: list[tuple[str, str]],
) -> tuple[list[_PubmedAuthor], list[str]]:
    """Ordered FAU/AU/AD fold. reference: author.rs:164-193."""
    authors: list[_PubmedAuthor] = []
    leading: list[str] = []
    for tag, value in entries:
        if tag == "AU":
            prev = authors[-1].name if authors else None
            if not (prev is not None and prev.full and prev.au_equals(value)):
                authors.append(_PubmedAuthor(_AuthorName(value, full=False)))
        elif tag == "FAU":
            authors.append(_PubmedAuthor(_AuthorName(value, full=True)))
        else:  # AD
            if authors:
                authors[-1].affiliations.append(value)
            else:
                leading.append(value)
    return authors, leading


def _author_to_dict(a: _PubmedAuthor) -> dict[str, Any]:
    given = a.name.given_name()
    g, m = split_given_and_middle(given) if given is not None else (None, None)
    return {
        "name": a.name.last_name(),
        "given_name": g,
        "middle_name": m,
        "affiliations": a.affiliations,
    }


def _join_if_some(v: list[str] | None) -> str | None:
    """Multiple single-value tags joined with " AND " (structure.rs:108-116)."""
    if not v:
        return None
    return " AND ".join(v)


def _doi_from_lid(values: list[str] | None) -> str | None:
    """First value ending " [doi]", suffix stripped, NOT further normalized
    (structure.rs:140-142)."""
    if not values:
        return None
    for s in values:
        if s.endswith(" [doi]"):
            return s[: -len(" [doi]")]
    return None


def _chunk_to_citation(
    chunk: str,
    line_break: str,
    start_line: int,
    start_byte: int,
) -> dict[str, Any] | None:
    """One blank-line chunk -> citation dict, None for blank chunks, or
    raises ParseErr. reference: parse.rs:27-43 + structure.rs:20-106."""
    span = (
        start_byte,
        start_byte
        + (len(chunk) if chunk.isascii() else len(chunk.encode("utf-8"))),
    )
    data: dict[str, list[str]] = {}
    ordered: list[tuple[str, str]] = []
    any_content = False
    lines = chunk.split(line_break)
    # fast path: no line starts with a space -> whole_lines is the identity
    # (every group is a single line and _join_lines of one element returns
    # it unchanged); the common case for machine-exported .nbib
    if not (chunk.startswith(" ") or (line_break + " ") in chunk):
        entry_lines = lines
    else:
        entry_lines = whole_lines(lines)
    for entry_line in entry_lines:
        if entry_line.strip():
            any_content = True
        parsed = _parse_entry(entry_line)
        if parsed is None:
            continue  # ignored line
        tag, value = parsed
        if tag in CONSECUTIVE_TAGS:
            ordered.append((tag, value))
        else:
            data.setdefault(tag, []).append(value)
    if not any_content:
        # an all-blank chunk; the reference would fail the payload with a
        # missing-title error — we skip it (lenient quarantine model, S4)
        return None

    authors, _leading = resolve_authors(ordered)

    c = empty_citation()
    dp = data.pop("DP", None)
    if dp:
        parsed_date = parse_pubmed_date(dp[0])
        if parsed_date is None:
            raise ParseErr(
                fmt=FORMAT_LABEL,
                kind="bad_value",
                msg=f"DP value {dp[0]!r} is not a valid date in YYYY MMM D format",
                line=start_line,
                span=span,
            )
        c["date"] = date_from_tuple(parsed_date)

    title = _join_if_some(data.pop("TI", None))
    if title is None:
        title = _join_if_some(data.pop("BTI", None))
    if title is None:
        raise ParseErr(
            fmt=FORMAT_LABEL,
            kind="missing_value",
            msg="Missing required field title (key TI)",
            line=start_line,
            span=span,
        )
    data.pop("TI", None)
    data.pop("BTI", None)

    c["title"] = title
    c["citation_type"] = data.pop("PT", [])
    c["authors"] = [_author_to_dict(a) for a in authors]
    c["journal"] = _join_if_some(data.pop("JT", None))
    c["journal_abbr"] = _join_if_some(data.pop("TA", None))
    c["volume"] = _join_if_some(data.pop("VI", None))
    c["issue"] = _join_if_some(data.pop("IP", None))
    c["pages"] = _join_if_some(data.pop("PG", None))
    c["issn"] = data.pop("IS", [])
    doi = _doi_from_lid(data.pop("LID", None))
    if doi is None:
        doi = _doi_from_lid(data.pop("AID", None))
    c["doi"] = doi
    c["pmid"] = _join_if_some(data.pop("PMID", None))
    c["pmc_id"] = _join_if_some(data.pop("PMC", None))
    c["abstract_text"] = _join_if_some(data.pop("AB", None))
    c["language"] = _join_if_some(data.pop("LA", None))
    c["mesh_terms"] = data.pop("MH", [])
    c["publisher"] = _join_if_some(data.pop("PB", None))
    c["extra_fields"] = dict(data)
    return c


def parse_pubmed(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse a .nbib payload into (citations, quarantine rows)."""
    if not text.strip():
        return [], []
    line_break = newline_delimiter_of(text)
    citations: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    byte_pos = 0
    ascii_text = text.isascii()
    for start_line, _start_char, chunk in blank_line_split(text, line_break):
        start_byte = byte_pos
        byte_pos += len(chunk) if ascii_text else len(chunk.encode("utf-8"))
        try:
            c = _chunk_to_citation(chunk, line_break, start_line, start_byte)
            if c is not None:
                citations.append(c)
        except ParseErr as e:
            errors.append(e.to_row())
    return citations, errors
