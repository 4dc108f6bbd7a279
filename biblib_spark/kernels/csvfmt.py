"""CSV parser kernel (generic CSV + ICTRP CSV).

Reference parity: src/csv/{config.rs,parse.rs,structure.rs} and
src/ictrp/{csv.rs,common.rs} in revidiumhq/biblib.

A minimal RFC-4180 reader (quotes, embedded newlines, CRLF) is implemented
here so byte offsets and line numbers match the reference's error reporting.
Generic CSV is never auto-detected (lib.rs:468); ICTRP CSV is detected by its
header set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .authors import parse_author_name, split_given_and_middle
from .citation import ParseErr, author, date_from_tuple, empty_citation
from .dates import parse_year_only
from .text import format_doi, format_page_numbers, split_issns

FORMAT_LABEL = "CSV"
ICTRP_FORMAT_LABEL = "ICTRP CSV"

# reference: src/csv/config.rs:9-33
DEFAULT_HEADERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("title", ("title", "article title", "publication title")),
    ("authors", ("author", "authors", "creator", "creators")),
    ("journal", ("journal", "journal title", "source title", "publication")),
    ("year", ("year", "publication year", "pub year")),
    ("volume", ("volume", "vol")),
    ("issue", ("issue", "number", "no")),
    ("pages", ("pages", "page numbers", "page range")),
    ("doi", ("doi", "digital object identifier")),
    ("accession_number", ("accession number", "accession_number")),
    ("abstract", ("abstract", "summary")),
    ("keywords", ("keywords", "tags")),
    ("issn", ("issn",)),
    ("language", ("language", "lang")),
    ("publisher", ("publisher",)),
    ("url", ("url", "link", "web link")),
    ("label", ("label",)),
    ("duplicate_id", ("duplicateid", "duplicate_id")),
)

# reference: src/csv/structure.rs:238-258
STANDARD_FIELDS = frozenset(
    """title authors journal journal_abbr year volume issue pages doi
    accession_number pmid pmc_id abstract keywords issn language publisher
    type url""".split()
)


@dataclass
class CsvConfig:
    """reference: src/csv/config.rs:57-230."""

    header_map: dict[str, list[str]] = field(default_factory=dict)
    delimiter: str = ","
    has_header: bool = True
    quote: str = '"'
    trim: bool = True
    flexible: bool = False

    def __post_init__(self) -> None:
        if not self.header_map:
            self.header_map = {f: list(a) for f, a in DEFAULT_HEADERS}
        self._rebuild()

    def _rebuild(self) -> None:
        self.reverse_map = {
            alias.lower(): f for f, aliases in self.header_map.items() for alias in aliases
        }

    def set_header_mapping(self, fieldname: str, aliases: list[str]) -> "CsvConfig":
        self.header_map[fieldname] = aliases
        self._rebuild()
        return self

    def field_for_header(self, header: str) -> str | None:
        return self.reverse_map.get(header.lower())


def read_csv_records(
    text: str, delimiter: str = ",", quote: str = '"'
) -> list[tuple[list[str], int, int]]:
    """RFC-4180-ish records: (fields, start_byte, start_line). Handles quoted
    fields with embedded delimiters/newlines and doubled quotes; CRLF/LF."""
    records: list[tuple[list[str], int, int]] = []
    fields: list[str] = []
    cur: list[str] = []
    in_quotes = False
    field_started = False
    rec_byte = 0
    rec_line = 1
    byte_pos = 0
    line = 1
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        clen = len(c.encode("utf-8"))
        if in_quotes:
            if c == quote:
                if i + 1 < n and text[i + 1] == quote:
                    cur.append(quote)
                    i += 1
                    byte_pos += clen + 1
                else:
                    in_quotes = False
                    byte_pos += clen
            else:
                if c == "\n":
                    line += 1
                cur.append(c)
                byte_pos += clen
            i += 1
            continue
        if c == quote and not cur:
            in_quotes = True
            field_started = True
        elif c == delimiter:
            fields.append("".join(cur))
            cur = []
            field_started = True
        elif c == "\n" or (c == "\r" and i + 1 < n and text[i + 1] == "\n"):
            crlf = c == "\r"
            fields.append("".join(cur))
            cur = []
            if any(f != "" for f in fields) or len(fields) > 1 or field_started:
                records.append((fields, rec_byte, rec_line))
            fields = []
            field_started = False
            if crlf:
                i += 1
                byte_pos += 1
            line += 1
            rec_line = line
            rec_byte = byte_pos + clen
        else:
            cur.append(c)
            field_started = True
        byte_pos += clen
        i += 1
    if cur or fields or field_started:
        fields.append("".join(cur))
        if any(f != "" for f in fields) or len(fields) > 1:
            records.append((fields, rec_byte, rec_line))
    return records


@dataclass
class RawCsv:
    """reference: src/csv/structure.rs:13-31."""

    fields: dict[str, str] = field(default_factory=dict)
    authors: list[dict[str, Any]] = field(default_factory=list)
    keywords: list[str] = field(default_factory=list)
    urls: list[str] = field(default_factory=list)
    issn: list[str] = field(default_factory=list)
    line_number: int = 0
    byte_offset: int = 0

    def has_content(self) -> bool:
        return bool(self.fields) or bool(self.authors)


def _split_authors(value: str) -> list[dict[str, Any]]:
    out = []
    for s in value.split(";"):
        s = s.strip()
        if not s:
            continue
        family, given = parse_author_name(s)
        if given == "":
            out.append(author(family))
        else:
            g, m = split_given_and_middle(given)
            out.append(author(family, g, m))
    return out


def _from_record(
    headers: list[str],
    record: list[str],
    config: CsvConfig,
    line_number: int,
    byte_offset: int,
    fmt: str,
) -> RawCsv:
    """reference: src/csv/structure.rs:35-135."""
    raw = RawCsv(line_number=line_number, byte_offset=byte_offset)
    for i, value in enumerate(record):
        if i >= len(headers):
            if not config.flexible:
                raise ParseErr(
                    fmt=fmt, kind="syntax",
                    msg=f"Record has more fields ({len(record)}) than headers"
                        f" ({len(headers)})",
                    line=line_number,
                )
            break
        header = headers[i]
        v = value.strip() if config.trim else value
        if not v:
            continue
        fieldname = config.field_for_header(header)
        if fieldname == "authors":
            raw.authors.extend(_split_authors(v))
        elif fieldname == "keywords":
            raw.keywords.extend(
                s.strip() for s in v.split(";") if s.strip()
            )
        elif fieldname == "url":
            raw.urls.append(v)
        elif fieldname == "issn":
            raw.issn.extend(split_issns(v))
        elif fieldname is not None:
            raw.fields[fieldname] = v
        else:
            raw.fields[header] = v
    return raw


def csv_parse_raw(text: str, config: CsvConfig, fmt: str = FORMAT_LABEL) -> list[RawCsv]:
    """reference: src/csv/parse.rs:12-132. Raises ParseErr (payload fail-fast
    like the reference reader errors)."""
    if not text.strip():
        return []
    records = read_csv_records(text, config.delimiter, config.quote)
    if not records:
        return []
    if config.has_header:
        header_fields, _, _ = records[0]
        headers = [h.strip() if config.trim else h for h in header_fields]
        data_records = records[1:]
        line_number = 2
    else:
        headers = [f"Column{i + 1}" for i in range(len(records[0][0]))]
        data_records = records
        line_number = 1
    if not headers:
        raise ParseErr(fmt=fmt, kind="syntax", msg="No headers found in CSV")

    raws: list[RawCsv] = []
    for fields_, start_byte, start_line in data_records:
        if not config.flexible and len(fields_) != len(headers):
            raise ParseErr(
                fmt=fmt, kind="syntax",
                msg=(
                    f"CSV parsing error: record has {len(fields_)} fields but"
                    f" headers have {len(headers)}"
                ),
                line=start_line,
            )
        raw = _from_record(headers, fields_, config, line_number, start_byte, fmt)
        if raw.has_content():
            raws.append(raw)
        elif not config.flexible:
            raise ParseErr(
                fmt=fmt, kind="syntax",
                msg="Record contains no meaningful content",
                line=line_number,
            )
        line_number += 1
    return raws


def _raw_to_citation(raw: RawCsv, config: CsvConfig) -> dict[str, Any]:
    """Generic CSV shaping. reference: src/csv/structure.rs:138-209."""
    title = raw.fields.get("title")
    if title is None:
        raise ParseErr(
            fmt=FORMAT_LABEL, kind="missing_value",
            msg="Missing required field title (key title)",
            line=raw.line_number,
            span=(raw.byte_offset, raw.byte_offset),
        )
    c = empty_citation()
    c["title"] = title
    c["journal"] = raw.fields.get("journal")
    c["journal_abbr"] = raw.fields.get("journal_abbr")
    year = raw.fields.get("year")
    c["date"] = date_from_tuple(parse_year_only(year)) if year is not None else None
    c["volume"] = raw.fields.get("volume")
    c["issue"] = raw.fields.get("issue")
    pages = raw.fields.get("pages")
    c["pages"] = format_page_numbers(pages) if pages is not None else None
    doi = raw.fields.get("doi")
    c["doi"] = format_doi(doi) if doi is not None else None
    c["abstract_text"] = raw.fields.get("abstract")
    c["language"] = raw.fields.get("language")
    c["publisher"] = raw.fields.get("publisher")
    t = raw.fields.get("type")
    c["citation_type"] = [t] if t is not None else ["Journal Article"]
    c["accession_number"] = raw.fields.get("accession_number")
    c["pmid"] = raw.fields.get("pmid")
    c["pmc_id"] = raw.fields.get("pmc_id")
    c["authors"] = raw.authors
    c["keywords"] = raw.keywords
    c["urls"] = raw.urls
    c["issn"] = raw.issn
    extra: dict[str, list[str]] = {}
    for name, value in raw.fields.items():
        if config.field_for_header(name) not in STANDARD_FIELDS:
            extra[name] = [value]
    c["extra_fields"] = extra
    return c


def parse_csv(
    text: str, config: CsvConfig | None = None
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse a generic CSV payload into (citations, quarantine rows)."""
    config = config or CsvConfig()
    citations: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    try:
        raws = csv_parse_raw(text, config, FORMAT_LABEL)
    except ParseErr as e:
        return [], [e.to_row()]
    for raw in raws:
        try:
            citations.append(_raw_to_citation(raw, config))
        except ParseErr as e:
            errors.append(e.to_row())
    return citations, errors


# ---------------------------------------------------------------------------
# ICTRP CSV (deprecated ingest path in the reference; detection kept)
# ---------------------------------------------------------------------------


def _ictrp_config() -> CsvConfig:
    """reference: src/ictrp/csv.rs:24-46."""
    cfg = CsvConfig(flexible=True)
    cfg.set_header_mapping("accession_number", ["TrialID"])
    cfg.set_header_mapping("scientific_title", ["Scientific title"])
    cfg.set_header_mapping("date_registration", ["Date registration"])
    cfg.set_header_mapping("date_registration_compact", ["Date registration3"])
    cfg.set_header_mapping("publisher", ["Primary sponsor"])
    cfg.set_header_mapping("type", ["Study type"])
    cfg.set_header_mapping(
        "url", ["web address", "results url link", "results url protocol"]
    )
    return cfg


def dedupe_urls(urls: list[str]) -> list[str]:
    """Order-preserving, blank-dropping. reference: src/ictrp/common.rs:16-24."""
    out: list[str] = []
    for u in urls:
        if u.strip() and u not in out:
            out.append(u)
    return out


def _parse_int(s: str) -> int | None:
    try:
        if s and (s[0] == "+" or s[0] == "-" or s.isascii()) and s.lstrip("+-").isdigit():
            return int(s)
    except ValueError:
        pass
    return None


def parse_ictrp_compact_date(value: str) -> tuple[int, int | None, int | None] | None:
    """``YYYYMMDD``. reference: src/ictrp/common.rs:26-41."""
    t = value.strip()
    if len(t) != 8:
        return None
    y, m, d = _parse_int(t[0:4]), _parse_int(t[4:6]), _parse_int(t[6:8])
    if y is None or m is None or d is None:
        return None
    if not (0 <= m <= 255 and 0 <= d <= 255):
        return None
    return (y, m, d)


def parse_ictrp_standard_date(value: str) -> tuple[int, int | None, int | None] | None:
    """``DD/MM/YYYY`` / ``YYYY/MM/DD`` / ``YYYY-MM-DD``. reference: common.rs:43-87."""
    parts = [p.strip() for p in value.strip().split("/")]
    if len(parts) == 3:
        if len(parts[0]) == 4:
            y, m, d = _parse_int(parts[0]), _parse_int(parts[1]), _parse_int(parts[2])
        else:
            y, m, d = _parse_int(parts[2]), _parse_int(parts[1]), _parse_int(parts[0])
        if y is not None and m is not None and d is not None:
            return (y, m, d)
    parts = [p.strip() for p in value.strip().split("-")]
    if len(parts) == 3 and len(parts[0]) == 4:
        y, m, d = _parse_int(parts[0]), _parse_int(parts[1]), _parse_int(parts[2])
        if y is not None and m is not None and d is not None:
            return (y, m, d)
    return None


def _raw_to_ictrp_citation(raw: RawCsv) -> dict[str, Any]:
    """reference: src/ictrp/csv.rs:90-183."""
    accession = raw.fields.pop("accession_number", None)
    if accession is None or not accession.strip():
        raise ParseErr(
            fmt=ICTRP_FORMAT_LABEL, kind="missing_value",
            msg="Missing required field accession_number (key TrialID)",
            line=raw.line_number,
            span=(raw.byte_offset, raw.byte_offset),
        )
    scientific = raw.fields.pop("scientific_title", None)
    if scientific is not None and not scientific.strip():
        scientific = None
    public = raw.fields.get("Public title")
    title = scientific or (public if public and public.strip() else None)
    if title is None:
        raise ParseErr(
            fmt=ICTRP_FORMAT_LABEL, kind="missing_value",
            msg="Missing required field title (key Scientific title/Public title)",
            line=raw.line_number,
            span=(raw.byte_offset, raw.byte_offset),
        )
    # compact preferred; the consumed source leaves extra_fields either way
    date = None
    compact = raw.fields.pop("date_registration_compact", None)
    if compact is not None:
        date = parse_ictrp_compact_date(compact)
    if date is None:
        standard = raw.fields.pop("date_registration", None)
        if standard is not None:
            date = parse_ictrp_standard_date(standard)

    publisher = raw.fields.pop("publisher", None)
    citation_type = ["Clinical Trial"]
    study_type = raw.fields.pop("type", None)
    if study_type is not None and study_type.strip() and study_type != "Clinical Trial":
        citation_type.append(study_type)

    c = empty_citation()
    c["citation_type"] = citation_type
    c["title"] = title
    c["date"] = date_from_tuple(date)
    c["accession_number"] = accession
    c["publisher"] = publisher
    c["urls"] = dedupe_urls(raw.urls)
    c["extra_fields"] = {
        k: [v] for k, v in raw.fields.items() if v.strip()
    }
    return c


def parse_ictrp_csv(text: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse an ICTRP CSV payload into (citations, quarantine rows)."""
    citations: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    try:
        raws = csv_parse_raw(text, _ictrp_config(), ICTRP_FORMAT_LABEL)
    except ParseErr as e:
        return [], [e.to_row()]
    for raw in raws:
        try:
            citations.append(_raw_to_ictrp_citation(raw))
        except ParseErr as e:
            errors.append(e.to_row())
    return citations, errors
