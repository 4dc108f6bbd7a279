"""Format sniffing + dispatch (S2). reference: src/lib.rs:380-469.

Order matters and is preserved exactly: ICTRP-XML first (so a WHO export
isn't claimed by the generic XML branch), then EndNote XML, RIS, PubMed, ENW,
Bib, ICTRP CSV. Generic CSV is never auto-detected (lib.rs:468).
Labels match CitationFormat::as_str (lib.rs:226-239).
"""

from __future__ import annotations

FMT_RIS = "RIS"
FMT_PUBMED = "PubMed"
FMT_ENDNOTE_XML = "EndNote XML"
FMT_ICTRP_XML = "ICTRP XML"
FMT_ENW = "EndNote Tagged"
FMT_BIB = "BibTeX / BibLaTeX"
FMT_CSV = "CSV"
FMT_ICTRP_CSV = "ICTRP CSV"
FMT_UNKNOWN = "Unknown"

_BIB_IDENT_OK = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-"
)


def looks_like_ictrp_xml(content: str) -> bool:
    """reference: src/ictrp/xml.rs:48-54."""
    trimmed = content.lstrip("﻿").lstrip()
    return (
        (trimmed.startswith("<?xml") or trimmed.startswith("<Trials_downloaded_from_ICTRP"))
        and "<Trials_downloaded_from_ICTRP" in content
        and "<Trial" in content
    )


def looks_like_enw(content: str) -> bool:
    """Any line starting ``%0 `` (or exactly ``%0``). reference: src/enw/parse.rs:192-194,305-308."""
    for line in content.split("\n"):
        t = line.strip()
        if t.startswith("%0 ") or t == "%0":
            return True
    return False


def looks_like_bib(content: str) -> bool:
    """``@ident{`` or ``@ident(``. reference: src/bib/parse.rs:60-79."""
    trimmed = content.lstrip()
    if not trimmed.startswith("@"):
        return False
    after_at = trimmed[1:]
    ident_len = 0
    for ch in after_at:
        if ch in _BIB_IDENT_OK:
            ident_len += 1
        else:
            break
    if ident_len == 0:
        return False
    remainder = after_at[ident_len:].lstrip()
    return remainder[:1] in ("{", "(")


def _csv_header_fields(first_line: str) -> list[str]:
    """Minimal RFC-4180-ish single-line header split (commas, double quotes)."""
    fields: list[str] = []
    cur: list[str] = []
    in_quotes = False
    i = 0
    while i < len(first_line):
        c = first_line[i]
        if in_quotes:
            if c == '"':
                if i + 1 < len(first_line) and first_line[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    in_quotes = False
            else:
                cur.append(c)
        elif c == '"':
            in_quotes = True
        elif c == ",":
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    fields.append("".join(cur))
    return fields


def looks_like_ictrp_csv(content: str) -> bool:
    """Header-set check. reference: src/ictrp/csv.rs:62-88."""
    first_line = content.split("\n", 1)[0].rstrip("\r")
    headers = [h.strip().lower() for h in _csv_header_fields(first_line)]
    has_trial_id = "trialid" in headers
    has_source_register = "source register" in headers
    has_title = "scientific title" in headers or "public title" in headers
    has_registration_date = (
        "date registration" in headers or "date registration3" in headers
    )
    return has_trial_id and has_source_register and has_title and has_registration_date


def detect_format(content: str) -> str:
    """reference: src/lib.rs:380-469 — order preserved exactly."""
    trimmed = content.strip()
    if not trimmed:
        return FMT_UNKNOWN
    if looks_like_ictrp_xml(content):
        return FMT_ICTRP_XML
    if trimmed.startswith("<?xml") or trimmed.startswith("<xml>"):
        return FMT_ENDNOTE_XML
    if trimmed.startswith("TY  -") or "\nTY  -" in trimmed:
        return FMT_RIS
    if trimmed.startswith("PMID-") or "\nPMID-" in trimmed:
        return FMT_PUBMED
    if looks_like_enw(content):
        return FMT_ENW
    if looks_like_bib(content):
        return FMT_BIB
    if looks_like_ictrp_csv(content):
        return FMT_ICTRP_CSV
    return FMT_UNKNOWN
