"""Text/value normalization kernels shared by all parsers.

Reference parity: src/utils.rs in revidiumhq/biblib (cited per function).
All functions are pure and total (never raise on odd input).
"""

from __future__ import annotations

import re

# reference: src/utils.rs:5-6
_DOI_URL_RE = re.compile(r"^https?://(?:dx\.)?doi\.org/(.+)$", re.DOTALL)
# reference: src/utils.rs:8-9
_ISSN_SPLIT_RE = re.compile(r"\d{4}-\d{3}[\dX](?:\s*\([^)]+\))?")


def _split_prefix_and_number(part: str) -> tuple[str, str | None]:
    """Split a page token into (prefix, digits-onward).

    reference: src/utils.rs:71-84 — prefix ends at the first ASCII digit;
    if no digit, the whole token is the prefix and the number is None.
    """
    for i, c in enumerate(part):
        if c.isascii() and c.isdigit():
            return part[:i], part[i:]
    return part, None


def format_page_numbers(page_range: str) -> str:
    """Complete partial end pages: ``1234-45`` -> ``1234-1245``.

    reference: src/utils.rs:16-68 (test table utils.rs:499-513).
    Rules: only simple two-part hyphen ranges are touched; alpha prefixes must
    match (or one side empty); a shorter end number borrows the leading digits
    of the start number; ``101-101`` collapses to ``101``.
    """
    if "-" not in page_range:
        return page_range
    parts = page_range.split("-")
    if len(parts) != 2:
        return page_range
    from_part, to_part = parts
    from_prefix, from_num = _split_prefix_and_number(from_part)
    to_prefix, to_num = _split_prefix_and_number(to_part)
    if from_prefix != to_prefix and from_prefix != "" and to_prefix != "":
        return page_range
    if to_num is None or from_num is None:
        return page_range
    if len(to_num) < len(from_num):
        completed_to = from_num[: len(from_num) - len(to_num)] + to_num
    else:
        completed_to = to_num
    if from_num == completed_to:
        return f"{from_prefix}{from_num}"
    return f"{from_prefix}{from_num}-{from_prefix}{completed_to}"


def format_doi(doi_str: str | None) -> str | None:
    """Normalize a DOI: strip URL prefixes / ``[doi]`` suffix, lowercase.

    reference: src/utils.rs:91-113 (test table utils.rs:516-557).
    Returns None when empty or when no ``10.`` marker is present.
    """
    if not doi_str:
        return None
    doi = doi_str.strip()
    while doi.endswith("[doi]"):  # trim_end_matches removes all occurrences
        doi = doi[: -len("[doi]")]
    doi = doi.strip()
    doi = "".join(c for c in doi if not c.isspace())
    doi = doi.lower()
    pos = doi.find("10.")
    if pos < 0:
        return None
    doi = doi[pos:]
    m = _DOI_URL_RE.match(doi)
    if m:
        return m.group(1)
    return doi


def split_issns(issns: str) -> list[str]:
    """Split a possibly multi-ISSN string into individual ISSN tokens.

    reference: src/utils.rs:120-142 (tests utils.rs:603-650). Literal escaped
    newlines (``\\r\\n``/``\\r``/``\\n`` as two characters) are unescaped
    first, then an ISSN regex is applied per line.
    """
    normalized = (
        issns.replace("\\r\\n", "\n").replace("\\r", "\n").replace("\\n", "\n")
    )
    result: list[str] = []
    for line in normalized.split("\n"):
        if not line.strip():
            continue
        result.extend(m.strip() for m in _ISSN_SPLIT_RE.findall(line))
    return result


def newline_delimiter_of(text: str) -> str:
    """CRLF vs LF sniff from the first newline. reference: src/utils.rs:480-492."""
    i = text.find("\n")
    if i > 0 and text[i - 1] == "\r":
        return "\r\n"
    return "\n"
