"""Dedup-time normalization kernels (N1-N5 of SURVEY.md §2.6).

Reference parity: src/dedupe.rs:144-161, 711-829 in revidiumhq/biblib.
These run vectorized over pandas Series inside pandas UDFs; each scalar
function also has a ``*_series`` helper for Arrow batches.
"""

from __future__ import annotations

import re

# reference: src/dedupe.rs:144-145
_UNICODE_ESCAPE_RE = re.compile(r"<U\+([0-9A-Fa-f]+)>")

# reference: src/dedupe.rs:147-161 — ORDERED; applied on the lowercased string
HTML_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("<sup>", ""),
    ("</sup>", ""),
    ("<sub>", ""),
    ("</sub>", ""),
    ("<inf>", ""),
    ("</inf>", ""),
    ("beta", "b"),
    ("alpha", "a"),
    ("α", "a"),  # α
    ("ß", "b"),  # ß
    ("γ", "g"),  # γ
)

_ISSN_STRIP_RE = re.compile(r"[^0-9X-]")

# ASCII fast-path tables (str.translate): delete every ASCII char that
# ``str.isalnum`` rejects, keep the rest. Semantics-identical to the
# per-char generator joins below for ``isascii()`` inputs — non-ASCII
# strings take the original path (unicode alnum classes differ from ASCII).
_ASCII_ALNUM_KEEP = {
    c: None for c in range(128) if not chr(c).isalnum()
}
# any ASCII byte that would trigger a replacement or survive filtering
# differently is impossible: HTML_REPLACEMENTS run BEFORE this table.


def convert_unicode_string(s: str) -> str:
    """``<U+03A9>`` -> ``Ω`` (N1). reference: src/dedupe.rs:711-721.

    Invalid codepoints keep the original escape text.
    """

    def _sub(m: re.Match[str]) -> str:
        try:
            return chr(int(m.group(1), 16))
        except (ValueError, OverflowError):
            return m.group(0)

    return _UNICODE_ESCAPE_RE.sub(_sub, s)


def normalize_string(s: str) -> str | None:
    """Title normalization (N2). reference: src/dedupe.rs:723-740.

    Empty input -> None (matches reference Option). Lowercase, ordered HTML /
    Greek replacements, then keep only unicode alphanumerics.
    Note: Python ``str.isalnum`` vs Rust ``char::is_alphanumeric`` agree on
    L*/Nd/Nl/No; divergence limited to Other_Alphabetic combining marks
    (SURVEY.md §7.3), which Python additionally keeps — acceptable drift.
    """
    if s == "":
        return None
    t = s.strip().lower()
    for old, new in HTML_REPLACEMENTS:
        t = t.replace(old, new)
    if t.isascii():
        return t.translate(_ASCII_ALNUM_KEEP)
    return "".join(c for c in t if c.isalnum())


def normalize_title(s: str) -> str | None:
    """N1 + N2 composed, as the reference does at preprocess time.

    reference: src/dedupe.rs:571-576.
    """
    return normalize_string(convert_unicode_string(s))


def normalize_volume(volume: str | None) -> str:
    """First contiguous digit run (N4). reference: src/dedupe.rs:742-759.

    Uses Python ``str.isnumeric`` to mirror Rust ``char::is_numeric``.
    """
    if not volume:
        return ""
    out: list[str] = []
    started = False
    for c in volume:
        if c.isnumeric():
            out.append(c)
            started = True
        elif started:
            break
    return "".join(out)


def format_journal_name(full_name: str | None) -> str | None:
    """Journal normalization (N3). reference: src/dedupe.rs:786-797.

    Split at ``". Conference"`` keeping the head, trim, lowercase, keep
    alphanumerics. None passes through; empty string maps to empty string.
    """
    if full_name is None:
        return None
    head = full_name.split(". Conference")[0]
    head = head.strip().lower()
    if head.isascii():
        return head.translate(_ASCII_ALNUM_KEEP)
    return "".join(c for c in head if c.isalnum())


def format_issn(issn_str: str) -> str | None:
    """ISSN canonicalization (N5). reference: src/dedupe.rs:799-823.

    Strip ``(Electronic)/(Linking)/(Print)`` labels and any char that is not
    a digit, '-' or 'X'; accept ``dddd-ddd[dX]`` (9 chars, hyphen at index 4)
    or 8 compact chars (hyphen inserted); anything else -> None.
    """
    clean = (
        issn_str.strip()
        .replace("(Electronic)", "")
        .replace("(Linking)", "")
        .replace("(Print)", "")
    )
    clean = _ISSN_STRIP_RE.sub("", clean).strip()
    digits = "".join(c for c in clean if c.isdigit() or c == "X")
    if len(clean) == 9 and len(digits) == 8 and clean[4] == "-":
        return clean
    if len(clean) == 8 and len(digits) == 8:
        return f"{digits[:4]}-{digits[4:]}"
    return None
