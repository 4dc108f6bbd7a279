"""Date grammar kernels — all produce ``(year, month, day)`` tuples or None.

Reference parity: src/utils.rs:190-477 in revidiumhq/biblib. ``Date`` there is
``year:i32`` (required) + optional month/day u8; we model it as a tuple
``(year:int, month:int|None, day:int|None)``.
"""

from __future__ import annotations

import re

_I32_RE = re.compile(r"^[+-]?[0-9]+$")
_U8_RE = re.compile(r"^\+?[0-9]+$")

I32_MIN, I32_MAX = -(2**31), 2**31 - 1

Date = tuple[int, "int | None", "int | None"]

# reference: src/utils.rs:399-415
_MONTH_NAMES = {
    "jan": 1, "january": 1,
    "feb": 2, "february": 2,
    "mar": 3, "march": 3,
    "apr": 4, "april": 4,
    "may": 5,
    "jun": 6, "june": 6,
    "jul": 7, "july": 7,
    "aug": 8, "august": 8,
    "sep": 9, "september": 9,
    "oct": 10, "october": 10,
    "nov": 11, "november": 11,
    "dec": 12, "december": 12,
}


def _parse_i32(s: str) -> int | None:
    """Strict Rust-style ``str::parse::<i32>`` — no whitespace, bounds-checked."""
    if not _I32_RE.match(s):
        return None
    v = int(s)
    if v < I32_MIN or v > I32_MAX:
        return None
    return v


def _parse_u8(s: str) -> int | None:
    """Strict Rust-style ``str::parse::<u8>`` — no sign '-', 0..=255."""
    if not _U8_RE.match(s):
        return None
    v = int(s)
    if v > 255:
        return None
    return v


def parse_month_name(month_str: str) -> int | None:
    """reference: src/utils.rs:399-415."""
    return _MONTH_NAMES.get(month_str.lower())


def parse_pubmed_date(date_str: str) -> Date | None:
    """``2020 Jun 9`` / ``2023 May`` / ``2023``. reference: src/utils.rs:195-229."""
    date_str = date_str.strip()
    if not date_str:
        return None
    parts = date_str.split()
    year = _parse_i32(parts[0])
    if year is None:
        return None
    month = parse_month_name(parts[1]) if len(parts) > 1 else None
    day = None
    if len(parts) > 2:
        d = _parse_u8(parts[2])
        if d is not None and 1 <= d <= 31:
            day = d
    return (year, month, day)


def parse_ris_date(date_str: str) -> Date | None:
    """``YYYY/MM/DD/extra``. reference: src/utils.rs:236-279."""
    date_str = date_str.strip()
    if not date_str:
        return None
    parts = date_str.split("/")
    if not parts[0]:
        return None
    year = _parse_i32(parts[0])
    if year is None:
        return None
    month = None
    day = None
    if len(parts) > 1 and parts[1]:
        m = _parse_u8(parts[1])
        if m is not None and 1 <= m <= 12:
            month = m
    if len(parts) > 2 and parts[2]:
        d = _parse_u8(parts[2])
        if d is not None and 1 <= d <= 31:
            day = d
    return (year, month, day)


def parse_endnote_date(
    year: int | None, month: int | None, day: int | None
) -> Date | None:
    """reference: src/utils.rs:288-291 — year required, month/day passthrough."""
    if year is None:
        return None
    return (year, month, day)


def parse_year_only(year_str: str) -> Date | None:
    """``2023`` / ``2023/``. reference: src/utils.rs:379-396."""
    year_str = year_str.strip()
    if not year_str:
        return None
    year_part = year_str.split("/")[0]
    year = _parse_i32(year_part)
    if year is None:
        return None
    return (year, None, None)


def _parse_iso_like_date(date_str: str) -> Date | None:
    """``YYYY-MM-DD`` (all three parts required). reference: src/utils.rs:425-455."""
    normalized = date_str.strip()
    if "-" not in normalized:
        return None
    parts = normalized.split("-")
    if len(parts) < 3:
        return None
    year = _parse_i32(parts[0])
    if year is None:
        return None
    month = _parse_u8(parts[1])
    if month is None or not (1 <= month <= 12):
        return None
    day = _parse_u8(parts[2])
    if day is None or not (1 <= day <= 31):
        return None
    return (year, month, day)


def _parse_month_day_year_date(date_str: str) -> Date | None:
    """``Mon DD, YYYY``. reference: src/utils.rs:457-477."""
    parts = date_str.replace(",", " ").split()
    if len(parts) < 3:
        return None
    month = parse_month_name(parts[0])
    if month is None:
        return None
    day = _parse_u8(parts[1])
    if day is None or not (1 <= day <= 31):
        return None
    year = _parse_i32(parts[2])
    if year is None:
        return None
    return (year, month, day)


def parse_enw_date(date_str: str) -> Date | None:
    """ENW multi-grammar chain. reference: src/utils.rs:301-312."""
    date_str = date_str.strip()
    if not date_str:
        return None
    return (
        parse_ris_date(date_str)
        or _parse_iso_like_date(date_str)
        or parse_pubmed_date(date_str)
        or _parse_month_day_year_date(date_str)
        or parse_year_only(date_str)
    )


def _parse_bib_month_token(month_str: str) -> int | None:
    """Numeric 1..=12 or month name. reference: src/utils.rs:417-423."""
    m = _parse_u8(month_str)
    if m is not None:
        return m if 1 <= m <= 12 else None
    return parse_month_name(month_str)


def parse_bib_date(date_str: str) -> Date | None:
    """Bib ``date`` field: y / y-m / y-m-d with ``-`` or ``/``.

    reference: src/utils.rs:322-360. Subtleties preserved: a delimiter with no
    parseable month fails the WHOLE parse (returns None); a present-but-invalid
    day also fails if unparseable, but an out-of-range parsed day just nulls
    the day.
    """
    trimmed = date_str.strip()
    if not trimmed:
        return None
    if "-" in trimmed:
        delimiter = "-"
    elif "/" in trimmed:
        delimiter = "/"
    else:
        return parse_year_only(trimmed)
    parts = trimmed.split(delimiter)
    if not parts:
        return None
    year = _parse_i32(parts[0].strip())
    if year is None:
        return None
    if len(parts) < 2:  # parts.get(1)? — absent second part → None
        return None
    month = _parse_bib_month_token(parts[1].strip())
    if month is None:
        return None
    day = None
    if len(parts) > 2:
        d = _parse_u8(parts[2].strip())
        if d is None:  # unparseable day fails the whole parse (the `?`)
            return None
        day = d if 1 <= d <= 31 else None
    return (year, month, day)


def parse_bib_year_month(year_str: str, month_str: str) -> Date | None:
    """reference: src/utils.rs:363-372."""
    y = parse_year_only(year_str)
    if y is None:
        return None
    month = _parse_bib_month_token(month_str.strip())
    if month is None:
        return None
    return (y[0], month, None)
