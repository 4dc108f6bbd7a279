"""Author-name kernels. reference: src/utils.rs:145-188."""

from __future__ import annotations


def parse_author_name(name: str) -> tuple[str, str]:
    """Split ``"Last, First"`` / ``"Last First"`` into (family, given).

    reference: src/utils.rs:145-167 (tests utils.rs:560-600). With a comma the
    raw comma-split parts are used (inner whitespace preserved after trim);
    without, whitespace-split. 3+ parts: family = first, given = rest joined.
    """
    if "," in name:
        parts = name.split(",")
    else:
        parts = name.split()
    if len(parts) == 0:
        return "", ""
    if len(parts) == 1:
        return parts[0].strip(), ""
    if len(parts) == 2:
        return parts[0].strip(), parts[1].strip()
    family = parts[0].strip()
    given = " ".join(parts[1:]).strip()
    return family, given


def split_given_and_middle(full_given: str) -> tuple[str | None, str | None]:
    """First token -> given, remaining tokens joined -> middle.

    reference: src/utils.rs:174-188.
    """
    trimmed = full_given.strip()
    if not trimmed:
        return None, None
    parts = trimmed.split()
    first = parts[0]
    middle = " ".join(parts[1:]) if len(parts) > 1 else None
    return first, middle
