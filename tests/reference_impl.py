"""Test-only oracle: faithful port of the reference Deduplicator semantics.

Mirrors /root/reference/src/dedupe.rs find_duplicates_with_sources exactly:
year blocking (403-500), preprocess (566-590), greedy star grouping
(592-655), pair predicate (608-648), representative election (507-555).
Used by tests to compute expected cluster assignments / dup pairs on
synthetic corpora; the Spark pipeline is asserted against it (dup-pair
recall >= 0.99 per BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from biblib_spark.kernels.norm import (
    format_issn,
    format_journal_name,
    normalize_title,
    normalize_volume,
)
from biblib_spark.kernels.similarity import jaro, jaro_winkler

DOI_T = 0.85
NO_DOI_T = 0.93


@dataclass
class RefConfig:
    group_by_year: bool = True
    source_preferences: list[str] = field(default_factory=list)


def _preprocess(c: dict[str, Any]) -> dict[str, Any]:
    return {
        "nt": normalize_title(c.get("title") or "") or "",
        "nj": format_journal_name(c.get("journal")),
        "na": format_journal_name(c.get("journal_abbr")),
        "nv": normalize_volume(c.get("volume")) if c.get("volume") is not None else "",
        "ni": [
            f
            for f in (format_issn(v) for v in (c.get("issn") or []))
            if f is not None
        ],
    }


def _journals_match(p1: dict, p2: dict) -> bool:
    def eq(x, y):
        return x is not None and y is not None and x == y

    return (
        eq(p1["nj"], p2["nj"])
        or eq(p1["na"], p2["na"])
        or eq(p1["nj"], p2["na"])
        or eq(p1["na"], p2["nj"])
    )


def _is_duplicate(c1: dict, p1: dict, c2: dict, p2: dict) -> bool:
    jm = _journals_match(p1, p2)
    im = any(x == y for x in p1["ni"] for y in p2["ni"])
    vm = p1["nv"] != "" and p2["nv"] != "" and p1["nv"] == p2["nv"]
    pm = (
        c1.get("pages") is not None
        and c2.get("pages") is not None
        and c1["pages"] == c2["pages"]
    )
    ym = c1.get("year") == c2.get("year")  # None == None is True

    d1, d2 = c1.get("doi"), c2.get("doi")
    if d1 and d2:  # both non-empty
        sim = jaro(p1["nt"], p2["nt"])
        return (
            (d1 == d2 and sim >= DOI_T and (jm or im))
            or (d1 == d2 and sim >= 0.99 and (vm or pm))
            or (sim >= 0.99 and ym and (vm or pm) and (jm or im))
        )
    sim = jaro_winkler(p1["nt"], p2["nt"])
    return (sim >= NO_DOI_T and (vm or pm) and (jm or im)) or (
        sim >= 0.99 and ym and vm and pm
    )


def _select_unique(group: list[int], citations: list[dict], cfg: RefConfig) -> int:
    """dedupe.rs:507-555; returns the chosen original index."""
    if len(group) == 1:
        return group[0]
    if cfg.source_preferences:
        for pref in cfg.source_preferences:
            for idx in group:
                if citations[idx].get("source") == pref:
                    return idx
    with_abs = [i for i in group if citations[i].get("abstract_text") is not None]
    if len(with_abs) == 0:
        return group[0]
    if len(with_abs) == 1:
        return with_abs[0]
    for i in with_abs:
        if citations[i].get("doi"):
            return i
    return with_abs[0]


def reference_find_duplicates(
    citations: list[dict[str, Any]], cfg: RefConfig | None = None
) -> list[tuple[int, list[int]]]:
    """Returns [(unique_idx, [member indices in group order]), ...]."""
    cfg = cfg or RefConfig()
    if not citations:
        return []

    if cfg.group_by_year:
        year_groups: dict[Any, list[int]] = {}
        for idx, c in enumerate(citations):
            year_groups.setdefault(
                c.get("year") if c.get("year") is not None else 0, []
            ).append(idx)
        blocks = list(year_groups.values())
    else:
        blocks = [list(range(len(citations)))]

    groups: list[tuple[int, list[int]]] = []
    for block in blocks:
        pre = {i: _preprocess(citations[i]) for i in block}
        processed: set[int] = set()
        for pos, i in enumerate(block):
            if i in processed:
                continue
            members = [i]
            for j in block:
                if j == i or j in processed:
                    continue
                if _is_duplicate(citations[i], pre[i], citations[j], pre[j]):
                    members.append(j)
                    processed.add(j)
            if len(members) > 1:
                processed.add(i)
            unique = _select_unique(members, citations, cfg)
            groups.append((unique, members))
    return groups


def pairs_from_groups(groups: list[tuple[int, list[int]]]) -> set[tuple[int, int]]:
    out: set[tuple[int, int]] = set()
    for _, members in groups:
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                out.add((min(a, b), max(a, b)))
    return out
