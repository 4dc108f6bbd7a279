"""Jaro / Jaro-Winkler similarity, parity with strsim 0.11.1.

The reference pins ``strsim = 0.11.1`` (Cargo.toml:30) and uses ``jaro`` /
``jaro_winkler`` at thresholds 0.85/0.93/0.99 (src/dedupe.rs:138-142,625-648).
strsim 0.11.1 semantics (verified against strsim's published README values,
e.g. jaro_winkler("cheeseburger", "cheese fries") ≈ 0.911):

- jaro: textbook match window ``max(len)/2 - 1`` (saturating at 0), greedy
  leftmost matching, transpositions = (# mismatched matched positions) // 2.
- jaro_winkler: ``j + 0.1 * prefix * (1 - j)`` with an UNCAPPED common prefix
  (strsim removed the classic 4-char cap) and no 0.7 boost threshold; the
  result is clamped to 1.0.

Operates on Python strings (sequences of unicode scalar values, same unit as
Rust ``char``). A numpy-vectorized batch driver is provided for pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    search_range = max(la, lb) // 2
    search_range = search_range - 1 if search_range > 0 else 0

    b_flags = [False] * lb
    a_matches: list[str] = []
    matched_b_positions: list[int] = []
    for i, ca in enumerate(a):
        lo = i - search_range if i > search_range else 0
        hi = min(lb, i + search_range + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                b_flags[j] = True
                a_matches.append(ca)
                matched_b_positions.append(j)
                break
    m = len(a_matches)
    if m == 0:
        return 0.0
    b_matches = [b[j] for j in sorted(matched_b_positions)]
    mismatches = sum(1 for x, y in zip(a_matches, b_matches) if x != y)
    t = mismatches // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    sim = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        prefix += 1
    return min(sim + 0.1 * prefix * (1.0 - sim), 1.0)


def jaro_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch jaro over two string Series (None treated as "")."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = jaro(av[i], bv[i])
    return pd.Series(out)


def jaro_winkler_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch jaro_winkler over two string Series (None treated as "")."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = jaro_winkler(av[i], bv[i])
    return pd.Series(out)
