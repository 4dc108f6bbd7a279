"""Top-k with rank, without a global window.

A global ``row_number() OVER (ORDER BY ...)`` moves the ENTIRE input to one
partition (Spark's WindowExec warns exactly this). The scalable shape is:

1. ``orderBy(...).limit(k)`` — Catalyst plans TakeOrderedAndProject, a fully
   parallel per-partition top-k followed by a k-row merge on the driver-side
   exchange; no full shuffle, no single fat partition.
2. rank the k-row result with a broadcast non-equi self-join (rank = 1 +
   number of rows strictly ahead in the total order). k is a small constant,
   so the k x k join is trivial at any input scale.

The order must be total (include a unique tiebreak column) so ranks are
deterministic and dense.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: order spec: list of (column_name, "asc" | "desc")
OrderSpec = list[tuple[str, str]]


def _sort_exprs(order: OrderSpec) -> list[Column]:
    return [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order
    ]


def _strictly_before(order: OrderSpec, rprefix: str) -> Column:
    """Lexicographic 'right row sorts strictly before left row'."""
    cond = F.lit(False)
    eq_so_far = F.lit(True)
    for c, d in order:
        left, right = F.col(c), F.col(f"{rprefix}{c}")
        strict = (right > left) if d == "desc" else (right < left)
        cond = cond | (eq_so_far & strict)
        eq_so_far = eq_so_far & right.eqNullSafe(left)
    return cond


def topk_ranked(
    df: DataFrame, order: OrderSpec, k: int, rank_name: str = "rnk"
) -> DataFrame:
    """Top-k rows of ``df`` under ``order`` with a dense 1-based rank column.

    Equivalent to ``row_number() OVER (ORDER BY ...) <= k`` when the order is
    total, but scales: the input is reduced to k rows in parallel before any
    single-node work.
    """
    top = df.orderBy(*_sort_exprs(order)).limit(k)
    rp = "__r_"
    right = top.select(
        F.lit(1).alias(f"{rp}one"),
        *[F.col(c).alias(f"{rp}{c}") for c, _ in order],
    )
    joined = top.join(F.broadcast(right), _strictly_before(order, rp), "left")
    return (
        joined.groupBy(*[F.col(c) for c in top.columns])
        .agg((F.count(f"{rp}one") + F.lit(1)).alias(rank_name))
    )
