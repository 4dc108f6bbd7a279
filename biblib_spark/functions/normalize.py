"""Arrow-vectorized normalization UDFs (N1-N5) for the preprocess stage.

These mirror the reference's preprocess-once design (src/dedupe.rs:566-590):
normalized columns are materialized ONCE before any join and never recomputed
inside pair evaluation (Catalyst will not reliably hoist a UDF out of a join
predicate — SURVEY.md §4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from biblib_spark.kernels.norm import (
    format_issn,
    format_journal_name,
    normalize_title,
    normalize_volume,
)


@pandas_udf(StringType())
def norm_title_udf(s: pd.Series) -> pd.Series:
    """N1+N2: unicode-escape decode + title normalization; null/empty -> ''."""
    return s.map(lambda x: (normalize_title(x) or "") if isinstance(x, str) else "")


@pandas_udf(StringType())
def norm_journal_udf(s: pd.Series) -> pd.Series:
    """N3: journal normalization; None passes through (never matches)."""
    return s.map(lambda x: format_journal_name(x) if isinstance(x, str) else None)


@pandas_udf(StringType())
def norm_volume_udf(s: pd.Series) -> pd.Series:
    """N4: first digit run; null -> ''."""
    return s.map(lambda x: normalize_volume(x) if isinstance(x, str) else "")


@pandas_udf(ArrayType(StringType()))
def norm_issn_udf(s: pd.Series) -> pd.Series:
    """N5: canonicalize each ISSN, dropping invalid ones."""

    def _one(lst: object) -> list[str]:
        if lst is None:
            return []
        out = []
        for v in lst:
            f = format_issn(v) if isinstance(v, str) else None
            if f is not None:
                out.append(f)
        return out

    return s.map(_one)


def year_key_col(year: Column, group_by_year: bool) -> Column:
    """M1 blocking key: missing years form ONE block under key 0
    (reference src/dedupe.rs:695-705)."""
    if group_by_year:
        return F.coalesce(year.cast("int"), F.lit(0))
    return F.lit(0)
