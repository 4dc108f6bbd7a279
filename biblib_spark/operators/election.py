"""Representative election per cluster (M10).

reference: src/dedupe.rs:507-555. Cascade, in order:
1. source preferences: the first citation IN GROUP ORDER whose source equals
   the highest-ranked preference present in the group;
2. abstracts: none -> first; exactly one -> it; several -> first with a
   non-empty DOI among those with abstracts, else first with an abstract.

"Group order" is the reference's input order; we carry it as ``rid`` (payload
order x record index). Encoded as one window: rank rows by a computed sort
class then rid; row_number()==1 is the unique representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_INF = 1 << 30


def elect_representatives(
    clustered: DataFrame, source_preferences: list[str] | None = None
) -> DataFrame:
    """Input: (rid, cluster_id, source, abstract_text, doi, ...). Output: same
    plus ``is_unique`` boolean (exactly one true per cluster)."""
    prefs = source_preferences or []

    pref_rank = F.lit(_INF)
    for i in reversed(range(len(prefs))):
        pref_rank = F.when(F.col("source") == prefs[i], F.lit(i)).otherwise(pref_rank)

    has_abs = F.col("abstract_text").isNotNull()
    doi_ok = F.col("doi").isNotNull() & (F.col("doi") != "")

    df = clustered.withColumn("_pref", pref_rank).withColumn(
        "_abs", has_abs.cast("int")
    ).withColumn("_absdoi", (has_abs & doi_ok).cast("int"))

    cw = Window.partitionBy("cluster_id")
    df = (
        df.withColumn("_min_pref", F.min("_pref").over(cw))
        .withColumn("_n_abs", F.sum("_abs").over(cw))
        .withColumn("_any_absdoi", F.max("_absdoi").over(cw))
    )

    # sort class per the cascade; lower sorts first
    sort_class = (
        F.when(
            F.col("_min_pref") < _INF,
            F.when(F.col("_pref") == F.col("_min_pref"), 0).otherwise(1),
        )
        .otherwise(
            F.when(F.col("_n_abs") == 0, F.lit(0))
            .when(F.col("_n_abs") == 1, 1 - F.col("_abs"))
            .otherwise(
                F.when(F.col("_absdoi") == 1, 0)
                .when(F.col("_abs") == 1, 1)
                .otherwise(2)
            )
        )
    )

    ow = Window.partitionBy("cluster_id").orderBy(sort_class.asc(), F.col("rid").asc())
    out = df.withColumn("is_unique", F.row_number().over(ow) == 1)
    return out.drop("_pref", "_abs", "_absdoi", "_min_pref", "_n_abs", "_any_absdoi")
