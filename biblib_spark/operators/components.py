"""Connected components over the verified duplicate-pair edge list (C6).

Replaces the reference's greedy star grouping (src/dedupe.rs:592-655). The
reference predicate is symmetric, so every reference co-group pair lies in
one connected component: CC reproduces 100% of reference dup-pairs (recall
1.0 >= 0.99); CC may merge additional near-pairs, which the stated metric
(dup-pair recall) does not penalize — SURVEY.md §2.8 C6.

Algorithm: iterative min-label propagation. label(v) starts at v; each round
label(v) := min(label(v), min over neighbors). Labels are monotonically
non-increasing and bounded, so the global sum of labels is a convergence
certificate: one cheap agg per round, no change-count join. Rounds ~ cluster
diameter; duplicate clusters are star/clique shaped (diameter <= ~3).
``localCheckpoint`` per round truncates lineage (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Edges (a, b) -> (rid, cluster_id) for every vertex in the edge list.

    cluster_id = min rid of the component.
    """
    sym = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("rid"))
        .distinct()
        .withColumn("label", F.col("rid"))
        .localCheckpoint(eager=True)
    )

    def one_round(lbl):
        # each vertex receives its neighbors' current labels
        msgs = sym.join(lbl, sym["dst"] == lbl["rid"]).select(
            F.col("src").alias("rid"), "label"
        )
        return (
            lbl.select("rid", "label")
            .unionByName(msgs)
            .groupBy("rid")
            .agg(F.min("label").alias("label"))
        )

    # two propagation rounds per materialization: duplicate clusters are
    # star/clique shaped (diameter <= ~3), so most runs finish in two blocks;
    # batching halves the number of Spark jobs (the loop's cost at scale is
    # job scheduling + checkpoint I/O, not compute)
    prev_sum = None
    for _ in range(max_iter // 2 + 1):
        labels = one_round(one_round(labels)).localCheckpoint(eager=True)
        # decimal(38,0) sum: rids reach ~2^63 at 10^12-record scale, where a
        # LongType sum would wrap silently (non-ANSI) and could fake a fixpoint
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.select("rid", F.col("label").alias("cluster_id"))


def assign_clusters(all_rids: DataFrame, edges: DataFrame) -> DataFrame:
    """(rid) x edges -> (rid, cluster_id); singletons keep their own rid (M11)."""
    cc = connected_components(edges)
    return (
        all_rids.join(cc, "rid", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("rid")))
    )
