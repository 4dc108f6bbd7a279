"""End-to-end resumable pipeline: corpus -> parse -> dedupe -> clusters.

Stages checkpoint to ``work_dir`` with _STAGE_OK markers (C8); re-running
with the same work_dir resumes after the last completed stage. The lineage
entry records an order-insensitive aggregate of the input content hashes so
a resume against different input is detectable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biblib_spark.operators.dedupe import DedupConfig, dedupe_records, records_from_parsed
from biblib_spark.plans.checkpoint import run_stage
from biblib_spark.sources.parse import parse_with_diagnostics, split_diagnostics


def _input_fingerprint(corpus: DataFrame) -> dict:
    row = corpus.select(
        F.count(F.lit(1)).alias("n"),
        # order-insensitive: xor of per-row 64-bit content hashes (xor, not
        # sum — sum overflows long under ANSI mode)
        F.expr("bit_xor(xxhash64(content))").alias("hxor"),
    ).collect()[0]
    return {"input_rows": row["n"], "input_hash_xor": int(row["hxor"] or 0)}


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    work_dir: str,
    cfg: DedupConfig | None = None,
    source_col: str | None = None,
    table_format: str = "parquet",
) -> DataFrame:
    """Returns the clusters DataFrame (rid, cluster_id, is_unique, source).

    Stage 1 parses each payload ONCE into the diagnostics union (citations +
    quarantine rows, reference parse_with_diagnostics); the parsed and
    quarantine views are filters over that single checkpointed scan.
    ``source_col`` names a corpus column carrying the per-payload source
    register (M12); every citation of a payload inherits it.

    ``table_format='iceberg'`` checkpoints each stage as an IceTable
    snapshot commit (plans/icetable.py) instead of parquet + _STAGE_OK
    marker: same resume/lineage/verify contract, plus atomic commits,
    snapshot isolation against concurrent readers, and time travel across
    rebuilds — the north_rule's "resumable from checkpoint with
    per-partition lineage + metrics" in its real-cluster table format.
    """
    cfg = cfg or DedupConfig()
    lineage = _input_fingerprint(corpus)
    if table_format == "iceberg":
        from biblib_spark.plans.icetable import run_stage_ice as stage_fn
    elif table_format == "parquet":
        stage_fn = run_stage
    else:
        raise ValueError(f"unknown table_format {table_format!r}")

    diag = stage_fn(
        spark,
        os.path.join(work_dir, "diagnostics"),
        lambda: parse_with_diagnostics(corpus),
        lineage,
    )
    parsed, _quarantine = split_diagnostics(diag)

    def _records() -> DataFrame:
        if source_col is None:
            return records_from_parsed(parsed)
        # per-payload source register joined back by payload id; the corpus
        # scan prunes to two columns
        reg = corpus.select(
            F.col("row_id").alias("__src_row_id"),
            F.col(source_col).alias("__src"),
        )
        joined = parsed.join(reg, parsed["row_id"] == reg["__src_row_id"])
        return records_from_parsed(joined, source_col="__src")

    clusters = stage_fn(
        spark,
        os.path.join(work_dir, "clusters"),
        lambda: dedupe_records(_records(), cfg),
        lineage,
    )
    return clusters
