"""Stage checkpointing with lineage markers (C8 of SURVEY.md §2.8).

Each stage writes parquet plus a ``_STAGE_OK`` JSON marker carrying row
counts and a content-lineage fingerprint; ``run_stage`` skips stages whose
marker exists, so a killed job resumes mid-pipeline. Iceberg is the target
table format on a real cluster; the sandbox falls back to plain parquet
behind this same interface (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

MARKER = "_STAGE_OK"


def stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, MARKER))


def write_stage(df: DataFrame, path: str, lineage: dict | None = None) -> dict:
    """Write a stage output + marker. Returns the marker payload."""
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    n = spark.read.parquet(path).count()
    payload = {
        "rows": n,
        "written_at": time.time(),
        "lineage": lineage or {},
    }
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump(payload, f)
    return payload


def run_stage(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    lineage: dict | None = None,
) -> DataFrame:
    """Build-or-resume: skip the build when the stage marker exists."""
    if not stage_done(path):
        write_stage(build(), path, lineage)
    return spark.read.parquet(path)


def read_marker(path: str) -> dict:
    with open(os.path.join(path, MARKER)) as f:
        return json.load(f)
