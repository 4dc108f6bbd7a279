"""Columnar spill for fan-out intermediates.

``localCheckpoint`` materializes the full row set into block-manager memory,
and every downstream branch re-reads EVERY column of it. The dedup feature
table fans out nine ways (six candidate tiers, two verify sides, the election
join) but no consumer reads more than ~half its columns — a parquet spill on
the shuffle-local dir (tmpfs in this sandbox, executor-local NVMe on a real
cluster) gives each consumer columnar pruning plus lightweight compression at
the cost of one write job, and like a checkpoint it truncates lineage so the
iterative CC joins replan against a flat scan.

Spilled directories are deleted at session exit (atexit); callers that loop
(bench repeats) should call ``cleanup`` eagerly so tmpfs does not accumulate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid

from pyspark.sql import DataFrame

_LIVE: set[str] = set()


def _base_dir() -> str:
    base = os.environ.get(
        "SPARK_LOCAL_DIRS",
        "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
    )
    # SPARK_LOCAL_DIRS may be a comma list (Spark round-robins block dirs);
    # the parquet spill just needs one of them
    base = base.split(",")[0]
    path = os.path.join(base, "spill")
    os.makedirs(path, exist_ok=True)
    return path


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    _LIVE.discard(path)


def cleanup_all() -> None:
    for p in list(_LIVE):
        cleanup(p)


atexit.register(cleanup_all)


def spill_to_parquet(df: DataFrame, name: str = "stage") -> tuple[DataFrame, str]:
    """Write ``df`` to a fresh parquet dir and return (re-read df, path)."""
    spark = df.sparkSession
    path = os.path.join(_base_dir(), f"{name}-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(path)
    _LIVE.add(path)
    return spark.read.parquet(path), path
