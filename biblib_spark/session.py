"""SparkSession factory with scale-oriented defaults.

The sandbox runs local[N] single-JVM; the configs below are the ones that
matter on a real multi-executor cluster too (AQE, skew-join splitting, Arrow
batching for the parse UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biblib_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # several waves per core so stragglers don't idle the fleet; AQE
        # coalesces the small ones back together
        shuffle_partitions = max(cores * 3, 24)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # payloads can be multi-KB; keep Arrow batches bounded so the parse
        # UDF's per-batch memory stays flat (SURVEY.md §4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # split file scans finely enough that a few hundred MB of input still
        # fans out across all cores (default 128m gives 2-3 tasks for a
        # 300 MB corpus, serializing the parse UDF); at warehouse scale the
        # default is fine because files are plentiful
        # fine enough that task waves stay balanced at local[32] (a coarse
        # split leaves the last wave mostly idle); AQE re-coalesces shuffles
        .config("spark.sql.files.maxPartitionBytes", "3m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # shuffle + checkpoint blocks on tmpfs: /tmp sits on a single virtual
        # disk whose bandwidth does not grow with cores; with 128 GiB RAM the
        # spill path belongs in memory (on a real cluster this is local NVMe
        # per executor)
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
    )
    return builder.getOrCreate()
