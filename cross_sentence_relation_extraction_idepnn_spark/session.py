"""SparkSession factory tuned for the KG-construction pipeline.

Local mode stands in for a multi-executor cluster; all knobs below are
the ones that matter at 100 TB too (AQE, skew-join splitting, Arrow
batch sizing for the pandas-UDF kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "idepnn_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default 32). Shuffle
    partitions default to 2× cores locally; on a real cluster you would
    size them so post-shuffle partitions are ~128 MB (AQE coalesces).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by *byte* size, which starves CPU-bound Arrow
        # kernels (mapInPandas rows are cheap to ship, expensive to
        # compute): keep small-input coalescing from dropping below
        # full parallelism by lowering the per-partition floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16kb")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
