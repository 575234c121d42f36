"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "tokencodec", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("TOKENCODEC_DRIVER_MEM", "8g"))
        .config("spark.driver.maxResultSize", "4g")
        # shuffle/spill on tmpfs when available: the sandbox has one
        # virtio disk whose bandwidth does not scale with cores (a real
        # cluster's shuffle IO scales with node count)
        .config("spark.local.dir",
                os.environ.get("TOKENCODEC_LOCAL_DIR",
                               "/dev/shm/tokencodec-spark"
                               if os.path.isdir("/dev/shm") else "/tmp"))
        .config("spark.ui.enabled", "false")
        # snapshot commits reference exact data FILES (direct task-side
        # writes: one file per task-group), so a decode plan hands the
        # reader hundreds of file paths. Above this threshold Spark
        # launches a distributed LISTING JOB per plan build — ~0.7 s of
        # the ~1.5 s point-lookup wall at a 214-file table, paid by
        # EVERY fresh decode. Driver-side sequential listing is cheap
        # into the thousands of paths on local/HDFS-like stores; very
        # large object-store tables can lower this back via the env.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                os.environ.get("TOKENCODEC_LIST_JOB_THRESHOLD", "10000"))
        .getOrCreate()
    )
