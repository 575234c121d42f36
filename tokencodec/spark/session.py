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
        .getOrCreate()
    )
