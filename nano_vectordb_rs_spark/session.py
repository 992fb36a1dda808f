"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the configs below are the ones that matter
at cluster scale too (AQE for runtime re-planning/skew handling, Arrow for
the few pandas-UDF paths, sane shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "nano-vectordb-rs-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # high-entropy float vectors don't compress; codec CPU was ~10x the
        # cache-materialization cost for array<float> collections
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode puts executors in the driver JVM: size the heap for the
        # machine (128 GiB here), not the default 1g — uncompressed vector
        # caches plus JVM-side normalize allocations GC-thrash at 8g
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
