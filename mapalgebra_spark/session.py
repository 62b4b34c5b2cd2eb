"""SparkSession factory with the engine's standard configuration.

AQE on (skew-join splitting + partition coalescing are load-bearing at
the 100 TB target, per BASELINE.json north_star), Arrow on (every pixel
kernel crosses the JVM/Python boundary in Arrow batches), shuffle
partitions sized for the local core count but overridable for cluster
runs via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "mapalgebra_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; cluster masters fall back to a sane default
        shuffle_partitions = (
            int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else 200
        )
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # tile rows are FAT (64KB-1MB of blob each): small Arrow batches
        # pipeline the JVM->Python->JVM stream instead of buffering
        # multi-GB chunks per task (measured on the flagship at 8 cores:
        # 256-row batches 9.7s -> 16-row batches 4.9s)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
