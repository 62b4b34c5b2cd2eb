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
    # glibc malloc: numpy tile kernels free multi-100KB blocks constantly;
    # with the default 128KB mmap threshold every large temp is a fresh
    # mmap/munmap pair, and munmap's TLB shootdown IPIs serialize across
    # cores (measured: bimodal 2x slowdowns at 32 workers).  Keep big
    # blocks in the arena instead.  Must be set BEFORE the JVM spawns so
    # forked Python workers inherit it.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "536870912")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # ParallelGC: G1's concurrent cycles were measured burning >100
        # core-seconds per stage on fat binary-blob rows (48g heap, 32
        # threads), making identical runs bimodally 2-3x slower; the
        # throughput collector is stable here.  Override via ``extra``.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
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
        # subset co-partitioning: a tile table partitioned by
        # (raster_id, band) — the natural layout for image tables,
        # where focal halos never cross images — already co-locates
        # every (raster_id, band, ty, tx) join key; with this off (it
        # defaults on) Spark re-shuffles BOTH sides of the halo join
        # to the full key anyway.  Allowing subset co-partitioning
        # makes focal ops over image-partitioned tables exchange-free
        # (plan-asserted in tests/test_scale_plans.py).
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    if master.startswith("local"):
        # single-box shuffles land in the page cache; lz4-compressing
        # them only burns CPU (measured ~15 core-s per strip shuffle on
        # the flagship).  Cluster masters keep the default (network).
        b = b.config("spark.shuffle.compress", "false").config(
            "spark.shuffle.spill.compress", "false"
        )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
