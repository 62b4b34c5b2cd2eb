#!/usr/bin/env python
"""DIAGNOSTIC scratch harness from the r3 scaling investigation.

bench.py is the authoritative protocol; this tool intentionally
exposes knobs bench.py pins (SPARK_GRAFT_FCAST, _GC, _STORAGE,
_SHUF_COMPRESS, _CACHE_*, FULL_WARM) so single factors can be A/B'd
in isolation.  Conclusions drawn here must be re-confirmed through
bench.py before they count.

Usage: python BENCH/profile_flagship.py <spec> <tiles_parquet> <sink> [runs]
spec: "32" -> local[32]; "8x4" -> local-cluster[8,4,mem]
sink: tiles | checksum | join
Prints one JSON line with every run's seconds.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    spec = sys.argv[1]  # "32" -> local[32]; "8x4" -> local-cluster[8,4,mem]
    img_path = sys.argv[2]
    sink = sys.argv[3]
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from dataclasses import replace as _rp
    FCAST = os.environ.get("SPARK_GRAFT_FCAST", "float32")

    from pyspark.sql import functions as F

    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.raster import TileRaster
    from mapalgebra_spark.session import get_spark
    from mapalgebra_spark.tiles import KEY_COLS

    part_mult = int(os.environ.get("SPARK_GRAFT_PART_MULT", "2"))
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16")
    extra = {
        "spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch,
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.inMemoryColumnarStorage.compressed":
            os.environ.get("SPARK_GRAFT_CACHE_COMPRESS", "true"),
        "spark.sql.inMemoryColumnarStorage.batchSize":
            os.environ.get("SPARK_GRAFT_CACHE_BATCH", "10000"),
        "spark.shuffle.compress": os.environ.get("SPARK_GRAFT_SHUF_COMPRESS", "true"),
        "spark.shuffle.spill.compress": os.environ.get("SPARK_GRAFT_SHUF_COMPRESS", "true"),
    }
    gc = os.environ.get("SPARK_GRAFT_GC")
    ncpu = len(os.sched_getaffinity(0))
    if gc:
        flags = {"parallel": "-XX:+UseParallelGC", "g1": "-XX:+UseG1GC",
                 "zgc": "-XX:+UseZGC"}[gc]
        flags += f" -XX:ParallelGCThreads={max(2, ncpu // 2)}"
        extra["spark.driver.extraJavaOptions"] = flags
    if os.environ.get("SPARK_GRAFT_HEAP"):
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = os.environ["SPARK_GRAFT_HEAP"]
    if "x" in spec:
        n_exec, exec_cores = (int(v) for v in spec.split("x"))
        cores = n_exec * exec_cores
        exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM", "6144")
        master = f"local-cluster[{n_exec},{exec_cores},{exec_mem}]"
        extra["spark.executorEnv.PYTHONPATH"] = REPO
        for k in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
            if k in os.environ:
                extra[f"spark.executorEnv.{k}"] = os.environ[k]
        if gc:
            extra["spark.executor.extraJavaOptions"] = flags
        extra["spark.executor.memory"] = f"{exec_mem}m"
    else:
        cores = int(spec)
        master = f"local[{cores}]"
    spark = get_spark(
        app=f"prof_{spec}", master=master,
        shuffle_partitions=cores * part_mult,
        extra=extra,
    )
    src = spark.read.parquet(img_path).repartition(cores * part_mult, *KEY_COLS)
    storage = os.environ.get("SPARK_GRAFT_STORAGE", "default")
    if storage == "memory_only":
        from pyspark import StorageLevel
        src = src.persist(StorageLevel.MEMORY_ONLY)
    elif storage == "none":
        pass
    else:
        src = src.persist()
    n_tiles = src.count()
    warm = TileRaster(src).map(lambda a: a + 0).strict().df.count()
    assert warm == n_tiles
    if os.environ.get("SPARK_GRAFT_FULL_WARM") == "1":
        # warm the FULL path (strips shuffle codegen, join, kernel JIT)
        cs = FO.focal_multi(
            TileRaster(src),
            [_rp(FO.FOCAL_OPS["fmean"], cast=FCAST), _rp(FO.FOCAL_OPS["fgradient"], cast=FCAST)],
            repartition=False, persist_combined=False,
            out_dtype="float32", sink="checksum",
        )
        cs.agg(F.count("*")).collect()

    if sink == "join":
        from mapalgebra_spark.operators.focal import _strips_jvm
        secs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            strips = _strips_jvm(src)
            halo = strips.groupBy(*KEY_COLS).agg(
                F.collect_list("strip_entry").alias("halo"))
            joined = src.join(halo.hint("shuffle_hash"), on=KEY_COLS, how="left")
            joined.write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        best = min(secs)
        print(json.dumps({"cores": cores, "sink": sink, "secs": secs, "best": best}))
        os._exit(0)

    secs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        if sink == "checksum":
            cs = FO.focal_multi(
                TileRaster(src),
                [_rp(FO.FOCAL_OPS["fmean"], cast=FCAST), _rp(FO.FOCAL_OPS["fgradient"], cast=FCAST)],
                repartition=False, persist_combined=False,
                out_dtype="float32", sink="checksum",
            )
            got = cs.agg(
                F.count("*").alias("n"),
                F.sum("sum_fmean").alias("s1"),
                F.sum("sum_fgradient").alias("s2"),
            ).collect()[0]
            assert got["n"] == n_tiles
        else:
            outs = FO.focal_multi(
                TileRaster(src),
                [_rp(FO.FOCAL_OPS["fmean"], cast=FCAST), _rp(FO.FOCAL_OPS["fgradient"], cast=FCAST)],
                repartition=False, persist_combined=False,
                out_dtype="float32",
            )
            got = outs["fmean"]._combined.count()
            assert got == n_tiles
        secs.append(round(time.perf_counter() - t0, 3))
    best = min(secs)
    print(json.dumps({
        "cores": cores, "sink": sink, "tiles": n_tiles,
        "secs": secs, "best": best, "tps": round(n_tiles / best, 1),
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
