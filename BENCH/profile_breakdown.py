#!/usr/bin/env python
"""DIAGNOSTIC: stage-by-stage cost breakdown of the flagship checksum
job at one width, in ONE session.  Times, best-of-N each:

  scan      — cached src -> noop (cache read only, no Python)
  strips    — strips projection + collect_list agg + join -> noop (JVM only)
  pyid      — mapInArrow over the join output: decode every tile + halo
              strip, sum raw pixels (no kernels) -> measures the
              Arrow hop + decode, without kernel FLOPs
  checksum  — the real flagship kernel stage (fmean+fgradient)

Usage: python BENCH/profile_breakdown.py <cores> <tiles_parquet> [runs]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    img_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from dataclasses import replace as _rp

    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.raster import TileRaster
    from mapalgebra_spark.session import get_spark
    from mapalgebra_spark.tiles import KEY_COLS, decode_block

    part_mult = int(os.environ.get("SPARK_GRAFT_PART_MULT", "2"))
    extra = {
        "spark.sql.execution.arrow.maxRecordsPerBatch":
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16"),
        "spark.sql.adaptive.enabled": "false",
    }
    spark = get_spark(app="prof_breakdown", master=f"local[{cores}]",
                      shuffle_partitions=cores * part_mult, extra=extra)
    src = (
        spark.read.parquet(img_path)
        .repartition(cores * part_mult, *KEY_COLS)
        .persist()
    )
    n_tiles = src.count()

    def timeit(name, fn):
        fn()  # warm (codegen + JIT for this plan)
        secs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            secs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"stage": name, "secs": secs, "best": min(secs)}),
              flush=True)
        return min(secs)

    def scan():
        src.write.format("noop").mode("overwrite").save()

    def strips_join():
        strips = FO._strips_jvm(src)
        halo = strips.groupBy(*KEY_COLS).agg(
            F.collect_list("strip_entry").alias("halo"))
        src.join(halo.hint("shuffle_hash"), on=KEY_COLS, how="left") \
            .write.format("noop").mode("overwrite").save()

    out_schema = T.StructType([T.StructField("s", T.DoubleType())])

    def pyid_run(batches):
        for batch in batches:
            acc = 0.0
            hcol = batch.column("halo").to_pylist()
            dcol = batch.column("dtype").to_pylist()
            tcol = batch.column("tile")
            hs = batch.column("h").to_numpy(zero_copy_only=False)
            ws = batch.column("w").to_numpy(zero_copy_only=False)
            ps = batch.column("planes").to_numpy(zero_copy_only=False)
            for r in range(batch.num_rows):
                core = decode_block(tcol[r].as_py(), dcol[r], int(hs[r]),
                                    int(ws[r]), int(ps[r]))
                acc += float(core.sum(dtype=np.float64))
                if hcol[r]:
                    for srow in hcol[r]:
                        sb = decode_block(srow["strip"], srow["sdtype"],
                                          int(srow["sh"]), int(srow["sw"]),
                                          int(srow["splanes"]))
                        acc += float(sb.sum(dtype=np.float64))
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc], type=pa.float64())], ["s"])

    def pyid():
        strips = FO._strips_jvm(src)
        halo = strips.groupBy(*KEY_COLS).agg(
            F.collect_list("strip_entry").alias("halo"))
        joined = src.join(halo.hint("shuffle_hash"), on=KEY_COLS, how="left")
        joined.mapInArrow(pyid_run, out_schema).agg(F.sum("s")).collect()

    specs = [_rp(FO.FOCAL_OPS["fmean"], cast="float32"),
             _rp(FO.FOCAL_OPS["fgradient"], cast="float32")]

    def checksum():
        cs = FO.focal_multi(TileRaster(src), specs, repartition=False,
                            persist_combined=False, out_dtype="float32",
                            sink="checksum")
        cs.agg(F.count("*").alias("n"), F.sum("sum_fmean"),
               F.sum("sum_fgradient")).collect()

    def hop_run(batches):
        acc = 0
        for batch in batches:
            acc += batch.num_rows
        yield pa.RecordBatch.from_arrays(
            [pa.array([float(acc)], type=pa.float64())], ["s"])

    def arrowhop():
        # floor of ANY Python-kernel design: ship every src batch to the
        # Python worker, touch nothing, return a count
        src.mapInArrow(hop_run, out_schema).agg(F.sum("s")).collect()

    from mapalgebra_spark import kernels as K

    def nohalo_run(batches):
        for batch in batches:
            acc = 0.0
            dcol = batch.column("dtype").to_pylist()
            tcol = batch.column("tile")
            hs = batch.column("h").to_numpy(zero_copy_only=False)
            ws = batch.column("w").to_numpy(zero_copy_only=False)
            ps = batch.column("planes").to_numpy(zero_copy_only=False)
            for r in range(batch.num_rows):
                core = decode_block(tcol[r].as_py(), dcol[r], int(hs[r]),
                                    int(ws[r]), int(ps[r]))
                p = np.pad(core.astype(np.float32), 1, mode="reflect")
                acc += float(K.k_fmean(p).sum(dtype=np.float64))
                acc += float(K.k_gradient(p).sum(dtype=np.float64))
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc], type=pa.float64())], ["s"])

    def nohalo():
        # cost-representative kernel pass with NO halo machinery at all
        # (numerically wrong at tile seams; measures the floor of
        # hop + decode + cast + pad + kernels)
        src.mapInArrow(nohalo_run, out_schema).agg(F.sum("s")).collect()

    # the stream-halo path, timed DIRECTLY (not inferred from the
    # nohalo proxy): its own sorted persisted layout, presorted=True
    src_sorted = (
        spark.read.parquet(img_path)
        .repartition(cores * part_mult, "raster_id", "band")
        .sortWithinPartitions(*KEY_COLS)
        .persist()
    )
    assert src_sorted.count() == n_tiles

    def stream_checksum():
        cs = FO.focal_multi(
            TileRaster(src_sorted), specs, repartition=False,
            persist_combined=False, out_dtype="float32", sink="checksum",
            halo="stream", presorted=True,
        )
        got = cs.agg(F.count("*").alias("n")).collect()[0]
        assert got["n"] == n_tiles

    t_scan = timeit("scan", scan)
    t_hop = timeit("arrowhop(count only)", arrowhop)
    t_nohalo = timeit("nohalo(kernels, no halo)", nohalo)
    t_join = timeit("strips+agg+join", strips_join)
    t_py = timeit("pyid(decode only)", pyid)
    t_cs = timeit("checksum(kernels, join halo)", checksum)
    t_stream = timeit("checksum(kernels, stream halo)", stream_checksum)
    print(json.dumps({
        "tiles": n_tiles, "cores": cores,
        "scan": t_scan, "arrow_hop": round(t_hop - t_scan, 3),
        "nohalo_floor": t_nohalo,
        "join_delta": round(t_join - t_scan, 3),
        "py_hop_delta": round(t_py - t_join, 3),
        "kernel_delta": round(t_cs - t_py, 3),
        "join_total": t_cs, "join_tps": round(n_tiles / t_cs, 1),
        "stream_total": t_stream, "stream_tps": round(n_tiles / t_stream, 1),
        "stream_over_floor": round(t_stream - t_nohalo, 3),
    }), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
