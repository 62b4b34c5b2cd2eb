#!/usr/bin/env python
"""spark-submit entrypoint: the checkpoint-resumable flagship pipeline
(north_rule: "submitted via spark-submit --py-files ... resumable from
checkpoint with per-partition lineage + metrics").

    spark-submit --py-files mapalgebra_spark.zip runner.py \
        --images <parquet> --out /tmp/ma_job --job-id run1 [--n-images 256]

Stages (each snapshot-committed via the Iceberg-style catalog; re-run
resumes after the last committed stage):

  images   — synthesize the input table if --images not given
  tiles    — decode + tile + cell-index (ingest)
  focal    — fused fmean+fgradient over one halo join
  zonal    — per-cell rollup of the smoothed raster

Lineage/metrics land in <out>/lineage and <out>/metrics (Parquet).
"""

from __future__ import annotations

import argparse


def build_job(spark, out: str, job_id: str, images_path: str | None, n_images: int):
    from mapalgebra_spark.lineage import Job

    job = Job(spark, out, job_id)

    @job.stage("images")
    def images(spark, _):
        if images_path:
            return spark.read.parquet(images_path)
        from mapalgebra_spark.datagen import generate_images_df

        return generate_images_df(spark, n_images)

    @job.stage("tiles", inputs=["images"])
    def tiles(spark, ins):
        from mapalgebra_spark.ingest import tiles_from_images

        return tiles_from_images(ins["images"], tile_size=256, as_float=True).df

    @job.stage("focal", inputs=["tiles"])
    def focal(spark, ins):
        from mapalgebra_spark.operators.focal import focal_multi
        from mapalgebra_spark.raster import TileRaster
        from mapalgebra_spark.tiles import KEY_COLS

        src = ins["tiles"].repartition(*KEY_COLS)
        outs = focal_multi(TileRaster(src), ["fmean", "fgradient"], repartition=False)
        return outs["fmean"]._combined  # both outputs in one table

    @job.stage("zonal", inputs=["focal"])
    def zonal(spark, ins):
        from pyspark.sql import functions as F

        from mapalgebra_spark.operators.zonal import zonal_stats_by_cell
        from mapalgebra_spark.raster import TileRaster
        from mapalgebra_spark.tiles import TILE_SCHEMA

        from mapalgebra_spark.tiles import AUX_COLS

        suffixed = tuple(
            f"{c}_" for c in ("tile", "dtype", "planes", *AUX_COLS)
        )
        fmean = ins["focal"].select(
            *[c for c in ins["focal"].columns if not c.startswith(suffixed)],
            F.col("dtype_fmean").alias("dtype"),
            F.col("planes_fmean").alias("planes"),
            F.col("tile_fmean").alias("tile"),
            *[F.col(f"{c}_fmean").alias(c) for c in AUX_COLS],
        ).select(*[f.name for f in TILE_SCHEMA.fields])
        return zonal_stats_by_cell(TileRaster(fmean))

    return job


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="input image parquet (else synthesized)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--job-id", default="job0")
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--verbose", action="store_true",
        help="recount every stage output after the run (each count is a "
        "full scan job — off by default so the last stage commit is the "
        "final Spark job)",
    )
    args = ap.parse_args()

    from mapalgebra_spark.session import get_spark

    spark = get_spark(app=f"runner_{args.job_id}")
    job = build_job(spark, args.out, args.job_id, args.images, args.n_images)
    outs = job.run(resume=not args.no_resume)
    if args.verbose:
        print({k: v.count() for k, v in outs.items()})
    else:
        # committed row counts come free from the catalog (written from
        # the parquet footers at commit time) — no post-run scan jobs
        print({
            k: job.catalog.current_snapshot(job._table(k))["row_count"]
            for k in outs
        })


if __name__ == "__main__":
    main()
