"""Zonal operations — Spark-native (the reference declares them
"Not yet implemented", MapAlgebra.hs:38; BASELINE.json north_star
mandates raster↔vector zonal aggregation, so the semantics here are
ours, defined GaCM-style: aggregate the value raster per zone).

Two zone sources:

- ``zonal_stats(values, zones)`` — zones is an aligned int raster
  (e.g. a rasterized polygon layer); per-tile numpy partial aggregation
  (bincount by zone) shrinks each 64Ki-cell tile to a handful of rows
  BEFORE the shuffle, then a built-in groupBy finishes — the classic
  partial/final split, so shuffle volume is O(zones), not O(pixels).
- ``zonal_stats_by_cell(values)`` — zone = the tile's spatial cell_id
  (raster↔cell-grid rollup); same partial/final shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..raster import TileRaster
from ..tiles import decode_block

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("zone", T.LongType()),
        T.StructField("psum", T.DoubleType()),
        T.StructField("pss", T.DoubleType()),
        T.StructField("pcnt", T.LongType()),
        T.StructField("pmin", T.DoubleType()),
        T.StructField("pmax", T.DoubleType()),
    ]
)


def _final_agg(partials: DataFrame) -> DataFrame:
    s, ss, n = F.sum("psum"), F.sum("pss"), F.sum("pcnt")
    return partials.groupBy("zone").agg(
        s.alias("zsum"),
        n.alias("zcount"),
        (s / n).alias("zmean"),
        F.min("pmin").alias("zmin"),
        F.max("pmax").alias("zmax"),
        # sample variance from the (sum, sum-of-squares, count) sketch —
        # the same algebraic form the SQL oracle uses, so integral
        # inputs compare exactly.  NULL for single-cell zones.  NOTE:
        # the sketch is cancellation-prone when |mean| >> stddev on
        # non-integral data (ss and s*s/n nearly cancel); for such data
        # prefer a shifted-value pass or Welford-merge — documented
        # limitation, exactness is only claimed for integral inputs.
        F.when(n > 1, (ss - s * s / n) / (n - 1)).alias("zvar"),
    )


def zonal_stats(values: TileRaster, zones: TileRaster) -> DataFrame:
    """Zonal sum/count/mean/min/max of ``values`` per zone id in the
    aligned ``zones`` raster. Returns (zone, zsum, zcount, zmean, zmin,
    zmax)."""
    values = values.strict()  # no-op when already materialized
    zones = zones.strict()
    joined = values.zip_with(zones, lambda v, z: (v, z))
    cols = joined.cols
    fn = joined.fn

    def partial(batches):
        for pdf in batches:
            zs, sums, sqs, cnts, mins, maxs = [], [], [], [], [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                h, w = int(row["h"]), int(row["w"])
                v = decode_block(row[cols[0]], row["dtype"], h, w, int(row["planes"]))
                z = decode_block(
                    row[cols[1]], row["_m1_dtype"], h, w, int(row["_m1_planes"])
                )
                res_v, res_z = fn(v, z)
                vv = np.asarray(res_v, dtype=np.float64).ravel()
                zz = np.asarray(res_z, dtype=np.int64).ravel()
                uniq, inv = np.unique(zz, return_inverse=True)
                sums_ = np.bincount(inv, weights=vv)
                sqs_ = np.bincount(inv, weights=vv * vv)
                cnts_ = np.bincount(inv)
                # per-zone min/max via sorted segmentation
                order = np.argsort(inv, kind="stable")
                sv = vv[order]
                bounds = np.cumsum(cnts_)[:-1]
                mins_ = np.minimum.reduceat(sv, np.concatenate([[0], bounds]))
                maxs_ = np.maximum.reduceat(sv, np.concatenate([[0], bounds]))
                zs.extend(uniq.tolist())
                sums.extend(sums_.tolist())
                sqs.extend(sqs_.tolist())
                cnts.extend(cnts_.astype(np.int64).tolist())
                mins.extend(mins_.tolist())
                maxs.extend(maxs_.tolist())
            yield pd.DataFrame(
                {"zone": zs, "psum": sums, "pss": sqs, "pcnt": cnts,
                 "pmin": mins, "pmax": maxs}
            )

    return _final_agg(joined.df.mapInPandas(partial, _PARTIAL_SCHEMA))


_CENSUS_SCHEMA = T.StructType(
    [
        T.StructField("zone", T.LongType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("pcnt", T.LongType()),
    ]
)


def zonal_census(values: TileRaster, zones: TileRaster) -> DataFrame:
    """Zonal category census (cross-tab): (zone, val, n) — how many
    cells of each distinct value fall in each zone.  The categorical
    zonal op (zonal majority/minority/variety are one GROUP BY away
    from it); e.g. a per-district colour census of a classified map.

    Scale shape mirrors :func:`zonal_stats`: a per-tile ``np.unique``
    over (zone, value) pairs shrinks each 64Ki-cell tile to its
    distinct pairs BEFORE the shuffle, and the final built-in groupBy
    sums the partial counts — shuffle volume is O(zones x categories),
    never O(pixels).  Values are grouped exactly as float64 (intended
    for categorical/integral rasters); NaN cells are dropped — a
    census requires finite categories."""
    values = values.strict()
    zones = zones.strict()
    joined = values.zip_with(zones, lambda v, z: (v, z))
    cols = joined.cols
    fn = joined.fn

    def partial(batches):
        for pdf in batches:
            zs, vs, cs = [], [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                h, w = int(row["h"]), int(row["w"])
                v = decode_block(row[cols[0]], row["dtype"], h, w, int(row["planes"]))
                z = decode_block(
                    row[cols[1]], row["_m1_dtype"], h, w, int(row["_m1_planes"])
                )
                res_v, res_z = fn(v, z)
                vv = np.asarray(res_v, dtype=np.float64).ravel()
                zz_raw = np.asarray(res_z).ravel()
                ok = np.isfinite(vv)
                if zz_raw.dtype.kind == "f":
                    # float zone rasters use NaN as NoData — drop those
                    # cells; casting NaN to int64 would mint a garbage
                    # zone id
                    ok &= np.isfinite(zz_raw)
                # zones stay int64 end-to-end (a float64 round-trip
                # would corrupt ids above 2^53); the structured dtype
                # keeps the (zone, value) pair exact through np.unique
                pair = np.empty(int(ok.sum()),
                                dtype=[("z", np.int64), ("v", np.float64)])
                pair["z"] = zz_raw[ok].astype(np.int64)
                pair["v"] = vv[ok]
                uniq, cnt = np.unique(pair, return_counts=True)
                zs.extend(uniq["z"].tolist())
                vs.extend(uniq["v"].tolist())
                cs.extend(cnt.astype(np.int64).tolist())
            yield pd.DataFrame({"zone": zs, "val": vs, "pcnt": cs})

    partials = joined.df.mapInPandas(partial, _CENSUS_SCHEMA)
    return partials.groupBy("zone", "val").agg(F.sum("pcnt").alias("n"))


def zonal_stats_by_cell(values: TileRaster) -> DataFrame:
    """Rollup of a raster onto its spatial cells: zone = cell_id."""
    src = values.strict().df

    def partial(batches):
        for pdf in batches:
            rows = {"zone": [], "psum": [], "pss": [], "pcnt": [], "pmin": [], "pmax": []}
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                v = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                ).astype(np.float64)
                rows["zone"].append(int(row["cell_id"]))
                rows["psum"].append(float(v.sum()))
                rows["pss"].append(float((v * v).sum()))
                rows["pcnt"].append(int(v.size))
                rows["pmin"].append(float(v.min()))
                rows["pmax"].append(float(v.max()))
            yield pd.DataFrame(rows)

    return _final_agg(src.mapInPandas(partial, _PARTIAL_SCHEMA))


def zonal_top_stats(census: DataFrame) -> DataFrame:
    """(zone, majority, minority, variety) from a :func:`zonal_census`
    — the categorical zonal statistics (GaCM zonal majority / minority
    / variety).  Ties break to the SMALLEST value, the same convention
    as the reference's lmajority/fmajority (MapAlgebra.hs:708-739).
    Operates on the census (zones x categories rows), so the windows
    here never touch pixel-scale data."""
    from pyspark.sql import Window

    wmaj = Window.partitionBy("zone").orderBy(F.desc("n"), F.asc("val"))
    wmin = Window.partitionBy("zone").orderBy(F.asc("n"), F.asc("val"))
    ranked = census.select(
        "zone", "val",
        F.row_number().over(wmaj).alias("rmaj"),
        F.row_number().over(wmin).alias("rmin"),
    )
    maj = ranked.where(F.col("rmaj") == 1).select("zone", F.col("val").alias("majority"))
    mnr = ranked.where(F.col("rmin") == 1).select("zone", F.col("val").alias("minority"))
    var = census.groupBy("zone").agg(F.count("*").alias("variety"))
    return maj.join(mnr, "zone").join(var, "zone")


def zonal_quantiles(census: DataFrame, probs: list[float]) -> DataFrame:
    """EXACT per-zone quantiles (linear interpolation, the R type-7 /
    ``quantile_cont`` convention) derived from a :func:`zonal_census`
    — never from pixel rows.  The census IS the per-zone exact value
    distribution, so the k-th order statistic is the first value whose
    cumulative count exceeds k; quantile p sits at pos = p·(n−1)
    between order stats ⌊pos⌋ and ⌈pos⌉.

    Scale shape: a cumsum window plus one groupBy over the census's
    O(zones × categories) rows — pixel-scale data is never shuffled,
    unlike a naive ``percentile(col)`` over exploded pixels.  Column
    ``q{100p}`` per requested prob."""
    from pyspark.sql import Window

    wz = Window.partitionBy("zone").orderBy("val")
    wall = Window.partitionBy("zone")
    c = (
        census.withColumn("cum", F.sum("n").over(wz))
        .withColumn("tot", F.sum("n").over(wall))
        .withColumn("cum0", F.col("cum") - F.col("n"))
    )
    aggs = []
    for p in probs:
        name = f"q{round(p * 100):d}"
        pos = F.lit(p) * (F.col("tot") - 1)
        klo, khi = F.floor(pos), F.ceil(pos)
        # value covering order-stat k: cum0 <= k < cum
        vlo = F.min(
            F.when((F.col("cum0") <= klo) & (klo < F.col("cum")), F.col("val"))
        )
        vhi = F.min(
            F.when((F.col("cum0") <= khi) & (khi < F.col("cum")), F.col("val"))
        )
        frac = F.max(pos - klo)  # constant per zone
        aggs.append((vlo + frac * (vhi - vlo)).alias(name))
    return c.groupBy("zone").agg(*aggs)
