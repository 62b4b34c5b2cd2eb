"""Colouring / classification / histogram layer (MapAlgebra.hs:594-682,
1296-1315) — the reference's "analytics" surface.

- ``histogram``: per-tile ``np.bincount`` partials → one groupBy sum
  (the 2-stage tree-reduce; the only shuffle carries 256 rows/partition).
- ``breaks``: the reference's exact quirky algorithm, driver-side on the
  collected 256-vector (kernels.breaks).
- colour ramps: the ten fixed ramps from /Cartographer's Toolkit/
  pages 32-41, RGB literals identical to MapAlgebra.hs:604-661 (data
  constants, not code).
- ``colorize``: classify each uint8 tile through a ramp into a 4-plane
  RGBA tile (one local map — fused, no shuffle).
- ``render_png``: encode a (small) raster to one PNG for export/debug.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs
from .. import kernels as K
from ..raster import TileRaster
from ..tiles import AUX_COLS as _AUX_COLS
from ..tiles import decode_block

# RGB literals from /Cartographer's Toolkit/ as cited in
# MapAlgebra.hs:603-661 (data, reproduced verbatim).
RAMP_COLOURS: dict[str, list[tuple[int, int, int]]] = {
    "greenRed": [(0, 48, 0), (31, 79, 20), (100, 135, 68), (148, 193, 28), (193, 242, 3),
                 (241, 255, 159), (249, 228, 227), (202, 145, 150), (153, 101, 97), (142, 38, 18)],
    "spectrum": [(0, 22, 51), (51, 18, 135), (150, 0, 204), (242, 13, 177), (255, 61, 61),
                 (240, 152, 56), (248, 230, 99), (166, 249, 159), (184, 249, 212), (216, 230, 253)],
    "blueGreen": [(29, 43, 53), (37, 44, 95), (63, 70, 134), (89, 112, 147), (87, 124, 143),
                  (117, 160, 125), (188, 219, 173), (239, 253, 163), (222, 214, 67), (189, 138, 55)],
    "purpleYellow": [(90, 89, 78), (73, 65, 132), (107, 86, 225), (225, 67, 94), (247, 55, 55),
                     (251, 105, 46), (248, 174, 66), (249, 219, 25), (255, 255, 0), (242, 242, 242)],
    "brownBlue": [(27, 36, 43), (86, 52, 42), (152, 107, 65), (182, 176, 152), (215, 206, 191),
                  (198, 247, 0), (53, 227, 0), (30, 158, 184), (22, 109, 138), (12, 47, 122)],
    "grayBrown": [(64, 57, 88), (95, 96, 116), (158, 158, 166), (206, 208, 197), (215, 206, 191),
                  (186, 164, 150), (160, 124, 98), (117, 85, 72), (90, 70, 63), (39, 21, 17)],
    "greenPurple": [(89, 168, 15), (158, 213, 76), (196, 237, 104), (226, 255, 158), (240, 242, 221),
                    (248, 202, 140), (233, 161, 137), (212, 115, 132), (172, 67, 123), (140, 40, 110)],
    "brownYellow": [(96, 72, 96), (120, 72, 96), (168, 96, 96), (192, 120, 96), (240, 168, 72),
                    (248, 202, 140), (254, 236, 174), (255, 244, 194), (255, 247, 219), (255, 252, 246)],
    "purpleGreen": [(80, 73, 113), (117, 64, 152), (148, 116, 180), (199, 178, 214), (223, 204, 228),
                    (218, 234, 193), (171, 214, 155), (109, 192, 103), (13, 177, 75), (57, 99, 83)],
    "purpleRed": [(51, 60, 255), (76, 60, 233), (99, 60, 211), (121, 60, 188), (155, 60, 155),
                  (166, 60, 143), (188, 60, 121), (206, 60, 94), (217, 60, 83), (255, 60, 76)],
}

INVISIBLE = (0, 0, 0, 0)  # MapAlgebra.hs:594-595


def ramp(colours: list[tuple[int, int, int]], breaks_keys: list) -> dict:
    """zip breaks with RGB triples → {break: RGBA} (MapAlgebra.hs:599-601,
    alpha = maxBound)."""
    return {k: (r, g, b, 255) for k, (r, g, b) in zip(breaks_keys, colours)}


def histogram(tr: TileRaster, band: int | None = None) -> DataFrame:
    """256-bin value counts of a uint8 raster collection → DataFrame
    (value int, count long). Partial bincount per tile, final sum."""
    import pandas as pd

    src = tr.strict().df
    if band is not None:
        src = src.filter(F.col("band") == band)

    schema = T.StructType(
        [T.StructField("value", T.IntegerType()), T.StructField("cnt", T.LongType())]
    )

    def partial(batches):
        for pdf in batches:
            acc = np.zeros(256, dtype=np.int64)
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                )
                acc += K.block_histogram(block).astype(np.int64)
            yield pd.DataFrame({"value": np.arange(256, dtype=np.int32), "cnt": acc})

    return (
        src.mapInPandas(partial, schema)
        .groupBy("value")
        .agg(F.sum("cnt").alias("count"))
    )


def histogram_values(tr: TileRaster, band: int | None = None) -> DataFrame:
    """Exact value histogram for ANY integer dtype (incl. negative
    values) — the reference's histogram "currently supports Word8 only"
    (README.md:100, MapAlgebra.hs:1296-1305); this is the
    more-data-types future-work item.  Per-tile ``np.unique`` partials
    (≤ tile-cells rows each) → one groupBy sum; shuffle volume is the
    per-tile distinct count, not the pixel count."""
    import pandas as pd

    src = tr.strict().df
    if band is not None:
        src = src.filter(F.col("band") == band)

    schema = T.StructType(
        [T.StructField("value", T.LongType()), T.StructField("cnt", T.LongType())]
    )

    def partial(batches):
        for pdf in batches:
            acc: dict = {}
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                )
                if not np.issubdtype(block.dtype, np.integer):
                    raise ValueError("histogram_values needs an integer raster; "
                                     "use histogram_binned for floats")
                vals, cnts = np.unique(block, return_counts=True)
                for v, c in zip(vals.tolist(), cnts.tolist()):
                    acc[v] = acc.get(v, 0) + c
            yield pd.DataFrame(
                {"value": list(acc.keys()), "cnt": list(acc.values())},
                dtype=np.int64,
            )

    return (
        src.mapInPandas(partial, schema).groupBy("value").agg(F.sum("cnt").alias("count"))
    )


def histogram_binned(
    tr: TileRaster, bins: int, lo: float, hi: float, band: int | None = None
) -> DataFrame:
    """Fixed-width binned histogram for float rasters: bin i covers
    [lo + i*w, lo + (i+1)*w); out-of-range values clamp to the edge
    bins.  Per-tile bincount partials → one groupBy sum."""
    import pandas as pd

    if not (bins >= 1 and hi > lo):
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    src = tr.strict().df
    if band is not None:
        src = src.filter(F.col("band") == band)

    schema = T.StructType(
        [T.StructField("bin", T.IntegerType()), T.StructField("cnt", T.LongType())]
    )

    def partial(batches):
        for pdf in batches:
            acc = np.zeros(bins, dtype=np.int64)
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                ).astype(np.float64)
                flat = block.ravel()
                # NaN would make the int cast undefined; +-inf would
                # wrap to INT64_MIN and land in bin 0 — pre-clamping to
                # [lo, hi] sends +inf to the TOP bin and -inf to the
                # bottom one (the clamp contract), with NaN dropped
                flat = flat[~np.isnan(flat)]
                idx = np.clip(
                    np.floor((np.clip(flat, lo, hi) - lo) / width).astype(np.int64),
                    0, bins - 1,
                )
                acc += np.bincount(idx, minlength=bins)
            yield pd.DataFrame({"bin": np.arange(bins, dtype=np.int32), "cnt": acc})

    out = src.mapInPandas(partial, schema).groupBy("bin").agg(F.sum("cnt").alias("count"))
    return out.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
        "count",
    )


def equalize(tr: TileRaster, band: int | None = None) -> TileRaster:
    """Global histogram EQUALIZATION — the classic contrast-enhancement
    GLOBAL op (every output pixel depends on the full-raster value
    distribution): remap each value v to

        eq(v) = floor((cdf(v) − cdf_min) · 255 / (N − cdf_min))

    where cdf is the cumulative count and cdf_min the cdf of the
    smallest present value (the standard formula; constant rasters map
    to 0).  Output is float64 in [0, 255].

    100 TB shape: two jobs, no driver data.  (1) the LUT —
    ``histogram_values`` partials (shuffle = per-tile distinct counts)
    → a cumsum window over the ≤distinct-values rows (single-partition
    by design, like ``breaks``' 256-row fold: the LUT of a
    value-discrete raster is tiny by contract) → a one-row totals
    crossJoin; (2) the remap — the LUT rides to every tile as ONE
    broadcast array column (collect-free) and each tile rewrites via a
    vectorized searchsorted.  Integer rasters only (the equalization
    LUT of a continuous float raster is the quantile transform —
    ``histogram_binned`` + ``classify`` covers that shape)."""
    import pandas as pd

    from pyspark.sql import Window

    from ..tiles import TILE_SCHEMA, aux_blobs, encode_block

    lut = histogram_values(tr, band=band)
    # all three LUT columns from ONE sorted single-partition pass (the
    # LUT is tiny by contract — constant partition key silences the
    # no-partition warning without changing the plan shape); folding
    # the totals into windows instead of a separate agg + crossJoin
    # keeps the histogram subtree in the plan exactly once
    wcum = (
        Window.partitionBy(F.lit(0)).orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = (
        Window.partitionBy(F.lit(0)).orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    mapped = (
        lut.withColumn("cdf", F.sum("count").over(wcum))
        .withColumn("cdfmin", F.min("cdf").over(wall))
        .withColumn("n", F.max("cdf").over(wall))
        .select(
            "value",
            F.when(F.col("n") == F.col("cdfmin"), F.lit(0.0))
            .otherwise(
                F.floor(
                    (F.col("cdf") - F.col("cdfmin")) * F.lit(255.0)
                    / (F.col("n") - F.col("cdfmin"))
                ).cast("double")
            )
            .alias("eq"),
        )
    )
    lut_row = mapped.agg(
        F.collect_list(F.struct(F.col("value"), F.col("eq"))).alias("_lut")
    )

    src = tr.strict().df
    if band is not None:
        src = src.filter(F.col("band") == band)
    joined = src.crossJoin(F.broadcast(lut_row))

    def remap(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            entries = pdf["_lut"].iloc[0]
            keys = np.array([e["value"] for e in entries], dtype=np.int64)
            vals = np.array([e["eq"] for e in entries], dtype=np.float64)
            order = np.argsort(keys)
            keys, vals = keys[order], vals[order]
            out_tiles, out_dt, out_aux = [], [], {c: [] for c in _AUX_COLS}
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]),
                    int(row["planes"]),
                )
                res = vals[np.searchsorted(keys, block.astype(np.int64))]
                out_tiles.append(encode_block(res))
                out_dt.append(str(res.dtype))
                for k, v in aux_blobs(res).items():
                    out_aux[k].append(v)
            out = pdf[
                [f.name for f in TILE_SCHEMA.fields
                 if f.name not in ("tile", "dtype", *_AUX_COLS)]
            ].copy()
            out["tile"] = out_tiles
            out["dtype"] = out_dt
            for k in _AUX_COLS:
                out[k] = out_aux[k]
            yield out[[f.name for f in TILE_SCHEMA.fields]]

    return TileRaster(joined.mapInPandas(remap, TILE_SCHEMA))


def value_range(tr: TileRaster, band: int | None = None) -> tuple[float, float]:
    """Global (min, max) over a raster collection — one narrow pass of
    per-tile partials, for choosing histogram_binned bounds."""
    import pandas as pd

    src = tr.strict().df
    if band is not None:
        src = src.filter(F.col("band") == band)

    schema = T.StructType(
        [T.StructField("mn", T.DoubleType()), T.StructField("mx", T.DoubleType())]
    )

    def partial(batches):
        mn, mx = np.inf, -np.inf
        for pdf in batches:
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                )
                mn = min(mn, float(block.min()))
                mx = max(mx, float(block.max()))
        yield pd.DataFrame({"mn": [mn], "mx": [mx]})

    row = (
        src.mapInPandas(partial, schema)
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .first()
    )
    return float(row["mn"]), float(row["mx"])


def histogram_vector(tr: TileRaster, band: int | None = None) -> np.ndarray:
    """Collect the histogram to a 256-vector on the driver (for breaks)."""
    rows = histogram(tr, band).collect()
    h = np.zeros(256, dtype=np.uint64)
    for r in rows:
        h[int(r["value"])] = int(r["count"])
    return h


def breaks(hist: np.ndarray) -> list[int]:
    """Reference ``breaks`` (MapAlgebra.hs:1309-1315), driver-side."""
    return K.breaks(hist)


def auto_ramp(tr: TileRaster, ramp_name: str = "spectrum", band: int | None = None) -> dict:
    """histogram → breaks → ramp, the README colour pipeline front half."""
    return ramp(RAMP_COLOURS[ramp_name], breaks(histogram_vector(tr, band)))


def colorize(tr: TileRaster, colour_map: dict, default=INVISIBLE) -> TileRaster:
    """classify through an RGBA ramp → 4-plane uint8 tiles (one fused
    local map; classify semantics = lookupLE, MapAlgebra.hs:679-682)."""
    keys = sorted(colour_map)
    vals = np.array([colour_map[k] for k in keys], dtype=np.uint8)  # (n, 4)
    default = np.array(default, dtype=np.uint8)

    def g(a):
        idx = np.searchsorted(np.asarray(keys), a, side="right") - 1
        out = np.where(
            idx[None, :, :] >= 0,
            vals[np.clip(idx, 0, len(keys) - 1)].transpose(2, 0, 1),
            default[:, None, None],
        )
        return out.astype(np.uint8)

    return tr.map(g)


def render_png(tr: TileRaster, raster_id: str) -> bytes:
    """Assemble one (small) raster and PNG-encode it on the driver —
    the ``png`` export (MapAlgebra.hs:671-673). Debug/export path."""
    arr = tr.collect_array(raster_id)
    if arr.ndim == 3:  # (4, h, w) RGBA planes → (h, w, 4)
        arr = np.moveaxis(arr, 0, -1)
    return codecs.png_encode(arr)


def grayscale(tr: TileRaster) -> TileRaster:
    """Identity band-tagging (MapAlgebra.hs:665-667)."""
    return tr


def write_image(tr: TileRaster, raster_id: str, path: str) -> None:
    """``writeImage`` (MapAlgebra.hs:134): assemble one raster and write
    it in the format implied by ``path``'s extension — .png, .tif/.tiff
    (LZW), .npy, or .raw.  Driver-side export path for small rasters;
    the distributed sink is the parquet tile table (lineage.Job)."""
    arr = tr.collect_array(raster_id)
    if arr.ndim == 3:  # (bands, h, w) planes → (h, w, bands)
        arr = np.moveaxis(arr, 0, -1)
    ext = path.rsplit(".", 1)[-1].lower()
    fmt = {"png": "png", "tif": "tiff", "tiff": "tiff", "npy": "npy", "raw": "raw"}.get(ext)
    if fmt is None:
        raise ValueError(f"writeImage: unknown extension .{ext}")
    if fmt in ("png", "tiff"):
        # 8-bit formats: refuse to silently crush other dtypes — the
        # caller colorizes/quantizes first (like the reference, whose
        # writeImage takes Pixel Word8 rasters)
        if arr.dtype != np.uint8:
            raise ValueError(
                f"writeImage: .{ext} needs a uint8 raster, got {arr.dtype} — "
                "colorize/quantize first, or export .npy for native dtypes"
            )
        if fmt == "tiff":
            from ..tiff import COMP_LZW, tiff_encode

            data = tiff_encode(np.ascontiguousarray(arr), compression=COMP_LZW)
        else:
            data = codecs.encode_image(np.ascontiguousarray(arr), fmt)
    elif fmt == "npy":
        data = codecs.npy_encode(np.ascontiguousarray(arr))  # native dtype
    else:  # raw: native bytes, caller tracks dtype/shape
        data = np.ascontiguousarray(arr).tobytes()
    with open(path, "wb") as f:
        f.write(data)


#: ``writeImageAuto`` (MapAlgebra.hs:134) — in the reference the Auto
#: variant lets massiv-io pick conversions; here both share the
#: extension-dispatched writer.
write_image_auto = write_image
