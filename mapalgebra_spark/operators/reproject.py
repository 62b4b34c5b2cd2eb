"""Raster reprojection with resampling — completes the reference's
"Reprojections" future-work item (README.md:161) for whole rasters
(projections.py covers points).

Semantics (documented, tested against a pure full-raster oracle):
a georeferenced raster maps its pixel grid onto ``src_bounds``
(x0, y0, x1, y1) in the source CRS, row 0 at the TOP (max y), pixel
centers at half-pixel offsets.  The output grid is defined the same way
by ``dst_bounds`` + (dst_h, dst_w) in the destination CRS.  Every
output pixel center is inverse-projected into source pixel coordinates
and bilinearly sampled, coordinates clamped to the source grid (edge
clamp, like imageops.bilinear_resize).

Distributed shape (a data-dependent generalization of the focal strip
exchange):

1. **requests** — one narrow stage over the OUTPUT tile grid
   (``spark.range``): for each output tile, inverse-project all its
   pixel centers (vectorized) and emit the integer source-pixel bbox it
   needs (floor/+2 so both bilinear neighbours are covered).
2. **ship** — each request row is EXPANDED to the exact source tile
   keys its bbox intersects (a few rows per output tile — the bbox of
   a tile-sized output block under a monotone projection is contiguous
   and tile-sized up to the scale ratio), and source tiles EQUI-join
   the expanded requests on (ty, tx).  No inequality predicates, no
   BroadcastNestedLoopJoin: Catalyst plans a hash/sort-merge join that
   shuffles on the tile key, so at 10^12 scale cost is
   O(src_tiles + out_tiles x coverage), never O(src x out)
   (plan asserted in tests/test_scale_plans.py).
3. **assemble** — group by output tile, mosaic the received sub-blocks
   into a patch, and run the SAME pure sampling kernel the oracle uses
   (``inverse_sample``), so tiled output is bit-identical to
   reprojecting the full array in one numpy call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .. import projections as PJ
from ..raster import TileRaster
from ..tiles import TILE_SCHEMA, TILE_SIZE, aux_blobs, decode_block, encode_block


def _src_pixel_coords(
    oy0: int, ox0: int, h: int, w: int,
    dst_bounds, dst_h: int, dst_w: int,
    src_bounds, src_h: int, src_w: int,
    src_crs: str, dst_crs: str,
):
    """Fractional source pixel coords (fr, fc) of the output-pixel
    centers for an output block at (oy0, ox0) of shape (h, w); clamped
    to the source grid."""
    dx0, dy0, dx1, dy1 = dst_bounds
    sx0, sy0, sx1, sy1 = src_bounds
    ii, jj = np.mgrid[oy0 : oy0 + h, ox0 : ox0 + w]
    xd = dx0 + (jj + 0.5) * (dx1 - dx0) / dst_w
    yd = dy1 - (ii + 0.5) * (dy1 - dy0) / dst_h
    xs, ys = PJ.reproject_np(dst_crs, src_crs, xd, yd)
    fc = (xs - sx0) / (sx1 - sx0) * src_w - 0.5
    fr = (sy1 - ys) / (sy1 - sy0) * src_h - 0.5
    fr = np.clip(fr, 0.0, src_h - 1.0)
    fc = np.clip(fc, 0.0, src_w - 1.0)
    return fr, fc


def bilinear_sample(patch: np.ndarray, fr: np.ndarray, fc: np.ndarray,
                    row_off: int = 0, col_off: int = 0) -> np.ndarray:
    """Bilinear gather at fractional coords (already clamped into the
    global grid); ``patch`` holds global rows/cols starting at
    (row_off, col_off) and must cover floor..floor+1 of every coord."""
    r0 = np.floor(fr).astype(np.int64)
    c0 = np.floor(fc).astype(np.int64)
    gr1 = r0 + 1
    gc1 = c0 + 1
    # neighbour clamp at the far edge (coords are clamped, so r0 <= H-1)
    H = row_off + patch.shape[0]
    W = col_off + patch.shape[1]
    r1 = np.minimum(gr1, H - 1)
    c1 = np.minimum(gc1, W - 1)
    wy = (fr - r0)[..., None] if patch.ndim == 3 else fr - r0
    wx = (fc - c0)[..., None] if patch.ndim == 3 else fc - c0
    a = patch[r0 - row_off, c0 - col_off]
    b = patch[r0 - row_off, c1 - col_off]
    c = patch[r1 - row_off, c0 - col_off]
    d = patch[r1 - row_off, c1 - col_off]
    top = a + (b - a) * wx
    bot = c + (d - c) * wx
    return top + (bot - top) * wy


def inverse_sample(
    patch: np.ndarray, row_off: int, col_off: int,
    oy0: int, ox0: int, h: int, w: int,
    dst_bounds, dst_h: int, dst_w: int,
    src_bounds, src_h: int, src_w: int,
    src_crs: str, dst_crs: str,
) -> np.ndarray:
    """The shared sampling kernel: output block (oy0, ox0, h, w) from a
    source patch.  The oracle calls this with the FULL source array and
    zero offsets; the tiled engine with the mosaicked patch."""
    fr, fc = _src_pixel_coords(
        oy0, ox0, h, w, dst_bounds, dst_h, dst_w, src_bounds, src_h, src_w,
        src_crs, dst_crs,
    )
    return bilinear_sample(
        patch.astype(np.float64), fr, fc, row_off, col_off
    )


def reproject_raster_np(
    full: np.ndarray, src_crs: str, dst_crs: str,
    src_bounds, dst_bounds, dst_h: int, dst_w: int,
) -> np.ndarray:
    """Pure full-array oracle."""
    return inverse_sample(
        full, 0, 0, 0, 0, dst_h, dst_w,
        dst_bounds, dst_h, dst_w, src_bounds, full.shape[0], full.shape[1],
        src_crs, dst_crs,
    )


def _needed_bbox(fr, fc, src_h, src_w):
    """Integer source bbox [ry0, ry1) x [rx0, rx1) covering both
    bilinear neighbours of every coord."""
    ry0 = int(np.floor(fr.min()))
    rx0 = int(np.floor(fc.min()))
    ry1 = min(int(np.floor(fr.max())) + 2, src_h)
    rx1 = min(int(np.floor(fc.max())) + 2, src_w)
    return ry0, ry1, rx0, rx1


def reproject_raster(
    spark,
    tr: TileRaster,
    src_crs: str,
    dst_crs: str,
    src_bounds,
    dst_bounds,
    dst_h: int,
    dst_w: int,
    tile_size: int = TILE_SIZE,
    tile_pitch: int = TILE_SIZE,
) -> TileRaster:
    """Reproject every raster in ``tr`` (all sharing one geotransform
    ``src_bounds``) onto the destination grid.  Output raster_ids gain
    an ``@<dst_crs>`` suffix."""
    src = tr.strict().df
    first = src.select("rh", "rw").first()
    src_h, src_w = int(first["rh"]), int(first["rw"])
    nty = (dst_h + tile_size - 1) // tile_size
    ntx = (dst_w + tile_size - 1) // tile_size

    # --- stage 1: per-output-tile source bboxes, EXPANDED to the exact
    # source tile keys they intersect (distributed) ------------------------
    req_schema = "ty int, tx int, oty int, otx int, ry0 int, ry1 int, rx0 int, rx1 int"

    def requests(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                oty, otx = int(k) // ntx, int(k) % ntx
                h = min(tile_size, dst_h - oty * tile_size)
                w = min(tile_size, dst_w - otx * tile_size)
                fr, fc = _src_pixel_coords(
                    oty * tile_size, otx * tile_size, h, w,
                    dst_bounds, dst_h, dst_w, src_bounds, src_h, src_w,
                    src_crs, dst_crs,
                )
                ry0, ry1, rx0, rx1 = _needed_bbox(fr, fc, src_h, src_w)
                # exact source tile cover of the bbox — turns the ship
                # stage into a plain equi-join on (ty, tx)
                for sty in range(max(ry0, 0) // tile_pitch, (ry1 - 1) // tile_pitch + 1):
                    for stx in range(max(rx0, 0) // tile_pitch, (rx1 - 1) // tile_pitch + 1):
                        rows.append(dict(
                            ty=sty, tx=stx, oty=oty, otx=otx,
                            ry0=ry0, ry1=ry1, rx0=rx0, rx1=rx1,
                        ))
            yield pd.DataFrame(rows)

    n_out = nty * ntx
    reqs = spark.range(0, n_out, numPartitions=max(1, min(n_out, 64))).mapInPandas(
        requests, req_schema
    )

    # --- stage 2: ship intersecting sub-blocks ----------------------------
    # equi-join on the source tile key (module docstring) — the request
    # side is usually dimension-sized per output tile but we do NOT
    # broadcast-hint it: with equality keys Catalyst/AQE picks a hash or
    # sort-merge join that shuffles on (ty, tx) and scales to any ratio
    # of source to output tiles.
    joined = src.join(reqs, on=["ty", "tx"], how="inner")

    ship_schema = (
        "raster_id string, band int, oty int, otx int,"
        " oy int, ox int, sh int, sw int, sdtype string, strip binary"
    )

    def ship(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "raster_id", "band", "oty", "otx", "oy", "ox", "sh", "sw",
                "sdtype", "strip",
            )}
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                h, w = int(row["h"]), int(row["w"])
                y0, x0 = int(row["ty"]) * tile_pitch, int(row["tx"]) * tile_pitch
                ry0, ry1 = int(row["ry0"]), int(row["ry1"])
                rx0, rx1 = int(row["rx0"]), int(row["rx1"])
                ay0, ay1 = max(y0, ry0), min(y0 + h, ry1)
                ax0, ax1 = max(x0, rx0), min(x0 + w, rx1)
                core = decode_block(row["tile"], row["dtype"], h, w, int(row["planes"]))
                if core.ndim == 3:
                    raise ValueError("reproject_raster supports planes == 1")
                blk = core[ay0 - y0 : ay1 - y0, ax0 - x0 : ax1 - x0]
                out["raster_id"].append(row["raster_id"])
                out["band"].append(int(row["band"]))
                out["oty"].append(int(row["oty"]))
                out["otx"].append(int(row["otx"]))
                out["oy"].append(ay0 - ry0)
                out["ox"].append(ax0 - rx0)
                out["sh"].append(ay1 - ay0)
                out["sw"].append(ax1 - ax0)
                out["sdtype"].append(str(core.dtype))
                out["strip"].append(encode_block(blk))
            yield pd.DataFrame(out)

    shipped = joined.mapInPandas(ship, ship_schema)

    # --- stage 3: assemble patch + shared sampling kernel ------------------
    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, oty, otx = key[0], int(key[1]), int(key[2]), int(key[3])
        h = min(tile_size, dst_h - oty * tile_size)
        w = min(tile_size, dst_w - otx * tile_size)
        fr, fc = _src_pixel_coords(
            oty * tile_size, otx * tile_size, h, w,
            dst_bounds, dst_h, dst_w, src_bounds, src_h, src_w, src_crs, dst_crs,
        )
        ry0, ry1, rx0, rx1 = _needed_bbox(fr, fc, src_h, src_w)
        dt = np.dtype(pdf.iloc[0]["sdtype"])
        patch = np.zeros((ry1 - ry0, rx1 - rx0), dtype=dt)
        filled = np.zeros(patch.shape, dtype=bool)
        for i in range(len(pdf)):
            row = pdf.iloc[i]
            sh, sw = int(row["sh"]), int(row["sw"])
            oy, ox = int(row["oy"]), int(row["ox"])
            patch[oy : oy + sh, ox : ox + sw] = decode_block(
                row["strip"], row["sdtype"], sh, sw, 1
            )
            filled[oy : oy + sh, ox : ox + sw] = True
        if not filled.all():
            raise AssertionError(f"source under-coverage at out tile ({oty},{otx})")
        block = bilinear_sample(patch.astype(np.float64), fr, fc, ry0, rx0)
        return pd.DataFrame(
            [
                dict(
                    raster_id=f"{rid}@{dst_crs}", band=band, ty=oty, tx=otx,
                    h=h, w=w, nty=nty, ntx=ntx, rh=dst_h, rw=dst_w,
                    dtype=str(block.dtype), planes=1, cell_id=0,
                    tile=encode_block(block), **aux_blobs(block),
                )
            ]
        )

    out = shipped.groupby("raster_id", "band", "oty", "otx").applyInPandas(
        assemble, TILE_SCHEMA
    )
    return TileRaster(out)
