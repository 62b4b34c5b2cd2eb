"""Raster pyramids (overviews): downsample a tile table by 2x per level.

Not in the reference (single-resolution arrays), but essential engine
surface for tiled rasters at scale: overview levels make zoomed-out
reads touch 4^-L of the data.  Distributed shape:

1. each tile shrinks 2x locally (2x2 block mean — one narrow
   mapInPandas, no shuffle),
2. the four shrunken children of a parent tile merge via
   ``groupBy(parent key).applyInPandas`` — the ONLY shuffle, carrying
   already-shrunken (quarter-size) tiles,

so a full pyramid costs ~1/3 extra storage and each level's shuffle is
4x smaller than the last.  Odd-sized rasters follow the usual overview
convention: ceil-div dimensions, edge cells average the available 1-2
source cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..raster import TileRaster
from ..tiles import TILE_SCHEMA, aux_blobs, decode_block, encode_block


def _shrink2(a: np.ndarray) -> np.ndarray:
    """2x2 block mean with ceil-div edges, dtype preserved (floor for
    integer dtypes, like GDAL's 'average' resampling on ints)."""
    h, w = a.shape[-2:]
    H, W = (h + 1) // 2, (w + 1) // 2
    out = np.zeros(a.shape[:-2] + (H, W), dtype=np.float64)
    cnt = np.zeros((H, W), dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = a[..., dy::2, dx::2].astype(np.float64)
            out[..., : sub.shape[-2], : sub.shape[-1]] += sub
            cnt[: sub.shape[-2], : sub.shape[-1]] += 1
    out = out / cnt
    return out.astype(a.dtype) if np.issubdtype(np.asarray(a).dtype, np.integer) else out


_BLOCK_STATS = ("mean", "sum", "min", "max")


def block_stats(tr: TileRaster, k: int, stat: str = "mean",
                tile_pitch: int = 256) -> TileRaster:
    """Block statistics (GDAL ``-outsize``/ESRI *Aggregate*): every
    k×k block collapses to its mean/sum/min/max, producing a k×
    smaller raster that stays a first-class TileRaster (focal ops,
    zonal, colorize all compose over it).

    ``k`` must divide the tile pitch, so blocks NEVER straddle tiles
    and the whole op is ONE narrow mapInPandas — no shuffle at all
    (the 2× pyramid needs its quadrant merge only because successive
    halvings re-key the tile grid; a single k× aggregate does not).
    Edge blocks at the raster boundary aggregate their (ceil-div)
    partial footprint, the standard overview convention.  Mean output
    is float64 (sum and count are exact on integral inputs; the one
    division is correctly rounded — the oracle's AVG matches
    bit-for-bit); sum is float64; min/max keep the input dtype."""
    import math

    if k < 1 or tile_pitch % k != 0:
        raise ValueError(f"k must divide tile_pitch, got k={k} pitch={tile_pitch}")
    if stat not in _BLOCK_STATS:
        raise ValueError(f"stat must be one of {_BLOCK_STATS}, got {stat!r}")
    src = tr.strict().df
    kk = k

    def agg(batches):
        from ..tiles import AUX_COLS

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                h, w = int(row["h"]), int(row["w"])
                a = decode_block(row["tile"], row["dtype"], h, w, int(row["planes"]))
                iy = np.arange(0, h, kk)
                ix = np.arange(0, w, kk)
                if stat in ("mean", "sum"):
                    af = a.astype(np.float64)
                    s = np.add.reduceat(np.add.reduceat(af, iy, axis=-2), ix, axis=-1)
                    if stat == "mean":
                        cy = np.diff(np.append(iy, h)).astype(np.float64)
                        cx = np.diff(np.append(ix, w)).astype(np.float64)
                        s = s / np.multiply.outer(cy, cx)
                    small = s
                elif stat == "min":
                    small = np.minimum.reduceat(
                        np.minimum.reduceat(a, iy, axis=-2), ix, axis=-1
                    )
                else:
                    small = np.maximum.reduceat(
                        np.maximum.reduceat(a, iy, axis=-2), ix, axis=-1
                    )
                d = dict(
                    raster_id=row["raster_id"],
                    band=int(row["band"]),
                    ty=int(row["ty"]),
                    tx=int(row["tx"]),
                    h=small.shape[-2],
                    w=small.shape[-1],
                    nty=int(row["nty"]),
                    ntx=int(row["ntx"]),
                    rh=math.ceil(int(row["rh"]) / kk),
                    rw=math.ceil(int(row["rw"]) / kk),
                    dtype=str(small.dtype),
                    planes=int(row["planes"]),
                    cell_id=int(row["cell_id"]),
                    tile=encode_block(small),
                )
                d.update(aux_blobs(small))
                rows.append(d)
            yield pd.DataFrame(rows)[[f.name for f in TILE_SCHEMA.fields]]

    return TileRaster(src.mapInPandas(agg, TILE_SCHEMA))


def downsample2(tr: TileRaster, tile_size: int = 256) -> TileRaster:
    """One pyramid level: raster dims halve (ceil), tile grid re-keyed.

    A child tile (ty, tx) shrinks to (h/2, w/2) and lands in parent
    tile (ty//2, tx//2) at quadrant (ty%2, tx%2); the merge group has
    <= 4 members.
    """
    src = tr.strict().df

    def shrink_and_rekey(batches):
        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                block = decode_block(
                    row["tile"], row["dtype"], int(row["h"]), int(row["w"]), int(row["planes"])
                )
                small = _shrink2(block)
                rows.append(
                    dict(
                        raster_id=row["raster_id"],
                        band=int(row["band"]),
                        ty=int(row["ty"]) // 2,
                        tx=int(row["tx"]) // 2,
                        qy=int(row["ty"]) % 2,
                        qx=int(row["tx"]) % 2,
                        h=small.shape[-2],
                        w=small.shape[-1],
                        nty=(int(row["nty"]) + 1) // 2,
                        ntx=(int(row["ntx"]) + 1) // 2,
                        rh=(int(row["rh"]) + 1) // 2,
                        rw=(int(row["rw"]) + 1) // 2,
                        dtype=str(small.dtype),
                        planes=int(row["planes"]),
                        cell_id=int(row["cell_id"]),
                        tile=encode_block(small),
                    )
                )
            yield pd.DataFrame(rows)

    inter_schema = (
        "raster_id string, band int, ty int, tx int, qy int, qx int, h int, w int,"
        " nty int, ntx int, rh int, rw int, dtype string, planes int,"
        " cell_id long, tile binary"
    )
    shrunk = src.mapInPandas(shrink_and_rekey, inter_schema)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        row0 = pdf.iloc[0]
        planes = int(row0["planes"])
        dt = row0["dtype"]
        # quadrant layout: heights/widths from present quadrants
        hs = {int(r["qy"]): int(r["h"]) for _, r in pdf.iterrows()}
        ws = {int(r["qx"]): int(r["w"]) for _, r in pdf.iterrows()}
        H = sum(hs[q] for q in sorted(hs))
        W = sum(ws[q] for q in sorted(ws))
        shape = (planes, H, W) if planes > 1 else (H, W)
        out = np.zeros(shape, dtype=np.dtype(dt))
        for _, r in pdf.iterrows():
            blk = decode_block(r["tile"], dt, int(r["h"]), int(r["w"]), planes)
            y0 = hs[0] if int(r["qy"]) == 1 else 0
            x0 = ws[0] if int(r["qx"]) == 1 else 0
            out[..., y0 : y0 + int(r["h"]), x0 : x0 + int(r["w"])] = blk
        d = dict(
            raster_id=row0["raster_id"], band=int(row0["band"]),
            ty=int(key[2]), tx=int(key[3]),
            h=H, w=W, nty=int(row0["nty"]), ntx=int(row0["ntx"]),
            rh=int(row0["rh"]), rw=int(row0["rw"]), dtype=dt,
            planes=planes, cell_id=int(row0["cell_id"]),
            tile=encode_block(out), **aux_blobs(out),
        )
        return pd.DataFrame([d])

    merged = shrunk.groupby("raster_id", "band", "ty", "tx").applyInPandas(
        merge, TILE_SCHEMA
    )
    return TileRaster(merged)


def build_pyramid(tr: TileRaster, levels: int, tile_size: int = 256) -> list[TileRaster]:
    """Level 0 (input) .. level N overviews; each persisted so the next
    level reads the previous one once."""
    out = [tr.strict(persist=True)]
    for _ in range(levels):
        out.append(downsample2(out[-1], tile_size).strict(persist=True))
    return out


# ---------------------------------------------------------------------------
# Upsampling — the other half of the reference's "Upsampling and
# Downsampling" future-work item (README.md:164).  2x per call; raster
# dims double, the tile GRID stays fixed (each tile doubles in place, so
# the effective tile pitch doubles — no re-keying shuffle).
# ---------------------------------------------------------------------------


def upsample2_nearest_np(a: np.ndarray) -> np.ndarray:
    """Full-array oracle: each cell becomes a 2x2 block."""
    return np.repeat(np.repeat(a, 2, axis=-2), 2, axis=-1)


def upsample2_bilinear_np(a: np.ndarray) -> np.ndarray:
    """Full-array oracle, top-left-aligned bilinear doubling with edge
    clamp: out[2i,2j]=v[i,j]; out[2i,2j+1]=(v[i,j]+v[i,j+1])/2 (column
    j+1 clamped); rows likewise; odd-odd cells average the 2x2."""
    f = a.astype(np.float64)
    e = np.concatenate([f[..., :, 1:], f[..., :, -1:]], axis=-1)  # east, clamped
    s = np.concatenate([f[..., 1:, :], f[..., -1:, :]], axis=-2)  # south, clamped
    se = np.concatenate([s[..., :, 1:], s[..., :, -1:]], axis=-1)
    h, w = a.shape[-2], a.shape[-1]
    out = np.empty(a.shape[:-2] + (2 * h, 2 * w), dtype=np.float64)
    out[..., 0::2, 0::2] = f
    out[..., 0::2, 1::2] = (f + e) / 2.0
    out[..., 1::2, 0::2] = (f + s) / 2.0
    out[..., 1::2, 1::2] = (f + e + s + se) / 4.0
    return out


def upsample2(tr: TileRaster, method: str = "bilinear") -> TileRaster:
    """Distributed 2x upsample.

    ``nearest`` is shuffle-free (pure per-tile map).  ``bilinear``
    needs each tile's E/S/SE edge strips — one radius-1 halo exchange
    over the JVM aux columns (operators/focal.py machinery) with Edge
    border at true raster edges (= the oracle's clamp) — and matches
    ``upsample2_bilinear_np`` of the full raster exactly across tile
    boundaries (tests/test_pyramid.py).
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(method)
    src = tr.strict().df

    if method == "nearest":
        def run_nn(batches):
            for pdf in batches:
                rows = []
                for i in range(len(pdf)):
                    row = pdf.iloc[i]
                    block = decode_block(
                        row["tile"], row["dtype"], int(row["h"]), int(row["w"]),
                        int(row["planes"]),
                    )
                    big = upsample2_nearest_np(block)
                    rows.append(_upsampled_row(row, big))
                yield pd.DataFrame(rows)

        return TileRaster(src.mapInPandas(run_nn, TILE_SCHEMA))

    from . import focal as FO
    from ..tiles import KEY_COLS, assemble_halo
    from pyspark.sql import functions as F

    strips = FO._strips_jvm(src)
    halo = strips.groupBy(*KEY_COLS).agg(
        F.collect_list("strip_entry").alias("halo")
    )
    joined = src.join(halo.hint("shuffle_hash"), on=KEY_COLS, how="left")

    def run_bl(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                h, w, planes = int(row["h"]), int(row["w"]), int(row["planes"])
                core = decode_block(row["tile"], row["dtype"], h, w, planes)
                strips_raw = {}
                hl = row["halo"]
                if isinstance(hl, (list, np.ndarray)):
                    for srow in hl:
                        strips_raw[int(srow["pos"])] = decode_block(
                            srow["strip"], srow["sdtype"], int(srow["sh"]),
                            int(srow["sw"]), int(srow["splanes"]),
                        )
                at = dict(
                    at_n=int(row["ty"]) == 0,
                    at_s=int(row["ty"]) == int(row["nty"]) - 1,
                    at_w=int(row["tx"]) == 0,
                    at_e=int(row["tx"]) == int(row["ntx"]) - 1,
                )
                p = assemble_halo(
                    core.astype(np.float64),
                    {k: v.astype(np.float64) for k, v in strips_raw.items()},
                    "edge", **at,
                )
                f = p[..., 1:-1, 1:-1]
                e = p[..., 1:-1, 2:]
                s = p[..., 2:, 1:-1]
                se = p[..., 2:, 2:]
                big = np.empty(core.shape[:-2] + (2 * h, 2 * w), dtype=np.float64)
                big[..., 0::2, 0::2] = f
                big[..., 0::2, 1::2] = (f + e) / 2.0
                big[..., 1::2, 0::2] = (f + s) / 2.0
                big[..., 1::2, 1::2] = (f + e + s + se) / 4.0
                rows.append(_upsampled_row(row, big))
            yield pd.DataFrame(rows)

    return TileRaster(joined.mapInPandas(run_bl, TILE_SCHEMA))


def _upsampled_row(row, big: np.ndarray) -> dict:
    return dict(
        raster_id=row["raster_id"], band=int(row["band"]),
        ty=int(row["ty"]), tx=int(row["tx"]),
        h=big.shape[-2], w=big.shape[-1],
        nty=int(row["nty"]), ntx=int(row["ntx"]),
        rh=2 * int(row["rh"]), rw=2 * int(row["rw"]),
        dtype=str(big.dtype), planes=int(row["planes"]),
        cell_id=int(row["cell_id"]), tile=encode_block(big),
        **aux_blobs(big),
    )
