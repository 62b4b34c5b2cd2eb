"""Tile data model: the Spark-side representation of a Raster.

The reference's ``Raster u p r c a`` (MapAlgebra.hs:384) — a dense 2-D
grid with type-level dims — becomes a **tile table**: one DataFrame row
per 256x256 block:

    raster_id string   -- logical raster (e.g. image_id)
    band      int      -- 0 for gray; 0..3 for RGBA (spreadRGBA analog)
    ty, tx    int      -- tile grid coords (row-major, ty grows south)
    h, w      int      -- valid core size of this tile (<= tile_size;
                          edge tiles are clipped, never padded)
    nty, ntx  int      -- tile counts per axis for this raster
    H, W      int      -- full raster dims (type-level r c → runtime,
                          checked fail-fast in binary ops)
    dtype     string   -- numpy dtype name of the cells
    planes    int      -- 1, or 4 for Corners stacks
    cell_id   long     -- spatial index key of the raster's anchor cell
    tile      binary   -- C-order numpy bytes, shape (planes, h, w)
                          squeezed to (h, w) when planes == 1

Blobs are raw numpy bytes; compression is left to Parquet (zstd) at rest
and stays off the hot path in memory.  At 100 TB the table is
partitioned by (cell_id prefix) for pruning and hashed on
(raster_id, band, ty, tx) for the halo exchange.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import types as T

TILE_SIZE = 256

KEY_COLS = ["raster_id", "band", "ty", "tx"]

#: edge/corner companion blobs: each materialized tile carries its four
#: 1-px edge strips and four corner pixels as small extra columns
#: (~1.6% of the tile bytes).  The focal halo exchange then needs NO
#: Python pass and NO rescan of the tile bytes — strip routing is a pure
#: JVM projection over these columns (see operators/focal.py).
AUX_COLS = ["en", "es", "ew", "ee", "cnw", "cne", "csw", "cse"]

TILE_FIELDS = [
    T.StructField("raster_id", T.StringType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("ty", T.IntegerType()),
    T.StructField("tx", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("nty", T.IntegerType()),
    T.StructField("ntx", T.IntegerType()),
    T.StructField("rh", T.IntegerType()),
    T.StructField("rw", T.IntegerType()),
    T.StructField("dtype", T.StringType()),
    T.StructField("planes", T.IntegerType()),
    T.StructField("cell_id", T.LongType()),
    T.StructField("tile", T.BinaryType()),
] + [T.StructField(c, T.BinaryType()) for c in AUX_COLS]
TILE_SCHEMA = T.StructType(TILE_FIELDS)


def aux_blobs(arr: np.ndarray) -> dict[str, bytes]:
    """Edge strips + corner pixels of a (h, w) or (planes, h, w) block,
    C-order bytes. Shapes: en/es (planes,1,w), ew/ee (planes,h,1),
    corners (planes,1,1)."""
    return {
        "en": encode_block(arr[..., :1, :]),
        "es": encode_block(arr[..., -1:, :]),
        "ew": encode_block(arr[..., :, :1]),
        "ee": encode_block(arr[..., :, -1:]),
        "cnw": encode_block(arr[..., :1, :1]),
        "cne": encode_block(arr[..., :1, -1:]),
        "csw": encode_block(arr[..., -1:, :1]),
        "cse": encode_block(arr[..., -1:, -1:]),
    }


def encode_block(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr).tobytes()


def decode_block(blob: bytes, dtype: str, h: int, w: int, planes: int = 1) -> np.ndarray:
    a = np.frombuffer(blob, dtype=np.dtype(dtype))
    if planes > 1:
        return a.reshape(planes, h, w)
    return a.reshape(h, w)


def split_into_tiles(arr: np.ndarray, tile_size: int = TILE_SIZE):
    """Yield (ty, tx, block) covering a (H, W) array; edge tiles clipped."""
    H, W = arr.shape[:2]
    nty = (H + tile_size - 1) // tile_size
    ntx = (W + tile_size - 1) // tile_size
    for ty in range(nty):
        for tx in range(ntx):
            block = arr[
                ty * tile_size : min((ty + 1) * tile_size, H),
                tx * tile_size : min((tx + 1) * tile_size, W),
            ]
            yield ty, tx, nty, ntx, block


def tile_rows_from_array(
    raster_id: str,
    arr: np.ndarray,
    band: int = 0,
    cell_id: int = 0,
    tile_size: int = TILE_SIZE,
):
    """One full raster array → list of tile-row dicts (driver/test helper;
    the distributed path is ingest.py's decode UDF)."""
    H, W = arr.shape[:2]
    rows = []
    for ty, tx, nty, ntx, block in split_into_tiles(arr, tile_size):
        rows.append(
            dict(
                raster_id=raster_id,
                band=band,
                ty=ty,
                tx=tx,
                h=block.shape[0],
                w=block.shape[1],
                nty=nty,
                ntx=ntx,
                rh=H,
                rw=W,
                dtype=str(arr.dtype),
                planes=1,
                cell_id=int(cell_id),
                tile=encode_block(block),
                **aux_blobs(block),
            )
        )
    return rows


def assemble_from_tiles(rows, band: int = 0) -> np.ndarray:
    """Tile-row dicts (one raster, one band) → full (H, W[, planes]) array.
    Driver/test helper for golden comparisons — not used at scale."""
    rows = [r for r in rows if r["band"] == band]
    H, W, planes = rows[0]["rh"], rows[0]["rw"], rows[0]["planes"]
    dt = np.dtype(rows[0]["dtype"])
    out = (
        np.zeros((planes, H, W), dtype=dt) if planes > 1 else np.zeros((H, W), dtype=dt)
    )
    ts = max(r["h"] for r in rows if r["ty"] == 0) if rows else TILE_SIZE
    # tile origin: all tiles except the last row/col have uniform size,
    # so origin = (ty * size0, tx * size0) with size0 from tile (0,0)
    size0_h = next(r["h"] for r in rows if r["ty"] == 0 and r["tx"] == 0)
    size0_w = next(r["w"] for r in rows if r["ty"] == 0 and r["tx"] == 0)
    del ts
    for r in rows:
        block = decode_block(r["tile"], r["dtype"], r["h"], r["w"], r["planes"])
        y0, x0 = r["ty"] * size0_h, r["tx"] * size0_w
        if planes > 1:
            out[:, y0 : y0 + r["h"], x0 : x0 + r["w"]] = block
        else:
            out[y0 : y0 + r["h"], x0 : x0 + r["w"]] = block
    return out


# ---------------------------------------------------------------------------
# Halo assembly — the tiled replication of np.pad over the full raster
# ---------------------------------------------------------------------------

# strip position codes, from the RECEIVING tile's point of view
STRIP_N, STRIP_S, STRIP_W, STRIP_E = 0, 1, 2, 3
STRIP_NW, STRIP_NE, STRIP_SW, STRIP_SE = 4, 5, 6, 7

#: (dty, dtx, pos_at_receiver, slicer) — what each tile SENDS.  A tile's
#: bottom row is its south neighbour's STRIP_N, etc.  Slicers take the
#: (planes, h, w) or (h, w) core and return the shipped strip.
STRIP_SENDS = (
    (-1, 0, STRIP_S, lambda a: a[..., :1, :]),    # my top row → north nbr's S strip
    (1, 0, STRIP_N, lambda a: a[..., -1:, :]),    # my bottom row → south nbr's N strip
    (0, -1, STRIP_E, lambda a: a[..., :, :1]),    # my left col → west nbr's E strip
    (0, 1, STRIP_W, lambda a: a[..., :, -1:]),    # my right col → east nbr's W strip
    (-1, -1, STRIP_SE, lambda a: a[..., :1, :1]),
    (-1, 1, STRIP_SW, lambda a: a[..., :1, -1:]),
    (1, -1, STRIP_NE, lambda a: a[..., -1:, :1]),
    (1, 1, STRIP_NW, lambda a: a[..., -1:, -1:]),
)


def _border_1d(mode: str, fill, near, nxt):
    """Value of a pad cell given the adjacent core cell (near) and the
    one beyond it (nxt), replicating np.pad per-axis semantics."""
    if mode == "constant":
        return np.full_like(near, fill)
    if mode in ("edge", "symmetric"):
        return near
    if mode == "reflect":
        return nxt
    raise ValueError(mode)


def assemble_halo(
    core: np.ndarray,
    strips: dict[int, np.ndarray],
    mode: str,
    fill=0,
    at_n: bool = False,
    at_s: bool = False,
    at_w: bool = False,
    at_e: bool = False,
) -> np.ndarray:
    """Build the (h+2, w+2) padded block for one tile.

    ``strips`` maps STRIP_* codes to the 1-px strips received from
    neighbours.  ``at_*`` mark true raster edges, where the border
    ``mode`` is synthesized instead.  Bit-for-bit equivalent to
    ``np.pad(full_raster, 1, mode)`` restricted to this tile — verified
    exhaustively in tests/test_halo_assembly.py, including 1-px tiles
    whose ``reflect`` mirror source lives in a *neighbour's* strip.

    Strategy: place core + all received strips first, then synthesize
    true-edge sides with the border rule applied to the partially built
    padded block (so mirror/next sources resolve to strips when the tile
    itself is too thin), W/E columns before full-width N/S rows, then
    patch the corners of real (received) N/S rows lying past a true W/E
    edge.  Corner results are order-independent for all four modes.
    """
    h, w = core.shape[-2], core.shape[-1]
    out = np.empty(core.shape[:-2] + (h + 2, w + 2), dtype=core.dtype)
    out[..., 1:-1, 1:-1] = core
    # received strips (a rectangular tile grid guarantees a diagonal
    # neighbour exists whenever both adjacent sides are interior)
    if not at_w:
        out[..., 1:-1, 0] = strips[STRIP_W][..., :, 0]
    if not at_e:
        out[..., 1:-1, -1] = strips[STRIP_E][..., :, 0]
    if not at_n:
        out[..., 0, 1:-1] = strips[STRIP_N][..., 0, :]
        if not at_w:
            out[..., 0, 0] = strips[STRIP_NW][..., 0, 0]
        if not at_e:
            out[..., 0, -1] = strips[STRIP_NE][..., 0, 0]
    if not at_s:
        out[..., -1, 1:-1] = strips[STRIP_S][..., 0, :]
        if not at_w:
            out[..., -1, 0] = strips[STRIP_SW][..., 0, 0]
        if not at_e:
            out[..., -1, -1] = strips[STRIP_SE][..., 0, 0]
    # "next" index for the reflect rule: one past the near cell, falling
    # through to the opposite strip for 1-px tiles, or back onto the near
    # cell when the whole raster is 1px along that axis (np.pad reflect
    # of a single element repeats it)
    w_next = 2 if w >= 2 else (-1 if not at_e else 1)
    e_next = -3 if w >= 2 else (0 if not at_w else -2)
    n_next = 2 if h >= 2 else (-1 if not at_s else 1)
    s_next = -3 if h >= 2 else (0 if not at_n else -2)
    # vertical true edges (rows 1..h)
    if at_w:
        out[..., 1:-1, 0] = _border_1d(
            mode, fill, out[..., 1:-1, 1], out[..., 1:-1, w_next]
        )
    if at_e:
        out[..., 1:-1, -1] = _border_1d(
            mode, fill, out[..., 1:-1, -2], out[..., 1:-1, e_next]
        )
    # corners of *received* N/S rows that overhang a true W/E edge —
    # BEFORE the horizontal synth below, which reads these rows in full
    if not at_n:
        if at_w:
            out[..., 0, 0] = _border_1d(mode, fill, out[..., 0, 1], out[..., 0, w_next])
        if at_e:
            out[..., 0, -1] = _border_1d(
                mode, fill, out[..., 0, -2], out[..., 0, e_next]
            )
    if not at_s:
        if at_w:
            out[..., -1, 0] = _border_1d(
                mode, fill, out[..., -1, 1], out[..., -1, w_next]
            )
        if at_e:
            out[..., -1, -1] = _border_1d(
                mode, fill, out[..., -1, -2], out[..., -1, e_next]
            )
    # horizontal true edges at full width (corners included)
    if at_n:
        out[..., 0, :] = _border_1d(mode, fill, out[..., 1, :], out[..., n_next, :])
    if at_s:
        out[..., -1, :] = _border_1d(mode, fill, out[..., -2, :], out[..., s_next, :])
    return out
