"""Decode + tiling stage: image+caption table → tile table.

The distributed equivalent of ``fromRGBA``/``fromGray``/``spreadRGBA``
(MapAlgebra.hs:544-591): one Arrow-batched mapInPandas decodes each
image's ``bytes`` once and emits all bands' tiles in a single pass
(the reference splits RGBA with one mutable sweep, :558-577 — here one
decode feeds all four band slices with numpy views, no re-decode).

Each tile row is keyed by the image's anchor cell (deterministic
pseudo-location → Morton cell id at ``cell_level``) so downstream
spatial joins/pruning work, and by (ty, tx) inside the image for halo
exchange.  A size declaration mismatch (w/h columns vs decoded pixels)
fails fast like the reference's Left (MapAlgebra.hs:551-555).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codecs
from .cellindex import latlng_to_cell
from .datagen import synthetic_latlng
from .raster import TileRaster
from .tiles import TILE_SCHEMA, aux_blobs, encode_block, split_into_tiles

DEFAULT_CELL_LEVEL = 12


def tiles_from_images(
    images: DataFrame,
    tile_size: int = 256,
    cell_level: int = DEFAULT_CELL_LEVEL,
    hot_fraction: float = 0.0,
    as_float: bool = False,
) -> TileRaster:
    """Decode every image and cut into tiles; returns a TileRaster whose
    raster_id is the image_id (band 0..3 for RGBA, 0 for gray)."""

    def run(batches):
        for pdf in batches:
            out = {f.name: [] for f in TILE_SCHEMA.fields}
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                w, h = int(row["w"]), int(row["h"])
                pix = codecs.decode_image(row["bytes"], row["fmt"], w, h)
                if pix.shape[0] != h or pix.shape[1] != w:
                    raise ValueError(
                        f"Expected Size: {h} x {w} - Actual Size: "
                        f"{pix.shape[0]} x {pix.shape[1]} ({row['image_id']})"
                    )
                lat, lng = synthetic_latlng(row["image_id"], hot_fraction)
                cell = int(latlng_to_cell(np.array([lat]), np.array([lng]), cell_level)[0])
                bands = (
                    [pix] if pix.ndim == 2 else [pix[..., b] for b in range(pix.shape[2])]
                )
                for b, plane in enumerate(bands):
                    arr = plane.astype(np.float64) if as_float else plane
                    for ty, tx, nty, ntx, block in split_into_tiles(arr, tile_size):
                        out["raster_id"].append(row["image_id"])
                        out["band"].append(b)
                        out["ty"].append(ty)
                        out["tx"].append(tx)
                        out["h"].append(block.shape[0])
                        out["w"].append(block.shape[1])
                        out["nty"].append(nty)
                        out["ntx"].append(ntx)
                        out["rh"].append(h)
                        out["rw"].append(w)
                        out["dtype"].append(str(arr.dtype))
                        out["planes"].append(1)
                        out["cell_id"].append(cell)
                        out["tile"].append(encode_block(block))
                        for k, v in aux_blobs(block).items():
                            out[k].append(v)
            yield pd.DataFrame(out)

    return TileRaster(images.mapInPandas(run, TILE_SCHEMA))
