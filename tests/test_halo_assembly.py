"""assemble_halo must be bit-for-bit np.pad(full_raster, 1, mode)
restricted to each tile — for every border mode, every tile geometry
(including 1-px tiles and ragged edge tiles)."""

import numpy as np
import pytest

from mapalgebra_spark import kernels as K
from mapalgebra_spark import tiles as TL


def tile_grid(arr, tile_h, tile_w):
    """Split arr into a dict {(ty,tx): block} with ragged edges."""
    H, W = arr.shape
    nty = (H + tile_h - 1) // tile_h
    ntx = (W + tile_w - 1) // tile_w
    blocks = {}
    for ty in range(nty):
        for tx in range(ntx):
            blocks[(ty, tx)] = arr[
                ty * tile_h : min((ty + 1) * tile_h, H),
                tx * tile_w : min((tx + 1) * tile_w, W),
            ]
    return blocks, nty, ntx


def strips_for(blocks, ty, tx, nty, ntx):
    """Simulate the strip exchange: collect what neighbours send to
    (ty, tx), using the STRIP_SENDS table from the sender's side."""
    got = {}
    for dty, dtx, pos, slicer in TL.STRIP_SENDS:
        src = (ty - dty, tx - dtx)  # the tile that would address us
        if src in blocks and 0 <= src[0] < nty and 0 <= src[1] < ntx:
            got[pos] = slicer(blocks[src])
    return got


MODES = [
    (K.BORDER_FILL, 7),
    (K.BORDER_EDGE, 0),
    (K.BORDER_REFLECT, 0),
    (K.BORDER_CONTINUE, 0),
]

GEOMS = [
    (1, 1, 1, 1),
    (1, 5, 1, 2),
    (5, 1, 2, 1),
    (4, 4, 2, 2),
    (5, 7, 2, 3),
    (8, 8, 3, 3),
    (9, 13, 4, 5),
    (6, 6, 6, 6),  # single tile
    (7, 7, 2, 7),  # row strip tiles
]


@pytest.mark.parametrize("mode,fill", MODES)
@pytest.mark.parametrize("H,W,th,tw", GEOMS)
def test_assemble_matches_np_pad(mode, fill, H, W, th, tw):
    rng = np.random.default_rng(H * 1000 + W * 100 + th * 10 + tw)
    arr = rng.integers(0, 9, size=(H, W)).astype(np.int64)
    ref = K.pad_block(arr, mode, fill)
    blocks, nty, ntx = tile_grid(arr, th, tw)
    for (ty, tx), core in blocks.items():
        got = strips_for(blocks, ty, tx, nty, ntx)
        padded = TL.assemble_halo(
            core,
            got,
            mode,
            fill,
            at_n=ty == 0,
            at_s=ty == nty - 1,
            at_w=tx == 0,
            at_e=tx == ntx - 1,
        )
        y0, x0 = ty * th, tx * tw
        want = ref[y0 : y0 + core.shape[0] + 2, x0 : x0 + core.shape[1] + 2]
        np.testing.assert_array_equal(
            padded, want, err_msg=f"tile ({ty},{tx}) mode={mode} geom={(H,W,th,tw)}"
        )


@pytest.mark.parametrize("mode,fill", MODES)
def test_tiled_focal_equals_full_raster(mode, fill):
    """End-to-end: kernel over tiled halos == kernel over np.pad full."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 4, size=(11, 14)).astype(np.float64)
    kern = {
        K.BORDER_FILL: K.k_fsum,
        K.BORDER_EDGE: K.k_fmax,
        K.BORDER_REFLECT: K.k_fvolume,
        K.BORDER_CONTINUE: K.k_fmajority,
    }[mode]
    ref = kern(K.pad_block(arr, mode, fill))
    blocks, nty, ntx = tile_grid(arr, 4, 5)
    out = np.zeros_like(ref)
    for (ty, tx), core in blocks.items():
        got = strips_for(blocks, ty, tx, nty, ntx)
        padded = TL.assemble_halo(
            core, got, mode, fill,
            at_n=ty == 0, at_s=ty == nty - 1, at_w=tx == 0, at_e=tx == ntx - 1,
        )
        res = kern(padded)
        out[ty * 4 : ty * 4 + core.shape[0], tx * 5 : tx * 5 + core.shape[1]] = res
    np.testing.assert_allclose(out, ref)
