"""Exact Euclidean distance transform: both inner kernels, tiled ==
full-raster brute force, buffers, degenerate masks."""

import numpy as np
import pytest

from mapalgebra_spark.operators.distance import (
    _edt_line_envelope,
    _edt_rows_dense,
    _vertical_scan,
    buffer_mask,
    distance_transform,
)
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark

RNG = np.random.default_rng(7)


def brute_force(mask):
    """O(n * targets) reference: true Euclidean distance per pixel."""
    h, w = mask.shape
    ty, tx = np.nonzero(mask)
    if ty.size == 0:
        return np.full((h, w), np.inf)
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = (yy[..., None] - ty) ** 2 + (xx[..., None] - tx) ** 2
    return np.sqrt(d2.min(axis=-1).astype(np.float64))


def local_edt(mask, inner="dense"):
    dv = _vertical_scan(mask != 0)
    if inner == "dense":
        sq = _edt_rows_dense(dv)
    else:
        with np.errstate(invalid="ignore"):
            f = dv * dv
        sq = np.stack([_edt_line_envelope(f[y]) for y in range(dv.shape[0])])
    return np.sqrt(sq)


@pytest.mark.parametrize("inner", ["dense", "envelope"])
def test_local_kernels_match_brute_force(inner):
    for trial in range(4):
        mask = RNG.random((23, 31)) < [0.001, 0.02, 0.2, 0.9][trial]
        got = local_edt(mask, inner)
        np.testing.assert_allclose(got, brute_force(mask), atol=1e-9)


def test_envelope_matches_dense_exactly():
    mask = RNG.random((40, 57)) < 0.05
    np.testing.assert_array_equal(local_edt(mask, "dense"),
                                  local_edt(mask, "envelope"))


def test_empty_columns_and_empty_mask():
    mask = np.zeros((9, 9), bool)
    assert np.isinf(local_edt(mask)).all()
    mask[4, 4] = True  # single target: distances are radial
    got = local_edt(mask)
    assert got[4, 4] == 0.0
    assert got[0, 0] == pytest.approx(np.hypot(4, 4))


@pytest.mark.parametrize("inner", ["dense", "envelope"])
def test_distributed_matches_full_raster(spark, inner):
    # 21x26 raster in 8-px tiles: thin edge tiles, strips cross 3-4 tiles
    mask = (RNG.random((21, 26)) < 0.04).astype(np.float64)
    tr = TileRaster.from_arrays(spark, {"m": mask}, tile_size=8)
    out = distance_transform(tr, inner=inner).collect_array("m")
    np.testing.assert_array_equal(out, local_edt(mask, inner))
    np.testing.assert_allclose(out, brute_force(mask), atol=1e-9)


def test_buffer_mask(spark):
    mask = np.zeros((16, 16))
    mask[8, 8] = 1.0
    tr = TileRaster.from_arrays(spark, {"m": mask}, tile_size=8)
    buf = buffer_mask(tr, radius=3.0).collect_array("m")
    ref = (brute_force(mask != 0) <= 3.0).astype(np.float64)
    np.testing.assert_array_equal(buf, ref)


def test_bad_inner_arg(spark):
    tr = TileRaster.from_arrays(spark, {"m": np.zeros((4, 4))}, tile_size=4)
    with pytest.raises(ValueError, match="inner"):
        distance_transform(tr, inner="nope")


# --- distance_allocation (Euclidean / Voronoi allocation) --------------------


def brute_force_alloc(mask):
    """Reference with the documented tie rule: lexicographic
    (d^2, target column x', target row y'); -1 with no targets."""
    h, w = mask.shape
    ty, tx = np.nonzero(mask)
    out = np.full((h, w), -1.0)
    if ty.size == 0:
        return out
    # sort targets by (x', y') so argmin's first-hit applies the tie rule
    order = np.lexsort((ty, tx))
    ty, tx = ty[order], tx[order]
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = (yy[..., None] - ty) ** 2 + (xx[..., None] - tx) ** 2
    win = d2.argmin(axis=-1)
    return (ty[win] * w + tx[win]).astype(np.float64)


@pytest.mark.parametrize("density", [0.001, 0.03, 0.3])
def test_allocation_distributed_matches_reference(spark, density):
    mask = (RNG.random((21, 26)) < density).astype(np.float64)
    from mapalgebra_spark.operators.distance import distance_allocation

    tr = TileRaster.from_arrays(spark, {"m": mask}, tile_size=8)
    out = distance_allocation(tr).collect_array("m")
    np.testing.assert_array_equal(out, brute_force_alloc(mask))


def test_allocation_tie_rule_and_empty(spark):
    from mapalgebra_spark.operators.distance import distance_allocation

    # two targets equidistant from the centre pixel: (2,1) and (2,3)
    # share d^2=1 with (1,2) and (3,2); rule picks smallest x' first ->
    # target (2,1) = id 2*5+1
    mask = np.zeros((5, 5))
    for y, x in ((2, 1), (2, 3), (1, 2), (3, 2)):
        mask[y, x] = 1.0
    tr = TileRaster.from_arrays(spark, {"m": mask}, tile_size=4)
    out = distance_allocation(tr).collect_array("m")
    assert out[2, 2] == 2 * 5 + 1
    np.testing.assert_array_equal(out, brute_force_alloc(mask))
    # empty mask: all -1
    tr0 = TileRaster.from_arrays(spark, {"m": np.zeros((6, 6))}, tile_size=4)
    assert (distance_allocation(tr0).collect_array("m") == -1.0).all()
