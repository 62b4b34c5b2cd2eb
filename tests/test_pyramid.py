"""Pyramid/overview levels vs a direct numpy oracle."""

import numpy as np
import pytest

from mapalgebra_spark.operators import pyramid as P
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark


def np_shrink2(a):
    return P._shrink2(a)


@pytest.mark.parametrize("shape,tile", [((64, 64), 16), ((50, 37), 16), ((13, 9), 4)])
def test_downsample2_matches_oracle(spark, shape, tile):
    rng = np.random.default_rng(1)
    arr = rng.uniform(0, 100, shape)
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=tile)
    out = P.downsample2(tr, tile).collect_array("r")
    np.testing.assert_allclose(out, np_shrink2(arr))


def test_pyramid_levels(spark):
    rng = np.random.default_rng(2)
    arr = rng.uniform(0, 255, (80, 96))
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=16)
    levels = P.build_pyramid(tr, 3, tile_size=16)
    ref = arr
    for lv in range(1, 4):
        ref = np_shrink2(ref)
        got = levels[lv].collect_array("r")
        np.testing.assert_allclose(got, ref, err_msg=f"level {lv}")
    assert levels[3].collect_array("r").shape == (10, 12)


def test_pyramid_feeds_focal(spark):
    """Overview tiles remain first-class: focal ops run on any level
    (aux/edge columns regenerated at merge)."""
    from mapalgebra_spark import kernels as K
    from mapalgebra_spark.operators import focal as FO

    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 50, (40, 40))
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=8)
    lvl1 = P.downsample2(tr, 8)
    got = FO.fmean(lvl1).collect_array("r")
    ref = K.k_fmean(K.pad_block(np_shrink2(arr), K.BORDER_FILL, 0))
    np.testing.assert_allclose(got, ref)


# --- upsampling (reference future work, README.md:164) ----------------------


@pytest.mark.parametrize("shape,tile", [((32, 32), 8), ((21, 13), 8), ((7, 5), 4)])
def test_upsample2_nearest_matches_oracle(spark, shape, tile):
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 100, shape)
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=tile)
    out = P.upsample2(tr, "nearest").collect_array("r")
    np.testing.assert_allclose(out, P.upsample2_nearest_np(arr))


@pytest.mark.parametrize("shape,tile", [((32, 32), 8), ((21, 13), 8), ((7, 5), 4)])
def test_upsample2_bilinear_matches_oracle(spark, shape, tile):
    """Interpolation across tile boundaries must use true neighbours
    (halo), not per-tile clamps."""
    rng = np.random.default_rng(4)
    arr = rng.uniform(0, 100, shape)
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=tile)
    out = P.upsample2(tr, "bilinear").collect_array("r")
    np.testing.assert_allclose(out, P.upsample2_bilinear_np(arr))


def test_upsample_keeps_tiles_focal_ready(spark):
    from mapalgebra_spark import kernels as K
    from mapalgebra_spark.operators import focal as FO

    rng = np.random.default_rng(5)
    arr = rng.uniform(0, 100, (12, 12))
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=4)
    up = P.upsample2(tr, "bilinear").strict(persist=True)
    got = FO.focal(up, "fmean").collect_array("r")
    full = P.upsample2_bilinear_np(arr)
    ref = K.k_fmean(K.pad_block(full, K.BORDER_FILL, 0))
    np.testing.assert_allclose(got, ref)


def test_upsample_then_downsample_identity_nearest(spark):
    rng = np.random.default_rng(6)
    arr = rng.uniform(0, 100, (16, 16))
    tr = TileRaster.from_arrays(spark, {"r": arr}, tile_size=8)
    round_trip = P.downsample2(P.upsample2(tr, "nearest"), 8).collect_array("r")
    np.testing.assert_allclose(round_trip, arr)


def test_block_stats_matches_numpy(spark):
    import math
    from mapalgebra_spark.operators.pyramid import block_stats

    rng = np.random.default_rng(9)
    a = rng.integers(0, 50, size=(37, 53)).astype(np.float64)  # ceil edges
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    for stat in ("mean", "sum", "min", "max"):
        got = block_stats(tr, 4, stat, tile_pitch=16).collect_array("r")
        H, W = math.ceil(37 / 4), math.ceil(53 / 4)
        exp = np.zeros((H, W))
        for i in range(H):
            for j in range(W):
                blk = a[i * 4 : i * 4 + 4, j * 4 : j * 4 + 4]
                exp[i, j] = dict(
                    mean=blk.mean(), sum=blk.sum(), min=blk.min(), max=blk.max()
                )[stat]
        np.testing.assert_array_equal(got, exp)


def test_block_stats_validation_and_focal_composition(spark):
    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.operators.pyramid import block_stats

    rng = np.random.default_rng(10)
    a = rng.integers(0, 9, size=(32, 32)).astype(np.float64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    with pytest.raises(ValueError):
        block_stats(tr, 3, "mean", tile_pitch=16)  # 3 does not divide 16
    with pytest.raises(ValueError):
        block_stats(tr, 4, "median", tile_pitch=16)
    # aggregated raster is focal-ready (aux strips rebuilt)
    small = block_stats(tr, 4, "max", tile_pitch=16)
    got = FO.focal(small, "fmin").collect_array("r")
    ref = a.reshape(8, 4, 8, 4).max(axis=(1, 3))
    pad = np.pad(ref, 1, mode="edge")
    exp = np.min(
        np.stack([pad[i : i + 8, j : j + 8] for i in range(3) for j in range(3)]),
        axis=0,
    )
    np.testing.assert_array_equal(got, exp)
