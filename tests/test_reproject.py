"""Raster reprojection (reference future work README.md:161): the tiled
distributed gather must equal the pure full-array oracle bit-for-bit,
and identity reprojection must reproduce the source exactly."""

import math

import numpy as np
import pytest

from mapalgebra_spark import projections as PJ
from mapalgebra_spark.operators import reproject as RP
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark

RNG = np.random.default_rng(33)
SRC = (RNG.normal(size=(48, 56)) * 20 + 100).round(2)
SRC_BOUNDS = (-20.0, -10.0, 20.0, 30.0)  # lng/lat box (x0, y0, x1, y1)


def merc(lng, lat):
    x, y = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, lng, lat)
    return float(x), float(y)


def dst_bounds_merc():
    x0, y0 = merc(SRC_BOUNDS[0], SRC_BOUNDS[1])
    x1, y1 = merc(SRC_BOUNDS[2], SRC_BOUNDS[3])
    return (x0, y0, x1, y1)


def test_identity_reprojection_is_exact(spark):
    tr = TileRaster.from_arrays(spark, {"r": SRC}, tile_size=16)
    out = RP.reproject_raster(
        spark, tr, PJ.LATLNG, PJ.LATLNG, SRC_BOUNDS, SRC_BOUNDS,
        SRC.shape[0], SRC.shape[1], tile_size=16, tile_pitch=16,
    )
    got = out.collect_array("r@latlng")
    # pixel centers land at integer coords ± float error, so bilinear
    # blends ~1e-14 of the neighbour — near-exact, not bit-exact
    np.testing.assert_allclose(got, SRC, rtol=1e-12)


@pytest.mark.parametrize("dst_h,dst_w,tile", [(40, 50, 16), (70, 30, 16), (25, 25, 8)])
def test_latlng_to_webmercator_matches_oracle(spark, dst_h, dst_w, tile):
    tr = TileRaster.from_arrays(spark, {"r": SRC}, tile_size=tile)
    db = dst_bounds_merc()
    out = RP.reproject_raster(
        spark, tr, PJ.LATLNG, PJ.WEBMERCATOR, SRC_BOUNDS, db,
        dst_h, dst_w, tile_size=tile, tile_pitch=tile,
    )
    got = out.collect_array("r@webmercator")
    ref = RP.reproject_raster_np(SRC, PJ.LATLNG, PJ.WEBMERCATOR, SRC_BOUNDS, db, dst_h, dst_w)
    assert got.shape == (dst_h, dst_w)
    np.testing.assert_array_equal(got, ref)


def test_roundtrip_close_on_smooth_data(spark):
    """latlng → mercator → latlng on smooth data stays close (two
    bilinear resamplings), proving the geo-transform orientation."""
    yy, xx = np.mgrid[0:48, 0:56].astype(np.float64)
    smooth = 50 + 30 * np.sin(yy / 9.0) + 20 * np.cos(xx / 11.0)
    tr = TileRaster.from_arrays(spark, {"s": smooth}, tile_size=16)
    db = dst_bounds_merc()
    fwd = RP.reproject_raster(
        spark, tr, PJ.LATLNG, PJ.WEBMERCATOR, SRC_BOUNDS, db, 96, 112,
        tile_size=16, tile_pitch=16,
    ).strict(persist=True)
    back = RP.reproject_raster(
        spark, fwd, PJ.WEBMERCATOR, PJ.LATLNG, db, SRC_BOUNDS, 48, 56,
        tile_size=16, tile_pitch=16,
    )
    got = back.collect_array("s@webmercator@latlng")
    # interior cells (mercator stretch is worst at the top edge)
    err = np.abs(got - smooth)[4:-4, 4:-4]
    assert err.max() < 1.0, err.max()


def test_output_tiles_are_focal_ready(spark):
    from mapalgebra_spark import kernels as K
    from mapalgebra_spark.operators import focal as FO

    tr = TileRaster.from_arrays(spark, {"r": SRC}, tile_size=16)
    db = dst_bounds_merc()
    out = RP.reproject_raster(
        spark, tr, PJ.LATLNG, PJ.WEBMERCATOR, SRC_BOUNDS, db, 40, 50,
        tile_size=16, tile_pitch=16,
    ).strict(persist=True)
    got = FO.focal(out, "fmean").collect_array("r@webmercator")
    full = RP.reproject_raster_np(SRC, PJ.LATLNG, PJ.WEBMERCATOR, SRC_BOUNDS, db, 40, 50)
    ref = K.k_fmean(K.pad_block(full, K.BORDER_FILL, 0))
    np.testing.assert_allclose(got, ref, atol=1e-12)
