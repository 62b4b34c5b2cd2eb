"""Brute-force oracles for the gdaldem Horn-gradient pair
(kernels.k_fslope / k_fhillshade) — independent per-pixel recomputation
over np.pad'ed rasters, plus analytic spot checks."""

import math

import numpy as np

from mapalgebra_spark import kernels as K


def _pad(a):
    # Continue border (mirror, edge not repeated) like the focal engine
    return np.pad(a, 1, mode="reflect")


def _horn_brute(a):
    h, w = a.shape
    p = _pad(a).astype(np.float64)
    sx = np.empty((h, w))
    sy = np.empty((h, w))
    for i in range(h):
        for j in range(w):
            win = p[i : i + 3, j : j + 3]
            sx[i, j] = (win[0, 2] + 2 * win[1, 2] + win[2, 2]) - (
                win[0, 0] + 2 * win[1, 0] + win[2, 0]
            )
            sy[i, j] = (win[2, 0] + 2 * win[2, 1] + win[2, 2]) - (
                win[0, 0] + 2 * win[0, 1] + win[0, 2]
            )
    return sx, sy


def test_fslope_matches_bruteforce():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 51, size=(17, 13)).astype(np.float64)
    got = K.k_fslope(_pad(a))
    sx, sy = _horn_brute(a)
    exp = 12.5 * np.sqrt(sx * sx + sy * sy)
    np.testing.assert_array_equal(got, exp)


def test_fslope_flat_is_zero_and_ramp_is_exact():
    assert np.all(K.k_fslope(_pad(np.full((5, 5), 9.0))) == 0.0)
    # plane z = x: gx = 1 everywhere (Horn is exact on planes away from
    # mirrored borders), slope% = 100
    a = np.tile(np.arange(8, dtype=np.float64), (8, 1))
    s = K.k_fslope(_pad(a))
    np.testing.assert_allclose(s[1:-1, 1:-1], 100.0)


def test_fhillshade_matches_bruteforce():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 51, size=(15, 19)).astype(np.float64)
    got = K.k_fhillshade(_pad(a))
    sx, sy = _horn_brute(a)
    gx, gy = sx / 8.0, sy / 8.0
    num = K.HS_SIN_ALT - (gx * K.HS_CA_SIN_AZ - gy * K.HS_CA_COS_AZ)
    cang = num / np.sqrt(1.0 + (gx * gx + gy * gy))
    exp = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    np.testing.assert_array_equal(got, exp)
    assert got.min() >= 1.0 and got.max() <= 255.0


def test_fhillshade_flat_and_orientation():
    # flat ground: cang = sin(alt) -> 1 + 254*sin(45 deg)
    flat = K.k_fhillshade(_pad(np.full((5, 5), 3.0)))
    np.testing.assert_allclose(flat, 1.0 + 254.0 * math.sin(math.radians(45.0)))
    # a surface RISING toward the south-east faces north-west — toward
    # the azimuth-315 sun — and must be brighter than its mirror (which
    # faces away and clamps to the 1.0 shadow floor)
    i = np.arange(9, dtype=np.float64)
    se_up = i[None, :] + i[:, None]  # rises toward south-east
    nw_face = K.k_fhillshade(_pad(se_up))[2:-2, 2:-2]
    se_face = K.k_fhillshade(_pad(-se_up))[2:-2, 2:-2]
    assert np.all(nw_face > se_face)
    assert np.all(se_face == 1.0)


def test_fstddev_is_sqrt_of_variance():
    rng = np.random.default_rng(21)
    a = rng.integers(0, 9, size=(10, 14)).astype(np.float64)
    p = np.pad(a, 1, mode="reflect")
    np.testing.assert_array_equal(K.k_fstddev(p), np.sqrt(K.k_fvariance(p)))
    # flat window -> 0
    assert np.all(K.k_fstddev(np.pad(np.full((5, 5), 3.0), 1, "reflect")) == 0.0)


def test_morphology_opening_removes_isolated_pixels(spark):
    """Erode-then-dilate kills single-pixel speckle but preserves a
    solid 3x3 block — the defining property of opening."""
    from mapalgebra_spark.operators import focal as FO
    from mapalgebra_spark.raster import TileRaster

    a = np.zeros((12, 12))
    a[2, 2] = 1.0          # isolated speckle: must vanish
    a[6:9, 6:9] = 1.0      # solid 3x3 block: must survive intact
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=6)
    er = FO.focal(tr, "fmin").strict()
    opened = FO.focal(er, "fmax").collect_array("r")
    assert opened[2, 2] == 0.0
    np.testing.assert_array_equal(opened[6:9, 6:9], np.ones((3, 3)))
    assert opened.sum() == 9.0
