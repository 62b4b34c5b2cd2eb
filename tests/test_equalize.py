"""Library-level checks for operators/color.equalize (global histogram
equalization) against an independent numpy recomputation."""

import numpy as np
import pytest

from mapalgebra_spark.operators import color as CO
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark


def np_equalize(a: np.ndarray) -> np.ndarray:
    vals, cnts = np.unique(a, return_counts=True)
    cdf = np.cumsum(cnts)
    n, cdfmin = cdf[-1], cdf[0]
    if n == cdfmin:
        lut = np.zeros_like(cdf, dtype=np.float64)
    else:
        lut = np.floor((cdf - cdfmin) * 255.0 / (n - cdfmin))
    return lut[np.searchsorted(vals, a)]


def test_equalize_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 40, size=(70, 90)).astype(np.int64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=32)
    out = CO.equalize(tr).collect_array("r")
    np.testing.assert_array_equal(out, np_equalize(a))
    assert out.min() >= 0.0 and out.max() == 255.0


def test_equalize_constant_raster_is_zero(spark):
    a = np.full((20, 20), 7, dtype=np.int64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    out = CO.equalize(tr).collect_array("r")
    np.testing.assert_array_equal(out, np.zeros_like(a, dtype=np.float64))


def test_equalize_two_values_spread_to_extremes(spark):
    # half 3s, half 9s -> cdf(3)=cdfmin -> 0; cdf(9)=N -> 255
    a = np.zeros((10, 10), dtype=np.int64) + 3
    a[5:, :] = 9
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=8)
    out = CO.equalize(tr).collect_array("r")
    assert set(np.unique(out)) == {0.0, 255.0}
    np.testing.assert_array_equal(out[a == 3], 0.0)
    np.testing.assert_array_equal(out[a == 9], 255.0)


def test_equalize_output_feeds_focal(spark):
    # the remap rebuilds aux strips, so the output is halo-ready
    from mapalgebra_spark.operators import focal as FO

    rng = np.random.default_rng(4)
    a = rng.integers(0, 20, size=(40, 40)).astype(np.int64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    eq = CO.equalize(tr)
    got = FO.focal(eq, "fmax").collect_array("r")
    ref = np_equalize(a)
    pad = np.pad(ref, 1, mode="edge")
    exp = np.max(
        np.stack([pad[i : i + 40, j : j + 40] for i in range(3) for j in range(3)]),
        axis=0,
    )
    np.testing.assert_array_equal(got, exp)
