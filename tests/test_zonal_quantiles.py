"""zonal.zonal_quantiles (census-derived exact quantiles) vs
numpy.quantile (linear interpolation — the same type-7 convention)."""

import numpy as np
import pytest

from mapalgebra_spark.operators.zonal import zonal_census, zonal_quantiles
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark


def _got(spark, vals, zones, probs):
    tv = TileRaster.from_arrays(spark, {"r": vals}, tile_size=8)
    tz = TileRaster.from_arrays(spark, {"r": zones}, tile_size=8)
    out = zonal_quantiles(zonal_census(tv, tz), probs)
    return {r["zone"]: [r[f"q{round(p*100)}"] for p in probs] for r in out.collect()}


def test_zonal_quantiles_match_numpy(spark):
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 30, size=(20, 24)).astype(np.float64)
    zones = rng.integers(0, 5, size=(20, 24)).astype(np.int64)
    probs = [0.25, 0.5, 0.75]
    got = _got(spark, vals, zones, probs)
    for z in np.unique(zones):
        exp = np.quantile(vals[zones == z], probs)  # linear = type 7
        np.testing.assert_allclose(got[int(z)], exp, rtol=0, atol=0)


def test_zonal_quantiles_single_value_zone(spark):
    vals = np.full((4, 4), 7.0)
    zones = np.zeros((4, 4), dtype=np.int64)
    got = _got(spark, vals, zones, [0.25, 0.5, 0.75])
    assert got[0] == [7.0, 7.0, 7.0]


def test_zonal_quantiles_even_and_odd_counts(spark):
    # zone 0: [1,2,3,4] -> median 2.5; zone 1: [10,20,30] -> median 20
    vals = np.array([[1.0, 2.0, 3.0, 4.0], [10.0, 20.0, 30.0, 30.0]])
    zones = np.array([[0, 0, 0, 0], [1, 1, 1, 2]], dtype=np.int64)
    got = _got(spark, vals, zones, [0.5])
    assert got[0] == [2.5]
    assert got[1] == [20.0]
    assert got[2] == [30.0]
