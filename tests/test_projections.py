"""Projections (the reference's pending LatLng/WebMercator instances,
MapAlgebra.hs:350-361) — known anchors, round-trips, numpy==Spark."""

import math

import numpy as np
import pytest

from mapalgebra_spark import projections as PJ

pytestmark = pytest.mark.spark


def test_webmercator_anchors():
    # equator/prime meridian → origin
    x, y = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, 0.0, 0.0)
    assert abs(x) < 1e-9 and abs(y) < 1e-9
    # 180°E → earth half-circumference
    x, _ = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, 180.0, 0.0)
    np.testing.assert_allclose(x, math.pi * PJ.R_MERCATOR)
    # web-mercator square: y(±85.051128...) == ±x(180)
    _, y = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, 0.0, 85.05112877980659)
    np.testing.assert_allclose(y, math.pi * PJ.R_MERCATOR, rtol=1e-12)
    # 45°N classic value
    _, y45 = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, 0.0, 45.0)
    np.testing.assert_allclose(y45, 5621521.486192, atol=1e-5)


def test_sphere_is_identity_hub():
    lam, phi = PJ.to_sphere_np(PJ.LATLNG, 12.5, -33.0)
    np.testing.assert_allclose([lam, phi], [math.radians(12.5), math.radians(-33.0)])
    assert PJ.to_sphere_np(PJ.SPHERE, 1.0, 2.0) == (1.0, 2.0)


@pytest.mark.parametrize("src,dst", [
    (PJ.LATLNG, PJ.WEBMERCATOR),
    (PJ.WEBMERCATOR, PJ.LATLNG),
    (PJ.LATLNG, PJ.SPHERE),
    (PJ.SPHERE, PJ.WEBMERCATOR),
])
def test_roundtrip_np(src, dst):
    rng = np.random.default_rng(11)
    lng = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-84, 84, 50)
    x, y = PJ.reproject_np(PJ.LATLNG, src, lng, lat)
    x2, y2 = PJ.reproject_np(src, dst, x, y)
    x3, y3 = PJ.reproject_np(dst, src, x2, y2)
    np.testing.assert_allclose(x3, x, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(y3, y, rtol=1e-12, atol=1e-9)


def test_spark_cols_match_numpy_and_stay_codegen(spark):
    rng = np.random.default_rng(12)
    lng = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    df = spark.createDataFrame(
        [(i, float(lng[i]), float(lat[i])) for i in range(200)],
        "id long, x double, y double",
    )
    out = PJ.reproject_points(df, PJ.LATLNG, PJ.WEBMERCATOR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure projection stage
    pdf = out.orderBy("id").toPandas()
    ex, ey = PJ.reproject_np(PJ.LATLNG, PJ.WEBMERCATOR, lng, lat)
    np.testing.assert_allclose(pdf["x"].to_numpy(), ex, rtol=1e-12)
    np.testing.assert_allclose(pdf["y"].to_numpy(), ey, rtol=1e-12)


def test_unknown_projection_fails_fast():
    with pytest.raises(ValueError):
        PJ.to_sphere_np("utm", 0, 0)
