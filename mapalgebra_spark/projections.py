"""Projections (CRS) — implements the reference's declared-but-pending
surface.

The reference types ``Point p`` with a ``Projection`` class
(``toSphere`` / ``fromSphere``, ``reproject = fromSphere . toSphere``,
MapAlgebra.hs:329-339) but only ``Sphere`` has an instance; ``LatLng``
and ``WebMercator`` are declared with their instances commented out
(MapAlgebra.hs:350-361, README.md:128 "Projection handling ... pending").
This module supplies those instances for the engine:

- ``Sphere``      — radians on a perfect sphere (the reference's hub
                    representation), coordinates (x=λ, y=φ).
- ``LatLng``      — EPSG:4326-style degrees, (x=lng, y=lat).
- ``WebMercator`` — EPSG:3857 spherical-mercator meters.

Two implementations, same math:

- numpy (``*_np``) for tile/test code, and
- **Spark Column expressions** (``to_sphere_cols``/``from_sphere_cols``/
  ``reproject_cols``) that stay JVM-side inside whole-stage codegen —
  the scale path: reprojecting 10^12 points is a pure projection stage,
  no shuffle, no Python.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: spherical-mercator radius (EPSG:3857 semi-major axis), meters
R_MERCATOR = 6378137.0

SPHERE, LATLNG, WEBMERCATOR = "sphere", "latlng", "webmercator"
_PROJECTIONS = (SPHERE, LATLNG, WEBMERCATOR)


# --- numpy instances (toSphere / fromSphere per projection) -----------------


def to_sphere_np(proj: str, x, y):
    """(x, y) in ``proj`` → (λ, φ) radians on the sphere."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if proj == SPHERE:
        return x, y
    if proj == LATLNG:
        return np.radians(x), np.radians(y)
    if proj == WEBMERCATOR:
        lam = x / R_MERCATOR
        phi = 2.0 * np.arctan(np.exp(y / R_MERCATOR)) - math.pi / 2.0
        return lam, phi
    raise ValueError(f"unknown projection {proj!r}")


def from_sphere_np(proj: str, lam, phi):
    """(λ, φ) radians on the sphere → (x, y) in ``proj``."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if proj == SPHERE:
        return lam, phi
    if proj == LATLNG:
        return np.degrees(lam), np.degrees(phi)
    if proj == WEBMERCATOR:
        x = R_MERCATOR * lam
        y = R_MERCATOR * np.log(np.tan(math.pi / 4.0 + phi / 2.0))
        return x, y
    raise ValueError(f"unknown projection {proj!r}")


def reproject_np(src: str, dst: str, x, y):
    """``reproject = fromSphere . toSphere`` (MapAlgebra.hs:337-339)."""
    return from_sphere_np(dst, *to_sphere_np(src, x, y))


# --- Spark Column instances (JVM-side, codegen-friendly) ---------------------


def to_sphere_cols(proj: str, x: Column, y: Column) -> tuple[Column, Column]:
    if proj == SPHERE:
        return x, y
    if proj == LATLNG:
        return F.radians(x), F.radians(y)
    if proj == WEBMERCATOR:
        return x / F.lit(R_MERCATOR), (
            2.0 * F.atan(F.exp(y / F.lit(R_MERCATOR))) - F.lit(math.pi / 2.0)
        )
    raise ValueError(f"unknown projection {proj!r}")


def from_sphere_cols(proj: str, lam: Column, phi: Column) -> tuple[Column, Column]:
    if proj == SPHERE:
        return lam, phi
    if proj == LATLNG:
        return F.degrees(lam), F.degrees(phi)
    if proj == WEBMERCATOR:
        return F.lit(R_MERCATOR) * lam, F.lit(R_MERCATOR) * F.log(
            F.tan(F.lit(math.pi / 4.0) + phi / 2.0)
        )
    raise ValueError(f"unknown projection {proj!r}")


def reproject_cols(src: str, dst: str, x: Column, y: Column) -> tuple[Column, Column]:
    return from_sphere_cols(dst, *to_sphere_cols(src, x, y))


def reproject_points(
    df: DataFrame, src: str, dst: str,
    x_col: str = "x", y_col: str = "y",
    out_x: str = "x", out_y: str = "y",
) -> DataFrame:
    """Reproject a point table between CRSs as one narrow projection
    stage (no shuffle; survives whole-stage codegen — assert-tested)."""
    nx, ny = reproject_cols(src, dst, F.col(x_col), F.col(y_col))
    others = [c for c in df.columns if c not in (x_col, y_col)]
    return df.select(*others, nx.alias(out_x), ny.alias(out_y))
