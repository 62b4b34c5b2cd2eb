"""From-scratch hierarchical spatial cell index (H3/S2-style), pure numpy.

The reference library's projection system is typed but inert
(MapAlgebra.hs:350-361 — only ``Sphere`` has an instance), so this layer
is new surface mandated by BASELINE.json ``north_rule`` (H3/S2 index,
point-in-polygon, kNN).  Design goals mirror what H3/S2 give Spark jobs:

- a 64-bit integer key with the *level in the top bits* and a Morton
  (Z-order) interleave of the equirectangular (x, y) grid coordinates
  below, so that **prefix ranges = spatial containment** (a parent cell's
  children form one contiguous id range at each finer level),
- O(1) neighbour arithmetic (ring expansion for kNN),
- good shuffle-key locality (Z-order keeps nearby cells numerically
  close, which keeps range-partition pruning effective).

Layout of a cell id (non-negative int64):

    bits 58..62  level L   (0..29)
    bits  0..57  morton(x, y) at 2^L x 2^L resolution, x = lon bucket,
                 y = lat bucket, bit-interleaved x even / y odd.

All encode/decode functions are vectorized numpy and are also exposed to
Spark via pandas UDFs in ``operators/spatial.py``.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so there is a 0 bit between each."""
    x = v.astype(np.uint64)
    x &= np.uint64(0x1FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def xy_to_cell(x, y, level: int) -> np.ndarray:
    """Grid coords (x=lon bucket, y=lat bucket) at ``level`` → cell id."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    m = _part1by1(x) | (_part1by1(y) << np.uint64(1))
    out = (np.uint64(level) << np.uint64(58)) | m
    return out.astype(np.int64)


def cell_to_xy(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (x, y, level)."""
    c = np.asarray(cell).astype(np.uint64)
    level = (c >> np.uint64(58)).astype(np.int64)
    m = c & np.uint64((1 << 58) - 1)
    x = _compact1by1(m).astype(np.int64)
    y = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return x, y, level


def latlng_to_cell(lat, lng, level: int) -> np.ndarray:
    """(lat, lng) degrees → cell id at ``level`` (equirectangular grid)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = np.int64(1) << np.int64(level)
    x = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    x = np.clip(x, 0, int(n) - 1)
    y = np.clip(y, 0, int(n) - 1)
    return xy_to_cell(x, y, level)


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """cell id → (lat, lng) of the cell center, degrees."""
    x, y, level = cell_to_xy(cell)
    n = (np.int64(1) << level).astype(np.float64)
    lng = (x + 0.5) / n * 360.0 - 180.0
    lat = (y + 0.5) / n * 180.0 - 90.0
    return lat, lng


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (lat_min, lat_max, lng_min, lng_max)."""
    x, y, level = cell_to_xy(cell)
    n = (np.int64(1) << level).astype(np.float64)
    lng0 = x / n * 360.0 - 180.0
    lat0 = y / n * 180.0 - 90.0
    return lat0, lat0 + 180.0 / n, lng0, lng0 + 360.0 / n


def cell_parent(cell, parent_level: int) -> np.ndarray:
    x, y, level = cell_to_xy(cell)
    shift = level - parent_level
    if np.any(shift < 0):
        raise ValueError("parent_level coarser than cell level required")
    return xy_to_cell(x >> shift, y >> shift, parent_level)


def cell_children(cell: int) -> np.ndarray:
    """The 4 children of one cell at level+1."""
    x, y, level = cell_to_xy(np.asarray([cell]))
    lv = int(level[0]) + 1
    if lv > MAX_LEVEL:
        raise ValueError("max level exceeded")
    cx = np.array([2 * x[0], 2 * x[0] + 1, 2 * x[0], 2 * x[0] + 1])
    cy = np.array([2 * y[0], 2 * y[0], 2 * y[0] + 1, 2 * y[0] + 1])
    return xy_to_cell(cx, cy, lv)


def cell_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 disk),
    longitude wrapping, latitude clamped (polar rows drop out of range).
    Used for kNN ring expansion."""
    x, y, level = cell_to_xy(np.asarray([cell]))
    lv = int(level[0])
    n = 1 << lv
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x[0] + dx.ravel()) % n
    ys = y[0] + dy.ravel()
    ok = (ys >= 0) & (ys < n)
    return np.unique(xy_to_cell(xs[ok], ys[ok], lv))


# ---------------------------------------------------------------------------
# geometry: point-in-polygon + haversine (for kNN / zonal joins)
# ---------------------------------------------------------------------------


def point_in_polygon(lat, lng, ring_lat, ring_lng) -> np.ndarray:
    """Vectorized ray casting: are points (lat, lng) inside the polygon
    whose vertices are (ring_lat, ring_lng)? Edges on the ray count per
    the standard crossing rule (half-open edges)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    ry = np.asarray(ring_lat, dtype=np.float64)
    rx = np.asarray(ring_lng, dtype=np.float64)
    n = len(ry)
    inside = np.zeros(lat.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        yi, xi = ry[i], rx[i]
        yj, xj = ry[j], rx[j]
        cond = (yi > lat) != (yj > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= cond & (lng < xcross)
        j = i
    return inside


EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Great-circle distance in km, vectorized."""
    p1 = np.radians(np.asarray(lat1, np.float64))
    p2 = np.radians(np.asarray(lat2, np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lng2, np.float64)) - np.radians(np.asarray(lng1, np.float64))
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def cover_polygon(ring_lat, ring_lng, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Cells at ``level`` covering a polygon.

    Returns (full_cells, boundary_cells): cells whose 4 corners are all
    inside (rows there need no exact PIP test at join time) and cells
    that intersect the polygon's bbox ring otherwise (candidates that
    need the exact test). Conservative and deterministic.
    """
    ry = np.asarray(ring_lat, np.float64)
    rx = np.asarray(ring_lng, np.float64)
    n = 1 << level
    x0 = int(np.floor((rx.min() + 180.0) / 360.0 * n))
    x1 = int(np.floor((rx.max() + 180.0) / 360.0 * n))
    y0 = int(np.floor((ry.min() + 90.0) / 180.0 * n))
    y1 = int(np.floor((ry.max() + 90.0) / 180.0 * n))
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    xs = np.clip(xs.ravel(), 0, n - 1)
    ys = np.clip(ys.ravel(), 0, n - 1)
    cells = xy_to_cell(xs, ys, level)
    lat0, lat1, lng0, lng1 = cell_bounds(cells)
    corners_in = np.ones(len(cells), dtype=bool)
    any_in = np.zeros(len(cells), dtype=bool)
    for clat, clng in ((lat0, lng0), (lat0, lng1), (lat1, lng0), (lat1, lng1)):
        isin = point_in_polygon(clat, clng, ry, rx)
        corners_in &= isin
        any_in |= isin
    # also keep cells containing a polygon vertex
    vert_cells = latlng_to_cell(ry, rx, level)
    has_vertex = np.isin(cells, vert_cells)
    full = cells[corners_in]
    boundary = cells[(~corners_in) & (any_in | has_vertex)]
    return np.unique(full), np.unique(boundary)
