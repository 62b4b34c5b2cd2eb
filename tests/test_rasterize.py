"""Vector→raster rasterization + pixel-resolution zonal by polygons,
checked against direct numpy masking (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest

from mapalgebra_spark import cellindex as CI
from mapalgebra_spark import spatial as SP
from mapalgebra_spark.operators import zonal as Z
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark

BOUNDS = (0.0, 10.0, 0.0, 10.0)  # lat_min, lat_max, lng_min, lng_max
H, W = 50, 60


def _polys(spark):
    rows = [
        {"poly_id": "tri", "ring_lat": [1.0, 1.0, 8.0], "ring_lng": [1.0, 8.0, 1.0]},
        {"poly_id": "box", "ring_lat": [5.5, 5.5, 9.5, 9.5], "ring_lng": [5.5, 9.5, 9.5, 5.5]},
    ]
    return spark.createDataFrame(pd.DataFrame(rows)), rows


def _expected_zone(rows):
    yy, xx = np.mgrid[0:H, 0:W]
    plat = BOUNDS[1] - (yy + 0.5) / H * (BOUNDS[1] - BOUNDS[0])
    plng = BOUNDS[2] + (xx + 0.5) / W * (BOUNDS[3] - BOUNDS[2])
    zone = np.full((H, W), -1, dtype=np.int64)
    for zid, row in enumerate(rows):
        inside = CI.point_in_polygon(
            plat.ravel(), plng.ravel(), row["ring_lat"], row["ring_lng"]
        ).reshape(H, W)
        zone[inside] = zid
    return zone


def test_rasterize_matches_numpy(spark):
    polys, rows = _polys(spark)
    zr = SP.rasterize_polygons(spark, polys, "z", H, W, BOUNDS, tile_size=16)
    got = zr.collect_array("z")
    np.testing.assert_array_equal(got, _expected_zone(rows))


def test_zonal_by_rasterized_polygons(spark):
    polys, rows = _polys(spark)
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, (H, W))
    v = TileRaster.from_arrays(spark, {"z": vals}, tile_size=16)
    zr = SP.rasterize_polygons(spark, polys, "z", H, W, BOUNDS, tile_size=16)
    out = {r["zone"]: r for r in Z.zonal_stats(v, zr).collect()}
    zone = _expected_zone(rows)
    for zid in (-1, 0, 1):
        sel = vals[zone == zid]
        assert out[zid]["zcount"] == sel.size
        assert out[zid]["zsum"] == pytest.approx(sel.sum())
        assert out[zid]["zmin"] == pytest.approx(sel.min())
        assert out[zid]["zmax"] == pytest.approx(sel.max())


def test_convex_polygon_margins():
    """No pixel center may sit near an edge LINE of the convex-zonal
    query polygons at any shipped grid size — the guarantee that the
    engine's ray-cast and the oracle's half-plane signs agree on every
    center (queries._CONVEX_TRI/_CONVEX_QUAD docstring)."""
    import duckdb

    from mapalgebra_spark.queries import _CONVEX_QUAD, _CONVEX_TRI

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.query(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/lineitem.parquet'"
        ).fetchone()[0]
        G = int(np.floor(np.sqrt(n)))
        ii = np.arange(G) + 0.5
        px, py = np.meshgrid(ii, ii)        # pixel centers in both axes
        min_d = np.inf
        for verts in (_CONVEX_TRI, _CONVEX_QUAD):
            m = len(verts)
            for i in range(m):
                ax, ay = verts[i][0] * G + 0.25, verts[i][1] * G + 0.25
                bx, by = (
                    verts[(i + 1) % m][0] * G + 0.25,
                    verts[(i + 1) % m][1] * G + 0.25,
                )
                cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                d = np.abs(cross) / np.hypot(bx - ax, by - ay)
                min_d = min(min_d, d.min())
        # expected min center-to-line distance scales ~1/G (~1.3e-3 at
        # G=774); the searched vertices give >= 3e-4 everywhere.  The
        # 1e-5 gate is ~100x float64 cross-product error at G^2 scale —
        # ample for sign agreement, loose enough not to over-pin.
        assert min_d > 1e-5, (sf, G, min_d)


def test_convexity_and_ccw_of_query_polygons():
    from mapalgebra_spark.queries import _CONVEX_QUAD, _CONVEX_TRI

    for verts in (_CONVEX_TRI, _CONVEX_QUAD):
        m = len(verts)
        for i in range(m):
            ax, ay = verts[i]
            bx, by = verts[(i + 1) % m]
            cx, cy = verts[(i + 2) % m]
            cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            assert cross > 0, (verts, i)  # strictly convex, CCW


def test_rasterize_10k_polygons_distributed(spark):
    """r4 verdict item 2: the rasterize path must hold a 10k-polygon
    layer with NO driver-side geometry collect.  10,000 disjoint 8x8-px
    squares (edges at .25 offsets so no pixel center ties an edge) burn
    into a 1024x1024 raster; every zone must cover exactly 64 pixels
    and the center pixel of square k must carry zone k."""
    G = 1024
    n_side = 100  # 100x100 squares, 10.24-px pitch
    pitch = G / n_side
    ids = np.arange(n_side * n_side)
    gy = ids // n_side
    gx = ids % n_side
    y0 = gy * pitch + 0.25
    x0 = gx * pitch + 0.25
    # ring in lat/lng == pixel coords (bounds 0..G at G px)
    ring_lat = [[float(a), float(a), float(a + 8), float(a + 8)] for a in y0]
    ring_lng = [[float(b), float(b + 8), float(b + 8), float(b)] for b in x0]
    # rasters index lat from the TOP: lat = G - row, so a square at
    # lat [a, a+8] covers rows [G-a-8, G-a]
    polys = spark.createDataFrame(
        pd.DataFrame({"ring_lat": ring_lat, "ring_lng": ring_lng})
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    z = SP.rasterize_polygons(
        spark, polys, "z10k", G, G, (0.0, float(G), 0.0, float(G)),
        nodata=-1, tile_size=256,
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "rasterize_polygons ran a driver job during plan build"
    zone = z.collect_array("z10k").astype(np.int64)
    assert zone.shape == (G, G)
    counts = np.bincount(zone[zone >= 0], minlength=len(ids))
    assert counts.shape[0] == len(ids)
    np.testing.assert_array_equal(counts, np.full(len(ids), 64))
    # center pixel of each square carries its own zone id (vectorized)
    cy = np.floor(G - (y0 + 4.0)).astype(int)
    cx = np.floor(x0 + 4.0).astype(int)
    np.testing.assert_array_equal(zone[cy, cx], ids)
