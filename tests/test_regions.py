"""operators/regions.clump (region labeling) vs an independent
union-find oracle — single tile, multi-tile boundary stitching, and
multi-raster id composition."""

import numpy as np
import pytest

from mapalgebra_spark.operators import regions as RG
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark


def uf_clump(a: np.ndarray) -> np.ndarray:
    """Union-find reference: label = min flat id of the 4-conn
    equal-value component."""
    h, w = a.shape
    parent = list(range(h * w))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for i in range(h):
        for j in range(w):
            if j + 1 < w and a[i, j] == a[i, j + 1]:
                union(i * w + j, i * w + j + 1)
            if i + 1 < h and a[i, j] == a[i + 1, j]:
                union(i * w + j, (i + 1) * w + j)
    return np.array([find(k) for k in range(h * w)], dtype=np.int64).reshape(h, w)


def test_label_block_matches_union_find():
    rng = np.random.default_rng(5)
    for shape in [(1, 1), (1, 7), (9, 1), (13, 17)]:
        a = rng.integers(0, 3, size=shape)
        loc = RG.label_block(a.astype(np.float64))
        assert np.array_equal(loc, uf_clump(a))


def test_label_block_snake():
    # a serpentine single component — worst case for plain propagation;
    # pointer jumping must still converge and label everything 0
    a = np.zeros((8, 8), dtype=np.int64)
    a[1, :-1] = 1
    a[3, 1:] = 1
    a[5, :-1] = 1
    loc = RG.label_block(a.astype(np.float64))
    assert np.array_equal(loc, uf_clump(a))


def _clump_df_to_array(df, h, w):
    out = np.full((h, w), -1, dtype=np.int64)
    for r in df.collect():
        out[r["gy"], r["gx"]] = r["clump"]
    return out


def test_clump_multi_tile_matches_union_find(spark):
    rng = np.random.default_rng(6)
    a = rng.integers(0, 2, size=(50, 70))  # 2 classes: big snaky regions
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    got = _clump_df_to_array(RG.clump(tr, tile_pitch=16), 50, 70)
    np.testing.assert_array_equal(got, uf_clump(a))


def test_clump_uniform_raster_is_one_region(spark):
    a = np.full((20, 30), 4, dtype=np.int64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=8)
    got = _clump_df_to_array(RG.clump(tr, tile_pitch=8), 20, 30)
    assert np.all(got == 0)


def test_clump_multi_raster_ids_do_not_collide(spark):
    # identical rasters under different ids must clump independently
    a = np.array([[1, 1, 2], [2, 1, 2]], dtype=np.int64)
    tr = TileRaster.from_arrays(spark, {"r1": a, "r2": a}, tile_size=2)
    df = RG.clump(tr, tile_pitch=2)
    exp = uf_clump(a)
    for rid in ("r1", "r2"):
        got = _clump_df_to_array(df.filter(f"raster_id = '{rid}'"), 2, 3)
        np.testing.assert_array_equal(got, exp)


def test_region_sizes(spark):
    a = np.array([[1, 1, 2], [2, 1, 2]], dtype=np.int64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=4)
    sizes = {
        r["clump"]: (r["cells"], r["val"])
        for r in RG.region_sizes(RG.clump(tr, tile_pitch=4)).collect()
    }
    # regions: {0,1,4}=1 (min id 0), {2,5}=2 (min id 2), {3}=2 (id 3)
    assert sizes == {0: (3, 1.0), 2: (2, 2.0), 3: (1, 2.0)}
