"""D8 flow direction / accumulation vs a brute-force per-cell walker."""

import numpy as np
import pytest

from mapalgebra_spark import kernels as K
from mapalgebra_spark.operators import hydro as HY
from mapalgebra_spark.raster import TileRaster

pytestmark = pytest.mark.spark


def brute_d8(a: np.ndarray) -> np.ndarray:
    """Per-cell steepest-descent neighbour (slope = drop/dist, exact
    squared-key comparison), -1 for pits/flats. Returns parent flat id."""
    h, w = a.shape
    par = -np.ones((h, w), dtype=np.int64)
    for i in range(h):
        for j in range(w):
            best_key, best = -1.0, -1
            for o, (dy, dx) in enumerate(K.D8_OFFSETS):
                y, x = i + dy, j + dx
                if not (0 <= y < h and 0 <= x < w):
                    continue
                drop = a[i, j] - a[y, x]
                if drop <= 0:
                    continue
                key = drop * drop * (2.0 if dy == 0 or dx == 0 else 1.0)
                if key > best_key:
                    best_key, best = key, y * w + x
            par[i, j] = best
    return par


def brute_acc(par: np.ndarray) -> np.ndarray:
    h, w = par.shape
    acc = np.ones(h * w, dtype=np.int64)
    p = par.ravel()
    for s in range(h * w):
        cur = p[s]
        while cur >= 0:
            acc[cur] += 1
            cur = p[cur]
    return acc.reshape(h, w)


def brute_basin(par: np.ndarray) -> np.ndarray:
    h, w = par.shape
    p = par.ravel()
    out = np.empty(h * w, dtype=np.int64)
    for s in range(h * w):
        cur = s
        while p[cur] >= 0:
            cur = p[cur]
        out[s] = cur
    return out.reshape(h, w)


def _acc_array(spark, a, tile):
    tr = TileRaster.from_arrays(spark, {"r": a.astype(np.float64)}, tile_size=tile)
    out = np.full(a.shape, -1, dtype=np.int64)
    for r in HY.flow_accumulation(tr, tile_pitch=tile).collect():
        out[r["gy"], r["gx"]] = r["acc"]
    return out


def test_flowdir_kernel_matches_brute():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 50, size=(11, 13)).astype(np.float64)
    pad = np.pad(a, 1, mode="constant", constant_values=np.inf)
    codes = K.k_flowdir(pad).astype(np.int64)
    par = brute_d8(a)
    h, w = a.shape
    for i in range(h):
        for j in range(w):
            if par[i, j] < 0:
                assert codes[i, j] == -1
            else:
                dy, dx = K.D8_OFFSETS[codes[i, j]]
                assert (i + dy) * w + (j + dx) == par[i, j]


def test_flow_accumulation_and_basin_match_brute(spark):
    rng = np.random.default_rng(13)
    a = rng.integers(0, 50, size=(30, 40)).astype(np.float64)
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=16)
    acc = np.full(a.shape, -1, dtype=np.int64)
    basin = np.full(a.shape, -1, dtype=np.int64)
    for r in HY.flow_analysis(tr, tile_pitch=16).collect():
        acc[r["gy"], r["gx"]] = r["acc"]
        basin[r["gy"], r["gx"]] = r["basin"]
    par = brute_d8(a)
    np.testing.assert_array_equal(acc, brute_acc(par))
    np.testing.assert_array_equal(basin, brute_basin(par))


def test_flow_accumulation_ramp_concentrates(spark):
    # plane z = x + y drains everything toward the NW corner cell
    i = np.arange(8, dtype=np.float64)
    a = i[None, :] + i[:, None]
    got = _acc_array(spark, a, tile=4)
    assert got[0, 0] == a.size  # whole raster drains through the corner
    assert got[-1, -1] == 1  # the summit receives nothing


def test_flat_raster_is_all_pits(spark):
    a = np.full((6, 6), 5.0)
    got = _acc_array(spark, a, tile=4)
    np.testing.assert_array_equal(got, np.ones((6, 6), dtype=np.int64))


def test_stream_network_threshold_and_chaining(spark):
    # ramp z = x + y: acc concentrates along the top row / left column
    # toward (0,0); thresholding keeps only high-acc links and every
    # segment's target is itself a stream cell or the outlet
    i = np.arange(8, dtype=np.float64)
    a = i[None, :] + i[:, None]
    tr = TileRaster.from_arrays(spark, {"r": a}, tile_size=4)
    fa = HY.flow_analysis(tr, tile_pitch=4)
    segs = HY.stream_network(fa, threshold=8).collect()
    assert len(segs) > 0
    acc = {(r["gy"], r["gx"]): r["acc"] for r in fa.collect()}
    for s in segs:
        assert s["acc"] >= 8
        assert acc[(s["gy"], s["gx"])] == s["acc"]
        # downhill: strictly decreasing elevation along each segment
        assert a[s["gy2"], s["gx2"]] < a[s["gy"], s["gx"]]
        # target accumulates at least as much as the source
        assert acc[(s["gy2"], s["gx2"])] >= s["acc"]
