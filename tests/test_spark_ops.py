"""Spark-level correctness: the distributed engine must equal the pure
numpy reference (which itself equals the Haskell goldens — see
test_kernels.py) on multi-tile rasters, i.e. across halo boundaries.

Every golden from FIXTURES.md §2 is run both single-tile and split at
2x2/3x3 tile boundaries (the "strided focal-op correctness tests on
boundary tiles" demanded by BASELINE.json north_star)."""

import numpy as np
import pytest

from mapalgebra_spark import kernels as K
from mapalgebra_spark import raster as R
from mapalgebra_spark.operators import focal as FO

pytestmark = pytest.mark.spark


def make_tr(spark, arr, tile_size, rid="r0"):
    return R.TileRaster.from_arrays(spark, {rid: np.asarray(arr)}, tile_size=tile_size)


def ref_focal(arr, op):
    spec = FO.FOCAL_OPS[op]
    a = np.asarray(arr)
    if spec.cast:
        a = a.astype(np.dtype(spec.cast))
    return spec.kernel(K.pad_block(a, spec.mode, spec.fill))


RNG = np.random.default_rng(42)
TERRAIN = (RNG.normal(size=(19, 23)) * 10 + 100).round(1)
INTS = RNG.integers(0, 5, size=(19, 23)).astype(np.int64)

ALL_FOCAL = [
    "fsum", "fproduct", "fmean", "fmax", "fmin", "fvariety",
    "fmajority", "fminority", "fpercentage", "fpercentile",
    "flinkage", "fpartition", "fshape", "fvolume",
    "fgradient", "faspect", "faspect_unsafe", "fdownstream",
    "frank", "finsularity",
]


@pytest.mark.parametrize("op", ALL_FOCAL)
@pytest.mark.parametrize("tile_size", [7, 32])
def test_focal_matches_reference_multi_tile(spark, op, tile_size):
    arr = INTS if op in ("fvariety", "fmajority", "fminority", "flinkage", "fpartition", "fshape", "finsularity") else TERRAIN
    tr = make_tr(spark, arr, tile_size)
    out = FO.focal(tr, op).collect_array("r0")
    ref = ref_focal(arr, op)
    if np.issubdtype(np.asarray(ref).dtype, np.floating):
        np.testing.assert_allclose(out, ref, equal_nan=True, atol=1e-12)
    else:
        np.testing.assert_array_equal(out, ref)


def test_fupstream_chained_with_barrier(spark):
    arr = TERRAIN
    tr = make_tr(spark, arr, 7)
    down = FO.fdownstream(tr).strict(persist=True)
    up = FO.fupstream(down).collect_array("r0")
    ref_down = ref_focal(arr, "fdownstream")
    ref_up = K.k_fupstream(K.pad_block(ref_down, K.BORDER_FILL, 0))
    np.testing.assert_array_equal(up, ref_up)


def test_flength_ffrontage_farea_pipelines(spark):
    arr = INTS
    tr = make_tr(spark, arr, 7)
    length = FO.flength(FO.flinkage(tr)).collect_array("r0")
    ref_len = K.k_flength(ref_focal(arr, "flinkage"))
    np.testing.assert_allclose(length, ref_len)
    shape = FO.fshape(tr).strict(persist=True)
    front = FO.ffrontage(shape).collect_array("r0")
    area = FO.farea(shape).collect_array("r0")
    ref_shape = ref_focal(arr, "fshape")
    np.testing.assert_allclose(front, K.k_ffrontage(ref_shape))
    np.testing.assert_allclose(area, K.k_farea(ref_shape))


def test_focal_multi_shares_one_halo(spark):
    tr = make_tr(spark, TERRAIN, 7)
    outs = FO.focal_multi(tr, ["fmean", "fgradient"])
    m = outs["fmean"].collect_array("r0")
    g = outs["fgradient"].collect_array("r0")
    np.testing.assert_allclose(m, ref_focal(TERRAIN, "fmean"))
    np.testing.assert_allclose(g, ref_focal(TERRAIN, "fgradient"), atol=1e-12)


def test_focal_multi_checksum_sink_matches_tiles_sink(spark):
    """sink="checksum" must reduce EXACTLY the tile sink's outputs: for
    every tile, sum_<op> == sum of the materialized output block (same
    kernels, same out_cast), for both the float64 default and the
    flagship's float32 path."""
    from dataclasses import replace as _rp

    for cast, out_dtype in ((None, None), ("float32", "float32")):
        tr = make_tr(spark, TERRAIN, 7)
        specs = [
            _rp(FO.FOCAL_OPS["fmean"], cast=cast or FO.FOCAL_OPS["fmean"].cast),
            _rp(FO.FOCAL_OPS["fgradient"], cast=cast or "float64"),
        ]
        outs = FO.focal_multi(tr, specs, out_dtype=out_dtype)
        cs = FO.focal_multi(tr, specs, out_dtype=out_dtype, sink="checksum")
        got = {
            (r["ty"], r["tx"]): (r["sum_fmean"], r["sum_fgradient"])
            for r in cs.collect()
        }
        from mapalgebra_spark.tiles import decode_block

        for r in outs["fmean"]._combined.collect():
            m = decode_block(
                r["tile_fmean"], r["dtype_fmean"], r["h"], r["w"], r["planes_fmean"]
            )
            g = decode_block(
                r["tile_fgradient"], r["dtype_fgradient"], r["h"], r["w"],
                r["planes_fgradient"],
            )
            sm, sg = got[(r["ty"], r["tx"])]
            assert sm == float(m.sum(dtype=np.float64))
            assert sg == float(g.sum(dtype=np.float64))
        outs["fmean"]._combined.unpersist()


def test_local_fusion_no_shuffle(spark):
    """A fused unary chain must stay a single mapInPandas over the scan —
    no Exchange in the plan."""
    tr = make_tr(spark, TERRAIN, 7)
    out = (tr * 2 + 1).map(np.sqrt).strict()
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_local_binary_and_nary(spark):
    a_arr = TERRAIN
    b_arr = (RNG.normal(size=(19, 23)) * 5 + 80).round(1)
    c_arr = (RNG.normal(size=(19, 23)) * 2 + 90).round(1)
    a = make_tr(spark, a_arr, 7, "x")
    b = R.TileRaster.from_arrays(spark, {"x": b_arr}, tile_size=7)
    c = R.TileRaster.from_arrays(spark, {"x": c_arr}, tile_size=7)
    np.testing.assert_allclose(R.lmax(a, b).collect_array("x"), np.maximum(a_arr, b_arr))
    np.testing.assert_allclose(R.lmin(a, b).collect_array("x"), np.minimum(a_arr, b_arr))
    np.testing.assert_allclose(
        R.lmean([a, b, c]).collect_array("x"), np.mean([a_arr, b_arr, c_arr], axis=0)
    )
    np.testing.assert_allclose(
        R.lvariance([a, b, c]).collect_array("x"),
        np.var(np.stack([a_arr, b_arr, c_arr]), axis=0, ddof=1),
    )
    ia = make_tr(spark, INTS, 7, "y")
    ib = R.TileRaster.from_arrays(spark, {"y": (INTS % 3).astype(np.int64)}, tile_size=7)
    np.testing.assert_array_equal(
        R.lvariety([ia, ib]).collect_array("y"),
        K.stack_variety([INTS, (INTS % 3).astype(np.int64)]),
    )
    # EVI-style fused arithmetic across three rasters
    evi = (2.5 * ((a - b) / (a + 6.0 * b - 7.5 * c + 1.0))).collect_array("x")
    ref = 2.5 * ((a_arr - b_arr) / (a_arr + 6.0 * b_arr - 7.5 * c_arr + 1.0))
    np.testing.assert_allclose(evi, ref)


def test_zip_size_mismatch_fails_fast(spark):
    a = make_tr(spark, TERRAIN, 7, "x")
    b = R.TileRaster.from_arrays(spark, {"x": TERRAIN[:10, :10]}, tile_size=7)
    with pytest.raises(Exception, match="size mismatch"):
        (a + b).collect_array("x")


def test_classify(spark):
    arr = INTS
    tr = make_tr(spark, arr, 7)
    out = tr.classify({1: 10, 3: 30}, default=-1).collect_array("r0")
    ref = K.classify_block(arr, [1, 3], [10, 30], -1)
    np.testing.assert_array_equal(out, ref)


def test_constant_and_sum_golden(spark):
    """Test.hs:37,48: constant raster folds."""
    arr = np.full((256, 256), 5, dtype=np.int64)
    tr = make_tr(spark, arr, 64)
    got = tr.collect_array("r0")
    assert got.size == 65536 and int(got.sum()) == 327680
    two = (tr + tr).collect_array("r0")
    assert int(two.sum()) == 655360


def test_fsum_nodata_readme_pattern(spark):
    """README.md:141-152 nodatafsum: 0-valued cells contribute nothing;
    all-nodata windows yield 0; raster edge pads with nodata."""
    arr = INTS.astype(np.float64)
    tr = make_tr(spark, arr, 7)
    got = FO.fsum_nodata(tr, nodata=0.0).collect_array("r0")
    padded = np.pad(arr, 1, mode="constant", constant_values=0.0)
    ref = np.zeros(arr.shape)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = padded[1 + dy : 1 + dy + arr.shape[0], 1 + dx : 1 + dx + arr.shape[1]]
            ref += np.where(s != 0.0, s, 0.0)
    np.testing.assert_allclose(got, ref)
    # an all-zero patch must produce exact 0 (Maybe mempty), not garbage
    hole = np.ones((9, 9))
    hole[2:7, 2:7] = 0.0
    trh = make_tr(spark, hole, 4, rid="hole")
    goth = FO.fsum_nodata(trh, nodata=0.0).collect_array("hole")
    assert goth[4, 4] == 0.0


def test_fmean_nodata_nan_sentinel(spark):
    """NaN-as-nodata: mean over valid cells only; NaN where none."""
    arr = TERRAIN.copy()
    arr[3:6, 4:9] = np.nan
    tr = make_tr(spark, arr, 7)
    got = FO.fmean_nodata(tr, nodata=np.nan).collect_array("r0")
    padded = np.pad(arr, 1, mode="constant", constant_values=np.nan)
    tot = np.zeros(arr.shape)
    cnt = np.zeros(arr.shape)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = padded[1 + dy : 1 + dy + arr.shape[0], 1 + dx : 1 + dx + arr.shape[1]]
            v = ~np.isnan(s)
            tot += np.where(v, s, 0.0)
            cnt += v
    with np.errstate(invalid="ignore"):
        ref = np.where(cnt > 0, tot / np.maximum(cnt, 1), np.nan)
    np.testing.assert_allclose(got, ref, equal_nan=True)
    assert np.isnan(got[4, 6])  # interior of the NaN hole


def test_histogram_any_dtype(spark):
    """Generalized histograms (reference is Word8-only, README.md:100)."""
    from mapalgebra_spark.operators import color as CO

    arr = (INTS - 2).astype(np.int64)  # negative values
    tr = make_tr(spark, arr, 7)
    got = {int(r["value"]): int(r["count"]) for r in CO.histogram_values(tr).collect()}
    vals, cnts = np.unique(arr, return_counts=True)
    assert got == {int(v): int(c) for v, c in zip(vals, cnts)}

    f = TERRAIN  # floats ~N(100, 10)
    trf = make_tr(spark, f, 7)
    lo, hi = CO.value_range(trf)
    assert lo == f.min() and hi == f.max()
    out = {int(r["bin"]): int(r["count"]) for r in CO.histogram_binned(trf, 8, lo, hi + 1e-9).collect()}
    idx = np.clip(np.floor((f - lo) / ((hi + 1e-9 - lo) / 8)).astype(int), 0, 7)
    ref = np.bincount(idx.ravel(), minlength=8)
    assert [out.get(i, 0) for i in range(8)] == ref.tolist()

    with pytest.raises(Exception, match="integer raster"):
        CO.histogram_values(trf).collect()
