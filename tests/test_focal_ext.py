"""Extended-neighbourhood (radius-r) focal engine vs the full-raster
numpy oracle: for every op/mode the tiled distributed result must equal
``kernel(np.pad(full, r, mode), r)`` — including thin clipped edge
tiles and multi-hop halos (radius > neighbour tile size)."""

import numpy as np
import pytest

from mapalgebra_spark import kernels as K
from mapalgebra_spark import raster as R
from mapalgebra_spark.operators import focal as FO
from mapalgebra_spark.operators import focal_ext as FX

pytestmark = pytest.mark.spark

RNG = np.random.default_rng(123)
TERRAIN = (RNG.normal(size=(21, 26)) * 10 + 100).round(1)
INTS = RNG.integers(0, 4, size=(21, 26)).astype(np.int64)

INT_OPS = {"fvariety", "fmajority", "fminority"}


def make_tr(spark, arr, tile_size):
    return R.TileRaster.from_arrays(spark, {"r0": np.asarray(arr)}, tile_size=tile_size)


def ref_radial(arr, op, r):
    spec = FX.RADIAL_OPS[op]
    a = np.asarray(arr)
    if spec.cast:
        a = a.astype(np.dtype(spec.cast))
    kw = {"constant_values": spec.fill} if spec.mode == K.BORDER_FILL else {}
    return spec.kernel(np.pad(a, r, mode=spec.mode, **kw), r)


def check(spark, op, r, tile_size, arr=None):
    if arr is None:
        arr = INTS if op in INT_OPS else TERRAIN
    tr = make_tr(spark, arr, tile_size)
    out = FX.focal_r(tr, op, r, tile_pitch=tile_size).collect_array("r0")
    ref = ref_radial(arr, op, r)
    if np.issubdtype(np.asarray(ref).dtype, np.floating):
        np.testing.assert_allclose(out, ref, atol=1e-12)
    else:
        np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("op", sorted(FX.RADIAL_OPS))
def test_radius2_all_ops_multi_tile(spark, op):
    # tile 8 over 21x26 → thin last tiles (5 rows, 2 cols)
    check(spark, op, r=2, tile_size=8)


@pytest.mark.parametrize("op", ["fsum", "fmax", "fmajority", "frank"])
def test_radius3_modes(spark, op):
    check(spark, op, r=3, tile_size=7)


def test_multi_hop_radius_exceeds_tile(spark):
    # tile 4, radius 5: halos span 2 tiles (+ synthesized bands) per side
    arr = (RNG.normal(size=(10, 11)) * 5 + 50).round(1)
    check(spark, "fsum", r=5, tile_size=4, arr=arr)
    check(spark, "fmax", r=5, tile_size=4, arr=arr)
    check(spark, "fpercentile", r=5, tile_size=4, arr=arr)


def test_sliver_tiles(spark):
    # 17x9 with tile 8 → 1px-wide last column tiles
    arr = (RNG.normal(size=(17, 9)) * 5 + 50).round(1)
    check(spark, "fmean", r=2, tile_size=8, arr=arr)
    check(spark, "fvariety", r=2, tile_size=8,
          arr=RNG.integers(0, 3, size=(17, 9)).astype(np.int64))


def test_single_tile_smaller_than_radius(spark):
    # whole raster smaller than the window: pure border synthesis,
    # np.pad multi-reflection semantics must match the global oracle
    arr = (RNG.normal(size=(3, 4)) * 5 + 50).round(1)
    check(spark, "fsum", r=4, tile_size=8, arr=arr)
    check(spark, "fmajority", r=4, tile_size=8,
          arr=RNG.integers(0, 2, size=(3, 4)).astype(np.int64))


def test_radius1_agrees_with_primary_engine(spark):
    """focal_radius(r=1) and the JVM-strip radius-1 engine must agree
    wherever their op semantics coincide."""
    for op, arr in (("fmax", TERRAIN), ("fmajority", INTS), ("fpercentile", TERRAIN)):
        tr = make_tr(spark, arr, 8)
        a = FX.focal_r(tr, op, 1, tile_pitch=8).collect_array("r0")
        b = FO.focal(tr, op).collect_array("r0")
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        )


def test_pitch_mismatch_fails_fast(spark):
    tr = make_tr(spark, TERRAIN, 8)
    with pytest.raises(Exception, match="tile_pitch"):
        FX.focal_r(tr, "fsum", 2, tile_pitch=16).collect_array("r0")


def test_shared_exchange_multi_op(spark):
    tr = make_tr(spark, TERRAIN, 8)
    outs = FX.focal_radius(tr, ["fsum", "fmean", "fmin"], 2, tile_pitch=8)
    np.testing.assert_allclose(
        outs["fsum"].collect_array("r0"), ref_radial(TERRAIN, "fsum", 2)
    )
    np.testing.assert_allclose(
        outs["fmean"].collect_array("r0"), ref_radial(TERRAIN, "fmean", 2)
    )
    np.testing.assert_allclose(
        outs["fmin"].collect_array("r0"), ref_radial(TERRAIN, "fmin", 2)
    )


# --- fconvolve: general weighted 3x3 linear filter (r4) ----------------------


def ref_convolve(arr, w, mode, fill=0.0):
    a = np.asarray(arr, dtype=np.float64)
    kw = {"constant_values": fill} if mode == K.BORDER_FILL else {}
    p = np.pad(a, 1, mode=mode, **kw)
    ss = K.shifts(p)
    acc = None
    for i in range(9):
        wi = float(np.asarray(w).ravel()[i])
        if wi == 0.0:
            continue
        term = wi * ss[i]
        acc = term if acc is None else acc + term
    return acc if acc is not None else np.zeros_like(a)


GAUSS = [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]
SOBEL_X = [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
SHARPEN = [[0.0, -1.0, 0.0], [-1.0, 5.0, -1.0], [0.0, -1.0, 0.0]]


@pytest.mark.parametrize("w,mode", [
    (GAUSS, K.BORDER_FILL),
    (SOBEL_X, K.BORDER_REFLECT),
    (SHARPEN, K.BORDER_EDGE),
])
def test_fconvolve_multi_tile_vs_full_raster(spark, w, mode):
    tr = make_tr(spark, TERRAIN, tile_size=8)
    out = FO.fconvolve(tr, w, mode=mode).collect_array("r0")
    # bit-identical: same term order, same float64 ops on both paths
    np.testing.assert_array_equal(out, ref_convolve(TERRAIN, w, mode))


def test_fconvolve_identity_kernel(spark):
    ident = [[0, 0, 0], [0, 1, 0], [0, 0, 0]]
    tr = make_tr(spark, TERRAIN, tile_size=8)
    out = FO.fconvolve(tr, ident).collect_array("r0")
    np.testing.assert_array_equal(out, TERRAIN.astype(np.float64))


def test_fconvolve_zero_kernel_and_bad_shape(spark):
    tr = make_tr(spark, TERRAIN, tile_size=8)
    out = FO.fconvolve(tr, np.zeros((3, 3))).collect_array("r0")
    np.testing.assert_array_equal(out, np.zeros_like(TERRAIN, dtype=np.float64))
    with pytest.raises(ValueError, match="3x3"):
        FO.fconvolve(tr, np.ones((5, 5)))


def test_disc_mask_semantics_vs_bruteforce():
    """Pin the disc membership rule (dy²+dx² ≤ r²) against a per-pixel
    brute force, independent of the engine's vectorized kernels."""
    rng = np.random.default_rng(77)
    a = rng.integers(0, 50, size=(11, 12)).astype(np.float64)
    r = 2
    assert FX._disc_mask(2).sum() == 13  # the r=2 disc keeps 13 of 25
    pad = np.pad(a, r, mode="constant", constant_values=0)
    got_sum = FX.k_rsum_disc(pad, r)
    pad_e = np.pad(a, r, mode="edge")
    got_max = FX.k_rmax_disc(pad_e, r)
    h, w = a.shape
    for i in range(h):
        for j in range(w):
            vals_s, vals_m = [], []
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    if dy * dy + dx * dx > r * r:
                        continue
                    y, x = i + dy, j + dx
                    vals_s.append(a[y, x] if 0 <= y < h and 0 <= x < w else 0.0)
                    vals_m.append(a[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])
            assert got_sum[i, j] == sum(vals_s)
            assert got_max[i, j] == max(vals_m)
