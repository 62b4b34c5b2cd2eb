"""Golden-vector tests ported verbatim from the reference suite
(/root/reference/test/Test.hs — cited per test), run against the pure
numpy kernels over full (un-tiled) rasters via np.pad.  The tiled/halo
equivalents are in test_focal_spark.py."""

import numpy as np
import pytest

from mapalgebra_spark import kernels as K


def run_focal(arr, kernel, mode, fill=0):
    return kernel(K.pad_block(np.asarray(arr), mode, fill))


def L(*dirs):
    return K.drainage(dirs)


# --- flinkage (Test.hs:140-183), border Fill 0 ----------------------------


def test_flinkage_single_point():
    out = run_focal(np.array([[1]]), K.k_flinkage, K.BORDER_FILL, 0)
    assert out.tolist() == [[0]]


def test_flinkage_2x2_same():
    out = run_focal(np.array([[1, 1], [1, 1]]), K.k_flinkage, K.BORDER_FILL, 0)
    exp = [[L("E", "S"), L("W", "S")], [L("N", "E"), L("W", "N")]]
    assert out.tolist() == exp


def test_flinkage_2x2_diff():
    out = run_focal(np.array([[1, 2], [2, 1]]), K.k_flinkage, K.BORDER_FILL, 0)
    exp = [[L("SE"), L("SW")], [L("NE"), L("NW")]]
    assert out.tolist() == exp


def test_flinkage_3x3():
    arr = np.array([[1, 2, 1], [2, 2, 2], [1, 2, 1]])
    out = run_focal(arr, K.k_flinkage, K.BORDER_FILL, 0)
    exp = [
        [L(), L("S"), L()],
        [L("E"), L("N", "W", "S", "E"), L("W")],
        [L(), L("N"), L()],
    ]
    assert out.tolist() == exp


# --- flength (Test.hs:185-190) --------------------------------------------


def test_flength():
    arr = np.array([[1, 2, 1], [2, 2, 2], [1, 2, 1]])
    link = run_focal(arr, K.k_flinkage, K.BORDER_FILL, 0)
    out = K.k_flength(link)
    exp = np.array([[0, 0.5, 0], [0.5, 2, 0.5], [0, 0.5, 0]])
    np.testing.assert_allclose(out, exp)


# --- fpartition / fshape (Test.hs:192-215), border Reflect -----------------

C, O1, OP, RA, OF = (
    K.SUR_COMPLETE,
    K.SUR_ONESIDE,
    K.SUR_OPEN,
    K.SUR_RIGHTANGLE,
    K.SUR_OUTFLOW,
)


def corners_list(stack):
    """(4,h,w) stack → row-major list of (tl, bl, br, tr) tuples."""
    _, h, w = stack.shape
    return [tuple(int(stack[k, i, j]) for k in range(4)) for i in range(h) for j in range(w)]


def test_fpartition():
    out = run_focal(np.array([[1, 1], [2, 1]]), K.k_fpartition, K.BORDER_REFLECT)
    exp = [(OP, OP, OP, OP), (OP, OP, OP, OP), (O1, OP, O1, C), (OP, OP, OP, OP)]
    assert corners_list(out) == exp


def test_fshape():
    arr = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
    out = run_focal(arr, K.k_fshape, K.BORDER_REFLECT)
    exp = [
        (OP, OP, OF, OP),
        (OP, OP, OP, OP),
        (OP, OF, OP, OP),
        (OP, OP, OP, OP),
        (C, C, C, C),
        (OP, OP, OP, OP),
        (OP, OP, OP, OF),
        (OP, OP, OP, OP),
        (OF, OP, OP, OP),
    ]
    assert corners_list(out) == exp


# --- ffrontage / farea (Test.hs:217-253) -----------------------------------

BLOB_4X4 = np.array(
    [[1, 1, 1, 0], [1, 0, 0, 0], [1, 0, 0, 1], [1, 0, 1, 1]]
)


def test_ffrontage():
    shape = run_focal(BLOB_4X4, K.k_fshape, K.BORDER_REFLECT)
    out = K.k_ffrontage(shape)
    assert out[1, 1] == pytest.approx(1 + 1 / np.sqrt(2), abs=0.001)


def test_farea_open():
    shape = run_focal(np.zeros((3, 3), int), K.k_fshape, K.BORDER_REFLECT)
    np.testing.assert_allclose(K.k_farea(shape), np.ones((3, 3)))


def test_farea_centre():
    arr = np.zeros((3, 3), int)
    arr[1, 1] = 1
    shape = run_focal(arr, K.k_fshape, K.BORDER_REFLECT)
    exp = np.array([[1.125, 1, 1.125], [1, 0.5, 1], [1.125, 1, 1.125]])
    np.testing.assert_allclose(K.k_farea(shape), exp)


def test_farea_complex():
    shape = run_focal(BLOB_4X4, K.k_fshape, K.BORDER_REFLECT)
    assert K.k_farea(shape)[1, 1] == pytest.approx(7 / 8, abs=0.001)


# --- fvolume (Test.hs:255-267), border Reflect ------------------------------


def test_fvolume_flat():
    out = run_focal(np.full((3, 3), 8.0), K.k_fvolume, K.BORDER_REFLECT)
    np.testing.assert_allclose(out, np.full((3, 3), 8.0))


def test_fvolume_hill():
    arr = np.array([[24.0, 24, 24], [16, 16, 16], [8, 8, 8]])
    out = run_focal(arr, K.k_fvolume, K.BORDER_REFLECT)
    exp = sum([20, 20, 16, 20, 16, 16, 16, 16, 12, 16, 12, 12]) / 12
    assert out[1, 1] == pytest.approx(exp)


# --- least squares property (Test.hs:269-295) -------------------------------


def test_left_pseudo_matches_lstsq():
    rng = np.random.default_rng(42)
    for _ in range(200):
        z = rng.normal(size=9) * 10
        direct = K.LEFT_PSEUDO @ z
        lstsq = np.linalg.lstsq(K.DESIGN, z, rcond=None)[0]
        np.testing.assert_allclose(direct, lstsq, atol=1e-4)


def test_plane_ab_matches_left_pseudo():
    rng = np.random.default_rng(7)
    z = rng.normal(size=(9, 5, 4))
    a, b = K.plane_ab(tuple(z))
    ref = np.tensordot(K.LEFT_PSEUDO, z.reshape(9, -1), axes=1).reshape(3, 5, 4)
    np.testing.assert_allclose(a, ref[0], atol=1e-12)
    np.testing.assert_allclose(b, ref[1], atol=1e-12)


# --- fgradient / faspect (Test.hs:297-322), border Reflect ------------------


def test_fgradient_flat():
    out = run_focal(np.ones((3, 3)), K.k_gradient, K.BORDER_REFLECT)
    np.testing.assert_allclose(out, np.zeros((3, 3)), atol=1e-12)


def test_fgradient_45():
    arr = np.array([[3.0, 3, 3], [2, 2, 2], [1, 1, 1]])
    out = run_focal(arr, K.k_gradient, K.BORDER_REFLECT)
    assert out[1, 1] == pytest.approx(K.TAU / 8, abs=1e-4)


def test_faspect_flat_is_nan():
    out = run_focal(np.ones((3, 3)), K.k_aspect, K.BORDER_REFLECT)
    assert np.isnan(out[1, 1])


def test_faspect_south():
    arr = np.array([[3.0, 3, 3], [2, 2, 2], [1, 1, 1]])
    out = run_focal(arr, K.k_aspect, K.BORDER_REFLECT)
    assert out[1, 1] == pytest.approx(K.TAU / 2)


def test_faspect_east():
    arr = np.array([[3.0, 2, 1], [3, 2, 1], [3, 2, 1]])
    out = run_focal(arr, K.k_aspect_unsafe, K.BORDER_REFLECT)
    assert out[1, 1] == pytest.approx(K.TAU / 4, abs=1e-4)


# --- fdownstream / fupstream (Test.hs:324-352) ------------------------------


def test_fdownstream_spikey():
    arr = np.array([[3.0, 1, 3], [1, 2, 1], [3, 1, 3]])
    out = run_focal(arr, K.k_fdownstream, K.BORDER_REFLECT)
    assert out[1, 1] == L("N", "S", "E", "W")


def test_fdownstream_flat():
    out = run_focal(np.ones((3, 3)), K.k_fdownstream, K.BORDER_REFLECT)
    assert out[1, 1] == 255


def test_fdownstream_peak():
    arr = np.array([[1.0, 1, 1], [1, 3, 1], [1, 1, 1]])
    out = run_focal(arr, K.k_fdownstream, K.BORDER_REFLECT)
    assert out[1, 1] == L("NE", "NW", "SW", "SE")


def test_fdownstream_pit():
    arr = np.array([[2.0, 2, 2], [2, 1, 2], [2, 2, 2]])
    out = run_focal(arr, K.k_fdownstream, K.BORDER_REFLECT)
    assert out[1, 1] == 0


def test_fupstream_flat():
    flat = np.ones((3, 3))
    down = run_focal(flat, K.k_fdownstream, K.BORDER_REFLECT)
    up = run_focal(down, K.k_fupstream, K.BORDER_FILL, 0)
    assert up[1, 1] == 255


def test_fupstream_peak():
    arr = np.array([[1.0, 1, 1], [1, 3, 1], [1, 1, 1]])
    down = run_focal(arr, K.k_fdownstream, K.BORDER_REFLECT)
    up = run_focal(down, K.k_fupstream, K.BORDER_FILL, 0)
    assert up[1, 1] == 0


# --- simple focal reducers (Test.hs:60-62) ----------------------------------


def test_fvariety_const():
    out = run_focal(np.ones((7, 7), np.int64), K.k_fvariety, K.BORDER_EDGE)
    assert (out == 1).all()


def test_fmax_fmin_const():
    one = np.ones((7, 7), np.int64)
    assert (run_focal(one, K.k_fmax, K.BORDER_EDGE) == 1).all()
    assert (run_focal(one, K.k_fmin, K.BORDER_EDGE) == 1).all()


def test_fsum_fill0_corner():
    arr = np.ones((3, 3), np.int64)
    out = run_focal(arr, K.k_fsum, K.BORDER_FILL, 0)
    assert out[0, 0] == 4 and out[1, 1] == 9 and out[0, 1] == 6


def test_fmean_fill0():
    arr = np.ones((3, 3))
    out = run_focal(arr, K.k_fmean, K.BORDER_FILL, 0)
    assert out[1, 1] == pytest.approx(1.0)
    assert out[0, 0] == pytest.approx(4 / 9)


def test_fmajority_tiebreak_smallest():
    # neighbourhood with counts tied → smallest value wins (majo, MA:713-721)
    planes = [np.full((1, 1), v) for v in [3, 3, 1, 1, 2, 2, 5, 5, 4]]
    assert K.stack_majority(planes)[0, 0] == 1
    # minority tie → smallest too (mino, MA:729-737)
    assert K.stack_minority(planes)[0, 0] == 4


def test_fpercentage_fpercentile():
    arr = np.array([[1, 1, 1], [1, 2, 1], [1, 1, 1]], np.float64)
    pct = run_focal(arr, K.k_fpercentage, K.BORDER_CONTINUE)
    assert pct[1, 1] == 0.0
    # Continue mirrors the centre 2 into the corner's diagonals:
    # neighbours of (0,0) are {2,1,2, 1,1, 2,1,2} → 4/8 equal to focus 1
    assert pct[0, 0] == 0.5
    ple = run_focal(arr, K.k_fpercentile, K.BORDER_CONTINUE)
    assert ple[1, 1] == 1.0


# --- frank / finsularity: GaCM ops the reference omits (README.md:129-130);
# no Haskell golden exists, so validate against brute-force oracles ----------


def test_frank_goldens():
    arr = np.array([[1, 1, 1], [1, 2, 1], [1, 1, 1]], np.float64)
    rk = run_focal(arr, K.k_frank, K.BORDER_CONTINUE)
    assert rk[1, 1] == 9.0  # focus 2 beats all 8 neighbours → rank 9
    assert rk[0, 0] == 1.0  # focus 1 ties the other 1s, loses to 2s → rank 1
    flat = np.zeros((4, 5))
    assert (run_focal(flat, K.k_frank, K.BORDER_CONTINUE) == 1).all()


def _insularity_bruteforce(win: np.ndarray) -> int:
    """Union-find clump count over one 3x3 window (4-connectivity)."""
    parent = list(range(9))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for r in range(3):
        for c in range(3):
            for dr, dc in ((0, 1), (1, 0)):
                r2, c2 = r + dr, c + dc
                if r2 < 3 and c2 < 3 and win[r, c] == win[r2, c2]:
                    a, b = find(r * 3 + c), find(r2 * 3 + c2)
                    parent[max(a, b)] = min(a, b)
    return len({find(i) for i in range(9)})


def test_finsularity_goldens():
    flat = np.zeros((3, 3))
    assert (run_focal(flat, K.k_finsularity, K.BORDER_CONTINUE) == 1).all()
    checker = np.indices((5, 5)).sum(axis=0) % 2
    ins = run_focal(checker, K.k_finsularity, K.BORDER_CONTINUE)
    # interior checkerboard window: 5 isolated cells of one colour + 4 of
    # the other = 9 clumps
    assert (ins[1:-1, 1:-1] == 9).all()


def test_finsularity_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for _ in range(4):
        arr = rng.integers(0, 3, size=(9, 11)).astype(np.int64)
        padded = K.pad_block(arr, K.BORDER_CONTINUE, 0)
        out = K.k_finsularity(padded)
        for y in range(arr.shape[0]):
            for x in range(arr.shape[1]):
                win = padded[y : y + 3, x : x + 3]
                assert out[y, x] == _insularity_bruteforce(win), (y, x, win)


def test_frank_matches_bruteforce_random():
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 4, size=(8, 9)).astype(np.float64)
    padded = K.pad_block(arr, K.BORDER_CONTINUE, 0)
    out = K.k_frank(padded)
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            win = padded[y : y + 3, x : x + 3]
            expect = 1 + int((win < win[1, 1]).sum())
            assert out[y, x] == expect


# --- local stacks (Test.hs:51-57) -------------------------------------------


def test_local_stack_ops():
    one = np.ones((7, 7), np.int64)
    two = one * 2
    assert (K.stack_variety([one, two]) == 2).all()
    assert (K.stack_majority([one, one, two]) == 1).all()
    assert (K.stack_minority([one, one, two]) == 2).all()
    assert (K.stack_mean([one, two]) == 1.5).all()
    np.testing.assert_allclose(K.stack_variance([one, two, one * 3]), np.ones((7, 7)))


def test_classify_block():
    # lookupLE semantics: greatest key <= v, default below lowest break
    out = K.classify_block(
        np.array([0, 1, 5, 9, 10, 255]), [1, 10, 100], [10, 20, 30], default=-1
    )
    assert out.tolist() == [-1, 10, 10, 10, 20, 30]


# --- histogram / breaks (Test.hs:103-109, FIXTURES.md §2) --------------------


def test_histogram_and_breaks_gray512():
    r, c = np.mgrid[0:512, 0:512]
    pix = ((r * 7 + c * 13) % 256).astype(np.uint8)
    hist = K.block_histogram(pix)
    assert int(hist.sum()) == 262144
    bs = K.breaks(hist)
    assert len(bs) == 10
    assert bs == sorted(bs)
    assert all(0 <= b <= 255 for b in bs)
