"""Property-based tests (hypothesis) over the pure kernel layer —
random inputs against independently-written oracles, mirroring the
reference's QuickCheck strategy (test/Test.hs:269-295)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from mapalgebra_spark import kernels as K
from mapalgebra_spark import tiles as TL

small_grids = arrays(
    np.float64,
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    elements=st.floats(-100, 100, allow_nan=False),
)
int_grids = arrays(
    np.int64, st.tuples(st.integers(1, 8), st.integers(1, 8)), elements=st.integers(0, 5)
)


@given(z=arrays(np.float64, 9, elements=st.floats(-1000, 1000)))
@settings(max_examples=200, deadline=None)
def test_left_pseudo_vs_lstsq(z):
    """The reference's QuickCheck property (Test.hs:276-295)."""
    direct = K.LEFT_PSEUDO @ z
    ref = np.linalg.lstsq(K.DESIGN, z, rcond=None)[0]
    np.testing.assert_allclose(direct, ref, atol=1e-4)


@given(z=arrays(np.float64, (5, 5), elements=st.floats(-100, 100)))
@settings(max_examples=100, deadline=None)
def test_plane_ab_raw_equals_facet_form(z):
    """The collected a/b form must equal leftPseudo over the facets."""
    p = K.pad_block(z, K.BORDER_REFLECT)
    a1, b1 = K.plane_ab_raw(p)
    a2, b2 = K.plane_ab(K.facets(p))
    np.testing.assert_allclose(a1, a2, atol=1e-9)
    np.testing.assert_allclose(b1, b2, atol=1e-9)


@given(g=int_grids)
@settings(max_examples=100, deadline=None)
def test_fmajority_oracle(g):
    """Mode with tie→smallest vs a per-pixel Counter oracle."""
    p = K.pad_block(g, K.BORDER_CONTINUE)
    out = K.k_fmajority(p)
    h, w = g.shape
    for i in range(h):
        for j in range(w):
            vals = sorted(p[i + di, j + dj] for di in (0, 1, 2) for dj in (0, 1, 2))
            from collections import Counter

            cnt = Counter(vals)
            best = min(cnt, key=lambda v: (-cnt[v], v))
            assert out[i, j] == best, (i, j, vals)


@given(g=int_grids)
@settings(max_examples=100, deadline=None)
def test_fvariety_oracle(g):
    p = K.pad_block(g, K.BORDER_EDGE)
    out = K.k_fvariety(p)
    h, w = g.shape
    for i in range(h):
        for j in range(w):
            vals = {p[i + di, j + dj] for di in (0, 1, 2) for dj in (0, 1, 2)}
            assert out[i, j] == len(vals)


@given(g=small_grids, mode=st.sampled_from(["constant", "edge", "symmetric", "reflect"]),
       th=st.integers(1, 4), tw=st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_halo_assembly_property(g, mode, th, tw):
    """assemble_halo == np.pad for arbitrary grids/geometries/modes."""
    from tests.test_halo_assembly import strips_for, tile_grid

    ref = K.pad_block(g, mode, 3)
    blocks, nty, ntx = tile_grid(g, th, tw)
    for (ty, tx), core in blocks.items():
        got = strips_for(blocks, ty, tx, nty, ntx)
        padded = TL.assemble_halo(
            core, got, mode, 3,
            at_n=ty == 0, at_s=ty == nty - 1, at_w=tx == 0, at_e=tx == ntx - 1,
        )
        y0, x0 = ty * th, tx * tw
        np.testing.assert_array_equal(
            padded, ref[y0 : y0 + core.shape[0] + 2, x0 : x0 + core.shape[1] + 2]
        )


@given(hist=arrays(np.uint64, 256, elements=st.integers(0, 10000)))
@settings(max_examples=200, deadline=None)
def test_breaks_invariants(hist):
    """breaks: <=10 values, sorted, all in [1,255], first is 1
    (reference: take 10 . (1:) ..., Test.hs:103-109).  Degenerate
    histograms (< 11 counts outside bin 0) are a divide-by-zero in the
    reference too (MA:1313-1315); the engine fails fast instead."""
    if int(hist[1:].sum()) < 11:
        import pytest

        with pytest.raises(ValueError, match="breaks"):
            K.breaks(hist)
        return
    bs = K.breaks(hist)
    assert 1 <= len(bs) <= 10
    assert bs == sorted(bs)
    assert bs[0] == 1
    assert all(1 <= b <= 255 for b in bs)


@given(vals=st.lists(st.integers(0, 255), min_size=1, max_size=64),
       keys=st.lists(st.integers(0, 255), min_size=1, max_size=8, unique=True))
@settings(max_examples=200, deadline=None)
def test_classify_lookup_le(vals, keys):
    """classify == greatest key <= v else default (M.lookupLE)."""
    keys = sorted(keys)
    ramp = {k: k * 10 for k in keys}
    out = K.classify_block(np.array(vals), keys, [ramp[k] for k in keys], -1)
    for v, o in zip(vals, out):
        le = [k for k in keys if k <= v]
        assert o == (ramp[max(le)] if le else -1)


@given(
    H=st.integers(1, 30),
    W=st.integers(1, 30),
    pitch=st.integers(1, 12),
    radius=st.integers(1, 7),
    mode=st.sampled_from(
        [K.BORDER_FILL, K.BORDER_EDGE, K.BORDER_REFLECT, K.BORDER_CONTINUE]
    ),
    seed=st.integers(0, 2**16),
)
@settings(max_examples=150, deadline=None)
def test_radius_halo_property(H, W, pitch, radius, mode, seed):
    """For ANY raster shape x tile pitch x radius x border mode, routing
    every tile's plan_strips to its receivers and assembling must equal
    np.pad of the full raster — the pure-python simulation of the
    distributed exchange (multi-hop, slivers, rasters smaller than the
    window all arise from the random geometry)."""
    from mapalgebra_spark.operators.focal_ext import assemble_radius, plan_strips

    rng = np.random.default_rng(seed)
    full = rng.integers(0, 9, size=(H, W)).astype(np.float64)
    kw = {"constant_values": 3.0} if mode == K.BORDER_FILL else {}
    expected = np.pad(full, radius, mode=mode, **kw)

    nty = (H + pitch - 1) // pitch
    ntx = (W + pitch - 1) // pitch

    def core_of(ty, tx):
        return full[ty * pitch : min((ty + 1) * pitch, H),
                    tx * pitch : min((tx + 1) * pitch, W)]

    # simulate the exchange: sender-side plans → receiver inboxes
    inbox = {(ty, tx): [] for ty in range(nty) for tx in range(ntx)}
    for ty in range(nty):
        for tx in range(ntx):
            core = core_of(ty, tx)
            for ty2, tx2, oy, ox, rs, cs in plan_strips(
                ty, tx, core.shape[0], core.shape[1], nty, ntx, H, W, radius, pitch
            ):
                inbox[(ty2, tx2)].append((oy, ox, core[rs, cs]))

    for ty in range(nty):
        for tx in range(ntx):
            core = core_of(ty, tx)
            got = assemble_radius(
                core, inbox[(ty, tx)], ty, tx, H, W, radius, pitch, mode, 3.0
            )
            y0, x0 = ty * pitch, tx * pitch
            ref = expected[y0 : y0 + core.shape[0] + 2 * radius,
                           x0 : x0 + core.shape[1] + 2 * radius]
            np.testing.assert_array_equal(got, ref, err_msg=f"tile {(ty, tx)}")
