"""Pure-numpy pixel kernels for the PySpark map-algebra engine.

Every kernel reproduces, cell-for-cell, the semantics of the reference
Haskell library (fosskers/mapalgebra, ``lib/Geography/MapAlgebra.hs`` —
cited below as ``MA:<line>``), re-expressed as vectorized numpy over
whole tile blocks.  These functions are *engine-agnostic*: they know
nothing about Spark.  The Spark layers (``operators/``) call them inside
Arrow-batched pandas UDFs, one call per 256x256 (+1px halo) block — never
per pixel.

Focal kernels take a *padded* block of shape ``(h+2, w+2)`` (1-px halo
already assembled by the halo engine, see ``operators/focal.py``) and
return the ``(h, w)`` core result (or a ``(planes, h, w)`` stack).

Border modes (massiv ``Border`` → numpy ``np.pad`` mode), per MA usage:

=============  ===============  =======================================
reference      np.pad mode      meaning at a true raster edge
=============  ===============  =======================================
``Fill v``     ``constant``     pad with constant v
``Edge``       ``edge``         repeat the edge pixel
``Reflect``    ``symmetric``    mirror, edge pixel repeated
``Continue``   ``reflect``      mirror, edge pixel NOT repeated
=============  ===============  =======================================
"""

from __future__ import annotations

import math

import numpy as np

TAU = 6.283185307179586  # MA:1116-1117
#: Approximate-equality tolerance tau/1024 (MA:1163-1164).
APPROX_TOL = 0.0061359

# ---------------------------------------------------------------------------
# 3x3 neighbourhood access over a padded block
# ---------------------------------------------------------------------------


def _float_block(p: np.ndarray) -> np.ndarray:
    """float32/float64 blocks pass through unchanged (the float32 path
    halves memory traffic for 8-bit imagery and is exact for its 3x3
    sums); anything narrower — ints, bools, float16 — upcasts to
    float64, preserving the original always-exact behaviour."""
    a = np.asarray(p)
    if np.issubdtype(a.dtype, np.floating) and a.dtype.itemsize >= 4:
        return a
    return a.astype(np.float64)


def shifts(p: np.ndarray):
    """The 9 neighbourhood planes of a padded (h+2, w+2) block.

    Returns (nw, no, ne, we, fo, ea, sw, so, se) each of shape (h, w),
    matching the argument order of ``neighbourhood`` (MA:1068-1072).
    Row index grows southward, column index grows eastward.
    """
    return (
        p[:-2, :-2],  # nw
        p[:-2, 1:-1],  # no
        p[:-2, 2:],  # ne
        p[1:-1, :-2],  # we
        p[1:-1, 1:-1],  # fo
        p[1:-1, 2:],  # ea
        p[2:, :-2],  # sw
        p[2:, 1:-1],  # so
        p[2:, 2:],  # se
    )


def facets(p: np.ndarray):
    """Surficial facet points per ``facetStencil`` (MA:1079-1090).

    Corner facets are 4-cell means, edge facets 2-cell means, center is
    the focus. Returns the 9 facet planes in (nw, no, ne, we, fo, ea,
    sw, so, se) order, float64.
    """
    nw, no, ne, we, fo, ea, sw, so, se = (x.astype(np.float64) for x in shifts(p))
    return (
        (nw + no + we + fo) / 4.0,
        (no + fo) / 2.0,
        (no + ne + fo + ea) / 4.0,
        (we + fo) / 2.0,
        fo,
        (fo + ea) / 2.0,
        (we + fo + sw + so) / 4.0,
        (fo + so) / 2.0,
        (fo + ea + so + se) / 4.0,
    )


# ---------------------------------------------------------------------------
# Plane fit (gradient / aspect) — MA:1092-1168
# ---------------------------------------------------------------------------

# Design matrix of the 3x3 facet grid: z = a*x + b*y + c with
# x (row coord) and y (col coord) in {-0.5, 0, 0.5} (MA:1097-1105).
DESIGN = np.array(
    [
        [-0.5, -0.5, 1.0],
        [-0.5, 0.0, 1.0],
        [-0.5, 0.5, 1.0],
        [0.0, -0.5, 1.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.5, 1.0],
        [0.5, -0.5, 1.0],
        [0.5, 0.0, 1.0],
        [0.5, 0.5, 1.0],
    ]
)

#: Left pseudo-inverse (AtA)^-1 At of DESIGN (MA:1094-1105).  AtA is
#: diagonal (diag(1.5, 1.5, 9)), so rows reduce to closed forms used in
#: :func:`plane_ab`; kept explicitly for the property test vs lstsq.
LEFT_PSEUDO = np.linalg.inv(DESIGN.T @ DESIGN) @ DESIGN.T


def plane_ab(fz):
    """Slope coefficients (a, b) of the best-fit plane over 9 facet planes.

    Because AtA = diag(1.5, 1.5, 9): a = (S - N) / 3, b = (E - W) / 3
    where N/S/E/W are sums of the corresponding facet rows/cols.
    Identical to ``leftPseudo #> z`` (MA:1135) components 0 and 1.
    """
    nw, no, ne, we, fo, ea, sw, so, se = fz
    a = ((sw + so + se) - (nw + no + ne)) / 3.0
    b = ((ne + ea + se) - (nw + we + sw)) / 3.0
    return a, b


def plane_ab_raw(p: np.ndarray):
    """(a, b) of the facet-grid plane fit, computed DIRECTLY from the raw
    3x3 neighbourhood — the facet means expand algebraically:

        a = ((sw + se - nw - ne) + 4*(so - no)) / 12
        b = ((ne + se - nw - sw) + 4*(ea - we)) / 12

    (substitute facetStencil MA:1081-1089 into plane_ab and collect
    terms; avoids materializing 9 facet planes — ~3x faster).  The SQL
    oracles use the same collected form so results stay bit-identical.

    Dtype-preserving for float32/float64 inputs: the oracle-checked
    paths pass float64 blocks (FocalSpec cast="float64") and are
    bit-identical to before; a float32 block runs the whole fit in
    float32 — half the memory traffic, which is what the kernel is
    bound by (the flagship bench uses this for 8-bit imagery, where
    |a|,|b| ≤ 319 and the fit arithmetic is exact or 1-ulp in
    float32).  Integer and float16 inputs upcast to float64 as always
    (3x3 sums would overflow narrow ints / lose float16 exactness).
    """
    q = _float_block(p)
    nw, no, ne, we, _, ea, sw, so, se = shifts(q)
    # in-place accumulation with the SAME operation order as the
    # textbook form above — bit-identical results, ~3x fewer temp
    # allocations (the kernel is memory-bandwidth bound)
    a = sw + se
    a -= nw
    a -= ne
    t = so - no
    t *= 4.0
    a += t
    a /= 12.0
    b = ne + se
    b -= nw
    b -= sw
    np.subtract(ea, we, out=t)
    t *= 4.0
    b += t
    b /= 12.0
    return a, b


def k_gradient(p: np.ndarray) -> np.ndarray:
    """Focal Gradient in radians (MA:1111-1125): tau/2 - acos(n_z).

    n = normalize([a, b, -1]) so n_z = -1/sqrt(a^2+b^2+1).
    """
    a, b = plane_ab_raw(p)
    # in-place form of (TAU/2) - arccos(-1/sqrt(a*a + b*b + 1.0)) with
    # identical operation order (bit-identical to the SQL oracle)
    np.multiply(a, a, out=a)
    np.multiply(b, b, out=b)
    a += b
    a += 1.0
    np.sqrt(a, out=a)
    np.divide(-1.0, a, out=a)
    np.arccos(a, out=a)
    np.subtract(TAU / 2.0, a, out=a)
    return a


def k_aspect(p: np.ndarray) -> np.ndarray:
    """Focal Aspect (MA:1145-1151). NaN where the plane is flat
    (|a| and |b| both within APPROX_TOL of 0)."""
    a, b = plane_ab_raw(p)
    flat = (np.abs(a) < APPROX_TOL) & (np.abs(b) < APPROX_TOL)
    norm = np.sqrt(a * a + b * b)
    with np.errstate(invalid="ignore", divide="ignore"):
        ang = np.arccos(np.clip(a / np.where(norm == 0, np.nan, norm), -1.0, 1.0))
    return np.where(flat, np.nan, ang)


def k_aspect_unsafe(p: np.ndarray) -> np.ndarray:
    """``faspect'`` (MA:1155-1159): no flat check; nonsense where flat."""
    a, b = plane_ab_raw(p)
    norm = np.sqrt(a * a + b * b)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.arccos(np.clip(a / norm, -1.0, 1.0))


# ---------------------------------------------------------------------------
# Simple focal reducers — MA:774-852
# ---------------------------------------------------------------------------


def k_fsum(p: np.ndarray) -> np.ndarray:
    """Focal sum, border Fill 0 (MA:775-777)."""
    ss = shifts(p)
    out = ss[0].copy()  # owned buffer; the shifts are views of p
    for s in ss[1:]:
        out += s
    return out


def k_fproduct(p: np.ndarray) -> np.ndarray:
    """Focal product, border Fill 1 (MA:780-782)."""
    ss = shifts(p)
    out = ss[0].copy()
    for s in ss[1:]:
        out = out * s
    return out


def k_fmean(p: np.ndarray) -> np.ndarray:
    """Focal mean, border Fill 0 (MA:794-796).

    Dtype-preserving for float32/float64 inputs (float64 oracle paths
    unchanged; float32 runs fully in float32 — sums of nine 8-bit
    pixels are exact either way, the /9 differs by ≤1 ulp of float32).
    Integer and float16 inputs upcast to float64 (narrow-int 3x3 sums
    would overflow; float16 sums lose exactness past 2048)."""
    q = _float_block(p)
    out = k_fsum(q)
    out /= 9.0
    return out


def k_fmax(p: np.ndarray) -> np.ndarray:
    """Focal max, border Edge (MA:799-801)."""
    ss = shifts(p)
    out = ss[0].copy()
    for s in ss[1:]:
        np.maximum(out, s, out=out)
    return out


def k_fmin(p: np.ndarray) -> np.ndarray:
    """Focal min, border Edge (MA:804-806)."""
    ss = shifts(p)
    out = ss[0].copy()
    for s in ss[1:]:
        np.minimum(out, s, out=out)
    return out


def _sorted_stack(planes) -> np.ndarray:
    return np.sort(np.stack(planes, axis=0), axis=0)


def _stack_counts(s: np.ndarray) -> np.ndarray:
    """Per-slot multiplicity in a value-sorted stack s of shape (n, h, w)."""
    n = s.shape[0]
    counts = np.empty(s.shape, dtype=np.int64)
    for i in range(n):
        c = np.zeros(s.shape[1:], dtype=np.int64)
        for j in range(n):
            c += s[j] == s[i]
        counts[i] = c
    return counts


def k_fvariety(p: np.ndarray) -> np.ndarray:
    """# distinct values in the 3x3, border Edge (MA:809-812). uint64."""
    s = _sorted_stack(shifts(p))
    out = np.ones(s.shape[1:], dtype=np.uint64)
    for i in range(1, s.shape[0]):
        out += (s[i] != s[i - 1]).astype(np.uint64)
    return out


def stack_majority(planes) -> np.ndarray:
    """Most frequent value; tie → smallest value (``majo``, MA:713-721)."""
    s = _sorted_stack(planes)
    counts = _stack_counts(s)
    idx = np.argmax(counts, axis=0)  # first max → smallest value on tie
    return np.take_along_axis(s, idx[None], axis=0)[0]


def stack_minority(planes) -> np.ndarray:
    """Least frequent value; tie → smallest value (``mino``, MA:729-737)."""
    s = _sorted_stack(planes)
    counts = _stack_counts(s)
    idx = np.argmin(counts, axis=0)  # first min → smallest value on tie
    return np.take_along_axis(s, idx[None], axis=0)[0]


def k_fmajority(p: np.ndarray) -> np.ndarray:
    """Focal majority, border Continue (MA:815-818)."""
    return stack_majority(shifts(p))


def k_fminority(p: np.ndarray) -> np.ndarray:
    """Focal minority, border Continue (MA:821-824)."""
    return stack_minority(shifts(p))


def k_fmedian(p: np.ndarray) -> np.ndarray:
    """Focal median of the 3x3 window — the GaCM focal-statistics
    member the reference omits entirely (its focal family is
    fixed-function, MA:775-852).  The window always holds 9 values
    (borders synthesized like the majority/minority family, Continue),
    so the median is the exact 5th order statistic — no interpolation,
    bit-reproducible, and matched by a relational median over the
    mirrored window in the oracle."""
    s = np.stack(shifts(p))
    s = np.sort(s, axis=0)
    return s[4]


def k_ftpi(p: np.ndarray) -> np.ndarray:
    """Topographic Position Index (gdaldem `tpi` semantics): focus
    minus the MEAN OF THE 8 NEIGHBOURS (center excluded).  Positive on
    ridges, negative in valleys.  Terms accumulate in neighbourhood
    order (nw..se, focus excluded) — on integer inputs the sum is
    exact in float64 regardless, which is what the relational oracle
    relies on."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    acc = np.zeros(fo.shape, dtype=np.float64)
    for s in (nw, no, ne, we, ea, sw, so, se):
        acc += s
    return fo - acc / 8.0


def k_ftri(p: np.ndarray) -> np.ndarray:
    """Terrain Ruggedness Index, Riley et al. 1999 (gdaldem
    `tri -alg Riley`): sqrt of the sum of squared differences between
    the focus and its 8 neighbours.  Integer inputs keep every squared
    term and the sum exact in float64 (well under 2^53), so the single
    final sqrt is bit-reproducible across engines."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    acc = np.zeros(fo.shape, dtype=np.float64)
    for s in (nw, no, ne, we, ea, sw, so, se):
        d = s - fo
        acc += d * d
    return np.sqrt(acc)


def k_froughness(p: np.ndarray) -> np.ndarray:
    """Roughness (gdaldem `roughness`): max minus min of the full 3x3
    window (center included)."""
    ss = shifts(p)
    mx = np.maximum.reduce(ss)
    mn = np.minimum.reduce(ss)
    return mx - mn


def k_fvariance(p: np.ndarray) -> np.ndarray:
    """Focal POPULATION variance of the 3x3 window via the exact
    integer identity (9*Σx² − (Σx)²) / 81: on integer inputs both
    accumulators are exact in float64 (< 2^53) and the single final
    division is the only rounding step — so a relational oracle
    computing the same identity matches bit-for-bit (a Welford-style
    streaming variance would not)."""
    ss = shifts(p)
    s1 = np.zeros(ss[4].shape, dtype=np.float64)
    s2 = np.zeros(ss[4].shape, dtype=np.float64)
    for s in ss:
        s1 += s
        s2 += s * s
    return (9.0 * s2 - s1 * s1) / 81.0


def k_fstddev(p: np.ndarray) -> np.ndarray:
    """Focal population standard deviation: one IEEE sqrt over the
    exact k_fvariance identity — bit-reproducible for the same reason
    (the variance is an identical double on both engines and sqrt is
    correctly rounded)."""
    return np.sqrt(k_fvariance(p))


#: Hillshade light constants (gdaldem defaults: azimuth 315°, altitude
#: 45°), computed once here and shared VERBATIM (repr round-trip) with
#: the SQL oracle so both engines evaluate the identical
#: double-precision chain.  sin/cos of the fixed angles are constants,
#: not per-pixel trig — the kernel itself is trig-free.
HS_SIN_ALT = math.sin(math.radians(45.0))
HS_CA_SIN_AZ = math.cos(math.radians(45.0)) * math.sin(math.radians(315.0))
HS_CA_COS_AZ = math.cos(math.radians(45.0)) * math.cos(math.radians(315.0))


def _horn_sums(p: np.ndarray):
    """Horn 1981 weighted 8-neighbour sums (gdaldem's default gradient
    stencil), UNdivided: sx = (ne+2e+se)-(nw+2w+sw) grows eastward,
    sy = (sw+2s+se)-(nw+2n+ne) grows southward.  On integral inputs
    every term and both sums are exact in float64, so a relational
    SUM(v * dx * (2-|dy|)) / SUM(v * dy * (2-|dx|)) reproduces them
    bit-for-bit regardless of accumulation order."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    sx = (ne + 2.0 * ea + se) - (nw + 2.0 * we + sw)
    sy = (sw + 2.0 * so + se) - (nw + 2.0 * no + ne)
    return sx, sy


def k_fslope(p: np.ndarray) -> np.ndarray:
    """gdaldem ``slope -p`` (percent slope), Horn gradient, cell size 1:
    100·sqrt((sx/8)² + (sy/8)²) = 12.5·sqrt(sx² + sy²).  With integral
    inputs sx²+sy² is exact, sqrt is IEEE correctly rounded, and 12.5
    is a power-of-two multiple — one rounding step total, so the SQL
    oracle's identical expression matches bit-for-bit.  (Degrees would
    need atan, whose last-ulp behaviour is libm-dependent; percent is
    the exactly-reproducible member of the pair.)"""
    sx, sy = _horn_sums(p)
    return 12.5 * np.sqrt(sx * sx + sy * sy)


def k_fhillshade(p: np.ndarray) -> np.ndarray:
    """gdaldem ``hillshade`` (Horn gradient, azimuth 315°, altitude
    45°, z-factor 1, cell size 1), returned as a CONTINUOUS float in
    [1, 255] (the integer quantization is a presentation step with
    engine-dependent half-rounding; callers wanting bytes round
    explicitly).  With x east / y north / z up and row index growing
    south, the cosine of the sun–normal angle is

        cang = (sin(alt) − cos(alt)·(gx·sin(az) − gy·cos(az)))
               / sqrt(1 + gx² + gy²)

    where gx = sx/8 (east) and gy = sy/8 (SOUTH — hence the sign flip
    on the cos(az) term).  Every elementary op below is IEEE
    correctly rounded and evaluated in a pinned order mirrored
    token-for-token by the SQL oracle, so the doubles match bit-exact
    with no tolerance."""
    sx, sy = _horn_sums(p)
    gx = sx / 8.0
    gy = sy / 8.0
    num = HS_SIN_ALT - (gx * HS_CA_SIN_AZ - gy * HS_CA_COS_AZ)
    den = np.sqrt(1.0 + (gx * gx + gy * gy))
    cang = num / den
    return np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)


#: D8 neighbour order (nw..se, row-major, focus skipped) and offsets —
#: also the TIE-BREAK order: the first direction reaching the best
#: slope key wins, matching the oracle's ORDER BY key DESC, ord ASC
#: over ord = (dy+1)*3 + (dx+1) (monotone in this sequence).
D8_OFFSETS = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)
)


def k_flowdir(p: np.ndarray) -> np.ndarray:
    """D8 flow direction: the neighbour with the steepest positive
    downhill slope (drop / distance).  Comparing drop/1 vs drop/√2
    EXACTLY: for positive drops, slope_straight > slope_diag ⇔
    2·ds² > dd², so the selection key is 2·drop² (straight) or drop²
    (diagonal) — integer-exact on integral elevations, no sqrt, no
    irrational anywhere, which is what lets a relational oracle pick
    the identical neighbour.  (2·ds² = dd² has no nonzero integer
    solutions, so straight/diagonal key ties cannot occur; same-type
    ties fall to the fixed D8_OFFSETS order.)  Returns the direction
    index 0..7 per cell, −1 for pits/flats (no positive drop).
    Border: Fill +inf — off-raster neighbours never receive flow."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    dirs = (nw, no, ne, we, ea, sw, so, se)
    best = np.full(fo.shape, -1.0)
    out = np.full(fo.shape, -1.0)
    for i, nb in enumerate(dirs):
        with np.errstate(invalid="ignore"):
            drop = fo - nb
            straight = D8_OFFSETS[i][0] == 0 or D8_OFFSETS[i][1] == 0
            key = np.where(
                drop > 0, drop * drop * (2.0 if straight else 1.0), -1.0
            )
        upd = key > best
        best = np.where(upd, key, best)
        out = np.where(upd, float(i), out)
    return out


def k_fpercentage(p: np.ndarray) -> np.ndarray:
    """Fraction of the 8 neighbours equal to the focus, /8, border
    Continue (MA:828-838)."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    acc = np.zeros(fo.shape, dtype=np.float64)
    for s in (nw, no, ne, we, ea, sw, so, se):
        acc += s == fo
    return acc / 8.0


def k_fpercentile(p: np.ndarray) -> np.ndarray:
    """Fraction of the 8 neighbours strictly less than the focus, /8,
    border Continue (MA:842-852)."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    acc = np.zeros(fo.shape, dtype=np.float64)
    for s in (nw, no, ne, we, ea, sw, so, se):
        acc += s < fo
    return acc / 8.0


# ---------------------------------------------------------------------------
# GaCM focal ops the reference omits (README.md:129-130 "Except for
# Focal Ranking and Focal Insularity, all Focal Operations ... are
# provided").  Semantics are OURS, defined here, since there is no
# reference implementation to match; both follow the fpercentile family
# convention (border Continue, focus compared against its 8 neighbours).
# ---------------------------------------------------------------------------


def k_frank(p: np.ndarray) -> np.ndarray:
    """Focal Ranking: competition rank (ascending, "1224" style) of the
    focal value within its 3x3 neighbourhood — 1 + the number of
    neighbourhood cells strictly smaller than the focus.  Ties share the
    smaller rank.  Border Continue, like the other comparison-against-
    focus ops (fpercentile, MA:842-852)."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    acc = np.ones(fo.shape, dtype=np.float64)
    for s in (nw, no, ne, we, ea, sw, so, se):
        acc += s < fo
    return acc


#: 4-connected adjacency between the 9 slots of a 3x3 window, indexed
#: row-major 0..8 (nw no ne / we fo ea / sw so se).
_INSULARITY_EDGES = (
    (0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),  # horizontal
    (0, 3), (3, 6), (1, 4), (4, 7), (2, 5), (5, 8),  # vertical
)


def k_finsularity(p: np.ndarray) -> np.ndarray:
    """Focal Insularity: number of 4-connected clumps of equal-valued
    cells inside the 3x3 neighbourhood (a clump = maximal set of cells
    with identical value connected through N/S/E/W steps within the
    window).  Border Continue.  uint64, range 1..9.

    Vectorized min-label propagation: each slot starts with its own
    index as label; sweeping the 12 window adjacencies 8 times (a clump
    snaking through all 9 slots is 8 edges long, and one sweep advances
    a minimum label at least one hop) propagates every clump's minimum
    index to all members, so the clump count is the number of slots
    still holding their own index.  Verified against a brute-force
    union-find oracle in tests.
    """
    ss = shifts(p)
    h, w = ss[4].shape
    labels = [np.full((h, w), i, dtype=np.int8) for i in range(9)]
    for _ in range(8):
        for i, j in _INSULARITY_EDGES:
            eq = ss[i] == ss[j]
            m = np.minimum(labels[i], labels[j])
            labels[i] = np.where(eq, m, labels[i])
            labels[j] = np.where(eq, m, labels[j])
    out = np.zeros((h, w), dtype=np.uint64)
    for i in range(9):
        out += labels[i] == i
    return out


# ---------------------------------------------------------------------------
# Lineal ops — MA:854-900. Bit layout (MA:1185-1195):
#   [  1   2   4 ]      bit0=NW bit1=N bit2=NE
#   [  8       16]      bit3=W         bit4=E
#   [ 32  64 128 ]      bit5=SW bit6=S bit7=SE
# ---------------------------------------------------------------------------


def k_flinkage(p: np.ndarray) -> np.ndarray:
    """Focal Linkage → uint8 Line bitmask, border Fill 0 (MA:860-880).

    Diagonal bit set only when the diagonal matches the focus AND both
    flanking axis bits are unset.
    """
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    n_ = no == fo
    w_ = we == fo
    e_ = ea == fo
    s_ = so == fo
    axes = (
        n_.astype(np.uint8) * 2
        + w_.astype(np.uint8) * 8
        + e_.astype(np.uint8) * 16
        + s_.astype(np.uint8) * 64
    )
    diags = (
        ((nw == fo) & ~(n_ | w_)).astype(np.uint8) * 1
        + ((ne == fo) & ~(n_ | e_)).astype(np.uint8) * 4
        + ((sw == fo) & ~(w_ | s_)).astype(np.uint8) * 32
        + ((se == fo) & ~(e_ | s_)).astype(np.uint8) * 128
    )
    return axes + diags


def _flength_lut() -> np.ndarray:
    lut = np.zeros(256, dtype=np.float64)
    v = np.arange(256, dtype=np.uint16)
    half, root = 0.5, 1.0 / np.sqrt(2.0)
    for bit in (1, 3, 4, 6):  # axis bits -> 1/2 each (MA:892-895)
        lut += np.where(v & (1 << bit), half, 0.0)
    for bit in (0, 2, 5, 7):  # diagonal bits -> 1/sqrt 2 (MA:896-899)
        lut += np.where(v & (1 << bit), root, 0.0)
    return lut


FLENGTH_LUT = _flength_lut()


def k_flength(line_block: np.ndarray) -> np.ndarray:
    """Focal Length over a Line-bitmask block (local map, MA:888-900)."""
    return FLENGTH_LUT[line_block.astype(np.uint8)]


# ---------------------------------------------------------------------------
# Areal ops (corner topology) — MA:902-1038
# Surround encoding: Complete=0 OneSide=1 Open=2 RightAngle=3 OutFlow=4
# (declaration order MA:916-953).
# ---------------------------------------------------------------------------

SUR_COMPLETE, SUR_ONESIDE, SUR_OPEN, SUR_RIGHTANGLE, SUR_OUTFLOW = 0, 1, 2, 3, 4


def surround(fo, tl, tr, br) -> np.ndarray:
    """Vectorized ``surround`` (MA:965-975); guard order preserved."""
    up = fo != tl
    diag = fo != tr
    right = fo != br
    complete = up & (tl == tr) & (tr == br)
    rightangle = up & right
    oneside = (up & diag) | (diag & right)
    outflow = diag & (fo == tl) & (fo == br)
    return np.select(
        [complete, rightangle, oneside, outflow],
        [SUR_COMPLETE, SUR_RIGHTANGLE, SUR_ONESIDE, SUR_OUTFLOW],
        default=SUR_OPEN,
    ).astype(np.uint8)


def k_fshape(p: np.ndarray) -> np.ndarray:
    """Focal Shape → (4, h, w) uint8 Corners planes in field order
    (topLeft, bottomLeft, bottomRight, topRight), border Reflect
    (MA:1007-1013)."""
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p)
    return np.stack(
        [
            surround(fo, no, nw, we),
            surround(fo, so, sw, we),
            surround(fo, so, se, ea),
            surround(fo, no, ne, ea),
        ]
    )


def k_fpartition(p: np.ndarray) -> np.ndarray:
    """Focal Partition (top-right 2x2 only), border Reflect (MA:989-1000).

    Corners(surround fo tl tl fo, Open, surround fo fo br br,
            surround fo tl tr br) with tl=N, tr=NE, br=E neighbour.
    """
    _, no, ne, _, fo, ea, _, _, _ = shifts(p)
    open_ = np.full(fo.shape, SUR_OPEN, dtype=np.uint8)
    return np.stack(
        [
            surround(fo, no, no, fo),
            open_,
            surround(fo, fo, ea, ea),
            surround(fo, no, ne, ea),
        ]
    )


#: frontage length per Surround code (MA:979-985).
FRONTAGE_LUT = np.array([1.0 / np.sqrt(2.0), 0.5, 0.0, 1.0, 1.0 / np.sqrt(2.0)])
#: area deduction per Surround code (MA:1025-1030).
AREA_LUT = np.array([1.0 / 8.0, 0.0, 0.0, 0.0, -1.0 / 8.0])


def k_ffrontage(corners: np.ndarray) -> np.ndarray:
    """Total areal-edge length per pixel over a (4, h, w) Corners stack
    (local map, MA:1019-1021)."""
    return FRONTAGE_LUT[corners].sum(axis=0)


def k_farea(corners: np.ndarray) -> np.ndarray:
    """Pixel area over a (4, h, w) Corners stack (MA:1025-1038)."""
    return 1.0 - AREA_LUT[corners].sum(axis=0)


# ---------------------------------------------------------------------------
# Surficial volume / drainage — MA:1040-1065, 1232-1263
# ---------------------------------------------------------------------------


def k_fvolume(p: np.ndarray) -> np.ndarray:
    """Focal Volume, border Reflect (MA:1042-1065).

    (8*fo + 2*sum(ring facets)) / 24 — each of the 8 ring facets appears
    in exactly two adjacent-pair sums of the reference formula; the
    facet means collapse to raw-neighbour terms:

        sum(ring) = (nw+ne+sw+se + 4*(no+we+ea+so) + 12*fo) / 4

    The SQL oracle uses the same collected form (bit-identical).
    """
    nw, no, ne, we, fo, ea, sw, so, se = shifts(p.astype(np.float64))
    ring = ((nw + ne + sw + se) + 4.0 * (no + we + ea + so) + 12.0 * fo) / 4.0
    return (8.0 * fo + 2.0 * ring) / 24.0


#: fdownstream fold order and direction weights (MA:1241-1248).
_DOWNSTREAM_ORDER = ((0, 1), (1, 2), (2, 4), (3, 8), (5, 16), (6, 32), (7, 64), (8, 128))


def k_fdownstream(p: np.ndarray) -> np.ndarray:
    """Focal Drainage (downstream) → uint8 Drain, border Reflect
    (MA:1232-1248).

    Order-dependent fold over facet drops (fo - facet_k): accumulate the
    direction bit when the drop is within APPROX_TOL of the running max,
    reset to the single bit when strictly greater.  Initial max is 0, so
    near-zero drops (flat directions) also accumulate.
    """
    fz = facets(p)
    fo = fz[4]
    curr = np.zeros(fo.shape, dtype=np.float64)
    acc = np.zeros(fo.shape, dtype=np.uint16)
    for idx, bit in _DOWNSTREAM_ORDER:
        a = fo - fz[idx]
        close = np.abs(a - curr) < APPROX_TOL
        greater = (~close) & (a > curr)
        acc = np.where(close, acc + bit, np.where(greater, bit, acc)).astype(np.uint16)
        curr = np.where(greater, a, curr)
    return acc.astype(np.uint8)


def k_fupstream(p: np.ndarray) -> np.ndarray:
    """Focal Drainage (upstream) over a Drain block, border Fill 0
    (MA:1253-1263): my NW-inflow bit = NW neighbour's SE bit, etc."""
    nw, no, ne, we, _, ea, sw, so, se = (x.astype(np.uint16) for x in shifts(p))
    out = (
        ((nw >> 7) & 1) * 1
        + ((no >> 6) & 1) * 2
        + ((ne >> 5) & 1) * 4
        + ((we >> 4) & 1) * 8
        + ((ea >> 3) & 1) * 16
        + ((sw >> 2) & 1) * 32
        + ((so >> 1) & 1) * 64
        + (se & 1) * 128
    )
    return out.astype(np.uint8)


# Direction bit positions in a Drain/Line byte (MA:1266-1275).
DIRECTION_BITS = {
    "NW": 0, "N": 1, "NE": 2, "W": 3, "E": 4, "SW": 5, "S": 6, "SE": 7,
}


def drainage(directions) -> int:
    """Set of direction names → Drain byte (MA:1283-1293)."""
    out = 0
    for d in directions:
        out |= 1 << DIRECTION_BITS[d]
    return out


# ---------------------------------------------------------------------------
# Local (element-wise) stack kernels — MA:679-772
# ---------------------------------------------------------------------------


def classify_block(block, break_keys, break_vals, default):
    """LocalClassification (MA:679-682): greatest break key <= v, else
    default.  break_keys must be sorted ascending."""
    keys = np.asarray(break_keys)
    vals = np.asarray(break_vals)
    idx = np.searchsorted(keys, block, side="right") - 1
    out = np.where(idx >= 0, vals[np.clip(idx, 0, len(vals) - 1)], default)
    return out


def stack_mean(planes) -> np.ndarray:
    """lmean (MA:695-700)."""
    return np.mean(np.stack([x.astype(np.float64) for x in planes]), axis=0)


def stack_variety(planes) -> np.ndarray:
    """lvariety (MA:703-705): count of distinct values per index, uint64."""
    s = _sorted_stack(planes)
    out = np.ones(s.shape[1:], dtype=np.uint64)
    for i in range(1, s.shape[0]):
        out += (s[i] != s[i - 1]).astype(np.uint64)
    return out


def stack_variance(planes) -> np.ndarray:
    """lvariance (MA:741-758): sample variance, ddof=1."""
    s = np.stack([x.astype(np.float64) for x in planes])
    return np.var(s, axis=0, ddof=1)


# ---------------------------------------------------------------------------
# Histogram / breaks — MA:1296-1315
# ---------------------------------------------------------------------------


def block_histogram(block: np.ndarray) -> np.ndarray:
    """256-bin count of a uint8 block (MA:1300-1305)."""
    return np.bincount(block.ravel().astype(np.uint8), minlength=256).astype(np.uint64)


def breaks(hist: np.ndarray) -> list[int]:
    """Colour breaks from a 256-bin histogram (MA:1309-1315).

    Faithful to the reference quirks: bin 0 is dropped, binWidth is
    sum/11 (integer div), goal skips ahead by whole binWidths on large
    jumps, 1 is prepended, first 10 taken.
    """
    h1 = np.asarray(hist, dtype=np.uint64)[1:]
    total = int(h1.sum())
    bin_width = total // 11
    if bin_width == 0:
        # fewer than 11 non-bin-0 pixels: the reference's `div binWidth`
        # is a divide-by-zero exception here too (MA:1313-1315) — fail
        # fast with a diagnosable error instead of a ZeroDivisionError
        raise ValueError(
            f"breaks: histogram has only {total} counts outside bin 0; "
            "need >= 11 for the reference's bin-width algorithm"
        )
    goal = bin_width
    acc: list[int] = []
    cum = 0
    for i, cnt in enumerate(h1):
        cum += int(cnt)
        if cum > goal:
            acc.append(i + 1)
            if (cum - goal) > bin_width:
                goal = goal + bin_width * ((cum - goal) // bin_width + 1)
            else:
                goal = goal + bin_width
    return ([1] + acc)[:10]


# ---------------------------------------------------------------------------
# Border synthesis for halo assembly (see operators/focal.py)
# ---------------------------------------------------------------------------

BORDER_FILL = "constant"
BORDER_EDGE = "edge"
BORDER_REFLECT = "symmetric"  # massiv Reflect
BORDER_CONTINUE = "reflect"  # massiv Continue


def pad_block(core: np.ndarray, mode: str, fill=0):
    """np.pad a full (un-tiled) raster by 1px — the reference semantics
    that the tiled halo assembly must reproduce exactly."""
    if mode == BORDER_FILL:
        return np.pad(core, 1, mode="constant", constant_values=fill)
    return np.pad(core, 1, mode=mode)
