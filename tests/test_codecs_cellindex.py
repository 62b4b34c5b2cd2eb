"""Round-trip tests for the stdlib codecs and the Morton cell index."""

import numpy as np
import pytest

from mapalgebra_spark import cellindex as CI
from mapalgebra_spark import codecs as CC


def test_png_roundtrip_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(CC.png_decode(CC.png_encode(img)), img)


def test_png_roundtrip_rgba():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 9, 4), dtype=np.uint8)
    assert np.array_equal(CC.png_decode(CC.png_encode(img)), img)


def test_png_filters_decode():
    """Decoder handles filters 1-4 (we only write 0, but stay robust)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    import struct
    import zlib

    # hand-build a PNG using filter 2 (Up) on every line
    h, w = img.shape
    lines = []
    prev = np.zeros(w, np.int32)
    for r in range(h):
        lines.append(b"\x02" + ((img[r].astype(np.int32) - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = img[r].astype(np.int32)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        CC.PNG_SIG
        + CC._chunk(b"IHDR", ihdr)
        + CC._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + CC._chunk(b"IEND", b"")
    )
    assert np.array_equal(CC.png_decode(data), img)


@pytest.mark.parametrize("fmt", ["raw", "npy", "png"])
def test_encode_decode_image(fmt):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(20, 30), dtype=np.uint8)
    blob = CC.encode_image(img, fmt)
    out = CC.decode_image(blob, fmt, w=30, h=20)
    assert np.array_equal(out, img)


def test_phash_deterministic_and_discriminative():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    assert CC.phash64(a) == CC.phash64(a.copy())
    assert CC.phash64(a) != CC.phash64(b)
    assert -(2**63) <= CC.phash64(a) < 2**63


def test_psnr():
    a = np.zeros((8, 8), np.uint8)
    assert CC.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] = 16
    assert 30 < CC.psnr(a, b) < 60


# --- cell index -------------------------------------------------------------


def test_cell_roundtrip():
    rng = np.random.default_rng(6)
    lat = rng.uniform(-89, 89, 1000)
    lng = rng.uniform(-180, 180, 1000)
    for level in (0, 5, 12, 29):
        cells = CI.latlng_to_cell(lat, lng, level)
        assert (cells >= 0).all()
        x, y, lv = CI.cell_to_xy(cells)
        assert (lv == level).all()
        back = CI.xy_to_cell(x, y, level)
        assert np.array_equal(back, cells)
        clat, clng = CI.cell_center(cells)
        # center within one cell of the original point
        n = 1 << level
        assert (np.abs(clat - lat) <= 180.0 / n).all()
        assert (np.abs(clng - lng) <= 360.0 / n).all()


def test_cell_parent_contains_children():
    cell = int(CI.latlng_to_cell(np.array([45.0]), np.array([7.0]), 10)[0])
    kids = CI.cell_children(cell)
    assert len(kids) == 4
    assert (CI.cell_parent(kids, 10) == cell).all()


def test_cell_prefix_range():
    """A parent's descendants form one contiguous morton range — the
    property PIP range-joins rely on."""
    cell = int(CI.latlng_to_cell(np.array([10.0]), np.array([20.0]), 8)[0])
    kids = CI.cell_children(cell)
    gkids = np.sort(np.concatenate([CI.cell_children(int(k)) for k in kids]))
    diffs = np.diff(sorted(int(g) & ((1 << 58) - 1) for g in gkids))
    assert (diffs > 0).all()
    span = int(gkids.max()) - int(gkids.min())
    assert span == 15  # 16 contiguous morton codes at level+2


def test_cell_ring():
    cell = int(CI.latlng_to_cell(np.array([0.0]), np.array([0.0]), 6)[0])
    r0 = CI.cell_ring(cell, 0)
    assert list(r0) == [cell]
    r1 = CI.cell_ring(cell, 1)
    assert len(r1) == 9
    r2 = CI.cell_ring(cell, 2)
    assert len(r2) == 25


def test_point_in_polygon():
    # unit square
    ring_lat = [0.0, 0.0, 10.0, 10.0]
    ring_lng = [0.0, 10.0, 10.0, 0.0]
    lat = np.array([5.0, 15.0, -1.0, 9.9])
    lng = np.array([5.0, 5.0, 5.0, 9.9])
    got = CI.point_in_polygon(lat, lng, ring_lat, ring_lng)
    assert got.tolist() == [True, False, False, True]


def test_haversine():
    # quarter circumference along the equator
    d = CI.haversine_km(0.0, 0.0, 0.0, 90.0)
    assert d == pytest.approx(np.pi / 2 * CI.EARTH_RADIUS_KM, rel=1e-6)


def test_cover_polygon():
    ring_lat = [0.0, 0.0, 5.0, 5.0]
    ring_lng = [0.0, 5.0, 5.0, 0.0]
    full, boundary = CI.cover_polygon(ring_lat, ring_lng, 8)
    assert len(full) > 0 and len(boundary) > 0
    # every full cell center must be inside
    clat, clng = CI.cell_center(full)
    assert CI.point_in_polygon(clat, clng, ring_lat, ring_lng).all()


# --- qdct lossy codec: the input_hint PSNR >= 40 dB gate ---------------------


def test_qdct_roundtrip_psnr_gate_terrain():
    from mapalgebra_spark.datagen import render_pixels

    for i, (w, h) in ((0, (256, 256)), (1, (300, 200)), (2, (97, 61))):
        pix = render_pixels(i, w, h, rgba=False)
        dec = CC.qdct_decode(CC.qdct_encode(pix))
        assert dec.shape == pix.shape and dec.dtype == np.uint8
        p = CC.psnr(pix, dec)
        assert p >= 40.0, (i, p)


def test_qdct_rgba_and_noise():
    from mapalgebra_spark.datagen import render_pixels

    pix = render_pixels(3, 128, 96, rgba=True)
    dec = CC.qdct_decode(CC.qdct_encode(pix))
    assert dec.shape == pix.shape
    assert CC.psnr(pix, dec) >= 40.0
    # worst case for DCT coding: pure uniform noise must still pass the
    # gate at the default scale
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    dn = CC.qdct_decode(CC.qdct_encode(noise))
    assert CC.psnr(noise, dn) >= 40.0


def test_qdct_deterministic_and_smaller_than_raw():
    from mapalgebra_spark.datagen import render_pixels

    pix = render_pixels(5, 256, 256, rgba=False)
    b1, b2 = CC.qdct_encode(pix), CC.qdct_encode(pix)
    assert b1 == b2
    assert len(b1) < pix.nbytes // 2  # actually compresses
    with pytest.raises(ValueError, match="magic"):
        CC.qdct_decode(b"JUNK" + b1[4:])
    with pytest.raises(ValueError, match="uint8"):
        CC.qdct_encode(pix.astype(np.float64))


def test_qdct_via_encode_decode_image():
    from mapalgebra_spark.datagen import render_pixels

    pix = render_pixels(6, 80, 50, rgba=False)
    data = CC.encode_image(pix, "qdct")
    dec = CC.decode_image(data, "qdct", 80, 50)
    assert CC.psnr(pix, dec) >= 40.0
