"""Baseline JPEG (T.81/JFIF) codec tests — round-trip PSNR gates,
structural stream checks, hypothesis properties, malformed-input
fail-fast probes (same battery style as test_tiff.py).

The input_hint's lossy clause (BASELINE.json) demands decoded-pixel
PSNR >= 40 dB; every round-trip here is gated on that at the qualities
the engine defaults to.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapalgebra_spark import codecs as CC
from mapalgebra_spark import jpeg as J


def _terrain(h, w, seed=3):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 55 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
        + 40 * np.sin((yy + 2 * xx) / 23.0)
    )
    rng = np.random.default_rng(seed)
    return np.clip(base + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)


def _terrain_rgb(h, w, seed=3, independent=False):
    """Natural-image-like RGB: one luminance field with mild per-channel
    tint (RGB channels of real photos are strongly correlated).
    ``independent=True`` gives the pathological full-chroma-energy case
    used to stress 4:2:0."""
    if independent:
        return np.stack([_terrain(h, w, seed + i) for i in range(3)], axis=-1)
    base = _terrain(h, w, seed).astype(np.float64)
    tint = [_terrain(h, w, seed + 10 + i).astype(np.float64) * 0.15 for i in range(3)]
    return np.clip(np.stack([base + t - 19 for t in tint], axis=-1), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# round-trip PSNR gates
# ---------------------------------------------------------------------------


def test_gray_roundtrip_psnr_gate():
    pix = _terrain(96, 128)
    for q in (95, 100):  # engine default is 95
        dec = J.jpeg_decode(J.jpeg_encode(pix, quality=q))
        assert dec.shape == pix.shape and dec.dtype == np.uint8
        assert CC.psnr(pix, dec) >= 40.0
    # lower quality still round-trips structurally, just lossier
    dec = J.jpeg_decode(J.jpeg_encode(pix, quality=80))
    assert dec.shape == pix.shape and CC.psnr(pix, dec) >= 30.0


def test_rgb_444_roundtrip_psnr_gate():
    pix = _terrain_rgb(80, 112)
    dec = J.jpeg_decode(J.jpeg_encode(pix))
    assert dec.shape == pix.shape
    assert CC.psnr(pix, dec) >= 40.0


def test_rgb_420_subsampled_roundtrip():
    """4:2:0 halves chroma resolution; on smooth imagery the 40 dB gate
    still holds, and luma is preserved regardless."""
    pix = _terrain_rgb(96, 96, independent=True)
    dec = J.jpeg_decode(J.jpeg_encode(pix, quality=95, subsample=True))
    assert dec.shape == pix.shape
    # chroma is deliberately halved: overall fidelity is bounded by the
    # imagery's chroma energy (here 3 independent terrain channels —
    # worst case), but luma must still clear the 40 dB gate
    assert CC.psnr(pix, dec) >= 35.0
    ya = J._to_ycbcr(pix)[..., 0]
    yb = J._to_ycbcr(dec)[..., 0]
    assert CC.psnr(ya, yb) >= 40.0


def test_restart_markers_roundtrip():
    pix = _terrain_rgb(64, 80)
    plain = J.jpeg_decode(J.jpeg_encode(pix, quality=92))
    for interval in (1, 3, 7):
        enc = J.jpeg_encode(pix, quality=92, restart_interval=interval)
        assert b"\xff\xdd" in enc  # DRI present
        assert b"\xff\xd0" in enc  # at least one RST0
        dec = J.jpeg_decode(enc)
        # restart markers change framing only, not the coded blocks
        assert np.array_equal(dec, plain)


def test_rgba_drops_alpha():
    pix = _terrain_rgb(40, 56)
    rgba = np.dstack([pix, np.full(pix.shape[:2], 200, np.uint8)])
    dec = J.jpeg_decode(J.jpeg_encode(rgba))
    assert dec.shape == pix.shape  # (h, w, 3): JPEG has no alpha channel
    assert CC.psnr(pix, dec) >= 40.0


def test_noise_q100_high_fidelity():
    """quality=100 quantizes by ~1 — even adversarial noise must come
    back nearly exact (this is what catches Huffman/zigzag/DC-pred
    bugs that smooth images hide)."""
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(noise, quality=100))
    assert CC.psnr(noise, dec) >= 50.0
    noisergb = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(noisergb, quality=100))
    assert CC.psnr(noisergb, dec) >= 45.0


def test_determinism_and_compression():
    pix = _terrain(128, 128)
    a = J.jpeg_encode(pix, quality=90)
    b = J.jpeg_encode(pix, quality=90)
    assert a == b
    assert len(a) < pix.nbytes  # entropy coding actually compresses


def test_via_encode_decode_image_dispatch():
    pix = _terrain(64, 64)
    for fmt in ("jpeg", "jpg"):
        data = CC.encode_image(pix, fmt)
        dec = CC.decode_image(data, fmt, 64, 64)
        assert CC.psnr(pix, dec) >= 40.0


def test_stream_structure():
    enc = J.jpeg_encode(_terrain(16, 16), quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    chans=st.sampled_from([1, 3]),
    quality=st.sampled_from([70, 90, 100]),
    subsample=st.booleans(),
    restart=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_property(h, w, chans, quality, subsample, restart, seed):
    """Any shape/quality/mode combination decodes to the right shape
    and dtype with bounded error (luma-PSNR for subsampled colour —
    chroma loss on random noise is a property of 4:2:0, not a bug)."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if chans == 1 else (h, w, 3)
    # smooth ramp + mild noise keeps the PSNR gate meaningful per mode
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 50 * np.sin(yy / 5.0) + 40 * np.cos(xx / 6.0)).astype(np.float64)
    if chans == 3:
        base = np.stack([base, np.roll(base, 1, 0), np.roll(base, 1, 1)], axis=-1)
    pix = np.clip(base + rng.normal(0, 2, shape), 0, 255).astype(np.uint8)
    enc = J.jpeg_encode(
        pix, quality=quality, subsample=subsample and chans == 3, restart_interval=restart
    )
    dec = J.jpeg_decode(enc)
    assert dec.shape == shape and dec.dtype == np.uint8
    if chans == 3 and subsample:
        ya, yb = J._to_ycbcr(pix)[..., 0], J._to_ycbcr(dec)[..., 0]
        assert CC.psnr(ya, yb) >= 30.0
    else:
        assert CC.psnr(pix, dec) >= 30.0


def test_huffman_tables_prefix_free():
    for bits, vals in [
        (J.DC_LUM_BITS, J.DC_LUM_VALS),
        (J.AC_LUM_BITS, J.AC_LUM_VALS),
        (J.DC_CHROM_BITS, J.DC_CHROM_VALS),
        (J.AC_CHROM_BITS, J.AC_CHROM_VALS),
    ]:
        codes = J._canonical_codes(bits, vals)
        assert len(codes) == sum(bits)
        strs = [format(code, f"0{ln}b") for _, code, ln in codes]
        assert len(set(strs)) == len(strs)
        for i, a in enumerate(strs):
            for j, b in enumerate(strs):
                if i != j:
                    assert not b.startswith(a)


def test_quality_tables_monotone():
    l50, _ = J.quality_tables(50)
    assert np.array_equal(l50, J.QT_LUM)  # scale 100 at q=50
    l100, c100 = J.quality_tables(100)
    assert l100.max() == 1 and c100.max() == 1
    l10, _ = J.quality_tables(10)
    assert (l10 >= l50).all()


# ---------------------------------------------------------------------------
# malformed-input fail-fast probes
# ---------------------------------------------------------------------------


def test_rejects_not_jpeg():
    with pytest.raises(ValueError):
        J.jpeg_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        J.jpeg_decode(b"")


def test_rejects_progressive_and_exotic_sof():
    enc = bytearray(J.jpeg_encode(_terrain(16, 16)))
    sof = enc.find(b"\xff\xc0")
    for repl in (0xC2, 0xC3, 0xC9):
        bad = bytearray(enc)
        bad[sof + 1] = repl
        with pytest.raises(ValueError):
            J.jpeg_decode(bytes(bad))


def test_rejects_truncation():
    enc = J.jpeg_encode(_terrain(32, 32))
    with pytest.raises(ValueError):
        J.jpeg_decode(enc[: len(enc) // 3])


def test_rejects_bad_dqt_precision():
    enc = bytearray(J.jpeg_encode(_terrain(16, 16)))
    dqt = enc.find(b"\xff\xdb")
    enc[dqt + 4] = 0x20  # pq=2: invalid
    with pytest.raises(ValueError):
        J.jpeg_decode(bytes(enc))


def test_rejects_12bit_precision():
    enc = bytearray(J.jpeg_encode(_terrain(16, 16)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 4] = 12  # precision byte inside SOF0
    with pytest.raises(ValueError):
        J.jpeg_decode(bytes(enc))


def test_decoder_tolerates_fill_bytes():
    """T.81 allows 0xFF fill bytes before any marker."""
    enc = J.jpeg_encode(_terrain(16, 16), quality=90)
    sof = enc.find(b"\xff\xc0")
    padded = enc[:sof] + b"\xff" + enc[sof:]
    assert np.array_equal(J.jpeg_decode(padded), J.jpeg_decode(enc))


def test_decoder_skips_com_and_appn():
    enc = J.jpeg_encode(_terrain(16, 16), quality=90)
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    patched = enc[:2] + com + enc[2:]
    assert np.array_equal(J.jpeg_decode(patched), J.jpeg_decode(enc))


# ---------------------------------------------------------------------------
# Spark integration: the decode-once thumbnail stage over a jpeg table
# ---------------------------------------------------------------------------


def test_thumbnails_over_jpeg_table(spark):
    """An image table whose ``bytes`` hold real JPEG streams flows
    through the Arrow-batched decode stage; thumbs agree with the
    lossless-png table's thumbs to within the codec's fidelity."""
    from mapalgebra_spark import datagen, imageops

    jpg = datagen.generate_images_df(spark, 12, num_partitions=2, fmts=["jpeg"])
    png = datagen.generate_images_df(spark, 12, num_partitions=2, fmts=["png"])
    tj = {
        r["image_id"]: np.frombuffer(r["thumb"], np.uint8)
        for r in imageops.thumbnails(jpg, size=16).collect()
    }
    tp = {
        r["image_id"]: np.frombuffer(r["thumb"], np.uint8)
        for r in imageops.thumbnails(png, size=16).collect()
    }
    assert set(tj) == set(tp) and len(tj) == 12
    for k in tj:
        a, b = tj[k].astype(np.float64), tp[k].astype(np.float64)
        if len(a) != len(b):  # RGBA rows: jpeg drops alpha (255) -> 3 chans
            b = b.reshape(16, 16, 4)[..., :3].ravel()
        assert np.abs(a - b).mean() < 4.0  # decode-fidelity bound


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2: a one-component scan is non-interleaved (1 data unit
    per MCU) no matter what sampling factors the SOF declares — a
    foreign grayscale stream with 2x2 factors must decode like 1x1."""
    pix = (np.arange(48 * 80).reshape(48, 80) % 251).astype(np.uint8)
    enc = bytearray(J.jpeg_encode(pix, quality=95))
    sof = bytes(enc).find(b"\xff\xc0")
    samp_pos = sof + 2 + 2 + 1 + 4 + 1 + 1  # first component's samp byte
    assert enc[samp_pos] == 0x11
    enc[samp_pos] = 0x22
    assert np.array_equal(J.jpeg_decode(bytes(enc)), J.jpeg_decode(J.jpeg_encode(pix, quality=95)))
