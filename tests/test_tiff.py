"""Baseline TIFF codec: round-trips across compressions, the LZW
early-change boundaries, PackBits' reference vector, big-endian reads,
and the reference's gray512 histogram golden (test/Test.hs:103-109)
running over a REAL decoded TIFF through the distributed ingest path —
the reference's own fixtures are TIFFs read by fromRGBA/fromGray
(MapAlgebra.hs:544-591)."""

import struct

import numpy as np
import pytest

from mapalgebra_spark import codecs
from mapalgebra_spark import tiff as TF


def _gray512() -> np.ndarray:
    r, c = np.mgrid[0:512, 0:512]
    return ((r * 7 + c * 13) % 256).astype(np.uint8)


def _rgba(h=50, w=70) -> np.ndarray:
    r, c = np.mgrid[0:h, 0:w]
    return np.stack(
        [(r * 3 + c) % 256, (r + c * 5) % 256, (r * r + c) % 256, np.full((h, w), 200)],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("comp", [TF.COMP_NONE, TF.COMP_PACKBITS, TF.COMP_LZW])
@pytest.mark.parametrize("rps", [None, 17])
def test_roundtrip_gray(comp, rps):
    a = _gray512()[:100, :64]
    data = TF.tiff_encode(a, compression=comp, rows_per_strip=rps)
    np.testing.assert_array_equal(TF.tiff_decode(data), a)


@pytest.mark.parametrize("comp", [TF.COMP_NONE, TF.COMP_PACKBITS, TF.COMP_LZW])
def test_roundtrip_rgba_and_rgb(comp):
    a = _rgba()
    np.testing.assert_array_equal(TF.tiff_decode(TF.tiff_encode(a, compression=comp)), a)
    rgb = a[..., :3]
    np.testing.assert_array_equal(
        TF.tiff_decode(TF.tiff_encode(rgb, compression=comp)), rgb
    )


def test_lzw_predictor_roundtrip():
    a = _gray512()
    data = TF.tiff_encode(a, compression=TF.COMP_LZW, predictor=2, rows_per_strip=64)
    np.testing.assert_array_equal(TF.tiff_decode(data), a)
    # predictor should help smooth gradients compress
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 2))
    with_p = len(TF.tiff_encode(grad, compression=TF.COMP_LZW, predictor=2))
    without = len(TF.tiff_encode(grad, compression=TF.COMP_LZW, predictor=1))
    assert with_p < without


def test_lzw_early_change_boundaries():
    """Random and structured payloads large enough to cross the 511 and
    1023 table boundaries (and a 12-bit table reset) must round-trip —
    this pins the early-change off-by-one on both sides."""
    rng = np.random.default_rng(7)
    for payload in (
        rng.integers(0, 256, size=40_000, dtype=np.uint8).tobytes(),  # ~fresh entries
        bytes(np.tile(np.arange(256, dtype=np.uint8), 400)),  # long repeats
        b"\x00" * 10_000,
    ):
        assert TF.lzw_decode(TF.lzw_encode(payload), len(payload)) == payload


def test_packbits_spec_vector_and_roundtrip():
    """The worked example from the TIFF 6.0 PackBits section (decoder
    checked against the spec's encoded stream, independent of our
    encoder), plus arbitrary-data round-trips of our own encoder."""
    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert TF.packbits_decode(packed, len(unpacked)) == unpacked
    rng = np.random.default_rng(3)
    for payload in (
        unpacked,
        rng.integers(0, 4, size=5000, dtype=np.uint8).tobytes(),
        b"\xff" * 1000,
        bytes(range(256)) * 8,
    ):
        assert TF.packbits_decode(TF.packbits_encode(payload), len(payload)) == payload


def test_big_endian_read():
    """Hand-built MM (big-endian) uncompressed gray TIFF decodes too."""
    a = (np.arange(48, dtype=np.uint8) % 7).reshape(6, 8)
    pix = a.tobytes()
    # header(8) + pixels + IFD
    ifd_off = 8 + len(pix)
    entries = [
        (256, 4, 1, 8), (257, 4, 1, 6), (258, 3, 1, 8 << 16), (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16), (273, 4, 1, 8), (277, 3, 1, 1 << 16),
        (278, 4, 1, 6), (279, 4, 1, len(pix)),
    ]
    buf = b"MM\x00*" + struct.pack(">I", ifd_off) + pix
    buf += struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        buf += struct.pack(">HHII", tag, typ, count, value)
    buf += struct.pack(">I", 0)
    np.testing.assert_array_equal(TF.tiff_decode(buf), a)


def test_codec_dispatch():
    a = _rgba(30, 40)
    data = codecs.encode_image(a, "tiff")
    np.testing.assert_array_equal(codecs.decode_image(data, "tiff", 40, 30), a)


@pytest.mark.spark
def test_gray512_histogram_golden_from_real_tiff(spark):
    """Test.hs:103-109 on a real decoded TIFF: the gray512-equivalent
    raster goes bytes → distributed ingest (fromGray path) → engine
    histogram → breaks, matching the pure-kernel golden exactly."""
    import pandas as pd

    from mapalgebra_spark import kernels as K
    from mapalgebra_spark.ingest import tiles_from_images
    from mapalgebra_spark.operators import color as CO

    pix = _gray512()
    images = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(
                    image_id="gray512", bytes=TF.tiff_encode(pix, compression=TF.COMP_LZW),
                    w=512, h=512, fmt="tiff", caption="", phash=0,
                )
            ]
        )
    )
    tr = tiles_from_images(images, tile_size=256)
    rows = CO.histogram(tr).collect()
    got = np.zeros(256, dtype=np.uint64)
    for r in rows:
        got[int(r["value"])] = int(r["count"])
    exp = K.block_histogram(pix)
    np.testing.assert_array_equal(got, exp)
    assert int(got.sum()) == 262144
    bs = K.breaks(got)
    assert len(bs) == 10 and bs == sorted(bs) and all(0 <= b <= 255 for b in bs)


@pytest.mark.spark
def test_write_image_auto_roundtrip(spark, tmp_path):
    """writeImage/writeImageAuto: extension-dispatched export of an
    assembled raster (png and tiff both round-trip)."""
    from mapalgebra_spark.operators import color as CO
    from mapalgebra_spark.raster import TileRaster

    pix = _gray512()[:96, :96]
    tr = TileRaster.from_arrays(spark, {"g": pix}, tile_size=64)
    for ext in ("png", "tif", "npy"):
        p = str(tmp_path / f"out.{ext}")
        CO.write_image_auto(tr, "g", p)
        back = codecs.decode_image(
            open(p, "rb").read(), {"tif": "tiff"}.get(ext, ext), 96, 96
        )
        np.testing.assert_array_equal(back, pix)


# --- property tests -----------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        spp=st.sampled_from([1, 3, 4]),
        comp=st.sampled_from([TF.COMP_NONE, TF.COMP_PACKBITS, TF.COMP_LZW]),
        rps=st.integers(1, 41),
        seed=st.integers(0, 2**31),
    )
    def test_tiff_roundtrip_property(h, w, spp, comp, rps, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if spp == 1 else (h, w, spp)
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = TF.tiff_encode(a, compression=comp, rows_per_strip=min(rps, h))
        np.testing.assert_array_equal(TF.tiff_decode(data), a)

    @settings(max_examples=15, deadline=None)
    @given(seed=st.integers(0, 2**31), n=st.integers(0, 3000))
    def test_lzw_roundtrip_property(seed, n):
        data = np.random.default_rng(seed).integers(0, 8, size=n, dtype=np.uint8).tobytes()
        assert TF.lzw_decode(TF.lzw_encode(data), n) == data

except ImportError:  # hypothesis is baked into this env; belt-and-braces
    pass


def test_tiff_malformed_inputs_fail_fast():
    good = TF.tiff_encode(_gray512()[:16, :16])
    with pytest.raises(ValueError, match="byte-order"):
        TF.tiff_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        TF.tiff_decode(b"II\x00\x00" + good[4:])
    # 16-bit samples are out of scope and must say so, not misdecode
    bad_bps = bytearray(good)
    # find the BITSPERSAMPLE entry (tag 258) in the IFD and bump 8 -> 16
    import struct as _s

    ifd_off = _s.unpack("<I", good[4:8])[0]
    n = _s.unpack("<H", good[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if _s.unpack("<H", good[off : off + 2])[0] == 258:
            bad_bps[off + 8] = 16
    with pytest.raises(ValueError, match="8-bit"):
        TF.tiff_decode(bytes(bad_bps))
    # truncated pixel data: uncompressed strip shorter than declared
    with pytest.raises(Exception):
        TF.tiff_decode(good[: len(good) // 2])


@pytest.mark.spark
def test_write_image_dtype_guardrails(spark, tmp_path):
    """8-bit formats refuse non-uint8 rasters (no silent C-cast
    corruption); .npy preserves the native dtype losslessly."""
    from mapalgebra_spark.operators import color as CO
    from mapalgebra_spark.raster import TileRaster

    pix = (np.mgrid[0:64, 0:64][0] * 7.25).astype(np.float64)
    tr = TileRaster.from_arrays(spark, {"f": pix}, tile_size=32)
    with pytest.raises(ValueError, match="uint8"):
        CO.write_image(tr, "f", str(tmp_path / "x.png"))
    with pytest.raises(ValueError, match="uint8"):
        CO.write_image(tr, "f", str(tmp_path / "x.tif"))
    p = str(tmp_path / "x.npy")
    CO.write_image(tr, "f", p)
    back = codecs.npy_decode(open(p, "rb").read())
    assert back.dtype == np.float64
    np.testing.assert_array_equal(back, pix)
