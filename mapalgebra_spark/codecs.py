"""Image codecs, from scratch on the stdlib (no Pillow in the sandbox).

Formats supported:

- ``raw``  — C-order bytes of a (h, w) or (h, w, 4) uint8 array.
- ``npy``  — numpy .npy container (any dtype/shape).
- ``png``  — 8-bit grayscale (colour type 0) or RGBA (colour type 6),
             zlib/DEFLATE, scanline filters 0-4 supported on read,
             filter 0 written.
- ``qdct`` — LOSSY: JPEG-style 8x8 DCT quantization + zlib, gated at
             PSNR >= 40 dB per BASELINE.json input_hint (tested in
             tests/test_codecs_cellindex.py).
- ``jpeg`` — real baseline T.81/JFIF (jpeg.py: Huffman entropy coding,
             4:4:4 / 4:2:0, restart markers), same PSNR gate.

The reference reads TIFF/PNG via massiv-io (``fromRGBA``/``fromGray``,
MapAlgebra.hs:544-591) and encodes PNG (``png``, MapAlgebra.hs:671-673);
this module is the Spark engine's equivalent codec layer, used inside
Arrow-batched decode UDFs (ingest.py).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 grayscale (h,w) or RGBA (h,w,4) to PNG bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, nchan = 0, 1
        raw = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, nchan = 6, 4
        raw = a
    else:
        raise ValueError(f"png_encode: unsupported shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    scan = np.empty((h, 1 + w * nchan), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw.reshape(h, w * nchan)
    idat = zlib.compress(scan.tobytes(), 3)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. scan: (h, 1+stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = int(scan[r, 0])
        line = scan[r, 1:].astype(np.int32)
        prior = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[r] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[r] = ((line + prior) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need sequential bytes
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                x = line[i]
                if ftype == 1:
                    v = x + a
                elif ftype == 3:
                    v = x + (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = x + pr
                cur[i] = v & 0xFF
            out[r] = cur.astype(np.uint8)
        else:
            raise ValueError(f"png: unknown filter {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale/RGB/RGBA PNG to (h,w) or (h,w,c) uint8."""
    if data[:8] != PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    w = h = None
    color_type = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0:
                raise ValueError("png: only 8-bit non-interlaced supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    nchan = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nchan
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = _unfilter(scan, h, stride, nchan)
    if nchan == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, nchan)


def npy_encode(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr), allow_pickle=False)
    return buf.getvalue()


def npy_decode(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode pixels for the image+caption table's ``bytes`` column."""
    if fmt == "raw":
        return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    if fmt == "npy":
        return npy_encode(arr)
    if fmt == "png":
        return png_encode(arr)
    if fmt == "qdct":
        return qdct_encode(arr)
    if fmt == "tiff":
        from .tiff import tiff_encode

        return tiff_encode(arr)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import jpeg_encode

        return jpeg_encode(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode the ``bytes`` column back to uint8 pixels.

    ``raw`` needs (w, h) from the table; channel count is inferred from
    the byte length (h*w → grayscale, h*w*4 → RGBA).
    """
    if fmt == "raw":
        n = len(data)
        if n == h * w:
            return np.frombuffer(data, dtype=np.uint8).reshape(h, w)
        if n == h * w * 4:
            return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 4)
        raise ValueError(f"raw: {n} bytes does not match {h}x{w}")
    if fmt == "npy":
        return npy_decode(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "qdct":
        return qdct_decode(data)
    if fmt == "tiff":
        from .tiff import tiff_decode

        return tiff_decode(data)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------------------
# qdct — a from-scratch lossy format (JPEG-style 8x8 DCT quantization,
# zlib entropy stage), satisfying the input_hint's lossy clause: decoded
# pixels must pass the PSNR >= 40 dB gate vs the original (tested).
# No chroma subsampling; each channel coded independently.
# ---------------------------------------------------------------------------

QDCT_MAGIC = b"QDCT"

#: the standard JPEG luminance quantization table (Annex K, ITU T.81)
_JPEG_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos(np.pi * (2 * n + 1) * k / 16.0) * np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) float → (nby, nbx, 8, 8) with edge-replicated padding."""
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    H, W = ch.shape
    return (
        ch.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).copy(),
        H // 8,
        W // 8,
    )


def qdct_encode(arr: np.ndarray, scale: float = 0.1) -> bytes:
    """Encode uint8 gray (h,w) or multichannel (h,w,c) lossily.

    ``scale`` multiplies the JPEG base table.  The default 0.1 keeps the
    worst case above the input_hint gate: quantization MSE is ~
    mean(Q^2)/12 * scale^2, so even spectrally-flat uniform noise decodes
    at ~42 dB PSNR (tested); natural-statistics images land far higher."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("qdct: uint8 input only")
    chans = a[..., None] if a.ndim == 2 else a
    h, w, c = chans.shape
    q = _JPEG_Q * scale
    coefs = []
    for ci in range(c):
        blocks, nby, nbx = _to_blocks(chans[..., ci].astype(np.float64) - 128.0)
        coef = np.einsum("ij,abjk,kl->abil", _DCT, blocks, _DCT.T)
        coefs.append(np.round(coef / q).astype(np.int16))
    payload = zlib.compress(np.stack(coefs).tobytes(), 6)
    header = QDCT_MAGIC + struct.pack(">IIBd", h, w, c, scale)
    return header + payload


def qdct_decode(data: bytes) -> np.ndarray:
    if data[:4] != QDCT_MAGIC:
        raise ValueError("qdct: bad magic")
    h, w, c, scale = struct.unpack(">IIBd", data[4 : 4 + 17])
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    q = _JPEG_Q * scale
    raw = zlib.decompress(data[4 + 17 :])
    coefs = np.frombuffer(raw, dtype=np.int16).reshape(c, nby, nbx, 8, 8)
    out = np.empty((h, w, c), dtype=np.uint8)
    for ci in range(c):
        coef = coefs[ci].astype(np.float64) * q
        blocks = np.einsum("ij,abjk,kl->abil", _DCT.T, coef, _DCT)
        full = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        out[..., ci] = np.clip(np.round(full[:h, :w] + 128.0), 0, 255).astype(np.uint8)
    return out[..., 0] if c == 1 else out


def phash64(arr: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 block-mean downsample of
    the (grayscale-collapsed) image, thresholded at its mean; bits in
    row-major order, returned as signed int64."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a[:, :, : min(3, a.shape[2])].mean(axis=2)
    h, w = a.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    small = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blk = a[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            small[i, j] = blk.mean()
    bits = (small > small.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return int(np.int64(np.uint64(val)))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 images (gate for lossy formats)."""
    x = np.asarray(a, np.float64)
    y = np.asarray(b, np.float64)
    mse = np.mean((x - y) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
