"""Image codecs, from scratch on the stdlib (no Pillow in the sandbox).

Formats supported (all lossless; BASELINE.json input_hint allows lossy
only behind a PSNR>=40 gate, which we don't need):

- ``raw``  — C-order bytes of a (h, w) or (h, w, 4) uint8 array.
- ``npy``  — numpy .npy container (any dtype/shape).
- ``png``  — 8-bit grayscale (colour type 0) or RGBA (colour type 6),
             zlib/DEFLATE, scanline filters 0-4 supported on read,
             filter 0 written.

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
    raise ValueError(f"unknown fmt {fmt!r}")


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
