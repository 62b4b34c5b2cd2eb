"""Baseline JPEG (ITU-T T.81 / JFIF) codec, from scratch on numpy.

Closes the last codec stub: the sandbox ships no Pillow/libjpeg, and the
``input_hint`` image table carries a ``fmt`` column whose lossy clause
demands decoded-pixel PSNR >= 40 dB.  ``qdct`` (codecs.py) satisfied
that with a JPEG-*style* format; this module implements the real
interchange format so a table whose ``bytes`` hold actual ``.jpg`` data
decodes on this engine with no external dependency — the same posture
as the from-scratch TIFF 6.0 codec (tiff.py).

Scope (decode): baseline sequential DCT (SOF0; SOF1 accepted — the
8-bit subset is wire-identical), any number of DQT/DHT tables, 1- and
3-component scans, arbitrary 1-2x sampling factors (4:4:4, 4:2:2,
4:2:0, 4:4:0), restart markers (DRI/RSTn), APPn/COM skipping, JFIF
full-range BT.601 YCbCr->RGB.  Progressive (SOF2) and arithmetic
coding raise ValueError (fail-fast, same contract as tiff.py).

Scope (encode): baseline SOF0, quality-scaled Annex K quantization
tables (libjpeg's linear scaling formula), the Annex K "typical"
Huffman tables, 4:4:4 or 4:2:0, optional restart interval.  Grayscale
(h,w) and RGB (h,w,3) are encoded natively; RGBA drops alpha (JPEG has
no alpha channel — documented lossy, like any jpeg export).

Everything is vectorized where the format allows: the DCT/IDCT run as
batched 8x8 matrix products over all blocks at once; Huffman decode is
a 16-bit-peek table lookup per symbol (the only inherently serial part
of the format).  At 100 TB the decode cost rides inside the
decode-once Arrow batch stage (imageops.thumbnails) exactly like the
other codecs — per-executor CPU, no shuffle implications.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

#: zigzag order: ZIGZAG[i] = raster index of the i-th coefficient in
#: zigzag scan order (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # raster index -> zigzag position

#: Annex K Table K.1 / K.2 quantization tables (also used by qdct)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II orthonormal basis matrix: row k = c(k) cos((2n+1)k pi/16)
_N = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16.0)
_DCT[0, :] = 1.0 / np.sqrt(8.0)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """DCT-II over (n, 8, 8) blocks: D @ B @ D.T, batched."""
    return np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_fdct_blocks` (orthonormal, so transpose)."""
    return np.einsum("ji,njk,kl->nil", _DCT, coefs, _DCT, optimize=True)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality->scale mapping over the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QT_CHROM * scale + 50) // 100, 1, 255)
    return lum.astype(np.int64), chrom.astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, code, length) triples per T.81 Annex C code assignment."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffEncoder:
    """symbol -> (code, length) map for entropy encoding."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits = bits
        self.vals = vals
        self.map = {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


class _HuffDecoder:
    """16-bit-peek lookup decoder.

    ``peek[v]`` for a 16-bit window v gives the decoded symbol and
    ``size[v]`` its code length; one table lookup per symbol instead of
    a bit-by-bit tree walk.  Max T.81 code length is 16, so the window
    always contains a full code.
    """

    def __init__(self, bits: list[int], vals: list[int]):
        self.peek = np.full(1 << 16, -1, dtype=np.int32)
        self.size = np.zeros(1 << 16, dtype=np.int32)
        for sym, code, ln in _canonical_codes(bits, vals):
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            self.peek[base : base + span] = sym
            self.size[base : base + span] = ln


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # truncate the accumulator to the residual bits: without this
        # the Python int grows with every bit ever written and each
        # shift becomes O(stream length) — quadratic encode (measured
        # 14x time for 4x pixels before the fix)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


#: MSB-first bit weights, hoisted: peek16/read run once per Huffman
#: symbol — rebuilding the power array per call was the entropy-decode
#: hot loop's dominant allocation (r3 review finding)
_POW2_16 = (1 << np.arange(15, -1, -1, dtype=np.int64))


class _BitReader:
    """MSB-first reader over a destuffed entropy segment.

    The byte stream is expanded once to a uint8 bit array; ``peek16``
    is then a vector-free integer assembled from at most three byte
    reads — cheap enough that Huffman decode runs at table-lookup
    speed.
    """

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, dtype=np.uint8)
        self.bits = np.unpackbits(arr)
        # pad so peek16 near the end never indexes out of bounds; pad
        # with 1s (the marker-adjacent padding convention)
        self.bits = np.concatenate([self.bits, np.ones(16, dtype=np.uint8)])
        self.pos = 0
        self.limit = len(arr) * 8

    def peek16(self) -> int:
        b = self.bits[self.pos : self.pos + 16]
        return int(b.dot(_POW2_16))

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:
            # the _POW2_16 weight slice below is only correct for
            # n <= 16 (baseline's max receive length); larger n would
            # silently return wrong values (r3 advice)
            raise ValueError(f"_BitReader.read: n={n} > 16 unsupported")
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        return int(b.dot(_POW2_16[16 - n :]))


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _csize(v: int) -> int:
    """Bit category of a coefficient value (T.81 F.1.2.1.1)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """Full-range BT.601 RGB->YCbCr (JFIF 1.02 section 7)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _from_ycbcr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _plane_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad a (h, w) plane to (8*bh, 8*bw) by edge replication and cut
    into (bh*bw, 8, 8) raster-ordered blocks."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, 8 * bh - h), (0, 8 * bw - w)), mode="edge")
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def _quantize_plane(plane: np.ndarray, qt: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """(bh*bw, 64) zigzag-ordered quantized int coefficients."""
    blocks = _plane_blocks(plane.astype(np.float64) - 128.0, bh, bw)
    coefs = _fdct_blocks(blocks).reshape(-1, 64)
    q = np.round(coefs / qt[None, :].astype(np.float64)).astype(np.int64)
    return q[:, ZIGZAG]


def _encode_block(
    bw_: _BitWriter, zz: np.ndarray, pred: int, dc: _HuffEncoder, ac: _HuffEncoder
) -> int:
    diff = int(zz[0]) - pred
    size = _csize(diff)
    code, ln = dc.map[size]
    bw_.write(code, ln)
    if size:
        v = diff if diff >= 0 else diff + (1 << size) - 1
        bw_.write(v, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, ln = ac.map[0xF0]
            bw_.write(zrl, ln)
            run -= 16
        size = _csize(v)
        code, ln = ac.map[(run << 4) | size]
        bw_.write(code, ln)
        bw_.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        eob, ln = ac.map[0x00]
        bw_.write(eob, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table_zz: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(x) for x in table_zz)
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 95,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 (h,w) grayscale / (h,w,3) RGB / (h,w,4) RGBA (alpha
    dropped) to a baseline JFIF stream.

    ``subsample=True`` writes 4:2:0 chroma; the default (4:4:4,
    quality 95) clears the input_hint's PSNR >= 40 dB gate on natural
    imagery (tested); lower qualities trade that off explicitly.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's resync path; also what a parallel
    encoder would emit).
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"jpeg_encode: uint8 required, got {a.dtype}")
    if a.ndim == 3 and a.shape[2] == 4:
        a = a[:, :, :3]
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"jpeg_encode: unsupported shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode: empty image")
    qlum, qchrom = quality_tables(quality)

    dc_l = _HuffEncoder(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _HuffEncoder(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _HuffEncoder(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _HuffEncoder(AC_CHROM_BITS, AC_CHROM_VALS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # quantization tables are held in raster order; DQT wants zigzag
    # (entry i = Q at raster index ZIGZAG[i])
    out += _dqt_segment(0, qlum[ZIGZAG])
    if not gray:
        out += _dqt_segment(1, qchrom[ZIGZAG])

    # SOF0
    if gray:
        comps = [(1, 1, 1, 0)]  # (id, hsamp, vsamp, tq)
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    out += _dht_segment(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht_segment(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += _dht_segment(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # SOS
    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # DC table i == AC table i here
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component zigzag coefficient arrays, raster block order
    if gray:
        planes = [a.astype(np.float64)]
    else:
        ycc = _to_ycbcr(a)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    comp_zz = []
    comp_bw = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            # 4:2:0 downsample by exact 2x2 (or 2x1) box mean over an
            # edge-padded even-sized plane
            fy, fx = vmax // vs, hmax // hs
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            pp = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        bh = mcuy * vs
        bwid = mcux * hs
        qt = qlum if tq == 0 else qchrom
        comp_zz.append(_quantize_plane(plane, qt, bh, bwid))
        comp_bw.append(bwid)

    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * comp_bw[ci] + (mx * hs + bx)
                        preds[ci] = _encode_block(
                            writer, comp_zz[ci][bi], preds[ci], dc, ac
                        )
            mcu_idx += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "hs", "vs", "tq", "dc_tbl", "ac_tbl", "bw", "bh", "zz")

    def __init__(self, cid, hs, vs, tq):
        self.cid, self.hs, self.vs, self.tq = cid, hs, vs, tq


def _decode_scan_interval(
    reader: _BitReader, comps, order, mcus: int, mcux: int
) -> None:
    """Decode ``mcus`` MCUs from one restart interval into the
    components' zigzag arrays; DC predictors start at 0."""
    preds = {c.cid: 0 for c in comps}
    for m in range(mcus):
        my, mx = divmod(m + order[0], mcux)
        for c in comps:
            dc_peek, dc_size = c.dc_tbl.peek, c.dc_tbl.size
            ac_peek, ac_size = c.ac_tbl.peek, c.ac_tbl.size
            for by in range(c.vs):
                for bx in range(c.hs):
                    bi = (my * c.vs + by) * c.bw + (mx * c.hs + bx)
                    zz = c.zz[bi]
                    # DC
                    win = reader.peek16()
                    sym = int(dc_peek[win])
                    if sym < 0:
                        raise ValueError("jpeg: invalid DC Huffman code")
                    reader.pos += int(dc_size[win])
                    preds[c.cid] += _extend(reader.read(sym), sym)
                    zz[0] = preds[c.cid]
                    # AC
                    k = 1
                    while k <= 63:
                        win = reader.peek16()
                        sym = int(ac_peek[win])
                        if sym < 0:
                            raise ValueError("jpeg: invalid AC Huffman code")
                        reader.pos += int(ac_size[win])
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0x0F
                        k += run
                        if k > 63:
                            raise ValueError("jpeg: AC run past block end")
                        zz[k] = _extend(reader.read(size), size)
                        k += 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG stream to uint8 (h, w) or (h, w, 3).

    Fail-fast ValueError on anything outside baseline sequential scope
    (progressive, arithmetic, 12-bit) — same malformed-input contract
    as tiff.py.
    """
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[_Component] = []
    h = w = 0
    restart_interval = 0
    scan_data = None
    scan_order: list[_Component] = []

    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # T.81 fill bytes before a marker
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("jpeg: truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc_th = seg[i]
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("jpeg: truncated DHT")
                huff[(tc_th >> 4, tc_th & 0x0F)] = _HuffDecoder(bits, vals)
                i += 17 + nvals
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq == 0:
                    tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                    i += 65
                elif pq == 1:
                    tbl = (
                        np.frombuffer(seg[i + 1 : i + 129], dtype=">u2")
                        .astype(np.int64)
                    )
                    i += 129
                else:
                    raise ValueError("jpeg: bad DQT precision")
                if len(tbl) != 64:
                    raise ValueError("jpeg: truncated DQT")
                # store in raster order
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tbl
                qtables[tq] = raster
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline-compatible)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"jpeg: {nc}-component images unsupported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                c = _Component(cid, samp >> 4, samp & 0x0F, tq)
                if not (1 <= c.hs <= 4 and 1 <= c.vs <= 4):
                    raise ValueError("jpeg: bad sampling factors")
                comps.append(c)
        elif marker == 0xC2:
            raise ValueError("jpeg: progressive (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: SOF{marker - 0xC0} not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("jpeg: SOS before SOF")
            if scan_data is not None:
                # a second SOS = multi-scan (non-interleaved per
                # component) baseline file; silently decoding only the
                # LAST scan would leave the other planes zero (r3
                # review finding) — fail fast per the module contract
                raise ValueError(
                    "jpeg: multi-scan baseline (one scan per component) "
                    "not supported; re-encode interleaved"
                )
            ns = seg[0]
            if ns != len(comps):
                raise ValueError(
                    f"jpeg: partial scan ({ns} of {len(comps)} components) "
                    "not supported"
                )
            scan_order = []
            for si in range(ns):
                cs, tables = seg[1 + 2 * si : 3 + 2 * si]
                match = [c for c in comps if c.cid == cs]
                if not match:
                    raise ValueError(f"jpeg: scan references unknown component {cs}")
                c = match[0]
                td, ta = tables >> 4, tables & 0x0F
                if (0, td) not in huff or (1, ta) not in huff:
                    raise ValueError("jpeg: scan references missing Huffman table")
                c.dc_tbl = huff[(0, td)]
                c.ac_tbl = huff[(1, ta)]
                scan_order.append(c)
            ss, se, ah_al = seg[1 + 2 * ns : 4 + 2 * ns]
            if ss != 0 or se != 63 or ah_al != 0:
                raise ValueError("jpeg: non-baseline spectral selection")
            # entropy-coded data runs from here to the next non-RST marker
            p = pos + seglen
            start = p
            while p < n - 1:
                if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scan_data = data[start:p]
            pos = p
            continue
        # APPn, COM, others: skipped
        pos += seglen

    if scan_data is None or not comps:
        raise ValueError("jpeg: no scan data")

    if len(comps) == 1:
        # T.81 A.2: a single-component scan is non-interleaved — one
        # data unit per MCU in the component's own block raster,
        # whatever sampling factors the SOF declared
        comps[0].hs = comps[0].vs = 1
    hmax = max(c.hs for c in comps)
    vmax = max(c.vs for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy
    for c in comps:
        c.bw = mcux * c.hs
        c.bh = mcuy * c.vs
        c.zz = np.zeros((c.bw * c.bh, 64), dtype=np.int64)

    # split on RST markers; each interval decodes with fresh predictors
    if restart_interval:
        segments = []
        cur = bytearray()
        i = 0
        sd = scan_data
        while i < len(sd):
            if sd[i] == 0xFF and i + 1 < len(sd):
                nxt = sd[i + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
            cur.append(sd[i])
            i += 1
        segments.append(bytes(cur))
        done = 0
        for seg_bytes in segments:
            count = min(restart_interval, total_mcus - done)
            if count <= 0:
                break
            _decode_scan_interval(
                _BitReader(seg_bytes), scan_order, [done], count, mcux
            )
            done += count
        if done < total_mcus:
            raise ValueError("jpeg: scan ended before all MCUs decoded")
    else:
        destuffed = scan_data.replace(b"\xff\x00", b"\xff")
        _decode_scan_interval(
            _BitReader(destuffed), scan_order, [0], total_mcus, mcux
        )

    # dequantize + IDCT per component, batched
    planes = []
    for c in comps:
        if c.tq not in qtables:
            raise ValueError(f"jpeg: missing quant table {c.tq}")
        qt = qtables[c.tq]
        raster = np.zeros_like(c.zz)
        raster[:, ZIGZAG] = c.zz  # zigzag position i -> raster ZIGZAG[i]
        coefs = (raster * qt[None, :]).astype(np.float64).reshape(-1, 8, 8)
        blocks = _idct_blocks(coefs) + 128.0
        plane = (
            blocks.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # upsample to full MCU grid resolution by pixel replication
        fy, fx = vmax // c.vs, hmax // c.hs
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _from_ycbcr(planes[0], planes[1], planes[2])
