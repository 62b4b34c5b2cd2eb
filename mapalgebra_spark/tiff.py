"""Baseline TIFF 6.0 codec (stdlib struct + numpy, no dependencies).

The reference's own fixtures are TIFFs (``data/512x512.tif``,
``data/gray512.tif``) read by ``fromRGBA``/``fromGray``
(lib/Geography/MapAlgebra.hs:544-591); this gives the engine the same
first-contact format.  Scope — the class those fixtures live in:

- 8-bit samples, 1 (gray), 3 (RGB) or 4 (RGBA) samples/pixel, chunky
- strip-based layout, both byte orders on read (II written)
- compression: 1 (none), 5 (LZW with the TIFF early-change variant and
  optional horizontal-differencing predictor), 32773 (PackBits)

Encode writes little-endian, single or multi strip, any of the three
compressions — so the decoder is exercised against real compressed
bytes in tests, not just its own inverse.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tags -------------------------------------------------------------------

T_WIDTH = 256
T_LENGTH = 257
T_BITSPERSAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIPOFFSETS = 273
T_SAMPLESPERPIXEL = 277
T_ROWSPERSTRIP = 278
T_STRIPBYTECOUNTS = 279
T_PREDICTOR = 317
T_EXTRASAMPLES = 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 8: 2, 9: 4, 11: 4, 12: 8}

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773


# --- PackBits ----------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of (j-i+1) identical bytes
            out.append(257 - (j - i + 1) & 0xFF)
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch until the next run of >=3 or 128 bytes
        j = i
        while (
            j + 1 < n
            and j - i < 127
            and not (j + 2 < n and data[j + 1] == data[j + 2] == data[j])
        ):
            j += 1
        out.append(j - i)
        out.extend(data[i : j + 1])
        i = j + 1
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal b+1 bytes
            out.extend(data[i : i + b + 1])
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            out.extend(data[i : i + 1] * (257 - b))
            i += 1
        # 128: no-op
    return bytes(out[:expected])


# --- TIFF LZW (MSB-first bit packing, early change) ---------------------------

_CLEAR = 256
_EOI = 257


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # TIFF early change: bump width when next_code is one SHORT of
        # the boundary (the decoder grows its table one step behind)
        if next_code == (1 << width) - 1:
            if width == 12:
                emit(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                width += 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return _EOI
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        prev = entry
        # early change, decoder side: the decoder's table is one insert
        # BEHIND the encoder's when it reads each code (the encoder
        # inserts at emit time; the decoder only on the next code), so
        # it widens at 2^w - 2 where the encoder widened at 2^w - 1.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


# --- encode -------------------------------------------------------------------


def tiff_encode(
    arr: np.ndarray, compression: int = COMP_NONE, rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3|4) RGB(A) → little-endian TIFF."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w, spp = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        h, w, spp = a.shape[0], a.shape[1], a.shape[2]
    else:
        raise ValueError(f"tiff: unsupported shape {a.shape}")
    rps = rows_per_strip or h
    photometric = 1 if spp == 1 else 2  # BlackIsZero / RGB

    raw = a.reshape(h, w * spp)
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = raw[y0 : y0 + rps]
        if predictor == 2:
            px = block.reshape(-1, w, spp).astype(np.int16)
            px[:, 1:, :] -= px[:, :-1, :].copy()
            block = (px & 0xFF).astype(np.uint8).reshape(block.shape)
        sdata = block.tobytes()
        if compression == COMP_PACKBITS:
            sdata = packbits_encode(sdata)
        elif compression == COMP_LZW:
            sdata = lzw_encode(sdata)
        elif compression != COMP_NONE:
            raise ValueError(f"tiff: unsupported compression {compression}")
        strips.append(sdata)

    entries: list[tuple[int, int, int, int | tuple]] = []

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    # layout: header(8) | strip data | [bps/offsets/counts arrays] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()

    def arr_or_inline(values, typ):
        """SHORT/LONG array: inline when it fits in 4 bytes."""
        nonlocal pos
        size = _TYPE_SIZE[typ] * len(values)
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack("<" + fmt * len(values), *values)
            packed += b"\x00" * (4 - len(packed))
            return struct.unpack("<I", packed)[0]
        off = pos + len(extra)
        extra.extend(struct.pack("<" + fmt * len(values), *values))
        return off

    entry(T_WIDTH, 4, 1, w)
    entry(T_LENGTH, 4, 1, h)
    entry(T_BITSPERSAMPLE, 3, spp, arr_or_inline([8] * spp, 3))
    entry(T_COMPRESSION, 3, 1, compression)
    entry(T_PHOTOMETRIC, 3, 1, photometric)
    entry(T_STRIPOFFSETS, 4, len(strips), arr_or_inline(strip_offsets, 4))
    entry(T_SAMPLESPERPIXEL, 3, 1, spp)
    entry(T_ROWSPERSTRIP, 4, 1, rps)
    entry(T_STRIPBYTECOUNTS, 4, len(strips), arr_or_inline([len(s) for s in strips], 4))
    if predictor != 1:
        entry(T_PREDICTOR, 3, 1, predictor)
    if spp == 4:
        entry(T_EXTRASAMPLES, 3, 1, 2)  # unassociated alpha

    ifd_off = pos + len(extra)
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    for s in strips:
        out += s
    out += extra
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # no next IFD
    assert len(out) == ifd_off + 2 + 12 * len(entries) + 4
    return bytes(out)


# --- decode -------------------------------------------------------------------


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 array (h, w) or (h, w, spp). Both byte orders."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError("tiff: bad magic")

    n_entries = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])[0]
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        size = _TYPE_SIZE.get(typ, 1) * count
        vbytes = data[off + 8 : off + 12]
        if size > 4:
            voff = struct.unpack(bo + "I", vbytes)[0]
            vbytes = data[voff : voff + size]
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt is None:
            continue  # rational/ascii etc — not needed for pixel layout
        tags[tag] = list(struct.unpack(bo + fmt * count, vbytes[: _TYPE_SIZE[typ] * count]))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    w = one(T_WIDTH)
    h = one(T_LENGTH)
    spp = one(T_SAMPLESPERPIXEL, 1)
    bps = tags.get(T_BITSPERSAMPLE, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError(f"tiff: only 8-bit samples supported, got {bps}")
    photometric = one(T_PHOTOMETRIC, 1 if spp == 1 else 2)
    if photometric not in (0, 1, 2):
        raise ValueError(
            f"tiff: photometric {photometric} (palette/separation) unsupported"
        )
    planar = one(284, 1)  # PlanarConfiguration: only chunky supported
    if planar != 1:
        raise ValueError(f"tiff: planar configuration {planar} unsupported")
    comp = one(T_COMPRESSION, COMP_NONE)
    predictor = one(T_PREDICTOR, 1)
    rps = one(T_ROWSPERSTRIP, h)
    if T_STRIPOFFSETS not in tags:
        # required tag: fail-fast ValueError like every other
        # malformed-input path (was a raw KeyError)
        raise ValueError("tiff: missing tag StripOffsets (273)")
    offsets = tags[T_STRIPOFFSETS]
    counts = tags.get(T_STRIPBYTECOUNTS)
    if counts is None:
        if comp != COMP_NONE or len(offsets) != 1:
            raise ValueError("tiff: missing StripByteCounts")
        counts = [h * w * spp]

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        expected = nrows * w * spp
        sdata = data[off : off + cnt]
        if comp == COMP_NONE:
            sdata = sdata[:expected]
        elif comp == COMP_PACKBITS:
            sdata = packbits_decode(sdata, expected)
        elif comp == COMP_LZW:
            sdata = lzw_decode(sdata, expected)
        else:
            raise ValueError(f"tiff: unsupported compression {comp}")
        block = np.frombuffer(sdata, dtype=np.uint8).reshape(nrows, w, spp)
        if predictor == 2:
            block = np.cumsum(block.astype(np.int64), axis=1).astype(np.uint8)
        rows.append(block)
    img = np.concatenate(rows, axis=0)
    if photometric == 0:  # MinIsWhite: invert to BlackIsZero
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img[:, :, 0] if spp == 1 else img
