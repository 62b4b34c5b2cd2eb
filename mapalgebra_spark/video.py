"""MJPEG-in-AVI video container codec, from scratch on the stdlib.

With the baseline JPEG codec (jpeg.py) in place, real video frame
extraction no longer needs ffmpeg for the one container whose frames
ARE JPEG streams: motion-JPEG inside RIFF/AVI.  Each ``00dc`` chunk of
the ``movi`` list is a standalone baseline JPEG; the container adds
only framing and timing.  This module implements:

- :func:`avi_encode` — a minimal standard-compliant AVI writer
  (``hdrl`` with avih + one video ``strl``, ``movi`` with per-frame
  ``00dc`` chunks, ``idx1`` index), frames compressed via
  :func:`mapalgebra_spark.jpeg.jpeg_encode`.
- :func:`avi_frames` — chunk walker returning (frame_idx, jpeg_bytes)
  without decoding pixels (so frame *sampling* skips the IDCT cost of
  frames it drops — the useful property at 10^12-clip scale).
- :func:`avi_meta` — (n_frames, fps, w, h) from the header.

Anything that is not RIFF/AVI with an MJPG video stream fails fast with
ValueError (same malformed-input contract as tiff.py/jpeg.py/wav).
The ``imageops.video_frame_sample`` stage uses this for fmt
``'mjpeg-avi'`` and keeps the documented ``allow_fake`` stub for
compressed codecs the sandbox cannot decode (h264 etc.).
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def avi_encode(frames: list[np.ndarray], fps: int = 30, quality: int = 95) -> bytes:
    """Encode uint8 frames (all same (h, w) or (h, w, 3/4) shape) as an
    MJPEG AVI."""
    if not frames:
        raise ValueError("avi_encode: no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("avi_encode: frames must share one size")
    blobs = [jpeg.jpeg_encode(f, quality=quality) for f in frames]
    n = len(blobs)

    # --- headers -----------------------------------------------------------
    max_bytes = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,   # max bytes per second (upper bound)
        0,                 # padding granularity
        0x10,              # flags: AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    # --- movi + idx1 -------------------------------------------------------
    movi_payload = b""
    index = b""
    offset = 4  # offsets in idx1 count from the start of the 'movi' fourcc
    for blob in blobs:
        ck = _chunk(b"00dc", blob)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(blob))
        movi_payload += ck
        offset += len(ck)
    movi = _list(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", index)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + clen > end:
            raise ValueError("avi: truncated chunk")
        yield fourcc, body_start, clen
        pos = body_start + clen + (clen & 1)


def avi_meta(data: bytes) -> tuple[int, int, int, int]:
    """(n_frames, fps, width, height) from the avih/strh headers."""
    hdrl = _find_list(data, b"hdrl")
    if hdrl is None:
        raise ValueError("avi: missing hdrl")
    start, end = hdrl
    for fourcc, p, clen in _walk_chunks(data, start, end):
        if fourcc == b"avih":
            vals = struct.unpack("<IIIIIIIIIIIIII", data[p : p + 56])
            uspf, n, w, h = vals[0], vals[4], vals[8], vals[9]
            fps = round(1_000_000 / uspf) if uspf else 0
            return n, fps, w, h
    raise ValueError("avi: missing avih")


def _find_list(data: bytes, fourcc: bytes) -> tuple[int, int] | None:
    """(payload_start, payload_end) of the first LIST with that type,
    searching the top level of the RIFF body."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI stream")
    (rlen,) = struct.unpack("<I", data[4:8])
    end = min(8 + rlen, len(data))
    for cc, p, clen in _walk_chunks(data, 12, end):
        if cc == b"LIST" and data[p : p + 4] == fourcc:
            return p + 4, p + clen
    return None


def avi_frames(data: bytes):
    """Yield (frame_idx, jpeg_bytes) for each video chunk, without
    decoding pixels.  Recognizes ``NNdc``/``NNdb`` video chunks of ANY
    stream number (a valid MJPEG AVI whose audio strl is listed first
    carries ``01dc`` video chunks — the old stream-0-only match made
    such clips silently vanish, r3 review finding) but locks onto the
    id of the FIRST such stream, skipping chunks of any other stream,
    and skips ``rec `` grouping lists.  A movi list with no video chunk at all fails fast
    per the module contract."""
    movi = _find_list(data, b"movi")
    if movi is None:
        raise ValueError("avi: missing movi list")
    start, end = movi
    idx = 0
    # lock onto ONE stream: the id of the first dc/db chunk seen.  A
    # file carrying two video streams (or stray db chunks from another
    # stream) must not interleave into a single frame-index sequence
    # and miscount frames (r3 advice).
    stream_id = None

    def walk(s, e):
        nonlocal idx, stream_id
        for cc, p, clen in _walk_chunks(data, s, e):
            if cc == b"LIST" and data[p : p + 4] == b"rec ":
                yield from walk(p + 4, p + clen)
            elif (
                len(cc) == 4
                and cc[:2].isdigit()
                and cc[2:] in (b"dc", b"db")
            ):
                if stream_id is None:
                    stream_id = cc[:2]
                elif cc[:2] != stream_id:
                    continue
                yield idx, data[p : p + clen]
                idx += 1

    yield from walk(start, end)
    if idx == 0:
        raise ValueError("avi: movi list contains no video (dc/db) chunks")


def sample_frames(
    data: bytes, every_n: int = 30, decode: bool = True
) -> list[tuple[int, np.ndarray | bytes]]:
    """Every ``every_n``-th frame (always including frame 0), decoded to
    uint8 arrays (``decode=True``) or raw jpeg bytes.  Skipped frames
    never pay the JPEG IDCT — only container framing is walked."""
    out = []
    for i, blob in avi_frames(data):
        if i % every_n == 0:
            out.append((i, jpeg.jpeg_decode(blob) if decode else blob))
    return out
