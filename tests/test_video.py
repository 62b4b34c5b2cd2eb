"""MJPEG-AVI container codec + the real video frame-sampling stage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapalgebra_spark import codecs as CC
from mapalgebra_spark import video as V


def _frame(i, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        128 + 60 * np.sin((yy + i * 3) / 7.0) * np.cos((xx - i * 2) / 9.0), 0, 255
    ).astype(np.uint8)


def test_avi_roundtrip_and_meta():
    frames = [_frame(i) for i in range(10)]
    avi = V.avi_encode(frames, fps=25)
    assert V.avi_meta(avi) == (10, 25, 64, 48)
    sampled = V.sample_frames(avi, every_n=3)
    assert [i for i, _ in sampled] == [0, 3, 6, 9]
    for i, arr in sampled:
        assert arr.shape == (48, 64)
        assert CC.psnr(frames[i], arr) >= 40.0


def test_avi_rgb_frames():
    frames = [np.dstack([_frame(i), _frame(i) // 2, 255 - _frame(i)]) for i in range(4)]
    avi = V.avi_encode(frames, fps=10)
    sampled = V.sample_frames(avi, every_n=2)
    assert [a.shape for _, a in sampled] == [(48, 64, 3), (48, 64, 3)]
    assert CC.psnr(frames[0], sampled[0][1]) >= 40.0


def test_sample_without_decode_returns_jpeg_bytes():
    """Frame *sampling* walks container framing only; skipped frames
    never pay the JPEG IDCT (decode=False proves the walk is cheap)."""
    avi = V.avi_encode([_frame(i) for i in range(6)], fps=10)
    raw = V.sample_frames(avi, every_n=5, decode=False)
    assert [i for i, _ in raw] == [0, 5]
    for _, blob in raw:
        assert blob[:2] == b"\xff\xd8"  # each chunk is a standalone JPEG
        from mapalgebra_spark.jpeg import jpeg_decode

        assert jpeg_decode(blob).shape == (48, 64)


def test_avi_rec_grouping_list():
    """Some muxers wrap frames in 'rec ' grouping lists; the walker
    must descend into them."""
    frames = [_frame(i) for i in range(3)]
    avi = bytearray(V.avi_encode(frames, fps=10))
    movi = V._find_list(bytes(avi), b"movi")
    start, end = movi
    inner = bytes(avi[start:end])  # the 00dc chunks (start is already past 'movi')
    rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    rebuilt_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    head = bytes(avi[: start - 12])  # up to the original movi LIST header
    tail = bytes(avi[end + (len(inner) % 2) :])
    out = head + rebuilt_movi + tail
    out = b"RIFF" + struct.pack("<I", len(out) - 8) + out[8:]
    got = list(V.avi_frames(out))
    assert len(got) == 3
    assert CC.psnr(frames[2], __import__("mapalgebra_spark.jpeg", fromlist=["jpeg_decode"]).jpeg_decode(got[2][1])) >= 40


def test_avi_malformed_fail_fast():
    avi = V.avi_encode([_frame(0)], fps=10)
    with pytest.raises(ValueError):
        list(V.avi_frames(b"RIFX" + avi[4:]))
    with pytest.raises(ValueError):
        list(V.avi_frames(avi[:50]))
    with pytest.raises(ValueError):
        list(V.avi_frames(b"RIFF\x04\x00\x00\x00AVI "))
    with pytest.raises(ValueError):
        V.avi_encode([])
    with pytest.raises(ValueError):
        V.avi_encode([_frame(0), _frame(0, h=32)])


def test_video_frame_sample_stage_real_and_stub(spark):
    import pandas as pd

    from mapalgebra_spark import imageops

    frames = [_frame(i) for i in range(7)]
    avi = V.avi_encode(frames, fps=10)
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(media_id="v1", bytes=avi, fmt="mjpeg-avi"),
                dict(media_id="v2", bytes=avi, fmt="mjpeg-avi"),
            ]
        )
    )
    out = imageops.video_frame_sample(media, every_n=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert sorted(by_id) == ["v1", "v2"]
    assert sorted(r["frame_idx"] for r in by_id["v1"]) == [0, 3, 6]
    # frames are engine-png round-trippable and faithful
    png = next(r["frame"] for r in by_id["v1"] if r["frame_idx"] == 3)
    arr = CC.png_decode(bytes(png))
    assert CC.psnr(frames[3], arr) >= 40.0

    h264 = spark.createDataFrame(
        pd.DataFrame([dict(media_id="x", bytes=b"junk", fmt="h264")])
    )
    with pytest.raises(Exception):
        imageops.video_frame_sample(h264).collect()
    fake = imageops.video_frame_sample(h264, allow_fake=True).collect()
    assert len(fake) == 3  # deterministic pseudo-frames
