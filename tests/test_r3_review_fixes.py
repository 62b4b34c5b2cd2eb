"""Regression pins for the round-3 review findings in the codec /
lineage paths (each was a verified untested failure mode)."""

import numpy as np
import pytest

from mapalgebra_spark import audioops, video
from mapalgebra_spark.jpeg import jpeg_decode, jpeg_encode

pytestmark = []


def test_jpeg_multi_scan_fails_fast():
    """A second SOS (multi-scan / per-component baseline) must raise,
    not silently decode only the last scan's component."""
    pix = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    blob = jpeg_encode(pix, quality=90)
    sos = blob.find(b"\xff\xda")
    eoi = blob.rfind(b"\xff\xd9")
    assert 0 < sos < eoi
    doubled = blob[:eoi] + blob[sos:eoi] + b"\xff\xd9"
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg_decode(doubled)


def test_jpeg_encode_linear_not_quadratic():
    """_BitWriter truncates its accumulator: encoding must not blow up
    superlinearly (pre-fix: ~14x time for 4x pixels via O(n) bigint
    shifts per bit)."""
    import time

    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    big = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    jpeg_encode(small)  # warm
    t0 = time.perf_counter(); jpeg_encode(small); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); jpeg_encode(big); tb = time.perf_counter() - t0
    # 16x pixels: allow generous 60x wall (noise margin); the quadratic
    # bug measured ~120x and grows unboundedly with size
    assert tb < max(0.5, 60 * ts), (ts, tb)


def test_clip_features_empty_clip():
    """A structurally valid WAV may carry an empty data chunk —
    features must be all-silent, not an FFT crash."""
    f = audioops.clip_features(np.zeros((0, 1), dtype=np.int16), 8000)
    assert f["duration_s"] == 0.0 and f["rms"] == 0.0
    assert f["silence_ratio"] == 1.0


def test_wav_zero_sample_rate_fails_fast():
    clip = (np.sin(np.arange(800) / 10.0) * 20000).astype(np.int16)
    data = audioops.wav_encode(clip, 8000)
    # fmt chunk: RIFF(12) + 'fmt '+len(8) + tag(2) + ch(2) -> sr at 24
    patched = data[:24] + b"\x00\x00\x00\x00" + data[28:]
    with pytest.raises(ValueError, match="sample rate"):
        audioops.wav_decode(patched)


def test_avi_non_stream0_video_chunks():
    """An MJPEG AVI whose video stream is not stream 0 (01dc chunks)
    must still yield every frame — not silently none."""
    frames = [
        np.full((32, 48), 40 * (i + 1), dtype=np.uint8) for i in range(4)
    ]
    blob = video.avi_encode(frames, fps=10)
    moved = blob.replace(b"00dc", b"01dc").replace(b"00db", b"01db")
    got = [i for i, _ in video.avi_frames(moved)]
    assert got == [0, 1, 2, 3]


def test_avi_no_video_chunks_fails_fast():
    blob = video.avi_encode([np.zeros((16, 16), dtype=np.uint8)], fps=10)
    # corrupt every video chunk id into an audio-style id ('00wb')
    no_video = blob.replace(b"00dc", b"00wb").replace(b"00db", b"00wb")
    with pytest.raises(ValueError, match="no video"):
        list(video.avi_frames(no_video))


@pytest.mark.spark
def test_lineage_failed_stage_records_metrics(spark, tmp_path):
    """A stage that throws must leave a status='failed' metrics row
    (else 'crashed in stage X' is indistinguishable from 'never
    reached X')."""
    import os

    from mapalgebra_spark.lineage import Job

    job = Job(spark, str(tmp_path), "boom")

    @job.stage("explode")
    def explode(spark_, inputs):
        raise RuntimeError("kaboom")

    with pytest.raises(RuntimeError, match="kaboom"):
        job.run()
    metrics = spark.read.parquet(os.path.join(str(tmp_path), "metrics"))
    rows = metrics.filter("stage = 'explode'").collect()
    assert len(rows) == 1 and rows[0]["status"] == "failed"
