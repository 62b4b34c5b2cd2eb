"""Audio column operators: WAV codec round-trips + malformed probes,
feature kernels against analytic signals, fingerprint robustness /
discrimination, and the Spark decode-once + banded near-dup stages."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapalgebra_spark import audioops as A
from mapalgebra_spark.datagen import generate_audio_df, render_clip

SR = 8000


# ---------------------------------------------------------------------------
# WAV codec
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo():
    clip = render_clip(1, sr=SR)
    dec, sr = A.wav_decode(A.wav_encode(clip, SR))
    assert sr == SR and dec.shape == (len(clip), 1)
    assert np.array_equal(dec[:, 0], clip)
    stereo = np.stack([clip, clip // 3], axis=1)
    dec2, _ = A.wav_decode(A.wav_encode(stereo, SR))
    assert np.array_equal(dec2, stereo)


def test_wav_8bit_decode():
    """8-bit PCM is unsigned; decoder recenters and widens to int16."""
    vals = np.array([0, 128, 255, 200], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + vals.tobytes()
    dec, sr = A.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert sr == SR
    assert np.array_equal(dec[:, 0], (vals.astype(np.int16) - 128) * 256)


def test_wav_skips_unknown_chunks_and_word_alignment():
    clip = render_clip(2, sr=SR)
    enc = A.wav_encode(clip, SR)
    # splice an odd-length LIST chunk (word-aligned with a pad byte)
    # between fmt and data
    head, rest = enc[:12], enc[12:]
    fmt_chunk = rest[: 8 + 16]
    data_chunk = rest[8 + 16 :]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = head + fmt_chunk + junk + data_chunk
    dec, _ = A.wav_decode(patched)
    assert np.array_equal(dec[:, 0], clip)


def test_wav_malformed_fail_fast():
    clip = render_clip(3, sr=SR)
    enc = A.wav_encode(clip, SR)
    with pytest.raises(ValueError):
        A.wav_decode(b"OggS" + enc[4:])
    with pytest.raises(ValueError):
        A.wav_decode(enc[: len(enc) // 2])  # truncated data chunk
    bad_tag = bytearray(enc)
    bad_tag[20] = 85  # fmt tag -> 0x55 (mp3): not PCM
    with pytest.raises(ValueError):
        A.wav_decode(bytes(bad_tag))
    with pytest.raises(ValueError):
        A.wav_encode(clip.astype(np.float64), SR)


# ---------------------------------------------------------------------------
# feature kernels vs analytic signals
# ---------------------------------------------------------------------------


def test_features_pure_tone():
    t = np.arange(SR) / SR
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    f = A.clip_features(tone, SR)
    assert f["duration_s"] == pytest.approx(1.0)
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    # a 1 kHz sine crosses zero 2*f times per second
    assert f["zcr"] == pytest.approx(2000 / SR, rel=0.01)
    assert f["centroid_hz"] == pytest.approx(1000, rel=0.02)
    assert f["rolloff_hz"] == pytest.approx(1000, rel=0.02)
    assert f["silence_ratio"] == 0.0


def test_features_silence_and_empty_guards():
    silent = np.zeros(SR // 2, dtype=np.int16)
    f = A.clip_features(silent, SR)
    assert f["rms"] == 0.0 and f["silence_ratio"] == 1.0
    tiny = np.array([100, -100], dtype=np.int16)
    f2 = A.clip_features(tiny, SR)  # shorter than one 20ms frame
    assert f2["duration_s"] == pytest.approx(2 / SR)


# ---------------------------------------------------------------------------
# fingerprint
# ---------------------------------------------------------------------------


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_fingerprint_robust_and_discriminative():
    rng = np.random.default_rng(0)
    clips = [render_clip(i, sr=SR) for i in range(12)]
    fps = [A.clip_fingerprint(c, SR) for c in clips]
    for c, fp in zip(clips, fps):
        noisy = np.clip(
            c.astype(np.int32) + rng.integers(-80, 81, len(c)), -32768, 32767
        ).astype(np.int16)
        assert _ham(fp, A.clip_fingerprint(noisy, SR)) <= 8
        # sign-of-difference bits are exactly amplitude-invariant
        assert A.clip_fingerprint((c // 2).astype(np.int16), SR) == fp
    cross = [_ham(fps[i], fps[j]) for i in range(12) for j in range(i + 1, 12)]
    assert min(cross) >= 12


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------


def test_audio_features_stage_and_near_pairs(spark):
    """Decode-once feature stage over a generated WAV table; planted
    near-duplicates (same clip, small noise, new id) come back from the
    banded hamming join with zero false pairs."""
    base = generate_audio_df(spark, 10, num_partitions=2, sr=SR)
    feats = A.audio_features(base)
    rows = {r["audio_id"]: r for r in feats.collect()}
    assert len(rows) == 10
    # stage output equals the local kernels exactly
    clip0 = render_clip(0, sr=SR)
    local = A.clip_features(clip0, SR)
    got = rows["clip00000000"]
    assert got["rms"] == pytest.approx(local["rms"])
    assert got["fingerprint"] == A.clip_fingerprint(clip0, SR)

    # plant near-dups of clips 0 and 3
    import pandas as pd

    rng = np.random.default_rng(7)
    planted = []
    for src in (0, 3):
        c = render_clip(src, sr=SR)
        noisy = np.clip(
            c.astype(np.int32) + rng.integers(-60, 61, len(c)), -32768, 32767
        ).astype(np.int16)
        planted.append(
            dict(
                audio_id=f"dup{src:08d}",
                bytes=A.wav_encode(noisy, SR),
                sr=SR,
                n_samples=len(noisy),
                fmt="wav",
                caption="planted dup",
            )
        )
    full = base.unionByName(spark.createDataFrame(pd.DataFrame(planted), base.schema))
    pairs = A.audio_near_pairs(A.audio_features(full), max_hamming=8).collect()
    got_pairs = {(p["clip_a"], p["clip_b"]) for p in pairs}
    assert ("clip00000000", "dup00000000") in got_pairs
    assert ("clip00000003", "dup00000003") in got_pairs
    assert len(got_pairs) == 2  # nothing else is near


def test_audio_features_fake_and_fail(spark):
    import pandas as pd

    mp3 = spark.createDataFrame(
        pd.DataFrame(
            [dict(audio_id="m1", bytes=b"\xff\xfb junk", sr=44100, n_samples=0,
                  fmt="mp3", caption="x")]
        )
    )
    with pytest.raises(Exception):  # NotImplementedError crosses the py4j barrier
        A.audio_features(mp3).collect()
    fake = A.audio_features(mp3, allow_fake=True).collect()
    assert len(fake) == 1 and fake[0]["duration_s"] >= 0
