"""Audio column operators: WAV/PCM decode, vectorized clip features,
spectral fingerprint near-duplicate pairs.

The training-data brief treats audio like image: an opaque ``binary``
column with typed metadata, decoded once inside an Arrow batch stage.
The sandbox has no soundfile/ffmpeg, so — same posture as tiff.py and
jpeg.py — the uncompressed interchange format is implemented from
scratch (RIFF/WAVE PCM, 8/16-bit, any channel count, stdlib struct +
numpy); compressed codecs (mp3/aac/opus) raise ``NotImplementedError``
behind the ``allow_fake`` escape hatch used by the other media stubs.

Scale shape: every operator is a single ``mapInPandas`` projection over
the audio table — per-executor CPU, no shuffle.  The near-dup join is
the engine's standard banded-hamming self-join (16-bit chunks of a
64-bit fingerprint, imageops.phash_near_pairs / textops.simhash
pattern): candidates meet only inside a chunk bucket, never all-pairs,
so it holds at 10^12 clips exactly like the image/text versions.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# RIFF/WAVE PCM codec (from scratch, stdlib only)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sr: int) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — to a
    canonical RIFF/WAVE stream."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"wav_encode: int16 required, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError(f"wav_encode: bad shape {samples.shape}")
    n, ch = a.shape
    data = np.ascontiguousarray(a).tobytes()  # interleaved little-endian
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM (8-bit unsigned or 16-bit signed, any
    channel count) to (int16 samples (n, ch), sample_rate).  Unknown
    RIFF chunks (LIST, fact, ...) are skipped; non-PCM format tags
    fail fast with ValueError (no compressed-codec backend here)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: short fmt chunk")
            tag, ch, sr, _brate, _balign, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise ValueError(f"wav: non-PCM format tag {tag} unsupported")
            if bits not in (8, 16):
                raise ValueError(f"wav: {bits}-bit PCM unsupported")
            if ch == 0:
                raise ValueError("wav: zero channels")
            if sr == 0:
                # would surface later as ZeroDivisionError in
                # clip_features / degenerate fingerprint band edges —
                # fail fast like every other malformed-fmt path
                raise ValueError("wav: zero sample rate")
            fmt = (ch, sr, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt or data chunk")
    ch, sr, bits = fmt
    if bits == 16:
        a = np.frombuffer(pcm[: len(pcm) - (len(pcm) % (2 * ch))], dtype="<i2")
    else:  # 8-bit PCM is unsigned, center at 0 and widen
        a = (
            np.frombuffer(pcm[: len(pcm) - (len(pcm) % ch)], dtype=np.uint8).astype(
                np.int16
            )
            - 128
        ) * 256
    return a.reshape(-1, ch), sr


# ---------------------------------------------------------------------------
# per-clip kernels (pure numpy, one call per clip inside the batch stage)
# ---------------------------------------------------------------------------


def clip_features(samples: np.ndarray, sr: int) -> dict:
    """Deterministic scalar features of one clip: duration, RMS
    loudness, zero-crossing rate, spectral centroid/rolloff (85%),
    silence ratio (frames under -40 dBFS)."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x / 32768.0
    nsamp = len(x)
    dur = nsamp / sr
    if nsamp == 0:
        # a structurally valid WAV may carry an empty data chunk;
        # np.fft.rfft raises on 0 points — emit all-silent features
        # instead of killing the whole mapInPandas batch
        return dict(
            duration_s=0.0, rms=0.0, zcr=0.0, centroid_hz=0.0,
            rolloff_hz=0.0, silence_ratio=1.0,
        )
    rms = float(np.sqrt(np.mean(x * x))) if nsamp else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if nsamp > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(nsamp, d=1.0 / sr)
    power = spec * spec
    total = power.sum()
    if total > 0:
        centroid = float((freqs * power).sum() / total)
        roll = float(freqs[np.searchsorted(np.cumsum(power), 0.85 * total)])
    else:
        centroid = roll = 0.0
    # silence ratio over 20 ms frames
    frame = max(1, int(sr * 0.02))
    nfr = nsamp // frame
    if nfr:
        fr = x[: nfr * frame].reshape(nfr, frame)
        frms = np.sqrt(np.mean(fr * fr, axis=1))
        silence = float(np.mean(frms < 10 ** (-40 / 20)))
    else:
        silence = 0.0
    return dict(
        duration_s=dur,
        rms=rms,
        zcr=zcr,
        centroid_hz=centroid,
        rolloff_hz=roll,
        silence_ratio=silence,
    )


def clip_fingerprint(samples: np.ndarray, sr: int) -> int:
    """64-bit Haitsma-Kalker spectral fingerprint: band energies on a
    9-window x 9-log-band grid; bit (t, b) = sign of the time-and-band
    double difference (E[t,b]-E[t,b+1]) - (E[t-1,b]-E[t-1,b+1]) —
    8x8 = 64 bits.  Amplitude-invariant by construction (differences of
    a scaled spectrum keep their sign) and measured on the synthetic
    clip table at hamming <= 5 under additive noise while distinct
    clips sit >= 19 apart (tests/test_audioops.py)."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) < 128:
        x = np.pad(x, (0, 128 - len(x)))
    nt, nb = 9, 9
    win = len(x) // nt
    nyq = sr / 2.0
    edges = 60.0 * (nyq / 60.0) ** (np.arange(nb + 1) / nb)
    energy = np.empty((nt, nb))
    for t in range(nt):
        seg = x[t * win : (t + 1) * win]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / sr)
        idx = np.searchsorted(freqs, edges)
        for b in range(nb):
            energy[t, b] = spec[idx[b] : max(idx[b + 1], idx[b] + 1)].sum()
    diff = (energy[1:, :-1] - energy[1:, 1:]) - (energy[:-1, :-1] - energy[:-1, 1:])
    bits = (diff > 0).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("rolloff_hz", T.DoubleType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def audio_features(audio: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode-once feature stage over an audio table
    (audio_id, bytes, sr, n_samples, fmt, caption).

    ``fmt='wav'`` decodes for real; compressed fmts raise unless
    ``allow_fake`` (deterministic pseudo-features keyed on audio_id, so
    pipeline plumbing stays runnable — same contract as the image/video
    stubs)."""

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                if row["fmt"] == "wav":
                    samples, sr = wav_decode(bytes(row["bytes"]))
                    feats = clip_features(samples, sr)
                    fp = clip_fingerprint(samples, sr)
                elif allow_fake:
                    d = hashlib.md5(str(row["audio_id"]).encode()).digest()
                    u = [b / 255.0 for b in d[:6]]
                    feats = dict(
                        duration_s=u[0] * 30,
                        rms=u[1],
                        zcr=u[2],
                        centroid_hz=u[3] * 8000,
                        rolloff_hz=u[4] * 12000,
                        silence_ratio=u[5],
                    )
                    fp = int.from_bytes(d[8:16], "big", signed=True)
                else:
                    raise NotImplementedError(
                        f"audio_features: no decoder for fmt {row['fmt']!r} "
                        "(wav is built in; pass allow_fake=True to stub)"
                    )
                rows.append(dict(audio_id=row["audio_id"], fingerprint=fp, **feats))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return audio.mapInPandas(run, FEATURES_SCHEMA)


def audio_near_pairs(features: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate clip pairs by fingerprint hamming distance.

    Input is :func:`audio_features` output (or any table with
    ``audio_id`` + 64-bit ``fingerprint``).  Banded exactly like
    imageops.phash_near_pairs: candidates must share one exact 16-bit
    chunk of 4 (guaranteed for hamming <= 3; recall-oriented above),
    so the self-join meets only inside chunk buckets.

    The (id, fingerprint) base is persisted inside the shared join —
    Spark computes an unpersisted subplan once PER JOIN SIDE, and here
    that subplan is the decode-everything feature stage.  The handle is
    attached to the result (cacheutil) so callers can drop it after
    materializing."""
    from .hashjoin import banded_hamming_pairs

    return banded_hamming_pairs(
        features, "audio_id", "fingerprint", "clip_a", "clip_b", max_hamming
    )
