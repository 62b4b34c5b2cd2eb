"""Multimodal column operators: image / audio / video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shape, partitioning) is
real and tested; payload transforms fall into two classes:

- **real**: PNG/raw/npy/TIFF/qdct/JPEG decode (all from-scratch codecs
  — jpeg.py is a real baseline T.81 implementation), block-mean
  resize, grayscale collapse, perceptual hash — pure numpy.
- **stubbed**: vision-model embeddings, audio decode, video frame
  extraction — the sandbox has no model weights/ffmpeg/torchcodec, so
  these raise ``NotImplementedError`` behind an import-try
  (``_HAS_*`` flags), or produce a clearly-marked deterministic fake
  when ``allow_fake=True`` so pipelines exercising the plumbing stay
  runnable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

try:  # pragma: no cover - not present in this sandbox
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def block_mean_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downsample (area interpolation) of a
    (h, w) or (h, w, c) uint8 image — pure numpy, no image libs.

    Fully vectorized via an integral image: each output pixel's block
    sum is four lookups in the 2-D prefix sum.  Bit-identical to the
    naive per-block ``blk.mean()`` double loop it replaced (and hash-
    compared against it in tests): every partial sum of uint8 pixels is
    an integer < 2^53, so both the cumulative and the per-block sums
    are EXACT in float64 and the final division sees identical
    numerator/denominator.  The loop version cost out_h*out_w tiny
    numpy calls per image inside the decode-once thumbnail stage — the
    one stage that touches every image of a 10^12-image table."""
    raw = np.asarray(arr)
    h, w = raw.shape[:2]
    if (
        np.issubdtype(raw.dtype, np.integer) and raw.dtype.itemsize == 1
        and h % out_h == 0 and w % out_w == 0 and h >= out_h and w >= out_w
    ):
        # divisible 8-bit fast path (the 2^n thumbnail case): one
        # integer reshape-sum straight off the uint8 input — exact
        # int64 sums (can't overflow from 8-bit values), same division
        # as the general path, no float64 image copy.  Float and wide-
        # int inputs take the integral-image path below, which averages
        # true values (an int64 sum would truncate fractions)
        bh, bw = h // out_h, w // out_w
        sums = raw.reshape((out_h, bh, out_w, bw) + raw.shape[2:]).sum(
            axis=(1, 3), dtype=np.int64
        )
        out = sums / float(bh * bw)
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    a = np.asarray(arr, dtype=np.float64)
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # block bounds; lower bound forced non-empty (matches the old
    # max(ys[i+1], ys[i]+1) guard for out dims > in dims)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    S = np.zeros((h + 1, w + 1) + a.shape[2:], dtype=np.float64)
    np.cumsum(a, axis=0, out=S[1:, 1:])
    np.cumsum(S[1:, 1:], axis=1, out=S[1:, 1:])
    sums = (
        S[np.ix_(y1, x1)] - S[np.ix_(y0, x1)] - S[np.ix_(y1, x0)] + S[np.ix_(y0, x0)]
    )
    counts = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    if a.ndim == 3:
        counts = counts[..., None]
    out = sums / counts
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Arbitrary-size bilinear resample (up OR down) of a (h, w) or
    (h, w, c) image — fully vectorized numpy, half-pixel-center
    convention (like OpenCV INTER_LINEAR / PIL BILINEAR), edges
    clamped.  Identity-exact when out dims == in dims (tested)."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[:2]
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None]
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :]
    if a.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    tl = a[np.ix_(y0, x0)]
    tr_ = a[np.ix_(y0, x1)]
    bl = a[np.ix_(y1, x0)]
    br = a[np.ix_(y1, x1)]
    top = tl + (tr_ - tl) * fx
    bot = bl + (br - bl) * fx
    out = top + (bot - top) * fy
    if np.issubdtype(np.asarray(arr).dtype, np.integer):
        info = np.iinfo(np.asarray(arr).dtype)
        return np.clip(np.round(out), info.min, info.max).astype(np.asarray(arr).dtype)
    return out


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("th", T.IntegerType()),
        T.StructField("tw", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ]
)


def thumbnails(images: DataFrame, size: int = 32) -> DataFrame:
    """Decode → block-mean resize → raw thumbnail + phash, one Arrow
    batch stage over the image table (real, lossless codecs only)."""

    def run(batches):
        for pdf in batches:
            ids, blobs, phs = [], [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                pix = codecs.decode_image(row["bytes"], row["fmt"], int(row["w"]), int(row["h"]))
                tn = block_mean_resize(pix, size, size)
                ids.append(row["image_id"])
                blobs.append(tn.tobytes())
                phs.append(codecs.phash64(tn))
            yield pd.DataFrame(
                {"image_id": ids, "thumb": blobs, "th": size, "tw": size, "phash": phs}
            )

    return images.mapInPandas(run, THUMB_SCHEMA)


EMBED_DIM = 64

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("model", T.StringType()),
    ]
)


def image_features(images: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Feature-extraction stage.  No vision model ships in this sandbox:
    raises NotImplementedError unless ``allow_fake`` — then emits a
    deterministic 'fake-dct8x8' embedding (flattened 8x8 block-mean,
    zero-centered, L2-normalized) that keeps the downstream ANN
    plumbing (simsearch.py) real and testable."""
    if not allow_fake and not _HAS_PIL:
        raise NotImplementedError(
            "image_features: no vision backend in this environment; "
            "pass allow_fake=True for the deterministic fake embedding"
        )

    def run(batches):
        for pdf in batches:
            ids, embs = [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                pix = codecs.decode_image(row["bytes"], row["fmt"], int(row["w"]), int(row["h"]))
                small = block_mean_resize(pix, 8, 8).astype(np.float64)
                if small.ndim == 3:
                    small = small.mean(axis=2)
                v = small.ravel() - small.mean()
                n = np.linalg.norm(v)
                v = v / n if n > 0 else v
                ids.append(row["image_id"])
                embs.append([float(x) for x in v])
            yield pd.DataFrame(
                {"image_id": ids, "embedding": embs, "model": "fake-dct8x8"}
            )

    return images.mapInPandas(run, FEATURE_SCHEMA)


def phash_near_pairs(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance,
    bucketed on 16-bit phash chunks (same banding as textops.simhash:
    a pair within hamming<=3 shares at least one exact chunk of 4;
    larger budgets are recall-oriented).  Join is chunk-bucketed —
    never a full cross join.

    The (id, phash) base is persisted inside the shared join — an
    unpersisted subplan runs once PER JOIN SIDE, and when the caller
    passes thumbnails() output directly that subplan decodes every
    image.  Handle attached via cacheutil for post-materialization
    release."""
    from .hashjoin import banded_hamming_pairs

    return banded_hamming_pairs(
        images, "image_id", "phash", "img_a", "img_b", max_hamming
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)
AUDIO_SCHEMA = FRAME_SCHEMA  # historical alias


def video_frame_sample(media: DataFrame, every_n: int = 30, allow_fake: bool = False) -> DataFrame:
    """Frame-sampling stage for video binary columns.

    fmt ``'mjpeg-avi'`` decodes for REAL (video.py container walk +
    jpeg.py frame decode — skipped frames never pay the IDCT); frames
    come back as png-encoded binary.  Compressed codecs (h264 etc.)
    have no sandbox backend: NotImplementedError, or deterministic
    pseudo-frames with ``allow_fake=True`` (same stub contract as the
    other media ops).  A media table without a ``fmt`` column is
    treated as all-unknown (the pre-round-3 behavior)."""

    def run(batches):
        from . import video as VV

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                mid = row["media_id"]
                fmt = row["fmt"] if "fmt" in pdf.columns else None
                if fmt == "mjpeg-avi":
                    for i, arr in VV.sample_frames(bytes(row["bytes"]), every_n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(codecs.png_encode(_as_gray_or_rgba(arr)))
                elif allow_fake:
                    seed = int.from_bytes(hashlib.md5(mid.encode()).digest()[:4], "big")
                    rng = np.random.default_rng(seed)
                    for k in range(3):  # fake: 3 sampled frames
                        ids.append(mid)
                        idxs.append(k * every_n)
                        frames.append(
                            rng.integers(0, 256, (16, 16), dtype=np.uint8).tobytes()
                        )
                else:
                    raise NotImplementedError(
                        f"video_frame_sample: no backend for fmt {fmt!r} "
                        "(mjpeg-avi is built in; pass allow_fake=True to stub)"
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def _as_gray_or_rgba(arr: np.ndarray) -> np.ndarray:
    """The engine's png codec writes gray or RGBA; widen RGB frames."""
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[2] == 4):
        return arr
    out = np.empty((*arr.shape[:2], 4), np.uint8)
    out[..., :3] = arr
    out[..., 3] = 255
    return out
