"""Deterministic synthetic image+caption table generator.

Produces the exact ``input_hint`` schema from BASELINE.json:

    (image_id string, bytes binary, w int32, h int32, fmt string,
     caption string, phash int64)

Pixels are seeded-numpy mixtures of smooth gradients and gaussian bumps
(terrain-like, so surficial ops — fgradient/faspect/fdownstream — have
non-trivial structure), grayscale or RGBA, encoded with the stdlib
codecs (all lossless: raw/npy/png).  Seed-fixed; no external data.

Generation is *distributed*: the driver plans (image_id, seed) rows and
a mapInPandas stage renders+encodes — so bench-scale tables never pass
through the driver.  A skewed spatial distribution is available for the
salting/AQE demonstration: a fraction of images pile into one hot cell.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

#: (w, h) variants; 300x200 exercises partial-tile clipping (FIXTURES.md §1)
SIZES = [(256, 256), (512, 512), (300, 200)]
FMTS = ["raw", "npy", "png"]


def render_pixels(i: int, w: int, h: int, rgba: bool) -> np.ndarray:
    """Deterministic terrain for image index i: gradients + gaussian
    bumps, uint8."""
    rng = np.random.default_rng(42 + i)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    z = (
        rng.uniform(-1, 1) * xx / max(w, 1)
        + rng.uniform(-1, 1) * yy / max(h, 1)
    ) * 80.0
    for _ in range(4):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        s = rng.uniform(8, max(w, h) / 3)
        a = rng.uniform(-90, 90)
        z += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    z = z - z.min()
    z = (z / max(z.max(), 1e-9) * 255.0).astype(np.uint8)
    if not rgba:
        return z
    out = np.empty((h, w, 4), np.uint8)
    out[..., 0] = z
    out[..., 1] = np.roll(z, h // 3, axis=0)
    out[..., 2] = np.roll(z, w // 3, axis=1)
    out[..., 3] = 255
    return out


def image_row(i: int, fmts: list[str] | None = None) -> dict:
    fmts = fmts or FMTS
    w, h = SIZES[i % len(SIZES)]
    fmt = fmts[(i // len(SIZES)) % len(fmts)]
    rgba = i % 7 == 3  # a minority of RGBA images
    pix = render_pixels(i, w, h, rgba)
    return dict(
        image_id=f"img{i:08d}",
        bytes=codecs.encode_image(pix, fmt),
        w=w,
        h=h,
        fmt=fmt,
        caption=f"synthetic terrain {i} seed42",
        phash=codecs.phash64(pix),
    )


def synthetic_latlng(image_id: str, hot_fraction: float = 0.0) -> tuple[float, float]:
    """Deterministic pseudo-location for an image (the input table has
    no geo columns; the engine derives the anchor cell from the id).
    ``hot_fraction`` > 0 piles that share of images onto one hot spot —
    the skew knob for the salting/AQE benchmark."""
    d = hashlib.md5(image_id.encode()).digest()
    u1 = int.from_bytes(d[0:4], "big") / 2**32
    u2 = int.from_bytes(d[4:8], "big") / 2**32
    u3 = int.from_bytes(d[8:12], "big") / 2**32
    if hot_fraction > 0 and u3 < hot_fraction:
        return 45.0, 7.0  # hot cell
    return u1 * 170.0 - 85.0, u2 * 360.0 - 180.0


def generate_images_df(
    spark: SparkSession, n: int, num_partitions: int | None = None,
    fmts: list[str] | None = None,
) -> DataFrame:
    """Distributed generation of n images.  ``fmts`` may include the
    lossy ``qdct`` format (PSNR >= 40 gate, codecs.py); the default mix
    stays lossless so decoded pixels reproduce exactly."""

    def gen(batches):
        for pdf in batches:
            rows = [image_row(int(i), fmts) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    parts = num_partitions or max(1, min(n, 64))
    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, IMAGE_SCHEMA)
    )


def write_images(spark: SparkSession, n: int, path: str):
    generate_images_df(spark, n).write.mode("overwrite").parquet(path)
    return path


# ---------------------------------------------------------------------------
# synthetic audio table (audioops.py consumers)
# ---------------------------------------------------------------------------

AUDIO_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
    ]
)


def render_clip(i: int, sr: int = 8000, seconds: float = 1.0) -> np.ndarray:
    """Deterministic int16 mono clip for index i: 2-3 harmonics with
    seeded frequencies/phases + mild noise, amplitude-enveloped so
    silence/RMS features have structure."""
    rng = np.random.default_rng(1000 + i)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for _ in range(rng.integers(2, 4)):
        f = rng.uniform(80, sr / 2.5)
        x += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * t))
    x = x * env + rng.normal(0, 0.01, n)
    x = x / max(np.abs(x).max(), 1e-9) * 0.8
    return (x * 32767).astype(np.int16)


def generate_audio_df(
    spark: SparkSession, n: int, num_partitions: int | None = None, sr: int = 8000
) -> DataFrame:
    """Distributed generation of n WAV clips (same mapInPandas shape as
    generate_images_df — bench-scale tables never pass the driver)."""
    from . import audioops

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                clip = render_clip(int(i), sr=sr)
                rows.append(
                    dict(
                        audio_id=f"clip{int(i):08d}",
                        bytes=audioops.wav_encode(clip, sr),
                        sr=sr,
                        n_samples=len(clip),
                        fmt="wav",
                        caption=f"synthetic tone {int(i)} seed1000",
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_TABLE_SCHEMA.fields])

    parts = num_partitions or max(1, min(n, 64))
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, AUDIO_TABLE_SCHEMA)
