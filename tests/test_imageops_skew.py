"""Multimodal column ops + skew handling."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapalgebra_spark import codecs, datagen, imageops, skew
from mapalgebra_spark.operators import focal as FO

pytestmark = pytest.mark.spark


def test_thumbnails_and_phash(spark):
    images = datagen.generate_images_df(spark, 6)
    out = {r["image_id"]: r for r in imageops.thumbnails(images, size=16).collect()}
    assert len(out) == 6
    for iid, r in out.items():
        i = int(iid[3:])
        rgba = i % 7 == 3
        w, h = datagen.SIZES[i % len(datagen.SIZES)]
        pix = datagen.render_pixels(i, w, h, rgba)
        ref = imageops.block_mean_resize(pix, 16, 16)
        got = np.frombuffer(r["thumb"], np.uint8).reshape(ref.shape)
        assert np.array_equal(got, ref)
        assert r["phash"] == codecs.phash64(ref)


def test_image_features_stub_and_fake(spark):
    images = datagen.generate_images_df(spark, 3)
    with pytest.raises(NotImplementedError):
        imageops.image_features(images)  # no vision backend in sandbox
    rows = imageops.image_features(images, allow_fake=True).collect()
    assert len(rows) == 3
    for r in rows:
        v = np.array(r["embedding"])
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3
        assert r["model"] == "fake-dct8x8"


def test_video_frame_sample_stub(spark):
    media = spark.createDataFrame(pd.DataFrame({"media_id": ["m0", "m1"], "blob": [b"x", b"y"]}))
    # fmt dispatch is per-row since the real mjpeg-avi path landed, so
    # the no-backend error surfaces at materialization, not plan time
    with pytest.raises(Exception):
        imageops.video_frame_sample(media).collect()
    out = imageops.video_frame_sample(media, allow_fake=True).collect()
    assert len(out) == 6  # 3 fake frames per media
    assert {r["frame_idx"] for r in out} == {0, 30, 60}
    # deterministic
    again = imageops.video_frame_sample(media, allow_fake=True).collect()
    assert sorted((r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in out) == sorted(
        (r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in again
    )


def test_phash_near_pairs(spark):
    base = datagen.generate_images_df(spark, 5)
    # duplicates: same pixels re-encoded (identical phash, distinct ids)
    dup = base.select(
        F.concat(F.lit("dup_"), F.col("image_id")).alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash",
    )
    both = base.unionByName(dup)
    pairs = {(r["img_a"], r["img_b"]): r["hamming"] for r in
             imageops.phash_near_pairs(both, max_hamming=0).collect()}
    for i in range(5):
        iid = f"img{i:08d}"
        # "dup_..." sorts before "img..."
        assert pairs.get((f"dup_{iid}", iid)) == 0, pairs
    # distinct random terrains should not all collide at hamming 0
    assert len(pairs) < 25


def test_salted_join_correctness_under_skew(spark):
    rng = np.random.default_rng(0)
    # 10k rows, 70% piled on one hot cell
    cells = np.where(rng.uniform(size=10000) < 0.7, 42, rng.integers(0, 100, 10000))
    big = spark.createDataFrame(
        pd.DataFrame({"cell_id": cells.astype(np.int64), "v": np.arange(10000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"cell_id": np.arange(100, dtype=np.int64), "zone": np.arange(100) % 7})
    )
    plain = big.join(small, on="cell_id").groupBy("zone").agg(F.sum("v").alias("s"))
    salted = skew.salted_join(big, small, ["cell_id"], n_salt=8).groupBy("zone").agg(
        F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    hot = skew.key_histogram(big, ["cell_id"], top=1).collect()[0]
    assert hot["cell_id"] == 42 and hot["count"] > 6000


def test_fmonoid_user_kernel(spark):
    """The focal extension point: user-pluggable 3x3 monoid fold
    (MapAlgebra.hs:789-791) — here bitwise-or over a mask raster."""
    from mapalgebra_spark.raster import TileRaster
    from mapalgebra_spark import kernels as K

    arr = (np.arange(81).reshape(9, 9) % 5 == 0).astype(np.int64)
    tr = TileRaster.from_arrays(spark, {"m": arr}, tile_size=4)
    out = FO.fmonoid(tr, np.bitwise_or, 0).collect_array("m")
    padded = K.pad_block(arr, "constant", 0)
    ref = np.zeros_like(arr)
    for s in K.shifts(padded):
        ref |= s
    np.testing.assert_array_equal(out, ref)


def test_constant_and_from_function(spark):
    from mapalgebra_spark.raster import TileRaster

    c = TileRaster.constant(spark, "c", 100, 130, 7.0, tile_size=64)
    arr = c.collect_array("c")
    assert arr.shape == (100, 130) and (arr == 7.0).all()
    f = TileRaster.from_function(
        spark, "f", 50, 60, lambda yy, xx: yy * 100 + xx, dtype="int64", tile_size=16
    )
    got = f.collect_array("f")
    yy, xx = np.mgrid[0:50, 0:60]
    np.testing.assert_array_equal(got, yy * 100 + xx)

def test_bilinear_resize_properties():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    # identity resize is exact
    np.testing.assert_array_equal(imageops.bilinear_resize(img, 17, 23), img)
    rgba = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    np.testing.assert_array_equal(imageops.bilinear_resize(rgba, 10, 12), rgba)
    # constant image stays constant at any size
    const = np.full((9, 7), 55, dtype=np.uint8)
    assert (imageops.bilinear_resize(const, 30, 4) == 55).all()
    # monotone horizontal gradient stays monotone after resize
    grad = np.tile(np.arange(0, 200, 8, dtype=np.uint8), (5, 1))
    up = imageops.bilinear_resize(grad, 5, 100).astype(np.int64)
    assert (np.diff(up[2]) >= 0).all()
    # 2x down then 2x up of smooth data stays close
    smooth = datagen.render_pixels(1, 64, 64, rgba=False)
    rt = imageops.bilinear_resize(imageops.bilinear_resize(smooth, 32, 32), 64, 64)
    assert codecs.psnr(smooth, rt) > 30.0
    # hand-check the half-pixel convention on a tiny 1-D case:
    # [0, 100] → 4 samples at src coords -0.25, 0.25, 0.75, 1.25
    tiny = np.array([[0.0, 100.0]])
    out = imageops.bilinear_resize(tiny, 1, 4)
    np.testing.assert_allclose(out[0], [0.0, 25.0, 75.0, 100.0])
