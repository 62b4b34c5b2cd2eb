"""Structured Streaming: incremental tile pipeline + windowed events."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapalgebra_spark import datagen, streaming
from mapalgebra_spark.ingest import tiles_from_images

pytestmark = pytest.mark.spark


def test_stream_tile_pipeline_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    imgs = datagen.generate_images_df(spark, 6)
    imgs.write.parquet(in_dir)

    q = streaming.stream_tile_pipeline(
        spark, in_dir, out_dir, ck, focal_ops=["fmean"], tile_size=256
    )
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out_dir, "batch=*"))
    batch_tiles = tiles_from_images(spark.read.parquet(in_dir), tile_size=256).df
    assert got.count() == batch_tiles.count()
    # fmean output column exists and one tile matches the batch engine
    row = got.filter(
        (F.col("raster_id") == "img00000000") & (F.col("ty") == 0) & (F.col("tx") == 0)
    ).collect()[0]
    from mapalgebra_spark import kernels as K
    from mapalgebra_spark.tiles import decode_block

    ref_pix = datagen.render_pixels(0, 256, 256, False)
    ref = K.k_fmean(K.pad_block(ref_pix, K.BORDER_FILL, 0))
    out_blk = decode_block(row["tile_fmean"], row["dtype_fmean"], 256, 256)
    np.testing.assert_allclose(out_blk, ref)

    # restart with same checkpoint: no duplicate processing
    q2 = streaming.stream_tile_pipeline(
        spark, in_dir, out_dir, ck, focal_ops=["fmean"], tile_size=256
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(os.path.join(out_dir, "batch=*")).count() == batch_tiles.count()


def test_stream_event_stats_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exp = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in streaming.stream_event_stats(events, window="5 minutes").collect()
    }
    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    out_rows = []

    q = (
        streaming.stream_event_stats(stream, window="5 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: out_rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["win_start"], r["event_type"]): (r["n"], r["total"]) for r in out_rows}
    # append mode only emits windows the watermark has closed; all
    # emitted windows must match the batch result exactly
    assert got
    for k, v in got.items():
        assert exp[k] == v, k


def test_running_tile_max_stateful_across_restarts(spark, tmp_path):
    """applyInPandasWithState composite: two stream runs over one
    checkpoint must fold new observations onto DURABLE state — final
    tile == elementwise max of both image generations."""
    from mapalgebra_spark import codecs
    from mapalgebra_spark.tiles import decode_block

    in_dir = tmp_path / "in"
    ck = str(tmp_path / "ck")
    in_dir.mkdir()

    def write_generation(gen: int, shift: int):
        rows = []
        for i in range(3):
            pix = datagen.render_pixels(i + shift, 128, 128, rgba=False)
            rows.append(dict(
                image_id=f"obs{i:04d}",  # SAME ids both generations
                bytes=codecs.encode_image(pix, "raw"),
                w=128, h=128, fmt="raw",
                caption=f"gen {gen} obs {i}", phash=codecs.phash64(pix),
            ))
        spark.createDataFrame(rows, datagen.IMAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    out_dir = str(tmp_path / "out")

    def latest_composites():
        df = spark.read.option("basePath", out_dir).parquet(out_dir + "/batch=*")
        rows = df.withColumn(
            "batch",
            F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1).cast("long"),
        ).collect()
        best = {}
        for r in rows:
            k = r["raster_id"]
            if k not in best or r["batch"] > best[k]["batch"]:
                best[k] = r
        return best

    write_generation(0, shift=0)
    q1 = streaming.stream_running_tile_max(spark, str(in_dir), out_dir, ck, 128)
    q1.awaitTermination(120)
    first = latest_composites()
    assert first["obs0000"]["n_merged"] == 1

    write_generation(1, shift=100)  # different pixels, same keys
    q2 = streaming.stream_running_tile_max(spark, str(in_dir), out_dir, ck, 128)
    q2.awaitTermination(120)
    second = latest_composites()
    for i in range(3):
        rid = f"obs{i:04d}"
        row = second[rid]
        assert row["n_merged"] == 2
        got = decode_block(row["tile"], row["dtype"], row["h"], row["w"], 1)
        a = datagen.render_pixels(i, 128, 128, rgba=False)
        b = datagen.render_pixels(i + 100, 128, 128, rgba=False)
        np.testing.assert_array_equal(got, np.maximum(a, b))


def test_stream_dedup_documents(spark, tmp_path):
    """Streaming exact dedup: duplicates arriving in LATER micro-batches
    (and within one batch) are dropped; the survivor set equals the
    batch-distinct set."""
    import pandas as pd

    from mapalgebra_spark.streaming import stream_dedup_documents

    src = tmp_path / "in"
    src.mkdir()
    batch1 = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta", "gamma", "alpha beta"],  # in-batch dup
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [10, 5, 10],
        }
    )
    batch2 = pd.DataFrame(
        {
            "doc_id": [3, 4],
            "text": ["gamma", "delta"],  # cross-batch dup + one new
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [5, 5],
        }
    )
    spark.createDataFrame(batch1).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(batch2).coalesce(1).write.parquet(str(src / "b2"))

    q = stream_dedup_documents(
        spark,
        f"{src}/*",
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert sorted(out["text"].tolist()) == ["alpha beta", "delta", "gamma"]
    assert out["fp"].nunique() == 3


def test_stream_near_dedup_documents(spark, tmp_path):
    """Incremental LSH near-dedup: a later micro-batch's near-copy of an
    already-kept doc drops via the keeper band table; intra-batch
    near-pairs keep the smaller doc_id; distinct docs all survive."""
    import pandas as pd

    from mapalgebra_spark.streaming import stream_near_dedup_documents

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy riverbank under pale skies"
    )
    near = base.replace("pale", "grey")  # one-token edit: high jaccard
    other = (
        "completely different content about distributed raster algebra "
        "engines shuffling tile halos across a thousand executors"
    )
    third = (
        "yet another unrelated document mentioning spectral fingerprints "
        "banded hash joins and watermark bounded streaming state"
    )
    src = tmp_path / "in"
    src.mkdir()

    def write(name, rows):
        pdf = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["s"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / name))

    # batch 1: base + other;  batch 2: near-copy of base (cross-batch
    # near-dup), third (new), and an intra-batch near-pair (10 < 11)
    write("b1", [(0, base), (1, other)])
    write("b2", [(5, near), (6, third), (10, third + " tail"), (11, third + " tail x")])

    q = stream_near_dedup_documents(
        spark,
        f"{src}/*",
        str(tmp_path / "keeper"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        threshold=0.6,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    out = spark.read.parquet(str(tmp_path / "out") + "/batch=*")
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 5 drops vs keeper (near-copy of kept 0); 10 and 11 both drop
    # intra-batch (near-pairs with the smaller surviving 6)
    assert ids == [0, 1, 6], ids
    keeper = spark.read.parquet(str(tmp_path / "keeper"))
    assert set(r["doc_id"] for r in keeper.select("doc_id").distinct().collect()) == set(ids)


def test_stream_near_dedup_replay_idempotent(spark, tmp_path):
    """Crash-replay safety (r3 review finding): a replayed batch meets
    its OWN keeper bands; without the kdoc != doc_id exclusion every
    prior survivor self-matches at est=1.0 and vanishes from the
    overwritten batch output.  Simulate by re-running the same input
    with a FRESH checkpoint (full replay) against the populated
    keeper."""
    import pandas as pd

    from mapalgebra_spark.streaming import stream_near_dedup_documents

    src = tmp_path / "in"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "completely separate first document about tiled rasters",
                "another fully unrelated second document about streams",
            ],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [10, 10],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / "b1"))

    def run(ckpt):
        q = stream_near_dedup_documents(
            spark, f"{src}/*", str(tmp_path / "keeper"),
            str(tmp_path / "out"), str(tmp_path / ckpt), threshold=0.6,
        )
        q.awaitTermination(120)
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out") + "/batch=*")
            .select("doc_id").collect()
        )

    assert run("ckpt1") == [0, 1]
    # replay: fresh checkpoint, keeper already holds both docs' bands
    assert run("ckpt2") == [0, 1]
