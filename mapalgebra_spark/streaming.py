"""Structured Streaming surface.

The reference is batch-only; this layer makes the engine's pipelines
*incremental*, which a 10^12-image ingest needs operationally:

- ``stream_tile_pipeline`` — readStream over an image+caption parquet
  directory → per-micro-batch: decode → tile → (optionally) fused focal
  ops → append to the tile table, with checkpointed progress.  Because
  an image's tiles always arrive in the same micro-batch, focal halos
  never span batches, so ``foreachBatch`` can reuse the exact batch
  engine (same halo join, same kernels) with exactly-once sink
  semantics from the checkpoint + idempotent overwrite-by-batch layout.
- ``stream_event_stats`` — watermarked sliding-window aggregation over
  the ``events`` schema (late data handled by the watermark), the
  engine's built-in-operator streaming path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen import IMAGE_SCHEMA


def stream_tile_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    focal_ops: list[str] | None = None,
    tile_size: int = 256,
    trigger_available_now: bool = True,
):
    """Incremental image→tile(→focal) pipeline. Returns the started
    StreamingQuery. Output lands under ``out_dir/batch=<id>/`` —
    overwrite-by-batch-id makes replays after a crash idempotent."""
    from .ingest import tiles_from_images
    from .operators.focal import focal_multi

    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(input_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int):
        tiles = tiles_from_images(batch_df, tile_size=tile_size)
        out = tiles.df
        if focal_ops:
            outs = focal_multi(tiles, focal_ops, persist_combined=False)
            out = outs[focal_ops[0]]._combined
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_stats(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over the events schema
    (event_id, ts, user_id, event_type, value): count + sum(value) per
    (window, event_type). Works on both a streaming and a batch
    DataFrame (the batch analog is the test oracle)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # testdata writes TIMESTAMP_NTZ; watermarks require TIMESTAMP
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            F.round("total", 6).alias("total"),
        )
    )
