"""Regression pins for the round-3 ADVICE findings and the r3-verdict
streaming keeper-index boundedness ask (verdict item 5)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from mapalgebra_spark import video
from mapalgebra_spark.jpeg import _BitReader

pytestmark = []


def test_bitreader_rejects_wide_reads():
    """read(n) is only correct for n <= 16 (the weight-slice trick);
    wider reads must raise, not silently return garbage."""
    r = _BitReader(b"\xaa\xbb\xcc\xdd")
    assert r.read(16) == 0xAABB
    with pytest.raises(ValueError, match="> 16"):
        r.read(17)


def test_avi_locks_onto_first_video_stream():
    """An AVI interleaving TWO video streams must yield one stream's
    frames with consecutive indices — not merge both into a single
    miscounted sequence."""
    frames = [
        np.full((32, 48), 40 * (i + 1), dtype=np.uint8) for i in range(4)
    ]
    blob = video.avi_encode(frames, fps=10)
    ref = [b for _, b in video.avi_frames(blob)]
    # relabel movi chunks #2 and #4 as stream 01 (the first 4 '00dc'
    # occurrences are the movi chunks; idx1 entries come after)
    out, seen, pos = bytearray(blob), 0, 0
    while True:
        j = blob.find(b"00dc", pos)
        if j < 0 or seen >= 4:
            break
        if seen in (1, 3):
            out[j : j + 2] = b"01"
        seen += 1
        pos = j + 4
    got = list(video.avi_frames(bytes(out)))
    # locked to stream 00 (first chunk seen): frames 0 and 2, reindexed
    assert [i for i, _ in got] == [0, 1]
    assert [b for _, b in got] == [ref[0], ref[2]]


@pytest.mark.spark
def test_knn_cells_empty_ring_falls_back(spark):
    """A query whose ring-limited candidate set is EMPTY must take the
    brute-force fallback — not silently vanish from the result (r3
    advice, medium).  Points cluster at (40,40); the query at (0,0)
    with level=7 (1.4-deg cells) and max_ring=2 has no candidate in its
    ring."""
    from mapalgebra_spark import spatial as SP

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(50, dtype=np.int64),
            "lat": rng.uniform(39.0, 41.0, 50),
            "lng": rng.uniform(39.0, 41.0, 50),
        }
    )
    points = spark.createDataFrame(pdf)
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": ["far"], "lat": [0.0], "lng": [0.0]})
    )
    got = SP.knn_cells(spark, queries, points, k=5, level=7, max_ring=2).collect()
    assert len(got) == 5, "empty-ring query silently dropped"
    brute = SP.knn_bruteforce(queries, points, k=5).collect()
    assert {(r["point_id"], r["rank"]) for r in got} == {
        (r["point_id"], r["rank"]) for r in brute
    }


def _doc_batch(spark, name, src, ids, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / name))


@pytest.mark.spark
def test_keeper_index_compaction_bounds_and_replay(spark, tmp_path):
    """r3 verdict item 5: the at-rest keeper band index must stay
    BOUNDED over the stream's lifetime.  N batches with compact_every=2
    leave the keeper at exactly distinct(doc_id, band) rows in a
    bounded file count; a full replay (fresh checkpoint) re-appends
    band rows but compaction collapses them — row count and survivor
    set are identical after replay."""
    from mapalgebra_spark.streaming import stream_near_dedup_documents
    from mapalgebra_spark.textops import N_BANDS

    src = tmp_path / "in"
    src.mkdir()
    words = [
        "raster tile halo shuffle executor",
        "minhash banded bucket collision join",
        "watermark streaming checkpoint replay state",
        "zonal polygon painter order pixels",
    ]
    for b in range(4):
        _doc_batch(
            spark, f"b{b}", src,
            [10 * b, 10 * b + 1],
            [f"{words[b]} first variant {b}", f"{words[(b + 2) % 4]} second variant {b}"],
        )
    keeper = str(tmp_path / "keeper")

    def run(ck):
        q = stream_near_dedup_documents(
            spark, f"{src}/*", keeper, str(tmp_path / "out"),
            str(tmp_path / ck), threshold=0.6, max_files_per_trigger=1,
            compact_every=2,
        )
        q.awaitTermination(240)
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out") + "/batch=*")
            .select("doc_id").collect()
        )

    survivors = run("ck1")
    assert len(survivors) == 8  # all distinct docs survive
    kdf = spark.read.parquet(keeper)
    n_rows = kdf.count()
    assert n_rows == len(survivors) * N_BANDS
    assert n_rows == kdf.select("doc_id", "band").distinct().count()
    files_after_run1 = len(glob.glob(os.path.join(keeper, "*.parquet")))
    assert files_after_run1 <= 16  # compacted, not one file-set per batch

    # full replay: fresh checkpoint, keeper already populated
    assert run("ck2") == survivors
    kdf2 = spark.read.parquet(keeper)
    assert kdf2.count() == n_rows  # replay duplicates collapsed
    assert len(glob.glob(os.path.join(keeper, "*.parquet"))) <= 16
