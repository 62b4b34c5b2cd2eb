"""The multimodal contract queries (queries.py: image_near_dup /
audio_near_dup / video_frames) rest on one assumption: at every shipped
sf the ONLY hamming-0 pairs are the planted byte-duplicates — i.e. no
two DISTINCT synthetic media items collide on their full 64-bit
phash / fingerprint.  The data is deterministic, so this is checkable
once and holds forever; these tests pin it at the largest shipped size
(n=128 covers the n=50 subset used at sf0.001/sf0.01).  The 128 cap
exists because the first accidental phash collision between distinct
synthetic images is the pair (57, 137); queries._mm_n stays below it.

The end-to-end Spark-vs-DuckDB comparison for the three queries runs
in tests/test_oracle_pairs.py (they carry ORACLE entries).
"""

from mapalgebra_spark import audioops, codecs
from mapalgebra_spark.datagen import image_row, render_clip
from mapalgebra_spark.imageops import block_mean_resize

N_MAX = 128  # sf0.1 table size; sf0.001/0.01 use the first 50


def test_thumbnail_phashes_distinct():
    """No accidental hamming-0 phash pairs among distinct images —
    same pipeline as imageops.thumbnails: decode -> 32x32 block-mean
    -> phash64."""
    phs = []
    for i in range(N_MAX):
        row = image_row(i, fmts=["raw", "npy"])
        pix = codecs.decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        phs.append(codecs.phash64(block_mean_resize(pix, 32, 32)))
    assert len(set(phs)) == N_MAX


def test_audio_fingerprints_distinct():
    """No accidental hamming-0 fingerprint pairs among distinct clips."""
    fps = [audioops.clip_fingerprint(render_clip(i), 8000) for i in range(N_MAX)]
    assert len(set(fps)) == N_MAX


def test_planted_duplicate_is_exact():
    """A byte-identical duplicate necessarily lands at hamming 0 on
    both modalities (the planted-pair construction the oracles count
    on)."""
    row = image_row(7, fmts=["raw"])
    pix = codecs.decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    a = codecs.phash64(block_mean_resize(pix, 32, 32))
    b = codecs.phash64(block_mean_resize(pix.copy(), 32, 32))
    assert a == b
    clip = render_clip(5)
    assert audioops.clip_fingerprint(clip, 8000) == audioops.clip_fingerprint(
        clip.copy(), 8000
    )


def test_video_frame_arithmetic_matches_container():
    """The oracle's (nf+2)//3 sampled-count formula against the real
    container: encode nf frames, walk + sample every 3rd, no Spark."""
    from mapalgebra_spark import video as VV
    from mapalgebra_spark.datagen import render_pixels

    for nf in (6, 7, 8, 9, 10):
        frames = [render_pixels(5000 + k, 48, 32, False) for k in range(nf)]
        blob = VV.avi_encode(frames, fps=10)
        got = [i for i, _ in VV.sample_frames(blob, 3)]
        assert got == list(range(0, nf, 3))
        assert len(got) == (nf + 2) // 3
        assert got[-1] == 3 * ((nf - 1) // 3)
