"""The composed training-data preparation job: dedup (exact + near) →
quality/language gates, snapshot-committed per stage, resumable, with a
queryable retention funnel."""

import os

import pytest
from pyspark.sql import functions as F

from mapalgebra_spark.pipelines import build_prepare_job, retention_funnel

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirty_docs(spark, tmp_path):
    """Base docs + exact dups + near dups + junk rows, written to parquet."""
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    exact = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    junk = spark.createDataFrame(
        [(300000, "@@ ## !!", "en", "junk", 8), (300001, "a b", "en", "junk", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs.parquet")
    base.unionByName(exact).unionByName(near).unionByName(junk).write.parquet(path)
    return path


def test_prepare_pipeline_end_to_end_and_resume(spark, dirty_docs, tmp_path):
    out = str(tmp_path / "job")
    job = build_prepare_job(
        spark, dirty_docs, out, job_id="prep1", near_threshold=0.7
    )
    outs = job.run()
    final = outs["filtered"]
    ids = {r["doc_id"] for r in final.select("doc_id").collect()}

    # exact duplicates: the +100000 copies are gone, originals kept
    assert not any(i >= 100000 and i < 200000 for i in ids)
    for i in range(5):
        assert i in ids
    # near duplicates (appended tail): dropped in favour of smaller ids
    near_kept = [i for i in ids if 200000 <= i < 300000]
    assert len(near_kept) <= 1, near_kept
    # junk rows: too few tokens / too much non-alpha
    assert 300000 not in ids and 300001 not in ids

    # funnel is monotone decreasing and lands in the metrics table
    funnel = {r["stage"]: r["rows"] for r in retention_funnel(spark, out, "prep1").collect()}
    assert funnel["docs"] >= funnel["exact_dedup"] >= funnel["near_dedup"] >= funnel["filtered"]
    assert funnel["exact_dedup"] == funnel["docs"] - 5

    # resume: a second run recomputes nothing (no new snapshots)
    snaps = os.path.join(out, "snapshots", "prep1")
    before = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    job2 = build_prepare_job(spark, dirty_docs, out, job_id="prep1")
    outs2 = job2.run()
    after = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    assert after == before
    assert outs2["filtered"].count() == len(ids)


def test_prepare_images_pipeline(spark, tmp_path):
    """Image curation: planted visual near-duplicates are deduped on
    thumbnails, flat images culled, and the job resumes."""
    import numpy as np
    import pandas as pd

    from mapalgebra_spark import codecs
    from mapalgebra_spark.datagen import generate_images_df
    from mapalgebra_spark.pipelines import build_prepare_images_job

    base = generate_images_df(spark, 12).toPandas()
    # plant: a byte-identical copy of image 0 and a flat gray junk image
    dup = base.iloc[0].copy()
    dup["image_id"] = "zzz_dup_of_first"  # larger id → it is the one dropped
    flat = dup.copy()
    flat["image_id"] = "zzz_flat"
    flat_pix = np.full((64, 64), 128, dtype=np.uint8)
    flat["bytes"] = codecs.encode_image(flat_pix, "png")
    flat["w"], flat["h"], flat["fmt"] = 64, 64, "png"
    pdf = pd.concat([base, pd.DataFrame([dup, flat])], ignore_index=True)
    path = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(pdf).write.parquet(path)

    out = str(tmp_path / "job")
    job = build_prepare_images_job(spark, path, out, job_id="imgprep", max_hamming=2)
    outs = job.run()
    ids = {r["image_id"] for r in outs["filtered"].select("image_id").collect()}
    assert base.iloc[0]["image_id"] in ids  # original survives
    assert "zzz_dup_of_first" not in ids  # visual duplicate dropped
    assert "zzz_flat" not in ids  # flat junk culled
    # resume leaves snapshots untouched
    snaps = os.path.join(out, "snapshots", "imgprep")
    before = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    build_prepare_images_job(spark, path, out, job_id="imgprep", max_hamming=2).run()
    after = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    assert after == before


def test_prepare_audio_job(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from mapalgebra_spark import audioops as AU
    from mapalgebra_spark.datagen import generate_audio_df, render_clip
    from mapalgebra_spark.pipelines import build_prepare_audio_job

    base = generate_audio_df(spark, 8, sr=8000).toPandas()
    # plant: a noisy near-copy of clip 0, a silent clip, a too-short blip
    rng = np.random.default_rng(5)
    c0 = render_clip(0, sr=8000)
    noisy = np.clip(
        c0.astype(np.int32) + rng.integers(-60, 61, len(c0)), -32768, 32767
    ).astype(np.int16)
    extra = pd.DataFrame(
        [
            dict(audio_id="zzz_dup_of_first", bytes=AU.wav_encode(noisy, 8000),
                 sr=8000, n_samples=len(noisy), fmt="wav", caption="dup"),
            dict(audio_id="zzz_silent", bytes=AU.wav_encode(np.zeros(8000, np.int16), 8000),
                 sr=8000, n_samples=8000, fmt="wav", caption="silence"),
            dict(audio_id="zzz_blip", bytes=AU.wav_encode(render_clip(1, sr=8000)[:400], 8000),
                 sr=8000, n_samples=400, fmt="wav", caption="too short"),
        ]
    )
    pdf = pd.concat([base, extra], ignore_index=True)
    path = str(tmp_path / "clips.parquet")
    spark.createDataFrame(pdf).write.parquet(path)

    out = str(tmp_path / "job")
    job = build_prepare_audio_job(spark, path, out, job_id="audprep")
    outs = job.run()
    ids = {r["audio_id"] for r in outs["filtered"].select("audio_id").collect()}
    assert "clip00000000" in ids          # original survives
    assert "zzz_dup_of_first" not in ids  # near-duplicate dropped
    assert "zzz_silent" not in ids        # silence gate
    assert "zzz_blip" not in ids          # duration gate
    assert len(ids) == 8                  # nothing else culled
    # resume leaves snapshots untouched
    snaps = os.path.join(out, "snapshots", "audprep")
    before = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    build_prepare_audio_job(spark, path, out, job_id="audprep").run()
    after = {st: sorted(os.listdir(os.path.join(snaps, st))) for st in os.listdir(snaps)}
    assert after == before


def test_prepare_pipeline_transitive_clustering(spark, tmp_path):
    # star cluster the anti-join rule over-keeps: pairs (1,3),(2,3)
    # without (1,2).  The texts were FOUND by deterministic search over
    # the fixed md5 minhash (doc3 = doc1 ++ doc2, so J(1,3) ~ J(2,3) ~
    # 0.48, J(1,2) = 0; salt s2526 makes both (x,3) band collisions
    # land while (1,2) shares no shingle) — no randomness at runtime.
    A = [f"a{i}s2526" for i in range(26)]
    B = [f"b{i}s2526" for i in range(26)]
    rows = [(1, " ".join(A)), (2, " ".join(B)), (3, " ".join(A + B))]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs.parquet")
    docs.write.parquet(path)

    from mapalgebra_spark.textops import minhash_lsh_pairs

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark.read.parquet(path), threshold=0.42).collect()
    }
    # precondition for the semantics delta: a star 1-3, 2-3 without 1-2
    assert pairs == {(1, 3), (2, 3)}, pairs

    out_a = str(tmp_path / "job_anti")
    kept_a = {
        r["doc_id"]
        for r in build_prepare_job(
            spark, path, out_a, job_id="pa", near_threshold=0.42,
            min_tokens=1, max_nonalpha=1.0,
        ).run()["near_dedup"].select("doc_id").collect()
    }
    out_t = str(tmp_path / "job_trans")
    kept_t = {
        r["doc_id"]
        for r in build_prepare_job(
            spark, path, out_t, job_id="pt", near_threshold=0.42,
            min_tokens=1, max_nonalpha=1.0, cluster="transitive",
        ).run()["near_dedup"].select("doc_id").collect()
    }
    # anti-join keeps every doc that is never a doc_b: {1, 2}; the
    # closure keeps one representative of the {1,2,3} component: {1}
    assert kept_a == {1, 2}
    assert kept_t == {1}


def test_prepare_pipeline_bad_cluster_arg(spark, tmp_path):
    with pytest.raises(ValueError, match="cluster"):
        build_prepare_job(spark, "x", str(tmp_path / "j"), cluster="nope")
