"""End-to-end training-data preparation: the dedup / quality / language
stages composed into ONE checkpoint-resumable lineage.Job — what a
100 TB corpus pipeline actually runs, not just the per-operator pieces.

Stage graph (each snapshot-committed; re-runs resume after the last
committed stage):

  docs        — source document table
  exact_dedup — md5 groupBy, keep the smallest doc_id per byte-identical
                text (hash agg; shuffle carries fingerprints, not text)
  near_dedup  — MinHash banded-LSH pairs at ``near_threshold``; a doc is
                dropped iff it is a near-duplicate of a SMALLER-id doc
                (anti-join against the pair table's doc_b side).  The
                component minimum never appears as a doc_b (pairs are
                oriented doc_a < doc_b), so every similarity cluster
                keeps its smallest member — deterministic, one
                anti-join, no iterative clustering.
  filtered    — quality + language gates (all JVM expressions):
                stopword_ratio, nonalpha_ratio, token count bounds,
                predicted language in ``keep_langs``.

Each stage's row counts land in the job's metrics table, so the
retention funnel (raw → exact → near → filtered) is queryable — the
number a data-curation run actually reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import Job


def build_prepare_job(
    spark: SparkSession,
    docs_path: str,
    out: str,
    job_id: str = "prepare",
    near_threshold: float = 0.7,
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 3,
    max_tokens: int = 100_000,
    max_nonalpha: float = 0.6,
    cluster: str = "anti_join",
) -> Job:
    """``cluster`` selects the near-dedup keeper rule:

    * ``"anti_join"`` (default) — drop every doc that is the larger
      side of any pair (one anti-join; keeps every LOCAL minimum of
      the pair graph, so pairs (1,3),(2,3) keep {1,2}).
    * ``"transitive"`` — connected components of the pair graph
      (graph.connected_components, large-star/small-star); keeps
      exactly ONE doc per similarity cluster (pairs (1,3),(2,3) keep
      {1}).  Costs O(log n) extra rounds over the PAIR table only —
      the doc table is touched once either way.
    """
    if cluster not in ("anti_join", "transitive"):
        raise ValueError(f"cluster must be 'anti_join' or 'transitive', got {cluster!r}")
    from . import textops as TX

    job = Job(spark, out, job_id)

    @job.stage("docs")
    def docs(spark, _):
        return spark.read.parquet(docs_path)

    @job.stage("exact_dedup", inputs=["docs"])
    def exact_dedup(spark, ins):
        d = ins["docs"]
        keep = d.groupBy(F.md5("text").alias("fp")).agg(F.min("doc_id").alias("doc_id"))
        return d.join(keep.select("doc_id"), on="doc_id", how="inner")

    @job.stage("near_dedup", inputs=["exact_dedup"])
    def near_dedup(spark, ins):
        from .cacheutil import attach_bases

        d = ins["exact_dedup"]
        pairs = TX.minhash_lsh_pairs(d, threshold=near_threshold)
        if cluster == "transitive":
            from .graph import connected_components

            comp = connected_components(pairs, "doc_a", "doc_b")
            # non-representatives of each component; pairless docs are
            # absent from comp and therefore kept
            dupes = comp.where(F.col("id") != F.col("component")).select(
                F.col("id").alias("doc_id")
            )
            extra = getattr(comp, "_persisted_bases", ())
        else:
            dupes = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
            extra = ()
        # carry the LSH base caches to the stage output: Job.run drops
        # them right after this stage's snapshot commits
        return attach_bases(
            d.join(dupes, on="doc_id", how="left_anti"),
            list(getattr(pairs, "_persisted_bases", ())) + list(extra),
        )

    @job.stage("filtered", inputs=["near_dedup"])
    def filtered(spark, ins):
        d = ins["near_dedup"]
        q = TX.quality_scores(d).select(
            "doc_id", "n_tokens", "nonalpha_ratio"
        )
        lg = TX.language_id(d)
        return (
            d.join(q, on="doc_id")
            .join(lg, on="doc_id")
            .filter(
                (F.col("n_tokens") >= min_tokens)
                & (F.col("n_tokens") <= max_tokens)
                & (F.col("nonalpha_ratio") <= max_nonalpha)
                & F.col("lang_pred").isin(*keep_langs)
            )
            .drop("n_tokens", "nonalpha_ratio")
        )

    return job


#: pipeline execution order of the prepare jobs' stages (text / image)
FUNNEL_ORDER = ("docs", "images", "exact_dedup", "thumbs", "near_dedup", "filtered")


def retention_funnel(spark: SparkSession, out: str, job_id: str) -> DataFrame:
    """(stage, rows) from the job's metrics table in PIPELINE order
    (not alphabetical), one row per stage (the latest 'ok' run wins if
    a stage was ever forced to re-run)."""
    from pyspark.sql import Window

    order = {st: i for i, st in enumerate(FUNNEL_ORDER)}
    order_col = F.coalesce(
        *[F.when(F.col("stage") == st, F.lit(i)) for st, i in order.items()],
        F.lit(len(order)),
    )
    m = spark.read.parquet(f"{out}/metrics")
    w = Window.partitionBy("stage").orderBy(F.col("ts").desc())
    return (
        m.filter((F.col("job_id") == job_id) & (F.col("status").isin("ok", "skipped")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("stage", "rows", order_col.alias("_ord"))
        .orderBy("_ord")
        .drop("_ord")
    )


def build_prepare_images_job(
    spark: SparkSession,
    images_path: str,
    out: str,
    job_id: str = "prepare_images",
    max_hamming: int = 6,
    thumb_size: int = 32,
    min_std: float = 4.0,
) -> Job:
    """The image-payload curation analog of :func:`build_prepare_job`:

      images     — source image+caption table (input_hint schema)
      thumbs     — decode once → block-mean thumbnails + perceptual hash
                   (one Arrow stage; pixels never leave it again)
      near_dedup — phash-hamming pairs (chunk-bucketed, never a cross
                   join); an image drops iff it near-duplicates a
                   lexicographically-smaller image_id (pairs are
                   oriented id_a < id_b, so every visual cluster keeps
                   its smallest member via one anti-join)
      filtered   — quality gate on thumbnail statistics: near-flat
                   images (pixel stddev < ``min_std``) are culled —
                   decode-free because the gate reads the tiny thumbs.

    Dedup + quality run on THUMBNAILS (32x32 = 1/256 of the source
    bytes): at 100 TB the full-resolution bytes are read exactly once,
    in the thumbs stage."""
    from . import imageops as IO

    job = Job(spark, out, job_id)

    @job.stage("images")
    def images(spark, _):
        return spark.read.parquet(images_path)

    @job.stage("thumbs", inputs=["images"])
    def thumbs(spark, ins):
        return IO.thumbnails(ins["images"], size=thumb_size)

    @job.stage("near_dedup", inputs=["images", "thumbs"])
    def near_dedup(spark, ins):
        from .cacheutil import attach_bases

        pairs = IO.phash_near_pairs(
            ins["thumbs"].select("image_id", "phash"), max_hamming=max_hamming
        )
        dupes = pairs.select(F.col("img_b").alias("image_id")).distinct()
        # carry the operator's persisted base forward so Job.run's
        # post-commit unpersist_bases releases it (cacheutil caveat:
        # derived DataFrames drop the attribute)
        return attach_bases(
            ins["images"].join(dupes, on="image_id", how="left_anti"),
            getattr(pairs, "_persisted_bases", ()),
        )

    @job.stage("filtered", inputs=["near_dedup", "thumbs"])
    def filtered(spark, ins):
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        stat_schema = T.StructType(
            [
                T.StructField("image_id", T.StringType()),
                T.StructField("pix_std", T.DoubleType()),
            ]
        )

        def stats(batches):
            for pdf in batches:
                ids, stds = [], []
                for r in range(len(pdf)):
                    row = pdf.iloc[r]
                    t = np.frombuffer(row["thumb"], dtype=np.uint8)
                    ids.append(row["image_id"])
                    stds.append(float(t.astype(np.float64).std()))
                yield pd.DataFrame({"image_id": ids, "pix_std": stds})

        q = ins["thumbs"].select("image_id", "thumb").mapInPandas(stats, stat_schema)
        return (
            ins["near_dedup"]
            .join(q, on="image_id")
            .filter(F.col("pix_std") >= min_std)
            .drop("pix_std")
        )

    return job


def build_prepare_audio_job(
    spark: SparkSession,
    audio_path: str,
    out: str,
    job_id: str = "prepare_audio",
    max_hamming: int = 8,
    min_duration_s: float = 0.2,
    max_silence_ratio: float = 0.6,
    min_rms: float = 0.01,
) -> Job:
    """The audio-payload curation analog of :func:`build_prepare_job`:

      audio      — source clip table (audio_id, bytes, sr, n_samples,
                   fmt, caption)
      features   — decode once → scalar features + 64-bit
                   Haitsma-Kalker fingerprint (one Arrow stage; samples
                   never leave it again)
      near_dedup — fingerprint-hamming pairs (chunk-bucketed banded
                   self-join, never a cross join); a clip drops iff it
                   near-duplicates a lexicographically-smaller audio_id
                   (pairs oriented id_a < id_b → every cluster keeps
                   its smallest member via one anti-join)
      filtered   — quality gates on the tiny feature rows (decode-free):
                   too-short, too-silent, or near-zero-energy clips cull.

    Same 100 TB shape as the image job: full-resolution bytes are read
    exactly once (features stage); dedup + gating touch only scalar
    feature rows."""
    from . import audioops as AU

    job = Job(spark, out, job_id)

    @job.stage("audio")
    def audio(spark, _):
        return spark.read.parquet(audio_path)

    @job.stage("features", inputs=["audio"])
    def features(spark, ins):
        return AU.audio_features(ins["audio"])

    @job.stage("near_dedup", inputs=["audio", "features"])
    def near_dedup(spark, ins):
        from .cacheutil import attach_bases

        pairs = AU.audio_near_pairs(
            ins["features"].select("audio_id", "fingerprint"), max_hamming=max_hamming
        )
        dupes = pairs.select(F.col("clip_b").alias("audio_id")).distinct()
        return attach_bases(
            ins["audio"].join(dupes, on="audio_id", how="left_anti"),
            getattr(pairs, "_persisted_bases", ()),
        )

    @job.stage("filtered", inputs=["near_dedup", "features"])
    def filtered(spark, ins):
        gates = ins["features"].filter(
            (F.col("duration_s") >= min_duration_s)
            & (F.col("silence_ratio") <= max_silence_ratio)
            & (F.col("rms") >= min_rms)
        )
        return ins["near_dedup"].join(gates.select("audio_id"), on="audio_id", how="inner")

    return job
