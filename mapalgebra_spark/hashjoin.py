"""Banded hamming self-join over a 64-bit hash column — the shared
core of ``imageops.phash_near_pairs`` and
``audioops.audio_near_pairs`` (textops' simhash join uses the same
banding over its 60-bit hash).

Candidates must share at least one exact 16-bit chunk of 4: by
pigeonhole any pair within hamming <= 3 is guaranteed to collide on a
chunk, larger budgets are recall-oriented.  The self-join meets only
inside chunk buckets — never all-pairs — so at 100 TB the work is
bucket-collision-sized, and the (id, hash) base is persisted because
an unpersisted subplan would run once PER JOIN SIDE (the handle is
attached via cacheutil for post-materialization release).

Extracted round 3: the two call sites were ~55-line near-verbatim
copies whose fixes (e.g. the r2 persist finding) had to be applied
twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cacheutil import attach_bases


def banded_hamming_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    out_a: str,
    out_b: str,
    max_hamming: int,
) -> DataFrame:
    """(out_a, out_b, hamming) pairs with ``out_a < out_b`` (by id)
    and hamming(hash_a, hash_b) <= ``max_hamming``."""
    base = df.select(id_col, hash_col).persist()
    chunks = base.select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col(hash_col), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(
        id_col, hash_col, F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.key") == F.col("r.key"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias(out_a),
            F.col(f"r.{id_col}").alias(out_b),
            F.col(f"l.{hash_col}").alias("ha"),
            F.col(f"r.{hash_col}").alias("hb"),
        )
        .dropDuplicates([out_a, out_b])
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(out_a, out_b, "hamming")
    )
    return attach_bases(pairs, [base])
