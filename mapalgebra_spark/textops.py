"""Text / training-data pipeline operators over the ``documents`` table.

Beyond the reference's raster surface, a 100 TB training-data engine
needs dedup + text analysis primitives.  All are DataFrame-native with
Arrow-batched numpy where Spark lacks a builtin; nothing is per-row
Python.

- exact dedup        — hash groupBy (md5 fingerprint)
- MinHash + LSH      — shingle → 64 minhashes → 8 bands x 8 rows →
                       band-bucket self-join → verified Jaccard pairs.
                       The self-join is on (band, bucket-hash): only
                       colliding docs meet, the classic near-dup sweep.
- SimHash            — 64-bit hyperplane-free simhash over token
                       hashes; hamming-distance pairs within LSH bands.
- n-gram Jaccard     — exact verification kernel (used by both LSH
                       paths; also exposed standalone for small inputs)
- language ID        — letter-frequency cosine heuristic (no external
                       models; deterministic)
- quality scoring    — length / punctuation / stopword ratios
- fingerprinting     — 64-bit rolling (polynomial) content hash
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic 64-bit string hash (stable across workers, unlike hash())
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a(s: str) -> np.uint64:
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return h


def _token_hashes(text: str) -> np.ndarray:
    return np.array([_fnv1a(t) for t in text.split()], dtype=np.uint64)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        return np.array([_fnv1a(" ".join(toks))], dtype=np.uint64)
    return np.array(
        [_fnv1a(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)],
        dtype=np.uint64,
    )


# --- MinHash ------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=N_HASHES, dtype=np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params()


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 min-hashes of a shingle-hash set (universal hashing mod the
    Mersenne prime 2^61-1), vectorized (n_shingles x 64)."""
    if len(shingles) == 0:
        return np.zeros(N_HASHES, dtype=np.uint64)
    x = (shingles % _MERSENNE).astype(np.uint64)
    # (n, 64): (a*x + b) mod p  — python ints to dodge uint64 overflow
    prods = (x[:, None].astype(object) * _MH_A[None, :].astype(object)
             + _MH_B[None, :].astype(object)) % int(_MERSENNE)
    return np.min(np.asarray(prods, dtype=np.uint64), axis=0)


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("n_shingles", T.IntegerType()),
    ]
)


def minhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    def run(batches):
        for pdf in batches:
            ids, sigs, ns = [], [], []
            for r in range(len(pdf)):
                sh = _shingle_hashes(pdf.iloc[r]["text"], k)
                ids.append(int(pdf.iloc[r]["doc_id"]))
                sigs.append([int(x) for x in minhash_signature(np.unique(sh))])
                ns.append(len(np.unique(sh)))
            yield pd.DataFrame({"doc_id": ids, "sig": sigs, "n_shingles": ns})

    return docs.select("doc_id", "text").mapInPandas(run, _SIG_SCHEMA)


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.7, k: int = 3
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard) via banded LSH:
    docs whose signatures agree on any full band meet in a bucket; the
    estimated Jaccard (signature agreement rate) filters the rest.  The
    only shuffles: the band explode groupBy and the pair dedup."""
    sigs = minhash_signatures(docs, k).persist()
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[i] for i in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)]
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = pairs.withColumn(
        "est_jaccard",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(N_HASHES)),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidate pairs (verification path)."""
    cand = minhash_lsh_pairs(docs, threshold=0.0, k=k)
    texts = docs.select(F.col("doc_id"), F.col("text"))
    j = (
        cand.join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), on="doc_a")
        .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), on="doc_b")
    )

    @F.pandas_udf(T.DoubleType())
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = set(np.unique(_shingle_hashes(ta.iloc[i], k)).tolist())
            sb = set(np.unique(_shingle_hashes(tb.iloc[i], k)).tolist())
            out[i] = len(sa & sb) / max(len(sa | sb), 1)
        return pd.Series(out)

    return (
        j.withColumn("jaccard", jac("text_a", "text_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --- SimHash ------------------------------------------------------------------


def simhash64(text: str) -> int:
    th = _token_hashes(text)
    if len(th) == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


def simhash_df(docs: DataFrame) -> DataFrame:
    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series([simhash64(t) for t in texts], dtype="int64")

    return docs.select("doc_id", sh(F.col("text")).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, bucketed on 16-bit
    chunks (a pair within hamming<=3 of 4 chunks shares at least one
    exact chunk; for larger budgets this is a recall-oriented filter)."""
    s = simhash_df(docs)
    chunks = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    l, r = chunks.alias("l"), chunks.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.key") == F.col("r.key"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("doc_a", "doc_b", "hamming")


# --- language ID / quality / fingerprint ---------------------------------------

_LANG_PROFILES = {
    # letter-frequency profiles (per mille, approximate, public knowledge)
    "en": {"e": 127, "t": 91, "a": 82, "o": 75, "i": 70, "n": 67, "s": 63, "h": 61, "r": 60},
    "de": {"e": 174, "n": 98, "i": 75, "s": 73, "r": 70, "a": 65, "t": 61, "d": 51, "h": 48},
    "fr": {"e": 147, "a": 76, "i": 75, "s": 79, "n": 71, "r": 66, "t": 72, "u": 63, "l": 55},
    "es": {"e": 137, "a": 125, "o": 87, "s": 80, "r": 69, "n": 67, "i": 63, "d": 59, "l": 50},
}


def language_id(docs: DataFrame) -> DataFrame:
    """Letter-frequency cosine against fixed profiles → best language."""
    langs = sorted(_LANG_PROFILES)
    profs = []
    for lg in langs:
        v = np.zeros(26)
        for ch, f in _LANG_PROFILES[lg].items():
            v[ord(ch) - 97] = f
        profs.append(v / np.linalg.norm(v))
    P = np.stack(profs)

    @F.pandas_udf(T.StringType())
    def lid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            counts = np.zeros(26)
            for b in t.lower().encode("ascii", "ignore"):
                if 97 <= b <= 122:
                    counts[b - 97] += 1
            n = np.linalg.norm(counts)
            if n == 0:
                out.append("unknown")
                continue
            out.append(langs[int(np.argmax(P @ (counts / n)))])
        return pd.Series(out)

    return docs.select("doc_id", lid(F.col("text")).alias("lang_pred"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Cheap quality heuristics, all native column expressions."""
    text = F.col("text")
    toks = F.split(text, " ", -1)
    n_tok = F.size(toks)
    return docs.select(
        "doc_id",
        F.length(text).alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(F.length(text) / n_tok, 6).alias("avg_tok_span"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to")))
            / n_tok,
            6,
        ).alias("stopword_ratio"),
        F.round(
            (F.length(text) - F.length(F.regexp_replace(text, r"[^a-zA-Z ]", ""))) / F.length(text),
            6,
        ).alias("nonalpha_ratio"),
    )


def fingerprint64(docs: DataFrame) -> DataFrame:
    """Deterministic 64-bit rolling polynomial content hash."""

    @F.pandas_udf(T.LongType())
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = 0
            for b in t.encode("utf-8"):
                h = (h * 1000003 + b) & 0xFFFFFFFFFFFFFFFF
            out.append(h - (1 << 64) if h >= 1 << 63 else h)
        return pd.Series(out, dtype="int64")

    return docs.select("doc_id", fp(F.col("text")).alias("fingerprint"))
