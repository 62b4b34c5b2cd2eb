"""Text / training-data pipeline operators over the ``documents`` table.

Beyond the reference's raster surface, a 100 TB training-data engine
needs dedup + text analysis primitives.  Everything here is **pure JVM
column expressions** (whole-stage codegen; no Python UDFs, no Arrow
round-trips) built on one deterministic cross-engine hash:

    h(s) = CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)

60 bits of md5 — identical in DuckDB as
``('0x' || substr(md5(s),1,15))::BIGINT`` — so every operator below has
an exact relational oracle (see queries.py) and is hash-checked by the
driver, not just rows-counted.

- exact dedup        — hash groupBy (md5 fingerprint)
- MinHash + LSH      — word-3-shingles → h31 → 64 universal hashes
                       (a_i*x+b_i mod 2^31-1, 64 min-aggregates) →
                       8 bands x 8 rows → band-bucket self-join.
                       Only colliding docs ever meet: never all-pairs.
- SimHash            — 60-bit simhash over token hashes as 60
                       conditional sums in ONE aggregate; hamming
                       pairs via 15-bit chunk buckets.
- n-gram Jaccard     — exact Jaccard of shingle-hash sets over LSH
                       candidates pre-filtered at est >= t - eps
                       (array_intersect/array_union, JVM-side).
- language ID        — letter-frequency cosine vs fixed profiles with
                       exact integer cross-multiplied argmax (no float
                       tie hazards between engines).
- quality scoring    — length / punctuation / stopword ratios
- fingerprinting     — order-sensitive 60-bit content fingerprint:
                       bit_xor over h(position:token).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cacheutil import attach_bases

# --- the shared 60-bit md5 hash (Spark <-> DuckDB identical) -----------------

P31 = 2147483647  # 2^31 - 1 (Mersenne): universal-hash modulus


# NOTE: an earlier round pinned the wide generated expressions below
# (26-letter x 8-lang dot products, 60 conditional-sum simhash bits) to
# interpreted mode because janino+JIT compile measured ~4-5s.  After the
# session-level GC/janino fixes that cost is gone: re-measured fresh-JVM
# cold runs show codegen-on beating the interpreted pin on BOTH cold and
# warm executions for all three ops (lang_id 1.08/0.48s vs 1.82/0.70s;
# simhash 2.12/1.77 vs 3.04/2.18; ngram 5.58/2.99 vs 6.43/3.12), so the
# pin was removed and these plans compile like everything else.


def h60(col) -> F.Column:
    """60-bit deterministic hash of a string column (JVM md5 + conv)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h31(col) -> F.Column:
    """h60 folded into [0, 2^31-1) for universal-hash arithmetic."""
    return h60(col) % F.lit(P31)


def h60_local(s: str) -> int:
    """Python reference of :func:`h60` (tests / local oracles only)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# --- shingles -----------------------------------------------------------------

SHINGLE_K = 3

#: word k-shingle strings of `text` (SQL fragment; < k tokens → the
#: space-normalized text itself, matching the DuckDB oracle branch)
_TOKS = "split(text, ' ', -1)"
SHINGLES_SQL = (
    f"CASE WHEN size({_TOKS}) >= {SHINGLE_K} THEN "
    f"transform(sequence(0, size({_TOKS})-{SHINGLE_K}), "
    f"i -> concat_ws(' ', slice({_TOKS}, i+1, {SHINGLE_K}))) "
    f"ELSE array(concat_ws(' ', {_TOKS})) END"
)


def shingle_hashes(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, hh) — 31-bit shingle hashes per document.

    ``distinct=False`` skips the dedup shuffle for duplicate-insensitive
    consumers (the 64 ``min`` aggregates of a minhash signature give the
    same result either way; the DuckDB oracle keeps DISTINCT — identical
    output, one shuffle cheaper here).

    The doc table is repartitioned by doc_id first: a document table
    often arrives as few fat files (one input split = one task doing
    ALL the hashing); the repartition both parallelizes the md5 stage
    and pre-shuffles for the downstream per-doc aggregate."""
    out = docs.repartition(F.col("doc_id")).select(
        "doc_id", F.explode(F.expr(SHINGLES_SQL)).alias("s")
    ).select("doc_id", h31(F.col("s")).alias("hh"))
    return out.distinct() if distinct else out


def shingle_hashes_local(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Python reference of :func:`shingle_hashes` for one document."""
    toks = text.split(" ")
    if len(toks) >= k:
        sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        sh = [" ".join(toks)]
    return np.unique(np.array([h60_local(s) % P31 for s in sh], dtype=np.int64))


# --- MinHash ------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS


def _minhash_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P31, size=N_HASHES, dtype=np.int64)
    b = rng.integers(0, P31, size=N_HASHES, dtype=np.int64)
    return a, b


#: the (a_i, b_i) of perm_i(x) = (a_i*x + b_i) mod P31 — shared with the
#: DuckDB oracle generator in queries.py (same module-level constants)
MH_A, MH_B = _minhash_params()


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, hs) — the distinct shingle-hash SET per document, as ONE
    pure projection: ``array_distinct(transform(shingles, h31))``.

    No explode, no aggregate: the shingle array never leaves its row,
    so the only exchange is the round-robin-by-doc_id repartition that
    parallelizes the md5 work (a document table often arrives as few
    fat files — one input split would otherwise do ALL the hashing).
    At 100 TB this is a single narrow map stage over the corpus versus
    the previous explode → collect_set re-aggregation of ~50 rows per
    document.  Shared upstream of both signature computation and
    exact-Jaccard verification so the corpus is hashed once; hash-
    partitioning by doc_id also pre-locates the doc_a/doc_b verify
    joins downstream."""
    hs = F.array_distinct(F.transform(F.expr(SHINGLES_SQL), lambda s: h31(s)))
    return docs.repartition(F.col("doc_id")).select("doc_id", hs.alias("hs"))


def _signature_cols(hs) -> list:
    """The 64 min-hash columns from a shingle-hash-set array column —
    pure expressions (array_min over transform), no extra shuffle.
    min over the SET == min over the exploded multiset, so this matches
    the DuckDB oracle's grouped-min formulation exactly."""
    return [
        F.array_min(
            F.transform(hs, lambda x: (F.lit(int(MH_A[i])) * x + F.lit(int(MH_B[i]))) % P31)
        ).alias(f"m{i}")
        for i in range(N_HASHES)
    ]


def minhash_signatures(docs: DataFrame, k: int = SHINGLE_K, sets: DataFrame | None = None) -> DataFrame:
    """(doc_id, m0..m63): 64 min-hashes — one collect_set shuffle, then
    64 array_min/transform column expressions; whole-stage codegen, no
    Python.  Pass ``sets`` to reuse an already-built shingle_sets."""
    assert k == SHINGLE_K, "shingle width is baked into SHINGLES_SQL"
    s = sets if sets is not None else shingle_sets(docs)
    return s.select("doc_id", *_signature_cols(F.col("hs")))


def minhash_signature_local(hh: np.ndarray) -> np.ndarray:
    """Python reference of one signature (int64 math, no overflow:
    a, x < 2^31 so a*x+b < 2^62)."""
    x = np.asarray(hh, dtype=np.int64)
    return ((x[:, None] * MH_A[None, :] + MH_B[None, :]) % P31).min(axis=0)


def _band_structs():
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{i}").cast("string")
                        for i in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)
                    ],
                ).alias("bkey"),
            )
            for b in range(N_BANDS)
        ]
    )


def _lsh_candidates(sigs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, sig_a, sig_b) for signature pairs agreeing on at
    least one full band.  The self-join key is (band, band-key): only
    colliding docs meet — the classic banded-LSH sweep, never
    all-pairs."""
    sig = F.array(*[F.col(f"m{i}") for i in range(N_HASHES)])
    bands = sigs.select(
        "doc_id", sig.alias("sig"), F.explode(_band_structs()).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bkey") == F.col("r.bkey"),
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


def _est_jaccard() -> F.Column:
    return F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
    ) / F.lit(float(N_HASHES))


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.7, k: int = SHINGLE_K) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard) via banded LSH.
    Deterministic end-to-end (md5 hashes + fixed permutation constants)
    — the DuckDB oracle recomputes the identical pipeline.  The
    SIGNATURES are persisted (not just the shingle sets): the band
    self-join references the signature pipeline on BOTH sides, and
    persisting one level lower would recompute the 64 min-hash
    transforms twice (no subplan sharing across a self-join)."""
    sigs = minhash_signatures(docs, k).persist()
    pairs = _lsh_candidates(sigs)
    est = pairs.withColumn("est_jaccard", _est_jaccard())
    return attach_bases(
        est.filter(F.col("est_jaccard") >= threshold).select(
            "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
        ),
        [sigs],
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = SHINGLE_K, prefilter_eps: float = 0.1
) -> DataFrame:
    """Exact n-gram Jaccard (verification path) over LSH candidates.

    Candidates are pre-filtered at ``est_jaccard >= threshold -
    prefilter_eps`` so a skewed band bucket can't explode into a
    quadratic exact-verify stage; the Jaccard itself is
    array_intersect/array_union over DISTINCT shingle-hash sets — all
    JVM, no per-row Python.  The shingle sets are built ONCE and
    persisted for the verify joins (both sides), and the SIGNATURES are
    persisted separately so the band self-join doesn't recompute the 64
    min-hash transforms per side."""
    sets = shingle_sets(docs).persist()
    sigs = minhash_signatures(docs, k, sets=sets).persist()
    cand = (
        _lsh_candidates(sigs)
        .withColumn("est", _est_jaccard())
        .filter(F.col("est") >= threshold - prefilter_eps)
        .select("doc_a", "doc_b")
    )
    j = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), on="doc_a"
        )
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), on="doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("hs_a", "hs_b"))
            / F.size(F.array_union("hs_a", "hs_b")).cast("double"),
        )
    )
    return attach_bases(
        j.filter(F.col("jaccard") >= threshold).select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
        ),
        [sets, sigs],
    )


# --- SimHash ------------------------------------------------------------------

SIMHASH_BITS = 60  # h60 width; 4 chunks of 15 bits for the hamming buckets


def simhash_df(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit simhash over token hashes.

    One explode + one aggregate: bit i's vote is sum(+-1 per token by
    bit i of h60(token)); the hash reassembles as a sum of CASE terms.
    Token multiplicity is the weight (classic simhash)."""
    toks = docs.repartition(F.col("doc_id")).select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("tok")
    ).select("doc_id", h60(F.col("tok")).alias("hh"))
    # collapse duplicate tokens first: natural-language corpora repeat
    # tokens 2-5x, so the 60 bit-sums below run over the DISTINCT
    # (doc, hash) rows weighted by count — same votes (s_i = 2*c_i - n
    # where c_i counts set bits), measurably fewer aggregate rows, and
    # the dedup groupBy partial-aggregates map-side before its shuffle.
    toks = toks.groupBy("doc_id", "hh").agg(F.count("*").alias("cnt"))
    votes = toks.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        *[
            F.sum(
                F.shiftright(F.col("hh"), i).bitwiseAND(F.lit(1)) * F.col("cnt")
            ).alias(f"c{i}")
            for i in range(SIMHASH_BITS)
        ],
    )
    acc = None
    for i in range(SIMHASH_BITS):
        # bit set iff the +1/-1 vote sum is positive: 2*c_i > n
        term = F.when(2 * F.col(f"c{i}") > F.col("n"), F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = term if acc is None else acc + term
    return votes.select("doc_id", acc.alias("simhash"))


def simhash_local(text: str) -> int:
    """Python reference of :func:`simhash_df` for one document."""
    hs = np.array([h60_local(t) for t in text.split(" ")], dtype=np.int64)
    out = 0
    for i in range(SIMHASH_BITS):
        v = int((2 * ((hs >> i) & 1) - 1).sum())
        if v > 0:
            out |= 1 << i
    return out


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, bucketed on 15-bit
    chunks (a pair within hamming<=3 of 4 chunks shares at least one
    exact chunk; larger budgets make this a recall-oriented filter).
    The simhash base is persisted: the chunk self-join would otherwise
    recompute the token-hash aggregate on both sides."""
    s = simhash_df(docs).persist()
    chunks = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("key"),
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
    return attach_bases(pairs.select("doc_a", "doc_b", "hamming"), [s])


# --- language ID / quality / fingerprint ---------------------------------------

_LANG_PROFILES = {
    # letter-frequency profiles (per mille, approximate, public knowledge)
    "en": {"e": 127, "t": 91, "a": 82, "o": 75, "i": 70, "n": 67, "s": 63, "h": 61, "r": 60},
    "de": {"e": 174, "n": 98, "i": 75, "s": 73, "r": 70, "a": 65, "t": 61, "d": 51, "h": 48},
    "fr": {"e": 147, "a": 76, "i": 75, "s": 79, "n": 71, "r": 66, "t": 72, "u": 63, "l": 55},
    "es": {"e": 137, "a": 125, "o": 87, "s": 80, "r": 69, "n": 67, "i": 63, "d": 59, "l": 50},
}
LANGS = sorted(_LANG_PROFILES)  # de, en, es, fr — argmax tie order
LANG_LETTERS = sorted({ch for p in _LANG_PROFILES.values() for ch in p})
#: squared profile norms (exact integers)
LANG_N = {lg: sum(w * w for w in p.values()) for lg, p in _LANG_PROFILES.items()}


def language_id(docs: DataFrame) -> DataFrame:
    """Letter-frequency cosine against fixed profiles → best language.

    cos(P_lg, c) ordering is decided EXACTLY: dot products and squared
    norms are integers, so lg beats mg iff dot_lg^2 * N_mg >= dot_mg^2
    * N_lg (both dots >= 0) — decimal(38,0) arithmetic, no float ties,
    identical in the DuckDB oracle (HUGEINT).

    The dots are staged in their own projection behind a
    nondeterministic barrier column: codegen does no common-subexpr
    elimination inside CASE branches, so without the barrier Catalyst
    re-inlines every dot (9 string scans each) into all 12 comparisons
    — measured 2.8s → 0.8s at sf0.1 with the barrier."""
    lt = F.lower(F.col("text"))
    # counts as LONG before any multiply: int32 dot products would hit
    # ANSI ARITHMETIC_OVERFLOW on a ~100 MB document while the HUGEINT
    # oracle sails through — the long/decimal ladder never overflows
    counts = {
        ch: (F.length(lt) - F.length(F.replace(lt, F.lit(ch), F.lit("")))).cast("long")
        for ch in LANG_LETTERS
    }
    dots = {
        lg: sum(
            (counts[ch] * F.lit(w) for ch, w in prof.items()), F.lit(0).cast("long")
        ).cast("decimal(38,0)")
        for lg, prof in _LANG_PROFILES.items()
    }
    n_alpha = F.length(lt) - F.length(F.regexp_replace(lt, "[a-z]", ""))
    staged = docs.select(
        "doc_id",
        n_alpha.alias("n_alpha"),
        *[dots[lg].alias(f"d_{lg}") for lg in LANGS],
        F.spark_partition_id().alias("_barrier"),
    )
    d = {lg: F.col(f"d_{lg}") for lg in LANGS}

    def ge(x: str, y: str) -> F.Column:
        return d[x] * d[x] * F.lit(LANG_N[y]) >= d[y] * d[y] * F.lit(LANG_N[x])

    pred = F.when(F.col("n_alpha") == 0, F.lit("unknown"))
    for lg in LANGS[:-1]:
        cond = None
        for mg in LANGS:
            if mg == lg:
                continue
            c = ge(lg, mg)
            cond = c if cond is None else cond & c
        pred = pred.when(cond, F.lit(lg))
    pred = pred.otherwise(F.lit(LANGS[-1]))
    return staged.select("doc_id", pred.alias("lang_pred"))


def language_id_local(text: str) -> str:
    """Python reference of :func:`language_id` (same exact-integer rule)."""
    lt = text.lower()
    counts = {ch: lt.count(ch) for ch in LANG_LETTERS}
    if sum(1 for c in lt if "a" <= c <= "z") == 0:
        return "unknown"
    dots = {
        lg: sum(counts[ch] * w for ch, w in prof.items()) for lg, prof in _LANG_PROFILES.items()
    }
    for lg in LANGS:
        if all(
            dots[lg] ** 2 * LANG_N[mg] >= dots[mg] ** 2 * LANG_N[lg]
            for mg in LANGS
            if mg != lg
        ):
            return lg
    return LANGS[-1]


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
    """Order-sensitive 60-bit content fingerprint: bit_xor over
    h60('<1-based position>:<token>').  Permutations, insertions and
    edits all change the fingerprint; pure JVM (posexplode + bit_xor
    aggregate, partial-agg before the shuffle)."""
    e = docs.repartition(F.col("doc_id")).select(
        "doc_id", F.posexplode(F.split("text", " ", -1)).alias("pos", "tok")
    )
    h = h60(F.concat((F.col("pos") + 1).cast("string"), F.lit(":"), F.col("tok")))
    return (
        e.select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(F.expr("bit_xor(h)").alias("fingerprint"))
    )


def fingerprint_local(text: str) -> int:
    """Python reference of :func:`fingerprint64`."""
    out = 0
    for i, tok in enumerate(text.split(" ")):
        out ^= h60_local(f"{i + 1}:{tok}")
    return out


# --- repetition / boilerplate signals (Gopher-style) -------------------------


def _gram_col(k: int) -> F.Column:
    """array<string> of word k-grams of ``text`` (empty when < k tokens
    — unlike SHINGLES_SQL, a short doc contributes NO grams here: a
    repetition ratio over a 1-element pseudo-gram set would read 0/1
    noise, not signal)."""
    return F.expr(
        f"CASE WHEN size({_TOKS}) >= {k} THEN "
        f"transform(sequence(0, size({_TOKS})-{k}), "
        f"i -> concat_ws(' ', slice({_TOKS}, i+1, {k}))) "
        "ELSE CAST(array() AS array<string>) END"
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Token-level repetition signals per document — the Gopher-rule
    family (Rae et al. 2021, "Scaling Language Models: ... Gopher"
    §A1.1 repetition filters), restated over whitespace tokens so every
    number has an exact relational twin:

    - ``dup_token_frac``   1 - distinct/total tokens
    - ``top_2gram_frac``   occurrences of the most frequent 2-gram /
                           total 2-grams (0.0 when < 2 tokens)
    - ``dup_5gram_frac``   fraction of 5-gram slots whose gram occurs
                           more than once — counting ALL occurrences,
                           first included, per the Gopher definition
                           (0.0 when < 5 tokens)
    - ``max_token_run``    longest run of one token repeated
                           consecutively (gaps-and-islands: pos -
                           row_number over (doc, token) is constant
                           exactly on consecutive stretches)

    Pure JVM: three explode→partial-agg pipelines plus one window
    partitioned by (doc_id, token) — every shuffle is keyed by doc (or
    doc+token), so 10^11 documents spread over the cluster with no
    driver state and no skewed global key."""
    from pyspark.sql import Window

    base = docs.repartition(F.col("doc_id")).select("doc_id", "text")
    tok = base.select(
        "doc_id", F.posexplode(F.split("text", " ", -1)).alias("pos", "tok")
    )
    tokc = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("nd"),
    )
    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    runs = (
        tok.select(
            "doc_id", "tok", (F.col("pos") - F.row_number().over(w)).alias("grp")
        )
        .groupBy("doc_id", "tok", "grp")
        .agg(F.count("*").alias("run"))
        .groupBy("doc_id")
        .agg(F.max("run").alias("max_token_run"))
    )

    def gram_stats(k: int) -> DataFrame:
        gc = (
            base.select("doc_id", F.explode(_gram_col(k)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )
        return gc.groupBy("doc_id").agg(
            F.sum("c").alias("tot"),
            F.max("c").alias("top"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup"),
        )

    g2 = gram_stats(2).select(
        "doc_id", F.round(F.col("top") / F.col("tot"), 6).alias("top_2gram_frac")
    )
    g5 = gram_stats(5).select(
        "doc_id", F.round(F.col("dup") / F.col("tot"), 6).alias("dup_5gram_frac")
    )
    return (
        tokc.join(runs, "doc_id")
        .join(g2, "doc_id", "left")
        .join(g5, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.lit(1.0) - F.col("nd") / F.col("n_tokens"), 6).alias(
                "dup_token_frac"
            ),
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce("dup_5gram_frac", F.lit(0.0)).alias("dup_5gram_frac"),
            "max_token_run",
        )
    )


def near_dup_clusters(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """(doc_id, cluster_id, keep) — TRANSITIVE near-dup clustering.

    MinHash-LSH pairs (:func:`minhash_lsh_pairs`) give direct edges
    only; one representative per similarity CLUSTER needs their
    connected components (pairs (1,3),(2,3): the anti-join the batch
    pipelines default to keeps {1,2}; the closure keeps {1}).
    ``cluster_id`` is the component's smallest doc_id; ``keep`` is 1
    exactly for that representative (and for every pairless doc).
    """
    from .graph import connected_components

    pairs = minhash_lsh_pairs(docs, threshold=threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    out = (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            (F.col("doc_id") == F.coalesce("component", "doc_id"))
            .cast("int")
            .alias("keep"),
        )
    )
    return attach_bases(
        out,
        list(getattr(pairs, "_persisted_bases", ()))
        + list(getattr(comp, "_persisted_bases", ())),
    )


def deterministic_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key: str = "doc_id",
    salt: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic, content-keyed train/val/test assignment — the
    split every training pipeline needs to be REPRODUCIBLE: each row's
    bucket is ``h60(salt || ':' || key) % buckets`` (the engine's
    shared md5 hash, identical arithmetic in DuckDB), cut by the
    cumulative weight thresholds.  Properties a `rand()` split lacks:
    stable across runs, engines, cluster sizes and partitionings, and
    ADDITIVE — ingesting more documents never reassigns an existing
    one, because assignment depends only on the row's own key.  Pure
    JVM projection, no shuffle."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = h60(F.concat(F.lit(f"{salt}:"), F.col(key).cast("string"))) % F.lit(buckets)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        cut = int(round(acc * buckets))
        cond = b < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


def cap_per_group(
    docs: DataFrame,
    group: str = "source",
    n: int = 100,
    key: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Domain capping — keep at most ``n`` documents per ``group``
    (source/domain), the standard curation guard against one crawl
    domain dominating a corpus.  Selection within a group is by the
    deterministic md5 order (``h60(salt:key)``, ties by key):
    uniform-random-like but exactly reproducible.  One window
    partitioned by the group column: 10^6 domains spread across the
    cluster; a single hot domain sorts only its own rows."""
    from pyspark.sql import Window

    h = h60(F.concat(F.lit(f"{salt}:"), F.col(key).cast("string")))
    w = Window.partitionBy(group).orderBy(h.asc(), F.col(key).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def pack_documents(
    docs: DataFrame,
    capacity: int = 4096,
    cost: str = "n_chars",
    key: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Greedy sequential sample PACKING: documents are first sharded
    deterministically (``h60(key) % n_shards`` — packing is per-shard
    so 10^9 documents parallelize), then WITHIN each shard, in
    ascending key order, each document joins the current pack unless
    its ``cost`` would push the pack past ``capacity``, in which case
    it starts the next pack.  A document costing more than
    ``capacity`` alone occupies its own pack.  This is the
    concat-documents-into-context-windows step of LLM training data
    prep, with whole-document granularity (chunk_documents is the
    intra-document variant).

    The scan is inherently sequential per shard (each decision depends
    on the running fill), so it runs as one Arrow-batched
    ``applyInPandas`` per shard with a numpy loop over that shard's
    rows — worker memory O(shard rows), no driver involvement.
    Returns (key, shard, pack_id, cost) — pack_id is shard-local."""
    import pandas as pd

    shard = (h60(F.col(key).cast("string")) % F.lit(n_shards)).cast("int")
    src = docs.select(
        F.col(key), F.col(cost).cast("long").alias("__cost"), shard.alias("shard")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key).reset_index(drop=True)
        costs = pdf["__cost"].to_numpy()
        packs = np.empty(len(costs), dtype=np.int64)
        fill, pid = 0, 0
        for i, c in enumerate(costs):
            if fill > 0 and fill + c > capacity:
                pid += 1
                fill = 0
            packs[i] = pid
            fill += c
        pdf["pack_id"] = packs
        return pdf

    out_schema = f"{key} long, __cost long, shard int, pack_id long"
    return (
        src.groupby("shard")
        .applyInPandas(lambda _, pdf: pack(pdf), out_schema)
        .select(key, "shard", "pack_id", F.col("__cost").alias(cost))
    )


def line_dedup(docs: DataFrame, line_tokens: int = 10) -> DataFrame:
    """CCNet-style LINE-level exact deduplication, generalized to
    fixed ``line_tokens``-token lines (the corpus here is single-line
    word streams; on real text the same pipeline runs with
    ``split(text, '\\n')`` as the segmenter): every line keeps only its
    globally FIRST occurrence — smallest (doc_id, line_idx) — and each
    document is reassembled from its surviving lines.

    Returns (doc_id, n_lines, kept_lines, dedup_text); documents whose
    every line appeared earlier reassemble to ''.

    Scale shape: pure JVM end-to-end.  The first-occurrence winner per
    line is ``min(struct(doc_id, line_idx))`` under a groupBy on the
    line text — partial aggregation collapses even a billion-copy
    boilerplate line map-side, so there is NO hot-key window and no
    join of all copies back onto the line text (the usual skew trap in
    line dedup).  Losers are simply never emitted; reconstruction
    groups the winners by doc_id."""
    if line_tokens < 1:
        raise ValueError(f"need line_tokens >= 1, got {line_tokens}")
    segs = (
        docs.select(
            "doc_id",
            F.split("text", " ", -1).alias("tk"),
            F.explode(
                F.expr(f"sequence(0, size(split(text, ' ', -1)) - 1, {line_tokens})")
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / line_tokens).cast("long").alias("line_idx"),
            F.concat_ws(
                " ", F.slice("tk", F.col("s") + 1, line_tokens)
            ).alias("line_text"),
        )
    )
    winners = (
        segs.groupBy("line_text")
        .agg(F.min(F.struct("doc_id", "line_idx")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.line_idx").alias("line_idx"),
            "line_text",
        )
    )
    kept = winners.groupBy("doc_id").agg(
        F.count("*").alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line_text"))),
                lambda x: x["line_text"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("kept_lines", F.lit(0)).alias("kept_lines"),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
    )


def chunk_documents(docs: DataFrame, size: int = 64, stride: int = 48) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard LLM-training preprocessing step (context windows of
    ``size`` tokens advancing by ``stride``; the final chunk may be
    short).  Pure JVM: sequence + explode + slice, shuffle keyed by
    doc_id only.  Returns (doc_id, chunk_start, chunk_text,
    chunk_tokens)."""
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got stride={stride} size={size}")
    toks = F.split("text", " ", -1)
    e = docs.repartition(F.col("doc_id")).select(
        "doc_id",
        toks.alias("tk"),
        F.explode(
            F.expr(f"sequence(0, size(split(text, ' ', -1)) - 1, {stride})")
        ).alias("chunk_start"),
    )
    chunk = F.slice("tk", F.col("chunk_start") + 1, size)
    return e.select(
        "doc_id",
        "chunk_start",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("chunk_tokens"),
    )
