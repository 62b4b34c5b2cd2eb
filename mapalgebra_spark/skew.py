"""Skew handling: salted joins for hot cells (BASELINE.json north_star:
"salting + AQE for skewed cells").

AQE's skew-join splitting (on by default, session.py) handles skewed
*shuffle partitions*; salting handles the harder case of ONE key so hot
that even a split partition is a single-key straggler — e.g. a dataset
hot spot piling millions of images into one H3 cell
(datagen.synthetic_latlng's ``hot_fraction`` knob generates exactly
this).

``salted_join(big, small, keys, n_salt)``: the big side gets a random
salt in [0, n_salt); the small side is exploded n_salt times; the join
key becomes (keys..., salt), splitting each hot key across n_salt
reducers.  Semantics preserved for inner/left joins on unique small-side
keys (each big row still meets its key exactly once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted against per-key skew."""
    salted_big = big.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_big.join(salted_small, on=keys + ["_salt"], how=how)
    return out.drop("_salt")


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Hot-key diagnostic: per-key row counts, heaviest first."""
    return df.groupBy(*keys).count().orderBy(F.col("count").desc()).limit(top)
