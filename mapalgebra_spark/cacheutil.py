"""Lifecycle for operator-internal persisted DataFrames.

Several operators persist a self-join base (LSH shingle sets, simhash
signatures, kNN cell indexes) because Spark computes an unpersisted
subplan once PER JOIN SIDE.  The persist is load-bearing, but a library
caller composing many queries in one session would otherwise accumulate
cached partitions with no handle to drop them (r2 advisor finding).

Operators attach their persisted bases to the DataFrame they return via
:func:`attach_bases`; callers drop them with :func:`unpersist_bases`
once the result is materialized (pipeline stages do this right after
the lineage snapshot commits).

Caveat: the attachment is a plain Python attribute on ONE DataFrame
object — any transformation (``.select``, ``.filter``, ...) returns a
NEW DataFrame without it.  A caller that derives from an operator
result must carry the handles forward explicitly::

    out = op(...)
    derived = attach_bases(out.select(...),
                           getattr(out, "_persisted_bases", ()))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_bases(df: DataFrame, bases) -> DataFrame:
    """Record ``bases`` (persisted DataFrames feeding ``df``) on the
    result so the caller can unpersist them after materializing."""
    existing = list(getattr(df, "_persisted_bases", ()))
    df._persisted_bases = existing + [b for b in bases if b is not None]
    return df


def unpersist_bases(df: DataFrame, blocking: bool = False) -> DataFrame:
    """Unpersist every base attached by :func:`attach_bases` (no-op for
    results that carry none)."""
    for b in getattr(df, "_persisted_bases", ()):
        try:
            b.unpersist(blocking)
        except Exception:
            pass
    df._persisted_bases = []
    return df
