"""Round-5 verdict/advice fixes:

- knn_cells ring ESCALATION resolves polar stragglers without brute
  force (r4 verdict item 6) — near the poles cos(phi_max) -> 0 zeroes
  the longitude bound leg of any narrow ring, so only the
  parallel-wrapping ring can accept them,
- distance_allocation fails fast past the sentinel-safe axis bound
  (r4 advice item 1),
- connected_components confirms its digest fixpoint with an exact set
  compare (r4 advice item 2) — still converges, still exact.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_knn_cells_polar_stragglers_escalate_not_bruteforce(spark):
    """Queries at |lat| > 75 deg fail the first ring's acceptance bound
    (cos(phi_max) ~ 0), but the wrap-ring escalation stage must accept
    them: final fallback set EMPTY, results still exactly brute force."""
    from mapalgebra_spark import spatial as SP

    pts = spark.range(400).select(
        F.col("id").cast("string").alias("point_id"),
        ((F.col("id") * 37 % 1700) / 10.0 - 85.0).alias("lat"),
        ((F.col("id") * 73 % 3590) / 10.0 - 179.5).alias("lng"),
    )
    qs = spark.range(8).select(
        F.col("id").cast("string").alias("query_id"),
        (F.lit(82.0) + F.col("id") * 0.5).alias("lat"),
        (F.col("id") * 40.0 - 160.0).alias("lng"),
    )
    stats = {}
    out = SP.knn_cells(spark, qs, pts, k=3, level=6, max_ring=4, stats=stats)
    got = {(r["query_id"], r["point_id"], r["rank"]) for r in out.collect()}
    assert stats["bad_stage1"].count() > 0, "polar queries should fail ring 1"
    assert stats["bad"].count() == 0, "wrap escalation should resolve them"
    exact = {(r["query_id"], r["point_id"], r["rank"])
             for r in SP.knn_bruteforce(qs, pts, k=3).collect()}
    assert got == exact


def test_distance_allocation_axis_bound_fail_fast():
    from mapalgebra_spark.operators.distance import (
        _AXIS_LIMIT, _alloc_rows_dense, _vertical_scan_argmin,
    )

    with pytest.raises(ValueError, match="2\\^23"):
        _vertical_scan_argmin(np.zeros((_AXIS_LIMIT, 1), dtype=bool))
    with pytest.raises(ValueError, match="2\\^23"):
        _alloc_rows_dense(np.zeros((1, _AXIS_LIMIT)))


def test_connected_components_confirmed_fixpoint(spark):
    """The confirming exceptAll pass must not change results: a chain
    plus a triangle still labels every node with its component min."""
    from mapalgebra_spark import graph as G

    edges = [(i, i + 1) for i in range(0, 20)] + [(100, 101), (101, 102), (102, 100)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {(r["id"], r["component"]) for r in G.connected_components(df).collect()}
    exp = {(i, 0) for i in range(21)} | {(i, 100) for i in (100, 101, 102)}
    assert got == exp


def test_asof_join_vs_pandas_merge_asof(spark):
    """asof_join must reproduce pandas merge_asof (backward,
    allow_exact_matches) including: no-match users (NULL payload),
    exact-timestamp matches, and the tolerance cutoff."""
    left = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id":  [10, 10, 10, 20, 30, 20],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:05", "2024-01-01 00:10:00",
            "2024-01-01 01:00:00", "2024-01-01 00:00:30",
            "2024-01-01 02:00:00", "2024-01-01 00:00:01",
        ]),
    })
    right = pd.DataFrame({
        "user_id": [10, 10, 20, 40],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:05",   # exact match for event 1
            "2024-01-01 00:30:00",
            "2024-01-01 00:00:10",
            "2024-01-01 00:00:00",
        ]),
        "value": [1.5, 2.5, 7.0, 9.0],
    })
    from mapalgebra_spark.streaming import asof_join

    for tol in (None, 600.0):
        got = asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            key="user_id", ts="ts", right_cols=("value",),
            tolerance_seconds=tol,
        ).toPandas().sort_values("event_id").reset_index(drop=True)
        exp = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="user_id", direction="backward",
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("event_id").reset_index(drop=True)
        ev = exp["value"].to_numpy(dtype=np.float64)
        gv = got["asof_value"].to_numpy(dtype=np.float64)
        assert ((np.isnan(ev) & np.isnan(gv)) | (ev == gv)).all(), (tol, got, exp)


def test_k_fmedian_matches_numpy_median():
    from mapalgebra_spark import kernels as K

    rng = np.random.default_rng(11)
    p = rng.normal(size=(12, 14))
    got = K.k_fmedian(p)
    exp = np.empty((10, 12))
    for y in range(10):
        for x in range(12):
            exp[y, x] = np.median(p[y:y + 3, x:x + 3])
    np.testing.assert_array_equal(got, exp)


def test_pack_documents_greedy_semantics(spark):
    """Boundary rules: a doc that would overflow starts a new pack; a
    doc larger than capacity alone occupies one; packing never splits
    a document."""
    from mapalgebra_spark.textops import pack_documents

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "n_chars": [50, 60, 200, 10, 95],
    })
    out = pack_documents(
        spark.createDataFrame(pdf), capacity=100, cost="n_chars",
        key="doc_id", n_shards=1,
    ).toPandas().sort_values("doc_id")
    # order by doc_id: 50 -> pack0(50); 60 overflows -> pack1(60);
    # 200 overflows -> pack2(200, oversize alone); 10 -> pack3(10);
    # 95 overflows (10+95>100) -> pack4
    assert list(out["pack_id"]) == [0, 1, 2, 3, 4]


def test_deterministic_split_is_additive(spark):
    """Adding documents never reassigns existing ones: the split of a
    subset equals the subset of the split."""
    from pyspark.sql import functions as F
    from mapalgebra_spark.textops import deterministic_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {r["doc_id"]: r["split"]
            for r in deterministic_split(docs).select("doc_id", "split").collect()}
    sub = {r["doc_id"]: r["split"]
           for r in deterministic_split(docs.filter(F.col("doc_id") % 3 == 0))
           .select("doc_id", "split").collect()}
    assert all(full[k] == v for k, v in sub.items()) and len(sub) > 0
