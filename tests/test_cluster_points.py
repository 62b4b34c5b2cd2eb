"""spatial.cluster_points (grid-method ε-clustering) vs a brute-force
all-pairs union-find."""

import numpy as np
import pytest

from mapalgebra_spark import spatial as SP

pytestmark = pytest.mark.spark


def brute_clusters(ids, xs, ys, eps):
    n = len(ids)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            d2 = (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2
            if d2 <= eps * eps:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    out = {}
    for i in range(n):
        root = find(i)
        members = [ids[k] for k in range(n) if find(k) == root]
        out[ids[i]] = min(members)
    return out


def _run(spark, ids, xs, ys, eps):
    df = spark.createDataFrame(
        list(zip(ids, xs, ys)), "point_id long, lat double, lng double"
    )
    return {
        r["point_id"]: r["cluster"]
        for r in SP.cluster_points(df, eps).collect()
    }


def test_cluster_points_matches_bruteforce(spark):
    rng = np.random.default_rng(14)
    n = 120
    ids = list(range(1, n + 1))
    xs = [round(float(v), 2) for v in rng.uniform(-50, 50, n)]
    ys = [round(float(v), 2) for v in rng.uniform(-50, 50, n)]
    eps = 7.5
    assert _run(spark, ids, xs, ys, eps) == brute_clusters(ids, xs, ys, eps)


def test_cluster_points_chain_links_transitively(spark):
    # 5 points in a line, each 1.0 apart, eps 1.0: ONE cluster even
    # though the ends are 4.0 apart — single-linkage transitivity
    ids = [10, 20, 30, 40, 50]
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [0.0] * 5
    got = _run(spark, ids, xs, ys, 1.0)
    assert set(got.values()) == {10}


def test_cluster_points_isolated_and_cross_bucket(spark):
    # pair straddling a bucket boundary at exactly eps; plus a loner
    ids = [1, 2, 3]
    xs = [1.9, 3.9, 50.0]
    ys = [0.0, 0.0, 0.0]
    got = _run(spark, ids, xs, ys, 2.0)
    assert got[1] == got[2] == 1
    assert got[3] == 3
    with pytest.raises(ValueError):
        _run(spark, ids, xs, ys, 0.0)
