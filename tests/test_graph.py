"""connected_components (large-star/small-star) vs a union-find oracle."""

import random

import pytest

from mapalgebra_spark.graph import connected_components, largest_component_sizes

pytestmark = pytest.mark.spark


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    # path-compress fully, then label by component min (find() already
    # roots at the min because union() hangs the larger root)
    return {x: find(x) for x in parent}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, **kw).collect()
    out = {r["id"]: r["component"] for r in got}
    assert len(got) == len(out), "duplicate id rows"
    return out


def assert_matches_oracle(spark, edges):
    got = _run(spark, edges)
    exp = _union_find(edges)
    assert got == exp


def test_two_pairs_sharing_a_node(spark):
    # the case the pipelines' one-shot anti-join gets wrong: closure of
    # (1,3),(2,3) is ONE component rooted at 1
    got = _run(spark, [(1, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_needs_multiple_rounds(spark):
    # a 200-node path has diameter 199 — only a doubling algorithm
    # converges here inside the max_iters bound
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(200)}


def test_chain_worst_orientation(spark):
    # descending ids along the path (min at the far end)
    edges = [(i + 1, i) for i in range(149)]
    random.Random(7).shuffle(edges)
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(150)}


def test_star_and_clique_and_isolated_pair(spark):
    edges = (
        [(100, i) for i in range(90, 100)]          # star, hub = max id
        + [(a, b) for a in range(5) for b in range(a)]  # clique 0..4
        + [(1000, 2000)]
    )
    got = _run(spark, edges)
    exp = _union_find(edges)
    assert got == exp
    assert got[100] == 90 and got[1000] == 1000 and got[2000] == 1000


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(7, 7), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _run(spark, edges)
    # 7 and 3 appear only in self-loops -> not nodes of any real edge;
    # canonicalization drops them entirely (documented: ids come from
    # the EDGE set; callers union in isolated nodes themselves)
    assert got == {1: 1, 2: 1}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        m = [30, 140, 400][trial]  # sub/near/super-critical density
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert_matches_oracle(spark, edges)


def test_deterministic(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(100)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run(spark, edges) == _run(spark, edges)


def test_custom_column_names_and_casting(spark):
    df = spark.createDataFrame([(10, 11), (11, 12)], "doc_a int, doc_b int")
    got = connected_components(df, "doc_a", "doc_b").collect()
    assert {r["id"]: r["component"] for r in got} == {10: 10, 11: 10, 12: 10}


def test_largest_component_sizes(spark):
    edges = [(i, i + 1) for i in range(10)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    comp = connected_components(df)
    rows = largest_component_sizes(comp, top=5).collect()
    assert [(r["component"], r["size"]) for r in rows] == [(0, 11), (100, 2)]


def test_no_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iters=1)


# --- repetition_scores + near_dup_clusters (textops r4) ----------------------


def _rep(spark, texts):
    from mapalgebra_spark.textops import repetition_scores

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}


def test_repetition_hand_computed(spark):
    got = _rep(spark, [
        "a b a b a b",        # 0: heavy 2-gram repetition
        "x y z w",            # 1: no repetition
        "q q q q q",          # 2: one token run
        "solo",               # 3: single token (no 2/5-grams)
    ])
    d0 = got[0]
    # 6 tokens, 2 distinct; 2-grams: ab,ba,ab,ba,ab -> top 3/5;
    # 5-grams: ababa, babab -> both unique -> dup 0
    assert d0["n_tokens"] == 6
    assert d0["dup_token_frac"] == round(1 - 2 / 6, 6)
    assert d0["top_2gram_frac"] == 0.6
    assert d0["dup_5gram_frac"] == 0.0
    assert d0["max_token_run"] == 1
    d1 = got[1]
    assert d1["dup_token_frac"] == 0.0 and d1["top_2gram_frac"] == round(1 / 3, 6)
    d2 = got[2]
    # "q q q q q": 4 identical 2-grams, 1 5-gram (unique), run of 5
    assert d2["top_2gram_frac"] == 1.0
    assert d2["dup_5gram_frac"] == 0.0
    assert d2["max_token_run"] == 5
    assert d2["dup_token_frac"] == 0.8
    d3 = got[3]
    assert d3 == dict(doc_id=3, n_tokens=1, dup_token_frac=0.0,
                      top_2gram_frac=0.0, dup_5gram_frac=0.0, max_token_run=1)


def test_repetition_dup_5gram(spark):
    # "a b c d e a b c d e a b c d e f": 5-gram slots = 12; grams
    # abcde occurs 3x, bcdea/cdeab/deabc/eabcd 2x each -> dup slots =
    # 3 + 4*2 = 11
    got = _rep(spark, ["a b c d e a b c d e a b c d e f"])
    assert got[0]["dup_5gram_frac"] == round(11 / 12, 6)
    assert got[0]["max_token_run"] == 1


def test_near_dup_clusters_transitive(spark):
    from mapalgebra_spark.textops import near_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " mu"),          # near-dup of 0
            (2, base + " mu nu"),       # near-dup of 1 (and of 0)
            (10, "totally different words about other things entirely here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in near_dup_clusters(docs, threshold=0.5).collect()}
    assert out[0] == (0, 1)
    assert out[1] == (0, 0)
    assert out[2] == (0, 0)
    assert out[10] == (10, 1)
