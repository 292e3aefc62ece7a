"""Connected-components cluster resolution (operators/cluster.py)."""

import pytest
from pyspark.sql import functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def _union_find(edges, nodes):
    """Driver-side oracle: classic union-find over the same edges."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_chain_transitivity(spark):
    """a-b, b-c, c-d is ONE cluster even though (a,d) was never a pair."""
    from cassandra_util_spark.operators.cluster import connected_components

    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_edge_direction(spark):
    """Components stay separate; reversed edge order (b < a) still merges."""
    from cassandra_util_spark.operators.cluster import connected_components

    comp = connected_components(_pairs(spark, [(5, 4), (10, 11), (12, 11)]))
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == {4: 4, 5: 4, 10: 10, 11: 10, 12: 10}


def test_matches_union_find_on_random_graph(spark):
    """Random sparse graph vs a driver-side union-find oracle."""
    import random

    from cassandra_util_spark.operators.cluster import connected_components

    rnd = random.Random(7)
    nodes = list(range(200))
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges, {n for e in edges for n in e})

    comp = connected_components(_pairs(spark, edges))
    rows = {r["id"]: r["comp"] for r in comp.collect()}
    assert rows == expected


def test_convergence_guard_raises(spark):
    """A path graph of diameter > max_iter trips the guard instead of
    silently emitting an under-merged clustering."""
    from cassandra_util_spark.operators.cluster import connected_components

    chain = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iter=3)


def test_resolve_duplicates_canonical_and_singletons(spark):
    from cassandra_util_spark.operators.cluster import resolve_duplicates

    corpus = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = _pairs(spark, [(1, 3), (3, 5), (2, 6)])
    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           resolve_duplicates(corpus, pairs, "doc_id").collect()}
    assert out == {
        0: (0, True),
        1: (1, True), 3: (1, False), 5: (1, False),
        2: (2, True), 6: (2, False),
        4: (4, True), 7: (7, True),
    }
    # exactly one survivor per cluster
    survivors = [k for k, (c, keep) in out.items() if keep]
    assert sorted(survivors) == [0, 1, 2, 4, 7]


def test_star_matches_label_propagation(spark):
    """Star contraction and label propagation agree on a random graph (and
    both agree with union-find)."""
    import random

    from cassandra_util_spark.operators.cluster import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(21)
    edges = [(rnd.randrange(150), rnd.randrange(150)) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges, {n for e in edges for n in e})

    star = {r["id"]: r["comp"] for r in
            connected_components_star(_pairs(spark, edges)).collect()}
    lp = {r["id"]: r["comp"] for r in
          connected_components(_pairs(spark, edges)).collect()}
    assert star == expected
    assert lp == expected


def test_star_handles_long_chain(spark):
    """The adversarial-diameter case: a 60-link path converges in O(log²n)
    star rounds where label propagation would need 60."""
    from cassandra_util_spark.operators.cluster import connected_components_star

    chain = [(i, i + 1) for i in range(60)]
    comp = {r["id"]: r["comp"] for r in
            connected_components_star(_pairs(spark, chain), max_iter=12).collect()}
    assert comp == {i: 0 for i in range(61)}


def test_star_cliques_and_singetons_direction(spark):
    """Dense near-clique (the shape LSH buckets produce) + reversed edges."""
    from cassandra_util_spark.operators.cluster import connected_components_star

    clique = [(a, b) for a in range(5, 10) for b in range(5, 10) if a < b]
    comp = {r["id"]: r["comp"] for r in
            connected_components_star(_pairs(spark, clique + [(20, 15)])).collect()}
    assert comp == {**{i: 5 for i in range(5, 10)}, 15: 15, 20: 15}


def test_resolve_duplicates_star_method(spark):
    from cassandra_util_spark.operators.cluster import resolve_duplicates

    corpus = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = _pairs(spark, [(1, 3), (3, 5), (2, 6)])
    lp = resolve_duplicates(corpus, pairs, "doc_id")
    star = resolve_duplicates(corpus, pairs, "doc_id", method="star")
    assert sorted(map(tuple, lp.collect())) == sorted(map(tuple, star.collect()))

    with pytest.raises(ValueError, match="unknown method"):
        resolve_duplicates(corpus, pairs, "doc_id", method="nope")


def test_cluster_size_histogram_planted(spark):
    from cassandra_util_spark.operators.cluster import cluster_size_histogram

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
    )
    # components: {1,2,3}, {5,6}; singletons 4, 7
    got = {r["size"]: (r["n_clusters"], r["n_docs"])
           for r in cluster_size_histogram(docs, pairs, "doc_id").collect()}
    assert got == {3: (1, 3), 2: (1, 2), 1: (2, 2)}
    # histogram mass equals the corpus
    assert sum(v[1] for v in got.values()) == 7


def test_cluster_size_histogram_no_pairs(spark):
    from cassandra_util_spark.operators.cluster import cluster_size_histogram

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = cluster_size_histogram(docs, empty, "doc_id").collect()
    assert len(got) == 1 and got[0]["size"] == 1 and got[0]["n_clusters"] == 10


def test_cluster_aware_split_no_cross_split_duplicates(spark):
    """The leakage invariant: every near-dup cluster maps to EXACTLY one
    split — no pair of documents in the same cluster may straddle
    train/test.  Also exhaustive: every doc gets a split."""
    from cassandra_util_spark.entry_queries import QUERIES

    res = QUERIES["cluster_aware_split"](spark, "/root/testdata/sf0.001")
    rows = res.collect()
    assert rows and all(r.split in ("train", "val", "test") for r in rows)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values()), {
        c: s for c, s in by_cluster.items() if len(s) > 1
    }
    # the fixture actually exercises the invariant: at least one multi-doc
    # cluster exists (planted dups), so the test is not vacuous
    from collections import Counter

    sizes = Counter(r.cluster for r in rows)
    assert any(v > 1 for v in sizes.values())
