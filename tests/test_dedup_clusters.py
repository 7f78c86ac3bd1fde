"""connected_components / resolve_duplicates vs a brute-force union-find.

Covers the shapes that break naive label propagation: long chains (high
diameter), stars, cycles, multiple components, singletons, duplicate and
reversed input edges, and randomized graphs (seeded)."""

import random

import pytest

from webindex.dedup import connected_components, resolve_duplicates

pytestmark = pytest.mark.usefixtures("spark")


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-of-component labels
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        df = df.filter("a < 0")
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_chain(spark):
    # worst case for O(diameter) propagation; large/small-star collapses it
    _run(spark, [(i, i + 1) for i in range(1, 40)])


def test_star_and_cycle(spark):
    _run(spark, [(100, i) for i in range(1, 8)] + [(20, 21), (21, 22), (22, 20)])


def test_two_components_and_duplicate_reversed_edges(spark):
    _run(spark, [(5, 3), (3, 5), (3, 9), (9, 5), (40, 41), (41, 40), (41, 42)])


def test_empty(spark):
    _run(spark, [])


def test_random_graphs(spark):
    rng = random.Random(42)
    nodes = list(range(1, 60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_resolve_duplicates_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 7), (7, 4), (9, 10)], "a long, b long"
    )
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in resolve_duplicates(docs, pairs).collect()}
    assert rows[2] == (2, True) and rows[7] == (2, False) and rows[4] == (2, False)
    assert rows[9] == (9, True) and rows[10] == (9, False)
    # singletons survive as their own cluster
    for d in (1, 3, 5, 6, 8):
        assert rows[d] == (d, True)
    assert len(rows) == 10
