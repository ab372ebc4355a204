"""Near-dup clustering: connected components over pair frames +
canonical-doc selection (operators/dedup.py). The reference stops at
pairwise newest-wins (indexer-qp2/src/merge/common_urls.rs); components
are the extra step a training-data dedup pipeline needs."""

import pytest

from search_suite_spark.operators.dedup import (
    connected_components,
    dedup_keep_canonical,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_components_two_clusters_and_singleton(spark):
    pairs = _pairs(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    cc = {r["url"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("x",), ("y",)], "url string"
    )
    out = {
        r["url"]: (r["cluster"], r["keep"])
        for r in dedup_keep_canonical(docs, pairs).collect()
    }
    # d has no pair: its own singleton cluster, kept
    assert out["d"] == ("d", 1)
    assert out["a"] == ("a", 1) and out["b"] == ("a", 0) and out["c"] == ("a", 0)
    assert out["x"] == ("x", 1) and out["y"] == ("x", 0)
    # exactly one keeper per cluster
    keepers = [u for u, (_, k) in out.items() if k == 1]
    assert sorted(keepers) == ["a", "d", "x"]


def test_components_chain_converges_at_diameter(spark):
    # a-b-c-d-e-f: min label 'a' must travel 5 hops
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    cc = connected_components(_pairs(spark, chain)).collect()
    assert {r["cluster"] for r in cc} == {"a"} and len(cc) == 6


def test_components_raises_when_not_converged(spark):
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iter=2, method="label")


def _expected(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), set()).add(x)
    out = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_components_long_chain_auto_falls_back_to_star(spark):
    # 40-node path: diameter 39 ≫ max_iter=5 — label propagation cannot
    # converge; auto must hand off to star contraction and still return
    # the exact component min for every node
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(39)]
    cc = {
        r["url"]: r["cluster"]
        for r in connected_components(
            _pairs(spark, chain), max_iter=5
        ).collect()
    }
    assert len(cc) == 40
    assert set(cc.values()) == {"n000"}


def test_components_star_method_matches_union_find(spark):
    # deterministic pseudo-random graph: mixed chains, cliques,
    # singleton-free pair soup — star contraction must agree with a
    # driver-side union-find on every node
    pairs = []
    x = 1234567
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = f"v{x % 60:02d}"
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = f"v{x % 60:02d}"
        if a != b:
            pairs.append((a, b))
    want = _expected(pairs)
    got = {
        r["url"]: r["cluster"]
        for r in connected_components(
            _pairs(spark, pairs), method="star"
        ).collect()
    }
    assert got == want


def test_components_star_on_near_clique(spark):
    # LSH-shaped input: dense near-clique plus a pendant
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    got = {
        r["url"]: r["cluster"]
        for r in connected_components(
            _pairs(spark, pairs), method="star"
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}
