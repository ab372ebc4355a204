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
        connected_components(_pairs(spark, chain), max_iter=2)
