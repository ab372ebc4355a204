"""Packed-path partial-match scoring (wand.wand_partial) — the packed
twin of operators/query.bm25_partial (the reference's own TODO at
query.rs:192-193): rank- and value-identical to the flat path, with
disjunctive candidate generation and θ-pruned block-max scoring.
"""

import os

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.build import build_index
from search_suite_spark.operators.query import bm25_partial
from search_suite_spark.operators.wand import wand_partial
from search_suite_spark.sources.segments import (
    build_segment,
    delete_url,
    read_segment,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _pages(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pseg"))
    return build_segment(
        _pages(spark), d, n_shards=4, shards_per_batch=4, dedupe=False
    )


@pytest.fixture(scope="module")
def flat(spark):
    return build_index(_pages(spark), dedupe=False)


CASES = [
    ("spark merge window", 2),
    ("spark merge window", 1),
    ("spark merge window", 3),   # == conjunctive
    ("the fast zzznope", 1),     # one missing term, disjunctive survives
    ("zzznope qqqmissing", 1),   # all missing → empty
    ("spark spark merge", 2),    # duplicate term: scores twice, matches once
]


@pytest.mark.parametrize("q,mm", CASES)
def test_partial_rank_identity_vs_flat(seg, flat, q, mm):
    w = {
        r["url"]: (r["score"], r["n_matched"])
        for r in wand_partial(seg, q, min_should_match=mm).collect()
    }
    f = {
        r["url"]: (r["score"], r["n_matched"])
        for r in bm25_partial(flat, q, min_should_match=mm).collect()
    }
    assert set(w) == set(f), f"url set mismatch for {q!r} mm={mm}"
    for url, (score, nm) in f.items():
        assert w[url][0] == pytest.approx(score, rel=1e-9), (q, url)
        assert w[url][1] == nm


def test_partial_topk_matches_flat(seg, flat):
    w = wand_partial(seg, "spark merge window", 2, max_results=7).collect()
    f = bm25_partial(flat, "spark merge window", 2, max_results=7).collect()
    assert len(w) == 7
    assert [r["url"] for r in w] == [r["url"] for r in f]
    for a, b in zip(w, f):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_partial_respects_deletes(spark, tmp_path, flat):
    d = str(tmp_path / "dseg")
    seg = build_segment(_pages(spark), d, n_shards=4, shards_per_batch=4,
                        dedupe=False)
    full = {r["url"] for r in wand_partial(seg, "spark merge", 1).collect()}
    victim = sorted(full)[0]
    delete_url(spark, seg, victim)
    seg2 = read_segment(spark, d)
    after = {r["url"] for r in wand_partial(seg2, "spark merge", 1).collect()}
    assert after == full - {victim}
    # and the cogrouped-deletes branch agrees with the broadcast branch
    big = {
        r["url"]
        for r in wand_partial(
            seg2, "spark merge", 1, deletes_broadcast_max=0
        ).collect()
    }
    assert big == after


# ---------------------------------------------------------------------------
# collection composition (registry.query_collection_partial)


@pytest.fixture(scope="module")
def parity_collection(spark, tmp_path_factory):
    """Two-segment collection split by doc_id parity (same shape as the
    entry oracle's _collection fixture)."""
    from search_suite_spark.sources.registry import (
        index_into_collection,
        load_collection,
    )

    col = str(tmp_path_factory.mktemp("pcol"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for parity in (0, 1):
        half = docs.filter(F.col("doc_id") % 2 == parity).select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias(
                "url"
            ),
            "text",
        )
        index_into_collection(spark, half, col, n_shards=2, compact=False)
    return load_collection(spark, col)


@pytest.mark.parametrize("q,mm", [("spark merge window", 2),
                                  ("the fast zzznope", 1)])
def test_collection_partial_matches_manual_merge(parity_collection, q, mm):
    """query_collection_partial == per-segment wand_partial top-k,
    url-merged keeping the best-scoring row, re-sorted, limited."""
    from search_suite_spark.sources.registry import query_collection_partial

    k = 10
    segs = list(parity_collection.values())
    manual: dict[str, tuple[float, int]] = {}
    for s in segs:
        for r in wand_partial(s, q, min_should_match=mm,
                              max_results=k).collect():
            cur = manual.get(r["url"])
            if cur is None or r["score"] > cur[0]:
                manual[r["url"]] = (r["score"], r["n_matched"])
    want = sorted(
        manual.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:k]

    got = query_collection_partial(
        parity_collection, q, min_should_match=mm, max_results=k
    ).collect()
    assert [r["url"] for r in got] == [u for u, _ in want]
    for r, (u, (score, nm)) in zip(got, want):
        assert r["score"] == pytest.approx(score, rel=1e-9)
        assert r["n_matched"] == nm


def test_collection_partial_dedupes_shared_url(spark, tmp_path):
    """A url present in BOTH segments surfaces once, with the
    best-scoring segment's (score, n_matched)."""
    from search_suite_spark.sources.corpus import pages_from_docs_list
    from search_suite_spark.sources.registry import (
        index_into_collection,
        load_collection,
        query_collection_partial,
    )

    col = str(tmp_path / "ovcol")
    # same url, different bodies: segment B's copy matches more terms
    a = [("http://shared", "alpha beta"), ("http://onlya", "alpha gamma")]
    b = [("http://shared", "alpha beta beta"), ("http://onlyb", "delta")]
    index_into_collection(spark, pages_from_docs_list(spark, a), col,
                          n_shards=2, compact=False)
    index_into_collection(spark, pages_from_docs_list(spark, b), col,
                          n_shards=2, compact=False)
    segs = load_collection(spark, col)
    rows = query_collection_partial(
        segs, "alpha beta delta", min_should_match=1, max_results=None
    ).collect()
    urls = [r["url"] for r in rows]
    assert urls.count("http://shared") == 1
    per_seg = []
    for s in segs.values():
        for r in wand_partial(s, "alpha beta delta", 1).collect():
            if r["url"] == "http://shared":
                per_seg.append((r["score"], r["n_matched"]))
    assert len(per_seg) == 2
    best = max(per_seg)
    got = next(r for r in rows if r["url"] == "http://shared")
    assert got["score"] == pytest.approx(best[0], rel=1e-9)
    assert got["n_matched"] == best[1]


def test_collection_partial_empty_query_and_empty_collection(
    spark, parity_collection
):
    from search_suite_spark.sources.registry import query_collection_partial

    assert query_collection_partial(
        parity_collection, "...", min_should_match=1
    ).count() == 0
    with pytest.raises(ValueError):
        query_collection_partial({}, "spark")


def test_tie_boundary_cut_is_url_deterministic(spark, tmp_path):
    """Exact score ties straddling the k boundary: every path (flat
    conjunctive/partial, packed conjunctive/partial) must pick the SAME
    docs — ties break on url at the CUT, not only in display order
    (the oracle's ORDER BY score DESC, url LIMIT k). Identical text ⇒
    identical tf/doc_len ⇒ bit-identical BM25 scores."""
    from search_suite_spark.operators.query import bm25_scored
    from search_suite_spark.operators.wand import wand_scored
    from search_suite_spark.sources.corpus import pages_from_docs_list

    docs = [
        ("http://winner", "tie tie extra"),          # higher score (tf=2)
        ("http://z-late", "tie filler filler"),      # the tied trio:
        ("http://a-early", "tie filler filler"),     #   same text, url
        ("http://m-mid", "tie filler filler"),       #   order decides
    ] + [
        # keep df("tie") < N/2 so idf stays positive (df=4, N=9): with a
        # negative idf the tf=2 doc would score BELOW the tf=1 trio
        (f"http://pad{i}", "unrelated words only")
        for i in range(5)
    ]
    pages = pages_from_docs_list(spark, docs)
    flat_idx = build_index(pages, dedupe=False)
    seg2 = build_segment(
        pages, str(tmp_path / "tieseg"), n_shards=2, shards_per_batch=2,
        dedupe=False,
    )
    expect = ["http://winner", "http://a-early"]  # k=2: winner + url-min tie
    for got in (
        bm25_scored(flat_idx, "tie", max_results=2),
        bm25_partial(flat_idx, "tie", min_should_match=1, max_results=2),
        wand_scored(seg2, "tie", max_results=2),
        wand_partial(seg2, "tie", min_should_match=1, max_results=2),
    ):
        assert [r["url"] for r in got.collect()] == expect
