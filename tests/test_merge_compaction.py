"""Segment merge + compaction tests, modeled on the reference's merge
system tests (/root/reference/indexer-qp2/test/system_tests.rs:79-247)
and the compaction property test (searchapi3/test/Tests.hs:110-138).
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from search_suite_spark.operators.merge import merge_segments, unpack_flat
from search_suite_spark.operators.wand import wand_scored
from search_suite_spark.operators.build import build_index
from search_suite_spark.operators.query import bm25_scored
from search_suite_spark.plans.compaction import (
    choose_merge_pair,
    compaction_schedule,
    is_fib,
)
from search_suite_spark.sources.corpus import pages_from_docs_list
from search_suite_spark.sources.registry import (
    compact_collection,
    index_into_collection,
    load_collection,
    query_collection,
)
from search_suite_spark.sources.segments import build_segment, delete_url, read_segment


DOCS_A = [
    ("http://doc1", "foo bar baz sharing"),
    ("http://doc2", "apple banana cherry sharing"),
]
DOCS_B = [
    ("http://doc3", "foo apple snow sharing"),
    ("http://doc4", "unique words here sharing"),
]


def _seg(spark, tmp_path, name, docs, n_shards=2):
    return build_segment(
        pages_from_docs_list(spark, docs), str(tmp_path / name), n_shards=n_shards
    )


# -- merge semantics (M1-M8) -------------------------------------------------


def test_merge_simple(spark, tmp_path):
    """system_tests.rs simple merge: all docs searchable after merge,
    stats recomputed over the union."""
    a = _seg(spark, tmp_path, "a", DOCS_A)
    b = _seg(spark, tmp_path, "b", DOCS_B)
    m = merge_segments(spark, a, b, str(tmp_path / "m"), n_shards=4)

    assert m.num_docs == 4
    assert m.total_doc_len == a.total_doc_len + b.total_doc_len

    got = {r["url"] for r in wand_scored(m, "foo").collect()}
    assert got == {"http://doc1", "http://doc3"}
    got = {r["url"] for r in wand_scored(m, "sharing").collect()}
    assert got == {"http://doc1", "http://doc2", "http://doc3", "http://doc4"}


def test_merge_equals_direct_build(spark, tmp_path):
    """Merged segment must be rank-identical to building one segment from
    the union of both sides' docs (the reference's merge invariant)."""
    a = _seg(spark, tmp_path, "a2", DOCS_A)
    b = _seg(spark, tmp_path, "b2", DOCS_B)
    m = merge_segments(spark, a, b, str(tmp_path / "m2"), n_shards=4)
    direct = build_index(pages_from_docs_list(spark, DOCS_A + DOCS_B), dedupe=False)

    for q in ["foo", "sharing", "apple sharing", "zzznope"]:
        got = {r["url"]: r["score"] for r in wand_scored(m, q).collect()}
        want = {r["url"]: r["score"] for r in bm25_scored(direct, q).collect()}
        assert set(got) == set(want), q
        for url, s in want.items():
            assert got[url] == pytest.approx(s, rel=1e-9), (q, url)


def test_merge_url_dedupe_side_a_wins(spark, tmp_path):
    """missing_keywords scenario (system_tests.rs:155-198): duplicate url
    across segments — side A's doc survives, B's postings for it drop."""
    a = _seg(spark, tmp_path, "a3", [("http://dup", "alpha beta")])
    b = _seg(
        spark, tmp_path, "b3",
        [("http://dup", "gamma delta"), ("http://other", "epsilon")],
    )
    m = merge_segments(spark, a, b, str(tmp_path / "m3"), n_shards=2)

    assert m.num_docs == 2
    assert {r["url"] for r in wand_scored(m, "alpha").collect()} == {"http://dup"}
    # B-side duplicate's postings must be gone (M5)
    assert wand_scored(m, "gamma").collect() == []
    assert {r["url"] for r in wand_scored(m, "epsilon").collect()} == {"http://other"}


def test_merge_self_is_idempotent_on_urls(spark, tmp_path):
    """self-merge (system_tests.rs): A ∪ A keeps one copy of every doc."""
    a = _seg(spark, tmp_path, "a4", DOCS_A)
    m = merge_segments(spark, a, a, str(tmp_path / "m4"), n_shards=2)
    assert m.num_docs == len(DOCS_A)
    assert m.total_doc_len == a.total_doc_len


def test_merge_garbage_collects_deletes(spark, tmp_path):
    """deletion + merge GC (searchapi3/test/Tests.hs deletion tests):
    deleted docs vanish during merge and stats shrink; the merged
    segment carries no deletes."""
    a = _seg(spark, tmp_path, "a5", DOCS_A)
    delete_url(spark, a, "http://doc1")
    a = read_segment(spark, a.path)
    b = _seg(spark, tmp_path, "b5", DOCS_B)
    m = merge_segments(spark, a, b, str(tmp_path / "m5"), n_shards=2)

    assert m.num_docs == 3
    assert m.deletes is None
    assert wand_scored(m, "bar").collect() == []  # only doc1 had 'bar'
    # re-adding the url after a GC merge works (delete-then-re-add)
    m2 = merge_segments(
        spark, m,
        _seg(spark, tmp_path, "c5", [("http://doc1", "reborn text")]),
        str(tmp_path / "m5b"), n_shards=2,
    )
    assert {r["url"] for r in wand_scored(m2, "reborn").collect()} == {"http://doc1"}


def test_merge_reshards(spark, tmp_path):
    """Merging 2-shard and 3-shard segments into 5 shards works because
    shard = pmod(doc_id, n) is recomputable from doc_id."""
    a = _seg(spark, tmp_path, "a6", DOCS_A, n_shards=2)
    b = _seg(spark, tmp_path, "b6", DOCS_B, n_shards=3)
    m = merge_segments(spark, a, b, str(tmp_path / "m6"), n_shards=5)
    assert m.num_docs == 4
    assert {r["url"] for r in wand_scored(m, "foo").collect()} == {
        "http://doc1", "http://doc3",
    }


def test_merge_empty_side_short_circuit(spark, tmp_path):
    """M8: merging with an all-deleted side skips the dead side's scan
    and equals the live side rebuilt (merge.rs:70-94 fast-copy path)."""
    a = _seg(spark, tmp_path, "a8", DOCS_A)
    b = _seg(spark, tmp_path, "b8", DOCS_B)
    for url, _ in DOCS_B:
        delete_url(spark, b, url)
    b = read_segment(spark, str(tmp_path / "b8"))
    m = merge_segments(spark, a, b, str(tmp_path / "m8"), n_shards=4)
    assert m.num_docs == len(DOCS_A)
    direct = build_index(pages_from_docs_list(spark, DOCS_A), dedupe=False)
    got = {r["url"]: r["score"] for r in wand_scored(m, "foo").collect()}
    want = {r["url"]: r["score"] for r in bm25_scored(direct, "foo").collect()}
    assert set(got) == set(want)
    for url, s in want.items():
        assert got[url] == pytest.approx(s, rel=1e-9)


def test_dump_segment_smoke(spark, tmp_path):
    from search_suite_spark.sources.segments import dump_segment

    a = _seg(spark, tmp_path, "a9", DOCS_A)
    report = dump_segment(a, n_terms=5)
    assert f"num_docs={a.num_docs}" in report
    assert "top 5 terms by df:" in report
    assert "sharing" in report  # appears in every DOCS_A doc


def test_unpack_flat_roundtrip(spark, tmp_path):
    a = _seg(spark, tmp_path, "a7", DOCS_A)
    flat = unpack_flat(a)
    assert flat.count() == a.docs.select(F.sum("doc_len")).collect()[0][0] - (
        # tf>1 collapses rows: postings rows = Σ distinct terms per doc
        flat.groupBy().agg(F.sum(F.col("tf") - 1)).collect()[0][0]
    )
    # doc_len consistent on every row
    bad = (
        flat.groupBy("doc_id")
        .agg(F.sum("tf").alias("s"), F.first("doc_len").alias("dl"))
        .filter(F.col("s") != F.col("dl"))
        .count()
    )
    assert bad == 0


# -- compaction policy (M9) --------------------------------------------------


def test_policy_examples():
    # all-fib: adjacent pair summing to a fib (3+5=8), largest such sum
    assert choose_merge_pair({"x": 3, "y": 5}) == ("x", "y")
    # non-fib present: 4 → next fib 5, gap 1; filler of size 1 exists
    pair = choose_merge_pair({"a": 4, "b": 1, "c": 8})
    assert pair == ("b", "a")
    # gap not fillable by one: incremental fill with best adjacent pair
    assert choose_merge_pair({"a": 6, "b": 1, "c": 1}) == ("b", "c")
    # nothing to do
    assert choose_merge_pair({"a": 1}) is None


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2000), min_size=2, max_size=12))
def test_policy_will_return_to_fib(sizes):
    """Port of willReturnToFib (searchapi3/test/Tests.hs:110-138): after
    compacting to fixpoint, adding one single-doc segment and compacting
    again still terminates, and merges never lose docs."""
    named = {f"s{i}": n for i, n in enumerate(sizes)}
    total = sum(sizes)
    plan = compaction_schedule(named)
    assert len(plan) <= len(named)  # strictly shrinking ⇒ terminates
    final = dict(named)
    for a, b, key in plan:
        final[key] = final.pop(a) + final.pop(b)
    assert sum(final.values()) == total


def test_policy_converges_all_fib_from_ones():
    """Repeatedly ingesting 1-doc segments converges to few Fibonacci
    segments (the LSM intent)."""
    sizes: dict[str, int] = {}
    for i in range(30):
        sizes[f"in{i}"] = 1
        plan = compaction_schedule(sizes)
        for a, b, key in plan:
            sizes[key] = sizes.pop(a) + sizes.pop(b)
    assert all(is_fib(v) for v in sizes.values())
    assert len(sizes) <= 5


# -- registry / collection lifecycle ----------------------------------------


def test_collection_ingest_compact_query(spark, tmp_path):
    col = str(tmp_path / "col")
    index_into_collection(
        spark, pages_from_docs_list(spark, DOCS_A), col, n_shards=2, compact=False
    )
    index_into_collection(
        spark, pages_from_docs_list(spark, DOCS_B), col, n_shards=2, compact=False
    )
    segs = load_collection(spark, col)
    assert len(segs) == 2

    # scatter/gather query across segments (Q12): url set == merged build
    r = query_collection(segs, "foo", max_results=10)
    assert {x["url"] for x in r.collect()} == {"http://doc1", "http://doc3"}

    # compaction folds them (2 and 2 → 4 is not fib-pair (2+2=4 not fib)
    # per policy 2,2: all fib; 2+2=4 not fib → no merge happens)
    segs = compact_collection(spark, col, n_shards=2)
    sizes = sorted(s.num_docs for s in segs.values())
    assert sizes == [2, 2]

    # a third 1-doc segment: 1,2,2 → (1,2)→3; 3,2 → 5 → single segment
    index_into_collection(
        spark,
        pages_from_docs_list(spark, [("http://doc9", "lonely foo")]),
        col,
        n_shards=2,
        compact=True,
    )
    segs = load_collection(spark, col)
    assert [s.num_docs for s in segs.values()] == [5]
    r = query_collection(segs, "foo", max_results=10)
    assert {x["url"] for x in r.collect()} == {
        "http://doc1", "http://doc3", "http://doc9",
    }
