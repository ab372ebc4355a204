"""Packed-row merge fast path (operators/merge._merge_packed): the
shuffle ships compressed posting rows and the kernel decodes, drops
dead docs per side, merge-sorts and repacks — the result must be
byte-identical (postings content, docs, stats, queries) to the flat-row
merge it replaces, across deletes, A-wins url dups and self-merge.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from search_suite_spark.operators import merge as M
from search_suite_spark.operators.wand import wand_scored
from search_suite_spark.sources.corpus import pages_from_docs_list
from search_suite_spark.sources.segments import (
    build_segment,
    delete_url,
    read_segment,
)

DOCS_A = [
    ("http://a1", "foo bar baz sharing"),
    ("http://a2", "apple banana cherry sharing"),
    ("http://dup", "alpha beta sharing"),
    ("http://gone", "doomed words here"),
]
DOCS_B = [
    ("http://b1", "foo apple snow sharing"),
    ("http://dup", "gamma delta sharing"),  # A wins this url
    ("http://b2", "unique words here sharing"),
    ("http://bgone", "also doomed text"),
]


def _seg(spark, tmp_path, name, docs, n_shards=2):
    return build_segment(
        pages_from_docs_list(spark, docs), str(tmp_path / name),
        n_shards=n_shards,
    )


def _postings_content(seg):
    cols = ["term", "shard", "n", "ids", "tfs", "dls",
            "ids_offs", "tfs_offs", "dls_offs",
            "block_last", "block_max_tf", "block_min_dl",
            "block_min_tf", "block_max_dl"]
    rows = seg.postings.select(*cols).collect()
    out = set()
    for r in rows:
        out.add((
            r["term"], int(r["shard"]), int(r["n"]),
            bytes(r["ids"]), bytes(r["tfs"]), bytes(r["dls"]),
            tuple(r["ids_offs"]), tuple(r["tfs_offs"]), tuple(r["dls_offs"]),
            tuple(r["block_last"]), tuple(r["block_max_tf"]),
            tuple(r["block_min_dl"]), tuple(r["block_min_tf"]),
            tuple(r["block_max_dl"]),
        ))
    return out


def _docs_content(seg):
    return {
        (int(r["doc_id"]), r["url"], int(r["doc_len"]), int(r["shard"]))
        for r in seg.docs.select("doc_id", "url", "doc_len", "shard").collect()
    }


def _build_sides(spark, tmp_path):
    a = _seg(spark, tmp_path, "pa", DOCS_A)
    delete_url(spark, a, "http://gone")
    a = read_segment(spark, a.path)
    b = _seg(spark, tmp_path, "pb", DOCS_B)
    delete_url(spark, b, "http://bgone")
    b = read_segment(spark, b.path)
    return a, b


def test_packed_merge_matches_flat_merge(spark, tmp_path, monkeypatch):
    """Same inputs through both code paths → identical segments."""
    a, b = _build_sides(spark, tmp_path)

    used = {}
    real = M._merge_packed

    def spy(*args, **kw):
        used["packed"] = real(*args, **kw)
        return used["packed"]

    monkeypatch.setattr(M, "_merge_packed", spy)
    fast = M.merge_segments(spark, a, b, str(tmp_path / "m_fast"), n_shards=2)
    assert used["packed"] is True  # the fast path actually ran

    monkeypatch.setattr(M, "_merge_packed", lambda *a, **k: False)
    flat = M.merge_segments(spark, a, b, str(tmp_path / "m_flat"), n_shards=2)

    assert _postings_content(fast) == _postings_content(flat)
    assert _docs_content(fast) == _docs_content(flat)
    assert fast.num_docs == flat.num_docs == 5  # 8 - dup - 2 deletes
    assert fast.total_doc_len == flat.total_doc_len
    # term dictionary identical
    t_fast = {(r["term"], int(r["df"])) for r in fast.terms.collect()}
    t_flat = {(r["term"], int(r["df"])) for r in flat.terms.collect()}
    assert t_fast == t_flat
    # query-level identity incl. deleted/dup terms gone
    for q in ["foo", "sharing", "alpha", "gamma", "doomed", "apple sharing"]:
        got = {(r["url"], r["score"]) for r in wand_scored(fast, q).collect()}
        want = {(r["url"], r["score"]) for r in wand_scored(flat, q).collect()}
        assert got == want, q
    assert wand_scored(fast, "gamma").collect() == []  # B's dup postings
    assert wand_scored(fast, "doomed").collect() == []  # deletes GC'd


def test_packed_merge_self_merge(spark, tmp_path, monkeypatch):
    a = _seg(spark, tmp_path, "sa", DOCS_A)
    used = {}
    real = M._merge_packed

    def spy(*args, **kw):
        used["packed"] = real(*args, **kw)
        return used["packed"]

    monkeypatch.setattr(M, "_merge_packed", spy)
    m = M.merge_segments(spark, a, a, str(tmp_path / "m_self"), n_shards=2)
    assert used["packed"] is True
    assert m.num_docs == len(DOCS_A)
    assert m.total_doc_len == a.total_doc_len
    assert m.n_shards == 2
    assert _postings_content(m) == _postings_content(a)


def test_packed_merge_cap_falls_back_to_flat(spark, tmp_path, monkeypatch):
    """Oversized drop sets must route to the flat path, same results."""
    a, b = _build_sides(spark, tmp_path)
    monkeypatch.setattr(M, "MAX_BROADCAST_DROPS", 0)
    used = {}
    real = M._merge_packed

    def spy(*args, **kw):
        used["packed"] = real(*args, **kw)
        return used["packed"]

    monkeypatch.setattr(M, "_merge_packed", spy)
    m = M.merge_segments(spark, a, b, str(tmp_path / "m_cap"), n_shards=2)
    assert used["packed"] is False  # guard fired → flat path
    assert m.num_docs == 5
    assert wand_scored(m, "gamma").collect() == []
    assert {r["url"] for r in wand_scored(m, "alpha").collect()} == {
        "http://dup"
    }


def test_packed_merge_reshard_falls_back(spark, tmp_path, monkeypatch):
    """n_shards change → packed rows can't shuffle whole → flat path."""
    a = _seg(spark, tmp_path, "ra", DOCS_A, n_shards=2)
    b = _seg(spark, tmp_path, "rb", DOCS_B, n_shards=2)
    used = {}
    real = M._merge_packed

    def spy(*args, **kw):
        used["packed"] = real(*args, **kw)
        return used["packed"]

    monkeypatch.setattr(M, "_merge_packed", spy)
    m = M.merge_segments(spark, a, b, str(tmp_path / "m_rs"), n_shards=4)
    assert used["packed"] is False
    assert m.num_docs == 7  # 8 - dup
    # merged segments carry EXACT shard-count metadata (zeroed lineage
    # rows for empty shards), so later merges of this segment at the
    # same n_shards qualify for the packed fast path
    assert m.n_shards == 4
    assert {r["url"] for r in wand_scored(m, "foo").collect()} == {
        "http://a1", "http://b1",
    }


def test_packed_merge_batch_boundary_carry(spark, tmp_path, monkeypatch):
    """Force the merge kernel's group carry-over constantly: with Arrow
    batches of 2 packed rows, nearly every (shard, term) group straddles
    a batch boundary. Result must still be identical to the flat path."""
    docs_a = [(f"http://ca{i}", f"common w{i % 7} t{i}") for i in range(60)]
    docs_b = [(f"http://cb{i}", f"common w{i % 7} s{i}") for i in range(60)]
    a = _seg(spark, tmp_path, "cba", docs_a)
    b = _seg(spark, tmp_path, "cbb", docs_b)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "2")
        fast = M.merge_segments(
            spark, a, b, str(tmp_path / "m_cf"), n_shards=2
        )
    finally:
        spark.conf.set(key, old)
    monkeypatch.setattr(M, "_merge_packed", lambda *a, **k: False)
    flat = M.merge_segments(spark, a, b, str(tmp_path / "m_cg"), n_shards=2)
    assert _postings_content(fast) == _postings_content(flat)
    assert _docs_content(fast) == _docs_content(flat)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # per-doc: (url-id, text word ids, side, deleted)
        st.tuples(
            st.integers(0, 11),           # url id — collisions = dups
            st.lists(st.integers(0, 9), min_size=1, max_size=6),
            st.booleans(),                # side B?
            st.booleans(),                # deleted?
        ),
        min_size=2, max_size=14,
    ),
    st.integers(1, 3),                    # n_shards
)
def test_packed_merge_random_parity(spark, tmp_path_factory, docs, n_shards):
    """Randomized parity: arbitrary url overlap (within AND across
    sides), deletes on both sides, unicode terms, 1-3 shards — the
    packed and flat merges must produce identical segments."""
    tmp = tmp_path_factory.mktemp("mrg_rand")
    sides: dict[bool, list[tuple[str, str]]] = {False: [], True: []}
    dels: dict[bool, list[str]] = {False: [], True: []}
    for uid, words, side_b, deleted in docs:
        # a url appears at most once PER SIDE (doc_ids are unique within
        # a segment); the same url on BOTH sides is the A-wins dup case
        url = f"http://r{uid}"
        if any(u == url for u, _ in sides[side_b]):
            continue
        text = " ".join(f"wörd{w}" for w in words)
        sides[side_b].append((url, text))
        if deleted:
            dels[side_b].append(url)
    if not sides[False] or not sides[True]:
        return  # degenerate — empty-side path covered elsewhere
    live = [u for u, _ in sides[False] if u not in dels[False]]
    live += [u for u, _ in sides[True] if u not in dels[True]]
    if not live:
        return  # fully-deleted merge → empty segment, unsupported by design

    segs = {}
    for side_b in (False, True):
        s = build_segment(
            pages_from_docs_list(spark, sides[side_b]),
            str(tmp / ("b" if side_b else "a")),
            n_shards=n_shards,
        )
        for url in dels[side_b]:
            delete_url(spark, s, url)
        segs[side_b] = read_segment(spark, s.path) if dels[side_b] else s

    used = {}
    real = M._merge_packed

    def spy(*args, **kw):
        used["packed"] = real(*args, **kw)
        return used["packed"]

    try:
        M._merge_packed = spy
        fast = M.merge_segments(
            spark, segs[False], segs[True], str(tmp / "mf"),
            n_shards=n_shards,
        )
        assert used["packed"] is True
        M._merge_packed = lambda *a, **k: False
        flat = M.merge_segments(
            spark, segs[False], segs[True], str(tmp / "mg"),
            n_shards=n_shards,
        )
    finally:
        M._merge_packed = real
    assert _postings_content(fast) == _postings_content(flat)
    assert _docs_content(fast) == _docs_content(flat)
    assert fast.num_docs == flat.num_docs
    assert fast.total_doc_len == flat.total_doc_len


def test_packed_merge_giant_list_split_parity(spark, tmp_path, monkeypatch):
    """Groups above max_row_postings split identically on both paths
    (block-aligned row splitting must survive the packed merge)."""
    docs_a = [(f"http://ga{i}", "the " + f"w{i}") for i in range(300)]
    docs_b = [(f"http://gb{i}", "the " + f"v{i}") for i in range(300)]
    a = _seg(spark, tmp_path, "gla", docs_a)
    b = _seg(spark, tmp_path, "glb", docs_b)

    import search_suite_spark.operators.codec as C

    # force multi-row splits at test size: 256 postings/row (2 blocks)
    monkeypatch.setattr(C, "MAX_ROW_POSTINGS", 256)
    fast = M.merge_segments(spark, a, b, str(tmp_path / "m_ga"), n_shards=2)
    split_rows = fast.postings.filter(F.col("term") == "the").count()
    assert split_rows >= 3  # 600 postings / 2 shards / 256 → ≥2 rows/shard

    monkeypatch.setattr(M, "_merge_packed", lambda *a, **k: False)
    flat = M.merge_segments(spark, a, b, str(tmp_path / "m_gb"), n_shards=2)
    assert _postings_content(fast) == _postings_content(flat)
