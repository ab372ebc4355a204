"""Codec roundtrip tests (hypothesis, mirroring the reference's
byte_tests.rs property loops) + block metadata invariants + selective
block decode."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_suite_spark.operators.codec import (
    BLOCK,
    impact,
    impact_bound,
    pack_posting_list,
    unpack_blocks,
    unpack_posting_list,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_known_values():
    # 0 -> 0x00; 127 -> 0x7f; 128 -> 0x80 0x01 (little-endian 7-bit)
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**63 + 2**62),  # uint64 domain
        st.integers(min_value=1, max_value=1000),
        st.integers(min_value=1, max_value=100000),
    ),
    min_size=1,
    max_size=600,
    unique_by=lambda t: t[0],
)


@given(posting_lists)
@settings(max_examples=100, deadline=None)
def test_pack_unpack_roundtrip(rows):
    ids = np.array([r[0] for r in rows], dtype=np.uint64)
    tfs = np.array([r[1] for r in rows], dtype=np.uint64)
    dls = np.array([r[2] for r in rows], dtype=np.uint64)
    packed = pack_posting_list(ids, tfs, dls)
    gids, gtfs, gdls = unpack_posting_list(packed)
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(gids, ids[order])
    assert np.array_equal(gtfs, tfs[order])
    assert np.array_equal(gdls, dls[order])

    n = len(rows)
    n_blocks = (n + BLOCK - 1) // BLOCK
    assert len(packed["block_last"]) == n_blocks
    assert packed["block_last"][-1] == int(np.sort(ids)[-1])
    # impact bound property: block bound >= every impact in the block
    imp = impact(gtfs, gdls, 57)
    for i in range(n_blocks):
        s, e = i * BLOCK, min((i + 1) * BLOCK, n)
        bound = impact_bound(packed["block_max_tf"][i], packed["block_min_dl"][i], 57)
        assert (imp[s:e] <= bound + 1e-12).all()


@given(posting_lists, st.data())
@settings(max_examples=60, deadline=None)
def test_selective_block_decode(rows, data):
    ids = np.array([r[0] for r in rows], dtype=np.uint64)
    tfs = np.array([r[1] for r in rows], dtype=np.uint64)
    dls = np.array([r[2] for r in rows], dtype=np.uint64)
    packed = pack_posting_list(ids, tfs, dls)
    n_blocks = len(packed["block_last"])
    pick = data.draw(
        st.lists(st.integers(min_value=0, max_value=n_blocks - 1), min_size=1, max_size=5)
    )
    gids, gtfs, gdls, gpos = unpack_blocks(packed, np.array(pick))
    fids, ftfs, fdls = unpack_posting_list(packed)
    want = np.concatenate(
        [np.arange(b * BLOCK, min((b + 1) * BLOCK, len(rows))) for b in sorted(set(pick))]
    )
    assert np.array_equal(gpos, want)
    assert np.array_equal(gids, fids[want])
    assert np.array_equal(gtfs, ftfs[want])
    assert np.array_equal(gdls, fdls[want])


def test_compression_beats_raw():
    ids = np.arange(0, 100000, 3, dtype=np.uint64)
    tfs = np.ones_like(ids)
    dls = np.full_like(ids, 57)
    packed = pack_posting_list(ids, tfs, dls)
    raw_bytes = ids.size * 8
    assert len(packed["ids"]) < raw_bytes / 4


# ---------------------------------------------------------------------------
# pack_many / run_length_by_doc: the whole-chunk vectorized kernels behind
# the mapInArrow build stage must agree with the per-list golden packer.
# ---------------------------------------------------------------------------

from search_suite_spark.operators.codec import pack_many, run_length_by_doc  # noqa: E402

group_chunks = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**64 - 1),
            st.integers(min_value=1, max_value=300),
            st.integers(min_value=1, max_value=100000),
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=12,
)


def _chunk_arrays(groups):
    ids_l, tfs_l, dls_l, starts = [], [], [], []
    pos = 0
    for rows in groups:
        rows = sorted(rows, key=lambda t: t[0])
        starts.append(pos)
        ids_l.append(np.array([r[0] for r in rows], dtype=np.uint64))
        tfs_l.append(np.array([r[1] for r in rows], dtype=np.uint64))
        dls_l.append(np.array([r[2] for r in rows], dtype=np.uint64))
        pos += len(rows)
    return (
        np.concatenate(ids_l), np.concatenate(tfs_l), np.concatenate(dls_l),
        np.array(starts, dtype=np.int64), ids_l, tfs_l, dls_l,
    )


@given(group_chunks)
@settings(max_examples=60, deadline=None)
def test_pack_many_matches_per_list_packer(groups):
    ids, tfs, dls, gs, ids_l, tfs_l, dls_l = _chunk_arrays(groups)
    out = pack_many(ids, tfs, dls, gs)
    bb = np.concatenate(([0], np.cumsum(out["block_counts"])))
    for i in range(len(groups)):
        ref = pack_posting_list(ids_l[i], tfs_l[i], dls_l[i], presorted=True)
        s, e = bb[i], bb[i + 1]
        assert int(out["n"][i]) == ref["n"]
        assert out["ids_buf"][out["ids_bounds"][i]:out["ids_bounds"][i + 1]] == ref["ids"]
        assert out["tfs_buf"][out["tfs_bounds"][i]:out["tfs_bounds"][i + 1]] == ref["tfs"]
        assert out["dls_buf"][out["dls_bounds"][i]:out["dls_bounds"][i + 1]] == ref["dls"]
        assert list(out["ids_offs"][s:e]) == ref["ids_offs"]
        assert list(out["tfs_offs"][s:e]) == ref["tfs_offs"]
        assert list(out["dls_offs"][s:e]) == ref["dls_offs"]
        ref_last = [
            int(np.asarray(x, dtype=np.uint64).view(np.int64))
            for x in ref["block_last"]
        ]
        assert list(out["block_last"][s:e]) == ref_last
        assert list(out["block_max_tf"][s:e]) == ref["block_max_tf"]
        assert list(out["block_min_dl"][s:e]) == ref["block_min_dl"]
        assert list(out["block_min_tf"][s:e]) == ref["block_min_tf"]
        assert list(out["block_max_dl"][s:e]) == ref["block_max_dl"]


@given(group_chunks)
@settings(max_examples=60, deadline=None)
def test_run_length_by_doc_collapses_token_instances(groups):
    ids, tfs, dls, gs, *_ = _chunk_arrays(groups)
    # expand each (doc, tf) into tf adjacent token-instance rows
    exp_ids = np.repeat(ids, tfs.astype(np.int64))
    exp_dls = np.repeat(dls, tfs.astype(np.int64))
    row_of = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    exp_gs = row_of[gs]
    rids, rtfs, rdls, rgs, rstarts = run_length_by_doc(exp_ids, exp_dls, exp_gs)
    assert np.array_equal(rids, ids)
    assert np.array_equal(rtfs, tfs)
    assert np.array_equal(rdls, dls)
    assert np.array_equal(rgs, gs)
    # orig_starts maps each collapsed posting back to its first source row
    assert np.array_equal(rstarts, row_of[:-1])


def test_split_group_starts_block_aligned():
    from search_suite_spark.operators.codec import BLOCK, split_group_starts

    # groups of sizes [3*BLOCK+5, BLOCK, 1] with max 1 block per row
    gs = np.array([0, 3 * BLOCK + 5, 4 * BLOCK + 5], dtype=np.int64)
    n = 4 * BLOCK + 6
    out = split_group_starts(gs, n, BLOCK)
    exp = [0, BLOCK, 2 * BLOCK, 3 * BLOCK, 3 * BLOCK + 5, 4 * BLOCK + 5]
    assert list(out) == exp
    # no-op when every group fits
    assert list(split_group_starts(gs, n, 1 << 20)) == list(gs)


def test_pack_stream_chunk_boundary_carry(spark, tmp_path):
    """A group that straddles Arrow batch boundaries must be carried over
    by the stream wrapper's pend/cut logic (segments._pack_stream_arrow)
    and produce a byte-identical segment to the single-batch build."""
    from search_suite_spark.sources.corpus import pages_from_docs_list
    from search_suite_spark.sources.segments import build_segment

    docs = [
        (f"http://carry{i}", " ".join(["shared"] * 5 + [f"tok{i % 7}", "tail"]))
        for i in range(30)
    ]
    pages = pages_from_docs_list(spark, docs)

    def snapshot(seg):
        rows = seg.postings.orderBy("shard", "term").collect()
        return [
            (r["term"], r["shard"], r["n"], bytes(r["ids"]), bytes(r["tfs"]),
             bytes(r["dls"]), list(r["block_last"]))
            for r in rows
        ]

    big = build_segment(pages, str(tmp_path / "one_batch"), n_shards=2)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        tiny = build_segment(pages, str(tmp_path / "tiny_batch"), n_shards=2)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert snapshot(tiny) == snapshot(big)
