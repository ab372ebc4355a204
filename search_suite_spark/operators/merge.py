"""Segment merge as a sort-merge over posting shards (SURVEY §2.4).

The reference merges two segments with hand-written streaming 2-way
sorted merges (/root/reference/indexer-qp2/src/merge/merge.rs:24-105):
url-dedupe (common_urls.rs:108-136, side A wins), docid-collision remap
(common_docids.rs:30-138), doc-table merge filtering deleted docs
(merge.rs:412-588), and term+postings merge (merge.rs:107-297).

Spark-first re-expression:
  - doc ids are deterministic (xxhash64(url)), so the docid-collision
    remap (M3/M4) vanishes by construction — the same url maps to the
    same id on both sides, and distinct-url collisions are audited, not
    repaired.
  - url dedupe (M2/M5/M6): side A wins, expressed as a left_anti join of
    B's docs against A's urls.
  - deleted docs are garbage-collected during the merge (the reference
    writes a fresh zeroed deletions bitset, merge.rs:96-104): both
    sides' deletes filter their doc tables *before* the union, and the
    merged segment starts with no deletes. num_docs / totalDocLength
    shrink accordingly (merge.rs:289-290 recomputes totals from merged
    postings).
  - term+postings merge (M7): decode both sides' packed lists to flat
    (term, doc_id, tf, doc_len) rows, union, and repack grouped by
    (shard, term-bucket) — Spark's shuffle *is* the external sort the
    reference delegates to coreutils sort (common_urls.rs:122-129).
    Since doc_id = xxhash64(url), shard = pmod(doc_id, n_shards) can be
    recomputed at merge time, so merging segments with different shard
    counts re-shards for free.

Scale: each side streams through one mapInPandas decode (no driver
materialization); the only shuffle is the (shard, tbucket) repack —
identical to the build path, so the merge cost is ~ a build over the
union's postings without the tokenize pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_suite_spark.operators.codec import BLOCK, varbyte_decode
from search_suite_spark.sources.segments import (
    Segment,
    pack_and_write,
    read_segment,
    shard_of_doc_id,
)

# tf/doc_len as int32: halves their bytes through the merge's one big
# exchange and the two Arrow boundaries (guide §2.3, narrower types) —
# doc_len is int32 in the packed schema already and tf is a count the
# single-pass build stores as int
FLAT_SCHEMA = "term string, doc_id long, tf int, doc_len int"


def _concat_binary(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of ALL values of a pa.BinaryArray as one uint8
    buffer, plus the per-value byte bounds (len+1). No per-row Python."""
    import pyarrow as pa  # noqa: F401

    n = len(arr)
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    ).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]], offs - offs[0]


def unpack_flat(seg: Segment) -> DataFrame:
    """Decode a segment's packed postings back to flat rows
    (term, doc_id, tf, doc_len) — streaming mapInArrow batches, the
    mirror of the pack kernel (segments._pack_stream_arrow): one varbyte
    decode per COLUMN per chunk (vByte is self-delimiting, so the rows'
    buffers decode concatenated), block-restart delta reconstruction as
    a whole-chunk segmented cumsum, and the output term column assembled
    with pc.take — zero per-row or per-list Python. Compaction runs
    constantly in the LSM design, so this is hot-path code.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def decode(batches):
        for rb in batches:
            t = pa.Table.from_batches([rb]).combine_chunks()
            g = t.num_rows
            if g == 0:
                continue

            def arr(name):
                c = t.column(name)
                return c.chunk(0) if c.num_chunks == 1 else c.combine_chunks()

            ns = np.asarray(arr("n"), dtype=np.int64)
            total = int(ns.sum())
            ids_bytes, _ = _concat_binary(arr("ids"))
            tfs_bytes, _ = _concat_binary(arr("tfs"))
            dls_bytes, _ = _concat_binary(arr("dls"))

            deltas = varbyte_decode(ids_bytes)
            tfs = varbyte_decode(tfs_bytes)
            dls = varbyte_decode(dls_bytes)

            # per-posting list index and position-in-list
            starts = np.concatenate(([0], np.cumsum(ns)))[:-1]
            list_idx = np.repeat(np.arange(g, dtype=np.int64), ns)
            pos_in_list = np.arange(total, dtype=np.int64) - starts[list_idx]

            # segmented blockwise cumsum: deltas restart absolute at every
            # in-list BLOCK boundary (codec.pack_many layout)
            is_bs = (pos_in_list % BLOCK) == 0
            bs = np.flatnonzero(is_bs)
            c = np.cumsum(deltas, dtype=np.uint64)
            prior = np.zeros(bs.size, dtype=np.uint64)
            prior[1:] = c[bs[1:] - 1]
            blk_of = np.cumsum(is_bs) - 1
            ids = c - prior[blk_of]

            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(arr("term"), pa.array(list_idx)),
                    pa.array(ids.view(np.int64)),
                    pa.array(tfs.astype(np.int32)),
                    pa.array(dls.astype(np.int32)),
                ],
                names=["term", "doc_id", "tf", "doc_len"],
            )

    return seg.postings.select("term", "n", "ids", "tfs", "dls").mapInArrow(
        decode, FLAT_SCHEMA
    )


def _live_docs(seg: Segment) -> DataFrame:
    docs = seg.docs
    if seg.deletes is not None:
        docs = docs.join(
            F.broadcast(seg.deletes.select("doc_id").distinct()), "doc_id", "left_anti"
        )
    return docs


def merge_segments(
    spark: SparkSession,
    seg_a: Segment,
    seg_b: Segment,
    dest_dir: str,
    n_shards: int = 16,
    n_tbuckets: int = 64,
) -> Segment:
    """Merge two segments into dest_dir; side A wins duplicate urls
    (reference merge/common_urls.rs:57-106 keeps the first side's doc)."""
    docs_a = _live_docs(seg_a)
    docs_b = _live_docs(seg_b).join(
        docs_a.select("url"), "url", "left_anti"
    )

    keep_cols = ["doc_id", "url", "doc_len"]
    if "warc_ts" in docs_a.columns and "warc_ts" in docs_b.columns:
        keep_cols.append("warc_ts")
    docs = (
        docs_a.select(*keep_cols)
        .unionByName(docs_b.select(*keep_cols))
        .withColumn("shard", shard_of_doc_id(n_shards))
    )

    # M8 empty-side short-circuit (the reference fast-copies the non-empty
    # side, merge.rs:70-94): skip the dead side's unpack scan entirely —
    # num_docs straight from lineage metadata, no job scheduled. The live
    # side still repacks (it may be re-sharding to a new n_shards).
    sides = []
    if seg_a.num_docs > 0:
        flat_a = unpack_flat(seg_a)
        # A's postings reference exactly A's docs by construction, so the
        # live-docs semi-join is the identity unless A actually carries
        # deletes — skip the join (broadcast build + probe over the full
        # flat side) when the metadata hint says there are none.
        if seg_a.deletes is not None and seg_a.n_deletes_hint != 0:
            flat_a = flat_a.join(
                docs_a.select("doc_id"), "doc_id", "left_semi"
            )
        sides.append(flat_a)
    if seg_b.num_docs > 0:
        # B's semi-join also enforces the A-wins url dedupe, so it stays
        # even when B has no deletes
        sides.append(unpack_flat(seg_b).join(docs_b.select("doc_id"), "doc_id", "left_semi"))
    if not sides:
        raise ValueError("refusing to merge two empty segments (index.rs:54-71)")
    flat = sides[0]
    for s in sides[1:]:
        flat = flat.unionByName(s)
    flat = flat.withColumn("shard", shard_of_doc_id(n_shards))

    # write_terms=True: the merge covers the whole segment in one pass,
    # so the dictionary comes from the persisted packed frame directly
    pack_and_write(
        spark, flat, docs, dest_dir, n_shards, n_tbuckets, write_terms=True
    )
    return read_segment(spark, dest_dir)
