"""Posting-list codec: block-aligned delta + variable-byte compression
with per-block skip metadata.

The reference stores raw interleaved LE u32 pairs
(/root/reference/indexer-qp2/src/index_writer.rs:38-45); the north-star
upgrade (BASELINE.json) is docID-sorted, delta + varbyte packed lists with
block-max metadata for WAND skipping. Everything here is vectorized numpy
(no per-element Python loops) because it runs inside Arrow UDFs on the
executors.

Layout (per posting list, BLOCK=128 postings per block):
  ids buffer:  per block, the first doc_id absolute then deltas — delta
               restarts at every block so blocks decode independently
  tfs/dls:     varbyte, block-aligned (byte offsets recorded per block)
  block_last:  largest doc_id in each block (skip pointer)
  block_max_tf / block_min_dl: per-block impact bound inputs — the BM25
               doc factor is ↑ in tf and ↓ in dl, so
               impact(max_tf, min_dl) ≥ any impact in the block. Storing
               the bound's *inputs* keeps packing independent of the
               corpus-global avgdl (single-pass, resumable builds).
  ids_offs/tfs_offs/dls_offs: byte offset of each block start, enabling
               selective block decode during intersection skipping.

Varbyte: 7-bit little-endian groups; high bit set = continuation
(classic vByte, as in Lucene / Scholer et al.).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
K1 = 1.2
B = 0.75


def varbyte_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> bytes:
    """Vectorized vByte encode of a non-negative uint64 array.

    ``nbytes`` (from `_varbyte_lengths`) skips recomputing per-value byte
    counts when the caller already derived them for offset bookkeeping —
    the encode is in the build's hottest loop."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if nbytes is None:
        nbytes = _varbyte_lengths(v)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    max_len = int(nbytes.max())
    for j in range(max_len):
        sel = nbytes > j
        pos = starts[sel] + j
        chunk = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > j).astype(np.uint8) << 7
        out[pos] = chunk | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview) -> np.ndarray:
    """Vectorized vByte decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    n_vals = int(is_last.sum())
    starts = np.zeros(n_vals, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    pos_in_group = np.arange(b.size, dtype=np.int64) - starts[group]
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(
        vals,
        group,
        (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos_in_group).astype(np.uint64),
    )
    return vals


def _varbyte_lengths(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp = tmp >> np.uint64(7)
    return np.maximum(nbits // 7, 1).astype(np.int64)


def impact(tfs: np.ndarray, dls: np.ndarray, avgdl: int) -> np.ndarray:
    """Document-dependent BM25 factor (idf excluded), ranking.rs:83-88."""
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(dls, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / float(avgdl)))


def impact_bound(max_tf, min_dl, avgdl: int):
    """Upper bound on impact within a block (scalar or vectorized)."""
    return impact(np.asarray(max_tf), np.asarray(min_dl), avgdl)


def _block_slices(n: int) -> list[tuple[int, int]]:
    return [(s, min(s + BLOCK, n)) for s in range(0, n, BLOCK)]


def pack_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, presorted: bool = False
) -> dict:
    """Posting list → packed block-aligned columns (sorted by doc_id).

    doc_ids are treated as uint64 (callers map signed xxhash64 ids via
    two's-complement reinterpretation, preserving an unsigned sort order).
    ``presorted`` skips the sort when the caller already delivers ids in
    uint64 order (the build's JVM shuffle sorts with the sign-bit-flip
    trick, so Python never re-sorts).
    """
    if presorted:
        ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
        t = np.ascontiguousarray(tfs, dtype=np.uint64)
        d = np.ascontiguousarray(dls, dtype=np.uint64)
    else:
        order = np.argsort(np.asarray(doc_ids, dtype=np.uint64), kind="stable")
        ids = np.asarray(doc_ids, dtype=np.uint64)[order]
        t = np.asarray(tfs, dtype=np.uint64)[order]
        d = np.asarray(dls, dtype=np.uint64)[order]
    n = int(ids.size)

    # block-restarted deltas: first id of each block absolute
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    block_starts = np.arange(0, n, BLOCK)
    deltas[block_starts] = ids[block_starts]

    id_lens = _varbyte_lengths(deltas)
    tf_lens = _varbyte_lengths(t)
    dl_lens = _varbyte_lengths(d)

    slices = _block_slices(n)
    ids_offs = [0]
    tfs_offs = [0]
    dls_offs = [0]
    block_last, block_max_tf, block_min_dl = [], [], []
    block_min_tf, block_max_dl = [], []
    for s, e in slices:
        ids_offs.append(ids_offs[-1] + int(id_lens[s:e].sum()))
        tfs_offs.append(tfs_offs[-1] + int(tf_lens[s:e].sum()))
        dls_offs.append(dls_offs[-1] + int(dl_lens[s:e].sum()))
        block_last.append(int(ids[e - 1]))
        # BOTH extrema pairs per block: impact(max_tf, min_dl) upper-bounds
        # the block's impact, impact(min_tf, max_dl) lower-bounds it — the
        # scoring skip needs the max of idf·impact, and idf may be NEGATIVE
        # (ranking.rs:43-49 allows df > N/2), which flips which extremum
        # bounds the contribution from above.
        block_max_tf.append(int(t[s:e].max()))
        block_min_dl.append(int(d[s:e].min()))
        block_min_tf.append(int(t[s:e].min()))
        block_max_dl.append(int(d[s:e].max()))

    return {
        "n": n,
        "ids": varbyte_encode(deltas, id_lens),
        "tfs": varbyte_encode(t, tf_lens),
        "dls": varbyte_encode(d, dl_lens),
        "ids_offs": ids_offs[:-1],
        "tfs_offs": tfs_offs[:-1],
        "dls_offs": dls_offs[:-1],
        "block_last": block_last,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "block_min_tf": block_min_tf,
        "block_max_dl": block_max_dl,
    }


def pack_many(
    ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_starts: np.ndarray,
) -> dict:
    """Vectorized pack of MANY posting lists at once — the whole-chunk
    kernel behind the build's mapInArrow stage.

    ``ids``/``tfs``/``dls`` are uint64 arrays covering all groups
    back-to-back; ``group_starts`` are the start indices of each group
    (posting list); within each group ids are ascending uint64. Packing
    runs in O(chunk) numpy ops — no per-group Python loop: one varbyte
    encode per column for the entire chunk, per-group buffers recovered
    as byte-offset slices, block extrema via ``np.maximum.reduceat``.

    Returns flat columns ready for Arrow assembly:
      n:            int64[G]      postings per group
      ids_buf/tfs_buf/dls_buf:    one contiguous bytes per column
      ids_bounds/tfs_bounds/dls_bounds: int64[G+1] byte bounds per group
      block_counts: int64[G]      blocks per group
      block_last, block_max_tf, block_min_dl, block_min_tf, block_max_dl:
                    int64[total_blocks] flat per-block metadata
      ids_offs, tfs_offs, dls_offs: int64[total_blocks] byte offsets of
                    each block start *relative to its group's buffer*
    """
    n_total = int(ids.size)
    g_starts = np.asarray(group_starts, dtype=np.int64)
    g_bounds = np.append(g_starts, n_total)
    sizes = np.diff(g_bounds)

    # position of each element within its group
    gidx = np.zeros(n_total, dtype=np.int64)
    gidx[g_starts[1:]] = 1
    gidx = np.cumsum(gidx)  # group index per element
    pos_in_group = np.arange(n_total, dtype=np.int64) - g_starts[gidx]

    # block starts: every BLOCK-th element within a group
    is_block_start = (pos_in_group % BLOCK) == 0
    block_start_idx = np.flatnonzero(is_block_start)
    block_group = gidx[block_start_idx]
    block_counts = np.bincount(block_group, minlength=sizes.size).astype(np.int64)
    # block end (exclusive): next block start within group, else group end
    block_end_idx = np.empty_like(block_start_idx)
    block_end_idx[:-1] = block_start_idx[1:]
    if block_start_idx.size:
        block_end_idx[-1] = n_total
    same_group = np.empty(block_start_idx.size, dtype=bool)
    if block_start_idx.size:
        same_group[:-1] = block_group[:-1] == block_group[1:]
        same_group[-1] = False
        block_end_idx = np.where(same_group, block_end_idx, g_bounds[block_group + 1])

    # block-restarted deltas (first id of each block absolute)
    deltas = np.empty_like(ids)
    if n_total:
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
        deltas[block_start_idx] = ids[block_start_idx]

    id_lens = _varbyte_lengths(deltas)
    tf_lens = _varbyte_lengths(tfs)
    dl_lens = _varbyte_lengths(dls)

    ids_csum = np.concatenate(([0], np.cumsum(id_lens)))
    tfs_csum = np.concatenate(([0], np.cumsum(tf_lens)))
    dls_csum = np.concatenate(([0], np.cumsum(dl_lens)))

    out = {
        "n": sizes,
        "ids_buf": varbyte_encode(deltas, id_lens),
        "tfs_buf": varbyte_encode(tfs, tf_lens),
        "dls_buf": varbyte_encode(dls, dl_lens),
        "ids_bounds": ids_csum[g_bounds],
        "tfs_bounds": tfs_csum[g_bounds],
        "dls_bounds": dls_csum[g_bounds],
        "block_counts": block_counts,
        # per-block byte offsets relative to the group's buffer start
        "ids_offs": ids_csum[block_start_idx] - ids_csum[g_bounds[:-1]][block_group],
        "tfs_offs": tfs_csum[block_start_idx] - tfs_csum[g_bounds[:-1]][block_group],
        "dls_offs": dls_csum[block_start_idx] - dls_csum[g_bounds[:-1]][block_group],
    }
    if block_start_idx.size:
        last = ids[block_end_idx - 1].view(np.int64)
        out["block_last"] = last
        out["block_max_tf"] = np.maximum.reduceat(tfs, block_start_idx).astype(np.int64)
        out["block_min_dl"] = np.minimum.reduceat(dls, block_start_idx).astype(np.int64)
        out["block_min_tf"] = np.minimum.reduceat(tfs, block_start_idx).astype(np.int64)
        out["block_max_dl"] = np.maximum.reduceat(dls, block_start_idx).astype(np.int64)
    else:
        z = np.empty(0, dtype=np.int64)
        out.update(block_last=z, block_max_tf=z, block_min_dl=z,
                   block_min_tf=z, block_max_dl=z)
    return out


def run_length_by_doc(
    ids: np.ndarray, dls: np.ndarray, group_starts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Collapse raw token instances (one row per occurrence) into
    (doc_id, tf, doc_len) postings, vectorized over a whole chunk.

    Rows are sorted so all instances of a (group, doc) pair are adjacent.
    Returns (ids', tfs', dls', group_starts', orig_starts) on the
    collapsed arrays — ``orig_starts[i]`` is the pre-collapse row index
    of collapsed posting i (callers map any collapsed position back to
    the source row, e.g. to look up its term value).
    """
    n = int(ids.size)
    if n == 0:
        z = np.empty(0, dtype=np.uint64)
        zi = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy(), zi, zi.copy()
    new_doc = np.zeros(n, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = ids[1:] != ids[:-1]
    new_doc[group_starts] = True
    starts = np.flatnonzero(new_doc)
    tfs = np.diff(np.append(starts, n)).astype(np.uint64)
    # map old group starts to positions in the collapsed arrays
    new_group_starts = np.searchsorted(starts, group_starts)
    return ids[starts], tfs, dls[starts], new_group_starts, starts


# default cap on postings per PACKED ROW (codec block-range splitting):
# a stop-word's (term, shard) list at web scale would otherwise be one
# multi-GB row that ships Parquet→Arrow→Python in full even when a query
# decodes 3 blocks of it — and whose varbyte buffer could overflow
# Arrow's int32 binary offsets. 2^17 postings ≈ 1024 blocks ≈ ≤1 MiB of
# ids varbyte per row bounds the transfer per row while keeping per-row
# metadata overhead negligible.
MAX_ROW_POSTINGS = 1 << 17


def split_group_starts(
    group_starts: np.ndarray, n_total: int, max_postings: int
) -> np.ndarray:
    """Subdivide groups longer than ``max_postings`` at block-aligned
    positions (``max_postings`` must be a multiple of BLOCK): returns the
    refined group_starts. Because delta encoding restarts at every BLOCK
    boundary, each sub-group packs into a fully self-contained row."""
    assert max_postings % BLOCK == 0
    gs = np.asarray(group_starts, dtype=np.int64)
    if gs.size == 0:
        return gs
    bounds = np.append(gs, n_total)
    sizes = np.diff(bounds)
    k = np.maximum(1, -(-sizes // max_postings))  # ceil division
    if int(k.max(initial=1)) == 1:
        return gs
    parent = np.repeat(np.arange(sizes.size, dtype=np.int64), k)
    csum = np.concatenate(([0], np.cumsum(k)))[:-1]
    within = (np.arange(int(k.sum()), dtype=np.int64) - csum[parent]) * max_postings
    return bounds[parent] + within


def unpack_ids(row) -> np.ndarray:
    """ids-only full decode of a packed row → uint64 doc_ids.

    The conjunctive intersection never needs tf/dl until the scoring
    phase, so skipping their decode here roughly halves the bytes touched
    per driving (rarest) term."""
    return _blockwise_cumsum(varbyte_decode(bytes(row["ids"])))


def unpack_posting_list(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode of a packed row → (doc_ids, tfs, dls), uint64."""
    deltas = varbyte_decode(bytes(row["ids"]))
    ids = _blockwise_cumsum(deltas)
    tfs = varbyte_decode(bytes(row["tfs"]))
    dls = varbyte_decode(bytes(row["dls"]))
    return ids, tfs, dls


def _blockwise_cumsum(deltas: np.ndarray) -> np.ndarray:
    """Cumsum that restarts at every BLOCK boundary (vectorized)."""
    n = deltas.size
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = np.arange(0, n, BLOCK)
    # deltas at block starts are absolute ids; subtract the cumsum carried
    # in from previous blocks
    prior = np.zeros(starts.size, dtype=np.uint64)
    prior[1:] = c[starts[1:] - 1]
    block_idx = np.arange(n) // BLOCK
    return c - prior[block_idx]


def unpack_blocks(
    row, block_indices: np.ndarray, cols: tuple = ("ids", "tfs", "dls")
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Selective decode: only the given block indices, only the given
    columns (omitted columns come back as empty arrays).

    Returns (doc_ids, tfs, dls, posting_positions) for postings in those
    blocks; posting_positions are absolute posting indices (for callers
    that need them). This is the skip-read used by the conjunctive
    block-max intersection — at a 10^12-doc scale, decoding only the
    blocks (and columns) that can matter is the difference between
    reading MBs and GBs per query term: the intersection needs ids only;
    the scoring phase needs tf/dl only for candidates above the top-k
    score threshold.
    """
    n = int(row["n"])
    want_ids, want_tfs, want_dls = "ids" in cols, "tfs" in cols, "dls" in cols
    ids_buf = bytes(row["ids"]) if want_ids else b""
    tfs_buf = bytes(row["tfs"]) if want_tfs else b""
    dls_buf = bytes(row["dls"]) if want_dls else b""
    ids_offs = list(row["ids_offs"]) + [len(ids_buf)]
    tfs_offs = list(row["tfs_offs"]) + [len(tfs_buf)]
    dls_offs = list(row["dls_offs"]) + [len(dls_buf)]

    out_ids, out_tfs, out_dls, out_pos = [], [], [], []
    for bi in np.unique(np.asarray(block_indices, dtype=np.int64)):
        bi = int(bi)
        s = bi * BLOCK
        e = min(s + BLOCK, n)
        if want_ids:
            deltas = varbyte_decode(ids_buf[ids_offs[bi] : ids_offs[bi + 1]])
            out_ids.append(np.cumsum(deltas, dtype=np.uint64))
        if want_tfs:
            out_tfs.append(varbyte_decode(tfs_buf[tfs_offs[bi] : tfs_offs[bi + 1]]))
        if want_dls:
            out_dls.append(varbyte_decode(dls_buf[dls_offs[bi] : dls_offs[bi + 1]]))
        out_pos.append(np.arange(s, e, dtype=np.int64))
    z = np.empty(0, dtype=np.uint64)
    if not out_pos:
        return z, z.copy(), z.copy(), np.empty(0, dtype=np.int64)
    return (
        np.concatenate(out_ids) if out_ids else z,
        np.concatenate(out_tfs) if out_tfs else z.copy(),
        np.concatenate(out_dls) if out_dls else z.copy(),
        np.concatenate(out_pos),
    )
