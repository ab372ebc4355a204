"""Segment store: packed, sharded, resumable index builds on parquet.

A *segment* is the Spark-side analogue of the reference's index component
(/root/reference/indexer-qp2/src/index_writer.rs:12-75, 8 files in a
directory). Here a segment is a directory of tables:

    seg/
      docs/      (doc_id, url, doc_len, shard [, warc_ts])
      postings/  partitioned by shard: packed posting lists per
                 (term, shard) — block-aligned delta+varbyte (codec.py)
      lineage/   one row per completed shard: doc/posting/byte counts +
                 wall ms (north_rule: per-partition lineage + metrics)
      deletes/   (doc_id) — docDeletions analogue (Q17)

Sharding: shard = pmod(xxhash64(url), n_shards) — a *doc-keyed* hash
partition. Every term's postings for shard s cover the same doc subset,
so a conjunctive query can be answered shard-locally and merged (the
scatter/gather of reference Query/QueryProcessor.hs:61-152). Stop-word
skew is bounded by construction: the largest (term, shard) group is
df(term)/n_shards — this is the salted two-phase aggregation the
north_rule asks for, with the salt being a stable doc hash instead of a
random number (deterministic ⇒ resumable).

Resume: shards are built in batches; each batch write uses dynamic
partition overwrite (idempotent re-run) and appends lineage rows only
after the write succeeds. A restarted build skips shards already in
lineage — no recomputation (north_rule).

Parquet layout notes for 100 TB scale: postings are partitioned by shard
and sorted by term within files, so Parquet row-group min/max statistics
prune term lookups; on a real cluster you would additionally bucket by
term (or use Iceberg bucket(term, N) partitioning — the intended
production catalog; plain parquet is used here because the sandbox ships
no Iceberg runtime jars, and the writer below isolates that choice).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_suite_spark.operators.build import (
    dedupe_newest_wins,
    token_rows_with_doc,
)
from search_suite_spark.operators.codec import pack_posting_list

PACKED_SCHEMA = (
    "term string, shard int, n long, ids binary, tfs binary, dls binary, "
    "ids_offs array<long>, tfs_offs array<long>, dls_offs array<long>, "
    "block_last array<long>, block_max_tf array<long>, block_min_dl array<long>, "
    "block_min_tf array<long>, block_max_dl array<long>"
)

# the pack kernel's full output: posting rows (term set, doc fields null)
# interleaved with doc-table rows (term null, doc fields set) — the
# single-pass build derives BOTH tables from one tokenize+shuffle job
PACK_STREAM_SCHEMA = (
    PACKED_SCHEMA + ", doc_id long, url string, doc_len int, warc_ts timestamp"
)

LINEAGE_SCHEMA = (
    "shard int, n_docs long, total_doc_len long, n_terms long, "
    "n_postings long, packed_bytes long, ms long"
)


def _u64_to_i64(vals) -> list[int]:
    return np.asarray(vals, dtype=np.uint64).view(np.int64).tolist()


_PACK_COLS = [
    "term", "shard", "n", "ids", "tfs", "dls", "ids_offs", "tfs_offs",
    "dls_offs", "block_last", "block_max_tf", "block_min_dl",
    "block_min_tf", "block_max_dl", "doc_id", "url", "doc_len", "warc_ts",
]


def _doc_rows_out(pdf: pd.DataFrame, has_ts: bool) -> pd.DataFrame | None:
    """Extract doc-table rows from a chunk: rows whose url is set (the
    pos-0 token row of each doc, or the null-term row of a 0-token doc).
    Emitted once per doc — every input row passes through exactly one
    chunk."""
    mask = pdf["url"].notna()
    if not mask.any():
        return None
    d = pdf.loc[mask, ["doc_id", "url", "doc_len", "shard"]]
    out = pd.DataFrame(
        {
            "term": pd.array([None] * len(d), dtype=object),
            "shard": d["shard"].to_numpy(dtype=np.int32),
            "n": pd.array([None] * len(d), dtype="Int64"),
            "doc_id": d["doc_id"].to_numpy(dtype=np.int64),
            "url": d["url"].to_numpy(dtype=object),
            "doc_len": d["doc_len"].to_numpy(dtype=np.int32),
            "warc_ts": (
                pdf.loc[mask, "warc_ts"].to_numpy()
                if has_ts
                else pd.Series([pd.NaT] * len(d), dtype="datetime64[ns]")
            ),
        }
    )
    for c in ("ids", "tfs", "dls", "ids_offs", "tfs_offs", "dls_offs",
              "block_last", "block_max_tf", "block_min_dl", "block_min_tf",
              "block_max_dl"):
        out[c] = pd.array([None] * len(d), dtype=object)
    return out[_PACK_COLS]


def _pack_chunk(pdf: pd.DataFrame, has_tf: bool) -> list[pd.DataFrame]:
    """Pack a chunk of rows pre-sorted by (shard, term, uint64 doc_id).

    The chunk contains only COMPLETE (shard, term) groups (the streaming
    wrapper guarantees it). tf is run-length counted here when the input
    is raw token instances (has_tf=False) — all instances of a (doc,
    term) pair are adjacent after the JVM sort. When the chunk carries
    doc identity (single-pass build), doc-table rows are emitted too (as
    a separate frame — Arrow batches need not be homogeneous).
    """
    parts: list[pd.DataFrame] = []
    if "url" in pdf.columns:
        docs_out = _doc_rows_out(pdf, has_ts="warc_ts" in pdf.columns)
        if docs_out is not None:
            parts.append(docs_out)
        if pdf["term"].isna().any():  # 0-token docs contribute no postings
            pdf = pdf[pdf["term"].notna()]
        if not len(pdf):
            return parts

    sh = pdf["shard"].to_numpy(dtype=np.int64)
    terms = pdf["term"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64).view(np.uint64)
    dls = pdf["doc_len"].to_numpy(dtype=np.int64).astype(np.uint64)

    new_group = np.concatenate(
        ([True], (sh[1:] != sh[:-1]) | (terms[1:] != terms[:-1]))
    )
    if has_tf:
        tfs = pdf["tf"].to_numpy(dtype=np.int64).astype(np.uint64)
    else:
        new_doc = new_group.copy()
        new_doc[1:] |= ids[1:] != ids[:-1]
        starts = np.flatnonzero(new_doc)
        tfs = np.diff(np.append(starts, ids.size)).astype(np.uint64)
        ids, dls = ids[starts], dls[starts]
        sh, terms, new_group = sh[starts], terms[starts], new_group[starts]

    gstarts = np.flatnonzero(new_group)
    bounds = np.append(gstarts, ids.size)
    rows = []
    for i in range(gstarts.size):
        s, e = bounds[i], bounds[i + 1]
        p = pack_posting_list(ids[s:e], tfs[s:e], dls[s:e], presorted=True)
        rows.append(
            {
                "term": terms[s],
                "shard": int(sh[s]),
                "n": p["n"],
                "ids": p["ids"],
                "tfs": p["tfs"],
                "dls": p["dls"],
                "ids_offs": p["ids_offs"],
                "tfs_offs": p["tfs_offs"],
                "dls_offs": p["dls_offs"],
                "block_last": _u64_to_i64(p["block_last"]),
                "block_max_tf": [int(x) for x in p["block_max_tf"]],
                "block_min_dl": [int(x) for x in p["block_min_dl"]],
                "block_min_tf": [int(x) for x in p["block_min_tf"]],
                "block_max_dl": [int(x) for x in p["block_max_dl"]],
            }
        )
    pack_df = pd.DataFrame(rows)
    for c in ("doc_id", "url", "doc_len", "warc_ts"):
        pack_df[c] = pd.array([None] * len(pack_df), dtype=object)
    parts.append(pack_df[_PACK_COLS])
    return parts


def _pack_stream(has_tf: bool):
    """mapInPandas packer over a partition pre-sorted by
    (shard, term, uint64(doc_id)) — the build's ONLY Python
    stage, and it does no sorting at all.

    Design (vs an applyInPandas-per-group kernel): the heavy work — the
    shuffle and the (term, doc_id) sort — happens JVM-side in Tungsten,
    where it scales linearly with cores; Python only run-length-counts tf
    and varbyte-packs, streaming one Arrow batch at a time. A group that
    straddles batch boundaries is carried over (the carry is bounded by
    one posting list = df(term)/n_shards rows — the doc-hash shard bound
    on stop-word skew).
    """

    def go(batches):
        pend: pd.DataFrame | None = None
        for pdf in batches:
            if pend is not None and len(pend):
                pdf = pd.concat([pend, pdf], ignore_index=True)
                pend = None
            if not len(pdf):
                continue
            sh = pdf["shard"].to_numpy(dtype=np.int64)
            terms = pdf["term"].to_numpy()
            change = np.flatnonzero(
                (sh[1:] != sh[:-1]) | (terms[1:] != terms[:-1])
            )
            if change.size == 0:
                pend = pdf  # one (possibly giant) group continues
                continue
            cut = int(change[-1]) + 1
            pend = pdf.iloc[cut:]
            for out in _pack_chunk(pdf.iloc[:cut], has_tf):
                if len(out):
                    yield out
        if pend is not None and len(pend):
            for out in _pack_chunk(pend, has_tf):
                if len(out):
                    yield out

    return go


_U64_SIGN_FLIP = -(1 << 63)  # XOR flips int64 order into uint64 order


def _pack_stream_arrow(has_tf: bool):
    """mapInArrow packer — same contract as _pack_stream (rows pre-sorted
    by (shard, term, uint64 doc_id); complete groups per chunk; doc rows
    carried on url-bearing rows) but with ZERO per-row or per-group
    Python: group boundaries come from pyarrow C++ compare kernels, tf
    run-length counting and the varbyte pack are whole-chunk numpy
    (codec.run_length_by_doc / codec.pack_many), term values never
    materialize as Python strings (pc.take keeps them in Arrow), and the
    packed binary/list columns are assembled zero-copy from one buffer
    per column. The pandas kernel (_pack_stream) is kept as the golden
    reference implementation for tests.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_suite_spark.operators.codec import pack_many, run_length_by_doc

    def batch_to_output(t: pa.Table) -> list[pa.RecordBatch]:
        n = t.num_rows
        cols = set(t.column_names)
        has_doc = "url" in cols
        has_ts = "warc_ts" in cols
        ts_type = t.schema.field("warc_ts").type if has_ts else pa.timestamp("us")
        out: list[pa.RecordBatch] = []

        def arr(name):
            c = t.column(name)
            return c.chunk(0) if c.num_chunks == 1 else c.combine_chunks()

        term_a = arr("term")
        sh = np.asarray(arr("shard"), dtype=np.int64)
        ids = np.asarray(arr("doc_id"), dtype=np.int64)
        dls = np.asarray(arr("doc_len"), dtype=np.int64)

        def schema_batch(kind_arrays: dict) -> pa.RecordBatch:
            fields, arrays = [], []
            for name, typ in (
                ("term", pa.string()), ("shard", pa.int32()), ("n", pa.int64()),
                ("ids", pa.binary()), ("tfs", pa.binary()), ("dls", pa.binary()),
                ("ids_offs", pa.list_(pa.int64())),
                ("tfs_offs", pa.list_(pa.int64())),
                ("dls_offs", pa.list_(pa.int64())),
                ("block_last", pa.list_(pa.int64())),
                ("block_max_tf", pa.list_(pa.int64())),
                ("block_min_dl", pa.list_(pa.int64())),
                ("block_min_tf", pa.list_(pa.int64())),
                ("block_max_dl", pa.list_(pa.int64())),
                ("doc_id", pa.int64()), ("url", pa.string()),
                ("doc_len", pa.int32()), ("warc_ts", ts_type),
            ):
                fields.append(pa.field(name, typ))
                a = kind_arrays.get(name)
                if a is None:
                    a = pa.nulls(kind_arrays["__len__"], typ)
                arrays.append(a)
            return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

        if has_doc:
            url_a = arr("url")
            doc_mask = url_a.is_valid()
            n_docs = int(pc.sum(doc_mask).as_py() or 0)
            if n_docs:
                mask_np = np.asarray(doc_mask)
                out.append(schema_batch({
                    "__len__": n_docs,
                    "shard": pa.array(sh[mask_np].astype(np.int32)),
                    "doc_id": pa.array(ids[mask_np]),
                    "url": pc.filter(url_a, doc_mask),
                    "doc_len": pa.array(dls[mask_np].astype(np.int32)),
                    **({"warc_ts": pc.filter(arr("warc_ts"), doc_mask)}
                       if has_ts else {}),
                }))
            # 0-token docs (null term) contribute no postings
            if term_a.null_count:
                keep = term_a.is_valid()
                keep_np = np.asarray(keep)
                term_a = pc.filter(term_a, keep)
                sh, ids, dls = sh[keep_np], ids[keep_np], dls[keep_np]
                n = int(term_a.length())

        if n == 0:
            return out

        # group starts: shard or term changes (term is never null here)
        neq = pc.fill_null(
            pc.not_equal(term_a.slice(1), term_a.slice(0, n - 1)), True
        )
        change = np.asarray(neq) | (sh[1:] != sh[:-1])
        group_starts = np.concatenate(
            ([0], np.flatnonzero(change) + 1)
        ).astype(np.int64)

        gfirst = group_starts  # original index of each group's first row
        u_ids = ids.view(np.uint64)
        u_dls = dls.astype(np.uint64)
        if has_tf:
            u_tfs = np.asarray(arr("tf"), dtype=np.int64).astype(np.uint64)
        else:
            u_ids, u_tfs, u_dls, group_starts = run_length_by_doc(
                u_ids, u_dls, group_starts
            )

        p = pack_many(u_ids, u_tfs, u_dls, group_starts)
        g = int(p["n"].size)

        def binary_arr(buf: bytes, bounds: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.binary(), g,
                [None, pa.py_buffer(bounds.astype(np.int32).tobytes()),
                 pa.py_buffer(buf)],
            )

        bb = np.concatenate(([0], np.cumsum(p["block_counts"]))).astype(np.int32)

        def list_arr(vals: np.ndarray) -> pa.Array:
            return pa.ListArray.from_arrays(pa.array(bb), pa.array(vals))

        out.append(schema_batch({
            "__len__": g,
            "term": pc.take(term_a, pa.array(gfirst)),
            "shard": pa.array(sh[gfirst].astype(np.int32)),
            "n": pa.array(p["n"]),
            "ids": binary_arr(p["ids_buf"], p["ids_bounds"]),
            "tfs": binary_arr(p["tfs_buf"], p["tfs_bounds"]),
            "dls": binary_arr(p["dls_buf"], p["dls_bounds"]),
            "ids_offs": list_arr(p["ids_offs"]),
            "tfs_offs": list_arr(p["tfs_offs"]),
            "dls_offs": list_arr(p["dls_offs"]),
            "block_last": list_arr(p["block_last"]),
            "block_max_tf": list_arr(p["block_max_tf"]),
            "block_min_dl": list_arr(p["block_min_dl"]),
            "block_min_tf": list_arr(p["block_min_tf"]),
            "block_max_dl": list_arr(p["block_max_dl"]),
        }))
        return out

    def go(batches):
        pend: pa.Table | None = None
        for rb in batches:
            t = pa.Table.from_batches([rb])
            if pend is not None:
                t = pa.concat_tables([pend, t]).combine_chunks()
                pend = None
            n = t.num_rows
            if n == 0:
                continue
            term_c = t.column("term")
            term_a = term_c.chunk(0) if term_c.num_chunks == 1 else term_c.combine_chunks()
            sh = np.asarray(t.column("shard"), dtype=np.int64)
            # a group ends where shard changes, term value changes, or
            # term validity flips (null-term doc rows sort first)
            neq_vals = pc.fill_null(
                pc.not_equal(term_a.slice(1), term_a.slice(0, n - 1)), False
            )
            valid = np.asarray(term_a.is_valid())
            change = (
                np.asarray(neq_vals)
                | (valid[1:] != valid[:-1])
                | (sh[1:] != sh[:-1])
            )
            cut_points = np.flatnonzero(change)
            if cut_points.size == 0:
                pend = t  # one (possibly giant) group continues
                continue
            cut = int(cut_points[-1]) + 1
            pend = t.slice(cut)
            for out in batch_to_output(t.slice(0, cut)):
                if out.num_rows:
                    yield out
        if pend is not None and pend.num_rows:
            for out in batch_to_output(pend.combine_chunks()):
                if out.num_rows:
                    yield out

    return go


@dataclass
class Segment:
    path: str
    postings: DataFrame
    docs: DataFrame
    num_docs: int
    total_doc_len: int
    deletes: DataFrame | None
    terms: DataFrame | None = None  # (term, df) dictionary table

    @property
    def avgdl(self) -> int:
        return self.total_doc_len // self.num_docs  # ranking.rs:50 parity

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global doc_freq per term (Q1 dictionary lookup). Reads the
        small terms table when present; falls back to a 2-column
        (term, n) scan of the packed postings."""
        if self.terms is not None:
            src = self.terms.filter(F.col("term").isin(terms))
            return {r["term"]: int(r["df"]) for r in src.collect()}
        rows = (
            self.postings.filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("n").alias("df"))
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in rows}


def shard_of_doc_id(n_shards: int):
    """shard = pmod(doc_id, n_shards); doc_id IS xxhash64(url), so the
    doc-hash shard is derivable from doc_id alone — segment merges can
    re-shard postings without consulting the docs table."""
    return F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")


def pack_and_write(
    spark: SparkSession,
    flat: DataFrame,
    docs: DataFrame | None,
    seg_dir: str,
    n_tbuckets: int = 64,
    shards: list[int] | None = None,
    mode: str = "overwrite",
    write_terms: bool = False,
) -> None:
    """Pack flat postings (+ docs rows) into segment tables under seg_dir
    and append per-shard lineage.

    ``flat`` is either pre-counted posting rows (term, shard, doc_id, tf,
    doc_len) — the merge path, with ``docs`` supplied separately — or raw
    token instances (term, shard, doc_id, doc_len, url[, warc_ts]) from
    token_rows_with_doc, in which case ``docs=None``: tf is run-length
    counted inside the pack kernel and the docs table is emitted from the
    SAME stream — one tokenize, one shuffle for the whole build (the
    second full-tokenize docs pass measurably broke core scaling).
    ``shards`` restricts the lineage computation to a batch (resume
    granularity).
    """
    postings_path = os.path.join(seg_dir, "postings")
    docs_path = os.path.join(seg_dir, "docs")
    lineage_path = os.path.join(seg_dir, "lineage")
    t0 = time.monotonic()

    kernel = _pack_stream_arrow(has_tf="tf" in flat.columns)
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    single_pass = docs is None
    if single_pass and "url" not in flat.columns:
        raise ValueError("single-pass pack needs url-carrying flat rows")
    # persist the packed frame: it is the *compressed* index (orders of
    # magnitude smaller than the flat postings) and every downstream
    # table — postings, docs (single-pass), lineage metrics, terms — is a
    # cheap scan of it; nothing recomputes the expensive pack shuffle.
    # Shuffle keyed on (shard, tbucket-expression): bounds per-task skew
    # the same way a salted two-phase agg would (largest key group =
    # postings_in_shard / n_tbuckets); tbucket is a pure partitioning
    # salt, so it is never materialized as a column — the sort only needs
    # (shard, term, uint64(doc_id)) to make groups adjacent, and the
    # Python packer is then a pure streaming run-length pass.
    tbucket = F.pmod(F.xxhash64("term"), F.lit(n_tbuckets))
    packed = (
        flat.repartition(npart, F.col("shard"), tbucket)
        .sortWithinPartitions(
            "shard",
            "term",
            F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)),
        )
        .mapInArrow(kernel, PACK_STREAM_SCHEMA)
        .persist()
    )
    try:
        is_doc_row = F.col("term").isNull()
        if single_pass:
            # one job materializes the pack shuffle into the cache; the
            # table writes below are then cache scans
            packed.count()
            docs = packed.filter(is_doc_row).select(
                "doc_id", "url", "doc_len", "warc_ts", "shard"
            )
            if "warc_ts" not in flat.columns:
                docs = docs.drop("warc_ts")
        postings_out = packed.filter(~is_doc_row).select(
            *[c.split(" ")[0] for c in PACKED_SCHEMA.split(", ")]
        )

        # the two table writes are independent jobs — run them on two
        # driver threads so the Spark scheduler overlaps them (each job's
        # fixed submit/commit latency is a serial tail otherwise).
        #
        # postings: repartition by shard before the write — cheap on
        # packed data, and it yields one file per shard (query latency is
        # dominated by file listing/footers when each (task, shard) pair
        # leaves a fragment). The within-file term sort feeds Parquet
        # row-group min/max stats so query-time term filters prune at the
        # scan.
        import concurrent.futures as cf

        def _write_postings():
            (
                postings_out.repartition("shard")
                .sortWithinPartitions("term")
                .write.mode(mode)
                .partitionBy("shard")
                .parquet(postings_path)
            )

        def _write_docs():
            (
                docs.repartition("shard")
                .sortWithinPartitions("doc_id")
                .write.mode(mode)
                .partitionBy("shard")
                .parquet(docs_path)
            )

        with cf.ThreadPoolExecutor(max_workers=2) as ex:
            futs = [ex.submit(_write_postings), ex.submit(_write_docs)]
            for f in futs:
                f.result()

        ms = int((time.monotonic() - t0) * 1000)
        # lineage metrics: postings stats from the cached packed frame
        # (the write succeeded ⇒ it IS what landed); doc stats from a
        # read-back of the just-written (small) docs table — recomputing
        # the docs frame would re-run its tokenizer pass.
        # The join is LEFT from the *explicit shard list* of the batch, so
        # a shard with zero docs AND zero postings still gets a (zeroed)
        # lineage row — otherwise a resumed build would rebuild empty
        # shards forever and a fully-empty segment would crash read_segment.
        docs_read = spark.read.parquet(docs_path)
        if shards is not None:
            docs_read = docs_read.filter(F.col("shard").isin(shards))
            shard_list = spark.createDataFrame([(s,) for s in shards], "shard int")
        else:
            shard_list = packed.select("shard").unionByName(
                docs_read.select("shard")
            ).distinct()
        lineage = (
            shard_list.join(
                postings_out.groupBy("shard").agg(
                    F.count("*").alias("n_terms"),
                    F.sum("n").alias("n_postings"),
                    F.sum(
                        F.length("ids") + F.length("tfs") + F.length("dls")
                    ).alias("packed_bytes"),
                ),
                "shard",
                "left",
            )
            .join(
                docs_read.groupBy("shard").agg(
                    F.count("*").alias("n_docs"),
                    F.sum("doc_len").alias("total_doc_len"),
                ),
                "shard",
                "left",
            )
            .select(
                "shard",
                F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                F.coalesce("total_doc_len", F.lit(0)).alias("total_doc_len"),
                F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
                F.coalesce("n_postings", F.lit(0)).alias("n_postings"),
                F.coalesce("packed_bytes", F.lit(0)).alias("packed_bytes"),
                F.lit(ms).alias("ms"),
            )
        )
        lineage.write.mode("append").parquet(lineage_path)
        if write_terms:
            # caller guarantees this call covers the whole segment — the
            # dictionary comes straight from the still-persisted packed
            # frame, saving the end-of-build postings read-back
            write_terms_table(spark, seg_dir, postings=postings_out)
    finally:
        packed.unpersist()


def write_terms_table(
    spark: SparkSession, seg_dir: str, postings: DataFrame | None = None
) -> None:
    """Write the segment-global term dictionary (term, df) — the analogue
    of the reference's sorted `terms` file (index_writer.rs:31-36). One
    small parquet per segment: query-time df lookup reads this instead of
    scanning packed postings, and the spelling scan (Q14) runs over it.

    ``postings`` short-circuits the read-back when the caller still holds
    the (persisted) packed frame — single-batch builds save a scan job.
    """
    if postings is None:
        postings = spark.read.parquet(os.path.join(seg_dir, "postings"))
    terms = postings.groupBy("term").agg(F.sum("n").alias("df"))
    tmp = os.path.join(seg_dir, "_terms_tmp")
    # parallel write, term-sorted within files (row-group pruning); no
    # coalesce(1) — a single-task dictionary write is a serial tail at
    # scale (vocabularies reach 10^8 terms on web corpora)
    terms.sortWithinPartitions("term").write.mode("overwrite").parquet(tmp)
    final = os.path.join(seg_dir, "terms")
    if os.path.isdir(final):
        import shutil

        shutil.rmtree(final)
    os.rename(tmp, final)


def completed_shards(spark: SparkSession, seg_dir: str) -> set[int]:
    lineage_path = os.path.join(seg_dir, "lineage")
    try:
        rows = spark.read.parquet(lineage_path).select("shard").distinct().collect()
    except Exception:
        return set()
    return {r["shard"] for r in rows}


def build_segment(
    pages: DataFrame,
    seg_dir: str,
    n_shards: int = 16,
    shards_per_batch: int = 8,
    resume: bool = True,
    dedupe: bool = True,
    n_tbuckets: int = 64,
) -> Segment:
    """Build (or resume building) a packed segment from a pages frame.

    Batches of shards are independent, idempotent jobs: filter pages to
    the batch's shards *before* tokenizing (so total tokenizer cost is a
    single pass over the corpus), pack per (term, shard), overwrite those
    shard partitions, then append lineage. Interrupt anywhere: re-running
    skips completed shards.
    """
    spark = pages.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # under-partitioned input starves the tokenize stage (a 3-partition
    # scan runs 3 tasks no matter how many cores exist); one cheap page
    # shuffle unlocks full parallelism. A genuinely large table (100 TB)
    # always has ≥ cluster-parallelism partitions, so this never fires
    # there — it is a small-input guard, not a standing repartition.
    target = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)

    if dedupe and "warc_ts" in pages.columns:
        pages = dedupe_newest_wins(pages)

    done = completed_shards(spark, seg_dir) if resume else set()
    todo = [s for s in range(n_shards) if s not in done]

    sharded = pages.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    )

    for i in range(0, len(todo), shards_per_batch):
        batch = todo[i : i + shards_per_batch]
        bpages = sharded.filter(F.col("shard").isin(batch)).drop("shard")
        # ONE codegen'd pass straight from pages: the JVM tokenizer emits
        # token instances with the doc identity carried on each doc's
        # first row, so the pack shuffle feeds postings AND the docs
        # table — no second tokenize pass, no Python workers before the
        # pack kernel, no pre-count groupBy (tf is counted inside the
        # pack kernel after the one shuffle)
        flat = token_rows_with_doc(bpages).withColumn(
            "shard", shard_of_doc_id(n_shards)
        )
        # salted two-phase shape: the shuffle key (shard, tbucket)
        # bounds both group size (postings/shard/n_tbuckets — stop-word
        # skew) and group count (per-group pack overhead)
        one_shot = not done and len(batch) == len(todo)
        pack_and_write(
            spark, flat, None, seg_dir, n_tbuckets, shards=batch,
            write_terms=one_shot,
        )

    if todo and not (not done and len(todo) <= shards_per_batch):
        write_terms_table(spark, seg_dir)

    return read_segment(spark, seg_dir)


def read_segment(spark: SparkSession, seg_dir: str) -> Segment:
    # explicit schema: skips footer-based inference on every open (at web
    # scale a segment has thousands of posting files) and keeps an
    # all-empty segment readable
    postings = spark.read.schema(PACKED_SCHEMA).parquet(
        os.path.join(seg_dir, "postings")
    )
    docs = spark.read.parquet(os.path.join(seg_dir, "docs"))
    lineage = spark.read.parquet(os.path.join(seg_dir, "lineage"))
    stats = lineage.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("nd"),
        F.coalesce(F.sum("total_doc_len"), F.lit(0)).alias("tdl"),
    ).collect()[0]
    deletes_path = os.path.join(seg_dir, "deletes")
    deletes = None
    if os.path.isdir(deletes_path):
        try:
            deletes = spark.read.parquet(deletes_path)
        except Exception:
            deletes = None
    terms_path = os.path.join(seg_dir, "terms")
    terms = spark.read.parquet(terms_path) if os.path.isdir(terms_path) else None
    return Segment(
        path=seg_dir,
        postings=postings,
        docs=docs,
        num_docs=int(stats["nd"]),
        total_doc_len=int(stats["tdl"]),
        deletes=deletes,
        terms=terms,
    )


def dump_segment(seg: Segment, n_terms: int = 20) -> str:
    """S11 index dump (debug): human-readable segment report — the
    analogue of the reference's stdout dump
    (/root/reference/indexer-qp2/src/dump.rs:6-41). Aggregates run
    distributed; only the tiny report reaches the driver.
    """
    lineage = seg.postings.sparkSession.read.parquet(
        os.path.join(seg.path, "lineage")
    )
    lrows = lineage.orderBy("shard").collect()
    stats = seg.postings.agg(
        F.count("*").alias("lists"),
        F.sum("n").alias("postings"),
        F.sum(F.length("ids") + F.length("tfs") + F.length("dls")).alias("bytes"),
    ).collect()[0]
    top = (
        seg.postings.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(n_terms)
        .collect()
    )
    lines = [
        f"segment {seg.path}",
        f"  num_docs={seg.num_docs} total_doc_len={seg.total_doc_len} "
        f"avgdl={seg.avgdl}",
        f"  posting_lists={stats['lists']} postings={stats['postings']} "
        f"packed_bytes={stats['bytes']}",
        "  shard  docs  terms  postings  bytes  ms",
    ]
    for r in lrows:
        lines.append(
            f"  {r['shard']:>5}  {r['n_docs']:>4}  {r['n_terms']:>5}  "
            f"{r['n_postings']:>8}  {r['packed_bytes']:>5}  {r['ms']}"
        )
    lines.append(f"  top {n_terms} terms by df:")
    for r in top:
        lines.append(f"    {r['term']}\t{r['df']}")
    return "\n".join(lines)


def delete_url(spark: SparkSession, seg: Segment, url: str) -> None:
    """Append the url's doc_id to the segment's deletes table (Q17)."""
    ids = seg.docs.filter(F.col("url") == url).select("doc_id")
    ids.write.mode("append").parquet(os.path.join(seg.path, "deletes"))
