"""Conjunctive block-max query processing over packed segments.

The scale path of the query engine (SURVEY §2.5 Q4-Q7, north_rule):

  1. The term filter prunes the packed-postings scan to the query terms
     (Parquet row-group min/max on the term column; Iceberg bucket
     pruning in production).
  2. Each *shard* (doc-hash partition) answers the conjunction locally —
     all terms' shard-s postings cover the same doc subset, so shards
     are embarrassingly parallel (the reference's per-segment
     scatter/gather, Query/QueryProcessor.hs:61-152).
  3. Inside a shard (vectorized numpy in applyInPandas): intersect
     rarest-term-first (query.rs:97-98); for every other term decode
     ONLY the blocks that can contain surviving candidates
     (searchsorted against block_last skip pointers — the block-max
     WAND skip); score survivors with exact BM25; keep a local top-k.
  4. Global top-k = orderBy().limit(k) over ≤ k·n_shards candidate rows
     (TakeOrderedAndProject: per-partition heaps + driver merge — the
     bounded-heap merge of Q7/Q12).

Deletions are filtered inside the shard kernel from a broadcast set
(the docDeletions bitset analogue); corpus stats (N, avgdl, df) keep
counting deleted docs, matching ranking.rs:48-50.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.functions.normalise import normalise
from search_suite_spark.operators.codec import impact, unpack_blocks, unpack_posting_list
from search_suite_spark.sources.segments import Segment

RESULT_SCHEMA = "doc_id long, score double, term_count int"


def _idf(n_docs: int, df: float) -> float:
    return float(np.log((n_docs - df + 0.5) / (df + 0.5)))


def _shard_kernel(terms_meta, n_docs, avgdl, k, deleted_ids):
    """Build the per-shard conjunctive scorer closure.

    terms_meta: {term: (global_df, multiplicity)}; deleted_ids: sorted
    uint64 numpy array (broadcast via closure — small; a deletes *table*
    anti-join replaces this at very large delete volumes).
    """
    n_instances = sum(m for _, m in terms_meta.values())
    idfs = {t: _idf(n_docs, df) for t, (df, _) in terms_meta.items()}

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        present = set(pdf["term"])
        if present != set(terms_meta):
            # some query term has no postings in this shard → empty AND
            return pd.DataFrame({"doc_id": [], "score": [], "term_count": []}).astype(
                {"doc_id": "int64", "score": "float64", "term_count": "int32"}
            )
        rows = {r["term"]: r for _, r in pdf.iterrows()}
        # rarest-first by shard-local posting count
        order = sorted(rows, key=lambda t: rows[t]["n"])

        first = rows[order[0]]
        cand_ids, cand_tfs, cand_dls = unpack_posting_list(first)
        per_term = {order[0]: (cand_ids, cand_tfs, cand_dls)}

        for t in order[1:]:
            if cand_ids.size == 0:
                break
            row = rows[t]
            block_last = np.asarray(row["block_last"], dtype=np.int64).view(np.uint64)
            # blocks that could contain each candidate (block-max skip)
            blocks = np.searchsorted(block_last, cand_ids, side="left")
            blocks = blocks[blocks < block_last.size]
            ids, tfs, dls, _ = unpack_blocks(row, blocks)
            pos = np.searchsorted(ids, cand_ids)
            pos_ok = pos < ids.size
            hit = np.zeros(cand_ids.size, dtype=bool)
            hit[pos_ok] = ids[pos[pos_ok]] == cand_ids[pos_ok]
            # keep intersection; remember this term's tf/dl for survivors
            cand_ids = cand_ids[hit]
            cand_tfs = cand_tfs[hit]
            cand_dls = cand_dls[hit]
            sel = pos[hit]
            per_term[t] = (ids[sel], tfs[sel], dls[sel])
            # shrink earlier terms' arrays
            for u in per_term:
                if u != t:
                    a, b, c = per_term[u]
                    if a.size != cand_ids.size:
                        keep = np.searchsorted(a, cand_ids)
                        per_term[u] = (a[keep], b[keep], c[keep])

        if cand_ids.size == 0:
            return pd.DataFrame({"doc_id": [], "score": [], "term_count": []}).astype(
                {"doc_id": "int64", "score": "float64", "term_count": "int32"}
            )

        if deleted_ids.size:
            dead = np.searchsorted(deleted_ids, cand_ids)
            dead_ok = dead < deleted_ids.size
            is_dead = np.zeros(cand_ids.size, dtype=bool)
            is_dead[dead_ok] = deleted_ids[dead[dead_ok]] == cand_ids[dead_ok]
            if is_dead.any():
                alive = ~is_dead
                cand_ids = cand_ids[alive]
                per_term = {
                    t: (a[alive], b[alive], c[alive]) for t, (a, b, c) in per_term.items()
                }

        if cand_ids.size == 0:
            return pd.DataFrame({"doc_id": [], "score": [], "term_count": []}).astype(
                {"doc_id": "int64", "score": "float64", "term_count": "int32"}
            )

        score = np.zeros(cand_ids.size, dtype=np.float64)
        for t, (_, tfs, dls) in per_term.items():
            mult = terms_meta[t][1]
            score += mult * idfs[t] * impact(tfs, dls, avgdl)

        if k is not None and cand_ids.size > k:
            top = np.argpartition(-score, k - 1)[:k]
            cand_ids, score = cand_ids[top], score[top]

        return pd.DataFrame(
            {
                "doc_id": cand_ids.view(np.int64),
                "score": score,
                "term_count": np.full(cand_ids.size, n_instances, dtype=np.int32),
            }
        )

    return kernel


def wand_scored(seg: Segment, query: str, max_results: int | None = None) -> DataFrame:
    """Scored conjunctive query over a packed segment → (url, score,
    term_count), rank-identical to the flat path (tests enforce it)."""
    spark = seg.postings.sparkSession
    q_terms = normalise(query)
    empty = spark.createDataFrame([], "url string, score double, term_count int")
    if not q_terms:
        return empty

    multiplicity = Counter(q_terms)
    rows = seg.postings.filter(F.col("term").isin(list(multiplicity)))

    # global df per term from the dictionary table (Q1 term lookup)
    dfs = seg.term_dfs(list(multiplicity))
    if len(dfs) < len(multiplicity):
        return empty  # fast abort: a query term is missing (query.rs:34-40)

    terms_meta = {t: (dfs[t], m) for t, m in multiplicity.items()}

    deleted = np.empty(0, dtype=np.uint64)
    if seg.deletes is not None:
        vals = [r["doc_id"] for r in seg.deletes.select("doc_id").distinct().collect()]
        deleted = np.sort(np.array(vals, dtype=np.int64).view(np.uint64))

    kernel = _shard_kernel(terms_meta, seg.num_docs, seg.avgdl, max_results, deleted)
    cands = rows.groupBy("shard").applyInPandas(lambda pdf: kernel(pdf), RESULT_SCHEMA)

    out = cands
    if max_results is not None:
        out = out.orderBy(F.col("score").desc(), F.col("doc_id")).limit(max_results)
    return (
        out.join(seg.docs.select("doc_id", "url"), "doc_id")
        .select("url", "score", "term_count")
        .orderBy(F.col("score").desc(), F.col("url"))
    )
