"""Collection registry: named sets of segments + compaction loop +
multi-segment scatter/gather query.

Reference counterparts: the STM registry of components per collection
(/root/reference/searchapi3/src/Registry.hs:45-50), startup import by
directory scan (Importer.hs:29-79), the ingest-then-compact loop
(Indexer.hs:58-106, Compactor.hs:57-97), and the per-segment
scatter/gather query with bounded-heap merge + url-dedupe
(Query/QueryProcessor.hs:61-152).

Spark-first: a collection is a directory of segment subdirectories;
snapshot isolation comes from immutable segment dirs + atomic directory
renames (in production: Iceberg snapshot tags per build generation —
no locks needed, unlike the reference's STM lock set). Per-segment
statistics (N, avgdl, df) stay segment-local during scoring, exactly
like the reference (ranking.rs:48-50) — a doc's score depends on which
segment it lives in until compaction folds segments together.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from search_suite_spark.plans.compaction import choose_merge_pair
from search_suite_spark.operators.merge import merge_segments
from search_suite_spark.sources.segments import Segment, build_segment, read_segment


def _is_segment_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "lineage"))


def load_collection(spark: SparkSession, col_dir: str) -> dict[str, Segment]:
    """Startup import (Importer.hs:29-79): scan segment subdirectories,
    read num_docs for each from its lineage table."""
    if not os.path.isdir(col_dir):
        return {}
    out = {}
    for name in sorted(os.listdir(col_dir)):
        seg_dir = os.path.join(col_dir, name)
        if _is_segment_dir(seg_dir):
            out[name] = read_segment(spark, seg_dir)
    return out


def _next_segment_name(col_dir: str) -> str:
    existing = set(os.listdir(col_dir)) if os.path.isdir(col_dir) else set()
    i = 0
    while f"seg_{i:06d}" in existing or f"tmp_{i:06d}" in existing:
        i += 1
    return f"seg_{i:06d}"


def index_into_collection(
    spark: SparkSession,
    pages: DataFrame,
    col_dir: str,
    n_shards: int = 16,
    compact: bool = True,
) -> dict[str, Segment]:
    """Ingest a batch of pages as a fresh segment, then compact
    (Indexer.hs:58-106: index → register → compact loop). Builds into a
    tmp_ dir and renames, so a crashed ingest never registers."""
    os.makedirs(col_dir, exist_ok=True)
    name = _next_segment_name(col_dir)
    tmp = os.path.join(col_dir, name.replace("seg_", "tmp_"))
    build_segment(pages, tmp, n_shards=n_shards, resume=False)
    os.rename(tmp, os.path.join(col_dir, name))
    if compact:
        compact_collection(spark, col_dir, n_shards=n_shards)
    return load_collection(spark, col_dir)


def compact_collection(
    spark: SparkSession, col_dir: str, n_shards: int = 16
) -> dict[str, Segment]:
    """Compact to the policy fixpoint (Compactor.hs:57-97): repeatedly
    pick a pair via the Fibonacci-hybrid strategy and sort-merge it."""
    while True:
        segs = load_collection(spark, col_dir)
        sizes = {name: seg.num_docs for name, seg in segs.items()}
        pair = choose_merge_pair(sizes)
        if pair is None:
            return segs
        a, b = pair
        name = _next_segment_name(col_dir)
        tmp = os.path.join(col_dir, name.replace("seg_", "tmp_"))
        merge_segments(spark, segs[a], segs[b], tmp, n_shards=n_shards)
        os.rename(tmp, os.path.join(col_dir, name))
        shutil.rmtree(os.path.join(col_dir, a))
        shutil.rmtree(os.path.join(col_dir, b))


def query_collection(
    segs: dict[str, Segment] | list[Segment],
    query: str,
    max_results: int | None = 10,
) -> DataFrame:
    """Scored query across all segments (Q12, QueryProcessor.hs:61-152):
    per-segment top-k with segment-local stats, then a global merge that
    dedupes urls keeping the max score and re-sorts by exact score."""
    from search_suite_spark.operators.wand import wand_scored

    seg_list = list(segs.values()) if isinstance(segs, dict) else list(segs)
    if not seg_list:
        raise ValueError("empty collection")
    parts = [wand_scored(s, query, max_results=max_results) for s in seg_list]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    w = W.partitionBy("url").orderBy(F.col("score").desc())
    out = (
        allr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.col("score").desc(), F.col("url"))
    )
    if max_results is not None:
        out = out.limit(max_results)
    return out
