"""Spelling suggestion over the term dictionary (SURVEY §2.5 Q14).

The reference builds a BK-tree over all dictionary terms per segment
(/root/reference/indexer-qp2/src/bk_tree.rs:106-190, built at
spelling_correction.rs:39-69) and answers per-word range queries at edit
distance <= max_dist (default 1, searchapi3/src/SpellingProcessor.hs:69),
merging per-segment results as Map term (Map dist (Set suggestions))
(QueryProcessorTypes.hs:133-138).

A BK-tree is a single-node pruning structure with no DataFrame analogue;
the Spark-first equivalent is a scan of the term dictionary with
`levenshtein() <= d`, pruned in TWO stages:

  1. STORAGE prune: segment dictionaries carry a materialized ``tlen``
     column and are written clustered by (tlen, term)
     (segments.write_terms_table / segment_io.write_terms), so the
     length-band condition compiles to a pushed ``tlen IN (...)``
     parquet predicate — row groups outside the query words' length
     band are never read. This is the partition-prunable equivalent of
     the BK-tree's triangle-inequality range search
     (bk_tree.rs:128-190): at a 10^9-term dictionary a suggestion
     query reads only the handful of length clusters within edit
     distance d, not the whole table.
  2. COMPUTE prune: the same |len(term) - len(word)| <= d predicate
     (codegen'd, cheap) guards the O(len^2) levenshtein per surviving
     (term, word) pair.

Dictionaries without tlen (flat InvertedIndex.terms, pre-tlen segments)
fall back to stage 2 alone — a full scan, still embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.functions.normalise import normalise


def spelling_suggestions(
    terms: DataFrame, query: str, max_dist: int = 1, term_col: str = "term"
) -> DataFrame:
    """(word, dist, suggestion) for every query word, dist <= max_dist.

    `terms` is any frame with a term dictionary column (an InvertedIndex
    .terms or a Segment .terms). Exact hits (dist 0) are included, like
    the reference's BK-tree range search from distance 0.
    """
    spark = terms.sparkSession
    words = sorted(set(normalise(query)))
    if not words:
        return spark.createDataFrame([], "word string, dist int, suggestion string")

    words_df = F.broadcast(
        spark.createDataFrame([(w,) for w in words], "word string")
    )
    src = terms
    if "tlen" in terms.columns:
        # storage prune: literal length band pushed into the parquet
        # scan (row-group stats on the materialized, cluster-sorted
        # tlen column do the skipping)
        band = sorted(
            {len(w) + d for w in words for d in range(-max_dist, max_dist + 1)}
        )
        src = terms.filter(F.col("tlen").isin(band))
    return (
        src.select(F.col(term_col).alias("suggestion"))
        .join(
            words_df,
            # length-difference prune first (cheap, codegen), then the
            # exact edit distance — mirrors the BK-tree's metric prune
            (
                F.abs(F.length("suggestion") - F.length("word")) <= max_dist
            )
            & (F.levenshtein("suggestion", "word") <= max_dist),
        )
        .select(
            "word",
            F.levenshtein("suggestion", "word").alias("dist"),
            "suggestion",
        )
    )


def spelling_collection(
    segs, query: str, max_dist: int = 1
) -> DataFrame:
    """Collection-level spelling (Q14 multi-segment): fan out the
    dictionary scan over every segment's terms table, then merge the
    per-segment answers as the reference's word→dist→set monoid
    (/root/reference/searchapi3/src/Query/SpellingProcessor.hs:44-80
    folds per-segment maps with the QueryProcessorTypes.hs:133-138
    Semigroup — a per-(word, dist) set union). The DataFrame form of
    that set union is union + distinct over (word, dist, suggestion)
    rows; Catalyst fuses the per-segment scans into one job.

    ``segs`` is a dict or list of Segment (sources/registry.py's
    load_collection shape). A segment whose terms table is missing falls
    back to a term-projection of its packed postings.
    """
    seg_list = list(segs.values()) if isinstance(segs, dict) else list(segs)
    if not seg_list:
        raise ValueError("empty collection")
    parts = []
    for s in seg_list:
        terms = (
            s.terms
            if s.terms is not None
            else s.postings.select("term").distinct()
        )
        parts.append(spelling_suggestions(terms, query, max_dist=max_dist))
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return acc.distinct()


def suggestion_map(rows) -> dict[str, dict[int, set[str]]]:
    """Collect suggestion rows into the reference's response shape
    Map word (Map dist (Set suggestions)) (QueryProcessorTypes.hs:124-126)."""
    out: dict[str, dict[int, set[str]]] = {}
    for r in rows:
        out.setdefault(r["word"], {}).setdefault(int(r["dist"]), set()).add(
            r["suggestion"]
        )
    return out
