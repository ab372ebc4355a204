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


# -- SymSpell-style deletion-neighborhood index -------------------------------
#
# The tlen prune above still READS every length-band row group. For a
# serving-shaped deployment (10^9-term dictionary, high suggestion QPS)
# the reference's BK-tree answers a range query by visiting a small
# neighborhood of nodes (bk_tree.rs:128-190). The Spark-native structure
# with the same access pattern is a precomputed DELETION-NEIGHBORHOOD
# index (the SymSpell scheme, public domain): one (variant, term) row
# for every string reachable from a dictionary term by deleting up to
# max_dist characters. Candidate lookup is then a `variant IN (...)`
# point probe (pushed to parquet row groups when the index is written
# variant-clustered) + broadcast join — cost scales with the QUERY's
# deletion neighborhood (~len^d variants/word), never the dictionary.
# Completeness: lev(w, t) <= d  ⟹  w and t share a variant with each
# side deleting <= d chars (each of the <= d edit ops costs at most one
# deletion per side: substitution one on both, insertion/deletion one on
# one); the deletion match overshoots lev (e.g. "ab"/"ba" share "a" at
# d=1 but lev=2), so survivors re-verify with the exact levenshtein.


def term_deletion_index(
    terms: DataFrame, max_dist: int = 1, term_col: str = "term"
) -> DataFrame:
    """(variant, term) deletion-neighborhood rows for a term dictionary,
    the term itself included (depth 0). Generation is pure column work
    (explode over a position sequence + substring splice — JVM codegen,
    no Python): ~(len+1) rows per term at max_dist=1, built once per
    segment alongside the dictionary and reusable until the next merge.

    Write it ``sortWithinPartitions("variant")`` (or bucketed by
    variant) so probe predicates skip row groups — the storage-level
    analogue of descending only matching BK-tree edges.

    The build depth is recorded as ``variant`` field metadata
    (``{"max_dist": d}``) — it survives parquet round-trips, and
    ``spelling_suggestions_indexed`` refuses probes deeper than the
    index was built for (the match would be silently incomplete:
    term-side variants beyond the build depth don't exist)."""
    src = terms.select(F.col(term_col).alias("term")).where(
        F.col("term").isNotNull()
    )
    level = src.select("term", F.col("term").alias("variant"))
    out = level
    for depth in range(max_dist):
        # delete the i-th character of every current variant; a 1-char
        # variant legitimately yields "" (lev("a","b")=1 is discovered
        # ONLY via the shared empty variant). Guard length > 0 before
        # the explode: sequence(1, 0) would count DOWN, not empty.
        level = (
            level.filter(F.length("variant") > 0)
            .select(
                "term",
                F.expr("explode(sequence(1, length(variant)))").alias("i"),
                "variant",
            )
            .select(
                "term",
                F.concat(
                    F.expr("substring(variant, 1, i - 1)"),
                    F.expr("substring(variant, i + 1, length(variant))"),
                ).alias("variant"),
            )
        )
        # dedupe intermediate frontiers so deeper levels don't explode
        # combinatorially — but NOT the last level: the final distinct
        # below already dedupes the union, and the inner exchange would
        # be pure overhead (at max_dist=1 this halves the build's
        # shuffles: one distinct instead of two).
        if depth < max_dist - 1:
            level = level.distinct()
        out = out.unionByName(level)
    return out.distinct().select(
        F.col("term"),
        F.col("variant").alias("variant", metadata={"max_dist": max_dist}),
    )


def _deletion_variants(word: str, max_dist: int) -> set[str]:
    """Driver-side twin of term_deletion_index for (tiny) query words."""
    out = {word}
    frontier = {word}
    for _ in range(max_dist):
        frontier = {
            v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))
        } - out
        out |= frontier
    return out


def spelling_suggestions_indexed(
    index: DataFrame, query: str, max_dist: int = 1
) -> DataFrame:
    """(word, dist, suggestion) via a term_deletion_index frame —
    row-identical to spelling_suggestions over the same dictionary
    (tests/test_spelling_symspell.py proves the identity), but the
    dictionary is never scanned: the probe is a pushed
    ``variant IN (...)`` lookup + broadcast join + exact-levenshtein
    verify over the surviving candidates.

    Raises ``ValueError`` if ``max_dist`` exceeds the depth the index
    was built with (recorded in the ``variant`` field metadata):
    term-side variants past the build depth don't exist, so a deeper
    probe would return silently incomplete rows instead of the
    scan-identical set this function promises."""
    built = (index.schema["variant"].metadata or {}).get("max_dist")
    if built is not None and max_dist > built:
        raise ValueError(
            f"probe max_dist={max_dist} exceeds the index build depth "
            f"{built}; rebuild term_deletion_index(max_dist={max_dist})"
        )
    spark = index.sparkSession
    words = sorted(set(normalise(query)))
    if not words:
        return spark.createDataFrame(
            [], "word string, dist int, suggestion string"
        )
    probe_rows = sorted(
        {(v, w) for w in words for v in _deletion_variants(w, max_dist)}
    )
    probe = F.broadcast(
        spark.createDataFrame(probe_rows, "variant string, word string")
    )
    variants = sorted({v for v, _ in probe_rows})
    cand = (
        index.filter(F.col("variant").isin(variants))
        .join(probe, "variant")
        .select("word", F.col("term").alias("suggestion"))
        .distinct()
    )
    return cand.filter(F.levenshtein("suggestion", "word") <= max_dist).select(
        "word",
        F.levenshtein("suggestion", "word").alias("dist"),
        "suggestion",
    )


def suggestion_map(rows) -> dict[str, dict[int, set[str]]]:
    """Collect suggestion rows into the reference's response shape
    Map word (Map dist (Set suggestions)) (QueryProcessorTypes.hs:124-126)."""
    out: dict[str, dict[int, set[str]]] = {}
    for r in rows:
        out.setdefault(r["word"], {}).setdefault(int(r["dist"]), set()).add(
            r["suggestion"]
        )
    return out
