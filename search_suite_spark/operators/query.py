"""BM25 query engine over the flat index representation (SURVEY §2.5).

Scoring parity with the reference
(/root/reference/indexer-qp2/src/ranking.rs:43-94):

  idf(N, df)   = ln((N - df + 0.5) / (df + 0.5))            # may be negative
  bm25(tf, dl) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) # k1=1.2 b=0.75
  avgdl        = total_doc_len // num_docs                  # INTEGER division
  N            = all docs incl. deleted (ranking.rs:48-49)
  score(doc)   = Σ over matched query-term instances

AND semantics (query.rs:206-228): a doc survives only if its matched
term-instance count equals the number of query terms (duplicates in the
query count twice — the reference k-merges the same posting iterator once
per instance).

Plan shape at scale: the term filter is an `isin` predicate pushed into
the postings scan (term-bucketed storage prunes partitions); the per-doc
aggregation shuffles only the few matching posting rows; top-k compiles
to TakeOrderedAndProject (per-partition heaps + driver merge — Q7/Q12's
bounded-heap scatter/gather, natively). The url resolve joins only the
final k rows against the docs table.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.functions.normalise import normalise
from search_suite_spark.operators.build import InvertedIndex

K1 = 1.2
B = 0.75


def parse_query_terms(query: str) -> list[str]:
    """Query-string normalization (T7, input.rs:105-110): same tokenizer."""
    return normalise(query)


def score_expr(n_docs: int, avgdl: int):
    """BM25 column expression over (tf, doc_len, df) columns."""
    n = F.lit(float(n_docs))
    idf = F.log((n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    denom = tf + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * dl / F.lit(float(avgdl))
    )
    return idf * (tf * F.lit(K1 + 1.0)) / denom


def bm25_scored(
    index: InvertedIndex, query: str, max_results: int | None = None
) -> DataFrame:
    """Scored conjunctive query → (url, score, term_count), score desc.

    Equivalent of run_query_bm25 (query.rs:115-161) + docid→url resolve
    (Q10). Ties at the k boundary break on url for determinism (the
    reference's heap breaks ties on floored score, i.e. arbitrarily —
    SURVEY §7 'acceptable-set' note).
    """
    q_terms = parse_query_terms(query)
    spark = index.postings.sparkSession
    if not q_terms:
        return spark.createDataFrame([], "url string, score double, term_count int")

    multiplicity = Counter(q_terms)
    n_instances = len(q_terms)

    mult_df = spark.createDataFrame(
        list(multiplicity.items()), "term string, mult int"
    )

    matched = (
        index.live_postings()
        .filter(F.col("term").isin(list(multiplicity.keys())))
        .join(F.broadcast(index.terms), "term")
        .join(F.broadcast(mult_df), "term")
    )

    per_doc = (
        matched.withColumn("_s", score_expr(index.num_docs, index.avgdl))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("_s") * F.col("mult")).alias("score"),
            F.sum("mult").alias("term_count"),
        )
        .filter(F.col("term_count") == F.lit(n_instances))
    )

    if max_results is not None:
        per_doc = per_doc.orderBy(F.col("score").desc(), F.col("doc_id")).limit(
            max_results
        )

    out = (
        per_doc.join(index.docs.select("doc_id", "url"), "doc_id")
        .select("url", "score", F.col("term_count").cast("int").alias("term_count"))
        .orderBy(F.col("score").desc(), F.col("url"))
    )
    return out


def unscored(index: InvertedIndex, query: str, mode: str | None = None) -> DataFrame:
    """Unscored doc-id retrieval (query.rs:29-61) → (doc_id, url).

    mode None  = conjunctive intersection, rarest-term-first (Q8)
    mode regex = union over regex-matched dictionary terms (Q9)
    """
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, url string")

    if mode == "regex":
        matched_terms = [
            r["term"]
            for pat in (query.split() or [query])
            for r in index.terms.filter(F.col("term").rlike(pat)).collect()
        ]
        if not matched_terms:
            return empty
        ids = (
            index.live_postings()
            .filter(F.col("term").isin(matched_terms))
            .select("doc_id")
            .distinct()
        )
        return ids.join(index.docs.select("doc_id", "url"), "doc_id")

    q_terms = parse_query_terms(query)
    if not q_terms:
        return empty

    # fast abort if any query term is missing from the dictionary
    # (query.rs:34-40)
    found = {
        r["term"]: r["df"]
        for r in index.terms.filter(F.col("term").isin(q_terms)).collect()
    }
    if len(found) < len(set(q_terms)):
        return empty

    # rarest-term-first chain of semi-joins (query.rs:97-113); with exact
    # df available we order explicitly rather than rely on join reordering
    ordered = sorted(set(q_terms), key=lambda t: found[t])
    live = index.live_postings()
    ids = live.filter(F.col("term") == ordered[0]).select("doc_id")
    for t in ordered[1:]:
        ids = ids.join(
            live.filter(F.col("term") == t).select("doc_id"), "doc_id", "left_semi"
        )
    return ids.distinct().join(index.docs.select("doc_id", "url"), "doc_id")


def cached_page(pages: DataFrame, url: str) -> DataFrame:
    """Cached-page fetch (Q15, Controllers/Query.hs:85-98): the pages
    table IS the document store — a url-filtered scan replaces the
    reference's binary search over file.offs/file.warc."""
    return pages.filter(F.col("url") == url).select("url", "text")


def doc_status_table(index: InvertedIndex, urls: list[str]) -> DataFrame:
    """Batch MISSING/PRESENT/DELETED status (Q16) as a DataFrame —
    the set-oriented form of doc_status below (Indexer.hs:160-194
    aggregates statuses across segments as a count map)."""
    spark = index.docs.sparkSession
    want = spark.createDataFrame([(u,) for u in urls], "url string")
    docs = index.docs.select("url", "doc_id")
    if index.deletes is not None:
        docs = docs.join(
            index.deletes.select("doc_id").distinct().withColumn(
                "_del", F.lit(True)
            ),
            "doc_id",
            "left",
        )
    else:
        docs = docs.withColumn("_del", F.lit(None).cast("boolean"))
    return want.join(docs, "url", "left").select(
        "url",
        F.when(F.col("doc_id").isNull(), "MISSING")
        .when(F.col("_del"), "DELETED")
        .otherwise("PRESENT")
        .alias("status"),
    )


def doc_status(index: InvertedIndex, url: str) -> str:
    """MISSING / PRESENT / DELETED for a url (Q16,
    index_reader.rs:47-74 + deletions.rs:25-45)."""
    row = index.docs.filter(F.col("url") == url).select("doc_id").limit(1).collect()
    if not row:
        return "MISSING"
    if index.deletes is not None:
        hit = (
            index.deletes.filter(F.col("doc_id") == row[0]["doc_id"]).limit(1).collect()
        )
        if hit:
            return "DELETED"
    return "PRESENT"


def delete_document(index: InvertedIndex, url: str) -> InvertedIndex:
    """Mark a url deleted (Q17, deletions.rs:49-62): append its doc_id to
    the deletes frame. Queries anti-join it; stats (N, avgdl, df) keep
    counting deleted docs, exactly like the reference's bitset model."""
    spark = index.docs.sparkSession
    new = index.docs.filter(F.col("url") == url).select("doc_id")
    deletes = new if index.deletes is None else index.deletes.unionByName(new).distinct()
    return InvertedIndex(
        postings=index.postings,
        docs=index.docs,
        terms=index.terms,
        num_docs=index.num_docs,
        total_doc_len=index.total_doc_len,
        deletes=deletes.cache(),
    )
