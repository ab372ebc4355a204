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


def _mult_map_col(multiplicity: Counter):
    """Query-term multiplicity as a literal map lookup column — the
    multiplicities are driver-known, so joining a 1-row-per-term frame
    for them paid a broadcast exchange per query for nothing. Rows are
    pre-filtered to the query terms, so the lookup never misses."""
    pairs = [
        F.lit(x)
        for t, m in sorted(multiplicity.items())
        for x in (t, m)
    ]
    return F.element_at(F.create_map(*pairs), F.col("term"))


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

    # broadcast only the ≤ n query terms' dictionary rows, never the whole
    # dictionary — a web-scale vocabulary (10^8 terms) would OOM the driver.
    # The query-term MULTIPLICITY is driver-known, so it attaches as a map
    # literal instead of a second broadcast join (one fewer broadcast
    # exchange per query; measured ~15% off the per-query wall — r6).
    q_dict = index.terms.filter(F.col("term").isin(list(multiplicity.keys())))
    matched = (
        index.live_postings()
        .filter(F.col("term").isin(list(multiplicity.keys())))
        .join(F.broadcast(q_dict), "term")
        .withColumn("mult", _mult_map_col(multiplicity))
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

    # resolve urls BEFORE the k-cut so boundary ties break on url —
    # the same deterministic order the packed path and the SQL oracle
    # use (ORDER BY score DESC, url LIMIT k); a doc_id cut would pick a
    # different same-score doc at the boundary (doc_id = xxhash64(url)
    # orders differently than url). Catalyst turns the final
    # orderBy+limit into TakeOrderedAndProject (per-partition top-k +
    # driver merge, no full sort).
    out = (
        per_doc.join(index.docs.select("doc_id", "url"), "doc_id")
        .select("url", "score", F.col("term_count").cast("int").alias("term_count"))
        .orderBy(F.col("score").desc(), F.col("url"))
    )
    if max_results is not None:
        out = out.limit(max_results)
    return out


def bm25_partial(
    index: InvertedIndex,
    query: str,
    min_should_match: int = 1,
    max_results: int | None = None,
) -> DataFrame:
    """Scored partial-match query → (url, score, n_matched), score desc.

    The reference's own marked TODO (query.rs:192-193: "be able to score
    here while still streaming, so as to decide whether to include
    low-term-matched docs") — a doc qualifies when at least
    ``min_should_match`` DISTINCT query terms match; the score still sums
    every matched instance (duplicated query terms score twice, as in
    the AND path). min_should_match = #distinct terms degenerates to the
    conjunctive mode; = 1 is pure disjunctive top-k.

    Same single-scan plan as bm25_scored: isin-pruned postings scan →
    per-doc aggregation → TakeOrderedAndProject.
    """
    q_terms = parse_query_terms(query)
    spark = index.postings.sparkSession
    if not q_terms:
        return spark.createDataFrame([], "url string, score double, n_matched long")

    multiplicity = Counter(q_terms)
    q_dict = index.terms.filter(F.col("term").isin(list(multiplicity.keys())))
    matched = (
        index.live_postings()
        .filter(F.col("term").isin(list(multiplicity.keys())))
        .join(F.broadcast(q_dict), "term")
        .withColumn("mult", _mult_map_col(multiplicity))
    )
    per_doc = (
        matched.withColumn("_s", score_expr(index.num_docs, index.avgdl))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("_s") * F.col("mult")).alias("score"),
            # one posting row per (doc, term) ⇒ count(*) = distinct terms
            F.count("*").alias("n_matched"),
        )
        .filter(F.col("n_matched") >= F.lit(min_should_match))
    )
    # url-resolve before the k-cut: boundary ties break on url, rank-
    # identical to wand_partial and the oracle (see bm25_scored note)
    out = (
        per_doc.join(index.docs.select("doc_id", "url"), "doc_id")
        .select("url", "score", F.col("n_matched").cast("long").alias("n_matched"))
        .orderBy(F.col("score").desc(), F.col("url"))
    )
    if max_results is not None:
        out = out.limit(max_results)
    return out


def unscored_ids(
    index: InvertedIndex,
    query: str,
    mode: str | None = None,
    present_terms: set[str] | None = None,
) -> DataFrame:
    """Unscored retrieval → distinct (doc_id) frame — the set-algebra
    building block shared by unscored() and the structured-query fold
    (keeping urls out of the intermediate sets keeps every intersection /
    union shuffle to 8 bytes per row).

    ``present_terms``: the set of this index's dictionary terms among
    those the caller already probed (plans/structured.py batches ONE
    probe per clause tree) — when given, the per-leaf fast-abort
    dictionary count() job is skipped entirely."""
    spark = index.postings.sparkSession

    if mode == "regex":
        # the WHOLE raw query string is ONE regex (input.rs:107-108:
        # `Some(Mode::Regex) => vec!(Term(input))`) — no whitespace split.
        # Term matching stays distributed: the regex-filtered dictionary
        # is semi-joined against the postings (never collected — a broad
        # pattern over a web-scale dictionary matches millions of terms).
        # No broadcast hint: AQE broadcasts the matched side when it turns
        # out small at runtime and falls back to a shuffled semi-join when
        # the pattern matches a huge slice of the dictionary.
        matched = index.terms.filter(F.col("term").rlike(query)).select("term")
        return (
            index.live_postings()
            .join(matched, "term", "left_semi")
            .select("doc_id")
            .distinct()
        )

    q_terms = parse_query_terms(query)
    if not q_terms:
        return spark.createDataFrame([], "doc_id long")

    # fast abort if any query term is missing from the dictionary
    # (query.rs:34-40)
    distinct_terms = sorted(set(q_terms))
    if present_terms is not None:
        if not all(t in present_terms for t in distinct_terms):
            return spark.createDataFrame([], "doc_id long")
    else:
        n_found = index.terms.filter(F.col("term").isin(distinct_terms)).count()
        if n_found < len(distinct_terms):
            return spark.createDataFrame([], "doc_id long")

    # single-scan AND: one isin-pruned pass over the postings, then a
    # matched-term count per doc — the same plan shape as bm25_scored.
    # (The previous rarest-first chain of per-term semi-joins re-shuffled
    # the postings once per query term; query.rs:97-113's rarest-first
    # ordering is an artifact of its single-node k-merge, not a win here.)
    # count(*) == count_distinct(term) here because the flat postings
    # carry exactly ONE row per (term, doc_id) — the build's tf
    # aggregation guarantees it (build_index groups by (term, doc_id))
    # and bm25_partial already relies on the same invariant; the
    # count_distinct form planned a second expand/dedupe exchange for
    # nothing.
    return (
        index.live_postings()
        .filter(F.col("term").isin(distinct_terms))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_nt"))
        .filter(F.col("_nt") == len(distinct_terms))
        .select("doc_id")
    )


def unscored(index: InvertedIndex, query: str, mode: str | None = None) -> DataFrame:
    """Unscored doc-id retrieval (query.rs:29-61) → (doc_id, url).

    mode None  = conjunctive intersection (Q8)
    mode regex = union over regex-matched dictionary terms (Q9)
    """
    ids = unscored_ids(index, query, mode)
    return ids.join(index.docs.select("doc_id", "url"), "doc_id")


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
