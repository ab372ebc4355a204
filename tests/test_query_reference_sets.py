"""End-to-end reference query sets (SURVEY §5):

  - searchapi3/test/Tests.hs:229-284,400-409 — doc-1/doc-2/doc-3 corpus,
    queries missing/first/second/words/doc, deletion + re-add semantics
  - indexer-qp2/test/system_tests.rs:79-247 — singleton/merge single-term
    url sets
  - indexer-qp2/eg/input1+input2 — multi-term AND over the foo/bar corpus
"""

import math

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.build import build_index, doc_id_collisions
from search_suite_spark.operators.query import (
    bm25_scored,
    delete_document,
    doc_status,
    unscored,
)
from search_suite_spark.sources.corpus import pages_from_docs_list, pages_tiny

DOC123 = [
    ("doc-1", "words in first doc"),
    ("doc-2", "words in second doc"),
    ("doc-3", "this is doc 3"),
]


@pytest.fixture(scope="module")
def idx123(spark):
    return build_index(pages_from_docs_list(spark, DOC123))


def urls(df):
    return {r["url"] for r in df.collect()}


def test_simple_queries(idx123):
    # Tests.hs:233-244
    assert urls(bm25_scored(idx123, "missing")) == set()
    assert urls(bm25_scored(idx123, "first")) == {"doc-1"}
    assert urls(bm25_scored(idx123, "second")) == {"doc-2"}
    assert urls(bm25_scored(idx123, "words")) == {"doc-1", "doc-2"}
    # Tests.hs:263-264 — "doc" matches all three (url terms included!)
    assert urls(bm25_scored(idx123, "doc")) == {"doc-1", "doc-2", "doc-3"}


def test_doc_len_includes_url_tokens(idx123):
    # doc.rs:65-93 — doc_len counts url + body tokens.
    # "doc-1" tokenizes to [doc, 1]; body "words in first doc" → 4 tokens.
    dl = {r["url"]: r["doc_len"] for r in idx123.docs.collect()}
    assert dl["doc-1"] == 6
    assert dl["doc-3"] == 6  # [doc, 3] + [this, is, doc, 3]


def test_deletion_lifecycle(spark, idx123):
    # Tests.hs:250-289 + 377-409
    assert doc_status(idx123, "doc-2") == "PRESENT"
    assert doc_status(idx123, "doc-nope") == "MISSING"

    deleted = delete_document(idx123, "doc-2")
    assert doc_status(deleted, "doc-2") == "DELETED"
    assert urls(bm25_scored(deleted, "second")) == set()
    assert urls(bm25_scored(deleted, "doc")) == {"doc-1", "doc-3"}
    # stats still count the deleted doc (ranking.rs:48-50)
    assert deleted.num_docs == 3


def test_bm25_score_parity_numpy_oracle(idx123):
    """Scores must equal a direct transcription of ranking.rs:83-94."""
    res = {r["url"]: r["score"] for r in bm25_scored(idx123, "words").collect()}

    n, avgdl = 3, 18 // 3  # doc lens: 6 + 6 + 6 = 18 (integer avgdl = 6)
    df_words = 2

    def oracle(tf, dl):
        idf = math.log((n - df_words + 0.5) / (df_words + 0.5))
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert res["doc-1"] == pytest.approx(oracle(1, 6), rel=1e-12)
    assert res["doc-2"] == pytest.approx(oracle(1, 6), rel=1e-12)


def test_multi_term_and(spark):
    # eg/input1 + eg/input2 corpus (distinct urls)
    pages = pages_from_docs_list(
        spark,
        [
            ("http://doc1", "foo Bar foo bar"),
            ("http://doc3", "baz foo gaz"),
            ("http://doc4", "foo Bar food bar"),
        ],
    )
    idx = build_index(pages)
    assert urls(bm25_scored(idx, "foo bar")) == {"http://doc1", "http://doc4"}
    assert urls(bm25_scored(idx, "baz gaz")) == {"http://doc3"}
    assert urls(bm25_scored(idx, "foo gaz")) == {"http://doc3"}
    assert urls(bm25_scored(idx, "foo missing")) == set()
    assert urls(unscored(idx, "foo bar")) == {"http://doc1", "http://doc4"}
    assert urls(unscored(idx, "foo missing")) == set()


def test_unscored_regex_union(spark):
    pages = pages_from_docs_list(
        spark,
        [
            ("http://a", "apple banana"),
            ("http://b", "apricot cherry"),
            ("http://c", "durian"),
        ],
    )
    idx = build_index(pages)
    assert urls(unscored(idx, "^ap", mode="regex")) == {"http://a", "http://b"}
    assert urls(unscored(idx, "zzz", mode="regex")) == set()


def test_url_dedupe_newest_wins(spark):
    # pages_tiny repeats http://doc3; the later warc_ts wins (M2 analogue)
    idx = build_index(pages_tiny(spark))
    assert idx.num_docs == 3
    assert urls(bm25_scored(idx, "bazar")) == {"http://doc3"}
    assert urls(bm25_scored(idx, "baz")) == set()  # old doc3 body replaced


def test_top_k_limit(spark):
    pages = pages_from_docs_list(
        spark,
        [(f"u-{i}", "common " + ("extra " * i)) for i in range(10)],
    )
    idx = build_index(pages)
    top3 = bm25_scored(idx, "common", max_results=3).collect()
    assert len(top3) == 3
    allr = bm25_scored(idx, "common").collect()
    assert len(allr) == 10
    # top-3 by exact score must be the best 3 of the full ranking
    assert [r["url"] for r in top3] == [r["url"] for r in allr[:3]]


def test_no_docid_collisions(idx123):
    assert doc_id_collisions(idx123.docs).count() == 0


def test_empty_input_rejected(spark):
    from search_suite_spark.sources.corpus import pages_from_docs_list

    with pytest.raises(Exception):
        build_index(pages_from_docs_list(spark, []).filter(F.lit(False)))
