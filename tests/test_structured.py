"""Structured boolean query parser + evaluator tests (Q11).

Grammar per /root/reference/searchapi3/src/Query/QueryParser.hs:28-34;
set semantics per Query/StructuredProcessor.hs:65-71.
"""

import pytest

from search_suite_spark.operators.build import build_index
from search_suite_spark.plans.structured import (
    ClauseRegex,
    ClauseText,
    Conjunction,
    parse_structured_query,
    structured_query,
)
from search_suite_spark.sources.corpus import pages_from_docs_list


def test_parse_reference_example():
    q = "/\\ search\n/\\ \\/ .cs\n   \\/ .ts\n   \\/ .js\n/\\ feature"
    c = parse_structured_query(q)
    assert isinstance(c, Conjunction) and c.op == "and"
    assert len(c.children) == 3
    assert c.children[0] == ClauseText("search")
    inner = c.children[1]
    assert isinstance(inner, Conjunction) and inner.op == "or"
    assert [x.text for x in inner.children] == [".cs", ".ts", ".js"]
    assert c.children[2] == ClauseText("feature")


def test_parse_regex_leaf():
    c = parse_structured_query("~ ^ap.*")
    assert c == ClauseRegex("^ap.*")


def test_parse_mismatched_ops_rejected():
    with pytest.raises(ValueError):
        parse_structured_query("/\\ a\n\\/ b")


@pytest.fixture(scope="module")
def idx(spark):
    return build_index(
        pages_from_docs_list(
            spark,
            [
                ("u1", "apple banana cherry"),
                ("u2", "apple banana"),
                ("u3", "apple durian"),
                ("u4", "elderberry"),
            ],
        )
    )


def urls(df):
    return {r["url"] for r in df.collect()}


def test_and(idx):
    assert urls(structured_query(idx, "/\\ apple\n/\\ banana")) == {"u1", "u2"}


def test_or(idx):
    assert urls(structured_query(idx, "\\/ durian\n\\/ elderberry")) == {"u3", "u4"}


def test_sub(idx):
    assert urls(structured_query(idx, "-- apple\n-- banana")) == {"u3"}


def test_nested(idx):
    # apple AND (cherry OR durian)
    q = "/\\ apple\n/\\ \\/ cherry\n   \\/ durian"
    assert urls(structured_query(idx, q)) == {"u1", "u3"}


def test_regex_leaf_eval(idx):
    # terms starting with 'ba' or 'du' → banana/durian docs
    q = "~ ^(ba|du)"
    assert urls(structured_query(idx, q)) == {"u1", "u2", "u3"}


def test_or_with_multi_term_child(idx):
    # 'apple banana' is a CONJUNCTIVE leaf (both terms) — it must NOT
    # fold into the single-term isin collapse; OR result is its docs
    # union elderberry's
    q = "\\/ apple banana\n\\/ elderberry"
    assert urls(structured_query(idx, q)) == {"u1", "u2", "u4"}


def test_or_all_terms_missing(idx):
    q = "\\/ zzznope\n\\/ qqqmissing"
    assert urls(structured_query(idx, q)) == set()


def test_and_of_text_leaves_collapses_to_conjunction(idx):
    # AND of text leaves == conjunction over the union of their terms
    q = "/\\ apple banana\n/\\ cherry"
    assert urls(structured_query(idx, q)) == {"u1"}


def test_sub_with_missing_term(idx):
    # subtracting a missing term removes nothing
    q = "-- apple\n-- zzznope"
    assert urls(structured_query(idx, q)) == {"u1", "u2", "u3"}


def test_and_collapse_empty_normalizing_child_is_empty(idx):
    # a child whose text normalizes to zero terms ("!!!") is an empty
    # doc set → the whole AND is empty; the merged-terms collapse must
    # not silently drop its constraint (ADVICE r3)
    assert urls(structured_query(idx, "/\\ apple\n/\\ !!!")) == set()
    # and symmetric: empty child first
    assert urls(structured_query(idx, "/\\ !!!\n/\\ apple")) == set()


def test_multi_regex_tree_batched(idx):
    # (ba* OR el*) minus du* — three regex leaves share ONE dictionary
    # scan (plans/structured._batched_regex_terms); results must match
    # per-leaf semantics exactly
    q = "-- \\/ ~ ^ba\n   \\/ ~ ^el\n-- ~ ^du"
    assert urls(structured_query(idx, q)) == {"u1", "u2", "u4"}


def test_multi_regex_and_mixed_text(idx):
    # text + two regex leaves in one AND
    q = "/\\ apple\n/\\ ~ ^ba\n/\\ ~ ^ch"
    assert urls(structured_query(idx, q)) == {"u1"}


def test_multi_regex_no_match_leaf(idx):
    # a regex leaf matching no dictionary term is an empty set
    q = "/\\ ~ ^ap\n/\\ ~ ^zzz"
    assert urls(structured_query(idx, q)) == set()


def _n_cached_rdds(spark):
    # DataFrame-level cache entries (the idx fixture may hold some, and
    # localCheckpoint blocks live at the RDD level, outside this count;
    # the assertion is on the DELTA, not emptiness)
    return spark._jsparkSession.sharedState().cacheManager().numCachedEntries()


def test_multi_regex_cache_released_even_on_failure(spark, idx):
    """The shared dictionary-scan persist lives exactly one call: it is
    released after a successful query AND (via finally) after one whose
    materialization job fails mid-flight — a long-lived serving session
    must not accumulate orphaned caches from failed queries."""
    before = _n_cached_rdds(spark)
    q_ok = "-- \\/ ~ ^ba\n   \\/ ~ ^el\n-- ~ ^du"
    assert urls(structured_query(idx, q_ok)) == {"u1", "u2", "u4"}
    assert _n_cached_rdds(spark) == before
    # invalid Java regex compiles only at execution: the eager
    # materialization job raises AFTER the scan was persisted
    with pytest.raises(Exception):
        structured_query(idx, "/\\ ~ ^ba\n/\\ ~ (unclosed")
    assert _n_cached_rdds(spark) == before


def test_multi_regex_durable_checkpoint_when_dir_set(spark, idx, tmp_path):
    """With a checkpoint dir configured (cluster deployments), the
    eager id-set materialization takes the durable-checkpoint branch —
    blocks survive executor loss, unlike localCheckpoint's."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        q = "-- \\/ ~ ^ba\n   \\/ ~ ^el\n-- ~ ^du"
        assert urls(structured_query(idx, q)) == {"u1", "u2", "u4"}
        import os

        assert any(os.scandir(str(tmp_path / "ckpt")))
    finally:
        # restore: other suites assume no checkpoint dir (Scala setter
        # name contains '$', so getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
