"""Structured boolean queries over PACKED segments + collections (Q11
on the LSM path — reference `POST /structured-query/:collection`,
searchapi3/src/Query/StructuredProcessor.hs:44-71).

Twin of tests/test_structured.py: every tree evaluated there against
the flat index is evaluated here against (a) one packed segment and
(b) a two-segment collection holding the same corpus split in half —
results must be set-identical with the flat path in case (a), and
follow the reference's leaf-per-segment-then-union semantics in (b).
"""

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.build import build_index
from search_suite_spark.plans.structured import structured_query
from search_suite_spark.plans.structured_packed import (
    structured_ids_packed,
    structured_query_packed,
)
from search_suite_spark.sources.corpus import pages_from_docs_list
from search_suite_spark.sources.segments import build_segment, delete_url

DOCS = [
    ("u1", "apple banana cherry"),
    ("u2", "apple banana"),
    ("u3", "apple durian"),
    ("u4", "elderberry"),
]

TREES = [
    ("/\\ apple\n/\\ banana", {"u1", "u2"}),
    ("\\/ durian\n\\/ elderberry", {"u3", "u4"}),
    ("-- apple\n-- banana", {"u3"}),
    ("/\\ apple\n/\\ \\/ cherry\n   \\/ durian", {"u1", "u3"}),
    ("~ ^(ba|du)", {"u1", "u2", "u3"}),
    ("\\/ apple banana\n\\/ elderberry", {"u1", "u2", "u4"}),
    ("\\/ zzznope\n\\/ qqqmissing", set()),
    ("/\\ apple banana\n/\\ cherry", {"u1"}),
    ("-- apple\n-- zzznope", {"u1", "u2", "u3"}),
    ("/\\ apple\n/\\ !!!", set()),
    ("/\\ !!!\n/\\ apple", set()),
    ("-- \\/ ~ ^ba\n   \\/ ~ ^el\n-- ~ ^du", {"u1", "u2", "u4"}),
    ("/\\ apple\n/\\ ~ ^ba\n/\\ ~ ^ch", {"u1"}),
    ("/\\ ~ ^ap\n/\\ ~ ^zzz", set()),
]


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sp_seg")
    return build_segment(
        pages_from_docs_list(spark, DOCS), str(d), n_shards=4,
        shards_per_batch=4, resume=False, dedupe=False,
    )


@pytest.fixture(scope="module")
def col_segs(spark, tmp_path_factory):
    """Two-segment collection: u1/u2 in one segment, u3/u4 in the
    other — the shape load_collection produces after two ingests."""
    base = tmp_path_factory.mktemp("sp_col")
    segs = []
    for i, half in enumerate((DOCS[:2], DOCS[2:])):
        segs.append(build_segment(
            pages_from_docs_list(spark, half), str(base / f"seg_{i}"),
            n_shards=3, shards_per_batch=3, resume=False, dedupe=False,
        ))
    return segs


@pytest.fixture(scope="module")
def idx(spark):
    return build_index(pages_from_docs_list(spark, DOCS))


def urls(df):
    return {r["url"] for r in df.collect()}


@pytest.mark.parametrize("q,expected", TREES)
def test_packed_single_segment_matches_flat(idx, seg, q, expected):
    assert urls(structured_query(idx, q)) == expected  # flat baseline
    assert urls(structured_query_packed(seg, q)) == expected


@pytest.mark.parametrize("q,expected", TREES)
def test_packed_collection(col_segs, q, expected):
    # every url lives in exactly one segment → the collection-wide
    # leaf union equals the flat leaf set, so expectations carry over
    assert urls(structured_query_packed(col_segs, q)) == expected


def test_collection_leaf_conjunction_is_per_segment(spark, tmp_path):
    """Reference semantics: a text leaf is conjunctive WITHIN a segment
    (StructuredProcessor.hs runs the unscored query per segment and
    unions) — a url whose leaf terms are split across two segment
    VERSIONS matches only if one version holds them all."""
    a = build_segment(
        pages_from_docs_list(spark, [("ux", "apple"), ("uy", "apple kiwi")]),
        str(tmp_path / "a"), n_shards=2, shards_per_batch=2,
        resume=False, dedupe=False,
    )
    b = build_segment(
        pages_from_docs_list(spark, [("ux", "kiwi")]),
        str(tmp_path / "b"), n_shards=2, shards_per_batch=2,
        resume=False, dedupe=False,
    )
    # ux has 'apple' in seg a and 'kiwi' in seg b, but never together
    got = urls(structured_query_packed([a, b], "apple kiwi"))
    assert got == {"uy"}
    # single-term leaves union across segments
    assert urls(structured_query_packed([a, b], "kiwi")) == {"ux", "uy"}


def test_packed_deletes_filtered_per_segment(spark, tmp_path, seg):
    d = build_segment(
        pages_from_docs_list(spark, DOCS), str(tmp_path / "del"),
        n_shards=4, shards_per_batch=4, resume=False, dedupe=False,
    )
    delete_url(spark, d, "u2")
    from search_suite_spark.sources.segments import read_segment

    d = read_segment(spark, str(tmp_path / "del"))
    assert urls(structured_query_packed(d, "/\\ apple\n/\\ banana")) == {"u1"}
    # a url deleted in one segment but live in another still surfaces
    # through the union (per-segment deletions, then mconcat)
    assert urls(structured_query_packed([d, seg], "banana")) == {"u1", "u2"}


def test_structured_ids_distinct_and_long(seg):
    out = structured_ids_packed(seg, "\\/ apple\n\\/ banana")
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 3
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_text_only_tree_prunes_postings_scan(seg):
    """Text-only trees must push an isin(term) filter into the packed
    scan (no dictionary join in the plan); regex trees cannot."""
    plan = structured_ids_packed(
        seg, "/\\ apple\n/\\ banana"
    )._jdf.queryExecution().explainString(
        seg.postings.sparkSession._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted")
    )
    import re

    assert re.search(r"PushedFilters:.*[Ii]n\(term", plan), plan


def test_big_corpus_packed_matches_flat(spark, tmp_path):
    """Natural-size twin: 400 synthetic docs, mixed tree with regex +
    sub, packed vs flat must agree exactly."""
    rows = [
        (f"d{i}", f"alpha{'' if i % 3 else ' beta'} w{i % 17} "
                  f"{'gamma' if i % 5 == 0 else 'delta'}")
        for i in range(400)
    ]
    pages = pages_from_docs_list(spark, rows)
    idx = build_index(pages)
    seg = build_segment(
        pages, str(tmp_path / "big"), n_shards=8, shards_per_batch=8,
        resume=False, dedupe=False,
    )
    q = "-- /\\ alpha\n   /\\ \\/ gamma\n      \\/ ~ ^w1\n-- beta"
    flat = urls(structured_query(idx, q))
    packed = urls(structured_query_packed(seg, q))
    assert flat == packed and len(flat) > 0


# ---------------------------------------------------------------------------
# randomized flat-vs-packed equivalence (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_suite_spark.plans.structured import (
    ClauseRegex,
    ClauseText,
    Conjunction,
    evaluate_structured,
)

FUZZ_DOCS = [
    ("f1", "apple banana cherry"),
    ("f2", "apple banana"),
    ("f3", "apple durian kiwi"),
    ("f4", "elderberry kiwi"),
    ("f5", "banana cherry durian"),
    ("f6", "cherry"),
    ("f7", "durian elderberry apple"),
    ("f8", "kiwi banana"),
]

_TERMS = ["apple", "banana", "cherry", "durian", "elderberry", "kiwi",
          "zzznope", "!!!"]
_PATTERNS = ["^ap", "^ba", "(an|rr)", "^zzz", "ian$"]


def _trees(depth):
    leaf = st.one_of(
        st.builds(
            ClauseText,
            st.lists(st.sampled_from(_TERMS), min_size=1, max_size=2)
            .map(" ".join),
        ),
        st.builds(ClauseRegex, st.sampled_from(_PATTERNS)),
    )
    if depth == 0:
        return leaf
    return st.one_of(
        leaf,
        st.builds(
            Conjunction,
            st.sampled_from(["and", "or", "sub"]),
            st.lists(_trees(depth - 1), min_size=1, max_size=3),
        ),
    )


@pytest.fixture(scope="module")
def fuzz_idx(spark):
    return build_index(pages_from_docs_list(spark, FUZZ_DOCS))


@pytest.fixture(scope="module")
def fuzz_segs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sp_fuzz")
    return [
        build_segment(
            pages_from_docs_list(spark, half), str(base / f"seg_{i}"),
            n_shards=2, shards_per_batch=2, resume=False, dedupe=False,
        )
        for i, half in enumerate((FUZZ_DOCS[:4], FUZZ_DOCS[4:]))
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=_trees(2))
def test_random_tree_flat_packed_collection_identity(
    fuzz_idx, fuzz_segs, tree
):
    """Any clause tree yields the same doc-id set on the flat index, a
    packed segment, and a 2-segment collection (urls are segment-
    disjoint here, so collection leaf-union == flat leaf set)."""
    flat = {r["doc_id"] for r in evaluate_structured(fuzz_idx, tree).collect()}
    packed = {
        r["doc_id"] for r in structured_ids_packed(fuzz_segs, tree).collect()
    }
    assert packed == flat
