"""SymSpell deletion-neighborhood spelling index (Q14 at serving scale).

The contract under test: spelling_suggestions_indexed over
term_deletion_index(dict) is ROW-IDENTICAL to the spelling_suggestions
levenshtein scan over the same dictionary — the index is a pure access
path, never a semantics change — and a parquet-persisted index answers
probes through a pushed `variant IN (...)` predicate (the storage
analogue of the reference BK-tree's neighborhood walk,
/root/reference/indexer-qp2/src/bk_tree.rs:128-190).
"""

import re

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.build import build_index
from search_suite_spark.operators.spelling import (
    _deletion_variants,
    spelling_suggestions,
    spelling_suggestions_indexed,
    suggestion_map,
    term_deletion_index,
)
from search_suite_spark.sources.corpus import pages_from_docs_list


@pytest.fixture(scope="module")
def idx(spark):
    docs = [
        ("http://d1", "food fool fools cool fan a b ox"),
        ("http://d2", "foo bar bat cat fit ba ab spark spank merge"),
        ("http://d3", "window windows widow merged merger spars"),
    ]
    return build_index(pages_from_docs_list(spark, docs), dedupe=False)


@pytest.fixture(scope="module")
def del_index(spark, idx):
    return term_deletion_index(idx.terms, max_dist=1).cache()


def _rows(df):
    return sorted(
        (r["word"], int(r["dist"]), r["suggestion"]) for r in df.collect()
    )


@pytest.mark.parametrize(
    "query",
    [
        "fool",
        "fo bbat",
        "spark merg",
        "a",  # 1-char word: the 'b' hit is reachable only via the "" variant
        "widnow",  # transposition = 2 substitutions, must NOT match at d=1
        "zzzzzz",  # no hits at all
    ],
)
def test_indexed_identical_to_scan_d1(spark, idx, del_index, query):
    scan = _rows(spelling_suggestions(idx.terms, query, max_dist=1))
    probed = _rows(spelling_suggestions_indexed(del_index, query, max_dist=1))
    assert probed == scan


def test_indexed_identical_to_scan_d2(spark, idx):
    di2 = term_deletion_index(idx.terms, max_dist=2)
    for query in ("fo bbat", "windw", "ab"):
        scan = _rows(spelling_suggestions(idx.terms, query, max_dist=2))
        probed = _rows(spelling_suggestions_indexed(di2, query, max_dist=2))
        assert probed == scan


def test_single_char_neighborhood(spark, idx, del_index):
    """lev('a','b') = 1 is discoverable ONLY through the shared empty
    variant — the index must keep depth-1 deletions of 1-char terms."""
    got = suggestion_map(
        spelling_suggestions_indexed(del_index, "a", max_dist=1).collect()
    )
    assert got["a"][0] == {"a"}
    assert "b" in got["a"][1] and "ba" in got["a"][1] and "ab" in got["a"][1]


def test_index_shape(spark, idx, del_index):
    """Every term contributes itself plus its single deletions:
    (len+1) variants per term at max_dist=1, minus in-term collisions."""
    n_terms = idx.terms.count()
    per_term = {
        r["term"]: r["n"]
        for r in del_index.groupBy("term")
        .agg(F.countDistinct("variant").alias("n"))
        .collect()
    }
    assert len(per_term) == n_terms
    for term, n in per_term.items():
        assert n == len(_deletion_variants(term, 1)), term


def test_persisted_index_pushes_variant_probe(spark, idx, tmp_path):
    """The serving shape: index written variant-clustered; a probe's
    candidate lookup reaches the parquet scan as a pushed IN(variant)."""
    path = str(tmp_path / "spell_idx")
    term_deletion_index(idx.terms, max_dist=1).repartition(2).sortWithinPartitions(
        "variant"
    ).write.parquet(path)
    disk = spark.read.parquet(path)
    out = spelling_suggestions_indexed(disk, "spark merg", max_dist=1)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert re.search(r"PushedFilters:.*[Ii]n\(variant", plan), plan
    assert _rows(out) == _rows(
        spelling_suggestions(idx.terms, "spark merg", max_dist=1)
    )


def test_empty_query(spark, del_index):
    assert spelling_suggestions_indexed(del_index, "...").count() == 0


def test_probe_deeper_than_build_raises(spark, idx, del_index, tmp_path):
    """A d=2 probe against a d=1 index would be silently incomplete
    (term-side depth-2 variants don't exist) — it must raise instead.
    The build depth rides the variant field metadata, so the contract
    survives a parquet round-trip too."""
    with pytest.raises(ValueError, match="build depth 1"):
        spelling_suggestions_indexed(del_index, "spark", max_dist=2)
    path = str(tmp_path / "spell_idx_d1")
    term_deletion_index(idx.terms, max_dist=1).write.parquet(path)
    disk = spark.read.parquet(path)
    with pytest.raises(ValueError, match="build depth 1"):
        spelling_suggestions_indexed(disk, "spark", max_dist=2)
    # an index without recorded depth (e.g. built by an older writer)
    # is accepted as-is
    legacy = disk.select(
        "term", F.col("variant").alias("variant", metadata={})
    )
    assert (
        spelling_suggestions_indexed(legacy, "spark merg", max_dist=1).count()
        > 0
    )
