"""Packed-path partial-match scoring (wand.wand_partial) — the packed
twin of operators/query.bm25_partial (the reference's own TODO at
query.rs:192-193): rank- and value-identical to the flat path, with
disjunctive candidate generation and θ-pruned block-max scoring.
"""

import os

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.build import build_index
from search_suite_spark.operators.query import bm25_partial
from search_suite_spark.operators.wand import wand_partial
from search_suite_spark.sources.segments import (
    build_segment,
    delete_url,
    read_segment,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _pages(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pseg"))
    return build_segment(
        _pages(spark), d, n_shards=4, shards_per_batch=4, dedupe=False
    )


@pytest.fixture(scope="module")
def flat(spark):
    return build_index(_pages(spark), dedupe=False)


CASES = [
    ("spark merge window", 2),
    ("spark merge window", 1),
    ("spark merge window", 3),   # == conjunctive
    ("the fast zzznope", 1),     # one missing term, disjunctive survives
    ("zzznope qqqmissing", 1),   # all missing → empty
    ("spark spark merge", 2),    # duplicate term: scores twice, matches once
]


@pytest.mark.parametrize("q,mm", CASES)
def test_partial_rank_identity_vs_flat(seg, flat, q, mm):
    w = {
        r["url"]: (r["score"], r["n_matched"])
        for r in wand_partial(seg, q, min_should_match=mm).collect()
    }
    f = {
        r["url"]: (r["score"], r["n_matched"])
        for r in bm25_partial(flat, q, min_should_match=mm).collect()
    }
    assert set(w) == set(f), f"url set mismatch for {q!r} mm={mm}"
    for url, (score, nm) in f.items():
        assert w[url][0] == pytest.approx(score, rel=1e-9), (q, url)
        assert w[url][1] == nm


def test_partial_topk_matches_flat(seg, flat):
    w = wand_partial(seg, "spark merge window", 2, max_results=7).collect()
    f = bm25_partial(flat, "spark merge window", 2, max_results=7).collect()
    assert len(w) == 7
    assert [r["url"] for r in w] == [r["url"] for r in f]
    for a, b in zip(w, f):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_partial_respects_deletes(spark, tmp_path, flat):
    d = str(tmp_path / "dseg")
    seg = build_segment(_pages(spark), d, n_shards=4, shards_per_batch=4,
                        dedupe=False)
    full = {r["url"] for r in wand_partial(seg, "spark merge", 1).collect()}
    victim = sorted(full)[0]
    delete_url(spark, seg, victim)
    seg2 = read_segment(spark, d)
    after = {r["url"] for r in wand_partial(seg2, "spark merge", 1).collect()}
    assert after == full - {victim}
    # and the cogrouped-deletes branch agrees with the broadcast branch
    big = {
        r["url"]
        for r in wand_partial(
            seg2, "spark merge", 1, deletes_broadcast_max=0
        ).collect()
    }
    assert big == after
