"""Training-data pipeline operators beyond dedup: benchmark
decontamination, intra-doc repetition, PII scrubbing, deterministic
dataset splits. The synthetic sf* `documents` table carries no PII or
boilerplate loops, so these fixtures build targeted corpora; the
oracle entries (entry_queries: decontaminate / repetition_3gram /
pii_scrub / dataset_split) cover the natural-data path."""

import pytest
from pyspark.sql import functions as F

from search_suite_spark.operators.text_analysis import (
    dataset_split,
    decontaminate,
    pii_scrub,
    repetition_ratio,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_ngram_overlap(spark):
    bench = _docs(spark, [("b1", "the quick brown fox jumps over the dog")])
    docs = _docs(
        spark,
        [
            # contains the benchmark 5-gram "quick brown fox jumps over"
            ("d1", "prefix words quick brown fox jumps over suffix"),
            # shares only 4-gram overlap -> clean at n=5
            ("d2", "quick brown fox jumps elsewhere entirely now"),
            ("d3", "completely unrelated text with no overlap at all"),
        ],
    )
    out = {
        r["url"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in decontaminate(docs, bench, n=5).collect()
    }
    assert out["d1"][1] is True and out["d1"][0] >= 1
    assert out["d2"] == (0, False)
    assert out["d3"] == (0, False)


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same contaminated 5-gram repeated in a doc counts ONCE
    bench = _docs(spark, [("b1", "alpha beta gamma delta epsilon")])
    docs = _docs(
        spark,
        [
            (
                "d1",
                "alpha beta gamma delta epsilon filler "
                "alpha beta gamma delta epsilon",
            )
        ],
    )
    row = decontaminate(docs, bench, n=5).collect()[0]
    assert row["n_contaminated_grams"] == 1


def test_decontaminate_short_docs_never_match(spark):
    # docs shorter than n tokens produce no grams on either side
    bench = _docs(spark, [("b1", "one two")])
    docs = _docs(spark, [("d1", "one two"), ("d2", "")])
    rows = decontaminate(docs, bench, n=5).collect()
    assert all(not r["contaminated"] for r in rows)
    assert len(rows) == 2  # left join keeps every doc


def test_decontaminate_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, [("b1", "the quick brown fox jumps over the dog")])
    docs = _docs(spark, [("d1", "quick brown fox jumps over it")])
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_ratio_boilerplate_vs_novel(spark):
    docs = _docs(
        spark,
        [
            ("loop", "spam ham spam ham spam ham spam ham spam ham"),
            ("novel", "each word here appears exactly once in this doc"),
            ("tiny", "ab"),  # < n tokens -> 0 grams, ratio 0.0
        ],
    )
    out = {r["url"]: r for r in repetition_ratio(docs, n=3).collect()}
    # "loop": 8 total 3-grams but only 2 distinct -> ratio 0.75
    assert out["loop"]["n_grams"] == 8
    assert out["loop"]["dup_ratio"] == 0.75
    assert out["novel"]["dup_ratio"] == 0.0
    assert out["tiny"]["n_grams"] == 0 and out["tiny"]["dup_ratio"] == 0.0


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            ("d1", "mail alice@example.com or bob.smith@corp.co.uk today"),
            ("d2", "call 555-123-4567 or 555.987.6543 anytime"),
            ("d3", "nothing sensitive here"),
        ],
    )
    out = {r["url"]: r for r in pii_scrub(docs).collect()}
    assert out["d1"]["n_emails"] == 2 and out["d1"]["n_phones"] == 0
    assert out["d2"]["n_phones"] == 2 and out["d2"]["n_emails"] == 0
    assert out["d3"]["n_emails"] == 0 and out["d3"]["n_phones"] == 0
    # redaction is content-changing exactly when PII was present
    import hashlib

    clean3 = hashlib.md5(b"nothing sensitive here").hexdigest()
    assert out["d3"]["clean_md5"] == clean3
    clean1 = hashlib.md5(b"mail <EMAIL> or <EMAIL> today").hexdigest()
    assert out["d1"]["clean_md5"] == clean1
    clean2 = hashlib.md5(b"call <PHONE> or <PHONE> anytime").hexdigest()
    assert out["d2"]["clean_md5"] == clean2


def test_pii_scrub_no_python_workers(spark):
    docs = _docs(spark, [("d1", "a@b.com")])
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# dataset split
# ---------------------------------------------------------------------------


def test_dataset_split_deterministic_and_stable(spark):
    docs = _docs(spark, [(f"doc://{i}", "x") for i in range(300)])
    a = {r["url"]: (r["bucket"], r["split"]) for r in dataset_split(docs).collect()}
    # same keys re-sharded differently -> identical assignment
    b = {
        r["url"]: (r["bucket"], r["split"])
        for r in dataset_split(docs.repartition(7)).collect()
    }
    assert a == b
    # python-side replica of the bucket formula pins the exact contract
    import hashlib

    for url, (bucket, split) in list(a.items())[:20]:
        exp = int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % 1000
        assert bucket == exp
        assert split == ("train" if exp < 800 else "val" if exp < 900 else "test")


def test_dataset_split_custom_weights_partition_everything(spark):
    docs = _docs(spark, [(f"k{i}", "x") for i in range(500)])
    out = dataset_split(docs, weights=(500, 750)).groupBy("split").count()
    got = {r["split"]: r["count"] for r in out.collect()}
    assert sum(got.values()) == 500
    assert set(got) <= {"train", "val", "test"}
    # with 500 keys the md5 buckets land roughly proportionally
    assert got["train"] > got["val"] > 0 and got["test"] > 0
