"""simhash64 (r6 JVM rewrite) parity + plan-shape tests.

The pre-r6 implementation was a pandas_udf whose per-row Python loop the
round-5 verdict flagged (and which additionally failed to DEFINE on this
Spark build: its 'pd.Series' type hints could not resolve with pandas
imported function-locally). The JVM rewrite is pinned here against a
driver-side reimplementation of the reference bit-vote definition, and
the plan is asserted Python-free.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from search_suite_spark.functions.normalise import normalise
from search_suite_spark.operators.dedup import simhash64, simhash_candidates


def _expected_simhash64(url: str | None, text: str | None) -> int:
    """The original (pre-r6) per-row algorithm, verbatim semantics."""
    counts: dict[str, int] = {}
    for t in normalise(url if isinstance(url, str) else ""):
        counts[t] = counts.get(t, 0) + 1
    for t in normalise(text if isinstance(text, str) else ""):
        counts[t] = counts.get(t, 0) + 1
    votes = [0] * 64
    for t, c in counts.items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for j in range(64):
            votes[j] += c if (h >> j) & 1 else -c
    fp = sum(1 << j for j in range(64) if votes[j] > 0)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


ROWS = [
    ("u://a", "hello world hello merge join"),
    ("u://b", "hello world hello merge joins"),  # near-dup of a
    ("u://c", "completely different text about spark shuffles and sorts"),
    ("u://d", ""),  # zero tokens from text; url still tokenizes
    ("u://e", None),  # null text
    ("", ""),  # zero tokens entirely -> fingerprint 0
    ("u://g", "the the the the the"),  # repeated term (tf weighting)
    ("u://h", "Ünïcode tëxt with CamelCase and 1234 numbers"),
    # fingerprint-identical twins (same text; urls tokenize to the same
    # multiset) -> guaranteed hamming-0 candidate pair through banding
    ("u://aa-bb", "twin text body"),
    ("u://bb-aa", "twin text body"),
]


def test_simhash64_matches_reference_bit_votes(spark):
    df = spark.createDataFrame(ROWS, "url string, text string")
    got = {r["url"]: r["simhash"] for r in simhash64(df).collect()}
    assert len(got) == len(ROWS)
    for url, text in ROWS:
        assert got[url] == _expected_simhash64(url, text), (url, text)


def test_simhash64_zero_token_doc_is_zero(spark):
    df = spark.createDataFrame([("", "")], "url string, text string")
    [r] = simhash64(df).collect()
    assert r["simhash"] == 0


def test_simhash64_plan_is_jvm_only(spark):
    df = spark.createDataFrame(ROWS, "url string, text string")
    plan = simhash64(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan


def test_simhash64_feeds_candidates(spark):
    df = spark.createDataFrame(ROWS, "url string, text string")
    sim = simhash64(df)
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_candidates(sim, max_hamming=16).collect()
    }
    # expected = the banding contract computed driver-side: pairs that
    # share at least one exact 16-bit band AND have hamming <= max
    exp_fp = {u: _expected_simhash64(u, t) & ((1 << 64) - 1) for u, t in ROWS}

    def ham(x, y):
        return bin(x ^ y).count("1")

    def share_band(x, y):
        return any(
            ((x >> (16 * i)) & 0xFFFF) == ((y >> (16 * i)) & 0xFFFF)
            for i in range(4)
        )

    keys = sorted(exp_fp)
    exp = {
        (a, b): ham(exp_fp[a], exp_fp[b])
        for i, a in enumerate(keys)
        for b in keys[i + 1:]
        if share_band(exp_fp[a], exp_fp[b])
        and ham(exp_fp[a], exp_fp[b]) <= 16
    }
    assert got == exp and got  # non-empty on this corpus


def test_simhash64_single_term_doc_is_md5_mask(spark):
    # a doc whose token stream is ONE term instance: the fingerprint is
    # exactly the bit mask of md5(term)[:8] big-endian reinterpreted as
    # signed int64 (every 1-bit votes +1, every 0-bit votes -1)
    term = "solitary"
    assert normalise(term) == [term]
    df = spark.createDataFrame([("", term)], "url string, text string")
    [r] = simhash64(df).collect()
    h = int.from_bytes(hashlib.md5(term.encode()).digest()[:8], "big")
    fp = h - (1 << 64) if h >= (1 << 63) else h
    assert r["simhash"] == fp
