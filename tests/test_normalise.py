"""Golden tokenizer cases ported from the reference
(/root/reference/indexer-qp2/test/normalise_tests.rs:7-81) plus extra
edge cases pinning ASCII-fast-path ≡ general-path equivalence.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_suite_spark.functions.normalise import (
    _normalise_ascii,
    _normalise_general,
    normalise,
)


# --- Rust golden cases (normalise_tests.rs) ---

def test_empty_string():
    assert normalise("") == []


def test_only_non_alphanumeric():
    assert normalise("!!!@@@###") == []


def test_single_word():
    assert normalise("One") == ["one"]


def test_multiple_words():
    assert normalise("Hello World") == ["hello", "world"]


def test_mixed_alphanumeric():
    assert normalise("Hello123World456") == ["hello", "123", "world", "456"]


def test_mixed_with_spaces():
    assert normalise("Hello 123 World 456") == ["hello", "123", "world", "456"]


def test_unicode():
    assert normalise("café naïve") == ["café", "naïve"]


def test_deagglutinate():
    assert normalise("helloWorld") == ["hello", "helloworld", "world"]
    assert normalise("HelloWorld") == ["hello", "helloworld", "world"]


# --- additional contract pins ---

def test_three_camel_groups_only_second_emits_whole():
    # normalise.rs:38 — the whole word is emitted only at group index 1
    assert normalise("helloWorldAgain") == [
        "hello", "helloworldagain", "world", "again",
    ]


def test_upper_runs_not_split():
    # boundary is lower→upper only; "ABc" has none
    assert normalise("ABc") == ["abc"]
    assert normalise("aBC") == ["a", "abc", "bc"]


def test_url_tokenization():
    assert normalise("http://doc1") == ["http", "doc", "1"]
    assert normalise("https://hostA.example/path_42") == [
        "https", "host", "hosta", "a", "example", "path", "42",
    ]


def test_numeric_runs_kept_verbatim():
    assert normalise("007") == ["007"]


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=300, deadline=None)
def test_ascii_fast_path_matches_general(s):
    assert _normalise_ascii(s) == _normalise_general(s)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_normalise_total_and_lowercased_alpha(s):
    toks = normalise(s)
    for t in toks:
        assert t != ""
        # alpha terms are lowercased (numeric runs verbatim)
        if t[:1].isascii() and t[:1].isalpha():
            assert t == t.lower()


# --- JVM (Catalyst) tokenizer parity: the index-build hot path must
#     tokenize exactly like the golden Python reference implementation ---

_SQL_PARITY_CASES = [
    "", "!!!@@@###", "One", "Hello World", "Hello123World456", "café naïve",
    "helloWorld", "HelloWorld", "helloWorldAgain", "ABc", "aBC",
    "http://doc1", "https://hostA.example/path_42", "007",
    "überStraße", "ΚαλημέραΚόσμε", "日本語テスト123", "MixedΑλφαBeta",
    "a1b2C3", "iPhone7Plus", "XMLHttpRequest", "İstanbul", "ıssız",
    "ǅungla", "Ǆ", "ʰelloʷorld", "ǈxǉY", "ᵃᵇᶜDef", "ΣΊΣΥΦΟΣσίσυφος",
    "tab\tsep", "new\nline", "nul\x01ctrl",
]


def _sql_tokens(spark, texts):
    from pyspark.sql import functions as F

    from search_suite_spark.functions.normalise import tokens_column

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    rows = df.select("i", tokens_column(F.col("text")).alias("toks")).collect()
    return [list(r["toks"]) for r in sorted(rows, key=lambda r: r["i"])]


def test_sql_tokenizer_parity_golden(spark):
    got = _sql_tokens(spark, _SQL_PARITY_CASES)
    for s, toks in zip(_SQL_PARITY_CASES, got):
        assert toks == normalise(s), f"JVM tokenizer diverges on {s!r}"


def test_sql_tokenizer_parity_corpus(spark):
    """Parity over real corpus text + urls (the build tokenizes both)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["t"] for r in docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"),
                 F.lit(" "), F.col("text")).alias("t")).collect()]
    got = _sql_tokens(spark, texts)
    for s, toks in zip(texts, got):
        assert toks == normalise(s)


def test_sql_tokenizer_parity_random(spark):
    """Randomized parity: mixed-script strings through both tokenizers.

    Deterministic seed (no flaky CI); covers multi-byte chars, case
    boundaries, digits and separators interleaved.
    """
    import random

    rng = random.Random(0xC0FFEE)
    pool = (
        "abcXYZ0189 .,-_/:" "äöüÉÈłŁ" "ΑβΓδ" "日本語の" "١٢٣" "ǅǄǈ" "ʰᵃ" "İı"
    )
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    got = _sql_tokens(spark, texts)
    for s, toks in zip(texts, got):
        assert toks == normalise(s), f"JVM tokenizer diverges on {s!r}"
