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
