"""Unicode tokenizer with exact parity to the reference engine.

Reference semantics (/root/reference/indexer-qp2/src/normalise.rs:13-42,
golden cases /root/reference/indexer-qp2/test/normalise_tests.rs:7-81):

  1. Group consecutive chars into runs of the same class:
     Alpha (Unicode general category L*: Lu Ll Lt Lm Lo — Rust
     ``char::is_alphabetic``), Num (Nd Nl No — Rust ``char::is_numeric``),
     Other (everything else).  Alpha is checked first, so chars in both
     (e.g. CJK numerals, category Lo) classify as Alpha, matching Rust.
  2. Num runs are emitted as a single term, verbatim.
  3. Other runs are dropped.
  4. Alpha runs are *deagglutinated*: split at every lower→upper boundary
     (camelCase); every group is lowercased; quirk kept for parity
     (normalise.rs:38): when emitting the group at index 1, the whole run
     (lowercased) is emitted first — ``helloWorld`` →
     ``[hello, helloworld, world]``.

The ASCII fast path is pure-regex; the general path is a per-char loop
using ``unicodedata``.  Both are golden-tested against the Rust cases.
Exposed to Spark as a vectorized Arrow ``pandas_udf`` (no per-row Python
in the JVM boundary — one Arrow batch per invocation).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd

_ASCII_RUNS = re.compile(r"[A-Za-z]+|[0-9]+")
_ASCII_CAMEL = re.compile(r"(?<=[a-z])(?=[A-Z])")
_ASCII_LOWER_ONLY = re.compile(r"[a-z0-9]+")

_ALPHA_CATS = frozenset({"Lu", "Ll", "Lt", "Lm", "Lo"})
_NUM_CATS = frozenset({"Nd", "Nl", "No"})


@lru_cache(maxsize=65536)
def _char_type(c: str) -> str:
    cat = unicodedata.category(c)
    if cat in _ALPHA_CATS:
        return "a"
    if cat in _NUM_CATS:
        return "n"
    return "o"


def _deagglutinate_groups(groups: list[str], whole: str) -> list[str]:
    # normalise.rs:35-42 — at i==1 emit the whole lowered word first
    out: list[str] = []
    for i, g in enumerate(groups):
        if i == 1:
            out.append(whole.lower())
        out.append(g.lower())
    return out


def _deagglutinate_alpha(s: str) -> list[str]:
    groups: list[str] = []
    start = 0
    prev = s[0]
    for i in range(1, len(s)):
        c = s[i]
        if prev.islower() and c.isupper():
            groups.append(s[start:i])
            start = i
        prev = c
    groups.append(s[start:])
    if len(groups) == 1:
        return [s.lower()]
    return _deagglutinate_groups(groups, s)


def _normalise_general(s: str) -> list[str]:
    out: list[str] = []
    run_start = 0
    run_type = ""
    for i, c in enumerate(s):
        t = _char_type(c)
        if t != run_type:
            if run_type == "a":
                out.extend(_deagglutinate_alpha(s[run_start:i]))
            elif run_type == "n":
                out.append(s[run_start:i])
            run_start = i
            run_type = t
    if run_type == "a":
        out.extend(_deagglutinate_alpha(s[run_start:]))
    elif run_type == "n":
        out.append(s[run_start:])
    return out


def _normalise_ascii(s: str) -> list[str]:
    out: list[str] = []
    for run in _ASCII_RUNS.findall(s):
        if run[0].isdigit():
            out.append(run)
            continue
        groups = _ASCII_CAMEL.split(run)
        if len(groups) == 1:
            out.append(run.lower())
        else:
            out.extend(_deagglutinate_groups(groups, run))
    return out


def normalise(s: str) -> list[str]:
    """Tokenize one string exactly as the reference engine does."""
    if not s:
        return []
    if s.isascii():
        # common web-text fast path: already-lowercase alnum + separators
        return _normalise_ascii(s)
    return _normalise_general(s)


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Arrow-batch tokenizer: Series[str] -> Series[list[str]]."""
    return texts.map(lambda s: normalise(s) if isinstance(s, str) else [])


def tokenize_udf():
    """Vectorized pandas UDF: string column -> array<string> of terms.

    Defined lazily so importing this module never requires an active
    SparkSession / JVM (the pure-python functions above are also used by
    the pytest oracle).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tokenize(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts)

    return _tokenize
