"""Text-analysis operators for training-data pipelines over `documents`:

  - language-ID (marker-token heuristic)
  - quality scoring (length / type-token / stopword ratios)
  - token counting (whitespace, engine tokenizer, BPE-ish regex)
  - document fingerprinting (md5 of the normalized token stream)

All pure Column expressions except where the engine tokenizer (Arrow UDF)
supplies the token array. Deterministic and replicated exactly by the
DuckDB oracle SQL in search_suite_spark.oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.operators.dedup import tokens_col

# marker stopwords per language for the lexicon heuristic; order
# matters for deterministic tie-breaks (alphabetical by lang code)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "is", "of", "and"],
    "es": ["el", "los", "y", "que", "en"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "is", "of", "and", "in", "to"]

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def lang_id(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """(key, pred_lang): argmax of marker-token counts; ties and all-zero
    scores → 'unk'. Deterministic: ties break alphabetically by lang."""
    toks = df.select(F.col(key), tokens_col(text).alias("toks"))

    def _marker_filter(lang):
        markers = LANG_MARKERS[lang]
        return lambda t: t.isin(markers)

    scores = toks.select(
        F.col(key),
        *[
            F.size(F.filter("toks", _marker_filter(lang))).alias(f"s_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("unk"))
    for lang in langs:  # first lang (alphabetical) hitting the max wins
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scores.select(F.col(key), pred.alias("pred_lang"))


def quality_score(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """(key, n_chars, n_tokens, type_token_ratio, stopword_ratio, quality).

    quality ∈ [0,1]: penalizes tiny docs, low lexical diversity, and
    stopword-free (spammy) or stopword-only text. A simple, deterministic
    blend — the point is the pipeline shape, not the metric's IR quality.
    """
    toks = df.select(F.col(key), F.col(text), tokens_col(text).alias("toks"))
    base = toks.select(
        F.col(key),
        F.length(text).cast("long").alias("n_chars"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.size(F.filter("toks", lambda t: t.isin(STOPWORDS))).cast("long").alias("n_stop"),
    )
    ttr = F.when(F.col("n_tokens") > 0, F.col("n_types") / F.col("n_tokens")).otherwise(F.lit(0.0))
    stop_ratio = F.when(F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")).otherwise(
        F.lit(0.0)
    )
    len_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    stop_score = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) / F.lit(0.4)
    quality = (len_score + ttr + F.greatest(stop_score, F.lit(0.0))) / F.lit(3.0)
    return base.select(
        F.col(key),
        "n_chars",
        "n_tokens",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """(key, n_ws, n_terms, n_bpe): whitespace tokens, engine tokens, and
    BPE-ish regex tokens (letters / short digit runs / single symbols)."""
    return df.select(
        F.col(key),
        F.size(F.split(F.trim(F.col(text)), r"\s+")).cast("long").alias("n_ws"),
        F.size(tokens_col(text)).cast("long").alias("n_terms"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe"),
    )


def doc_fingerprint(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """(key, fingerprint): md5 over the space-joined normalized token
    stream — canonical content identity robust to whitespace/punct noise."""
    return df.select(
        F.col(key),
        F.md5(F.concat_ws(" ", tokens_col(text))).alias("fingerprint"),
    )
