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


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str = "url",
    text: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any token
    n-gram with an eval/benchmark corpus (the GPT-3/PaLM-style 8-13-gram
    overlap filter). Returns one row per doc:
    (key, n_contaminated_grams bigint, contaminated boolean).

    Scale shape: the benchmark side (eval suites — 10^5-10^6 docs even
    for a large battery) reduces to a DISTINCT n-gram set of MBs-GBs and
    is BROADCAST; the 100 TB training side streams through a scan →
    explode → broadcast semi-join → one groupBy(key) exchange. The big
    side is never shuffled by gram, so a stop-phrase shared by every doc
    skews nothing. Counting DISTINCT contaminated grams per doc keeps
    the result insensitive to within-doc repetition."""
    from search_suite_spark.operators.dedup import shingles

    bench_grams = shingles(benchmark, key=key, text=text, n=n).select(
        F.col("shingle").alias("gram")
    ).distinct()
    doc_grams = shingles(docs, key=key, text=text, n=n).select(
        F.col(key), F.col("shingle").alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(key)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        docs.select(key)
        .join(hits, key, "left")
        .select(
            F.col(key),
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def repetition_ratio(
    df: DataFrame, key: str = "url", text: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition (Gopher/C4-style quality signal):
    (key, n_grams, dup_ratio) where dup_ratio = 1 − distinct/total token
    n-grams — 0.0 for fully novel text, → 1.0 for looping boilerplate.
    Pure narrow Column expressions: no shuffle, scan-bound at any scale."""
    from search_suite_spark.operators.dedup import ngrams_col

    toks = df.select(F.col(key), tokens_col(text).alias("toks"))
    grams = ngrams_col(F.col("toks"), n)
    base = toks.select(
        F.col(key),
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
    )
    dup = F.when(
        F.col("n_grams") > 0,
        F.lit(1.0) - F.col("n_distinct") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return base.select(
        F.col(key), "n_grams", F.round(dup, 6).alias("dup_ratio")
    )


# PII patterns shared verbatim by the Spark (Java regex) and DuckDB (RE2)
# sides — both engines support this subset identically
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scrub(df: DataFrame, key: str = "url", text: str = "text") -> DataFrame:
    """PII redaction pass: (key, n_emails, n_phones, clean_md5) — counts
    of matched email/phone patterns plus the md5 of the redacted text
    (emails → <EMAIL>, phones → <PHONE>), so the scrubbed corpus is
    verifiable without shipping the text back. Narrow map, no shuffle;
    regexes run in whole-stage codegen (no Python workers)."""
    t = F.col(text)
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return df.select(
        F.col(key),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_PATTERN), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


def dataset_split(
    df: DataFrame,
    key: str = "url",
    weights: tuple[int, int] = (800, 900),
) -> DataFrame:
    """Deterministic, engine-independent train/val/test assignment:
    (key, bucket, split) with bucket = first 8 hex chars of md5(key) as
    an int mod 1000; split = train < weights[0] ≤ val < weights[1] ≤
    test. Reproducible across engines, runs, and data layouts (md5 of
    the KEY, not a row number or partition id), so the same doc lands in
    the same split when the corpus is re-sharded or appended to — the
    property a 100 TB pipeline needs to keep eval sets stable across
    re-crawls. Narrow map, no shuffle."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key)), 1, 8), 16, 10).cast("long")
        % 1000
    )
    return df.select(
        F.col(key),
        bucket.alias("bucket"),
        F.when(bucket < weights[0], F.lit("train"))
        .when(bucket < weights[1], F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
