"""Deterministic synthesis of the ``pages`` input table.

BASELINE.json ``input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data: pages are derived deterministically from the driver's
synthetic ``documents.parquet`` (seeded) or from a seeded vocabulary.

The per-row invariant (BASELINE.json / reference
searchapi3/src/Extensions/WarcIndexer.hs:79-86) is: extracted text per url
is byte-identical to strict-UTF-8-decoding the zlib-decompressed ``html``
body — the reference indexes the raw body with no boilerplate removal, so
``html`` here is the zlib-compressed UTF-8 bytes of ``text`` itself.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _zlib_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _compress(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: zlib.compress(s.encode("utf-8")) if isinstance(s, str) else None)

    return _compress


def extract_text_udf():
    """Inverse of the html synthesis: zlib-decompress + strict UTF-8 decode.

    This is the byte-identical text-extraction contract (T4 in SURVEY §2.2;
    reference WarcIndexer.hs:79-86 uses strict decode and rejects invalid
    UTF-8 — we surface None for invalid rows so callers can filter/alert).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(blobs: pd.Series) -> pd.Series:
        def go(b):
            if b is None:
                return None
            try:
                return zlib.decompress(bytes(b)).decode("utf-8", errors="strict")
            except (zlib.error, UnicodeDecodeError):
                return None

        return blobs.map(go)

    return _extract


def pages_from_documents(
    spark: SparkSession, sf_dir: str, replication: int = 1
) -> DataFrame:
    """Build a ``pages`` table deterministically from ``documents.parquet``.

    url is ``doc://{doc_id}`` (``/r{j}`` suffix for replicas beyond the
    first), warc_ts is a fixed epoch plus doc_id seconds — fully
    deterministic, derived only from the driver-provided synthetic table.
    ``replication`` scales the corpus for throughput benchmarking: replica
    texts get a per-replica salt token appended so term statistics are not
    degenerate copies.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the sf parquet is a single file → 1 input partition; repartition the
    # *small* base BEFORE the replication crossJoin so the expansion (and
    # every downstream stage) is parallel — repartitioning after the join
    # would funnel the full expanded corpus through one map task first
    base = docs.select(
        F.col("doc_id").cast("long").alias("src_id"),
        F.col("text"),
        F.col("lang"),
    ).repartition(spark.sparkContext.defaultParallelism)
    if replication > 1:
        reps = spark.range(replication).withColumnRenamed("id", "rep")
        base = base.crossJoin(reps).withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
            ),
        )
    else:
        base = base.withColumn("rep", F.lit(0))

    pages = base.select(
        F.when(F.col("rep") == 0, F.concat(F.lit("doc://"), F.col("src_id")))
        .otherwise(F.concat(F.lit("doc://"), F.col("src_id"), F.lit("/r"), F.col("rep")))
        .alias("url"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_dt_interval(secs=(F.col("src_id") + F.col("rep") * F.lit(86400)).cast("double"))
        ).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    )
    return pages.withColumn("html", _zlib_udf()(F.col("text"))).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def pages_tiny(spark: SparkSession) -> DataFrame:
    """Mirror of the reference's example inputs
    (/root/reference/indexer-qp2/eg/input1 + eg/input2), with the duplicate
    url (http://doc3) carrying a later warc_ts — exercises newest-wins
    url dedupe (reference merge/common_urls.rs:108-136).
    """
    rows = [
        ("http://doc1", "2026-01-01 00:00:00", "foo Bar foo bar", "en"),
        ("http://doc3", "2026-01-01 00:00:01", "baz foo gaz", "en"),
        ("http://doc4", "2026-01-02 00:00:00", "foo Bar food bar", "en"),
        ("http://doc3", "2026-01-02 00:00:01", "bazar food gaz", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string, lang string")
    return (
        df.select(
            "url",
            F.to_timestamp("ts").alias("warc_ts"),
            "text",
            "lang",
        )
        .withColumn("html", _zlib_udf()(F.col("text")))
        .select("url", "warc_ts", "html", "text", "lang")
    )


def pages_from_docs_list(spark: SparkSession, docs: list[tuple[str, str]]) -> DataFrame:
    """(url, content) pairs → pages rows; test helper mirroring the
    reference API ingest shape (searchapi3/src/Api.hs:23-26)."""
    rows = [
        (url, f"2026-01-01 00:00:{i % 60:02d}", text, "en")
        for i, (url, text) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string, lang string")
    return (
        df.select("url", F.to_timestamp("ts").alias("warc_ts"), "text", "lang")
        .withColumn("html", _zlib_udf()(F.col("text")))
        .select("url", "warc_ts", "html", "text", "lang")
    )
