"""HTML head metadata scrape (SURVEY §2.2 T5).

Reference: tagsoup parse of the <head> collecting the <title> and every
<meta name=... content=...> pair, with title falling back to the filename
for file:// uris (/root/reference/searchapi3/src/Metadata.hs:238-292).
Not on the BM25-critical path — results feed the metadata-attach join at
query time (Q13).

Spark-first: one vectorized Arrow UDF over the html column; regex-based
lenient parsing (tagsoup is itself a lenient non-validating parser).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_META_TAG = re.compile(r"<meta\s+([^>]*?)/?>", re.IGNORECASE | re.DOTALL)
_NAME_ATTR = re.compile(r"name\s*=\s*[\"']([^\"']+)[\"']", re.IGNORECASE)
_CONTENT_ATTR = re.compile(r"content\s*=\s*[\"']([^\"']*)[\"']", re.IGNORECASE)


def scrape_html(url: str, html: str) -> tuple[str | None, dict[str, str]]:
    """(title, meta pairs); title falls back to the filename for file://
    uris (Metadata.hs:258-265), 'uri' keys are dropped at attach time
    (QueryProcessor.hs:97)."""
    title = None
    meta: dict[str, str] = {}
    if isinstance(html, str):
        m = _TITLE.search(html)
        if m:
            title = m.group(1).strip() or None
        for attrs in _META_TAG.findall(html):
            nm = _NAME_ATTR.search(attrs)
            ct = _CONTENT_ATTR.search(attrs)
            if nm and ct:  # attribute order is free, like a tagsoup parse
                meta.setdefault(nm.group(1).strip().lower(), ct.group(1).strip())
    if title is None and isinstance(url, str) and url.startswith("file://"):
        title = url.rstrip("/").rsplit("/", 1)[-1] or None
    return title, meta


def html_metadata_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<title:string, meta:map<string,string>>")
    def _scrape(urls: pd.Series, htmls: pd.Series) -> pd.DataFrame:
        titles, metas = [], []
        for u, h in zip(urls, htmls):
            t, m = scrape_html(u, h)
            titles.append(t)
            metas.append(m)
        return pd.DataFrame({"title": titles, "meta": metas})

    return _scrape


def page_metadata(pages: DataFrame, html_col: str = "html_text") -> DataFrame:
    """(url, title, meta) from a frame with a decoded-html string column."""
    udf = html_metadata_udf()
    return pages.select(
        "url", udf(F.col("url"), F.col(html_col)).alias("m")
    ).select("url", F.col("m.title").alias("title"), F.col("m.meta").alias("meta"))


def merge_metadata(meta_a: DataFrame, meta_b: DataFrame) -> DataFrame:
    """M11: 2-way metadata merge by url (Metadata.hs:142-233
    mergeMetadataImpl / mergeReaders): the reference streams two
    uri-sorted CBOR metadata files into one, dropping the duplicate on
    EQ so each url keeps ONE metadata record, with A (the left/newer
    segment, same side that wins the M2 common-URL dedupe) taking
    precedence. Its sorted-file mechanics (offset sidecars, hTell
    bookkeeping) are storage details the pages/metadata TABLES replace;
    what survives is the set semantics: union, one row per url, A wins.

    Plan: union → per-url min-priority window — one shuffle on url, no
    driver materialization; at scale the window is a partial-agg-
    friendly dedupe over the natural url partitioning."""
    from pyspark.sql import Window

    both = meta_a.withColumn("_src", F.lit(0)).unionByName(
        meta_b.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy("url").orderBy("_src")
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def attach_metadata(results: DataFrame, meta: DataFrame) -> DataFrame:
    """Q13: join query results with their page metadata on url
    (QueryProcessor.hs:93-99 — the reference zips each result with its
    metadata map and drops the redundant 'uri' key).

    LEFT join: a result whose page has no scraped metadata still comes
    back (title/meta null), matching the reference's mempty fallback.
    The join is k-row-sided (results are already top-k), so Catalyst
    plans the tiny side broadcast under AQE."""
    m = meta.select(
        "url",
        "title",
        F.map_filter(F.col("meta"), lambda k, _: k != F.lit("uri")).alias("meta"),
    )
    return results.join(m, "url", "left")
