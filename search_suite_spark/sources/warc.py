"""WARC file source/sink (SURVEY §2.1 S5/S7/S8).

The reference ingests WARC files in batches of 128 response records
(/root/reference/searchapi3/src/Extensions/WarcIndexer.hs:39-87, reader
WarcFileReader.hs:78-135) and stores each segment's pages as a WARC file
with zlib-compressed bodies plus a u64 offset array for binary search
(WarcFileWriter.hs:44-73, compression WebArchive/src/Data/Warc/Body.hs:
29-38).

Spark-first: `spark.read.format("binaryFile")` lists the WARC files and
a `mapInPandas` parses records per file — one task per file (WARC is a
concatenation format; at web scale you get parallelism across the
millions of files, matching how Common Crawl is actually laid out).
Records with `WARC-Type: response` become pages rows; uri and body are
strict-UTF-8 decoded and rows that fail are dropped, mirroring the
reference's strict decode + reject (WarcIndexer.hs:79-86). The document
store itself is the pages table — no offset files needed (the reference's
binary-searched `file.offs` is replaced by Parquet/Iceberg predicate
pushdown on url).

Record grammar handled: WARC/1.0 header block (CRLF lines, blank-line
terminator), Content-Length payload, CRLF CRLF record separator; bodies
optionally zlib-deflated per the reference's writer.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into records:
    {headers: dict[str,str], body: bytes}."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        head = data[pos:hdr_end].split(CRLF)
        version = head[0].decode("utf-8", "replace").strip()
        if not version.startswith("WARC/"):
            break
        for line in head[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("utf-8", "replace").strip().lower()] = v.decode(
                "utf-8", "replace"
            ).strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        records.append({"headers": headers, "body": body})
        pos = body_start + clen
    return records


def record_to_page(rec: dict) -> tuple[str, str | None, str] | None:
    """WARC record → (url, warc_date, text) or None if not an
    indexable response / not strict UTF-8 (WarcIndexer.hs:79-86)."""
    h = rec["headers"]
    if h.get("warc-type") != "response":
        return None
    url = h.get("warc-target-uri")
    if not url:
        return None
    body = rec["body"]
    if h.get("content-encoding", "").lower() in ("zlib", "deflate"):
        try:
            body = zlib.decompress(body)
        except zlib.error:
            return None
    # no Content-Encoding header → body is raw bytes, never sniffed: a
    # raw text body that happens to start with a valid zlib header (0x78)
    # must not be silently mangled by a speculative decompress. (Our own
    # writer always sets Content-Encoding: zlib, matching the reference's
    # always-compressed bodies, Body.hs:29-33.)
    try:
        text = body.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    return url, h.get("warc-date"), text


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under `path` → pages rows
    (url, warc_ts, html binary, text, lang=null)."""
    raw = spark.read.format("binaryFile").load(path)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    page = record_to_page(rec)
                    if page is not None:
                        url, date, text = page
                        rows.append(
                            {
                                "url": url,
                                "warc_date": date,
                                "html": zlib.compress(text.encode("utf-8")),
                                "text": text,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "html", "text"]
            )

    pages = raw.select("content").mapInPandas(
        go, "url string, warc_date string, html binary, text string"
    )
    return pages.select(
        "url",
        F.to_timestamp("warc_date").alias("warc_ts"),
        "html",
        "text",
        F.lit(None).cast("string").alias("lang"),
    )


def _warc_record_bytes(url: str, date: str, text: str) -> bytes:
    """One WARC response record with a zlib-compressed body (the
    reference writer's shape, WarcFileWriter.hs:64-73 + Body.hs:29-33)."""
    body = zlib.compress(text.encode("utf-8"))
    headers = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + b"Content-Encoding: zlib\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
    )
    return headers + CRLF + body + CRLF + CRLF


def write_warc(path: str, pages: list[tuple[str, str, str]]) -> None:
    """Driver-side single-file writer for tests/fixtures; the scale sink
    is write_warc_distributed below."""
    with open(path, "wb") as f:
        for url, date, text in pages:
            f.write(_warc_record_bytes(url, date, text))


def write_warc_distributed(pages: DataFrame, out_dir: str) -> DataFrame:
    """S7 at scale: write a pages frame as one WARC file PER PARTITION
    under ``out_dir``, each with a u64-offsets sidecar (the reference
    keeps an offset array per segment WARC for binary-searched record
    fetch, WarcFileWriter.hs:44-73 / WarcFileReader.hs:78-135 — the
    sidecar is that array, little-endian u64 record-start offsets).

    Tasks write to a temp name and os.replace() into
    ``part-<partitionId>.warc`` — idempotent under task retries and
    speculative execution. Returns the manifest (file, n_records, bytes)
    computed ON the executors; no page data crosses the driver.

    Local-filesystem sink by design: on a cluster this targets a shared
    mount; an object-store variant would stream multipart uploads
    instead (isolated here the same way the parquet segment store
    isolates its catalog choice).
    """
    import os
    import struct
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", "warc_ts", "text"]
    src = pages.select(
        "url", F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        "text",
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}.warc")
        final_offs = final + ".offsets"
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
        n = 0
        offsets: list[int] = []
        try:
            with open(tmp, "wb") as f:
                for pdf in batches:
                    for url, date, text in zip(
                        pdf["url"], pdf["warc_ts"], pdf["text"]
                    ):
                        offsets.append(f.tell())
                        f.write(_warc_record_bytes(
                            url, date or "1970-01-01T00:00:00Z", text or ""))
                        n += 1
            if n == 0:
                yield pd.DataFrame({"file": [], "n_records": [], "bytes": []})
                return
            size = os.path.getsize(tmp)
            with open(tmp + ".offsets", "wb") as f:
                f.write(struct.pack(f"<{len(offsets)}Q", *offsets))
            # data file lands FIRST, sidecar second: a crash between the
            # two replaces leaves a WARC without a sidecar (readers fall
            # back to a sequential parse) — never a sidecar pointing at a
            # missing or stale WARC
            os.replace(tmp, final)
            os.replace(tmp + ".offsets", final_offs)
        finally:
            # failed / retried tasks must not leak .tmp-* files
            for leftover in (tmp, tmp + ".offsets"):
                try:
                    os.unlink(leftover)
                except FileNotFoundError:
                    pass
        yield pd.DataFrame({"file": [final], "n_records": [n], "bytes": [size]})

    manifest = src.select(*cols).mapInPandas(
        go, "file string, n_records long, bytes long"
    ).cache()
    manifest.count()  # run the write job now; the cached manifest is tiny
    return manifest


def merge_warc_sorted(
    pages_a: DataFrame,
    pages_b: DataFrame,
    out_dir: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """S8: interleave two pages frames into ONE url-sorted WARC archive
    (WarcFileWriter.hs:75-127 interleaveWarcFilesSortedImpl): records
    merge in record-id (url) order; when both sides carry the SAME url
    the LEFT (A) record is kept and the right dropped (the merge's EQ
    case, WarcFileWriter.hs:123-125 — same A-wins rule as the segment
    merge's common-URL dedupe, M2), and the offsets sidecar is rebuilt
    for the merged output.

    Spark-first: the reference's streaming 2-way merge is a sort —
    union → A-wins url-dedupe → repartitionByRange(url) +
    sortWithinPartitions(url) → the per-partition WARC writer. Range
    partitioning assigns ascending url ranges to ascending partition
    ids, so concatenating ``part-*.warc`` in filename order yields one
    globally url-sorted archive, each file with its own u64 offsets
    sidecar; at 100 TB this is the same single-shuffle plan, just more
    range partitions."""
    both = pages_a.withColumn("_src", F.lit(0)).unionByName(
        pages_b.withColumn("_src", F.lit(1))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("_src")
    merged = (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    n_parts = n_partitions or max(
        1, pages_a.sparkSession.sparkContext.defaultParallelism // 4
    )
    ordered = merged.repartitionByRange(n_parts, "url").sortWithinPartitions(
        "url"
    )
    return write_warc_distributed(ordered, out_dir)
