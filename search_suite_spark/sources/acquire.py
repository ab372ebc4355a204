"""Document acquisition (SURVEY §2.1 S3/S4/S6): url-list fetch ingest,
local-file ingest, git-repo ingest. Each produces `pages` rows
(url, warc_ts, html, text, lang) ready for the build pipeline.

S3 (`POST /indexUrlLines`, searchapi3/src/Controllers/Indexation.hs:
64-100): the reference trims/drops blank url lines, fetches each with
bounded concurrency 10, strict-UTF-8 decodes bodies, indexes successes
and reports {"success": [urls], "failure": [urls]}. Spark-first: the
url list becomes a DataFrame partitioned BY HOST — every url of a host
lands in one partition (a host is never fetched from two executors at
once), and INSIDE a partition the thread pool parallelizes across
HOSTS, each host's urls fetched strictly one-at-a-time by its thread —
end-to-end at-most-one in-flight request per host, the crawler's
politeness frontier semantics (crawler-lib/src/Pipeline/
TimedFrontier.hs:20-50; stricter than the reference's indexUrlLines
endpoint itself, whose bounded-10 pool is host-oblivious,
Indexation.hs:76-80). Distinct hosts still fan out across threads and
executors; `max_concurrency` bounds the per-partition pool (the
reference's maxConcurrency=10). Enforced by
tests/test_acquire_merge.py's in-flight-per-host probe. The fetch
function is INJECTED — the sandbox has no network, so tests drive the
real plumbing (host partitioning, per-host serialization, bounded
pool, parse/fetch/decode reject, status report) with a deterministic
fake fetcher, the same honest seam as the multimodal decode stub;
`default_fetcher` is the urllib implementation a networked deployment
would use.

S4/S6 (Extensions/GitIndexer.hs:26-56): `git ls-files` enumerates the
tracked files (driver-side subprocess — catalog-listing-sized, like the
reference's runBs), then the FILE READS are distributed: paths are
sharded across executors and read+strict-decoded in mapInPandas
batches, assuming the repo checkout is on shared storage (same contract
as the parquet segment store). Undecodable (binary) files are dropped,
matching the reference's strict decode reject (WarcIndexer.hs:79-86).
"""

from __future__ import annotations

import os
import subprocess
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_FETCH_SCHEMA = "url string, ok boolean, error string, text string"
DEFAULT_TS = "1970-01-01T00:00:00Z"


def default_fetcher(url: str, timeout: float = 10.0) -> bytes:
    """Networked fetcher (urllib, stdlib-only): body bytes of a 2xx
    response; raises on anything else. Module-level so closures pickle
    it by reference."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310
        status = getattr(resp, "status", 200)
        if not 200 <= status < 300:
            raise OSError(f"HTTP {status}")
        return resp.read()


def parse_url_lines(url_lines: str | list[str]) -> list[str]:
    """The reference's line handling (Indexation.hs:72-75): split lines,
    trim, drop blank; order preserved, duplicates kept (each is fetched
    and reported separately there — we dedupe at indexing, not here)."""
    lines = (
        url_lines.splitlines() if isinstance(url_lines, str) else url_lines
    )
    return [s.strip() for s in lines if s.strip()]


def _host_of(url: str) -> str | None:
    from urllib.parse import urlparse

    try:
        p = urlparse(url)
    except ValueError:
        return None
    if p.scheme not in ("http", "https") or not p.netloc:
        return None
    return p.netloc.lower()


def fetch_url_list(
    spark: SparkSession,
    url_lines: str | list[str] | DataFrame,
    fetcher: Callable[[str], bytes] = default_fetcher,
    max_concurrency: int = 10,
    ts: str = DEFAULT_TS,
    min_delay_s: float = 0.0,
) -> DataFrame:
    """S3 fetch stage → one row per input url:
    (url, ok, error, warc_ts, html, text, lang).

    Rows with ok=true carry valid pages columns; ok=false rows carry the
    failure reason (unparseable url / fetch error / non-UTF-8 body —
    the reference's three reject paths, Indexation.hs:88-100). The
    result is cached before return so the fetch job runs EXACTLY ONCE
    however many frames are derived from it (pages + report) — the
    CALLER owns the cache: unpersist() it once the derived frames are
    materialized (ingest_url_list does; a long-lived session that
    ingests repeatedly without releasing it accumulates executor
    storage).

    ``url_lines`` may also be a DataFrame with a ``url`` column — the
    scale path for table-sized frontiers, where the url list never
    touches the driver: the host is parsed JVM-side (codegen
    ``parse_url``) with the same accept rule as the driver-side parse
    (http/https scheme + non-empty host, lowercased)."""
    if isinstance(url_lines, DataFrame):
        # try_parse_url: null (not an ANSI error) on malformed urls
        host = F.when(
            F.lower(F.try_parse_url(F.col("url"), F.lit("PROTOCOL"))).isin(
                "http", "https"
            )
            & (F.try_parse_url(F.col("url"), F.lit("HOST")) != ""),
            F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))),
        )
        src = url_lines.select("url", host.alias("host"))
        n_parts = spark.sparkContext.defaultParallelism
    else:
        urls = parse_url_lines(url_lines)
        if not urls:
            return spark.createDataFrame(
                [],
                "url string, ok boolean, error string, warc_ts timestamp, "
                "html binary, text string, lang string",
            )
        rows = [(u, _host_of(u)) for u in urls]
        src = spark.createDataFrame(rows, "url string, host string")
        n_hosts = max(1, len({h for _, h in rows if h is not None}))
        n_parts = min(n_hosts, spark.sparkContext.defaultParallelism)
    # all urls of one host → one partition (politeness: a host is never
    # fetched from two executors at once); hosts spread across partitions
    src = src.repartition(n_parts, "host")

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        def one(url: str) -> tuple:
            try:
                body = fetcher(url)
            except Exception as e:  # fetcher failures are data, not bugs
                return url, False, f"Failed to fetch page: {e}"[:300], None
            try:
                text = bytes(body).decode("utf-8", errors="strict")
            except UnicodeDecodeError:
                return url, False, "Body is not valid UTF-8", None
            return url, True, None, text

        def host_seq(urls: list[str]) -> list[tuple]:
            # politeness: ONE host's urls fetch strictly sequentially
            # on one thread — never two in-flight requests to a host —
            # and, with min_delay_s > 0, consecutive request STARTS to
            # the host are spaced at least that far apart (the
            # reference crawler's timed frontier schedules a minimum
            # per-host delay, crawler-lib TimedFrontier.hs:20-50)
            import time as _time

            out: list[tuple] = []
            next_start = 0.0
            for u in urls:
                if min_delay_s > 0:
                    wait = next_start - _time.monotonic()
                    if wait > 0:
                        _time.sleep(wait)
                    next_start = _time.monotonic() + min_delay_s
                out.append(one(u))
            return out

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                out: list[tuple] = []
                by_host: dict[str, list[str]] = {}
                for url, host in zip(pdf["url"], pdf["host"]):
                    if host is None or (
                        isinstance(host, float) and pd.isna(host)
                    ):
                        out.append((url, False, "Could not parse url", None))
                    else:
                        by_host.setdefault(host, []).append(url)
                # the pool fans out across HOSTS; within a host, one
                # thread walks the url list in order
                for rows in pool.map(host_seq, by_host.values()):
                    out.extend(rows)
                yield pd.DataFrame(
                    out, columns=["url", "ok", "error", "text"]
                )

    fetched = src.mapInPandas(go, _FETCH_SCHEMA)
    out = fetched.select(
        "url",
        "ok",
        "error",
        F.to_timestamp(F.lit(ts)).alias("warc_ts"),
        F.when(
            F.col("ok"), _zlib_compress_udf()(F.col("text"))
        ).alias("html"),
        "text",
        F.lit(None).cast("string").alias("lang"),
    ).cache()
    out.count()  # fetch now, exactly once
    return out


def ingest_url_list(
    spark: SparkSession,
    url_lines: str | list[str],
    fetcher: Callable[[str], bytes] = default_fetcher,
    max_concurrency: int = 10,
    ts: str = DEFAULT_TS,
    min_delay_s: float = 0.0,
) -> tuple[DataFrame, dict[str, list[str]]]:
    """S3 end-to-end shape: (pages frame of the successes, the
    reference's {"success": [urls], "failure": [urls]} report map,
    Indexation.hs:81-84). The report collect is url-list-sized (the
    urls came from the driver in the first place).

    Cache lifecycle: the full fetch frame's cache is RELEASED here —
    the returned pages frame owns its own (successes-only) cache, which
    the caller unpersists after indexing it (or lets the session drop)."""
    fetched = fetch_url_list(
        spark, url_lines, fetcher=fetcher,
        max_concurrency=max_concurrency, ts=ts, min_delay_s=min_delay_s,
    )
    pages = fetched.filter(F.col("ok")).select(
        "url", "warc_ts", "html", "text", "lang"
    ).cache()
    report: dict[str, list[str]] = {"success": [], "failure": []}
    for r in fetched.select("url", "ok").collect():
        report["success" if r["ok"] else "failure"].append(r["url"])
    pages.count()  # materialize from the fetch cache before dropping it
    fetched.unpersist()
    return pages, report


def _zlib_compress_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _compress(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else zlib.compress(t.encode("utf-8"))
        )

    return _compress


def pages_from_local_files(
    spark: SparkSession,
    paths: list[str],
    url_prefix: str = "file://",
    ts: str = DEFAULT_TS,
) -> DataFrame:
    """S4 at scale: distribute a path list and read each file ON THE
    EXECUTORS (shared-filesystem contract), url = url_prefix + abspath.
    Unreadable or non-UTF-8 files are dropped (strict decode reject)."""
    if not paths:
        return spark.createDataFrame([], PAGES_SCHEMA)
    src = spark.createDataFrame(
        [(os.path.abspath(p),) for p in paths], "path string"
    )
    n_parts = min(len(paths), spark.sparkContext.defaultParallelism)
    src = src.repartition(n_parts)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                try:
                    with open(p, "rb") as f:
                        raw = f.read()
                    text = raw.decode("utf-8", errors="strict")
                except (OSError, UnicodeDecodeError):
                    continue
                rows.append({"path": p, "text": text})
            yield pd.DataFrame(rows, columns=["path", "text"])

    read = src.mapInPandas(go, "path string, text string")
    return read.select(
        F.concat(F.lit(url_prefix), F.col("path")).alias("url"),
        F.to_timestamp(F.lit(ts)).alias("warc_ts"),
        _zlib_compress_udf()(F.col("text")).alias("html"),
        "text",
        F.lit(None).cast("string").alias("lang"),
    )


def git_tracked_files(repo_path: str) -> list[str]:
    """`git ls-files` of a checkout → absolute paths (GitIndexer.hs:
    40-51: --git-dir=<repo>/.git ls-files, lines joined onto the repo
    root). Driver-side subprocess, catalog-listing-sized output."""
    if not os.path.isdir(repo_path):
        raise FileNotFoundError(f"Git path doesn't exist: {repo_path}")
    repo = os.path.abspath(repo_path)
    out = subprocess.run(
        ["git", f"--git-dir={repo}/.git", "ls-files", "-z"],
        capture_output=True,
        check=True,
    )
    return [
        os.path.join(repo, f.decode("utf-8"))
        for f in out.stdout.split(b"\0")
        if f
    ]


def pages_from_git(
    spark: SparkSession, repo_path: str, ts: str = DEFAULT_TS
) -> DataFrame:
    """S6: index a git checkout's TRACKED files (GitIndexer.hs:26-56 —
    ls-files then indexLocalFiles; untracked/ignored files never enter,
    binary tracked files drop at strict decode)."""
    return pages_from_local_files(
        spark, git_tracked_files(repo_path), ts=ts
    )
