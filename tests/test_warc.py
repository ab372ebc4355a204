"""WARC source tests: record codec roundtrip, response filtering, strict
UTF-8 rejection, end-to-end index build from a WARC file."""

import zlib

from search_suite_spark.operators.wand import wand_scored
from search_suite_spark.sources.segments import build_segment
from search_suite_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    record_to_page,
    write_warc,
)

PAGES = [
    ("http://w1", "2026-01-01T00:00:00Z", "alpha beta gamma"),
    ("http://w2", "2026-01-02T00:00:00Z", "beta delta"),
    ("http://w3", "2026-01-03T00:00:00Z", "café naïve unicode"),
]


def test_warc_roundtrip(tmp_path):
    p = str(tmp_path / "f.warc")
    write_warc(p, PAGES)
    with open(p, "rb") as f:
        recs = parse_warc_bytes(f.read())
    assert len(recs) == 3
    got = [record_to_page(r) for r in recs]
    assert [(u, d, t) for u, d, t in got] == PAGES


def test_warc_skips_non_response_and_bad_utf8(tmp_path):
    p = str(tmp_path / "g.warc")
    write_warc(p, PAGES[:1])
    with open(p, "ab") as f:
        # a warcinfo record and a response with invalid-UTF-8 body
        f.write(
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
        )
        bad = zlib.compress(b"\xff\xfe\xf8 not utf8")
        f.write(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://bad\r\nContent-Encoding: zlib\r\n"
            + f"Content-Length: {len(bad)}\r\n\r\n".encode()
            + bad + b"\r\n\r\n"
        )
    with open(p, "rb") as f:
        recs = parse_warc_bytes(f.read())
    assert len(recs) == 3
    pages = [record_to_page(r) for r in recs]
    assert [p_[0] for p_ in pages if p_ is not None] == ["http://w1"]


def test_read_warc_to_pages(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(str(d / "a.warc"), PAGES[:2])
    write_warc(str(d / "b.warc"), PAGES[2:])
    pages = read_warc(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"http://w1", "http://w2", "http://w3"}
    # text byte-identical through the zlib+utf8 roundtrip (T4 invariant)
    assert rows["http://w3"]["text"] == "café naïve unicode"
    assert rows["http://w1"]["warc_ts"] is not None
    assert zlib.decompress(bytes(rows["http://w1"]["html"])).decode() == PAGES[0][2]


def test_warc_to_index_end_to_end(spark, tmp_path):
    d = tmp_path / "warcs2"
    d.mkdir()
    write_warc(str(d / "a.warc"), PAGES)
    seg = build_segment(
        read_warc(spark, str(d)), str(tmp_path / "seg"), n_shards=2
    )
    assert seg.num_docs == 3
    got = {r["url"] for r in wand_scored(seg, "beta").collect()}
    assert got == {"http://w1", "http://w2"}
    got = {r["url"] for r in wand_scored(seg, "café").collect()}
    assert got == {"http://w3"}


def test_write_warc_distributed_roundtrip(spark, tmp_path):
    """S7 scale sink: per-partition WARC files + u64 offset sidecars;
    read_warc over the output recovers exactly the input pages."""
    import os
    import struct

    from pyspark.sql import functions as F

    from search_suite_spark.sources.warc import read_warc, write_warc_distributed

    pages = spark.createDataFrame(
        [(f"http://site/{i}", f"2024-01-0{1 + i % 9}T00:00:00Z", f"doc body {i}")
         for i in range(20)],
        "url string, ts string, text string",
    ).select("url", F.to_timestamp("ts").alias("warc_ts"), "text").repartition(3)

    out = str(tmp_path / "warcs")
    manifest = write_warc_distributed(pages, out)
    rows = manifest.collect()
    assert sum(r["n_records"] for r in rows) == 20
    for r in rows:
        assert os.path.getsize(r["file"]) == r["bytes"]
        offs = open(r["file"] + ".offsets", "rb").read()
        vals = struct.unpack(f"<{len(offs) // 8}Q", offs)
        assert len(vals) == r["n_records"]
        assert vals[0] == 0 and list(vals) == sorted(vals)
        # each offset points at a record start
        with open(r["file"], "rb") as f:
            for o in vals:
                f.seek(o)
                assert f.read(8) == b"WARC/1.0"

    back = read_warc(spark, out + "/*.warc")
    got = {(r["url"], r["text"]) for r in back.collect()}
    want = {(f"http://site/{i}", f"doc body {i}") for i in range(20)}
    assert got == want
