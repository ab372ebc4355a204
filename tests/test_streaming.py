"""Structured Streaming tests: micro-batch ingest → LSM segments, and
watermarked windowed aggregation parity with the batch expression."""

import os

import pytest
from pyspark.sql import functions as F

from search_suite_spark.sources.corpus import pages_from_docs_list
from search_suite_spark.sources.registry import load_collection, query_collection
from search_suite_spark.streaming.ingest import (
    read_pages_stream,
    stream_pages_into_collection,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"

BATCHES = [
    [("http://s1", "alpha beta gamma"), ("http://s2", "alpha delta")],
    [("http://s3", "beta epsilon")],
    [("http://s4", "alpha zeta"), ("http://s5", "eta theta")],
]


def test_stream_ingest_builds_segments_and_compacts(spark, tmp_path):
    src = str(tmp_path / "src")
    col = str(tmp_path / "col")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # one parquet file per micro-batch (maxFilesPerTrigger=1)
    for i, docs in enumerate(BATCHES):
        pages_from_docs_list(spark, docs).coalesce(1).write.parquet(
            f"{src}/batch_{i}", mode="overwrite"
        )
    files = []
    for i in range(len(BATCHES)):
        d = f"{src}/batch_{i}"
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                files.append(os.path.join(d, f))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(files)):
        os.link(f, os.path.join(flat, f"b{i}.parquet"))

    q = stream_pages_into_collection(
        read_pages_stream(spark, flat, max_files=1),
        col, ckpt, n_shards=2, compact=True, available_now=True,
    )
    q.awaitTermination(timeout=600)

    segs = load_collection(spark, col)
    assert sum(s.num_docs for s in segs.values()) == 5
    # compaction folded the per-batch segments: 2,1,2 → ≤ 2 segments
    assert len(segs) <= 2

    r = query_collection(segs, "alpha", max_results=10)
    assert {x["url"] for x in r.collect()} == {"http://s1", "http://s2", "http://s4"}

    # restart with the same checkpoint: nothing new → no segment changes
    before = sorted(os.listdir(col))
    q2 = stream_pages_into_collection(
        read_pages_stream(spark, flat, max_files=1),
        col, ckpt, n_shards=2, compact=True, available_now=True,
    )
    q2.awaitTermination(timeout=600)
    assert sorted(os.listdir(col)) == before


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    assert batch  # non-degenerate

    # same expression as a real stream over the same rows
    src = str(tmp_path / "ev")
    events.coalesce(2).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("wec")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(timeout=600)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("wec").collect()
    }
    assert got == batch
