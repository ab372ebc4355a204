"""Storage-seam design tests (sources/segment_io.py): the parquet impl
round-trips every segment table through the interface, and the pinned
Iceberg layout contract keeps the production swap honest.
"""

import pytest
from pyspark.sql import functions as F

from search_suite_spark.sources.corpus import pages_from_docs_list
from search_suite_spark.sources.segment_io import (
    DEFAULT_IO,
    ICEBERG_LAYOUT,
    IcebergSegmentIO,
    ParquetSegmentIO,
    SegmentIO,
)
from search_suite_spark.sources.segments import build_segment, read_segment

DOCS = [
    ("http://io1", "alpha beta gamma"),
    ("http://io2", "beta delta epsilon"),
    ("http://io3", "alpha epsilon zeta"),
]


def test_parquet_io_roundtrip_through_interface(spark, tmp_path):
    io = ParquetSegmentIO()
    seg = build_segment(
        pages_from_docs_list(spark, DOCS), str(tmp_path / "seg"),
        n_shards=2, io=io,
    )
    assert seg.num_docs == 3
    assert seg.n_shards == 2
    # every table reads back through the same seam
    assert io.read_postings(spark, seg.path).count() > 0
    assert io.read_docs(spark, seg.path).count() == 3
    assert io.read_lineage(spark, seg.path).select("shard").distinct().count() == 2
    terms = io.read_terms(spark, seg.path)
    assert terms is not None
    assert {r["term"] for r in terms.collect()} >= {"alpha", "beta", "zeta"}
    assert io.read_deletes(spark, seg.path) is None
    io.append_deletes(
        seg.docs.filter(F.col("url") == "http://io1").select("doc_id"), seg.path
    )
    assert io.read_deletes(spark, seg.path).count() == 1
    # a re-read segment picks the delete up
    assert read_segment(spark, seg.path, io=io).deletes.count() == 1


def test_default_io_is_parquet():
    assert isinstance(DEFAULT_IO, ParquetSegmentIO)


def test_iceberg_layout_contract_pins_term_bucketing():
    """The production catalog MUST bucket postings by term (file-level
    pruning of query-term scans) and keep shard identity partitioning
    (shard-local conjunctions) — pinned so a future impl can't silently
    drop either."""
    assert "bucket(64, term)" in ICEBERG_LAYOUT["postings"]
    assert "shard" in ICEBERG_LAYOUT["postings"]
    assert "shard" in ICEBERG_LAYOUT["docs"]
    assert "append-only" in ICEBERG_LAYOUT["lineage"]


def test_iceberg_impl_raises_with_layout(spark):
    io = IcebergSegmentIO()
    assert isinstance(io, SegmentIO)
    with pytest.raises(NotImplementedError, match=r"bucket\(64, term\)"):
        io.read_postings(spark, "/nonexistent")
