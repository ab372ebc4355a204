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
    ManifestSegmentIO,
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


def test_manifest_commit_dirs_reserved_atomically(tmp_path):
    """Two writers asking for a commit dir must never receive the same
    one (mkdir reservation): the dir exists the moment the name is
    handed out, so the next caller skips past it."""
    io = ManifestSegmentIO()
    assert isinstance(io, SegmentIO)
    a = io._next_commit(str(tmp_path), "lineage")
    b = io._next_commit(str(tmp_path), "lineage")
    assert a != b
    import os

    assert os.path.isdir(tmp_path / "lineage" / a)
    assert os.path.isdir(tmp_path / "lineage" / b)


def test_manifest_read_docs_raises_without_manifest(spark, tmp_path):
    """A docs table with no manifest is a broken/unbuilt segment: the
    manifest backend must raise like the parquet backend, never hand
    back a silently-empty, schema-guessed frame."""
    io = ManifestSegmentIO()
    with pytest.raises(FileNotFoundError):
        io.read_docs(spark, str(tmp_path / "nonexistent_seg"))


# ---------------------------------------------------------------------------
# Cross-impl lifecycle: the SAME engine code (build → resume → query →
# delete → merge) must pass against every concrete SegmentIO backend via
# the seg_io fixture (conftest) — the proof the seam is real, not
# aspirational. The manifest impl additionally gets crash-orphan and
# dynamic-overwrite checks that exercise its commit model.
# ---------------------------------------------------------------------------

LIFE_DOCS = [
    ("http://life1", "alpha beta gamma delta"),
    ("http://life2", "beta delta epsilon alpha"),
    ("http://life3", "alpha epsilon zeta eta"),
    ("http://life4", "beta zeta theta alpha"),
    ("http://life5", "gamma delta iota kappa"),
    ("http://life6", "alpha beta zeta lambda"),
]


def test_lifecycle_under_each_io(spark, tmp_path, seg_io):
    from search_suite_spark.operators.build import build_index
    from search_suite_spark.operators.merge import merge_segments
    from search_suite_spark.operators.query import bm25_scored
    from search_suite_spark.operators.wand import wand_scored
    from search_suite_spark.sources.segments import (
        build_segment,
        completed_shards,
        delete_url,
        read_segment,
    )

    pages = pages_from_docs_list(spark, LIFE_DOCS)
    d = str(tmp_path / "seg")
    seg = build_segment(pages, d, n_shards=4, shards_per_batch=2)
    assert seg.num_docs == 6
    assert seg.n_shards == 4
    assert completed_shards(spark, d) == {0, 1, 2, 3}

    # resume is a no-op (idempotent re-run through the seam)
    seg = build_segment(pages, d, n_shards=4, shards_per_batch=2)
    assert seg.num_docs == 6

    # rank identity vs the flat path
    flat = build_index(pages, dedupe=False)
    for q in ("alpha", "alpha beta", "zeta", "nope"):
        w = {r["url"]: r["score"] for r in wand_scored(seg, q).collect()}
        f = {r["url"]: r["score"] for r in bm25_scored(flat, q).collect()}
        assert set(w) == set(f), f"{q!r} under {type(seg_io).__name__}"
        for url, score in f.items():
            assert w[url] == pytest.approx(score, rel=1e-9)

    # deletion through the seam + the metadata count hint
    delete_url(spark, seg, "http://life1")
    seg2 = read_segment(spark, d)
    assert seg2.n_deletes_hint is not None and seg2.n_deletes_hint >= 1
    after = {r["url"] for r in wand_scored(seg2, "alpha").collect()}
    assert "http://life1" not in after
    assert "http://life2" in after

    # merge two fresh segments (A wins the shared url)
    da, db, dm = (str(tmp_path / x) for x in ("a", "b", "m"))
    build_segment(pages_from_docs_list(spark, LIFE_DOCS[:3]), da, n_shards=2)
    build_segment(pages_from_docs_list(spark, LIFE_DOCS[2:]), db, n_shards=2)
    merged = merge_segments(
        spark, read_segment(spark, da), read_segment(spark, db), dm,
        n_shards=4,
    )
    assert merged.num_docs == 6
    w = {r["url"] for r in wand_scored(merged, "alpha").collect()}
    f = {r["url"] for r in bm25_scored(flat, "alpha").collect()}
    assert w == f


def test_manifest_ignores_orphan_commit_dirs(spark, tmp_path):
    """Crash between data write and manifest swap leaves orphan dirs;
    readers must never see them (Iceberg's uncommitted-snapshot rule)."""
    import os

    from search_suite_spark.sources.segment_io import ManifestSegmentIO
    from search_suite_spark.sources.segments import build_segment

    io = ManifestSegmentIO()
    d = str(tmp_path / "seg")
    seg = build_segment(
        pages_from_docs_list(spark, LIFE_DOCS), d, n_shards=2, io=io
    )
    n = io.read_postings(spark, d).count()
    # fake an uncommitted (orphan) postings commit: data present on disk,
    # absent from the manifest
    live = io._live_paths(d, "postings")
    orphan = os.path.join(d, "postings", "commit-999999", "_p_shard=0")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    import shutil

    shutil.copytree(live[0], orphan)
    assert io.read_postings(spark, d).count() == n
    assert seg.num_docs == 6


def test_manifest_dynamic_shard_overwrite(spark, tmp_path):
    """Re-writing a subset of shards replaces ONLY those shards'
    manifest entries (the resume contract's idempotency)."""
    from pyspark.sql import functions as F

    from search_suite_spark.sources.segment_io import ManifestSegmentIO

    io = ManifestSegmentIO()
    d = str(tmp_path / "seg")
    df = spark.createDataFrame(
        [(i, i % 2, 10) for i in range(8)], "doc_id long, shard int, doc_len int"
    ).withColumn("url", F.concat(F.lit("u"), F.col("doc_id")))
    io.write_docs(df, d, "overwrite")
    assert io.read_docs(spark, d).count() == 8
    # rewrite shard 0 only, with fewer rows
    io.write_docs(df.filter("shard = 0").limit(2), d, "overwrite")
    out = io.read_docs(spark, d)
    assert out.filter("shard = 0").count() == 2
    assert out.filter("shard = 1").count() == 4
