"""Storage seam for the segment store: every byte the engine persists or
reads goes through a SegmentIO implementation, so the production catalog
is one module swap away from the sandbox's plain-parquet layout.

Production target (north_star: "trillion-document Iceberg table"):
Iceberg tables with the layout pinned in ICEBERG_LAYOUT below — postings
bucketed by term so a query's term filter prunes files at the catalog
(the Iceberg analogue of the reference's sorted dictionary + seek,
/root/reference/indexer-qp2/src/index_reader.rs:200-269), plus identity
partitioning on shard so conjunctive queries stay shard-local. The
sandbox ships no Iceberg runtime jars (documented in segments.py), so
ParquetSegmentIO reproduces the same physical intent on plain parquet:
shard directories + term-sorted row groups (Parquet min/max stats do the
pruning the Iceberg bucket transform would).

The interface is deliberately storage-shaped, not DataFrame-shaped: the
physical layout decisions (partition columns, in-file sort, atomic
dictionary replacement) are part of the storage strategy, so they live
in the impl — callers hand over logical frames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# the layout contract the production Iceberg impl must create — pinned
# here (and in tests/test_segment_io.py) so the swap cannot silently
# drop the term-bucket pruning the query plans rely on
ICEBERG_LAYOUT = {
    "postings": "PARTITIONED BY (bucket(64, term), shard); "
                "write ordered by (term)",
    "docs": "PARTITIONED BY (shard); write ordered by (doc_id)",
    "lineage": "unpartitioned append-only log",
    "terms": "unpartitioned, replaced atomically per build (snapshot)",
    "deletes": "unpartitioned append-only (doc_id) log",
}


class SegmentIO:
    """Interface: segment table reads/writes under a segment directory."""

    def write_postings(self, df: DataFrame, seg_dir: str, mode: str) -> None:
        raise NotImplementedError

    def write_docs(self, df: DataFrame, seg_dir: str, mode: str) -> None:
        raise NotImplementedError

    def append_lineage(self, df: DataFrame, seg_dir: str) -> None:
        raise NotImplementedError

    def write_terms(self, df: DataFrame, seg_dir: str) -> None:
        raise NotImplementedError

    def append_deletes(self, df: DataFrame, seg_dir: str) -> None:
        raise NotImplementedError

    def read_postings(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        raise NotImplementedError

    def read_docs(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        raise NotImplementedError

    def read_lineage(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        raise NotImplementedError

    def read_terms(self, spark: SparkSession, seg_dir: str) -> DataFrame | None:
        raise NotImplementedError

    def read_deletes(self, spark: SparkSession, seg_dir: str) -> DataFrame | None:
        raise NotImplementedError


class ParquetSegmentIO(SegmentIO):
    """Plain-parquet segment store (the sandbox default).

    Physical layout mirrors ICEBERG_LAYOUT's intent: postings/docs are
    hive-partitioned by shard with one file per shard (query latency is
    dominated by file listing/footers when each (task, shard) pair
    leaves a fragment) and term/doc_id-sorted within files so row-group
    min/max statistics prune scans.
    """

    def write_postings(self, df: DataFrame, seg_dir: str, mode: str) -> None:
        (
            df.repartition("shard")
            .sortWithinPartitions("term")
            .write.mode(mode)
            .partitionBy("shard")
            .parquet(os.path.join(seg_dir, "postings"))
        )

    def write_docs(self, df: DataFrame, seg_dir: str, mode: str) -> None:
        (
            df.repartition("shard")
            .sortWithinPartitions("doc_id")
            .write.mode(mode)
            .partitionBy("shard")
            .parquet(os.path.join(seg_dir, "docs"))
        )

    def append_lineage(self, df: DataFrame, seg_dir: str) -> None:
        df.write.mode("append").parquet(os.path.join(seg_dir, "lineage"))

    def write_terms(self, df: DataFrame, seg_dir: str) -> None:
        # parallel write, term-sorted within files (row-group pruning);
        # no coalesce(1) — a single-task dictionary write is a serial
        # tail at scale (web vocabularies reach 10^8 terms). The rename
        # makes dictionary replacement atomic for concurrent readers.
        tmp = os.path.join(seg_dir, "_terms_tmp")
        df.sortWithinPartitions("term").write.mode("overwrite").parquet(tmp)
        final = os.path.join(seg_dir, "terms")
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)

    def append_deletes(self, df: DataFrame, seg_dir: str) -> None:
        df.write.mode("append").parquet(os.path.join(seg_dir, "deletes"))

    def read_postings(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        # explicit schema: skips footer-based inference on every open (a
        # web-scale segment has thousands of posting files) and keeps an
        # all-empty segment readable
        from search_suite_spark.sources.segments import PACKED_SCHEMA

        return spark.read.schema(PACKED_SCHEMA).parquet(
            os.path.join(seg_dir, "postings")
        )

    def read_docs(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        return spark.read.parquet(os.path.join(seg_dir, "docs"))

    def read_lineage(self, spark: SparkSession, seg_dir: str) -> DataFrame:
        return spark.read.parquet(os.path.join(seg_dir, "lineage"))

    def read_terms(self, spark: SparkSession, seg_dir: str) -> DataFrame | None:
        path = os.path.join(seg_dir, "terms")
        return spark.read.parquet(path) if os.path.isdir(path) else None

    def read_deletes(self, spark: SparkSession, seg_dir: str) -> DataFrame | None:
        path = os.path.join(seg_dir, "deletes")
        if not os.path.isdir(path):
            return None
        try:
            return spark.read.parquet(path)
        except Exception:
            return None


class IcebergSegmentIO(SegmentIO):
    """Production catalog impl — requires Iceberg runtime jars, which
    this sandbox does not ship. Methods raise with the DDL the impl must
    execute; ICEBERG_LAYOUT is the binding layout contract."""

    def __init__(self, catalog: str = "spark_catalog"):
        self.catalog = catalog

    def _unavailable(self, table: str):
        raise NotImplementedError(
            "Iceberg runtime jars are not available in this environment; "
            f"production layout for {table!r}: {ICEBERG_LAYOUT[table]}"
        )

    def write_postings(self, df, seg_dir, mode):
        self._unavailable("postings")

    def write_docs(self, df, seg_dir, mode):
        self._unavailable("docs")

    def append_lineage(self, df, seg_dir):
        self._unavailable("lineage")

    def write_terms(self, df, seg_dir):
        self._unavailable("terms")

    def append_deletes(self, df, seg_dir):
        self._unavailable("deletes")

    def read_postings(self, spark, seg_dir):
        self._unavailable("postings")

    def read_docs(self, spark, seg_dir):
        self._unavailable("docs")

    def read_lineage(self, spark, seg_dir):
        self._unavailable("lineage")

    def read_terms(self, spark, seg_dir):
        self._unavailable("terms")

    def read_deletes(self, spark, seg_dir):
        self._unavailable("deletes")


DEFAULT_IO: SegmentIO = ParquetSegmentIO()
