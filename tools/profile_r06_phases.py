"""Round-6 phase profiler: decompose the BENCH 1x index_build (50k docs,
local[32]) into its sequential driver-visible phases, mirroring
build_segment + pack_and_write + read_segment step by step.

Usage: python tools/profile_r06_phases.py [replication]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "4g")

from pyspark.sql import functions as F  # noqa: E402

from search_suite_spark.session import get_spark  # noqa: E402
from search_suite_spark.sources.corpus import pages_from_documents  # noqa: E402
from search_suite_spark.operators.build import (  # noqa: E402
    dedupe_newest_wins,
    token_rows_with_doc,
)
from search_suite_spark.sources.segments import (  # noqa: E402
    PACKED_SCHEMA,
    PACK_STREAM_SCHEMA,
    _U64_SIGN_FLIP,
    _pack_stream_arrow,
    build_segment,
    read_segment,
    shard_of_doc_id,
    write_terms_table,
)
from search_suite_spark.sources.segment_io import current_io  # noqa: E402


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="profile_r06", cores=cpus,
                      shuffle_partitions=max(2 * cpus, 16))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    io = current_io()

    pages = pages_from_documents(spark, sf_dir, replication=replication).cache()
    n_docs = pages.count()

    # warmup identical to bench
    warm = tempfile.mkdtemp(prefix="prof_warm_")
    try:
        build_segment(pages.limit(2000), warm, n_shards=4, shards_per_batch=4,
                      resume=False, dedupe=True)
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    import gc
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(2)

    phases: dict[str, float] = {}

    def tick(name, t0):
        phases[name] = round(time.monotonic() - t0, 3)
        return time.monotonic()

    n_shards = max(cpus, 16)
    n_tbuckets = 64
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seg_dir = tempfile.mkdtemp(prefix="prof_seg_")
    try:
        t = time.monotonic()
        target = spark.sparkContext.defaultParallelism
        nump = pages.rdd.getNumPartitions()
        t = tick("rdd_getNumPartitions", t)
        p2 = pages if nump >= target else pages.repartition(target)
        bp = dedupe_newest_wins(p2)
        flat = token_rows_with_doc(bp).withColumn(
            "shard", shard_of_doc_id(n_shards))
        kernel = _pack_stream_arrow(has_tf=True, n_shards=n_shards,
                                    emit_docs=True)
        tbucket = F.pmod(F.xxhash64("term"), F.lit(n_tbuckets)).cast("int")
        u64sort = F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP))
        pre = (
            flat.withColumn("tbucket", tbucket)
            .repartition(npart, F.col("shard"), F.col("tbucket"))
            .groupBy("shard", "tbucket", "doc_id", "doc_len", "term")
            .agg(F.count("*").cast("int").alias("tf"))
            .sortWithinPartitions("shard", "term", u64sort)
            .select("doc_id", "doc_len", "term", "tf")
        )
        packed = pre.mapInArrow(kernel, PACK_STREAM_SCHEMA).persist()
        t = tick("plan_build", t)
        is_doc_row = F.col("term").isNull()
        postings_out = packed.filter(~is_doc_row).select(
            *[c.split(" ")[0] for c in PACKED_SCHEMA.split(", ")])
        io.write_postings(postings_out, seg_dir, "overwrite")
        t = tick("A_postings_write", t)

        docs = packed.filter(is_doc_row).select(
            "doc_id", "doc_len", "shard", "url",
            F.timestamp_micros(F.col("warc_us")).alias("warc_ts"))
        io.write_docs(docs, seg_dir, "overwrite")
        t = tick("B_docs_write", t)
        write_terms_table(spark, seg_dir, postings_out, io)
        t = tick("B_terms_write", t)

        shard_list = spark.createDataFrame(
            [(s,) for s in range(n_shards)], "shard int")
        lineage = (
            shard_list.join(
                postings_out.groupBy("shard").agg(
                    F.count("*").alias("n_terms"),
                    F.sum("n").alias("n_postings"),
                    F.sum(F.length("ids") + F.length("tfs")
                          + F.length("dls")).alias("packed_bytes"),
                ), "shard", "left")
            .join(
                packed.filter(is_doc_row).groupBy("shard").agg(
                    F.count("*").alias("n_docs"),
                    F.sum("doc_len").alias("total_doc_len")),
                "shard", "left")
            .select(
                "shard",
                F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                F.coalesce("total_doc_len", F.lit(0)).alias("total_doc_len"),
                F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
                F.coalesce("n_postings", F.lit(0)).alias("n_postings"),
                F.coalesce("packed_bytes", F.lit(0)).alias("packed_bytes"),
                F.lit(0).alias("ms"),
            )
        )
        io.append_lineage(lineage, seg_dir)
        t = tick("C_lineage", t)
        packed.unpersist()
        read_segment(spark, seg_dir)
        t = tick("read_segment", t)
    finally:
        shutil.rmtree(seg_dir, ignore_errors=True)

    # the real thing end-to-end, same corpus, for cross-checking
    seg2 = tempfile.mkdtemp(prefix="prof_seg2_")
    try:
        t = time.monotonic()
        build_segment(pages, seg2, n_shards=n_shards,
                      shards_per_batch=n_shards, resume=False, dedupe=True)
        phases["full_build_segment"] = round(time.monotonic() - t, 3)
    finally:
        shutil.rmtree(seg2, ignore_errors=True)

    print("PROFILE " + json.dumps(
        {"n_docs": n_docs, "phases": phases,
         "sum_phases": round(sum(v for k, v in phases.items()
                                 if k != "full_build_segment"), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
