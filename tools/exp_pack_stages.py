"""Decompose pack-job scaling: tokenize-only vs +shuffle+sort vs full.
Usage: python tools/exp_pack_stages.py CORES [tok|sort|full]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from search_suite_spark.session import get_spark  # noqa: E402
from search_suite_spark.sources.segments import (  # noqa: E402
    PACK_STREAM_SCHEMA, _U64_SIGN_FLIP, _pack_stream_arrow, shard_of_doc_id,
)
from search_suite_spark.operators.build import token_rows_with_doc  # noqa: E402

cores = int(sys.argv[1])
which = sys.argv[2]
# mirror tools/scaling_bench.py's measured config exactly (4g heap,
# 2 tasks/core with a floor of 16) so stage timings decompose the same
# job the published BENCH numbers time; EXP_SHUFFLE_PARTS overrides for
# partition-count experiments
os.environ.setdefault("SPARK_DRIVER_MEM", "4g")
nparts = int(os.environ.get("EXP_SHUFFLE_PARTS", max(2 * cores, 16)))
spark = get_spark(app="exp", cores=cores, shuffle_partitions=nparts)
ab = os.environ.get("PROF_ARROW_BATCH")
if ab:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", ab)
pages = spark.read.parquet(os.environ["SCALING_STAGED_PAGES"] + "/pages")
flat = token_rows_with_doc(pages).withColumn("shard", shard_of_doc_id(32))

t0 = time.monotonic()
if which == "tok":
    df = flat
elif which == "shuf":
    df = flat.repartition(nparts, F.col("shard"),
                          F.pmod(F.xxhash64("term"), F.lit(64)))
elif which == "sort":
    df = (
        flat.repartition(nparts, F.col("shard"),
                         F.pmod(F.xxhash64("term"), F.lit(64)))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
    )
elif which == "full2":
    df = (
        flat.drop("shard")
        .repartition(nparts,
                     F.pmod(F.col("doc_id"), F.lit(32)),
                     F.pmod(F.xxhash64("term"), F.lit(64)))
        .withColumn("thash", F.xxhash64("term"))
        .sortWithinPartitions(
            "thash", "term", F.pmod(F.col("doc_id"), F.lit(32)),
            F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term")
        .mapInArrow(_pack_stream_arrow(has_tf=False, n_shards=32, emit_docs=False),
                    PACK_STREAM_SCHEMA)
    )
elif which == "fullagg":
    # candidate pipeline: tf collapsed by a map-side partial agg BEFORE
    # the exchange (one exchange total — the groupBy's superset keys
    # reuse the repartition distribution), so shuffle+sort+Arrow all
    # carry ~2.4x fewer rows
    tb = F.pmod(F.xxhash64("term"), F.lit(64)).cast("int")
    df = (
        flat.withColumn("tbucket", tb)
        .repartition(nparts, F.col("shard"), F.col("tbucket"))
        .groupBy("shard", "tbucket", "doc_id", "doc_len", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term", "tf")
        .mapInArrow(_pack_stream_arrow(has_tf=True, n_shards=32, emit_docs=False),
                    PACK_STREAM_SCHEMA)
    )
elif which == "kprep":
    # stage the shuffled+sorted 3-col frame to parquet so 'kernel' can
    # time the mapInArrow stage in isolation
    (
        flat.repartition(nparts, F.col("shard"),
                         F.pmod(F.xxhash64("term"), F.lit(64)))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term")
        .write.mode("overwrite")
        .parquet(os.environ["SCALING_STAGED_PAGES"] + "/sorted3")
    )
    df = None
elif which == "kernel":
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))
    df = (
        spark.read.parquet(os.environ["SCALING_STAGED_PAGES"] + "/sorted3")
        .mapInArrow(_pack_stream_arrow(has_tf=False, n_shards=32, emit_docs=False),
                    PACK_STREAM_SCHEMA)
    )
elif which == "kernel_pass":
    # Arrow round-trip with a no-op Python kernel: isolates the
    # JVM<->Python transfer cost from the pack computation
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))

    def passthrough(batches):
        for rb in batches:
            yield rb

    df = (
        spark.read.parquet(os.environ["SCALING_STAGED_PAGES"] + "/sorted3")
        .mapInArrow(passthrough, "doc_id long, doc_len int, term string")
    )
else:
    df = (
        flat.repartition(nparts, F.col("shard"),
                         F.pmod(F.xxhash64("term"), F.lit(64)))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term")
        .mapInArrow(_pack_stream_arrow(has_tf=False, n_shards=32, emit_docs=False),
                    PACK_STREAM_SCHEMA)
    )
if df is not None:
    df.write.format("noop").mode("overwrite").save()
print(f"RESULT cores={cores} which={which} secs={time.monotonic()-t0:.2f}")
spark.stop()
