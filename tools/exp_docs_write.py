"""Isolate docs_write at one parallelism level. Usage:
   python tools/exp_docs_write.py CORES [pack_first]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from search_suite_spark.session import get_spark  # noqa: E402
from search_suite_spark.sources.segments import (  # noqa: E402
    PACKED_SCHEMA, _U64_SIGN_FLIP, _pack_stream, shard_of_doc_id,
)
from search_suite_spark.operators.build import doc_rows_fast, token_rows  # noqa: E402

cores = int(sys.argv[1])
pack_first = len(sys.argv) > 2 and sys.argv[2] == "pack_first"
spark = get_spark(app="exp", cores=cores, shuffle_partitions=max(cores, 8),
                  extra_conf={"spark.driver.extraJavaOptions":
                              "-Xlog:gc*:file=/tmp/exp_gc.log:time,uptime"})
ab = os.environ.get("PROF_ARROW_BATCH")
if ab:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", ab)
staged = os.environ["SCALING_STAGED_PAGES"]
pages = spark.read.parquet(staged + "/pages")
n_shards = 32
seg_dir = tempfile.mkdtemp(prefix="exp_seg_", dir="/dev/shm")

packed = None
t0 = time.monotonic()
if pack_first:
    flat = token_rows(pages).withColumn("shard", shard_of_doc_id(n_shards))
    packed = (
        flat.withColumn("tbucket", F.pmod(F.xxhash64("term"), F.lit(64)).cast("int"))
        .repartition(max(cores, 8), "shard", "tbucket")
        .sortWithinPartitions("shard", "tbucket", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .mapInPandas(_pack_stream(has_tf=False), PACKED_SCHEMA)
        .persist()
    )
    packed.count()
print(f"pack: {time.monotonic()-t0:.1f}s", flush=True)

docs_b = doc_rows_fast(pages).withColumn("shard", shard_of_doc_id(n_shards))
t0 = time.monotonic()
(docs_b.repartition("shard").sortWithinPartitions("doc_id")
 .write.mode("overwrite").partitionBy("shard").parquet(seg_dir + "/docs"))
print(f"docs_write: {time.monotonic()-t0:.1f}s", flush=True)
shutil.rmtree(seg_dir, ignore_errors=True)
spark.stop()
