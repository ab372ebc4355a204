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
spark = get_spark(app="exp", cores=cores, shuffle_partitions=max(cores, 8))
ab = os.environ.get("PROF_ARROW_BATCH")
if ab:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", ab)
pages = spark.read.parquet(os.environ["SCALING_STAGED_PAGES"] + "/pages")
flat = token_rows_with_doc(pages).withColumn("shard", shard_of_doc_id(32))

t0 = time.monotonic()
if which == "tok":
    df = flat
elif which == "shuf":
    df = flat.repartition(max(cores, 8), F.col("shard"),
                          F.pmod(F.xxhash64("term"), F.lit(64)))
elif which == "sort":
    df = (
        flat.repartition(max(cores, 8), F.col("shard"),
                         F.pmod(F.xxhash64("term"), F.lit(64)))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
    )
elif which == "full2":
    df = (
        flat.drop("shard")
        .repartition(max(cores, 8),
                     F.pmod(F.col("doc_id"), F.lit(32)),
                     F.pmod(F.xxhash64("term"), F.lit(64)))
        .withColumn("thash", F.xxhash64("term"))
        .sortWithinPartitions(
            "thash", "term", F.pmod(F.col("doc_id"), F.lit(32)),
            F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term")
        .mapInArrow(_pack_stream_arrow(has_tf=False, n_shards=32),
                    PACK_STREAM_SCHEMA)
    )
else:
    df = (
        flat.repartition(max(cores, 8), F.col("shard"),
                         F.pmod(F.xxhash64("term"), F.lit(64)))
        .sortWithinPartitions("shard", "term",
                              F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
        .select("doc_id", "doc_len", "term")
        .mapInArrow(_pack_stream_arrow(has_tf=False, n_shards=32),
                    PACK_STREAM_SCHEMA)
    )
df.write.format("noop").mode("overwrite").save()
print(f"RESULT cores={cores} which={which} secs={time.monotonic()-t0:.2f}")
spark.stop()
