"""Phase-level profiler for the packed index build (north_rule scaling).

Runs the same build at two parallelism levels, but times each phase as a
separate Spark job so the non-scaling phase is visible:

  tokenize+shuffle+pack (persist+count), postings write, docs write,
  lineage, terms.

Usage: python tools/profile_build.py [--replication R] [--cores 8 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, os, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from search_suite_spark.session import get_spark
from search_suite_spark.sources.corpus import pages_from_documents
from search_suite_spark.sources.segments import (
    PACKED_SCHEMA, PACK_STREAM_SCHEMA, _pack_stream_arrow, _U64_SIGN_FLIP,
    shard_of_doc_id,
)
from search_suite_spark.operators.build import token_rows_with_doc

cores = {cores}
spark = get_spark(app=f"profile_{{cores}}", cores=cores,
                  shuffle_partitions=max(cores, 8))
ab = os.environ.get("PROF_ARROW_BATCH")
if ab:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", ab)
staged = os.environ["SCALING_STAGED_PAGES"]
pages = spark.read.parquet(staged + "/pages")
n_shards = 32
n_tbuckets = 64
seg_dir = tempfile.mkdtemp(prefix=f"prof_seg_{{cores}}_", dir="/dev/shm")

phases = {{}}
def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])
st0 = steal()
def tick(name, t0):
    phases[name] = round(time.monotonic() - t0, 2)
    return time.monotonic()

t = time.monotonic()
n_docs = pages.count()
t = tick("count_input", t)

# mirrors pack_and_write's single-pass plan: map-side partial agg
# collapses tf before the one exchange; postings write fuses cache
# materialization (phase A), docs/terms are cache scans (phase B),
# lineage last (phase C)
flat = token_rows_with_doc(pages).withColumn("shard", shard_of_doc_id(n_shards))
kernel = _pack_stream_arrow(has_tf=True, n_shards=n_shards, emit_docs=True)
npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
tbucket = F.pmod(F.xxhash64("term"), F.lit(n_tbuckets)).cast("int")
packed = (
    flat.withColumn("tbucket", tbucket)
    .repartition(npart, F.col("shard"), F.col("tbucket"))
    .groupBy("shard", "tbucket", "doc_id", "doc_len", "term")
    .agg(F.count("*").cast("int").alias("tf"))
    .sortWithinPartitions("shard", "term",
                          F.col("doc_id").bitwiseXOR(F.lit(_U64_SIGN_FLIP)))
    .select("doc_id", "doc_len", "term", "tf")
    .mapInArrow(kernel, PACK_STREAM_SCHEMA)
    .persist()
)
is_doc = F.col("term").isNull()
postings_out = packed.filter(~is_doc).select(
    *[c.split(" ")[0] for c in PACKED_SCHEMA.split(", ")])
(postings_out.repartition("shard").sortWithinPartitions("term")
 .write.mode("overwrite").partitionBy("shard").parquet(seg_dir + "/postings"))
t = tick("pack_and_postings_write", t)

docs_b = packed.filter(is_doc).select("doc_id", "doc_len", "shard", "url")
(docs_b.repartition("shard").sortWithinPartitions("doc_id")
 .write.mode("overwrite").partitionBy("shard").parquet(seg_dir + "/docs"))
t = tick("docs_write", t)

terms = postings_out.groupBy("term").agg(F.sum("n").alias("df"))
terms.sortWithinPartitions("term").write.mode("overwrite").parquet(seg_dir + "/terms")
t = tick("terms_write", t)

shard_list = spark.createDataFrame([(s,) for s in range(n_shards)], "shard int")
lineage = (
    shard_list.join(
        postings_out.groupBy("shard").agg(
            F.count("*").alias("n_terms"), F.sum("n").alias("n_postings"),
            F.sum(F.length("ids") + F.length("tfs") + F.length("dls")).alias("packed_bytes"),
        ), "shard", "left")
    .join(packed.filter(is_doc).groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("doc_len").alias("total_doc_len")),
        "shard", "left")
)
lineage.write.mode("append").parquet(seg_dir + "/lineage")
t = tick("lineage", t)

n_lists = postings_out.count()
shutil.rmtree(seg_dir, ignore_errors=True)
total = sum(phases.values()) - phases["count_input"]
print("PROFILE_RESULT " + json.dumps({{"cores": cores, "n_docs": n_docs,
                                      "n_lists": n_lists, "phases": phases,
                                      "build_total": round(total, 2),
                                      "steal_cores": round((steal() - st0)
                                          / 100.0 / max(total, 1), 2)}}))
spark.stop()
"""


def run_once(cores: int) -> dict:
    code = SNIPPET.format(repo=REPO, cores=cores)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("PROFILE_RESULT "):
            return json.loads(line[len("PROFILE_RESULT "):])
    raise RuntimeError(f"no result cores={cores}:\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replication", type=int, default=150)
    ap.add_argument("--cores", type=int, nargs="+", default=[8, 32])
    args = ap.parse_args()

    staged = os.environ.get("SCALING_STAGED_PAGES")
    if not staged:
        import tempfile
        staged = tempfile.mkdtemp(prefix="prof_pages_", dir="/dev/shm")
        stage_code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from search_suite_spark.session import get_spark\n"
            "from search_suite_spark.sources.corpus import pages_from_documents\n"
            "spark = get_spark(app='stage', cores=32)\n"
            f"pages_from_documents(spark, {args.sf_dir!r}, replication={args.replication})"
            f".repartition(64).write.mode('overwrite').parquet({staged!r} + '/pages')\n"
            "spark.stop()\n"
        )
        r = subprocess.run([sys.executable, "-c", stage_code],
                           capture_output=True, text=True, timeout=1800)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-3000:])
        os.environ["SCALING_STAGED_PAGES"] = staged
        print(f"staged at {staged}", file=sys.stderr, flush=True)

    for cores in args.cores:
        res = run_once(cores)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
