"""spark-submit entry point: BM25 top-k query over a packed segment or a
collection of segments.

    spark-submit --py-files dist/search_suite_spark.zip \
        jobs/query_job.py --seg-dir <dir> --query "merge join" [-k 10]
    spark-submit ... jobs/query_job.py --collection <dir> --query "..."
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--seg-dir")
    src.add_argument("--collection")
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", "--max-results", type=int, default=10)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("search_suite_query").getOrCreate()

    from search_suite_spark.session import apply_engine_conf

    apply_engine_conf(spark)

    from search_suite_spark.operators.wand import wand_scored
    from search_suite_spark.sources.registry import load_collection, query_collection
    from search_suite_spark.sources.segments import read_segment

    if args.seg_dir:
        seg = read_segment(spark, args.seg_dir)
        out = wand_scored(seg, args.query, max_results=args.max_results)
    else:
        segs = load_collection(spark, args.collection)
        out = query_collection(segs, args.query, max_results=args.max_results)
    for r in out.collect():
        print(f"{r['score']:.6f}\t{r['url']}")
    spark.stop()


if __name__ == "__main__":
    main()
