"""spark-submit entry point: build (or resume) a packed index segment.

    spark-submit --py-files dist/search_suite_spark.zip \
        jobs/build_index_job.py \
        --pages-parquet <path-or-table> --seg-dir <out-dir> \
        [--n-shards 256] [--shards-per-batch 32] [--no-dedupe]

Resumable by construction: re-submitting the same command after an
interruption skips shards already recorded in <seg-dir>/lineage
(north_rule: per-partition lineage + resume without recompute).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-parquet", help="parquet path of the pages table")
    src.add_argument("--pages-table", help="catalog (e.g. Iceberg) table name")
    ap.add_argument("--seg-dir", required=True)
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument("--shards-per-batch", type=int, default=32)
    ap.add_argument("--n-tbuckets", type=int, default=64)
    ap.add_argument("--no-dedupe", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("search_suite_build").getOrCreate()

    from search_suite_spark.session import apply_engine_conf
    from search_suite_spark.sources.segments import build_segment

    apply_engine_conf(spark)

    pages = (
        spark.read.parquet(args.pages_parquet)
        if args.pages_parquet
        else spark.read.table(args.pages_table)
    )
    seg = build_segment(
        pages,
        args.seg_dir,
        n_shards=args.n_shards,
        shards_per_batch=args.shards_per_batch,
        n_tbuckets=args.n_tbuckets,
        resume=True,
        dedupe=not args.no_dedupe,
    )
    print(
        f"segment ready: {seg.path} num_docs={seg.num_docs} "
        f"total_doc_len={seg.total_doc_len}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
