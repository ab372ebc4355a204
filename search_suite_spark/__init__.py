"""search_suite_spark — a from-scratch PySpark-native rebuild of the
capabilities of jahaynes/search-suite (inverted-index build + BM25 query
engine over Common-Crawl-style web pages), designed for a multi-executor
cluster at ~10^12-document scale and tested on local mode.

Architecture (Spark-first, NOT a port):
  - ``functions/``  tokenizer + scalar text functions (vectorized Arrow UDFs)
  - ``operators/``  index build, BM25/WAND query, merge, dedup, similarity
  - ``sources/``    page-corpus synthesis + segment (parquet/Iceberg) storage
  - ``plans/``      structured boolean query parsing & planning
  - ``streaming/``  incremental ingest via Structured Streaming

The reference semantics are documented per-module with file:line citations
into /root/reference (read-only).
"""

__version__ = "0.1.0"
