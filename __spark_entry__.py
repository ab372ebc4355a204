"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: build the inverted index over the sf0.001
                corpus and run a BM25 top-k query.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data pipeline ops); each (spark, sf_dir) -> DF.
oracle_sql()  — DuckDB-equivalent SQL per query, column-name & value
                aligned (floats rounded to 6 dp on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index the sf0.001 corpus, answer a scored AND query."""
    from search_suite_spark.entry_queries import _bm25

    return _bm25(spark, "/root/testdata/sf0.001", "spark merge", limit=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_suite_spark.entry_queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from search_suite_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
