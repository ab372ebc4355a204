from search_suite_spark.functions.normalise import (
    normalise,
    tokenize_series,
    tokenize_udf,
)

__all__ = ["normalise", "tokenize_series", "tokenize_udf"]
