import pytest


@pytest.fixture(scope="session")
def spark():
    from search_suite_spark.session import get_spark

    s = get_spark(app="search_suite_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
