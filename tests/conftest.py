import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from search_suite_spark.session import get_spark

    s = get_spark(app="search_suite_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session", autouse=True)
def _session_segment_io():
    """SEARCH_SUITE_SEGMENT_IO=manifest runs the WHOLE suite against the
    manifest-file storage backend (the second SegmentIO impl) — the seam
    proof is `pytest` green under both values. Default: parquet."""
    from search_suite_spark.sources import segment_io as sio

    name = os.environ.get("SEARCH_SUITE_SEGMENT_IO")
    if not name:
        yield
        return
    old = sio.set_current_io(sio.make_io(name))
    yield
    sio.set_current_io(old)


@pytest.fixture(params=["parquet", "manifest"])
def seg_io(request):
    """Per-test parametrization over every concrete SegmentIO impl —
    storage-lifecycle tests take this to prove the seam is real (the
    same engine code must pass against both physical layouts)."""
    from search_suite_spark.sources import segment_io as sio

    io = sio.make_io(request.param)
    old = sio.set_current_io(io)
    yield io
    sio.set_current_io(old)


def require_parquet_layout():
    """Skip guard for tests that poke the parquet directory layout
    directly (shard= dirs, raw lineage path) instead of going through
    the SegmentIO seam."""
    from search_suite_spark.sources import segment_io as sio

    if not isinstance(sio.current_io(), sio.ParquetSegmentIO):
        pytest.skip("test inspects the parquet physical layout directly")
