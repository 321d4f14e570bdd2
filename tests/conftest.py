import pytest


@pytest.fixture(scope="session")
def spark():
    from readability_spark.pipeline import build_session
    s = build_session("readability-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
