import pytest


@pytest.fixture(scope="session")
def spark():
    from xagg_spark.session import get_spark
    s = get_spark("xagg_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
