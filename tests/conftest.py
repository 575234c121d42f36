import pytest


@pytest.fixture(scope="session")
def spark():
    from tokencodec.spark.session import get_spark
    s = get_spark("tokencodec-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
