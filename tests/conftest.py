import pytest


@pytest.fixture(scope="session")
def spark():
    from biblib_spark.session import get_spark

    s = get_spark("biblib_spark_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
