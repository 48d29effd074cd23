import pytest


@pytest.fixture(scope="session")
def spark():
    from tsmp_spark.session import get_spark

    s = get_spark(app_name="tsmp_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
