import pytest

from mysql_cdc_debezium_starrocks_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s
