import pytest

from adtl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adtl_spark_tests", cpus=8)
    yield s
