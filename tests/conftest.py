import pytest

from goldenretriever_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gr-tests", cores=8, shuffle_partitions=8)
    yield s
