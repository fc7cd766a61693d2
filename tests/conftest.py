import pytest

from open_bus_siri_etl_spark.session import get_spark
from open_bus_siri_etl_spark.sources.tables import Warehouse


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="siri-etl-tests", shuffle_partitions=8)
    yield s


@pytest.fixture
def warehouse(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))
