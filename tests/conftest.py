import os

import pytest

from open_bus_siri_etl_spark.session import get_spark
from open_bus_siri_etl_spark.sources.tables import Warehouse


def pytest_collection_modifyitems(config, items):
    """r15 (verdict item 3): the full suite outgrew the driver's verify
    window (~80 min; VERIFY_r14 truncated at ~61% with zero failures),
    so @pytest.mark.slow tests are SKIPPED by default — the default
    collection is the <20-minute fast set the driver can finish.  The
    full suite stays in the builder close ritual:
    SPARK_GRAFT_FULL_TESTS=1 runs everything, and an explicit -m
    expression (e.g. -m slow) takes normal precedence."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow set: run with SPARK_GRAFT_FULL_TESTS=1 or -m slow"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="siri-etl-tests", shuffle_partitions=8)
    yield s


@pytest.fixture
def warehouse(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))
