import pytest

from mini_lakehouse_control_plane_executor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mini_lakehouse_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def lake(spark, tmp_path):
    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

    return LakehouseSession(spark, str(tmp_path))
