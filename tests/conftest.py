from __future__ import annotations

import pytest

from graph_database_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("gdp-tests", cpus=16, shuffle_partitions=16)
    yield spark
