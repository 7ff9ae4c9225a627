from __future__ import annotations

import pytest

from data_warehouse_solution_spark.session import EngineConfig, build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(EngineConfig(app_name="dws-tests", driver_memory="8g"))
    yield spark
    spark.stop()
