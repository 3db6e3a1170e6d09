from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale/timing tests")


@pytest.fixture(scope="session")
def spark():
    from pointdatabase_spark.session import get_spark
    s = get_spark("pointdatabase-tests", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8",
                              "spark.driver.memory": "8g",
                              "spark.ui.enabled": "false"})
    yield s
    s.stop()
