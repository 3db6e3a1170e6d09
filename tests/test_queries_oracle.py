"""Every declared query in the registry must match its DuckDB oracle at
sf0.001 (fast); the driver re-checks at sf0.01."""

from __future__ import annotations

import pytest

from pointdatabase_spark import queries as registry
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connect


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.all_oracles()))
def test_query_matches_oracle(spark, duck, name):
    fn = registry.all_queries()[name]
    sql = registry.all_oracles()[name]
    compare(fn(spark, SF_SMOKE), duck, sql, name=name)


def test_all_queries_run(spark):
    for name, fn in registry.all_queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
