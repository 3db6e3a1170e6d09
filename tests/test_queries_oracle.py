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


def test_int_float_oracle_drift_fails(spark, duck):
    """Driver-grade dtype strictness: a bare SUM over an int column makes
    DuckDB return HUGEINT (rendered float in pandas) while Spark returns
    BIGINT — identical values, different driver hash. The local compare
    must reject that, so the r4 `dedup_clean_corpus` bug class can't ship
    on green pytest again."""
    got = spark.sql("SELECT 'en' AS lang, CAST(18342 AS BIGINT) AS n_chars")
    drifted = "SELECT 'en' AS lang, SUM(x) AS n_chars FROM (SELECT 18342::BIGINT AS x)"
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        compare(got, duck, drifted, name="induced_drift")
    # and the CAST pattern fixes it
    fixed = ("SELECT 'en' AS lang, CAST(SUM(x) AS BIGINT) AS n_chars "
             "FROM (SELECT 18342::BIGINT AS x)")
    compare(got, duck, fixed, name="induced_drift_fixed")


def test_all_queries_run(spark):
    # Non-fatal per query: one broken query must report as ONE failure
    # with the full list, not truncate the sweep (r3 driver-abort mode).
    failures: list[str] = []
    for name, fn in registry.all_queries().items():
        try:
            df = fn(spark, SF_SMOKE)
            assert df.count() >= 0
        except Exception as exc:  # noqa: BLE001 — collect, assert at end
            first = str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__
            failures.append(f"{name}: {first}")
    assert not failures, "\n".join(failures)
