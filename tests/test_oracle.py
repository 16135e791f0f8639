"""Every catalog query with an oracle must hash-match DuckDB at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from flink_ms_spark.plans.catalog import ORACLE_SQL, QUERIES
from tests.oracle_harness import compare


def _oracle_names():
    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    oracle = ORACLE_SQL[name]
    if callable(oracle):  # deferred oracle (fixture-derived constants)
        oracle = oracle()
    ok, msg = compare(df, oracle, sf_oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_runnable_smoke(spark, sf_smoke):
    """Queries without an oracle still must run and return a DataFrame."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
