"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import pytest


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"query_id", "id", "distance", "rank"}


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_runs_at_smoke_sf(spark):
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(1).collect()  # plan executes
