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
    """Every registry query must build and execute at the smoke SF.

    Collect ALL failures before asserting — a fail-fast loop hides every
    breakage behind the first one (round 2's rel_asof_join escaped notice
    exactly this way), and per-query parametrization would pay the
    SparkSession fixture + import cost once per query."""
    import __spark_entry__ as e

    failures: list[str] = []
    for name, fn in e.queries().items():
        try:
            df = fn(spark, "/root/testdata/sf0.001")
            assert df.columns, "no columns"
            df.limit(1).collect()  # plan executes
        except Exception as exc:  # noqa: BLE001 — collect, report all
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, f"{len(failures)} broken queries:\n" + "\n".join(failures)
