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


def test_rag_ingest_self_match_invariant(spark):
    """Every probe chunk's rank-1 hit is itself at distance 0 — the
    ingestion pipeline sanity property (embedding + retrieval wired
    correctly end to end)."""
    import __spark_entry__ as e

    rows = e.queries()["pipeline_rag_ingest"](spark, "/root/testdata/sf0.001").collect()
    rank1 = [r for r in rows if r.rank == 1]
    assert rank1, "no rank-1 rows"
    for r in rank1:
        assert (r.qdoc, r.qchunk) == (r.doc_id, r.chunk_idx)
        assert r.distance == 0.0
