"""Insert-log fold / upsert / delete semantics — mirrors the reference's
WAL replay + upsert tests (src/persistence/engine.rs:259-391,
src/storage.rs:156-192; FIXTURES.md §1 insert_log)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import crud


@pytest.fixture(scope="module")
def log_df(spark):
    rows = [
        (1, "insert", "a", [1.0, 0.0], {"v": "1"}),
        (2, "insert", "b", [0.0, 1.0], {"v": "1"}),
        (3, "insert", "a", [2.0, 0.0], {"v": "2"}),   # upsert replaces seq 1
        (4, "checkpoint", None, None, None),
        (5, "delete", "b", None, None),               # tombstone
        (6, "insert", "c", [3.0, 3.0], {"v": "1"}),
        (7, "delete", "c", None, None),
        (8, "insert", "c", [4.0, 4.0], {"v": "3"}),   # re-insert after delete
    ]
    return spark.createDataFrame(rows, crud.LOG_SCHEMA)


def test_fold_last_writer_wins(log_df):
    state = {r.id: r for r in crud.fold_insert_log(log_df).collect()}
    assert set(state) == {"a", "c"}
    assert state["a"].embedding == [2.0, 0.0]
    assert state["a"].metadata == {"v": "2"}          # metadata kept (not ref's P9 bug)
    assert state["c"].embedding == [4.0, 4.0]


def test_upsert_replaces(spark):
    cur = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    upd = spark.createDataFrame([("b", 20), ("c", 30)], "id string, v int")
    got = {r.id: r.v for r in crud.upsert(cur, upd).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_delete_ids_antijoin(spark):
    cur = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "id string, v int")
    dele = spark.createDataFrame([("b",), ("zz",)], "id string")  # absent id = no-op
    got = {r.id for r in crud.delete_ids(cur, dele).collect()}
    assert got == {"a", "c"}


def test_validate_dimension(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [1.0, 2.0, 3.0])], "id string, embedding array<double>"
    )
    flags = {r["id"]: r["__dim_ok"] for r in crud.validate_dimension(df, dim=2).collect()}
    assert flags == {"a": True, "b": False}


def test_time_travel_versions(log_df):
    """Every requested as_of yields exactly the fold of the log prefix —
    the WAL-replay generalization (replay to seq T, not just to head)."""
    tt = crud.time_travel(log_df, [2, 5, 8])
    by_ver = {}
    for r in tt.collect():
        by_ver.setdefault(r.as_of, {})[r.id] = r
    # as_of=2: both initial inserts visible, no upsert yet
    assert set(by_ver[2]) == {"a", "b"}
    assert by_ver[2]["a"].embedding == [1.0, 0.0]
    # as_of=5: a upserted (seq 3), b tombstoned (seq 5)
    assert set(by_ver[5]) == {"a"}
    assert by_ver[5]["a"].embedding == [2.0, 0.0]
    # as_of=8 (head): identical to fold_insert_log
    head = {r.id: r.embedding for r in crud.fold_insert_log(log_df).collect()}
    assert {r: v.embedding for r, v in by_ver[8].items()} == head


def test_time_travel_checkpoint_entries_ignored(log_df):
    # an as_of landing ON a checkpoint marker sees the state just before it
    tt = {r.id: r for r in crud.time_travel(log_df, [4]).collect()}
    assert set(tt) == {"a", "b"}
    assert tt["a"].metadata == {"v": "2"}
