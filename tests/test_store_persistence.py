"""API-parity tests for the VectorStore facade (reference storage.rs
surface) and persistence semantics (snapshot/recover/compact, P4-P6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import crud
from vectordb_from_scratch_spark.operators.store import (
    DimensionMismatch,
    VectorNotFound,
    VectorStore,
)
from vectordb_from_scratch_spark.sources import persistence as P


@pytest.fixture()
def store(spark):
    s = VectorStore.empty(spark)
    return s.insert_batch(
        [
            ("sunset", [1.0, 0.0, 0.0], {"color": "red", "category": "nature"}),
            ("ocean", [0.0, 1.0, 0.0], {"color": "blue", "category": "nature"}),
            ("fire-truck", [0.9, 0.1, 0.0], {"color": "red", "category": "vehicle"}),
        ]
    )


def test_insert_get_len(store):
    assert len(store) == 3
    assert store.get("sunset") == [1.0, 0.0, 0.0]
    assert store.get_metadata("ocean") == {"color": "blue", "category": "nature"}
    assert store.get("nope") is None
    assert sorted(store.list_ids()) == ["fire-truck", "ocean", "sunset"]


def test_upsert_replaces(store):
    s2 = store.insert("sunset", [0.5, 0.5, 0.0], {"color": "orange"})
    assert len(s2) == 3
    assert s2.get("sunset") == [0.5, 0.5, 0.0]
    assert s2.get_metadata("sunset") == {"color": "orange"}


def test_delete_and_not_found(store):
    s2 = store.delete("ocean")
    assert len(s2) == 2 and s2.get("ocean") is None
    with pytest.raises(VectorNotFound):
        s2.delete("ocean")


def test_dimension_enforced(store):
    with pytest.raises(DimensionMismatch):
        store.insert("bad", [1.0, 2.0])
    with pytest.raises(DimensionMismatch):
        store.search([1.0, 2.0], k=1)


def test_search_self_top1(store):
    res = store.search([1.0, 0.0, 0.0], k=2)
    assert res[0][0] == "sunset" and abs(res[0][1]) < 1e-12
    assert res[1][0] == "fire-truck"


def test_search_batch_per_query_k(store):
    res = store.search_batch([([1.0, 0.0, 0.0], 1), ([0.0, 1.0, 0.0], 3)])
    assert [r[0] for r in res[0]] == ["sunset"]
    assert len(res[1]) == 3 and res[1][0][0] == "ocean"


def test_search_with_filter(store):
    res = store.search_with_filter(
        [1.0, 0.0, 0.0], k=5, filter_spec={"eq": {"field": "category", "value": "vehicle"}}
    )
    assert [r[0] for r in res] == ["fire-truck"]  # exactly the matching rows


# -- persistence ------------------------------------------------------------


def test_snapshot_recover_compact(spark, tmp_path):
    state = spark.createDataFrame(
        [
            ("a", [1.0, 2.0], {"v": "1"}),
            ("b", [3.0, 4.0], {"v": "1"}),
        ],
        "id string, embedding array<double>, metadata map<string,string>",
    )
    snap1 = str(tmp_path / "snap1")
    manifest = P.write_snapshot(state, snap1)
    assert manifest == {"vector_count": 2, "dimension": 2, "format": "parquet"}
    assert P.read_manifest(snap1)["vector_count"] == 2

    tail = spark.createDataFrame(
        [
            (10, "insert", "a", [9.0, 9.0], {"v": "2"}),   # supersedes snapshot row
            (11, "delete", "b", None, None),               # tombstone drops snapshot row
            (12, "insert", "c", [5.0, 6.0], {"v": "1"}),   # new row
        ],
        crud.LOG_SCHEMA,
    )
    recovered = {r.id: r for r in P.recover(spark, snap1, tail.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )).collect()}
    assert set(recovered) == {"a", "c"}
    assert recovered["a"].embedding == [9.0, 9.0]
    assert recovered["a"].metadata == {"v": "2"}  # metadata survives (not ref bug P9)

    snap2 = str(tmp_path / "snap2")
    m2 = P.compact(spark, snap1, tail.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ), snap2)
    assert m2["vector_count"] == 2
    after = {r.id for r in P.read_snapshot(spark, snap2).collect()}
    assert after == {"a", "c"}


def test_recover_as_of_point_in_time(spark, tmp_path):
    """Point-in-time recovery: replay the tail only through `as_of`, and
    refuse a snapshot that already folds past the requested point."""
    state = spark.createDataFrame(
        [("a", [1.0, 2.0], {"v": "1"}), ("b", [3.0, 4.0], {"v": "1"})],
        "id string, embedding array<double>, metadata map<string,string>",
    )
    snap1 = str(tmp_path / "pit_snap1")
    m = P.write_snapshot(state, snap1, log_seq=9)
    assert m["log_seq"] == 9

    tail = spark.createDataFrame(
        [
            (10, "insert", "a", [9.0, 9.0], {"v": "2"}),
            (11, "delete", "b", None, None),
            (12, "insert", "c", [5.0, 6.0], {"v": "1"}),
        ],
        crud.LOG_SCHEMA,
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))

    # as_of=10: a's upsert applied, b's delete and c's insert not yet
    at10 = {r.id: r for r in P.recover(spark, snap1, tail, as_of=10).collect()}
    assert set(at10) == {"a", "b"}
    assert at10["a"].embedding == [9.0, 9.0]
    # as_of=11: b now tombstoned
    assert {r.id for r in P.recover(spark, snap1, tail, as_of=11).collect()} == {"a"}
    # as_of at the head == plain recover
    head = {r.id for r in P.recover(spark, snap1, tail).collect()}
    assert {r.id for r in P.recover(spark, snap1, tail, as_of=12).collect()} == head

    # compact records the folded-through position; recovering BEFORE it fails loudly
    snap2 = str(tmp_path / "pit_snap2")
    m2 = P.compact(spark, snap1, tail, snap2)
    assert m2["log_seq"] == 12
    with pytest.raises(ValueError, match="folds the log through"):
        P.recover(spark, snap2, None, as_of=10)
