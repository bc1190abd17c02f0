"""SCD2 merge semantics (operators/scd.py).

The warehouse-history sibling of the reference's in-place upsert
(src/storage.rs:102-126 replaces the stored vector+metadata for an
existing id); SCD2 keeps every version with effective dating instead.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.scd import scd2_merge

D = datetime.date


@pytest.fixture(scope="module")
def frames(spark):
    cur = (
        spark.createDataFrame(
            [
                (1, "a", 10.0, "1995-01-01", None),
                (1, "a", 5.0, "1994-01-01", "1995-01-01"),  # closed history
                (2, "b", 20.0, "1995-01-01", None),
                (3, None, 30.0, "1995-01-01", None),  # NULL tracked value
            ],
            "k int, name string, bal double, effective_from string, effective_to string",
        )
        .withColumn("effective_from", F.col("effective_from").cast("date"))
        .withColumn("effective_to", F.col("effective_to").cast("date"))
    )
    upd = spark.createDataFrame(
        [
            (1, "a", 11.0),   # changed balance → close + append
            (2, "b", 20.0),   # identical re-send → no-op
            (3, None, 30.0),  # identical incl. NULL → no-op (NULL-safe diff)
            (4, "d", 40.0),   # brand-new key → insert open
        ],
        "k int, name string, bal double",
    )
    return cur, upd


def rows(df):
    return sorted(
        (r.k, r.name, r.bal, str(r.effective_from), str(r.effective_to))
        for r in df.collect()
    )


def test_scd2_merge_semantics(frames):
    cur, upd = frames
    out = scd2_merge(cur, upd, ["k"], ["name", "bal"], "1996-01-01")
    assert rows(out) == sorted(
        [
            (1, "a", 5.0, "1994-01-01", "1995-01-01"),   # history untouched
            (1, "a", 10.0, "1995-01-01", "1996-01-01"),  # closed at eff date
            (1, "a", 11.0, "1996-01-01", "None"),        # new open version
            (2, "b", 20.0, "1995-01-01", "None"),        # no-op: still open
            (3, None, 30.0, "1995-01-01", "None"),       # NULL-safe no-op
            (4, "d", 40.0, "1996-01-01", "None"),        # brand-new key
        ]
    )


def test_scd2_merge_idempotent_rerun(frames):
    """Re-applying the same batch to the merged result changes nothing:
    every update now matches its open version exactly."""
    cur, upd = frames
    once = scd2_merge(cur, upd, ["k"], ["name", "bal"], "1996-01-01")
    twice = scd2_merge(once, upd, ["k"], ["name", "bal"], "1997-01-01")
    assert rows(twice) == rows(once)


def test_scd2_merge_column_order_preserved(frames):
    cur, upd = frames
    out = scd2_merge(cur, upd, ["k"], ["name", "bal"], "1996-01-01")
    assert out.columns == cur.columns


def test_scd2_null_to_value_counts_as_change(spark):
    cur = (
        spark.createDataFrame(
            [(1, None, "1995-01-01", None)],
            "k int, name string, effective_from string, effective_to string",
        )
        .withColumn("effective_from", F.col("effective_from").cast("date"))
        .withColumn("effective_to", F.col("effective_to").cast("date"))
    )
    upd = spark.createDataFrame([(1, "x")], "k int, name string")
    out = scd2_merge(cur, upd, ["k"], ["name"], "1996-01-01")
    got = sorted(
        ((r.k, r.name, str(r.effective_to)) for r in out.collect()),
        key=lambda t: (t[0], t[1] or "", t[2]),
    )
    assert got == [(1, None, "1996-01-01"), (1, "x", "None")]


def test_scd2_merge_empty_tracked_raises(spark):
    """VERDICT r6 advice: an empty `tracked` must fail at entry with the
    real reason, not an IndexError from inside column construction."""
    cur = spark.createDataFrame(
        [(1, "x", None, None)], "k long, v string, effective_from date, effective_to date"
    )
    upd = spark.createDataFrame([(1, "y")], "k long, v string")
    with pytest.raises(ValueError, match="tracked must be non-empty"):
        scd2_merge(cur, upd, keys=["k"], tracked=[], effective_date="2026-01-01")
