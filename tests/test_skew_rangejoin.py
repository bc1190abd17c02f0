"""Salted-join equivalence and range-join semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.rangejoin import range_join
from vectordb_from_scratch_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key — the shape that melts a plain hash join
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("HOT", 1), ("k0", 2), ("k3", 3), ("missing", 9)], "k string, dim int"
    )
    return big, small


def test_salted_join_matches_plain_inner(skewed):
    big, small = skewed
    plain = {(r.k, r.payload, r.dim) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.payload, r.dim) for r in salted_join(big, small, on="k", salt=8).collect()}
    assert salted == plain and len(plain) > 0


def test_salted_join_matches_plain_left(skewed):
    big, small = skewed
    plain = {(r.k, r.payload, r.dim) for r in big.join(small, "k", "left").collect()}
    salted = {
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, on="k", salt=8, how="left").collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    salts = (
        big.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("payload").cast("string")), F.lit(8)),
        )
        .filter(F.col("k") == "HOT")
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key occupies all 8 salt partitions


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_range_join_matches_naive(spark):
    facts = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 00:00:00")),  # == lo boundary (inclusive)
            (2, "u1", _ts("2024-01-03 12:00:00")),  # inside, spans bucket boundary
            (3, "u1", _ts("2024-01-05 00:00:00")),  # == hi boundary (inclusive)
            (4, "u1", _ts("2024-01-05 00:00:01")),  # just outside
            (5, "u2", _ts("2024-01-02 00:00:00")),  # other key, no interval
        ],
        "fid long, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u1", _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00"), "w1")],
        "user string, lo timestamp, hi timestamp, label string",
    )
    got = {
        (r.fid, r.label)
        for r in range_join(facts, intervals, on="user", time_col="ts",
                            lo_col="lo", hi_col="hi", bucket_seconds=86400).collect()
    }
    naive = {
        (r.fid, r.label)
        for r in facts.join(
            intervals,
            (facts.user == intervals.user) & (facts.ts >= intervals.lo) & (facts.ts <= intervals.hi),
        ).collect()
    }
    assert got == naive == {(1, "w1"), (2, "w1"), (3, "w1")}


def test_range_join_overlapping_intervals_fan_out(spark):
    facts = spark.createDataFrame(
        [(1, "u", _ts("2024-01-02 06:00:00"))], "fid long, user string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"), "a"),
            ("u", _ts("2024-01-02 00:00:00"), _ts("2024-01-02 12:00:00"), "b"),
        ],
        "user string, lo timestamp, hi timestamp, label string",
    )
    got = sorted(
        r.label
        for r in range_join(facts, intervals, on="user", time_col="ts",
                            lo_col="lo", hi_col="hi").collect()
    )
    assert got == ["a", "b"]  # overlapping intervals both match (fan-out is correct)


def test_range_join_property_vs_naive(spark):
    """Randomized equivalence: bucketized range join ≡ naive inequality join
    over many interval shapes (spanning, contained, empty, boundary)."""
    import random

    rnd = random.Random(7)
    facts_rows, ival_rows = [], []
    for i in range(60):
        facts_rows.append((i, f"u{rnd.randint(0, 4)}", _ts("2024-01-01 00:00:00")
                           + datetime.timedelta(minutes=rnd.randint(0, 14_400))))
    for j in range(25):
        lo = _ts("2024-01-01 00:00:00") + datetime.timedelta(minutes=rnd.randint(0, 14_000))
        hi = lo + datetime.timedelta(minutes=rnd.randint(0, 4000))
        ival_rows.append((f"u{rnd.randint(0, 4)}", lo, hi, f"w{j}"))
    facts = spark.createDataFrame(facts_rows, "fid long, user string, ts timestamp")
    ivals = spark.createDataFrame(ival_rows, "user string, lo timestamp, hi timestamp, label string")
    got = {
        (r.fid, r.label)
        for r in range_join(facts, ivals, on="user", time_col="ts",
                            lo_col="lo", hi_col="hi", bucket_seconds=3600).collect()
    }
    naive = {
        (r.fid, r.label)
        for r in facts.join(
            ivals,
            (facts.user == ivals.user) & (facts.ts >= ivals.lo) & (facts.ts <= ivals.hi),
        ).collect()
    }
    assert got == naive and len(naive) > 0


def test_salted_join_null_discriminator_rows_survive(spark):
    # a NULL discriminator used to yield a NULL salt → inner join dropped
    # the row even though its key matched (ADVICE r1)
    big = spark.createDataFrame(
        [("HOT", None), ("HOT", 7), ("k0", None)], "k string, payload int"
    )
    small = spark.createDataFrame([("HOT", 1), ("k0", 2)], "k string, dim int")
    plain = {(r.k, r.payload, r.dim) for r in big.join(small, "k").collect()}
    salted = {
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, on="k", salt=4, discriminator="payload").collect()
    }
    assert salted == plain and len(plain) == 3
