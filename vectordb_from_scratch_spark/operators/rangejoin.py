"""Range (interval) join — match fact rows to intervals containing them.
Like the as-of join, a time-series operator Spark has no native form for
(the brief's "range join" custom-operator case).

Naive form `fact JOIN intervals ON key = key AND ts BETWEEN lo AND hi`
is an equi+inequality join: Spark executes it as a hash join on `key`
followed by a per-key filter — fine when per-key interval counts are
small, catastrophic when one key holds thousands of intervals (the
filter degenerates to per-key cartesian).

The scalable form BUCKETIZES time: each interval explodes into the
coarse time buckets it spans, the join becomes pure equi-join on
(key, bucket) — hash-partitionable, skew-manageable — and an exact
range filter removes bucket-boundary false positives. Bucket width
trades replication (wide intervals → more bucket rows) against join
selectivity; pick ≈ median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    on: str,
    time_col: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join facts to intervals of the same `on` key with
    lo <= time <= hi (inclusive both ends). Output: fact columns +
    interval columns (minus the duplicated key)."""
    us = bucket_seconds * 1_000_000
    f_b = facts.withColumn(
        "__bucket", (F.unix_micros(F.col(time_col).cast("timestamp")) / us).cast("long")
    )
    i_exp = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(lo_col).cast("timestamp")) / us).cast("long"),
                (F.unix_micros(F.col(hi_col).cast("timestamp")) / us).cast("long"),
            )
        ),
    )
    ival_cols = [c for c in intervals.columns if c != on]
    joined = f_b.join(i_exp, on=[on, "__bucket"]).filter(
        (F.col(time_col) >= F.col(lo_col)) & (F.col(time_col) <= F.col(hi_col))
    )
    return joined.select(*[F.col(c) for c in facts.columns], *[F.col(c) for c in ival_cols])
