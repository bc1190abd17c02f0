"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (pandas merge_asof / DuckDB ASOF JOIN / kdb aj). For each left row,
pick the single most recent right row of the same key with
right_time <= left_time.

Not in the reference (it has no joins at all, SURVEY §2.6); this is the
"custom operator as composition" case from the build brief: implemented
as a UNION + windowed last-non-null sweep rather than a range join —

    union(tagged left, tagged right)
      → window over (key ORDER BY time, side):
          last non-null right-payload seen so far
      → keep left rows

Scale rationale: a naive inequality join explodes to O(left ×
right-per-key) intermediate rows and Spark would nested-loop it; the
union-sweep is ONE hash shuffle on the key plus a linear in-order pass
per partition — the hand-coded single-node algorithm, expressed
declaratively so Catalyst/Tungsten run it columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: append columns of the latest right row (same
    `on` key, right_time <= left_time), NULL when no such row exists.
    Right-side ties on time resolve to the largest payload tuple
    (deterministic)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]

    lrow = F.struct(*[F.col(c) for c in left.columns])
    rpay = F.struct(*[F.col(c) for c in right_cols])
    lrow_type = left.select(lrow.alias("s")).schema["s"].dataType
    rpay_type = right.select(rpay.alias("s")).schema["s"].dataType

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        lrow.alias("__lrow"),
        F.lit(None).cast(rpay_type).alias("__rpay"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        rpay.alias("__rpay"),
    )
    # Order: time asc; at equal time right rows (__is_left=0) sort first so
    # a right row AT the left timestamp is visible (<= semantics); payload
    # asc makes the surviving "last" row the max payload among time-ties.
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rpay").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = l_tagged.unionByName(r_tagged).withColumn(
        "__last_r", F.last("__rpay", ignorenulls=True).over(w)
    )
    return swept.filter(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__last_r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
