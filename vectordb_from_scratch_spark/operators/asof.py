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
    direction: str = "backward",
) -> DataFrame:
    """For each left row: append columns of the matched right row (same
    `on` key), NULL when no match exists. `direction` follows pandas
    merge_asof:

      "backward" — latest right row with right_time <= left_time
      "forward"  — earliest right row with right_time >= left_time
      "nearest"  — whichever of the two is closer in time; exact-distance
                   ties resolve BACKWARD (the pandas convention)

    Right-side ties on time resolve to the largest payload tuple
    (deterministic). Each direction is one union + one windowed sweep on
    the same (key, time)-sorted axis; "nearest" runs both sweeps over one
    shuffle's worth of data and picks per row — never an inequality join.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")

    lrow = F.struct(*[F.col(c) for c in left.columns])
    # right_time rides INSIDE the payload (field __rt) so "nearest" can
    # compare distances; it is equal among time-ties, so struct ordering
    # falls through to the user payload and tie-breaks are unchanged
    rpay = F.struct(
        F.col(right_time).alias("__rt"), *[F.col(c) for c in right_cols]
    )
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
    both = l_tagged.unionByName(r_tagged)

    # Backward order: time asc; at equal time right rows (__is_left=0)
    # sort first so a right row AT the left timestamp is visible (<=
    # semantics); payload asc makes the surviving "last" row the max
    # payload among time-ties. Forward is the mirror image: time desc,
    # right still first at equal time (>= semantics).
    w_back = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rpay").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc(), F.col("__rpay").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction == "backward":
        swept = both.withColumn("__r", F.last("__rpay", ignorenulls=True).over(w_back))
    elif direction == "forward":
        swept = both.withColumn("__r", F.last("__rpay", ignorenulls=True).over(w_fwd))
    else:
        b = F.last("__rpay", ignorenulls=True).over(w_back)
        f = F.last("__rpay", ignorenulls=True).over(w_fwd)
        swept = both.withColumn("__b", b).withColumn("__f", f).withColumn(
            "__r",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            # backward wins ties: <= keeps __b when distances are equal
            .when(
                (F.col("__t") - F.col("__b.__rt"))
                <= (F.col("__f.__rt") - F.col("__t")),
                F.col("__b"),
            )
            .otherwise(F.col("__f")),
        )
    return swept.filter(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
