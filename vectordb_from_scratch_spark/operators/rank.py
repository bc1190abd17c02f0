"""Distributed exact global ranking — the scale-safe replacement for
`row_number()/ntile()` over an unpartitioned Window (which Spark
executes as a SINGLE-partition sort: every row through one task, the
textbook scale-killer this module exists to remove).

Shape (the classic zipWithIndex-for-DataFrames construction):

1. `repartitionByRange` on the order keys — partition i's keys all
   precede partition i+1's, so global order = (partition id, local
   order). Boundary sampling only affects balance, never correctness.
2. per-partition `row_number` — a window PARTITIONED by
   `spark_partition_id()`, fully parallel.
3. per-partition counts → cumulative offsets. The counts table has one
   row per partition (thousands at most), so its cumulative-sum window
   is a single-partition window over a TINY table — bounded by the
   partition count, not the data.
4. broadcast the offsets back; global rank = offset + local row_number.

The partitioned frame is persisted (via the session cache registry)
before step 3 so the two downstream jobs — counts and the final join —
see the SAME physical partitioning; range-boundary sampling re-executed
per job could otherwise disagree.

Exactness: the order keys must form a strict total order (callers pass
a unique id as the final tiebreak, same determinism rule as every
top-k in this package). Given that, rank is value-exact — identical to
`row_number() OVER (ORDER BY ...)` — at any partition count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import cache

__all__ = ["with_global_rank", "exact_ntile_bucket"]


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append `rank_col` = exact global row_number over `order_cols`
    (which must include a unique tiebreak), without ever sorting the
    full table in one task. Returns the input columns + rank_col."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    base_cols = df.columns
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    wl = Window.partitionBy("__pid").orderBy(*order_cols)
    # Eager localCheckpoint, NOT persist: the counts job and the final
    # join MUST see the same physical partitioning, and both the range
    # boundaries (reservoir sampling) and spark_partition_id are
    # nondeterministic — so the partitioning must be materialized
    # exactly once. Spark's cache reuse is only best-effort here:
    # measured at 1M+ rows with a localCheckpoint'd input, the
    # offsets-side of the self-join was re-planned BELOW the
    # InMemoryRelation (DeduplicateRelations re-aliases the LogicalRDD)
    # and re-ran the range exchange with freshly sampled boundaries —
    # counts from one partitioning, rows from another, ~98% of ranks
    # wrong. Checkpoint blocks are reclaimed by the scoped sweep
    # (cache.sweep_persistent_rdds) like every other checkpoint.
    part = cache.checkpoint(part.withColumn("__local", F.row_number().over(wl)))
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # tiny table (one row per partition): its cumulative window is cheap
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).alias("__off")
    )
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__local")).cast("long"))
        .select(*base_cols, rank_col)
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact non-negative integer floor-division as a Column expression
    ((a - a%b)/b — the division is exact by construction, so the double
    round-trip cannot drift)."""
    return ((a - a % b) / b).cast("long")


def exact_ntile_bucket(rank: Column, total: Column, n_buckets: int) -> Column:
    """ntile(n) bucket number from a 1-based global rank and the total
    row count — the same split SQL ntile produces: with N rows, the
    first N % n buckets hold ceil(N/n) rows, the rest floor(N/n).
    All-integer arithmetic (exact; the guarded denominator is never
    selected when base would be 0, i.e. N < n)."""
    n = F.lit(int(n_buckets)).cast("long")
    k = rank.cast("long")
    tot = total.cast("long")
    base = _idiv(tot, n)
    rem = tot % n
    cut = rem * (base + F.lit(1))
    # ceil(a/b) for positive ints = (a + b - 1) div b
    in_big = _idiv(k + base, base + F.lit(1))
    safe_base = F.greatest(base, F.lit(1).cast("long"))
    in_small = rem + _idiv(k - cut + safe_base - F.lit(1), safe_base)
    return F.when(k <= cut, in_big).otherwise(in_small).cast("int")
