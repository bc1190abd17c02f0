"""Streaming SCD2 dimension maintenance — foreachBatch over scd2_merge.

The batch operator (operators/scd.py) turns one update batch into a new
dimension version-set; this module keeps an effective-dated dimension
CONTINUOUSLY up to date from an update stream: each micro-batch reduces
to its last update per business key, merges SCD2-style against the
stored dimension, and lands atomically (temp-write + rename — the same
pattern as log_stream's WAL fold).

Replay safety comes from the merge semantics themselves, not from sink
bookkeeping: an update identical to the open version is a no-op, so a
micro-batch re-delivered after a crash merges to the identical
dimension (asserted in tests). This is the property Structured
Streaming's checkpoint+foreachBatch contract needs from its sink.

At 100 TB the stored dimension becomes a Delta/Iceberg MERGE target and
the per-batch collect of the effective date disappears into the batch
metadata; the plan shape — latest-per-key window, one full-outer join
against open versions, map-side history union — is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.scd import scd2_merge

__all__ = ["scd2_stream_foreach_batch"]


def scd2_stream_foreach_batch(
    update_stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_col: str,
    eff_col: str = "effective_from",
    end_col: str = "effective_to",
):
    """Maintain an SCD2 dimension at `dim_dir` from an update stream.

    `update_stream` rows carry key cols + tracked cols + `order_col`
    (an event timestamp: orders updates within a batch AND supplies the
    batch's effective date as its max date). Returns an unstarted
    writeStream (availableNow trigger); call `.start()`.

    First batch bootstraps the dimension: every key becomes an open
    version effective at the batch date.
    """
    keys = list(keys)
    tracked = list(tracked)

    def merge(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        s = batch.sparkSession
        # last update per key within the batch (ties broken stably by the
        # tracked values so replays are deterministic)
        latest = (
            batch.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(*keys).orderBy(
                        F.col(order_col).desc(), *[F.col(c) for c in tracked]
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
            .select(*keys, *tracked, order_col)
        )
        # one tiny driver-side row: the batch's effective date
        eff = latest.agg(
            F.max(F.col(order_col).cast("date")).alias("d")
        ).collect()[0]["d"]
        upd = latest.drop(order_col)
        try:
            dim = s.read.parquet(dim_dir)
        except Exception:  # first batch — bootstrap an empty dimension
            dim = (
                upd.withColumn(eff_col, F.lit(None).cast("date"))
                .withColumn(end_col, F.lit(None).cast("date"))
                .limit(0)
            )
        new_dim = scd2_merge(
            dim, upd, keys=keys, tracked=tracked, effective_date=eff,
            eff_col=eff_col, end_col=end_col,
        )
        from ..sources.persistence import overwrite_via_rename

        overwrite_via_rename(new_dim, dim_dir)

    return (
        update_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
