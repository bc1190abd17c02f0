"""Streaming running counts + heavy hitters: maintain per-key counts
across micro-batches and serve the current top-k at any moment — the
ingest-path twin of operators/metrics.heavy_hitters (the reference has
no streaming surface; SURVEY.md §2.6).

Design: each micro-batch writes ONLY its own per-key partial counts,
as a dynamic partition overwrite keyed by batch_id — the same
exactly-once foreachBatch pattern as dedup_stream, but with NO state
read in the merge at all: a replayed batch recomputes the same partial
and overwrites its own partition, so the merge is idempotent by
construction and batches never contend. Reading the total is a
sum-partial aggregate over the partials — Spark's map-side combine
shape flipped into storage.

Scale: per-batch state grows by |distinct keys in batch| rows, never
raw row count; the read-side merge is one hash aggregate over
(keys × batches) partial rows. When history accrues, compact_counts
folds all partials into a single baseline partition (batch_id = -1)
the same way the WAL checkpoint folds the insert log
(sources/persistence.py) — after compaction the read scans
|distinct keys| + |keys since compaction| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import cache
from .dedup_stream import _dir_exists

__all__ = [
    "counts_stream_foreach_batch",
    "read_counts",
    "read_top_hitters",
    "compact_counts",
]

# the compaction baseline partition; real micro-batch ids are >= 0
_BASELINE_BATCH = -1


def counts_stream_foreach_batch(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
):
    """Wire a stream into a running per-key count state. Returns the
    unstarted writeStream (availableNow trigger), same contract as
    dedup_stream_foreach_batch."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        (
            batch.groupBy(F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
            # one small file per batch: partials are key-cardinality rows
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_counts(
    spark: SparkSession, state_dir: str, key_type: str = "string"
) -> DataFrame:
    """Current total count per key (empty-safe): sum of all batch
    partials. ``key_type`` shapes the empty result before any batch."""
    if not _dir_exists(spark, state_dir):
        return spark.createDataFrame([], f"key {key_type}, cnt long")
    return (
        spark.read.parquet(state_dir)
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_top_hitters(
    spark: SparkSession, state_dir: str, k: int = 10, key_type: str = "string"
) -> DataFrame:
    """Top-k keys by running count, (cnt desc, key asc) determinism —
    the serving read of the streaming heavy-hitter pipeline."""
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        read_counts(spark, state_dir, key_type=key_type)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def compact_counts(spark: SparkSession, state_dir: str) -> None:
    """Fold every batch partial into the baseline partition and drop the
    per-batch history. Run only after a CLEAN stream completion (an
    availableNow run that drained): a crash-dangling partial whose batch
    never committed to the checkpoint would be folded into the baseline
    here and then re-written on replay — double-counting that one batch.
    The read side (spark.read of the directory we are about to
    overwrite) is materialized via localCheckpoint before the write —
    never overwrite a path a lazy plan still scans."""
    totals = (
        spark.read.parquet(state_dir)
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(_BASELINE_BATCH))
        .coalesce(1)
        # static overwrite replaces ALL partitions with the baseline
        .transform(cache.checkpoint)
    )
    (
        totals.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
