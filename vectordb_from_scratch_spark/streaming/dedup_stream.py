"""Streaming exact deduplication: drop documents whose normalized text
was already seen in any earlier micro-batch — the ingest-path twin of
`operators/dedup.exact_dedup` (the reference has no streaming surface;
its WAL is the nearest analog, SURVEY.md §2.6).

Semantics: FIRST occurrence wins, where "first" is (batch order, then
doc_id within a batch) — deterministic for a deterministic source, and
identical to batch `exact_dedup`'s min-id representative when ids arrive
in id order (asserted in tests/test_streaming_dedup.py).

Scale: the seen-state stores only (fingerprint, keep_id) — 16-byte md5
plus an id per DISTINCT document ever seen, never text. Each micro-batch
does one in-batch min-agg (batch-sized) and one left-anti join against
the state (state-side is a parquet scan keyed on the digest — at real
scale this becomes a bucketed/Delta table so the anti-join is a
co-located probe rather than a full scan; the plan shape is identical).
Survivors append to the OUTPUT sink; only new fingerprints append to the
state, so both grow by exactly the novel rows per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as X

__all__ = ["dedup_stream_foreach_batch", "read_deduped"]


def dedup_stream_foreach_batch(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire a document stream into (deduped output, fingerprint state).

    Returns the unstarted writeStream (availableNow trigger) so callers
    control .start()/.awaitTermination(), mirroring
    fold_stream_foreach_batch.
    """

    def merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        fp = batch.withColumn("__fp", X.fingerprint(text_col))
        # in-batch winner: min id per fingerprint (ties impossible — ids
        # are unique per doc), matching exact_dedup's representative rule
        w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
        firsts = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        try:
            seen = s.read.parquet(state_dir)
        except Exception:  # first batch — no state yet
            seen = None
        if seen is not None:
            novel = firsts.join(
                seen.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
            )
        else:
            novel = firsts
        novel.persist()
        try:
            novel.drop("__fp").write.mode("append").parquet(out_dir)
            novel.select(
                F.col("__fp").alias("fp"), F.col(id_col).alias("keep_id")
            ).write.mode("append").parquet(state_dir)
        finally:
            novel.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_deduped(spark: SparkSession, out_dir: str) -> DataFrame:
    """The deduped corpus accumulated so far (empty-safe)."""
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        return spark.createDataFrame([], "doc_id long, text string")
