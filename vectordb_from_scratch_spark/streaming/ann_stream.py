"""Streaming SRP-index maintenance — the dynamic-index behavior the
batch build lacks (SURVEY.md §2.3 H4; reference HnswIndex::add,
src/hnsw/graph.rs:245-342, mutates the graph per insert).

Spark-first shape: each micro-batch hashes ONLY its own rows into
(tbl, bucket) assignments — cost ∝ batch size, never ∝ index size —
and APPENDS them to the index directory together with a monotone `seq`
and tombstone markers for deletes. Nothing existing is rewritten on the
hot path; writer and readers never contend.

Read-side resolution (read_srp_index) is last-writer-wins per id:
keep the bucket rows of the max-seq entry unless it is a tombstone.
compact_srp_index rewrites the directory to just the survivors — the
P3/WAL-truncate analog — so resolution cost doesn't grow forever.

At 100 TB the append target is a Delta/Iceberg table partitioned by
(tbl, bucket) with MERGE-based compaction; plain parquet appends keep
this container-friendly while the plan shapes are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ann import srp_index

__all__ = [
    "srp_index_stream_foreach_batch",
    "read_srp_index",
    "compact_srp_index",
]

# op codes in the log stream / index dir
_INSERT, _DELETE = "insert", "delete"


def srp_index_stream_foreach_batch(
    log_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "embedding",
):
    """Fold a streaming insert/delete log into an SRP index directory.

    `log_stream` schema: (seq long, op string, id long, embedding
    array<float/double>) — the same WAL shape log_stream.py folds into
    row state. Inserts are bucketed via the exact expression path
    (bit-identical to the batch srp_index / ann_knn_srp assignment, so
    stream-built and batch-built indexes are interchangeable); deletes
    append a tombstone row per id with tbl = -1 (no real table uses -1,
    so tombstones never collide with a probe's bucket join).

    Returns the writeStream builder (caller picks trigger/start).
    Delivery is AT-LEAST-ONCE: a batch retried after a failure between
    the parquet append and the checkpoint commit appends its rows again.
    The retries are byte-identical, so read_srp_index dedupes them away
    and the resolved index is still exactly-once; at cluster scale the
    append target would be a transactional table (Delta/Iceberg) and
    the dedupe unnecessary.
    """

    def fold(batch: DataFrame, batch_id: int) -> None:
        rows = batch.filter(F.col("op") != "checkpoint")
        # Within-batch last-writer-wins FIRST: two inserts of one id in
        # the same micro-batch would otherwise cross-join below (bucket
        # rows of every version x every seq) and the stale version would
        # survive read-time resolution forever.
        latest = (
            rows.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(F.col("seq").desc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        inserts = latest.filter(F.col("op") == _INSERT)
        deletes = latest.filter(F.col("op") == _DELETE)
        indexed = srp_index(
            inserts, dim=dim, nbits=nbits, n_tables=n_tables, seed=seed,
            id_col=id_col, vec_col=vec_col,
        ).join(inserts.select(F.col(id_col).alias("id"), "seq"), "id").select(
            "id", "vec", "tbl", "bucket", "seq", F.lit(_INSERT).alias("op")
        )
        tombs = deletes.select(
            F.col(id_col).alias("id"),
            F.lit(None).cast("array<double>").alias("vec"),
            F.lit(-1).cast("long").alias("tbl"),
            F.lit(-1).cast("long").alias("bucket"),
            "seq",
            F.lit(_DELETE).alias("op"),
        )
        indexed.unionByName(tombs).write.mode("append").parquet(index_dir)

    return (
        log_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )


def read_srp_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Resolve the append-only index dir to the live index table
    (id, vec, tbl, bucket): per id, the max-seq entry wins; tombstones
    drop the id. The final dropDuplicates also erases byte-identical
    rows left by at-least-once batch retries, so the resolved index is
    exactly-once even though the appends aren't. The shuffles carry
    only (id, seq, tbl, bucket) — the vec column rides along but is
    never compared."""
    raw = spark.read.parquet(index_dir)
    w = Window.partitionBy("id")
    return (
        raw.withColumn("__mx", F.max("seq").over(w))
        .filter((F.col("seq") == F.col("__mx")) & (F.col("op") == _INSERT))
        .dropDuplicates(["id", "tbl", "bucket"])
        .select("id", "vec", "tbl", "bucket")
    )


def compact_srp_index(spark: SparkSession, index_dir: str) -> None:
    """Rewrite the index dir to only the live rows (WAL-truncate / P3
    analog): temp-write + rename so the rewrite never reads its own
    half-deleted output; seq reset to 0 so future appends keep
    winning."""
    from ..sources.persistence import overwrite_via_rename

    live = read_srp_index(spark, index_dir).select(
        "id", "vec", "tbl", "bucket",
        F.lit(0).cast("long").alias("seq"), F.lit(_INSERT).alias("op"),
    )
    overwrite_via_rename(live, index_dir)
