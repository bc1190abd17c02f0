"""Persistence semantics — the Spark-native form of the reference's
WAL + snapshot + recovery engine (SURVEY.md §2.4 P1–P9,
src/persistence/{wal,snapshot,engine}.rs):

- snapshot  = partitioned parquet write + JSON manifest (P4; the
  manifest mirrors the reference's human-readable snapshot.json with
  vector_count/dimension, snapshot.rs:36-43)
- log tail  = any ordered insert/delete DataFrame (the WAL, P1-P2;
  parquet's commit protocol replaces CRC framing + fsync)
- recover   = read snapshot ∪ fold tail on top (P5, engine.rs:44-73)
- compact   = fold snapshot+tail into a new snapshot and start an empty
  tail (P3/P6 checkpoint, engine.rs:187-204 — interval policy is the
  caller's; at scale this is the periodic compaction job)

Metadata IS persisted — the reference drops it on checkpoint
(engine.rs:224, bug P9); we deliberately do not replicate that.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.crud import fold_insert_log

__all__ = [
    "write_snapshot",
    "read_snapshot",
    "recover",
    "compact",
    "overwrite_via_rename",
]

MANIFEST = "manifest.json"


def overwrite_via_rename(df: DataFrame, target_dir: str) -> None:
    """Durably overwrite a directory that `df`'s own lazy plan reads.

    cache()+count() before an in-place overwrite is NOT a durable guard:
    an evicted or lost cached block recomputes from the half-deleted
    source. Writing to a sibling temp dir and renaming never has the
    source and destination overlap; the final swap is two local-FS
    renames (on an object store this is the transactional-table-format
    job — Delta/Iceberg replace — which this helper stands in for)."""
    tmp = f"{target_dir}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{target_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, target_dir)


def write_snapshot(
    state: DataFrame, path: str, vec_col: str = "embedding",
    partition_by: str | None = None, log_seq: int | None = None,
) -> dict:
    """Write current state as a parquet snapshot + manifest.

    `partition_by`: optional partition column (e.g. a shard key =
    substr(md5(id),1,2)) so recovery and point lookups prune partitions —
    at 100 TB a monolithic snapshot directory is unmanageable; a
    256-shard layout bounds per-task recovery reads.

    `log_seq`: the log position this state is a fold of, recorded in the
    manifest (enables `recover(as_of=...)` validation)."""
    writer = state.write.mode("overwrite")
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.parquet(os.path.join(path, "data"))
    spark = state.sparkSession
    written = spark.read.parquet(os.path.join(path, "data"))
    dim_row = written.select(F.size(F.col(vec_col)).alias("d")).first()
    manifest = {
        "vector_count": written.count(),
        "dimension": (dim_row.d if dim_row else None),
        "format": "parquet",
    }
    if log_seq is not None:
        # high-water log position this snapshot folds up to — what lets
        # recover(as_of=...) tell whether the snapshot is usable as the
        # base of a point-in-time reconstruction
        manifest["log_seq"] = int(log_seq)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def recover(
    spark: SparkSession,
    snapshot_path: str,
    log_tail: DataFrame | None,
    as_of: int | None = None,
) -> DataFrame:
    """Snapshot ∪ replay tail (reference engine open/recover,
    engine.rs:44-73): tail entries supersede snapshot rows per id;
    tombstones in the tail drop snapshot rows.

    `as_of`: replay the tail only up to log position `as_of` (inclusive)
    — point-in-time recovery, the durable twin of crud.time_travel. The
    snapshot must be a fold of the log at or before `as_of`; when the
    manifest records its `log_seq` (write_snapshot/compact) this is
    validated, otherwise it is the caller's contract. The reference can
    only recover to the log head (engine.rs:44-73)."""
    snap = read_snapshot(spark, snapshot_path)
    if as_of is not None:
        manifest = read_manifest(snapshot_path)
        snap_seq = manifest.get("log_seq")
        if snap_seq is not None and snap_seq > as_of:
            raise ValueError(
                f"snapshot at {snapshot_path} folds the log through seq "
                f"{snap_seq} > as_of={as_of}; recover from an earlier "
                "snapshot (or the log head) for this point in time"
            )
        if log_tail is not None:
            log_tail = log_tail.filter(F.col("seq") <= F.lit(int(as_of)))
    if log_tail is None:
        return snap
    folded_tail = fold_insert_log(log_tail)  # id, embedding, metadata
    touched = log_tail.filter(F.col("op") != "checkpoint").select("id").distinct()
    survivors = snap.join(touched, "id", "left_anti")
    return survivors.unionByName(folded_tail.select(*snap.columns))


def compact(
    spark: SparkSession, snapshot_path: str, log_tail: DataFrame | None, new_path: str
) -> dict:
    """Checkpoint (P6): fold tail into snapshot, write the new snapshot.
    The caller then truncates/starts a fresh log — same move as the
    reference's maybe_checkpoint (engine.rs:199-204) minus the interval
    counter, which belongs to the ingestion job. The new manifest records
    the folded-through log position (tail max seq, else the previous
    snapshot's) so point-in-time recover() can validate against it."""
    if log_tail is not None:
        seq_row = log_tail.agg(F.max("seq").alias("m")).first()
        log_seq = None if seq_row.m is None else int(seq_row.m)
    else:
        log_seq = read_manifest(snapshot_path).get("log_seq")
    return write_snapshot(
        recover(spark, snapshot_path, log_tail), new_path, log_seq=log_seq
    )
