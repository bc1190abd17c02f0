"""CRUD as log-folding — set-oriented versions of the reference's
insert/upsert/delete/get/list/count (src/storage.rs:130-327) and its WAL
replay semantics (src/persistence/wal.rs, engine.rs:44-73).

The reference mutates an in-memory HashMap row-by-row; a Spark-native
engine represents the same state as an ordered INSERT LOG folded with
last-writer-wins. This is exactly what the reference's WAL already is —
an ordered, replayable sequence of Insert/Delete entries — so recovery
(snapshot ∪ replay tail) and upsert (re-insert replaces, storage.rs:156-161)
both become one declarative fold:

    row_number() OVER (PARTITION BY id ORDER BY seq DESC) = 1
    ... then drop tombstones.

Scale: the fold is one hash-shuffle on id; with the log bucketed/partitioned
by id it is shuffle-free. Snapshot+tail keeps the shuffled volume at
O(tail), not O(table) — the same reason the reference checkpoints every
1000 entries (engine.rs:22-29).

Divergence (deliberate, SURVEY.md §2.4 P9): the reference DROPS metadata on
checkpoint (engine.rs:207-228 writes metadata: HashMap::new()); we persist it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "fold_insert_log",
    "time_travel",
    "upsert",
    "delete_ids",
    "validate_dimension",
]

LOG_SCHEMA = "seq long, op string, id string, embedding array<float>, metadata map<string,string>"


def fold_insert_log(log: DataFrame, *, id_col: str = "id", seq_col: str = "seq") -> DataFrame:
    """Fold an insert/delete log into current state: last writer wins per id,
    'delete' entries are tombstones (reference WalEntry::Delete,
    src/persistence/wal.rs:21-23; replay order engine.rs:57-61).

    'checkpoint' marker entries (engine.rs:187-204) are ignored — they don't
    carry data.
    """
    w = Window.partitionBy(id_col).orderBy(F.col(seq_col).desc())
    return (
        log.filter(F.col("op") != F.lit("checkpoint"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == F.lit("insert")))
        .drop("__rn", "op", seq_col)
    )


def time_travel(
    log: DataFrame,
    as_of_seqs: list[int],
    *,
    id_col: str = "id",
    seq_col: str = "seq",
) -> DataFrame:
    """Point-in-time state reconstruction: the store's contents AS OF each
    sequence number in ``as_of_seqs``, all versions in one plan. Because
    the engine's state IS a replayable insert/delete log (the reference's
    WAL, src/persistence/wal.rs; replay order engine.rs:57-61), any
    historical state is just the fold truncated at `seq <= as_of` — the
    same recovery machinery as `fold_insert_log`, parameterized by time.
    The reference can only recover to "now" (snapshot ∪ full tail);
    time travel is the generalization a log-structured store gets for free.

    Returns one folded state per as_of value, tagged with an `as_of`
    column: (as_of, <id>, ...payload columns).

    Scale: the as_of list is a handful of literals, broadcast onto the log
    map-side (each log row replicates only to the versions that can see
    it), then ONE hash-shuffle on (as_of, id) folds every requested
    version simultaneously — k versions cost one pass over the log, not k.
    """
    spark = log.sparkSession
    asof = spark.createDataFrame([(int(s),) for s in as_of_seqs], "as_of long")
    w = Window.partitionBy("as_of", id_col).orderBy(F.col(seq_col).desc())
    return (
        log.filter(F.col("op") != F.lit("checkpoint"))
        .join(F.broadcast(asof), F.col(seq_col) <= F.col("as_of"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == F.lit("insert")))
        .drop("__rn", "op", seq_col)
    )


def upsert(current: DataFrame, updates: DataFrame, id_col: str = "id") -> DataFrame:
    """MERGE-style upsert: rows in `updates` replace same-id rows in
    `current` (reference insert-replaces semantics, src/storage.rs:156-161).
    Anti-join keeps only unaffected current rows — no full rewrite logic."""
    survivors = current.join(updates.select(id_col), on=id_col, how="left_anti")
    return survivors.unionByName(updates)


def delete_ids(current: DataFrame, ids: DataFrame, id_col: str = "id") -> DataFrame:
    """Delete = anti-join with the tombstone set (reference delete,
    src/storage.rs:175-192; absence is a no-op here rather than an error —
    set-oriented divergence)."""
    return current.join(ids.select(id_col), on=id_col, how="left_anti")


def validate_dimension(df: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Dimension enforcement (reference src/storage.rs:145-154, 222-230):
    the reference raises DimensionMismatch per row; set-oriented form is a
    validation filter — callers can count the rejects."""
    return df.withColumn("__dim_ok", F.size(F.col(vec_col)) == F.lit(dim))
