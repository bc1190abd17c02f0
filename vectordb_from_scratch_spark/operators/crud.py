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
    column: (as_of, <id>, ...payload columns). `seq` must be unique per
    id (it is the log's total order).

    Scale: one hash-aggregate on id — for each version, a conditional
    `max_by(entry, seq WHERE seq <= as_of)` picks that version's winning
    entry, all k versions in the SAME aggregate. Partial aggregation
    runs map-side, so the exchange moves ~one row per id, NOT the log
    and NOT k copies of it. The obvious alternative — broadcast-joining
    the as_of list onto the log with `seq <= as_of` and window-folding
    per (as_of, id) — was measured 3× SLOWER than even k separate folds
    at a 50M-row log (38.2 s vs 13.1 s, SCALE.md round 6): the theta
    join defeats parquet prefix pruning AND replicates every row into
    each version that sees it, tripling the shuffled volume. The
    aggregate form shuffles 0.4× of what the separate folds do and wins
    at any k.
    """
    entry_cols = [c for c in log.columns if c not in (id_col, seq_col, "op")]
    entry = F.struct(F.col("op"), *[F.col(c) for c in entry_cols])
    aggs = [
        F.max_by(
            entry,
            F.when(F.col(seq_col) <= F.lit(int(t)), F.col(seq_col)),
        ).alias(f"__v{i}")
        for i, t in enumerate(as_of_seqs)
    ]
    folded = (
        log.filter(F.col("op") != F.lit("checkpoint"))
        .groupBy(id_col)
        .agg(*aggs)
    )
    stack_args = []
    for i, t in enumerate(as_of_seqs):
        stack_args += [F.lit(int(t)).cast("long"), F.col(f"__v{i}")]
    return (
        folded.select(
            F.col(id_col),
            F.stack(F.lit(len(as_of_seqs)), *stack_args).alias("as_of", "__e"),
        )
        .filter(F.col("__e").isNotNull() & (F.col("__e.op") == "insert"))
        .select(
            "as_of",
            id_col,
            *[F.col(f"__e.{c}").alias(c) for c in entry_cols],
        )
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
