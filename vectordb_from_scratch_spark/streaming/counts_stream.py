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

Crash/interleave safety (VERDICT r9 #6, the fence neardup_stream got
in r9 applied here):
- INTENT LEASE: compact_counts writes `<state>/compaction_intent`
  before reading any partial and clears it last; the merge checks it
  at batch start AND immediately before its write, failing the
  micro-batch loudly (the stream retries off its checkpoint after
  compaction finishes).
- BATCH-ID SNAPSHOT: the fold reads only the batch partitions
  physically present when it starts and deletes ONLY those — a partial
  landed by a batch that slipped past the intent check survives both
  the fold and the delete.
- MAX-FOLDED MANIFEST: `<state>/compaction` records the highest
  batch_id ever folded into the baseline (batch ids are monotone per
  checkpoint, so one integer identifies the folded prefix). Three
  protections hang off it:
    * a REPLAYED batch with id ≤ max_folded (the crash-dangling window:
      partial written, checkpoint commit lost, compaction ran before
      the replay) skips its write — its counts already live in the
      baseline, and re-writing the partition would double-count;
    * the NEXT fold excludes any on-disk partition with id ≤ max_folded
      (a compaction that crashed between its manifest write and its
      partition delete leaves the folded partition behind — folding it
      again would double-count it into the baseline permanently) and
      instead just finishes the interrupted delete;
    * read_counts excludes those stale partitions the same way, so even
      DURING that crash window the served totals stay exact.
  This is the counts analog of neardup_stream keeping batch_id in the
  compacted base for replay exclusion. (Re-ingesting a compacted state
  from a FRESH checkpoint remains out of scope, as for every stream
  here: batch numbering restarts and no sink bookkeeping can realign
  it — reset the state.)
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import cache
from ._fence import check_intent_fence, clear_intent, fs_for, intent_dir, write_intent
from .dedup_stream import _dir_exists

__all__ = [
    "counts_stream_foreach_batch",
    "read_counts",
    "read_top_hitters",
    "compact_counts",
]

# the compaction baseline partition; real micro-batch ids are >= 0
_BASELINE_BATCH = -1


def _manifest_dir(state_dir: str) -> str:
    return state_dir + "/compaction"


def _check_layout(spark: SparkSession, state_dir: str) -> None:
    """Pre-fence states (r9 and earlier) wrote partials directly under
    state_dir; the fenced layout nests them under <state>/data so the
    intent/manifest markers can live alongside without breaking
    partition discovery. Reading an old state as if empty would
    silently zero every count — fail loudly instead (migration: move
    the batch_id=* directories under <state>/data)."""
    fs, jpath = fs_for(spark, state_dir)
    if not fs.exists(jpath):
        return
    for st in fs.listStatus(jpath):
        if st.isDirectory() and st.getPath().getName().startswith("batch_id="):
            raise RuntimeError(
                f"counts state at {state_dir} uses the pre-fence layout "
                "(batch_id=* partitions at the state root): move them "
                f"under {state_dir}/data and retry — reading on would "
                "silently treat every existing count as zero"
            )


def _max_folded(spark: SparkSession, state_dir: str) -> int:
    """Highest batch_id folded into the baseline so far; -1 = never
    compacted. Batch ids are monotone within a checkpoint, so the
    folded set is exactly {0..max_folded} ∩ {ids that ever existed}."""
    mdir = _manifest_dir(state_dir)
    if not _dir_exists(spark, mdir):
        return -1
    return int(spark.read.json(mdir).first()["max_folded"])


def _list_batch_ids(spark: SparkSession, data_dir: str) -> list[int]:
    """batch_id partition values (>= 0) physically present — the fold's
    snapshot: only these are read and only these are deleted."""
    fs, jpath = fs_for(spark, data_dir)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            bid = int(name.split("=", 1)[1])
            if bid >= 0:
                out.append(bid)
    return sorted(out)


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
    data_dir = state_dir + "/data"
    folded_cache: list = []  # per stream instance, like neardup's manifest

    def _check_fence(s: SparkSession) -> None:
        check_intent_fence(s, state_dir, "counts stream", "compact_counts")

    def merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        _check_fence(s)
        if not folded_cache:
            _check_layout(s, state_dir)  # once per stream instance
            folded_cache.append(_max_folded(s, state_dir))
        if batch_id <= folded_cache[0]:
            # crash-dangling replay AFTER compaction: this batch's partial
            # was folded into the baseline (and its partition deleted) —
            # re-writing it would double-count exactly once. Its data is
            # durably in the baseline; the replay is a no-op.
            return
        partial = (
            batch.groupBy(F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
            # one small file per batch: partials are key-cardinality rows
            .coalesce(1)
        )
        # re-check the lease immediately before the write: a compaction
        # that began mid-batch must not race the partial landing below
        _check_fence(s)
        (
            partial.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(data_dir)
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
    partials (and the compaction baseline). ``key_type`` shapes the
    empty result before any batch."""
    data_dir = state_dir + "/data"
    if not _dir_exists(spark, data_dir):
        _check_layout(spark, state_dir)  # old-layout state ≠ empty state
        return spark.createDataFrame([], f"key {key_type}, cnt long")
    mf = _max_folded(spark, state_dir)
    df = spark.read.parquet(data_dir)
    if mf >= 0:
        # exclude STALE partitions (folded into the baseline but not yet
        # deleted — the compaction crash window): counting them alongside
        # the baseline would double-count exactly those batches
        df = df.filter(
            (F.col("batch_id") == _BASELINE_BATCH)
            | (F.col("batch_id") > mf)
        )
    return df.groupBy("key").agg(F.sum("cnt").alias("cnt"))


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


def compact_counts(spark: SparkSession, state_dir: str) -> dict:
    """Fold the SNAPSHOTTED batch partials into the baseline partition
    and drop exactly those partitions. Run while the stream is stopped;
    that rule is ENFORCED by the intent lease (a concurrent micro-batch
    fails loudly), and a batch that slips past the check is protected by
    the snapshot (its partition is neither folded nor deleted — the next
    compaction picks it up). The folded batch ids are recorded in the
    manifest so a crash-dangling replay of a folded batch skips its
    write instead of double-counting (module docstring).

    Returns {'folded': [batch ids folded this run], 'baseline_keys': n}.
    The read side is materialized via localCheckpoint before the
    overwrite — never overwrite a path a lazy plan still scans."""
    data_dir = state_dir + "/data"
    _check_layout(spark, state_dir)
    # intent FIRST — every partial read below is covered by the lease
    write_intent(spark, state_dir)
    prev_max = _max_folded(spark, state_dir)
    present = _list_batch_ids(spark, data_dir)
    # STALE = folded by a previous compaction that crashed before its
    # delete: already in the baseline, so it must NOT fold again (that
    # would double-count it permanently) — just finish the delete
    stale = [b for b in present if b <= prev_max]
    snapshot = [b for b in present if b > prev_max]
    if not snapshot:
        for bid in stale:
            fs, jpath = fs_for(spark, f"{data_dir}/batch_id={bid}")
            if fs.exists(jpath):
                fs.delete(jpath, True)
        clear_intent(spark, state_dir)
        return {"folded": [], "baseline_keys": 0}
    keep_ids = snapshot + [_BASELINE_BATCH]
    totals = (
        spark.read.parquet(data_dir)
        .filter(F.col("batch_id").isin(keep_ids))
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(_BASELINE_BATCH))
        .coalesce(1)
        .transform(cache.checkpoint)
    )
    n_keys = totals.count()
    # dynamic overwrite replaces ONLY the baseline partition — a batch
    # partition created after the snapshot survives
    (
        totals.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(data_dir)
    )
    # manifest BEFORE the delete: a crash between them leaves the folded
    # partition AND the manifest — the replay-skip stays correct, the
    # next fold's stale-exclusion (above) skips the leftover partition,
    # and read_counts' stale filter keeps served totals exact meanwhile
    spark.createDataFrame(
        [(max(snapshot),)], "max_folded long"
    ).coalesce(1).write.mode("overwrite").json(_manifest_dir(state_dir))
    for bid in snapshot + stale:
        fs, jpath = fs_for(spark, f"{data_dir}/batch_id={bid}")
        if fs.exists(jpath):
            fs.delete(jpath, True)
    clear_intent(spark, state_dir)
    return {"folded": snapshot, "baseline_keys": int(n_keys)}
