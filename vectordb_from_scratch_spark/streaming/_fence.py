"""Shared compaction-fence plumbing for the stateful streaming sinks
(neardup_stream, counts_stream): the intent-lease protocol that keeps a
maintenance compaction and a running stream from interleaving writes.

Protocol (established for neardup in r9, generalized here in r10):
- compaction writes `<state>/compaction_intent` BEFORE reading any
  delta/partial and clears it LAST, after its deletes;
- every micro-batch checks the marker at batch start AND immediately
  before its state writes, failing loudly (fail-stop — the stream
  retries off its checkpoint once compaction finishes);
- a stale marker from a crashed compaction blocks the stream the same
  way — safe by construction; re-running compaction completes and
  clears it (the intent write is an overwrite, never a second-writer
  check: compactions are operator-serialized maintenance).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from .dedup_stream import _dir_exists


def intent_dir(state_dir: str) -> str:
    return state_dir + "/compaction_intent"


def fs_for(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for a state path — the shared handle
    every fence/compaction filesystem operation goes through."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), jpath


def write_intent(spark: SparkSession, state_dir: str) -> None:
    """Take the compaction lease (overwrite semantics — see module
    docstring for why that is correct for operator-run compactions)."""
    spark.createDataFrame(
        [(int(time.time()),)], "intent_ts long"
    ).coalesce(1).write.mode("overwrite").json(intent_dir(state_dir))


def clear_intent(spark: SparkSession, state_dir: str) -> None:
    fs, jpath = fs_for(spark, intent_dir(state_dir))
    if fs.exists(jpath):
        fs.delete(jpath, True)


def check_intent_fence(
    spark: SparkSession, state_dir: str, stream_name: str, compactor: str
) -> None:
    """Fail the micro-batch loudly while a compaction lease is held."""
    if _dir_exists(spark, intent_dir(state_dir)):
        raise RuntimeError(
            f"compaction in progress for {state_dir} (intent marker "
            f"present) — the {stream_name} must not write state while "
            f"{compactor} runs; retry after it finishes (a stale marker "
            "from a crashed compaction is cleared by re-running "
            "compaction)"
        )
