"""Streaming SCD2 dimension maintenance (streaming/scd_stream.py):
stream ≡ batch, and replayed micro-batches are no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.scd import scd2_merge
from vectordb_from_scratch_spark.streaming import scd2_stream_foreach_batch

SCHEMA = "k int, seg string, bal double, ts string"
TS_SCHEMA = "k int, seg string, bal double, ts timestamp"

BATCH1 = [
    (1, "A", 10.0, "1995-01-01 08:00:00"),
    (1, "A", 12.0, "1995-01-01 09:30:00"),  # later same-batch update wins
    (2, "B", 20.0, "1995-01-01 10:00:00"),
]
BATCH2 = [
    (1, "A", 15.0, "1996-06-01 08:00:00"),  # change → close + append
    (2, "B", 20.0, "1996-06-01 09:00:00"),  # no-op re-send
    (3, "C", 30.0, "1996-06-01 10:00:00"),  # new key
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _dim_rows(spark, dim_dir):
    return sorted(
        (r.k, r.seg, r.bal, str(r.effective_from), str(r.effective_to))
        for r in spark.read.parquet(dim_dir).collect()
    )


def _run(spark, src, dim, ckpt):
    stream = spark.readStream.schema(TS_SCHEMA).parquet(src)
    q = scd2_stream_foreach_batch(
        stream, dim, ckpt, keys=["k"], tracked=["seg", "bal"], order_col="ts"
    ).start()
    q.awaitTermination(120)


def test_scd2_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    # two availableNow passes = two micro-batches, dated by their data
    _mk(spark, BATCH1).write.parquet(src)
    _run(spark, src, dim, ckpt)
    _mk(spark, BATCH2).write.mode("append").parquet(src)
    _run(spark, src, dim, ckpt)

    got = _dim_rows(spark, dim)
    # batch reference: bootstrap from batch-1 latest, then merge batch 2
    b1 = (
        _mk(spark, BATCH1)
        .groupBy("k")
        .agg(F.max(F.struct("ts", "seg", "bal")).alias("s"))
        .select("k", "s.seg", "s.bal")
        .withColumn("effective_from", F.lit("1995-01-01").cast("date"))
        .withColumn("effective_to", F.lit(None).cast("date"))
    )
    b2 = _mk(spark, BATCH2).select("k", "seg", "bal")
    ref = scd2_merge(b1, b2, ["k"], ["seg", "bal"], "1996-06-01")
    expect = sorted(
        (r.k, r.seg, r.bal, str(r.effective_from), str(r.effective_to))
        for r in ref.collect()
    )
    assert got == expect
    # spot semantics: key 1 has a closed 12.0 version and an open 15.0
    assert (1, "A", 12.0, "1995-01-01", "1996-06-01") in got
    assert (1, "A", 15.0, "1996-06-01", "None") in got
    assert (2, "B", 20.0, "1995-01-01", "None") in got  # no-op stayed open


def test_scd2_stream_replay_is_noop(spark, tmp_path):
    """Re-delivering the same updates through a FRESH checkpoint (the
    crash-replay worst case: sink already applied, offsets lost) leaves
    the dimension unchanged — idempotency lives in the merge, not the
    checkpoint."""
    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    _mk(spark, BATCH1).write.parquet(src)
    _run(spark, src, dim, str(tmp_path / "ckpt1"))
    before = _dim_rows(spark, dim)
    _run(spark, src, dim, str(tmp_path / "ckpt2"))  # full replay
    assert _dim_rows(spark, dim) == before
