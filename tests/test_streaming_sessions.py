"""Stateful-streaming sessionization vs the batch sessionizer: closed
sessions emitted by applyInPandasWithState must agree with the batch
window-function fold on the same events."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.plans.relational import events_sessionize
from vectordb_from_scratch_spark.streaming.sessions import sessionize_stream


def test_stream_sessions_match_batch(spark, tmp_path):
    from vectordb_from_scratch_spark.sources import load_table

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("user_id") < 40)
        .select("ts", "user_id", "event_id", "value")
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.n_events, round(r.sum_value, 6))
        for r in spark.read.parquet(out).collect()
    }
    assert got, "stream emitted no closed sessions"

    batch = events_sessionize(spark.read.parquet(src), gap_minutes=30)
    batch_rows = batch.collect()
    batch_keys = {
        (r.user_id, r.n_events, round(r.sum_value, 6)) for r in batch_rows
    }
    # Every emitted (closed) streaming session must exist in the batch fold;
    # open/tail sessions are legitimately withheld by the watermark.
    for user_id, start, n, total in got:
        assert (user_id, n, total) in batch_keys, (user_id, start, n, total)
    # and a healthy fraction of batch sessions closed (30-day span, 30-min gap)
    assert len(got) >= 0.5 * len(batch_rows)
