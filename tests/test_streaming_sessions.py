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


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with event-time bound: purchases matched to the
    same user's views within the preceding hour. Both sides watermarked
    (required for state eviction in stream-stream joins); result must be a
    subset-consistent match of the batch interval join."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(F.col("user_id") < 60)
    p_src, v_src = str(tmp_path / "p_src"), str(tmp_path / "v_src")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), F.col("user_id"), F.col("ts").alias("v_ts")
    )
    purchases.write.parquet(p_src)
    views.write.parquet(v_src)

    sp = spark.readStream.schema(purchases.schema).parquet(p_src).withWatermark("p_ts", "2 hours")
    sv = spark.readStream.schema(views.schema).parquet(v_src).withWatermark("v_ts", "2 hours")
    joined = sp.join(
        sv,
        (sp.user_id == sv.user_id)
        & (sv.v_ts <= sp.p_ts)
        & (sv.v_ts >= sp.p_ts - F.expr("INTERVAL 1 HOUR")),
    ).select("p_id", "v_id")

    out, ckpt = str(tmp_path / "ss_out"), str(tmp_path / "ss_ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r.p_id, r.v_id) for r in spark.read.parquet(out).collect()}
    batch = {
        (r.p_id, r.v_id)
        for r in purchases.join(
            views,
            (purchases.user_id == views.user_id)
            & (views.v_ts <= purchases.p_ts)
            & (views.v_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got, "stream-stream join emitted nothing"
    assert got <= batch            # everything emitted is a true match
    assert len(got) >= 0.8 * len(batch)  # only watermark-tail matches withheld
