"""Structured Streaming slice tests: insert-log fold via foreachBatch
(the reference's WAL replay, incremental) and watermarked windowed aggs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import crud
from vectordb_from_scratch_spark.streaming import (
    fold_stream_foreach_batch,
    windowed_event_counts,
)


def test_stream_fold_matches_batch_fold(spark, tmp_path):
    """Streaming fold (availableNow over a file source) must land the same
    state as the batch fold of the full log — replay equivalence, the
    property the reference's crash-recovery tests assert
    (src/persistence/engine.rs:259-391)."""
    log_rows = [
        (1, "insert", "a", [1.0, 0.0], {"v": "1"}),
        (2, "insert", "b", [0.0, 1.0], {"v": "1"}),
        (3, "insert", "a", [2.0, 0.0], {"v": "2"}),
        (4, "delete", "b", None, None),
        (5, "insert", "c", [3.0, 3.0], {"v": "9"}),
    ]
    log = spark.createDataFrame(log_rows, crud.LOG_SCHEMA)
    src = str(tmp_path / "log_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    log.write.parquet(src)

    stream = spark.readStream.schema(crud.LOG_SCHEMA).parquet(src)
    q = fold_stream_foreach_batch(spark, stream, state, ckpt).start()
    q.awaitTermination(120)

    got = {r.id: r for r in spark.read.parquet(state).collect()}
    expect = {r.id: r for r in crud.fold_insert_log(log).collect()}
    assert set(got) == set(expect) == {"a", "c"}
    assert got["a"].metadata == {"v": "2"}
    assert got["a"].embedding == expect["a"].embedding


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    """Streaming windowed agg (availableNow) equals the batch groupBy —
    and the plan carries a watermark for late-data eviction."""
    from vectordb_from_scratch_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt2")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    batch = spark.read.parquet(src)
    expect_df = (
        batch.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    expect = {(r.hour, r.event_type): (r.n_events, r.sum_value) for r in expect_df.collect()}
    # Append-mode watermark semantics: windows whose end is not yet older
    # than (max event time − watermark) are withheld at end-of-stream, so
    # the streaming output is the CLOSED-window subset of the batch result.
    assert set(got) <= set(expect)
    for k, v in got.items():
        assert v == expect[k], k
    import datetime

    max_ts = batch.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(hours=2)  # windows closed ≥1h before wm
    closed = {
        k for k in expect if datetime.datetime.strptime(k[0], "%Y-%m-%d %H:%M:%S") < cutoff
    }
    assert closed <= set(got)
    assert len(got) > 0


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension — no watermark needed (static side is re-scanned per
    micro-batch). Result must equal the batch join."""
    from vectordb_from_scratch_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(400)
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)

    static_dim = spark.range(0, 2000).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("segment")
    )
    stream = spark.readStream.schema(events.schema).parquet(src)
    enriched = (
        stream.join(static_dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = str(tmp_path / "out3")
    q = (
        enriched.writeStream.format("memory")
        .queryName("seg_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.segment: r.n for r in spark.sql("select * from seg_counts").collect()}
    batch = spark.read.parquet(src).join(static_dim, "user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    expect = {r.segment: r.n for r in batch.collect()}
    assert got == expect and len(got) == 5


def test_stream_fold_incremental_across_microbatches(spark, tmp_path):
    """The fold must be correct when the log arrives in MULTIPLE micro-batches
    (maxFilesPerTrigger=1): later batches upsert/tombstone earlier state."""
    from vectordb_from_scratch_spark.operators import crud
    from vectordb_from_scratch_spark.streaming import fold_stream_foreach_batch

    b1 = [(1, "insert", "a", [1.0], {"v": "1"}), (2, "insert", "b", [2.0], {"v": "1"})]
    b2 = [(3, "insert", "a", [9.0], {"v": "2"}), (4, "delete", "b", None, None)]
    b3 = [(5, "insert", "c", [3.0], {"v": "1"}), (6, "delete", "zz", None, None)]
    src = str(tmp_path / "multi_src")
    for i, batch in enumerate((b1, b2, b3)):
        spark.createDataFrame(batch, crud.LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "multi_state")
    ckpt = str(tmp_path / "multi_ckpt")
    stream = spark.readStream.schema(crud.LOG_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = fold_stream_foreach_batch(spark, stream, state, ckpt).start()
    q.awaitTermination(180)
    assert q.lastProgress is None or not q.isActive

    got = {r.id: r for r in spark.read.parquet(state).collect()}
    assert set(got) == {"a", "c"}
    assert got["a"].embedding == [9.0] and got["a"].metadata == {"v": "2"}
