"""Source/sink format coverage: the engine's tables round-trip through
CSV, JSON-lines, and ORC with explicit schemas (the reference reads only
its own bincode files — SURVEY §2.6 'scans/sources/sinks')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_subset(spark):
    from vectordb_from_scratch_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)


def _rows(df):
    return sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect())


def test_csv_roundtrip(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_csv")
    docs_subset.write.option("header", True).option("quoteAll", True).csv(p)
    back = (
        spark.read.option("header", True)
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .csv(p)
    )
    assert _rows(back) == _rows(docs_subset)


def test_jsonl_roundtrip(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_json")
    docs_subset.write.json(p)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(p)
    assert _rows(back) == _rows(docs_subset)


def test_orc_roundtrip_with_compression(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_orc")
    docs_subset.write.option("compression", "zstd").orc(p)
    back = spark.read.orc(p)
    assert _rows(back) == _rows(docs_subset)


def test_parquet_zstd_roundtrip_embeddings(spark, tmp_path):
    from vectordb_from_scratch_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    p = str(tmp_path / "emb_zstd")
    emb.write.option("compression", "zstd").parquet(p)
    back = spark.read.parquet(p)
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in back.collect()}
    assert a == b  # float arrays bit-exact through the sink


# ---------------------------------------------------------------------------
# events.ts physical-layout robustness: the driver has regenerated testdata
# with a different parquet timestamp layout between rounds once (r1 nanos →
# r2 micros/NTZ), silently breaking every unix_micros/withWatermark call
# site. load_table must normalize ALL plausible layouts to a session-TZ
# TIMESTAMP at the source.
# ---------------------------------------------------------------------------

_TS_LAYOUTS = ["ns", "us", "us_utc"]


def _write_events_layout(tmp_path, layout):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # minute 200 is a sentinel: it pushes the event-time watermark past
    # the first two hour-windows so append-mode emits them
    rows = [base + dt.timedelta(minutes=m) for m in (0, 5, 90, 95, 200)]
    tz = "UTC" if layout == "us_utc" else None
    unit = "ns" if layout == "ns" else "us"
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(rows, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([7, 7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["view"] * 5, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }
    )
    d = tmp_path / f"layout_{layout}"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("layout", _TS_LAYOUTS)
def test_load_table_normalizes_ts_layout(spark, tmp_path, layout):
    """Every layout loads as tz-aware TIMESTAMP with identical UTC micros."""
    from vectordb_from_scratch_spark.sources import load_table

    sf_dir = _write_events_layout(tmp_path, layout)
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", layout
    micros = [r.m for r in ev.select(F.unix_micros("ts").alias("m")).orderBy("m").collect()]
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    assert micros == [base_us + m * 60_000_000 for m in (0, 5, 90, 95, 200)], layout


@pytest.mark.parametrize("layout", _TS_LAYOUTS)
def test_sessionize_works_on_every_ts_layout(spark, tmp_path, layout):
    """The round-2 breakage, pinned: batch sessionize (unix_micros path)
    must split the 85-minute gap into two sessions on every layout."""
    from vectordb_from_scratch_spark.plans.relational import events_sessionize
    from vectordb_from_scratch_spark.sources import load_table

    sf_dir = _write_events_layout(tmp_path, layout)
    ev = load_table(spark, sf_dir, "events")
    sessions = events_sessionize(ev).collect()
    assert len(sessions) == 3, (layout, sessions)
    assert sorted(r.n_events for r in sessions) == [1, 2, 2]


@pytest.mark.parametrize("layout", _TS_LAYOUTS)
def test_watermark_works_on_every_ts_layout(spark, tmp_path, layout):
    """Streaming watermark (the EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    failure mode) must accept the normalized ts on every layout."""
    from vectordb_from_scratch_spark.sources import load_table
    from vectordb_from_scratch_spark.streaming import windowed_event_counts

    sf_dir = _write_events_layout(tmp_path, layout)
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / f"stream_src_{layout}")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream, watermark="1 minute")
    out = str(tmp_path / f"out_{layout}")
    ckpt = str(tmp_path / f"ckpt_{layout}")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # watermark after the batch = 03:20 − 1 min, so the two closed
    # hour-windows (4 events) are emitted; the sentinel's window is not
    got = spark.read.parquet(out).agg(F.sum("n_events").alias("n")).collect()[0].n
    assert got == 4, layout


@pytest.mark.parametrize("unit", ["float32", "float64"])
def test_embeddings_layout_drift(spark, tmp_path, unit):
    """If the driver regenerates embeddings as list<double> instead of
    list<float>, the search paths must keep working (the same insurance
    the ts-layout tests give events)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(unit)
    table = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32() if unit == "float32" else pa.float64()),
            ),
            "label": pa.array([i % 3 for i in range(40)], pa.int32()),
        }
    )
    d = tmp_path / f"emb_{unit}"
    d.mkdir()
    pq.write_table(table, str(d / "embeddings.parquet"))

    from vectordb_from_scratch_spark.operators import ann, knn
    from vectordb_from_scratch_spark.sources import load_table

    e = load_table(spark, str(d), "embeddings")
    probes = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    res = knn.knn(e, probes, k=3, metric="euclidean").collect()
    assert len(res) == 6
    top1 = {r.query_id: (r.id, r.distance) for r in res if r.rank == 1}
    assert top1 == {0: (0, 0.0), 1: (1, 0.0)}  # self-match invariant
    a = ann.ann_knn_srp(e, probes, k=3, metric="euclidean", dim=8, nbits=4, n_tables=2)
    assert a.count() > 0
