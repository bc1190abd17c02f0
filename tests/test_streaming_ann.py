"""Streaming SRP-index maintenance: multi-micro-batch incremental
re-bucketing must land an index interchangeable with the batch build
(the dynamic behavior of the reference's HnswIndex::add,
src/hnsw/graph.rs:245-342, re-expressed as foreachBatch appends)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ann
from vectordb_from_scratch_spark.streaming import (
    compact_srp_index,
    read_srp_index,
    srp_index_stream_foreach_batch,
)

DIM = 8
CFG = dict(dim=DIM, nbits=4, n_tables=2, seed=7)

LOG_SCHEMA = "seq long, op string, id long, embedding array<double>"


def _vec(i: int) -> list[float]:
    # deterministic, well-spread, injective for i < 101 (prime modulus
    # larger than any id used here — a period-13 variant made _vec(0)
    # equal _vec(13) and broke the nearest-hit assertion)
    return [float(((i * 31 + j * 17) % 101) - 50) / 50.0 for j in range(DIM)]


@pytest.fixture()
def streamed_index(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1): 2 insert batches and a
    batch with an upsert + a delete."""
    src = str(tmp_path / "log_src")
    index_dir = str(tmp_path / "srp_index")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [(i, "insert", i, _vec(i)) for i in range(0, 10)],
        [(i + 10, "insert", i, _vec(i)) for i in range(10, 20)],
        # upsert id 3 TWICE within one micro-batch (within-batch LWW must
        # keep only seq 100's buckets), delete id 7
        [(99, "insert", 3, _vec(55)), (100, "insert", 3, _vec(99)), (101, "delete", 7, None)],
    ]
    for n, rows in enumerate(batches):
        spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        srp_index_stream_foreach_batch(stream, index_dir, ckpt, **CFG)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None
    return index_dir


def _final_state(spark):
    rows = [(i, _vec(i)) for i in range(20) if i not in (3, 7)] + [(3, _vec(99))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_stream_index_equals_batch_index(spark, streamed_index):
    live = read_srp_index(spark, streamed_index)
    batch = ann.srp_index(_final_state(spark), **CFG)
    got = {(r.id, r.tbl, r.bucket) for r in live.collect()}
    expect = {(r.id, r.tbl, r.bucket) for r in batch.collect()}
    assert got == expect
    assert not any(i == 7 for i, _, _ in got)  # tombstone applied
    assert len(got) == 19 * CFG["n_tables"]


def test_stream_inserted_rows_retrievable_with_batch_parity(spark, streamed_index):
    """Search over the stream-maintained index ≡ ann_knn_srp over the
    equivalent batch table — including rows inserted in later
    micro-batches (id 13) and the upserted id 3."""
    probes = spark.createDataFrame(
        [(0, _vec(13)), (1, _vec(99))], "query_id long, query_embedding array<double>"
    )
    via_stream = ann.ann_knn_srp_indexed(
        read_srp_index(spark, streamed_index), probes, k=5, multiprobe=True, **CFG
    )
    via_batch = ann.ann_knn_srp(_final_state(spark), probes, k=5, multiprobe=True, **CFG)
    s = {(r.query_id, r.id, round(r.distance, 9), r.rank) for r in via_stream.collect()}
    b = {(r.query_id, r.id, round(r.distance, 9), r.rank) for r in via_batch.collect()}
    assert s == b and len(s) > 0
    # the late-batch insert and the upsert are each their own nearest hit
    top = {r.query_id: r.id for r in via_stream.filter(F.col("rank") == 1).collect()}
    assert top[0] == 13 and top[1] == 3


def test_compact_preserves_live_index(spark, streamed_index):
    before = {(r.id, r.tbl, r.bucket) for r in read_srp_index(spark, streamed_index).collect()}
    compact_srp_index(spark, streamed_index)
    after_raw = spark.read.parquet(streamed_index)
    after = {(r.id, r.tbl, r.bucket) for r in read_srp_index(spark, streamed_index).collect()}
    assert after == before
    # compaction dropped shadowed rows and tombstones
    assert after_raw.filter(F.col("op") == "delete").count() == 0
    assert after_raw.count() == len(before)


# -- incremental IVF maintenance (VERDICT r3 #4) ---------------------------


@pytest.fixture()
def ivf_setup(spark, tmp_path):
    """Centroids built offline from the first 10 vectors; then a 3-batch
    stream: two insert batches, then an upsert + delete batch."""
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(10)], "vec_id long, embedding array<double>"
    )
    cent = ann.build_ivf_det(base, n_lists=3, iters=2)
    cent = spark.createDataFrame(cent.collect(), cent.schema)  # freeze

    src = str(tmp_path / "ivf_log_src")
    index_dir = str(tmp_path / "ivf_index")
    ckpt = str(tmp_path / "ivf_ckpt")
    batches = [
        [(i, "insert", i, _vec(i)) for i in range(0, 10)],
        [(i + 10, "insert", i, _vec(i)) for i in range(10, 20)],
        [(99, "insert", 3, _vec(55)), (100, "insert", 3, _vec(99)), (101, "delete", 7, None)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    from vectordb_from_scratch_spark.streaming import ivf_index_stream_foreach_batch

    stream = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ivf_index_stream_foreach_batch(stream, index_dir, ckpt, cent)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return index_dir, cent


def test_stream_ivf_equals_batch_assignment(spark, ivf_setup):
    """Stream-built index ≡ batch assign_ivf_det over the same fixed
    centroids and final row state — the interchangeability contract."""
    from vectordb_from_scratch_spark.streaming import read_ivf_index

    index_dir, cent = ivf_setup
    live = read_ivf_index(spark, index_dir)
    final = _final_state(spark).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    batch = ann.assign_ivf_det(final, cent)
    got = {(r.id, r.list_id) for r in live.collect()}
    expect = {(r.id, r.list_id) for r in batch.collect()}
    assert got == expect
    assert not any(i == 7 for i, _ in got)          # tombstone applied
    assert len(got) == 19                            # one list per live id


def test_ivf_drift_trigger(spark, ivf_setup):
    """Un-drifted data stays under the rebuild threshold; a batch of
    far-displaced rows pushes weighted mean displacement over it."""
    from vectordb_from_scratch_spark.streaming import (
        ivf_drift,
        ivf_should_rebuild,
        read_ivf_index,
    )

    index_dir, cent = ivf_setup
    live = read_ivf_index(spark, index_dir)
    d0 = {r.list_id: r.displacement for r in ivf_drift(live, cent).collect()}
    assert all(v >= 0 for v in d0.values())
    assert not ivf_should_rebuild(live, cent, threshold=100.0)

    shifted = live.select(
        "id", F.transform("vec", lambda x: x + F.lit(500.0)).alias("vec"), "list_id"
    )
    assert ivf_should_rebuild(shifted, cent, threshold=100.0)


# -- incremental IVF-PQ maintenance (quantized serve index) ----------------


@pytest.fixture()
def ivf_pq_setup(spark, tmp_path):
    """Fixed centroids + frozen PQ codebook built offline from the first
    10 vectors; same 3-batch stream as ivf_setup (inserts, upsert,
    delete)."""
    from vectordb_from_scratch_spark.operators import pq as pqm
    from vectordb_from_scratch_spark.streaming import (
        ivf_pq_index_stream_foreach_batch,
    )

    m_, ks_, d_sub_ = 4, 4, DIM // 4
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(10)], "vec_id long, embedding array<double>"
    )
    cent = ann.build_ivf_det(base, n_lists=3, iters=2)
    cent = spark.createDataFrame(cent.collect(), cent.schema)  # freeze
    cb = pqm.pq_codebook(base, m=m_, ks=ks_, dim=DIM, iters=1)
    cb = spark.createDataFrame(cb.collect(), cb.schema)  # freeze

    src = str(tmp_path / "ivfpq_log_src")
    index_dir = str(tmp_path / "ivfpq_index")
    ckpt = str(tmp_path / "ivfpq_ckpt")
    batches = [
        [(i, "insert", i, _vec(i)) for i in range(0, 10)],
        [(i + 10, "insert", i, _vec(i)) for i in range(10, 20)],
        [(99, "insert", 3, _vec(55)), (100, "insert", 3, _vec(99)), (101, "delete", 7, None)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ivf_pq_index_stream_foreach_batch(
            stream, index_dir, ckpt, cent, cb, m=m_, d_sub=d_sub_
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return index_dir, cent, cb, (m_, ks_, d_sub_)


def test_stream_ivf_pq_equals_batch_index(spark, ivf_pq_setup):
    """Stream-built quantized index ≡ batch pq.ivf_pq_index over the
    same frozen centroids + codebook and final row state."""
    from vectordb_from_scratch_spark.operators import pq as pqm
    from vectordb_from_scratch_spark.operators.ann import assign_ivf_det
    from vectordb_from_scratch_spark.streaming import read_ivf_pq_index

    index_dir, cent, cb, (m_, ks_, d_sub_) = ivf_pq_setup
    live = {
        (r.id, r.list_id, tuple(r.codes))
        for r in read_ivf_pq_index(spark, index_dir).collect()
    }
    final = _final_state(spark).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = assign_ivf_det(final, cent)
    batch = {
        (r.id, r.list_id, tuple(r.codes))
        for r in pqm.ivf_pq_index(
            assigned, cb, m_, d_sub_, id_col="id", vec_col="vec"
        ).collect()
    }
    assert live == batch
    assert not any(i == 7 for i, _, _ in live)  # tombstoned id gone


def test_pq_distortion_drift_signal(spark, ivf_pq_setup):
    """In-distribution data has finite reconstruction error; shifting
    every vector far off the codebook raises mse by orders of
    magnitude — the rebuild cue."""
    from vectordb_from_scratch_spark.streaming import pq_distortion

    _, _, cb, (m_, ks_, d_sub_) = ivf_pq_setup
    final = _final_state(spark).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    base = pq_distortion(final, cb, m_, d_sub_).first()
    assert base.n == final.count() and base.mse >= 0
    shifted = final.select(
        "id", F.transform("vec", lambda x: x + F.lit(100.0)).alias("vec")
    )
    drifted = pq_distortion(shifted, cb, m_, d_sub_).first()
    assert drifted.mse > base.mse * 100
