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


def test_scd2_merge_lease_blocks_second_writer(spark, tmp_path):
    """A foreign merge-intent marker (another stream's checkpoint mid-
    merge on the same dimension) must fail the batch loudly BEFORE any
    rename — the lost-update race where the second swap silently
    discards the first's merge (VERDICT r9 #6)."""
    import json

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    _mk(spark, BATCH1).write.parquet(src)
    with open(dim + ".merge_intent", "w") as f:
        json.dump({"checkpoint": "/somewhere/else", "batch_id": 0}, f)
    stream = spark.readStream.schema(TS_SCHEMA).parquet(src)
    q = scd2_stream_foreach_batch(
        stream, dim, str(tmp_path / "ckpt"),
        keys=["k"], tracked=["seg", "bal"], order_col="ts",
    ).start()
    with pytest.raises(Exception, match="holds the lease"):
        q.awaitTermination(120)
    # operator clears the foreign marker → the stream replays cleanly
    import os

    os.remove(dim + ".merge_intent")
    _run(spark, src, dim, str(tmp_path / "ckpt"))
    assert len(_dim_rows(spark, dim)) == 2
    assert not os.path.exists(dim + ".merge_intent")  # released after swap


def test_scd2_own_stale_lease_self_heals_on_replay(spark, tmp_path):
    """A lease left by THIS stream's crashed attempt at the SAME batch
    must not brick the replay: the merge recognizes its own marker and
    proceeds."""
    import json
    import os

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, BATCH1).write.parquet(src)
    # the crashed attempt: batch 0 of this very checkpoint took the
    # lease and died before the swap
    with open(dim + ".merge_intent", "w") as f:
        json.dump({"checkpoint": ckpt, "batch_id": 0}, f)
    _run(spark, src, dim, ckpt)
    assert len(_dim_rows(spark, dim)) == 2
    assert not os.path.exists(dim + ".merge_intent")


def test_scd2_mid_swap_crash_recovers_not_bootstraps(spark, tmp_path):
    """The swap's crash windows must RESTORE a generation, never silently
    bootstrap an empty dimension (the old bare-except behavior):
    1) target renamed away, complete tmp present → finish the swap;
    2) target renamed away, no complete tmp → restore the old gen."""
    import os
    import shutil

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    _mk(spark, BATCH1).write.parquet(src)
    _run(spark, src, dim, str(tmp_path / "ck1"))
    v1 = _dim_rows(spark, dim)

    # window 1: target→old done, tmp complete, tmp→target not yet
    os.rename(dim, dim + ".old-aaaa0001")
    shutil.copytree(dim + ".old-aaaa0001", dim + ".tmp-bbbb0002")
    _mk(spark, BATCH2).write.mode("append").parquet(src)
    _run(spark, src, dim, str(tmp_path / "ck2"))  # fresh ckpt: replays all
    got = _dim_rows(spark, dim)
    # both batches land on the recovered v1 state: same as the clean run
    assert (1, "A", 15.0, "1996-06-01", "None") in got
    assert (1, "A", 12.0, "1995-01-01", "1996-06-01") in got

    # window 2: target renamed away, tmp INCOMPLETE (no _SUCCESS)
    shutil.rmtree(src)
    shutil.rmtree(str(tmp_path / "ck3"), ignore_errors=True)
    os.rename(dim, dim + ".old-cccc0003")
    os.makedirs(dim + ".tmp-dddd0004")  # junk partial, no _SUCCESS
    _mk(spark, BATCH1).write.parquet(src)
    _run(spark, src, dim, str(tmp_path / "ck3"))
    # the old generation was restored before merging — key 3 from the
    # earlier runs is still present (an empty bootstrap would lose it)
    assert any(r[0] == 3 for r in _dim_rows(spark, dim))


def test_read_dim_external_read_is_pure_and_recover_needs_lease(spark, tmp_path):
    """ADVICE r10: an EXTERNAL read_dim must never perform recovery
    renames (an unleased reader racing a live writer inside the
    two-rename swap window could steal the rename and fail the writer's
    own swap) — it serves the newest complete generation read-only.
    recover=True demands the merge lease."""
    import os
    import shutil

    import pytest

    from vectordb_from_scratch_spark.streaming.scd_stream import read_dim

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    _mk(spark, BATCH1).write.parquet(src)
    _run(spark, src, dim, str(tmp_path / "ck1"))
    want = _dim_rows(spark, dim)

    # mid-swap crash state: target renamed away, complete tmp present
    os.rename(dim, dim + ".old-aaaa0001")
    shutil.copytree(dim + ".old-aaaa0001", dim + ".tmp-bbbb0002")
    got = read_dim(spark, dim)  # default: read-only
    assert got is not None and set(map(tuple, got.collect())) == set(
        map(tuple, spark.read.parquet(dim + ".tmp-bbbb0002").collect())
    )
    # NOTHING was renamed — the writer's swap state is untouched
    assert not os.path.exists(dim)
    assert os.path.exists(dim + ".tmp-bbbb0002")
    assert os.path.exists(dim + ".old-aaaa0001")

    # recovery without the lease is refused loudly
    with pytest.raises(RuntimeError, match="without the merge lease"):
        read_dim(spark, dim, recover=True)

    # with the lease held, recover=True finishes the swap
    with open(dim + ".merge_intent", "w") as f:
        f.write('{"checkpoint": "op", "batch_id": -1}')
    read_dim(spark, dim, recover=True)
    os.remove(dim + ".merge_intent")
    assert os.path.exists(dim) and not os.path.exists(dim + ".tmp-bbbb0002")
    assert _dim_rows(spark, dim) == want
