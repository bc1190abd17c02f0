"""Streaming near-dup ingest screen: exact AND near duplicates must be
dropped across micro-batches and within a batch, and the accumulated
survivor set must match the batch-side incremental screen run
sequentially over the same batches (stream ≡ batch)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.streaming.neardup_stream import (
    neardup_stream_foreach_batch,
    read_survivors,
)


def _run(spark, src, tmp_path, tag, threshold=0.4):
    out = str(tmp_path / f"out_{tag}")
    state = str(tmp_path / f"state_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = neardup_stream_foreach_batch(
        spark, stream, out, state, ckpt, threshold=threshold
    ).start()
    q.awaitTermination(180)
    return read_survivors(spark, out)


BASE = "alpha7 beta7 gamma7 delta7 epsilon7 zeta7 eta7 theta7"
OTHER = "november kilo lima mike oscar papa quebec romeo"


def test_in_batch_exact_near_and_fresh(spark, tmp_path):
    rows = [
        (0, BASE),
        (1, BASE),                          # exact dup of 0
        (2, BASE + " appended tail words"), # near dup of 0
        (3, OTHER),                         # fresh
    ]
    src = str(tmp_path / "src_one")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(src)
    got = {r.doc_id for r in _run(spark, src, tmp_path, "one").collect()}
    assert got == {0, 3}


def test_cross_batch_near_duplicates_dropped(spark, tmp_path):
    """A near-dup arriving in a LATER batch must hit the band state and
    be dropped; fresh later docs survive; the screen stays idempotent
    in its own batch (replay-safe partition overwrites are exercised by
    availableNow restarts elsewhere)."""
    src = str(tmp_path / "src_multi")
    b1 = spark.createDataFrame(
        [(10, BASE), (11, OTHER)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [
            (20, BASE + " appended tail words"),  # near dup of 10
            (21, BASE),                           # exact dup of 10
            (22, "sierra tango uniform victor whiskey xray yankee zulu"),
        ],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    got = {r.doc_id for r in _run(spark, src, tmp_path, "multi").collect()}
    # file-source batch order is not guaranteed; whichever of the
    # BASE-family files lands first, exactly ONE family member survives
    assert len(got & {10, 20, 21}) == 1
    assert {11, 22} <= got
    assert len(got) == 3


def test_stream_equals_sequential_batch_screen(spark, tmp_path):
    """stream ≡ batch: the survivor set must equal running the batch
    incremental screen sequentially (batch 1's survivors become the
    corpus for batch 2)."""
    from vectordb_from_scratch_spark.operators.dedup import (
        incremental_delivery_report,
    )

    b1_rows = [(0, BASE), (1, OTHER)]
    b2_rows = [
        (10, BASE + " appended tail words"),
        (11, "papa golf hotel india juliett kilo lima mike"),
        (12, OTHER),
    ]
    src = str(tmp_path / "src_seq")
    b1 = spark.createDataFrame(b1_rows, "doc_id long, text string")
    b2 = spark.createDataFrame(b2_rows, "doc_id long, text string")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    got = {r.doc_id for r in _run(spark, src, tmp_path, "seq").collect()}

    # batch reference, order 1→2 (ids chosen so either file order gives
    # the same family representatives up to the family member that wins)
    rep = incremental_delivery_report(b1, b2, threshold=0.4)
    fresh2 = {r.delivery_id for r in rep.collect() if r.verdict == "fresh"}
    expect = {0, 1} | fresh2
    alt = None
    if got != expect:  # file source delivered batch 2 first
        rep = incremental_delivery_report(b2, b1, threshold=0.4)
        fresh1 = {r.delivery_id for r in rep.collect() if r.verdict == "fresh"}
        # within batch 2 itself no near/exact pairs exist
        alt = {10, 11, 12} | fresh1
    assert got == expect or got == alt


def test_empty_microbatch_is_noop_not_crash(spark, tmp_path):
    """An empty micro-batch must early-return cleanly (ADVICE r7: the
    finally block once hit UnboundLocalError on this path, crashing the
    stream) and the next real batch must proceed normally."""
    src = str(tmp_path / "src_empty")
    out = str(tmp_path / "out_empty")
    state = str(tmp_path / "state_empty")
    ckpt = str(tmp_path / "ckpt_empty")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, ckpt, threshold=0.4
        ).start()
        q.awaitTermination(180)
        assert q.exception() is None

    spark.createDataFrame([], "doc_id long, text string").coalesce(1).write.parquet(src)
    run_once()
    assert read_survivors(spark, out).count() == 0

    spark.createDataFrame(
        [(0, BASE), (1, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert {r.doc_id for r in read_survivors(spark, out).collect()} == {0}


def test_compacted_state_screens_like_delta_state(spark, tmp_path):
    """compact_neardup_state folds the per-batch delta partitions into
    bucketed base tables between stream runs; cross-batch exact AND near
    dups must still be dropped when the prior occurrence lives only in
    the compacted base (stream ≡ batch preserved across compactions)."""
    from vectordb_from_scratch_spark.streaming.neardup_stream import (
        compact_neardup_state,
    )

    src = str(tmp_path / "src_compact")
    out = str(tmp_path / "out_compact")
    state = str(tmp_path / "state_compact")
    ckpt = str(tmp_path / "ckpt_compact")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, ckpt, threshold=0.4
        ).start()
        q.awaitTermination(180)

    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    run_once()

    info = compact_neardup_state(spark, state, n_buckets=8)
    assert info["gen"] == 1 and info["n_buckets"] == 8
    assert info["fps_rows"] == 2                 # both batch-1 docs survived
    assert info["bands_rows"] == 8               # 2 docs × 4 bands
    import os

    assert not os.path.exists(state + "/fps")    # delta folded away
    assert os.path.exists(state + "/fps_base_g1")

    spark.createDataFrame(
        [(20, BASE + " appended tail words"),    # near dup of 0 — base only
         (21, BASE),                             # exact dup of 0 — base only
         (22, "sierra tango uniform victor whiskey xray yankee zulu")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1, 22}

    # second compaction folds (gen-1 base ∪ batch-2 delta) into gen 2;
    # idempotent rerun keeps the same row counts
    info2 = compact_neardup_state(spark, state, n_buckets=8)
    assert info2["gen"] == 2 and info2["fps_rows"] == 3
    info3 = compact_neardup_state(spark, state, n_buckets=8)
    assert info3["fps_rows"] == info2["fps_rows"]
    assert info3["bands_rows"] == info2["bands_rows"]

    spark.createDataFrame(
        [(30, "sierra tango uniform victor whiskey xray yankee zulu"),  # exact of 22
         (31, BASE + " appended tail words")],                          # near of 0
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1, 22}


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running the stream from a FRESH checkpoint over the same source
    must overwrite, not duplicate: batch_id-keyed dynamic partition
    overwrites make a full replay converge to the same survivor set."""
    src = str(tmp_path / "src_replay")
    spark.createDataFrame(
        [(0, BASE), (1, OTHER), (2, BASE + " appended tail words")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)

    out = str(tmp_path / "out_replay")
    state = str(tmp_path / "state_replay")

    def run(ck):
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, str(tmp_path / ck), threshold=0.4
        ).start()
        q.awaitTermination(180)

    run("ck1")
    first = sorted(r.doc_id for r in read_survivors(spark, out).collect())
    run("ck2")  # fresh checkpoint => every batch replays
    second = sorted(r.doc_id for r in read_survivors(spark, out).collect())
    assert first == second == [0, 1]


THIRD = "quartz marble granite basalt slate obsidian pumice shale"


def test_compaction_fence_blocks_interleaved_batch(spark, tmp_path):
    """VERDICT r8 #6: a micro-batch arriving while compaction holds the
    intent lease must FAIL (fail-stop), not write deltas the fold could
    lose — and must succeed, with nothing lost, once the lease clears."""
    from vectordb_from_scratch_spark.streaming.neardup_stream import (
        compact_neardup_state,
    )

    src = str(tmp_path / "src_fence")
    out = str(tmp_path / "out_fence")
    state = str(tmp_path / "state_fence")
    ckpt = str(tmp_path / "ckpt_fence")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, ckpt, threshold=0.4
        ).start()
        q.awaitTermination(180)

    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    run_once()

    # simulate an in-flight compaction: plant the intent lease by hand
    spark.createDataFrame([(0,)], "intent_ts long").coalesce(1).write.mode(
        "overwrite"
    ).json(state + "/compaction_intent")
    spark.createDataFrame(
        [(10, THIRD)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    import pytest as _pytest

    with _pytest.raises(StreamingQueryException, match="compaction in progress"):
        run_once()

    # the lease is exclusive now (VERDICT r10 #1): a second compactor
    # must NOT proceed over the planted marker — explicit takeover only
    with _pytest.raises(Exception, match="lease.*already held"):
        compact_neardup_state(spark, state, n_buckets=8)
    compact_neardup_state(spark, state, n_buckets=8, force_takeover=True)
    import os

    assert not os.path.exists(state + "/compaction_intent")
    run_once()  # checkpoint replays the fenced batch
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1, 10}


def test_compaction_snapshot_spares_interleaved_delta(spark, tmp_path, monkeypatch):
    """VERDICT r8 #6, the no-lost-deltas half: a delta partition that
    lands AFTER the compaction fold's snapshot (simulated by shrinking
    the snapshot) must survive the delete, keep screening dups while it
    sits in the delta, and be folded by the next compaction."""
    import os

    from vectordb_from_scratch_spark.streaming import neardup_stream as ns

    src = str(tmp_path / "src_snap")
    out = str(tmp_path / "out_snap")
    state = str(tmp_path / "state_snap")
    ckpt = str(tmp_path / "ckpt_snap")

    def run_once():
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = ns.neardup_stream_foreach_batch(
            spark, stream, out, state, ckpt, threshold=0.4
        ).start()
        q.awaitTermination(180)

    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(10, THIRD)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()  # two micro-batches -> two delta batch_id partitions
    assert {r.doc_id for r in read_survivors(spark, out).collect()} == {0, 1, 10}

    real = ns._list_batch_ids
    straggler = {}

    def shrunk(s, d):
        ids = real(s, d)
        straggler[d] = ids[-1:]
        return ids[:-1]  # the newest delta "landed after the snapshot"

    monkeypatch.setattr(ns, "_list_batch_ids", shrunk)
    info1 = ns.compact_neardup_state(spark, state, n_buckets=8)
    monkeypatch.setattr(ns, "_list_batch_ids", real)

    # the straggler partition survived the delete, on BOTH delta dirs
    for d in (state + "/fps", state + "/bands"):
        for bid in straggler[d]:
            assert os.path.exists(f"{d}/batch_id={bid}"), "delta lost!"
    # base + surviving delta together hold every fingerprint
    n_delta = spark.read.parquet(state + "/fps").count()
    assert info1["fps_rows"] + n_delta == 3
    assert n_delta > 0

    # dups of docs whose state sits base-side AND straggler-side are both
    # still dropped — no fingerprint went missing
    spark.createDataFrame(
        [(20, BASE), (21, THIRD), (22, "umber sienna ochre viridian cobalt azure cerulean teal")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1, 10, 22}

    # the next full-snapshot compaction folds the straggler in
    info2 = ns.compact_neardup_state(spark, state, n_buckets=8)
    assert info2["fps_rows"] == 4
    assert not os.path.exists(state + "/fps")


def test_old_format_state_fails_loudly_and_compaction_migrates(spark, tmp_path):
    """State written before the r9 'x'-guarded pfx partition values has
    bare-hex pfx partitions the current prefix-pruned probes would
    SILENTLY miss — re-admitting previously-seen duplicates (ADVICE r9).
    The format marker must make that fail loudly; running
    compact_neardup_state once migrates (the fold reads whole batch_id
    partitions regardless of pfx form, the base carries no pfx) and the
    screen then drops dups of PRE-upgrade docs again."""
    import os
    import shutil

    from vectordb_from_scratch_spark.streaming.neardup_stream import (
        compact_neardup_state,
    )

    src = str(tmp_path / "src_mig")
    out = str(tmp_path / "out_mig")
    state = str(tmp_path / "state_mig")

    def run(ck):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, str(tmp_path / ck), threshold=0.4
        ).start()
        q.awaitTermination(180)

    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    run("ck_mig1")
    assert os.path.exists(state + "/format")

    # downgrade the state to the pre-r9 layout: strip the marker and
    # rewrite every pfx partition value without the letter guard
    shutil.rmtree(state + "/format")
    for sub in ("fps", "bands"):
        df = spark.read.parquet(f"{state}/{sub}")
        old = df.withColumn("pfx", F.expr("substring(pfx, 2)"))
        tmp_out = str(tmp_path / f"mig_old_{sub}")
        old.write.partitionBy("batch_id", "pfx").parquet(tmp_out)
        shutil.rmtree(f"{state}/{sub}")
        shutil.move(tmp_out, f"{state}/{sub}")

    # a new batch against marker-less delta state must fail loudly,
    # never silently re-admit
    spark.createDataFrame(
        [(10, BASE)], "doc_id long, text string"  # exact dup of pre-upgrade 0
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="predates the state-format marker"):
        run("ck_mig2")

    # migration: one compaction folds the bare-pfx deltas into the
    # (format-independent) bucketed base and stamps the marker
    info = compact_neardup_state(spark, state, n_buckets=8)
    assert info["fps_rows"] == 2 and os.path.exists(state + "/format")

    run("ck_mig3")  # fresh checkpoint replays the dup batch cleanly
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1}  # the pre-upgrade doc's dup was dropped


def test_future_format_state_fails_loudly(spark, tmp_path):
    """A marker with a DIFFERENT version than this code expects must
    fail the stream, not probe state it cannot interpret."""
    src = str(tmp_path / "src_fut")
    state = str(tmp_path / "state_fut")
    spark.createDataFrame(
        [(0, BASE)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame([(99,)], "pfx_format int").coalesce(1).write.json(
        state + "/format"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = neardup_stream_foreach_batch(
        spark, stream, str(tmp_path / "out_fut"), state,
        str(tmp_path / "ck_fut"), threshold=0.4,
    ).start()
    with pytest.raises(Exception, match="pfx_format=99"):
        q.awaitTermination(180)


def test_legacy_spark_json_manifest_read_and_superseded(spark, tmp_path):
    """Pre-r11 states committed their manifest as a delete-then-write
    Spark-JSON overwrite; _read_manifest must still honor it (the
    compacted base keeps screening — dropping it would re-admit every
    dup whose prior occurrence lives only in the base), and the next
    compaction supersedes it with the atomic gen-file commit."""
    import glob
    import os

    from vectordb_from_scratch_spark.streaming.neardup_stream import (
        compact_neardup_state,
    )

    src = str(tmp_path / "src_legacy")
    out = str(tmp_path / "out_legacy")
    state = str(tmp_path / "state_legacy")
    ckpt = str(tmp_path / "ckpt_legacy")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = neardup_stream_foreach_batch(
            spark, stream, out, state, ckpt, threshold=0.4
        ).start()
        q.awaitTermination(180)

    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    run_once()
    compact_neardup_state(spark, state, n_buckets=8)
    # rewrite the manifest in the legacy format (what an r10 state has
    # on disk): Spark-JSON part files, no gen-* marker
    for p in glob.glob(state + "/compaction/gen-*.json"):
        os.remove(p)
    spark.createDataFrame(
        [(8, 1)], "n_buckets int, gen int"
    ).coalesce(1).write.mode("overwrite").json(state + "/compaction")
    assert glob.glob(state + "/compaction/gen-*.json") == []

    # a dup whose prior occurrence lives ONLY in the g1 base must still
    # be dropped — the legacy manifest is honored
    spark.createDataFrame(
        [(21, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {r.doc_id for r in read_survivors(spark, out).collect()}
    assert got == {0, 1}

    # the next compaction commits the atomic gen-file and removes the
    # legacy part files
    info = compact_neardup_state(spark, state, n_buckets=8)
    assert info["gen"] == 2
    assert glob.glob(state + "/compaction/gen-*.json") != []
    assert glob.glob(state + "/compaction/part-*") == []
    run_once()
    assert {r.doc_id for r in read_survivors(spark, out).collect()} == {0, 1}
