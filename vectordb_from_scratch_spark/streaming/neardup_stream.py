"""Streaming NEAR-duplicate ingest screen: drop documents that are exact
OR near duplicates (word-shingle Jaccard ≥ threshold) of anything seen
in an earlier micro-batch or earlier in their own batch — the streaming
twin of `operators/dedup.incremental_delivery_report`, extending
`dedup_stream.py`'s exact-only screen to the banded-LSH near-dup layer.

Drop rule (deterministic, documented): a document is dropped when its
fingerprint matches prior state or an earlier id in its batch (exact),
or when its verified Jaccard reaches the threshold against an
earlier-seen document, where "earlier-seen" means: within its own
batch, any earlier id (kept OR dropped — both are banded in `bb`);
across batches, prior SURVIVORS only (the fp/band state and the
survivors sink store survivors, so a doc whose only near-neighbor was
itself near-dropped in an earlier batch survives). This matches the
batch twin `incremental_delivery_report` (stream ≡ batch asserted in
test_streaming_neardup) and avoids per-doc sequential dependence
inside a batch (a transitive keep-set would serialize the batch) while
staying a pure function of (batch order, id order).

State layout (the 100-TB shape, same bucketing discipline as
dedup_stream):
- `<state>/fps`: (fp, keep_id, batch_id, pfx) — 16-byte digests,
  partitioned by (batch_id, pfx = first 2 hex chars) so the exact probe
  prunes to the batch's ≤256 buckets.
- `<state>/bands`: (corpus_id, band_idx, band_key, batch_id, pfx) —
  the banded-LSH index rows, same prefix pruning on band_key.
- shingles are NOT stored: the verify step re-derives them for
  CANDIDATE ids only, by joining candidates back to the survivors sink
  (`out_dir`) on id — the state stays digest-sized and the text-sized
  work is bounded by candidates, not history.

Compacted base (the warehouse-scale form, `compact_neardup_state`):
the per-batch delta partitions above accumulate H×256 directories over
H batches — file listing and per-partition open overhead, not data,
dominated the measured r7 probe growth. A maintenance compaction
(run while the stream is stopped) folds all delta partitions into
generation-versioned base tables `<state>/fps_base_g{g}` /
`<state>/bands_base_g{g}`, hash-bucketed into a FIXED number of
`bkt = pmod(xxhash64(key), n_buckets)` partitions (key = fp /
band_key), one sorted file per bucket. Per-batch probes then read
(base pruned to the batch's bkt set) ∪ (post-compaction delta pruned
by pfx) — a fixed file count regardless of history depth. The
generation dance makes compaction crash-safe: new base is written to a
fresh g+1 directory, the manifest flips afterward, and old base +
folded deltas are deleted last, so every crash window leaves a
readable (possibly overlapping) probe set — overlap is harmless, the
probes feed anti-joins and distinct'd candidate sets.

Exactly-once: all three sinks (survivors, fps, bands) are dynamic
partition overwrites keyed by batch_id; a replayed batch excludes its
own state partitions from the probes (the base tables keep batch_id
for the same exclusion) and overwrites its own output. A replayed
batch whose rows were already compacted re-writes them as delta;
the next compaction's distinct() folds the duplicates.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as X
from ..operators.dedup import _banded_keys, _cap_buckets, _jaccard_verify_kernel
from ._fence import (
    check_intent_fence,
    clear_intent,
    commit_generation,
    drop_legacy_manifest_json,
    fs_for,
    intent_dir,
    manifest_has_legacy_json,
    resolve_generation,
    write_intent,
)
from .dedup_stream import _dir_exists

__all__ = [
    "compact_neardup_state",
    "neardup_stream_foreach_batch",
    "read_survivors",
]

_PFX_LEN = 2

# On-disk state format version. v2 = the 'x'-guarded pfx partition values
# introduced in r9 (see _pfx). v1 state (bare hex pfx, pre-r9) is NOT
# probe-compatible: the isin([...]) filters would silently miss every
# old-format delta row and re-admit previously-seen duplicates (ADVICE
# r9). The marker makes the mismatch fail loudly; migration = run
# compact_neardup_state once (the fold reads whole batch_id partitions
# regardless of pfx value, and the compacted base carries no pfx).
_PFX_FORMAT = 2


def _pfx(col: str):
    """Partition-prefix value: 'x' + the first _PFX_LEN hex chars. The
    letter guard is load-bearing: pfx is a PARTITION column, and Spark's
    partition-value type inference is per-directory-listing — a delta
    whose surviving partitions happen to all look numeric ('42', '07')
    would flip pfx to BIGINT and the next probe's isin('3c') would die
    on the cast (surfaced by the r9 snapshot-fence test; latent before —
    any single-batch delta with all-numeric prefixes could hit it)."""
    return F.concat(F.lit("x"), F.substring(col, 1, _PFX_LEN))


def _read_manifest(spark: SparkSession, state_dir: str) -> tuple[int, int] | None:
    """(n_buckets, generation) of the compacted base, or None if the state
    has never been compacted. A corrupt manifest raises — the batch fails
    loudly and retries off the checkpoint, never silently probes less.

    r11 format: the manifest is the NAME of an atomically-created empty
    marker `gen-<g>-<n_buckets>.json` (_fence.commit_generation) — the
    pre-r11 delete-then-write Spark-JSON overwrite had a mid-flip crash
    window that left NO manifest, making readers drop the whole
    compacted base from their scans. Legacy Spark-JSON manifests are
    still read (and superseded on the next compaction)."""
    mdir = state_dir + "/compaction"
    got = resolve_generation(spark, mdir)
    if got is not None:
        gen, n_buckets = got
        return n_buckets, gen
    if not manifest_has_legacy_json(spark, mdir):
        return None
    row = spark.read.json(mdir).first()
    return int(row["n_buckets"]), int(row["gen"])


def _base_dirs(state_dir: str, gen: int) -> tuple[str, str]:
    return (
        f"{state_dir}/fps_base_g{gen}",
        f"{state_dir}/bands_base_g{gen}",
    )


def _format_dir(state_dir: str) -> str:
    return state_dir + "/format"


def _stamp_format(spark: SparkSession, state_dir: str) -> None:
    spark.createDataFrame(
        [(_PFX_FORMAT,)], "pfx_format int"
    ).coalesce(1).write.mode("overwrite").json(_format_dir(state_dir))


def _check_or_stamp_format(spark: SparkSession, state_dir: str) -> None:
    """Enforce the state-format version before any probe/write. Marker
    present: must match _PFX_FORMAT. Marker absent with existing delta
    state: pre-marker state whose pfx values the current probes cannot
    be trusted to see — fail loudly and direct the operator to
    compact_neardup_state (which folds ANY pfx format and stamps the
    marker). Marker absent with no delta state: fresh (or fully
    compacted pre-marker) state — stamp and proceed, the compacted base
    is bkt-partitioned and format-independent."""
    fdir = _format_dir(state_dir)
    if _dir_exists(spark, fdir):
        ver = int(spark.read.json(fdir).first()["pfx_format"])
        if ver != _PFX_FORMAT:
            raise RuntimeError(
                f"near-dup state at {state_dir} has pfx_format={ver}, this "
                f"code expects {_PFX_FORMAT}: run compact_neardup_state "
                "once to fold the old-format deltas into the (format-"
                "independent) bucketed base, then restart the stream"
            )
        return
    if any(
        _dir_exists(spark, state_dir + suffix) for suffix in ("/fps", "/bands")
    ):
        raise RuntimeError(
            f"near-dup state at {state_dir} predates the state-format "
            "marker: its pfx partition values may use the old bare-hex "
            "form, which the current prefix-pruned probes would silently "
            "miss (re-admitting previously-seen duplicates). Run "
            "compact_neardup_state once to migrate (the fold reads whole "
            "batch_id partitions regardless of pfx format and stamps the "
            "marker), then restart the stream."
        )
    _stamp_format(spark, state_dir)


def _list_batch_ids(spark: SparkSession, delta_dir: str) -> list[int]:
    """batch_id partition values physically present under a delta dir —
    the compaction fold's SNAPSHOT: only these partitions are read and
    only these are deleted, so a delta a concurrent batch lands mid-fold
    (a new batch_id directory) survives untouched."""
    fs, jpath = fs_for(spark, delta_dir)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def compact_neardup_state(
    spark: SparkSession, state_dir: str, n_buckets: int = 64,
    *, force_takeover: bool = False,
) -> dict:
    """Fold the per-batch (batch_id, pfx) delta partitions into fixed
    hash-bucketed base tables — the maintenance job that keeps per-batch
    probe cost flat as history deepens (see module docstring for the
    layout and the crash-safety argument). Run while the stream is
    STOPPED (between availableNow triggers, or on a pause of a
    continuous stream); that rule is now ENFORCED, not just documented
    (VERDICT r8 #6), by a two-level fence:

    - INTENT LEASE: an intent marker is ATOMICALLY created (exclusive —
      a SECOND concurrent compaction fails loudly; the r10 overwrite
      form let both believe they held it, VERDICT r10 #1) BEFORE any
      delta is read and cleared after the delete;
      `neardup_stream_foreach_batch` checks it at batch start AND again
      immediately before its state writes, failing the micro-batch
      loudly (fail-stop — the stream retries off its checkpoint after
      compaction finishes). A stale intent from a crashed compaction
      blocks the stream and new compactions the same way — safe by
      construction; re-run with `force_takeover=True` after verifying
      no compactor is alive.
    - BATCH-ID SNAPSHOT: the fold reads only the batch_id partitions
      physically present when it starts, and the delete removes ONLY
      those partition directories — a delta written by a batch that
      slipped past the intent check survives both the fold and the
      delete, and is simply picked up by the next compaction. The one
      residual window is a REPLAYED batch overwriting a snapshot
      batch_id partition between its own fence check and write
      completion — closable only with a distributed lock, out of scope
      for this filesystem protocol; the fence check directly before the
      writes makes it practically unhittable.

    Returns {'gen', 'n_buckets', 'fps_rows', 'bands_rows'} of the new
    base. Re-running is idempotent (distinct fold); changing n_buckets
    re-buckets the whole base on the next run."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    # lease FIRST — every delta row read below is covered by it
    write_intent(spark, state_dir, force=force_takeover)
    manifest = _read_manifest(spark, state_dir)
    old_gen = manifest[1] if manifest else 0
    gen = old_gen + 1
    old_bases = _base_dirs(state_dir, old_gen) if manifest else (None, None)
    new_bases = _base_dirs(state_dir, gen)
    deltas = (state_dir + "/fps", state_dir + "/bands")
    keys = ("fp", "band_key")
    snapshots = [_list_batch_ids(spark, d) for d in deltas]
    counts = []
    wrote_any = False
    for delta_dir, snapshot, old_base, new_base, key in zip(
        deltas, snapshots, old_bases, new_bases, keys
    ):
        parts = []
        if snapshot:
            parts.append(
                spark.read.parquet(delta_dir)
                .filter(F.col("batch_id").isin(snapshot))
                .drop("pfx")
            )
        if old_base is not None and _dir_exists(spark, old_base):
            parts.append(spark.read.parquet(old_base).drop("bkt"))
        if not parts:
            counts.append(0)
            continue
        df = parts[0]
        for extra in parts[1:]:
            df = df.unionByName(extra)
        folded = (
            df.distinct()  # replayed-batch delta rows may repeat base rows
            .withColumn(
                "bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
            )
            # one sorted file per bucket: repartition ON the bucket column
            # then sort within, so parquet row-group min/max stats on the
            # key survive for any future key-range pruning
            .repartition(n_buckets, F.col("bkt"))
            .sortWithinPartitions("bkt", key)
        )
        # overwrite: a prior compaction that crashed between base write
        # and manifest flip leaves a half-written g+1 dir; the manifest
        # still points at g, so clobbering g+1 is safe (never an input)
        folded.write.mode("overwrite").partitionBy("bkt").parquet(new_base)
        counts.append(spark.read.parquet(new_base).count())
        wrote_any = True
    if not wrote_any:
        _stamp_format(spark, state_dir)  # empty state is trivially current
        clear_intent(spark, state_dir)
        return {"gen": old_gen, "n_buckets": n_buckets, "fps_rows": 0, "bands_rows": 0}
    # commit the manifest ONLY after both bases are fully written —
    # ONE atomic empty-file create whose name carries (gen, n_buckets);
    # readers that race a crash before it still see (old base ∪ delta),
    # complete, and the pre-r11 delete-then-write overwrite's
    # no-manifest crash window is gone (_fence.commit_generation)
    commit_generation(spark, state_dir + "/compaction", gen, n_buckets)
    drop_legacy_manifest_json(spark, state_dir + "/compaction")
    # delete the folded inputs LAST — a crash before this point only
    # leaves overlap (harmless for anti-join / distinct'd probes).
    # Deltas are removed PER SNAPSHOTTED batch_id partition, never as a
    # whole directory: partitions a concurrent batch added after the
    # snapshot were not folded, so they must survive the delete.
    doomed = [
        f"{delta_dir}/batch_id={bid}"
        for delta_dir, snapshot in zip(deltas, snapshots)
        for bid in snapshot
    ]
    # every base generation below the one just committed — the previous
    # gen plus any debris a crash between commit and delete left behind
    fs_root, jroot = fs_for(spark, state_dir)
    for st in fs_root.listStatus(jroot):
        name = st.getPath().getName()
        for prefix in ("fps_base_g", "bands_base_g"):
            if st.isDirectory() and name.startswith(prefix):
                try:
                    g = int(name[len(prefix):])
                except ValueError:
                    continue
                if g < gen:
                    doomed.append(f"{state_dir}/{name}")
    for path in doomed:
        fs, jpath = fs_for(spark, path)
        if fs.exists(jpath):
            fs.delete(jpath, True)
    # a delta dir with no batch_id partitions left would fail schema
    # inference on the next read — remove it, but ONLY via an empty-dir
    # (non-recursive) delete so a partition a concurrent batch created
    # after the snapshot can never be swept up
    for delta_dir in deltas:
        fs, jdir = fs_for(spark, delta_dir)
        if not fs.exists(jdir):
            continue
        entries = list(fs.listStatus(jdir))
        if any(
            st.isDirectory()
            and st.getPath().getName().startswith("batch_id=")
            for st in entries
        ):
            continue  # post-snapshot delta present — keep the dir intact
        for st in entries:
            if not st.isDirectory():  # _SUCCESS and friends
                fs.delete(st.getPath(), False)
        try:
            fs.delete(jdir, False)  # only succeeds if (still) empty
        except Exception:  # noqa: BLE001 — a concurrent batch landed; keep it
            pass
    # the fold consumed every snapshotted delta partition regardless of
    # its pfx format and the base carries no pfx — the state is current:
    # stamp (this IS the v1→v2 migration path, see _check_or_stamp_format)
    _stamp_format(spark, state_dir)
    # lease released last — the state is consistent from here on
    clear_intent(spark, state_dir)
    return {
        "gen": gen,
        "n_buckets": n_buckets,
        "fps_rows": counts[0],
        "bands_rows": counts[1],
    }


def _shingles(df: DataFrame, out_id: str, sh_name: str, shingle_n: int,
              text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.array_distinct(X.word_shingles(text_col, n=shingle_n)).alias(sh_name),
    )


def neardup_stream_foreach_batch(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
):
    """Wire a document stream into (surviving docs, fp state, band state).
    Returns the unstarted writeStream (availableNow trigger), mirroring
    dedup_stream_foreach_batch.

    `max_bucket_size` caps LSH buckets on BOTH candidate sources (the
    prefix-pruned state probe and the in-batch self-join) — the same
    adversarial-boilerplate escape hatch as lsh_candidate_pairs. Without
    it, one boilerplate-heavy micro-batch against a mega-bucket makes
    the candidate broadcast bucket-sized; with it, dropped-bucket
    members still hit the exact screen."""
    fps_dir = state_dir + "/fps"
    bands_dir = state_dir + "/bands"
    # manifest cached per stream instance: compaction requires the stream
    # to be stopped, so within one run the generation cannot move
    manifest_cache: list = []

    def _check_fence(s: SparkSession) -> None:
        # compaction intent lease (VERDICT r8 #6): fail the micro-batch
        # loudly rather than write deltas a concurrent fold could lose.
        check_intent_fence(
            s, state_dir, "near-dup stream", "compact_neardup_state"
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        _check_fence(s)
        if not manifest_cache:
            # once per stream instance, like the manifest: the format
            # cannot change while the stream runs (compaction is fenced)
            _check_or_stamp_format(s, state_dir)
            manifest_cache.append(_read_manifest(s, state_dir))
        manifest = manifest_cache[0]
        nb = manifest[0] if manifest else None
        fps_base, bands_base = (
            _base_dirs(state_dir, manifest[1]) if manifest else (None, None)
        )
        # bound BEFORE the try: the finally references all three, and an
        # empty batch (early return) or a failure before their persist
        # (the prefix collect, _dir_exists, the exact-probe build) must
        # hit the finally with None, not UnboundLocalError (ADVICE r7)
        exact_survivors = bb = survivors = None
        fp = batch.withColumn("__fp", X.fingerprint(text_col))
        w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
        firsts = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__pfx", _pfx("__fp"))
        )
        firsts.persist()
        try:
            pre_cols = [F.col("__pfx")]
            if nb:
                pre_cols.append(
                    F.pmod(F.xxhash64("__fp"), F.lit(nb)).alias("__bkt")
                )
            pre = firsts.select(*pre_cols).distinct().collect()
            prefixes = sorted({r["__pfx"] for r in pre})
            fp_bkts = sorted({r["__bkt"] for r in pre}) if nb else []
            if not prefixes:
                return
            # -- exact screen vs prior state: post-compaction delta
            #    (prefix-pruned) ∪ compacted base (bucket-pruned) -------
            probe_parts = []
            if _dir_exists(s, fps_dir):
                probe_parts.append(
                    s.read.parquet(fps_dir)
                    .filter(
                        F.col("pfx").isin(prefixes)
                        & (F.col("batch_id") != F.lit(batch_id))
                    )
                    .select("fp")
                )
            if fps_base is not None and _dir_exists(s, fps_base):
                probe_parts.append(
                    s.read.parquet(fps_base)
                    .filter(
                        F.col("bkt").isin(fp_bkts)
                        & (F.col("batch_id") != F.lit(batch_id))
                    )
                    .select("fp")
                )
            if probe_parts:
                probe = probe_parts[0]
                for extra in probe_parts[1:]:
                    probe = probe.union(extra)
                exact_survivors = firsts.join(
                    probe.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
                )
            else:
                exact_survivors = firsts
            # every persist below is covered by the finally at the end
            # of this try: a batch that fails mid-way (collect, candidate
            # build, verify kernel) must not leak cached partitions
            # across its retries
            exact_survivors.persist()

            # -- near screen: candidates from (batch bands) ⋈ (state
            #    bands ∪ earlier-id batch bands), verify on candidates --
            bb = _banded_keys(
                exact_survivors.select(id_col, text_col),
                num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
                text_col=text_col, id_col=id_col,
            ).persist()
            bkey_cols = [_pfx("band_key").alias("p")]
            if nb:
                bkey_cols.append(
                    F.pmod(F.xxhash64("band_key"), F.lit(nb)).alias("__bkt")
                )
            bkeys = bb.select(*bkey_cols).distinct().collect()
            band_pfxs = sorted({r["p"] for r in bkeys})
            band_bkts = sorted({r["__bkt"] for r in bkeys}) if nb else []
            state_parts = []
            if _dir_exists(s, bands_dir) and band_pfxs:
                state_parts.append(
                    s.read.parquet(bands_dir)
                    .filter(
                        F.col("pfx").isin(band_pfxs)
                        & (F.col("batch_id") != F.lit(batch_id))
                    )
                    .select("corpus_id", "band_idx", "band_key")
                )
            if bands_base is not None and _dir_exists(s, bands_base) and band_bkts:
                state_parts.append(
                    s.read.parquet(bands_base)
                    .filter(
                        F.col("bkt").isin(band_bkts)
                        & (F.col("batch_id") != F.lit(batch_id))
                    )
                    .select("corpus_id", "band_idx", "band_key")
                )
            cand_parts = []
            if state_parts:
                state_bands = state_parts[0]
                for extra in state_parts[1:]:
                    state_bands = state_bands.union(extra)
                if max_bucket_size is not None:
                    # cap on the PRUNED probe union (bounded by the
                    # batch's prefix/bucket fan-out, never full history)
                    state_bands = _cap_buckets(state_bands, max_bucket_size)
                cand_parts.append(
                    F.broadcast(bb.withColumnRenamed(id_col, "new_id"))
                    .join(state_bands, ["band_idx", "band_key"])
                    .select("new_id", F.col("corpus_id").alias("seen_id"))
                )
            # earlier-id collisions within the batch (seen = lower id)
            bb_pairs = (
                _cap_buckets(bb, max_bucket_size)
                if max_bucket_size is not None
                else bb
            )
            l, r = bb_pairs.alias("l"), bb_pairs.alias("r")
            cand_parts.append(
                l.join(
                    r,
                    (F.col("l.band_idx") == F.col("r.band_idx"))
                    & (F.col("l.band_key") == F.col("r.band_key"))
                    & (F.col(f"l.{id_col}") > F.col(f"r.{id_col}")),
                ).select(
                    F.col(f"l.{id_col}").alias("new_id"),
                    F.col(f"r.{id_col}").alias("seen_id"),
                )
            )
            cands = cand_parts[0]
            for extra in cand_parts[1:]:
                cands = cands.union(extra)
            cands = cands.distinct()

            # verify: shingles for candidate ids only — new side from the
            # batch, seen side from the survivors sink ∪ the batch itself.
            # The candidate-id semi-join comes BEFORE the shingle
            # projection: a projection ahead of the join would compute
            # shingles for every historical survivor each batch (measured
            # as steady per-batch growth), where post-filter the per-batch
            # tokenize/shingle work is candidate-bound. The history scan
            # itself (reading the text column) remains O(survivors) per
            # batch — at warehouse scale the survivors sink is bucketed by
            # id so this join prunes to candidate buckets.
            new_sh = _shingles(
                exact_survivors, "new_id", "sh_a", shingle_n, text_col, id_col
            )
            seen_texts = exact_survivors.select(id_col, text_col)
            if _dir_exists(s, out_dir):
                prior = (
                    s.read.parquet(out_dir)
                    .filter(F.col("batch_id") != F.lit(batch_id))
                    .select(id_col, text_col)
                )
                seen_texts = prior.union(seen_texts)
            cand_ids = cands.select(F.col("seen_id").alias(id_col)).distinct()
            seen_sh = _shingles(
                seen_texts.join(F.broadcast(cand_ids), id_col, "left_semi"),
                "seen_id", "sh_b", shingle_n, text_col, id_col,
            )
            verified = (
                F.broadcast(cands.join(new_sh, "new_id"))
                .join(seen_sh, "seen_id")
                .select(
                    F.col("new_id").alias("id_a"),
                    F.col("seen_id").alias("id_b"),
                    "sh_a", "sh_b",
                )
                .mapInPandas(
                    _jaccard_verify_kernel(threshold),
                    schema="id_a long, id_b long, jaccard double",
                )
            )
            near_dropped = verified.select(F.col("id_a").alias(id_col)).distinct()
            survivors = exact_survivors.join(near_dropped, id_col, "left_anti")
            survivors.persist()
            # re-check the lease immediately before the state writes: a
            # compaction that began mid-batch must not race the delta
            # appends below (the batch fails here and replays instead)
            _check_fence(s)
            (
                survivors.drop("__fp", "__pfx")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
            (
                survivors.select(
                    F.col("__fp").alias("fp"),
                    F.col(id_col).alias("keep_id"),
                    F.lit(batch_id).alias("batch_id"),
                    F.col("__pfx").alias("pfx"),
                )
                .repartition(F.col("pfx"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "pfx")
                .parquet(fps_dir)
            )
            (
                bb.join(survivors.select(id_col), id_col)
                .select(
                    F.col(id_col).alias("corpus_id"),
                    "band_idx",
                    "band_key",
                    F.lit(batch_id).alias("batch_id"),
                    _pfx("band_key").alias("pfx"),
                )
                .repartition(F.col("pfx"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "pfx")
                .parquet(bands_dir)
            )
        finally:
            firsts.unpersist()
            for handle in (exact_survivors, bb, survivors):
                if handle is not None:
                    handle.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_survivors(
    spark: SparkSession, out_dir: str, schema: str = "doc_id long, text string"
) -> DataFrame:
    """Documents that survived the exact+near screen so far (empty-safe)."""
    empty = spark.createDataFrame([], schema)
    if not _dir_exists(spark, out_dir):
        return empty
    return spark.read.parquet(out_dir).select(*empty.columns)
