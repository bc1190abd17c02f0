"""Streaming NEAR-duplicate ingest screen: drop documents that are exact
OR near duplicates (word-shingle Jaccard ≥ threshold) of anything seen
in an earlier micro-batch or earlier in their own batch — the streaming
twin of `operators/dedup.incremental_delivery_report`, extending
`dedup_stream.py`'s exact-only screen to the banded-LSH near-dup layer.

Drop rule (deterministic, documented): a document is dropped when its
fingerprint matches prior state or an earlier id in its batch (exact),
or when its verified Jaccard against ANY earlier-seen document — prior
batch or earlier id in its own batch, kept or dropped — reaches the
threshold. "Near-dup of anything seen" is the production screen shape;
it avoids per-doc sequential dependence inside a batch (a transitive
keep-set would serialize the batch) while staying a pure function of
(batch order, id order).

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

Exactly-once: all three sinks (survivors, fps, bands) are dynamic
partition overwrites keyed by batch_id; a replayed batch excludes its
own state partitions from the probes and overwrites its own output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as X
from ..operators.dedup import _banded_keys, _cap_buckets, _jaccard_verify_kernel
from .dedup_stream import _dir_exists

__all__ = ["neardup_stream_foreach_batch", "read_survivors"]

_PFX_LEN = 2


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

    def merge(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        fp = batch.withColumn("__fp", X.fingerprint(text_col))
        w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
        firsts = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__pfx", F.substring("__fp", 1, _PFX_LEN))
        )
        firsts.persist()
        try:
            prefixes = [r[0] for r in firsts.select("__pfx").distinct().collect()]
            if not prefixes:
                return
            # -- exact screen vs prior state (prefix-pruned) ------------
            if _dir_exists(s, fps_dir):
                probe = s.read.parquet(fps_dir).filter(
                    F.col("pfx").isin(prefixes)
                    & (F.col("batch_id") != F.lit(batch_id))
                )
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
            bb = survivors = None

            # -- near screen: candidates from (batch bands) ⋈ (state
            #    bands ∪ earlier-id batch bands), verify on candidates --
            bb = _banded_keys(
                exact_survivors.select(id_col, text_col),
                num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
                text_col=text_col, id_col=id_col,
            ).persist()
            band_pfxs = [
                r[0]
                for r in bb.select(
                    F.substring("band_key", 1, _PFX_LEN).alias("p")
                ).distinct().collect()
            ]
            cand_parts = []
            if _dir_exists(s, bands_dir) and band_pfxs:
                state_bands = s.read.parquet(bands_dir).filter(
                    F.col("pfx").isin(band_pfxs)
                    & (F.col("batch_id") != F.lit(batch_id))
                )
                if max_bucket_size is not None:
                    # cap on the PRUNED probe (bounded by the batch's
                    # prefix fan-out, never full history)
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
                    F.substring("band_key", 1, _PFX_LEN).alias("pfx"),
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
