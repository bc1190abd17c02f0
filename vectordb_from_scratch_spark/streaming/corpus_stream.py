"""Composed streaming corpus prep: model-quality gate → first-occurrence
exact dedup → deduped output, in ONE ingest stream — the streaming twin
of pipeline_corpus_prep's filter+dedup core (the reference has no
streaming surface; SURVEY.md §2.6).

Composition, not new machinery: the quality model is a pure Column
predicate (textops.quality_p_keep — codegen'd, stateless, streaming-
safe), so it rides the micro-batch BEFORE dedup_stream's stateful merge.
Everything downstream (bucketed digest state, idempotent per-batch
dynamic overwrites, replay safety) is inherited from dedup_stream
unchanged.

Order of stages matters at scale: the quality gate drops rows BEFORE
they are fingerprinted or probed against state — rejected documents
cost one expression evaluation and zero state I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.textops import quality_p_keep
from .dedup_stream import dedup_stream_foreach_batch

__all__ = ["corpus_prep_stream_foreach_batch"]


def corpus_prep_stream_foreach_batch(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
):
    """Wire a document stream through quality-gate + streaming dedup.
    Returns the unstarted writeStream (availableNow trigger), same
    contract as dedup_stream_foreach_batch. Batch equivalence:
    read_deduped(out_dir) == exact_dedup(docs.filter(p_keep >= t))
    restricted to first occurrences (asserted in
    tests/test_streaming_counts.py)."""
    gated = docs_stream.filter(quality_p_keep(text_col) >= threshold)
    return dedup_stream_foreach_batch(
        spark, gated, out_dir, state_dir, checkpoint_dir,
        text_col=text_col, id_col=id_col,
    )
