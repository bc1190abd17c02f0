"""Session-scoped cache registry for persisted pipeline intermediates.

Spark plans are trees: a DataFrame consumed by two downstream branches
re-derives from the raw scan in each, so multi-level pipelines (dedup
shingle tables, corpus-prep stages, rollup cascades) persist their hot
intermediate and register the handle here. `release_caches()` between
queries reclaims executor storage — long-lived sessions would otherwise
accumulate cached blocks until eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["track", "checkpoint_tracked", "release_caches", "sweep_persistent_rdds"]

_CACHE_HANDLES: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHE_HANDLES.append(df)
    return df


def checkpoint_tracked(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + register the handle. Checkpoint blocks are RDD
    cache blocks that `DataFrame.unpersist()` cannot reach (the handle
    is kept anyway for bookkeeping, and unpersist() on it is a no-op);
    they are reclaimed by `sweep_persistent_rdds`. Long sessions that
    run many checkpoint-using queries (graph iteration, CC, MMR, BPE)
    otherwise accumulate block-manager pressure — the round-4 bench
    recorded 2-5× timing spikes from exactly this leak."""
    out = df.localCheckpoint(eager)
    _CACHE_HANDLES.append(out)
    return out


def release_caches() -> None:
    """Unpersist every tracked cache in this session. Safe to call
    between queries; the next call simply re-caches. Does NOT reclaim
    localCheckpoint blocks — pair with `sweep_persistent_rdds` in
    between-query hygiene (bench.py does)."""
    while _CACHE_HANDLES:
        _CACHE_HANDLES.pop().unpersist()


def sweep_persistent_rdds(spark=None) -> int:
    """Unpersist EVERY persistent RDD in the session — the backstop that
    reclaims what release_caches cannot: localCheckpoint() blocks and any
    cache that bypassed track(). Returns the number of RDDs swept.

    Safe between queries: DataFrame caches evicted this way recompute on
    next use (InMemoryRelation tolerates missing partitions), and a
    checkpoint handle is never reused across queries. Do NOT call while
    a query that checkpointed is still mid-flight."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rdd_id in list(jmap):
        try:
            jmap[rdd_id].unpersist(False)
            n += 1
        except Exception:  # noqa: BLE001 — a racing removal is fine
            pass
    return n
