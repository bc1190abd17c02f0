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

__all__ = ["track", "release_caches"]

_CACHE_HANDLES: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHE_HANDLES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked cache in this session. Safe to call
    between queries; the next call simply re-caches."""
    while _CACHE_HANDLES:
        _CACHE_HANDLES.pop().unpersist()
