"""Mergeable sketch operators — the sublinear-memory summaries a
100-TB corpus profile runs when exact aggregation would shuffle more
than it's worth.

First resident: Misra-Gries heavy hitters. The exact vocabulary path
(textops.vocabulary / token top-k) shuffles one row per DISTINCT term —
correct, and fine when the dictionary fits a shuffle. At web scale the
long tail is the problem: billions of near-unique tokens (typos, ids,
urls) each cost a shuffled row to learn they don't matter. Misra-Gries
keeps a fixed `capacity` of counters per partition and decrements all
of them when a new item overflows the budget, so each partition emits
at most `capacity` rows NO MATTER how long the tail is — the shuffle is
p × capacity rows, independent of distinct count. The classic guarantee
survives the distributed merge because per-partition undercounts add:

    est(item) ≤ true(item) ≤ est(item) + err_bound,
    err_bound = Σ_p (Σ of that partition's min-subtraction steps)
    — each decrement step removes its minimum counter value m from
    all capacity+1 counters, so any single item loses at most m per
    step; the kernel emits each partition's Σm exactly, no second
    pass over the data

and every item with true count > err_bound is guaranteed present in
the output (the frequent-items completeness property). When `capacity`
is at least the per-partition distinct count, no decrements happen and
the sketch degrades gracefully into EXACT counts with err_bound = 0 —
which is precisely the configuration the DuckDB oracle pins
value-exactly, while small-capacity behavior is property-tested against
the bound (tests/test_sketches.py).

No counterpart in the reference (a vector store profiles nothing); the
operator exists for the training-data pipeline mandate. Public
algorithm: Misra & Gries 1982, "Finding repeated elements"; merge
bound: Agarwal et al. 2013, "Mergeable summaries".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def _mg_kernel(capacity: int, item_col: str) -> callable:
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decremented = 0
        for pdf in batches:
            for item, cnt in pdf[item_col].value_counts().items():
                c = int(cnt)
                if item in counters:
                    counters[item] += c
                    continue
                counters[item] = c
                if len(counters) > capacity:
                    # classic MG step, batched: subtract the minimum
                    # counter value from everything and drop the zeros
                    # (equivalent to `min` repetitions of the textbook
                    # decrement-all; same invariant, fewer passes)
                    m = min(counters.values())
                    decremented += m  # any ONE item loses ≤ m per step
                    counters = {k: v - m for k, v in counters.items()
                                if v > m}
        yield pd.DataFrame({
            "item": list(counters.keys()) + [None],
            "est": list(counters.values()) + [0],
            "decremented": [0] * len(counters) + [decremented],
        })

    return summarize


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    capacity: int = 4096,
    min_est: int = 1,
) -> DataFrame:
    """Distributed Misra-Gries heavy hitters over `item_col`.

    Per-partition fixed-memory summaries (Arrow-batched mapInPandas,
    ≤ `capacity` counter rows emitted per partition regardless of
    distinct count) merge with one item-keyed partial aggregation; the
    exact total decremented weight rides along as NULL-item rows, so
    the error bound needs NO second pass over the input. Returns
    (item, est_count, err_bound) where
    true_count ∈ [est_count, est_count + err_bound] for every item and
    every item with true_count > err_bound is guaranteed present.
    `min_est` prunes the output tail (est_count ≥ min_est) AFTER the
    bound is computed — the bound is unaffected.

    With capacity ≥ per-partition distinct items the result is exact
    (err_bound = 0), which is what the sketch_heavy_hitters oracle
    pins; undersized capacities trade per-item slack ≤ err_bound for
    the fixed memory/shuffle footprint, property-tested against the
    guarantee."""
    summaries = df.select(F.col(item_col).cast("string").alias("__item")).mapInPandas(
        _mg_kernel(capacity, "__item"), schema="item string, est long, decremented long"
    )
    merged = summaries.groupBy("item").agg(
        F.sum("est").alias("est_count"),
        F.sum("decremented").alias("__dec"),
    )
    bound = merged.agg(
        F.coalesce(F.sum("__dec"), F.lit(0)).alias("err_bound")
    )
    return (
        merged.filter(F.col("item").isNotNull())
        .crossJoin(F.broadcast(bound))
        .filter(F.col("est_count") >= min_est)
        .select("item", "est_count", "err_bound")
    )
