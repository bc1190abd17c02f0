"""Misra-Gries heavy hitters: the exact-regime equality the oracle pins
plus the sketch guarantees the oracle CAN'T (undersized capacity):
  est ≤ true ≤ est + err_bound for every reported item, and
  every item with true > err_bound is present (completeness).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from vectordb_from_scratch_spark.operators.sketches import heavy_hitters


def _zipf_corpus(n=20_000, n_items=500, seed=7):
    rng = np.random.default_rng(seed)
    # zipf-ish skew: a few heavy items over a long tail
    items = [f"t{int(x)}" for x in rng.zipf(1.3, size=n) % n_items]
    return items


@pytest.fixture(scope="module")
def corpus(spark_global):
    items = _zipf_corpus()
    df = spark_global.createDataFrame(
        [(i,) for i in items], "item string"
    ).repartition(8)
    return df, Counter(items)


def test_heavy_hitters_exact_when_capacity_sufficient(corpus):
    df, true = corpus
    got = {r.item: (r.est_count, r.err_bound)
           for r in heavy_hitters(df, "item", capacity=100_000).collect()}
    assert got  # non-trivial corpus
    for item, (est, err) in got.items():
        assert err == 0
        assert est == true[item]
    assert set(got) == set(true)  # min_est=1 keeps everything


def test_heavy_hitters_bound_holds_undersized(corpus):
    df, true = corpus
    rows = heavy_hitters(df, "item", capacity=16).collect()
    assert rows
    err = rows[0].err_bound
    assert err > 0  # decrements definitely happened at capacity 16
    for r in rows:
        assert r.err_bound == err  # one global bound
        assert r.est_count <= true[r.item] <= r.est_count + err
    # completeness: anything truly heavier than the bound must appear
    reported = {r.item for r in rows}
    for item, cnt in true.items():
        if cnt > err:
            assert item in reported, (item, cnt, err)


def test_heavy_hitters_min_est_prunes_after_bound(corpus):
    df, _ = corpus
    all_rows = heavy_hitters(df, "item", capacity=16).collect()
    pruned = heavy_hitters(df, "item", capacity=16, min_est=50).collect()
    assert {r.item for r in pruned} == {
        r.item for r in all_rows if r.est_count >= 50
    }
    # pruning must not change the error bound
    assert pruned[0].err_bound == all_rows[0].err_bound
