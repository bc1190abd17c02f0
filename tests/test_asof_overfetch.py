"""As-of join semantics and reference-exact over-fetch filtered search."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import knn
from vectordb_from_scratch_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05")),
            (2, "A", _ts("2024-01-01 10:00:00")),   # exactly at a quote ts
            (3, "B", _ts("2024-01-01 09:59:00")),   # before any B quote
            (4, "C", _ts("2024-01-01 12:00:00")),   # key with no quotes at all
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:58"), 100.0),
            ("A", _ts("2024-01-01 10:00:00"), 101.0),
            ("A", _ts("2024-01-01 10:00:04"), 102.0),
            ("A", _ts("2024-01-01 10:00:06"), 103.0),  # after every trade
            ("B", _ts("2024-01-01 10:30:00"), 50.0),
        ],
        "sym string, qts timestamp, price double",
    )
    return trades, quotes


def test_asof_join_picks_latest_at_or_before(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.price_asof
        for r in asof_join(
            trades, quotes, on="sym", left_time="ts", right_time="qts",
            right_cols=["price"],
        ).collect()
    }
    assert out[1] == 102.0   # 10:00:04 is the latest ≤ 10:00:05
    assert out[2] == 101.0   # quote AT the trade timestamp is eligible (≤)
    assert out[3] is None    # no quote before 09:59 for B
    assert out[4] is None    # key never quoted


def test_asof_join_row_count_preserved(trades_quotes):
    trades, quotes = trades_quotes
    res = asof_join(trades, quotes, on="sym", left_time="ts", right_time="qts",
                    right_cols=["price"])
    assert res.count() == trades.count()  # left-join shape: no fan-out, no loss


def test_overfetch_can_starve_prefilter_cannot(embeddings):
    """The reference's over-fetch post-filter can return <k under selective
    filters (src/storage.rs:268-287); the pre-filter form cannot."""
    probes = embeddings.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    pred = F.col("label") == 2
    k = 10
    n_label2 = embeddings.filter(pred).count()
    assert n_label2 >= k

    starved = knn.knn_filtered_overfetch(embeddings, probes, predicate=pred, k=k, overfetch=3)
    exact = knn.knn_filtered(embeddings, probes, predicate=pred, k=k)
    n_starved, n_exact = starved.count(), exact.count()
    assert n_exact == k
    assert n_starved <= n_exact  # over-fetch keeps only label-2 rows among top-30 overall
    # both return only matching rows, ranked ascending
    ids = [r.id for r in starved.orderBy("rank").collect()]
    labels = {r.label for r in embeddings.filter(F.col("vec_id").isin(ids)).collect()}
    assert labels <= {2}


def test_asof_directions_match_pandas_merge_asof(spark):
    """All three directions agree with pandas merge_asof on a
    no-duplicate-timestamp dataset (the deterministic common core)."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators.asof import asof_join

    lrows = [(1, 5), (1, 14), (1, 30), (2, 7), (3, 9)]
    rrows = [(1, 4, 40.0), (1, 10, 100.0), (1, 22, 220.0), (2, 8, 80.0)]
    left = spark.createDataFrame(lrows, "k long, t long")
    right = spark.createDataFrame(rrows, "k long, t long, v double")
    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    for direction in ("backward", "forward", "nearest"):
        got = {
            (r.k, r.t): r.v_asof
            for r in asof_join(
                left, right, on="k", left_time="t", right_time="t",
                right_cols=["v"], direction=direction,
            ).collect()
        }
        want_df = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
        want = {
            (r.k, r.t): (None if pd.isna(r.v) else r.v)
            for r in want_df.itertuples()
        }
        assert got == want, f"direction={direction}: {got} != {want}"


def test_asof_nearest_tie_resolves_backward(spark):
    from vectordb_from_scratch_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 12, 2.0)], "k long, t long, v double"
    )
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["v"], direction="nearest",
    ).collect()
    assert got[0].v_asof == 1.0  # equidistant -> backward (pandas rule)
