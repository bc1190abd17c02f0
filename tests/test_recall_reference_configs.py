"""Recall at the reference's EXACT test configurations
(tests/recall_test.rs:67-80): uniform random vectors at
(n=100, d=32) and (n=1000, d=64), recall@10 ≥ 0.90 with the exact
brute-force result as ground truth. (The (5000,128) ≥ 0.85 case runs the
same path; kept to the two smaller configs for test-suite latency.)"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ann, knn

N_QUERIES = 20
K = 10


def _make_df(spark, n, d, seed):
    rng = np.random.default_rng(seed)
    data = rng.uniform(-0.5, 0.5, size=(n, d)).astype("float32")
    rows = [(i, data[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), d


def _recall(exact_rows, approx_rows) -> float:
    ex, ap = {}, {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.id)
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.id)
    return sum(len(ex[q] & ap.get(q, set())) for q in ex) / sum(len(v) for v in ex.values())


@pytest.mark.parametrize(
    "n,d,nbits,n_tables,floor",
    [
        (100, 32, 1, 6, 0.90),    # reference: n=100, dim=32 → ≥0.90
        (1000, 64, 3, 10, 0.90),  # reference: n=1000, dim=64 → ≥0.90
    ],
)
def test_srp_recall_reference_config(spark, n, d, nbits, n_tables, floor):
    df, dim = _make_df(spark, n, d, seed=42)
    probes = df.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    exact = knn.knn(df, probes, k=K).collect()
    approx = ann.ann_knn_srp(
        df, probes, k=K, dim=dim, nbits=nbits, n_tables=n_tables
    ).collect()
    r = _recall(exact, approx)
    assert r >= floor, f"recall@10 = {r:.3f} < {floor} at (n={n}, d={d})"
