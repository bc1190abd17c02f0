"""Filtered ANN search — the metadata-filter compiler composed with the
SRP and IVF index probes (reference search_with_filter over any Index,
src/storage.rs:249-290 / src/index.rs:20), plus the reference-exact
over-fetch twin and its starvation behavior (src/storage.rs:268-287)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ann, filters, knn

DIM = 4


@pytest.fixture(scope="module")
def ray_table(spark):
    """40 vectors on the same ray from the origin (scale 1..40), so every
    SRP table puts ALL rows (and any positive-scale probe) in one bucket:
    candidate recall is 1.0 and distance ordering is exactly the scale
    ordering. Only the 10 FARTHEST rows (scale 31..40) carry label=good —
    the adversarial shape for over-fetch filtering: the unfiltered top-3k
    is saturated with label=bad rows."""
    rows = [
        (s, [float(s), float(s), float(s), float(s)],
         "good" if s > 30 else "bad")
        for s in range(1, 41)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )


@pytest.fixture(scope="module")
def ray_probe(spark):
    return spark.createDataFrame(
        [(0, [0.5, 0.5, 0.5, 0.5])],
        "query_id long, query_embedding array<float>",
    )


def _good(c="label"):
    return F.col(c) == "good"


def test_prefilter_srp_returns_k_qualifying(ray_table, ray_probe):
    res = ann.ann_knn_srp(
        ray_table, ray_probe, k=3, dim=DIM, nbits=2, n_tables=1,
        predicate=_good(),
    ).collect()
    # nearest qualifying rows are scales 31, 32, 33 — full k, no starvation
    assert [r.id for r in res] == [31, 32, 33]
    assert [r.rank for r in res] == [1, 2, 3]


def test_overfetch_twin_starves_like_reference(ray_table, ray_probe):
    # reference semantics: fetch 3k=9 nearest IGNORING the filter (scales
    # 1..9, all label=bad), post-filter → ZERO rows despite 10 qualifying
    # rows sitting in the probed bucket.
    pre = ann.ann_knn_srp(ray_table, ray_probe, k=9, dim=DIM, nbits=2, n_tables=1)
    res = ann.ann_filtered_overfetch(pre, ray_table, _good(), k=3)
    assert res.count() == 0


def test_overfetch_twin_partial_fill(ray_table, ray_probe):
    # widen the over-fetch to 35: top-35 unfiltered = scales 1..35, of
    # which 31..35 qualify → 3 rows survive, in distance order, ranks
    # renumbered 1..3 — exactly the reference's post-filter loop.
    pre = ann.ann_knn_srp(ray_table, ray_probe, k=35, dim=DIM, nbits=2, n_tables=1)
    res = ann.ann_filtered_overfetch(pre, ray_table, _good(), k=10).collect()
    assert [r.id for r in res] == [31, 32, 33, 34, 35]
    assert [r.rank for r in res] == [1, 2, 3, 4, 5]


def test_indexed_filtered_matches_inline_prefilter(ray_table, ray_probe):
    idx = ann.srp_index(ray_table, dim=DIM, nbits=2, n_tables=1)
    res = ann.ann_knn_srp_indexed(
        idx, ray_probe, k=3, dim=DIM, nbits=2, n_tables=1,
        predicate=_good(), attrs=ray_table, attrs_id_col="vec_id",
    ).collect()
    assert [r.id for r in res] == [31, 32, 33]


def test_indexed_filtered_requires_attrs_with_predicate(ray_table, ray_probe):
    idx = ann.srp_index(ray_table, dim=DIM, nbits=2, n_tables=1)
    with pytest.raises(ValueError, match="predicate and attrs"):
        ann.ann_knn_srp_indexed(
            idx, ray_probe, k=3, dim=DIM, nbits=2, n_tables=1, predicate=_good()
        )


def test_ivf_filtered_full_probe_equals_exact_filtered(ray_table, ray_probe):
    # with every list probed, filtered IVF must equal exact filtered k-NN
    cent = ann.build_ivf_det(ray_table, n_lists=2, iters=2)
    v = ray_table.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, cent)
    approx = ann.ann_knn_ivf(
        assigned, cent, ray_probe, k=5, n_probe=2, id_col="id", vec_col="vec",
        predicate=_good(), attrs=ray_table, attrs_id_col="vec_id",
    )
    exact = knn.knn_filtered(ray_table, ray_probe, _good(), k=5)
    a = [(r.id, r.rank) for r in approx.collect()]
    e = [(r.id, r.rank) for r in exact.collect()]
    assert a == e


def test_filtered_results_all_satisfy_predicate(embeddings):
    probes = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    res = ann.ann_knn_srp(
        embeddings, probes, k=10, dim=64, nbits=4, n_tables=2,
        predicate=F.col("label") == 1,
    )
    bad = res.join(
        embeddings.filter(F.col("label") != 1).select(F.col("vec_id").alias("id")),
        "id",
    )
    assert bad.count() == 0


def test_filtered_equals_postfiltered_rerank_at_full_k(embeddings):
    """With k ≥ table size the pre-filter form must equal 'unfiltered ANN,
    then filter + re-rank' — same candidate pool, same ordering."""
    probes = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    n = embeddings.count()
    filtered = ann.ann_knn_srp(
        embeddings, probes, k=n, dim=64, nbits=4, n_tables=2,
        predicate=F.col("label") == 1,
    )
    unfiltered = ann.ann_knn_srp(embeddings, probes, k=n, dim=64, nbits=4, n_tables=2)
    refiltered = (
        unfiltered.join(
            embeddings.filter(F.col("label") == 1).select(F.col("vec_id").alias("id")),
            "id", "left_semi",
        )
    )
    got = {(r.query_id, r.id) for r in filtered.collect()}
    want = {(r.query_id, r.id) for r in refiltered.collect()}
    assert got == want


def test_compile_filter_composes_with_srp(ray_table, ray_probe):
    """The reference's serde filter-spec shape drives the ANN path
    end-to-end (filters.compile_filter → Column → semi-join)."""
    attrs = ray_table.withColumn(
        "metadata", F.create_map(F.lit("label"), F.col("label"))
    )
    pred = filters.compile_filter({"eq": {"field": "label", "value": "good"}})
    idx = ann.srp_index(ray_table, dim=DIM, nbits=2, n_tables=1)
    res = ann.ann_knn_srp_indexed(
        idx, ray_probe, k=3, dim=DIM, nbits=2, n_tables=1,
        predicate=pred, attrs=attrs, attrs_id_col="vec_id",
    ).collect()
    assert [r.id for r in res] == [31, 32, 33]


def test_prefilter_predicate_pushes_to_parquet_scan(spark):
    """Plan quality: the ANN pre-filter predicate must reach the parquet
    scan as a pushed filter, not evaluate post-scan."""
    from vectordb_from_scratch_spark.sources import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = e.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    res = ann.ann_knn_srp(
        e, probes, k=5, dim=64, nbits=4, n_tables=2,
        predicate=F.col("label") == 1,
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,1)]" in plan


def test_filter_composes_with_quantized_ivf(ray_table, ray_probe):
    """The full serve composition: metadata filter × IVF routing × SQ8
    codes × exact re-rank — results must match exact filtered k-NN when
    every list is probed and the shortlist covers the candidates."""
    cent = ann.build_ivf_det(ray_table, n_lists=2, iters=2)
    v = ray_table.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, cent)
    idx = ann.ivf_sq8_index(assigned)
    res = ann.ann_knn_ivf_sq8(
        idx, cent, ray_probe, k=3, n_probe=2, rerank=40,
        raw=assigned.select("id", "vec"),
        predicate=_good(), attrs=ray_table, attrs_id_col="vec_id",
    ).collect()
    assert [r.id for r in res] == [31, 32, 33]
    assert [r.rank for r in res] == [1, 2, 3]
