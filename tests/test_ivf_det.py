"""Deterministic IVF (build_ivf_det / assign_ivf_det): the value-exact
k-means the MLlib path is spec'd against.

The property that earns the oracle twin: centroids are a function of the
DATA only — re-running on any repartitioning of the same table yields
bit-identical doubles, because every summation folds a FIXED tree keyed
on ids, never Spark's partition order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ann


def _collect_centroids(cent_df):
    return {
        r["list_id"]: tuple(r["cvec"])
        for r in cent_df.orderBy("list_id").collect()
    }


def test_centroids_partition_invariant(embeddings):
    """Bitwise-equal centroids regardless of input partitioning — the
    determinism claim the DuckDB oracle depends on."""
    base = _collect_centroids(ann.build_ivf_det(embeddings, n_lists=8, iters=2))
    shuffled = _collect_centroids(
        ann.build_ivf_det(embeddings.repartition(7, "vec_id"), n_lists=8, iters=2)
    )
    assert base == shuffled  # exact float equality, not approx


def test_centroids_block_tree_bounds_groups(embeddings):
    """A tiny block size changes the reduction tree (more levels-1 groups)
    but NOT the ids in it — results must stay identical only when the
    tree is identical, so same block ⇒ same result even when the block
    is small enough to engage multiple blocks."""
    a = _collect_centroids(ann.build_ivf_det(embeddings, n_lists=4, iters=1, block=64))
    b = _collect_centroids(
        ann.build_ivf_det(embeddings.repartition(13), n_lists=4, iters=1, block=64)
    )
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    """n_lists > distinct points: every point assigns to one list, the
    rest must retain their init centroids (MLlib KMeans convention)."""
    rows = [(i, [1.0, 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = ann.build_ivf_det(df, n_lists=3, iters=1)
    got = _collect_centroids(cent)
    assert len(got) == 3
    # all points identical → every list's centroid is that same point
    # (winners get the mean of identical points; losers keep their init,
    # which is also that point)
    assert all(v == (1.0, 1.0) for v in got.values())


def test_knn_over_det_build_self_match(embeddings):
    cent = ann.build_ivf_det(embeddings, n_lists=8, iters=2)
    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, cent)
    probes = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    res = ann.ann_knn_ivf(
        assigned, cent, probes, k=5, n_probe=4, id_col="id", vec_col="vec"
    ).collect()
    rank1 = {r["query_id"]: (r["id"], r["distance"]) for r in res if r["rank"] == 1}
    # each probe's own vector lives in the probed list → exact self-match
    assert rank1 == {qid: (qid, 0.0) for qid in range(3)}


def test_build_init_is_partial_topk_not_global_sort(embeddings):
    """The md5-seeded init must compile to TakeOrderedAndProject
    (per-partition top-n_lists, driver merge) — a global-sort or a
    full-table single-partition window here would be the 100-TB
    bottleneck of the whole build."""
    cent = ann.build_ivf_det(embeddings, n_lists=8, iters=0)
    plan = cent._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_assign_plan_broadcasts_centroids(embeddings):
    """The vectors×centroids join must be a broadcast nested loop over the
    n_lists-row side — never a shuffle of the big table, never a real
    cartesian product."""
    cent = ann.build_ivf_det(embeddings, n_lists=4, iters=1)
    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    plan = (
        ann.assign_ivf_det(v, cent)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# -- IVF-SQ8: the quantized serve path (compression ladder × index) --------


def test_ivf_sq8_codes_are_byte_range(embeddings):
    cent = ann.build_ivf_det(embeddings, n_lists=4, iters=1)
    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    idx = ann.ivf_sq8_index(ann.assign_ivf_det(v, cent))
    stats = idx.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert stats.lo >= 0 and stats.hi <= 255
    assert set(idx.columns) == {"id", "list_id", "codes", "vmin", "scale"}


def test_ivf_sq8_full_rerank_equals_raw_ivf(embeddings):
    """With a shortlist at least as deep as the probed lists, the exact
    re-rank must reproduce the UNQUANTIZED IVF result exactly — the
    two-stage design loses nothing when rerank covers the candidates."""
    n = embeddings.count()
    cent = ann.build_ivf_det(embeddings, n_lists=4, iters=1)
    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, cent)
    idx = ann.ivf_sq8_index(assigned)
    probes = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    quant = ann.ann_knn_ivf_sq8(
        idx, cent, probes, k=5, n_probe=2, rerank=n, raw=assigned.select("id", "vec")
    )
    exact = ann.ann_knn_ivf(
        assigned, cent, probes, k=5, n_probe=2, id_col="id", vec_col="vec"
    )
    q = [(r.query_id, r.id, r.rank) for r in quant.collect()]
    e = [(r.query_id, r.id, r.rank) for r in exact.collect()]
    assert sorted(q) == sorted(e)


def test_ivf_sq8_code_only_search_is_close(embeddings):
    """Code-only (no re-rank) search: asymmetric distances are within SQ8
    reconstruction error, so recall@5 vs the raw IVF probe should be
    high on real embeddings."""
    cent = ann.build_ivf_det(embeddings, n_lists=4, iters=1)
    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, cent)
    idx = ann.ivf_sq8_index(assigned)
    probes = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    quant = ann.ann_knn_ivf_sq8(idx, cent, probes, k=5, n_probe=2)
    exact = ann.ann_knn_ivf(
        assigned, cent, probes, k=5, n_probe=2, id_col="id", vec_col="vec"
    )
    qs = {(r.query_id, r.id) for r in quant.collect()}
    es = {(r.query_id, r.id) for r in exact.collect()}
    recall = len(qs & es) / len(es)
    assert recall >= 0.9, f"code-only recall {recall}"


def test_sampled_training_deterministic_and_exact_under_full_probe(embeddings):
    """train_mod>1 trains Lloyd on a deterministic subset: two builds are
    bit-identical, and because IVF partitions are exhaustive, probing
    ALL lists returns the exact k-NN regardless of centroid quality —
    sampled training changes build cost, never correctness semantics."""
    from vectordb_from_scratch_spark.operators import knn

    a = ann.build_ivf_det(embeddings, n_lists=4, iters=1, train_mod=4)
    b = ann.build_ivf_det(embeddings, n_lists=4, iters=1, train_mod=4)
    ra = sorted((r["list_id"], tuple(r["cvec"])) for r in a.collect())
    rb = sorted((r["list_id"], tuple(r["cvec"])) for r in b.collect())
    assert ra == rb and len(ra) == 4
    assert all(len(c) == 64 for _, c in ra)

    v = embeddings.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    assigned = ann.assign_ivf_det(v, a)
    probes = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    approx = ann.ann_knn_ivf(assigned, a, probes, k=5, n_probe=4,
                             id_col="id", vec_col="vec")
    exact = knn.knn(embeddings, probes, k=5, strategy="window")
    ga = {(r["query_id"], r["rank"], r["id"]) for r in approx.collect()}
    ge = {(r["query_id"], r["rank"], r["id"]) for r in exact.collect()}
    assert ga == ge


def test_sampled_training_falls_back_when_sample_too_small(spark):
    """Advisor r5: a train_mod that leaves fewer than n_lists sampled
    rows must not silently build fewer centroids (and shift every
    downstream list_id) — the build falls back to full-data training."""
    rows = [(i, [float(i), float(2 * i)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # train_mod=1000 over 12 rows: the hash-sampled subset is almost
    # surely < n_lists=6 → fallback must kick in and match train_mod=1
    full = {r["list_id"]: tuple(r["cvec"])
            for r in ann.build_ivf_det(df, n_lists=6, iters=1).collect()}
    sampled = {r["list_id"]: tuple(r["cvec"])
               for r in ann.build_ivf_det(df, n_lists=6, iters=1, train_mod=1000).collect()}
    assert len(sampled) == 6
    assert sampled == full
