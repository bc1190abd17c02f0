"""Weighted-score hybrid fusion (operators/hybrid.weighted_fuse):
normalization bounds, missing-source semantics, constant-score guard,
and the end-to-end doc↔vec composition's self-match invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import hybrid


def _src(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, sim double")


def test_minmax_bounds_and_ordering(spark):
    lex = _src(spark, [(1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1)])
    vec = _src(spark, [(1, 10, 0.8), (1, 11, 0.6), (1, 12, 0.4)])
    res = hybrid.weighted_fuse(lex, vec, k=3, w_lex=0.5, w_vec=0.5).collect()
    by_id = {r.id: r for r in res}
    # min-max: best source score → 1.0, worst → 0.0
    assert by_id[10].lex_norm == 1.0 and by_id[10].vec_norm == 1.0
    assert by_id[12].lex_norm == 0.0 and by_id[12].vec_norm == 0.0
    assert abs(by_id[10].fused_score - 1.0) < 1e-12
    assert [r.id for r in sorted(res, key=lambda x: x.rank)] == [10, 11, 12]


def test_missing_source_contributes_zero(spark):
    lex = _src(spark, [(1, 10, 0.9), (1, 11, 0.1)])
    vec = _src(spark, [(1, 20, 0.8), (1, 21, 0.2)])
    res = hybrid.weighted_fuse(lex, vec, k=4, w_lex=0.3, w_vec=0.7).collect()
    by_id = {r.id: r for r in res}
    assert by_id[10].vec_norm is None and abs(by_id[10].fused_score - 0.3) < 1e-12
    assert by_id[20].lex_norm is None and abs(by_id[20].fused_score - 0.7) < 1e-12
    # vec-only winner outranks lex-only winner at these weights
    assert by_id[20].rank == 1 and by_id[10].rank == 2


def test_constant_scores_normalize_to_one(spark):
    lex = _src(spark, [(1, 10, 0.5), (1, 11, 0.5)])
    vec = _src(spark, [(1, 10, 0.7)])
    res = hybrid.weighted_fuse(lex, vec, k=3, w_lex=0.5, w_vec=0.5).collect()
    by_id = {r.id: r for r in res}
    assert by_id[10].lex_norm == 1.0 and by_id[11].lex_norm == 1.0
    assert by_id[10].vec_norm == 1.0  # single-row source: max==min guard
    # tie on fused score broken by id asc? no — 10 carries both sources
    assert by_id[10].rank == 1


def test_end_to_end_self_match_rank1(spark, documents, embeddings):
    res = hybrid.hybrid_search_weighted(
        documents, embeddings, n_probes=3, k=5, depth=10
    )
    top1 = {r.query_id: r.id for r in res.filter(F.col("rank") == 1).collect()}
    # probe i pairs doc i with vec i; both legs rank self first, so the
    # fused top-1 is the probe itself
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_weighted_fuse_score_col_parameter(spark):
    """The documented generic contract: a source whose score column is
    named something other than `sim` fuses via score_col=."""
    from vectordb_from_scratch_spark.operators import hybrid

    lex = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0)], "query_id long, id long, relevance double"
    )
    vec = spark.createDataFrame(
        [(1, 10, 0.9), (1, 12, 0.5)], "query_id long, id long, relevance double"
    )
    out = hybrid.weighted_fuse(lex, vec, k=5, score_col="relevance").collect()
    assert {r["id"] for r in out} == {10, 11, 12}
    best = max(out, key=lambda r: r["fused_score"])
    assert best["id"] == 10  # top of both sources
