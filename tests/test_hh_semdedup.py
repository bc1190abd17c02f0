"""Heavy hitters (metrics.heavy_hitters — Misra-Gries sketch-then-verify)
and SemDeDup-style semantic dedup (dedup.semantic_dedup). The registry
twins (rel_heavy_hitters / dedup_semantic) check engine parity; these
check the guarantees on adversarial local data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ann, dedup
from vectordb_from_scratch_spark.operators import metrics as mx


# ---------------------------------------------------------------- heavy hitters

@pytest.fixture(scope="module")
def skewed(spark):
    # key k appears 2^(10-k) times: keys 0..3 are heavy at capacity 8
    rows = [(k,) for k in range(10) for _ in range(1 << (10 - k))]
    return spark.createDataFrame(rows, "user_id int").repartition(8)


def test_heavy_hitters_exact_vs_groupby(skewed):
    cap = 8
    got = mx.heavy_hitters(skewed, "user_id", capacity=cap).collect()
    n = skewed.count()
    want = {
        r.user_id: r.cnt
        for r in skewed.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r.cnt > n / cap
    }
    assert {r.user_id: r.cnt for r in got} == want
    assert want  # the fixture must actually produce heavy hitters
    # sorted by cnt desc, key asc; share is exact
    cnts = [r.cnt for r in got]
    assert cnts == sorted(cnts, reverse=True)
    for r in got:
        assert r.share == pytest.approx(round(r.cnt / n, 6))


def test_heavy_hitters_superset_never_misses(spark):
    """Adversarial for the sketch: many near-threshold keys + partition
    skew. The exact recount must still equal plain GROUP BY/HAVING."""
    rows = [(k % 50,) for k in range(5000)] + [(999,)] * 400
    df = spark.createDataFrame(rows, "user_id int").repartition(13)
    got = {r.user_id: r.cnt for r in mx.heavy_hitters(df, "user_id", capacity=12).collect()}
    n = df.count()
    want = {
        r.user_id: r.cnt
        for r in df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r.cnt > n / 12
    }
    assert got == want


def test_heavy_hitters_total_override(skewed):
    n = skewed.count()
    a = mx.heavy_hitters(skewed, "user_id", capacity=8).collect()
    b = mx.heavy_hitters(skewed, "user_id", capacity=8, total=n).collect()
    assert [(r.user_id, r.cnt, r.share) for r in a] == [
        (r.user_id, r.cnt, r.share) for r in b
    ]


# ---------------------------------------------------------------- semantic dedup

@pytest.fixture(scope="module")
def clustered(spark):
    """Two tight bundles far apart + one lone vector. Bundle members are
    tiny perturbations of the same direction (cosine sim ≈ 1); across
    bundles the directions are orthogonal (sim 0)."""
    rows = []
    for i, eps in enumerate([0.0, 0.001, 0.002]):        # ids 0,1,2 ~ dup group A
        rows.append((i, [1.0, eps, 0.0, 0.0]))
    for i, eps in enumerate([0.0, 0.001]):               # ids 3,4   ~ dup group B
        rows.append((3 + i, [0.0, 1.0, eps, 0.0]))
    rows.append((5, [0.0, 0.0, 1.0, 0.0]))               # id 5 singleton
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_groups_and_keeps(clustered):
    cent = ann.build_ivf_det(clustered, n_lists=2, iters=2)
    res = {r.id: r for r in dedup.semantic_dedup(
        clustered, cent, min_sim=0.999
    ).collect()}
    assert len(res) == 6
    # group A (0,1,2) collapses to component 0; group B (3,4) to 3
    assert [res[i].component for i in (0, 1, 2)] == [0, 0, 0]
    assert [res[i].component for i in (3, 4)] == [3, 3]
    assert res[5].component == 5
    kept = {i for i, r in res.items() if r.is_kept}
    assert kept == {0, 3, 5}
    assert res[0].cluster_size == 3 and res[3].cluster_size == 2
    assert res[5].cluster_size == 1


def test_semantic_dedup_blocking_only_within_cluster(clustered):
    """min_sim low enough that CROSS-cluster pairs would qualify if they
    were ever compared: the cluster blocking must still keep orthogonal
    bundles apart (sim 0 < 0.5), while a threshold below 0 would merge
    everything in one cluster only."""
    cent = ann.build_ivf_det(clustered, n_lists=2, iters=2)
    res = dedup.semantic_dedup(clustered, cent, min_sim=0.5).collect()
    comps = {r.id: r.component for r in res}
    assert comps[0] != comps[3] and comps[0] != comps[5] and comps[3] != comps[5]


# ---------------------------------------------------------------- MMR re-rank

def test_mmr_prefers_diverse_over_redundant(spark):
    """id2 is more relevant than id3 but near-duplicates the first pick;
    MMR must pick the diverse id3 second — the defining behavior."""
    from vectordb_from_scratch_spark.operators.knn import mmr_diversify

    cands = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.85), (0, 3, 0.3)],
        "query_id long, id long, rel double",
    )
    sims = {(1, 2): 0.95, (1, 3): 0.1, (2, 3): 0.1}
    pair_rows = []
    for (a, b), s in sims.items():
        pair_rows += [(0, a, b, s), (0, b, a, s)]
    pairs = spark.createDataFrame(
        pair_rows, "query_id long, id_a long, id_b long, sim double"
    )
    res = mmr_diversify(cands, pairs, k=3, lam=0.5).orderBy("mmr_rank").collect()
    assert [(r.id, r.mmr_rank) for r in res] == [(1, 1), (3, 2), (2, 3)]
    assert res[0].score == 0.5 * 0.9
    assert res[1].score == 0.5 * 0.3 - 0.5 * 0.1      # diversity beat rel
    assert res[2].score == 0.5 * 0.85 - 0.5 * 0.95    # redundant pick last


# ---------------------------------------------------------------- hybrid / RRF

def test_rrf_fusion_semantics(spark):
    """Doc ranked well by BOTH sources beats a doc that tops one source
    but misses the other; missing-source contribution is 0; source
    ranks ride along as NULLs where absent."""
    from vectordb_from_scratch_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, id long, rank int"
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2), (0, 13, 3)], "query_id long, id long, rank int"
    )
    res = {r.id: r for r in rrf_fuse(lex, vec, k=4, k0=60).collect()}
    # id 11: 1/62 + 1/61 tops id 10's 1/61 + 0 and id 12's 1/63 + 1/62
    assert res[11].rank == 1
    assert res[11].rrf_score == pytest.approx(1 / 62 + 1 / 61)
    assert res[12].rank == 2            # two mid ranks beat one top rank
    assert res[10].vec_rank is None and res[10].rrf_score == pytest.approx(1 / 61)
    assert res[13].text_rank is None


def test_hybrid_search_self_match_first(spark):
    """With the doc↔embedding id pairing, the probe itself tops both
    rankings, so it must come out rank 1 with both source ranks = 1."""
    from vectordb_from_scratch_spark.operators.hybrid import hybrid_search_rrf
    from vectordb_from_scratch_spark.sources import load_table

    from conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    e = load_table(spark, SF_SMOKE, "embeddings")
    res = hybrid_search_rrf(d, e, n_probes=3, k=5, depth=10)
    top = {r.query_id: r for r in res.filter(F.col("rank") == 1).collect()}
    assert set(top) == {0, 1, 2}
    for q, r in top.items():
        assert r.id == q and r.text_rank == 1 and r.vec_rank == 1


# ---------------------------------------------------------------- count-min

def test_countmin_never_underestimates_and_collides_over(spark):
    """CM guarantee: estimate ≥ true count for EVERY key; with width
    smaller than the key cardinality, at least one key must overestimate
    (pigeonhole), and a dominant key's estimate stays close."""
    from vectordb_from_scratch_spark.operators.metrics import countmin_estimates

    rows = [(k % 97,) for k in range(4000)] + [(999,)] * 1000
    df = spark.createDataFrame(rows, "user_id int").repartition(9)
    res = countmin_estimates(df, "user_id", depth=3, width=32).collect()
    assert len(res) == 98
    assert all(r.cm_est >= r.true_cnt for r in res)
    assert all(r.overestimate == r.cm_est - r.true_cnt for r in res)
    assert any(r.overestimate > 0 for r in res)  # 98 keys into 32 cells
    big = next(r for r in res if r.user_id == 999)
    assert big.true_cnt == 1000 and big.cm_est < 1000 + 4000  # sane bound


def test_countmin_partitioning_invariant(spark):
    from vectordb_from_scratch_spark.operators.metrics import countmin_estimates

    rows = [(k % 12,) for k in range(500)]
    a = spark.createDataFrame(rows, "user_id int")
    got1 = {(r.user_id, r.cm_est) for r in countmin_estimates(a, "user_id").collect()}
    got2 = {
        (r.user_id, r.cm_est)
        for r in countmin_estimates(a.repartition(7), "user_id").collect()
    }
    assert got1 == got2
