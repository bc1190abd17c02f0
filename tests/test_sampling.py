"""Deterministic sampling operators: hash_uniform distribution and
reproducibility, stratified_sample rate targeting, salt decorrelation,
and partition-independence (the property engine-RNG sampling lacks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import sampling


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 4000).withColumnRenamed("id", "doc_id")


def test_hash_uniform_range_and_determinism(keyed):
    u = keyed.select(sampling.hash_uniform("doc_id").alias("u"))
    lo, hi = u.agg(F.min("u"), F.max("u")).first()
    assert 0.0 <= lo and hi < 1.0
    # mean of U[0,1) over 4000 draws
    assert u.agg(F.avg("u")).first()[0] == pytest.approx(0.5, abs=0.03)
    # pure function of the key: same rows selected at any partitioning
    a = {r.doc_id for r in keyed.filter(sampling.hash_uniform("doc_id") < 0.2).collect()}
    b = {
        r.doc_id
        for r in keyed.repartition(17)
        .filter(sampling.hash_uniform("doc_id") < 0.2)
        .collect()
    }
    assert a == b
    assert len(a) == pytest.approx(800, rel=0.15)


def test_salt_decorrelates(keyed):
    a = {r.doc_id for r in keyed.filter(sampling.hash_uniform("doc_id") < 0.5).collect()}
    b = {
        r.doc_id
        for r in keyed.filter(sampling.hash_uniform("doc_id", salt="v2") < 0.5).collect()
    }
    assert a != b
    # independent halves overlap on ~25% of the universe
    assert len(a & b) == pytest.approx(1000, rel=0.2)


def test_stratified_rates(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(df, {"a": 0.5, "b": 0.1}, strata_col="lang")
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("c") is None  # default_rate=0 drops unlisted strata
    assert got["a"] == pytest.approx(1000, rel=0.15)
    assert got["b"] == pytest.approx(200, rel=0.3)


def test_sql_twin_matches(spark):
    """sql_hash_uniform is the bit-exact DuckDB twin of hash_uniform."""
    duckdb = pytest.importorskip("duckdb")
    spark_u = {
        r.doc_id: r.u
        for r in spark.range(0, 200)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", sampling.hash_uniform("doc_id", salt="s").alias("u"))
        .collect()
    }
    duck = duckdb.sql(
        "SELECT i AS doc_id, "
        + sampling.sql_hash_uniform("i", salt="s")
        + " AS u FROM range(0, 200) t(i)"
    ).fetchall()
    assert {k: v for k, v in duck} == spark_u  # exact equality, no tolerance


# -- token-budget sequence packing -----------------------------------------


def test_pack_sequences_invariants(spark):
    from vectordb_from_scratch_spark.operators import textops

    rows = [
        (1, "a b c d e"),          # 5 tokens
        (2, " ".join(["w"] * 7)),  # 7 tokens → straddles the 8-cut
        (3, ""),                    # empty: dropped
        (4, " ".join(["x"] * 9)),  # 9 tokens → spans two full cuts
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.pack_sequences(docs, budget=8).collect()

    # doc 3 never appears
    assert not any(r.doc_id == 3 for r in out)
    # spans are half-open, non-empty, inside their window
    for r in out:
        assert 0 < r.n_tokens_in_seq == r.tok_end - r.tok_start
        assert r.tok_start >= r.seq_id * 8 and r.tok_end <= (r.seq_id + 1) * 8
    # every full window is exactly filled; only the last may be partial
    per_seq = {}
    for r in out:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_tokens_in_seq
    last = max(per_seq)
    for sid, n in per_seq.items():
        assert n == 8 or sid == last
    # total tokens conserved: 5 + 7 + 9
    assert sum(per_seq.values()) == 21
    # doc 2 straddles windows 1 and 2 (starts at offset 5)
    d2 = sorted((r.seq_id, r.n_tokens_in_seq) for r in out if r.doc_id == 2)
    assert d2 == [(0, 3), (1, 4)]


class TestClusterSample:
    def _assigned(self, spark, n=400, clusters=3):
        from pyspark.sql import functions as F

        return (
            spark.range(n)
            .select(F.col("id"), (F.col("id") % clusters).cast("int").alias("list_id"))
        )

    def test_exact_per_cluster_counts(self, spark):
        from vectordb_from_scratch_spark.operators.sampling import cluster_sample

        out = cluster_sample(self._assigned(spark), per_cluster=10).collect()
        from collections import Counter

        per = Counter(r["list_id"] for r in out)
        assert per == {0: 10, 1: 10, 2: 10}
        # ranks are 1..per_cluster with no gaps
        ranks = sorted(r["draw_rank"] for r in out if r["list_id"] == 0)
        assert ranks == list(range(1, 11))

    def test_small_cluster_keeps_all_rows(self, spark):
        from vectordb_from_scratch_spark.operators.sampling import cluster_sample

        out = cluster_sample(self._assigned(spark, n=9), per_cluster=10).collect()
        assert len(out) == 9

    def test_partitioning_invariance(self, spark):
        from vectordb_from_scratch_spark.operators.sampling import cluster_sample

        base = self._assigned(spark)
        a = {(r["list_id"], r["id"]) for r in cluster_sample(base, per_cluster=7).collect()}
        b = {
            (r["list_id"], r["id"])
            for r in cluster_sample(base.repartition(13), per_cluster=7).collect()
        }
        assert a == b

    def test_no_single_task_cluster_window(self, spark):
        """The full-data window must key on (cluster, partition id) —
        only the survivor set (≤ parts × n per cluster) may see the
        per-cluster-only window."""
        from vectordb_from_scratch_spark.operators.sampling import cluster_sample

        df = cluster_sample(self._assigned(spark), per_cluster=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        first_window = plan.split("Window")[-1]  # deepest = level-1 window
        assert "SPARK_PARTITION_ID" in first_window.upper() or "__pid" in first_window


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, spark):
        from pyspark.sql import functions as F

        from vectordb_from_scratch_spark.operators.sampling import dsir_logweights

        target_text = "the quick brown fox jumps over the lazy dog again and again"
        other_text = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        rows = (
            [(i, target_text, "en") for i in range(10)]
            + [(i + 10, other_text, "xx") for i in range(10)]
            # held-out docs, one from each domain, NOT in the target class
            + [(100, target_text, "xx"), (101, other_text, "yy")]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {
            r["doc_id"]: r["logw"]
            for r in dsir_logweights(docs, F.col("lang") == "en").collect()
        }
        # the held-out target-domain doc must outscore the raw-domain one
        assert out[100] > out[101]
        # and target-domain text scores above zero (more likely under target)
        assert out[100] > 0 > out[101]

    def test_partitioning_invariance(self, spark):
        from pyspark.sql import functions as F

        from vectordb_from_scratch_spark.operators.sampling import dsir_logweights
        from vectordb_from_scratch_spark.sources import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = {r["doc_id"]: r["logw"]
             for r in dsir_logweights(d, F.col("lang") == "en").collect()}
        b = {r["doc_id"]: r["logw"]
             for r in dsir_logweights(d.repartition(17), F.col("lang") == "en").collect()}
        assert a == b


def test_hard_negatives_excludes_duplicate_group(spark):
    """A near-identical copy of the probe doc must be dropped from its
    negatives even when it is the nearest neighbor — and stay a valid
    negative for OTHER probes' lists."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import sampling

    # doc/vec 0 and 5 are exact text duplicates AND nearest vectors
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.8, 0.6, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
            (4, [0.5, 0.5, 0.7]),
            (5, [0.99, 0.01, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [
            (0, "same exact text"),
            (1, "some other words"),
            (2, "entirely different"),
            (3, "third thing here"),
            (4, "fourth thing here"),
            (5, "Same  EXACT text"),   # normalized dup of doc 0
        ],
        "doc_id long, text string",
    )
    res = sampling.hard_negatives(emb, docs, n_probes=1, k=3, overfetch=2)
    rows = sorted(res.collect(), key=lambda r: r.neg_rank)
    ids = [r.neg_id for r in rows]
    assert 5 not in ids          # hidden positive excluded
    assert 0 not in ids          # self excluded
    assert len(ids) == 3 and ids[0] == 1  # next-nearest non-dup leads
    assert [r.neg_rank for r in rows] == [1, 2, 3]


def test_ppl_buckets_equal_counts_and_order(spark, documents):
    from vectordb_from_scratch_spark.operators import textops

    res = textops.ppl_buckets(documents).collect()
    by_tier = {}
    for r in res:
        by_tier.setdefault(r.tier, []).append(r)
    # ntile: equal counts within 1
    sizes = sorted(len(v) for v in by_tier.values())
    assert sizes[-1] - sizes[0] <= 1 and set(by_tier) == {"head", "middle", "tail"}
    # every head doc scores >= every tail doc
    assert min(r.bigram_logprob for r in by_tier["head"]) >= max(
        r.bigram_logprob for r in by_tier["tail"]
    )
