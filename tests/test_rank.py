"""Distributed exact ranking (operators/rank.py): value parity with the
single-partition window forms it replaces, at every awkward N/n split."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _scores(spark, n: int):
    # adversarial: heavy score ties (score = i % 7) so the id tiebreak
    # is load-bearing, plus ids out of order
    rows = [((i * 37) % n, float((i * 37) % n % 7)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, score double")


@pytest.mark.parametrize("n_rows,n_parts", [(1, 4), (7, 4), (100, 4), (100, 13)])
def test_global_rank_matches_window_row_number(spark, n_rows, n_parts):
    from vectordb_from_scratch_spark.operators import cache, rank

    df = _scores(spark, n_rows)
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["r"]
        for r in rank.with_global_rank(df, order, "r", num_partitions=n_parts).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["r"]
        for r in df.withColumn("r", F.row_number().over(w)).collect()
    }
    cache.release_caches()
    assert got == want


@pytest.mark.parametrize(
    "n_rows,n_buckets", [(1, 3), (2, 3), (3, 3), (10, 3), (10, 4), (11, 4), (100, 7)]
)
def test_exact_ntile_bucket_matches_sql_ntile(spark, n_rows, n_buckets):
    from vectordb_from_scratch_spark.operators import cache, rank

    df = _scores(spark, n_rows)
    order = [F.col("score").desc(), F.col("id").asc()]
    ranked = rank.with_global_rank(df, order, "r", num_partitions=4)
    total = ranked.groupBy().agg(F.count(F.lit(1)).alias("n"))
    got = {
        r["id"]: r["b"]
        for r in ranked.crossJoin(F.broadcast(total))
        .select("id", rank.exact_ntile_bucket(F.col("r"), F.col("n"), n_buckets).alias("b"))
        .collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(n_buckets).over(w)).collect()
    }
    cache.release_caches()
    assert got == want


def test_ppl_buckets_has_no_single_partition_window(documents):
    """The r4-flagged scale-killer: pipeline_ppl_buckets must not plan an
    unpartitioned window (every `Window` node's partition spec must be
    non-empty) while staying value-identical to the ntile spec."""
    from vectordb_from_scratch_spark.operators import cache, textops

    out = textops.ppl_buckets(documents.limit(200))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            # unpartitioned spec renders as windowspecdefinition(<sort>...
            # with no partition expressions before the first ORDER column;
            # cheap structural proxy: every window must partition by __pid
            assert "__pid" in line, f"unpartitioned window in plan: {line.strip()}"
    got = out.collect()
    assert len(got) == 200
    assert {r["tier"] for r in got} == {"head", "middle", "tail"}
    # buckets are equal-count (200 % 3 == 2 → sizes 67/67/66)
    sizes = sorted(
        out.groupBy("bucket").count().rdd.map(lambda r: r["count"]).collect()
    )
    cache.release_caches()
    assert sizes == [66, 67, 67]


def test_sweep_persistent_rdds_scoped_vs_global(spark):
    """Advisor r5: the default sweep must touch only THIS library's
    checkpoint blocks (tracked via cache.checkpoint); a co-resident
    user's cache survives unless all_rdds=True is passed."""
    from vectordb_from_scratch_spark.operators import cache

    # drain anything earlier tests left behind so counts are ours
    cache.release_caches()
    cache.sweep_persistent_rdds(spark, all_rdds=True)

    ours = cache.checkpoint(spark.range(100))
    assert ours.count() == 100
    theirs = spark.range(50).localCheckpoint()  # untracked, "user" block
    assert theirs.count() == 50
    assert len(list(spark.sparkContext._jsc.getPersistentRDDs())) >= 2

    n = cache.sweep_persistent_rdds(spark)  # scoped default
    assert n >= 1
    remaining = list(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(remaining) >= 1  # the user's block survived

    n2 = cache.sweep_persistent_rdds(spark, all_rdds=True)
    assert n2 >= 1
    assert len(list(spark.sparkContext._jsc.getPersistentRDDs())) == 0
    cache.release_caches()
