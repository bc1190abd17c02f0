"""Column profiler — semantics (nulls, distincts, non-numeric NULLs),
the exact/approx plan trade, and schema stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.profile import profile


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, 2.0, "a"),
        (2, None, "b"),
        (3, 4.0, "b"),
        (4, 10.0, None),
    ]
    return spark.createDataFrame(rows, "k long, x double, s string")


def test_counts_nulls_distincts_and_numeric_stats(toy):
    out = {r["column"]: r for r in profile(toy).collect()}
    assert set(out) == {"k", "x", "s"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["x"]["n_null"] == 1 and out["s"]["n_null"] == 1
    assert out["x"]["n_distinct"] == 3  # nulls not counted as a value
    assert out["s"]["n_distinct"] == 2
    assert out["x"]["mean"] == pytest.approx((2 + 4 + 10) / 3)
    assert (out["x"]["min_val"], out["x"]["max_val"]) == (2.0, 10.0)
    # string column: numeric stats are NULL, counts still real
    assert out["s"]["mean"] is None and out["s"]["min_val"] is None


def test_single_job_one_scan(toy):
    df = profile(toy)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one scan of the source feeds everything (the Expand for multiple
    # exact distincts replicates rows, it does not rescan)
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_approx_mode_drops_expand(spark):
    big = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 13).alias("b")
    )
    exact_plan = profile(big)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile(big, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the documented exact-mode cost
    assert "Expand" not in approx_plan  # HLL mode is genuinely one-pass
    # approx counts on small-cardinality columns are exact in practice
    out = {r["column"]: r["n_distinct"] for r in profile(big, exact=False).collect()}
    assert out["a"] == 7 and out["b"] == 13


def test_column_subset_and_complex_skip(spark):
    df = spark.range(5).select(
        F.col("id"), F.array(F.lit(1)).alias("arr"), F.lit("x").alias("s")
    )
    out = profile(df).collect()  # arr silently skipped (complex type)
    assert {r["column"] for r in out} == {"id", "s"}
    only = profile(df, ["s"]).collect()
    assert [r["column"] for r in only] == ["s"]
    with pytest.raises(ValueError):
        profile(df, ["arr"])


def test_drift_chisq_known_values(spark):
    from vectordb_from_scratch_spark.operators.profile import drift_chisq

    base = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "k string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 15 + [("d",)] * 5, "k string"
    )
    rows = {r.key: r for r in drift_chisq(base, cur, "k").collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    # totals: base 100, cur 50 → expected = base_cnt / 2
    assert rows["a"].expected == 30.0 and rows["a"].chisq_contrib == 0.0
    assert rows["b"].expected == 15.0 and rows["b"].chisq_contrib == 0.0
    # c vanished: expected 5, observed 0 → (0-5)^2/5 = 5
    assert rows["c"].cur_cnt == 0 and rows["c"].chisq_contrib == 5.0
    # d appeared: baseline 0 → contribution NULL (the loudest signal)
    assert rows["d"].base_cnt == 0 and rows["d"].chisq_contrib is None
    assert rows["d"].cur_cnt == 5


def test_drift_chisq_is_one_lazy_plan(spark):
    """Totals come from inside the plan (VERDICT r6 advice): building the
    DataFrame must run zero jobs, and the single plan must scan each
    input exactly once."""
    from vectordb_from_scratch_spark.operators.profile import drift_chisq

    base = spark.createDataFrame([("a",)] * 4 + [("b",)] * 4, "k string")
    cur = spark.createDataFrame([("a",)] * 2, "k string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = drift_chisq(base, cur, "k")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "drift_chisq ran eager jobs at plan-build time"
    rows = {r.key: r for r in df.collect()}
    assert rows["a"].expected == 1.0  # 4 * (2/8)


def test_drift_chisq_empty_baseline_yields_null_expected(spark):
    from vectordb_from_scratch_spark.operators.profile import drift_chisq

    base = spark.createDataFrame([], "k string")
    cur = spark.createDataFrame([("a",)] * 3, "k string")
    rows = drift_chisq(base, cur, "k").collect()
    assert len(rows) == 1
    r = rows[0]
    # empty baseline: no division-by-zero artifact, NULL all the way
    assert r.expected is None and r.chisq_contrib is None
    assert r.base_cnt == 0 and r.cur_cnt == 3
