"""Round-5 TPC-H shape completion — semantic invariants and plan shape
for the 15 newly covered query shapes (Q4, Q8–Q16, Q18–Q22, adapted to
the shipped schema). Value-level correctness is the oracle gate's job
(tools/check_oracle.py); these tests pin the SEMANTICS a hash-compare
can't explain (e.g. 'the anti-join really excludes late co-suppliers')
and the plan properties that matter at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.plans import relational as rel
from vectordb_from_scratch_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def t(spark):
    def get(name):
        return load_table(spark, SF, name)

    return get


def test_q4_counts_only_orders_with_a_late_line(t):
    out = {
        r["o_orderpriority"]: r["order_count"]
        for r in rel.order_priority_check(t("orders"), t("lineitem")).collect()
    }
    # recompute one priority class the slow way: distinct orders having
    # any line shipped >30d after the order date
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    joined = o.join(t("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
    expect = (
        joined.filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert out.get("1-URGENT", 0) == expect


def test_q8_share_is_a_fraction_and_nation_bounded(t):
    rows = rel.market_share(
        t("region"), t("nation"), t("customer"), t("supplier"),
        t("orders"), t("lineitem"), t("part"),
    ).collect()
    assert rows, "market share must produce at least one year"
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_q11_threshold_filters_strictly(t):
    out = rel.important_parts(t("lineitem"), t("supplier"), t("nation"))
    df = out.collect()
    if not df:
        pytest.skip("no NATION_3 lineitems at smoke sf")
    # every surviving part clears 0.1% of the national total
    total = (
        t("lineitem")
        .join(t("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t("nation").filter(F.col("n_name") == "NATION_3"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
            ).cast("double")
        )
        .collect()[0][0]
    )
    for r in df:
        assert r["part_value"] > total * 0.001 * (1 - 1e-9)


def test_q13_includes_zero_order_customers_and_totals_match(t):
    dist = rel.customer_distribution(t("customer"), t("orders")).collect()
    n_customers = t("customer").count()
    assert sum(r["custdist"] for r in dist) == n_customers


def test_q15_returns_the_argmax_supplier(t):
    out = rel.top_supplier(t("supplier"), t("lineitem")).collect()
    assert len(out) >= 1
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    best = (
        t("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).cast("double").alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    for r in out:
        assert r["total_revenue"] == pytest.approx(best, abs=1e-6)


def test_q18_agg_runs_before_the_dim_joins(t):
    df = rel.large_volume_customers(t("customer"), t("orders"), t("lineitem"))
    plan = _plan(df)
    # the HAVING agg must sit BELOW the joins in the physical plan: the
    # lineitem-side aggregate appears before (deeper than) any join when
    # reading the tree bottom-up — assert no join feeds the aggregate
    # by checking the aggregate's child is the scan side, i.e. the plan
    # has a HashAggregate whose subtree contains no Join
    assert "CartesianProduct" not in plan
    seg = plan.split("HashAggregate")[-1]  # deepest aggregate's subtree
    assert "Join" not in seg, "fact-side agg must pre-reduce before joins"
    rows = df.collect()
    for r in rows:
        assert r["sum_qty"] > 150.0


def test_q19_or_predicates_keep_the_hash_join(t):
    df = rel.disjunctive_revenue(t("lineitem"), t("part"))
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_sole_late_supplier_semantics(t, spark):
    # synthetic micro-case: order 1 has suppliers A(late) B(on-time) →
    # A counted; order 2 has A(late) C(late) → nobody counted (not sole)
    o = spark.createDataFrame(
        [(1, "F", "2000-01-01"), (2, "F", "2000-01-01")],
        "o_orderkey long, o_orderstatus string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        [
            (1, 101, "2000-06-01"),  # A late on order 1
            (1, 102, "2000-01-15"),  # B on time
            (2, 101, "2000-06-01"),  # A late on order 2
            (2, 103, "2000-07-01"),  # C also late → disqualifies
        ],
        "l_orderkey long, l_suppkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    sup = spark.createDataFrame(
        [(101, "SUPP_A", 0), (102, "SUPP_B", 0), (103, "SUPP_C", 0)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nat = spark.createDataFrame(
        [(0, "NATION_1", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    out = {
        r["s_name"]: r["numwait"]
        for r in rel.late_suppliers(sup, nat, o, li).collect()
    }
    assert out == {"SUPP_A": 1}


def test_q22_excludes_customers_with_recent_orders(t):
    out = rel.sales_opportunity(t("customer"), t("orders"))
    winners = out.collect()
    # sanity at smoke sf: groups come only from the whitelist
    allowed = {1, 5, 9, 13, 17, 21, 24}
    for r in winners:
        assert r["cntry"] in allowed


def test_q21_compiles_to_semi_and_anti_joins(t):
    df = rel.late_suppliers(t("supplier"), t("nation"), t("orders"), t("lineitem"))
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
