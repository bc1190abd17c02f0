"""Relational/analytic query plans over the star schema — the join /
aggregation / window / set-op categories the reference lacks entirely
(SURVEY.md §2.6) but a complete engine must cover.

Numeric-determinism contract shared with the DuckDB oracle: money/measure
sums go through exact DECIMAL so the result is independent of partial-
aggregation order (double sums are not associative; decimal sums are).
Cast back to double at the end — both engines produce the identical
nearest-double of the same exact decimal.

Scale notes are per-plan; the common themes:
- filters precede joins (pushdown reaches the parquet scan);
- small dims (region, nation) broadcast — no shuffle of the fact table;
- aggregations are partial-aggregated map-side by Catalyst;
- windows partition on high-cardinality keys (custkey, user_id), never
  on a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "customer_order_window",
    "events_hourly",
    "events_sessionize",
    "events_json_stats",
    "min_cost_supplier",
    "bilateral_trade_volume",
]


def _dec_sum(col, scale: int = 4):
    """Order-independent sum: exact decimal accumulate, double out.

    Cost note (measured at sf0.1): decimal sums run ~5× slower than double
    sums — the sum's result precision exceeds 18, leaving Spark's compact
    long-backed decimal for boxed BigDecimal. Accepted deliberately: double
    sums are order-dependent (non-associative) and long-scaled integers
    overflow at ~6e9 rows, so exact decimal is the only representation
    that is both deterministic under any partitioning AND safe at 100 TB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.
    One wide scan, map-side partial agg, 4-row output — the canonical
    'does partial aggregation happen' probe."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", 2).alias("sum_qty"),
            _dec_sum("l_extendedprice", 2).alias("sum_base_price"),
            _dec_sum(disc_price, 6).alias("sum_disc_price"),
            _dec_sum(charge, 6).alias("sum_charge"),
            (_dec_sum("l_quantity", 2) / F.count(F.lit(1))).alias("avg_qty"),
            (_dec_sum("l_extendedprice", 2) / F.count(F.lit(1))).alias("avg_price"),
            (_dec_sum("l_discount", 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_revenue_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer is small → broadcast; lineitem never shuffles until the
    final tiny agg on l_orderkey."""
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1996-06-30"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1996-06-30")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == F.lit("BUILDING"))),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with the local-supplier predicate
    (c_nationkey = s_nationkey). region+nation broadcast; the only big
    shuffle is lineitem⋈orders on orderkey."""
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    p_size: int = 5,
) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part within a region.

    The testdata has no partsupp table, so lineitem stands in:
    supply price = min(l_extendedprice) per (l_partkey, l_suppkey).
    Q2's correlated scalar subquery ("price = the minimum price for THIS
    part among this region's suppliers") decorrelates, Spark-side, into
    a min-over-window partitioned by part — one pass, no self-join, the
    rewrite Catalyst itself applies to the SQL form. nation/region are
    fixed-size → always broadcast; part/supplier scale with SF, so they
    carry no hint and AQE broadcasts them at test scale but shuffles at
    cluster scale. The fact-table work is one (partkey, suppkey)
    partial aggregate.

    min() over doubles is order-independent, so no decimal detour is
    needed for cross-engine determinism.
    """
    ps = lineitem.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("supply_price"))
    regional_sup = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == F.lit(region_name))
        .select("s_suppkey", "s_name", "n_name")
    )
    eligible = ps.join(regional_sup, F.col("suppkey") == F.col("s_suppkey")).join(
        part.filter(F.col("p_size") == F.lit(p_size)),
        F.col("partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("__min_price", F.min("supply_price").over(w))
        .filter(F.col("supply_price") == F.col("__min_price"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("supply_price", 6).alias("supply_price"),
        )
    )


def bilateral_trade_volume(
    supplier: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year —
    the two-role dimension pattern (nation joined TWICE under different
    aliases: supplier's nation and customer's nation).

    Both nation sides broadcast (25 rows at any SF). supplier/customer
    get NO hint: they scale with SF (1B rows at 100 TB would OOM a
    forced broadcast), so Catalyst/AQE picks broadcast at test scale
    and shuffle at cluster scale — the right plan in both worlds. The
    unavoidable big shuffle is lineitem⋈orders on orderkey. Revenue
    accumulates in exact decimal (order-independent under any
    partitioning — see _dec_sum)."""
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    pair = (
        (F.col("supp_nation") == F.lit(nation_a)) & (F.col("cust_nation") == F.lit(nation_b))
    ) | (
        (F.col("supp_nation") == F.lit(nation_b)) & (F.col("cust_nation") == F.lit(nation_a))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(volume).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def customer_order_window(orders: DataFrame) -> DataFrame:
    """Per-customer order sequence: row_number + running total (window
    functions over a high-cardinality partition key). Running decimal sum
    is sequential within the frame → engine-portable."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return (
        orders.filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.row_number().over(w).alias("rn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_total"),
        )
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window aggregation — the batch shape of a
    Structured Streaming windowed agg (streaming twin in streaming/)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def events_rollup_cascade(events: DataFrame) -> DataFrame:
    """Multi-resolution time rollup — the hypertable continuous-aggregate
    pattern: minute-level aggregates come from the ONE raw scan, hour
    reaggregates the minutes, day reaggregates the hours. At 100 TB this
    is the difference between one fact-table pass and three: coarser
    levels consume the finer level's (bucket, type)-sized output, never
    the raw events. Measures are decimal sums until the output edge, so
    every level is partitioning-independent AND reaggregation-exact
    (decimal addition is associative; count-distinct deliberately stays
    OUT of the cascade — it does not reaggregate).

    The minute and hour levels persist (shared cache registry,
    operators/cache.py): each feeds both its own output branch and the
    next-coarser level, and an unpersisted tree plan would re-scan the
    raw table per branch — the cache is what makes 'one fact-table pass'
    true in the executed plan, not just in the prose."""
    from ..operators.cache import track

    minute = track(
        events.groupBy(
            F.date_trunc("minute", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__dec"),
        )
    )
    hour = track(
        minute.groupBy(
            F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
        ).agg(F.sum("n_events").alias("n_events"), F.sum("__dec").alias("__dec"))
    )
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("__dec").alias("__dec"))

    def out(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n_events",
            F.col("__dec").cast("double").alias("sum_value"),
        )

    return out(minute, "minute").unionByName(out(hour, "hour")).unionByName(
        out(day, "day")
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts after `gap_minutes`
    of per-user inactivity. lag → cumulative flag-sum → per-session agg.
    The stateful-streaming analog is applyInPandasWithState; this is the
    deterministic batch form (two windows over user_id, one shuffle)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    new_sess = F.when(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) > gap_us, 1
    ).otherwise(0)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


def two_stage_distinct_users(events: DataFrame) -> DataFrame:
    """Skew-safe exact count-distinct: stage 1 dedupes (event_type,
    user_id) — a shuffle keyed on the COMPOSITE key, so a hot event_type
    spreads across reducers — stage 2 counts per event_type on the tiny
    deduped set. The classic rewrite of countDistinct for skewed group
    keys at scale; identical results, no single hot reducer.
    """
    deduped = events.select("event_type", "user_id").distinct()
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))


def events_json_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: JSON props → typed column → agg
    (the reference has no JSON surface; standard pipeline need)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
