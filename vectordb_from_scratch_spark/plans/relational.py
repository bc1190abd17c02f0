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
    "order_priority_check",
    "market_share",
    "product_profit",
    "returned_items",
    "important_parts",
    "ship_delay_priority",
    "customer_distribution",
    "promo_revenue",
    "top_supplier",
    "part_supplier_counts",
    "large_volume_customers",
    "disjunctive_revenue",
    "excess_supply_suppliers",
    "late_suppliers",
    "sales_opportunity",
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


def events_funnel(
    events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest `stages[0]` event,
    then the earliest `stages[1]` STRICTLY AFTER it, and so on — the
    sequence-conversion query every product-analytics engine serves
    (absent from the reference, which has no event/time surface).

    Shape: one conditional min-aggregate per stage, each joined to the
    previous stage's per-user timestamp — stage k's aggregate only scans
    rows of its own event type (filter pushed to the scan) and shuffles
    one row per qualifying user. No windows, no per-user event sorting:
    at 100 TB the shuffle is bounded by |users| × |stages|, never by raw
    event count. Returns one row per funnel stage:
    (stage_idx, stage, n_users, conversion_from_first) where n_users is
    the number of users who reached that stage IN ORDER — monotone
    non-increasing down the funnel.
    """
    spark = events.sparkSession
    prev: DataFrame | None = None
    counts = []
    for i, ev in enumerate(stages):
        cur = events.filter(F.col("event_type") == ev)
        if prev is None:
            reached = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            reached = (
                cur.join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(ev).alias("stage"),
                "n_users",
            )
        )
        prev = reached
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = counts[0].select(F.col("n_users").alias("__n1"))
    return (
        out.crossJoin(F.broadcast(first))
        .select(
            "stage_idx", "stage", "n_users",
            # empty first stage → conversion undefined (NULL), not a
            # divide-by-zero (ANSI mode throws on x/0)
            F.when(
                F.col("__n1") > 0,
                F.round(F.col("n_users") / F.col("__n1"), 6),
            ).alias("conversion_from_first"),
        )
        .orderBy("stage_idx")
    )


# --------------------------------------------------------------------------
# TPC-H shape completion (round 5): the 15 query shapes not yet covered,
# adapted to the shipped schema (no partsupp; no l_shipmode /
# l_commitdate / l_receiptdate — lateness is expressed as l_shipdate
# vs o_orderdate + grace instead).
# --------------------------------------------------------------------------


def order_priority_check(orders: DataFrame, lineitem: DataFrame, grace_days: int = 30) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi-join — count orders per priority
    having at least one line shipped more than `grace_days` after the
    order date (adapted: no l_commitdate in the shipped schema).

    Scale: the correlated EXISTS compiles to a LEFT SEMI hash join on
    l_orderkey; lineitem is filter-reduced before the join and never
    aggregated. Orders shuffles once on orderkey."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
    return (
        o.join(lineitem, (F.col("l_orderkey") == F.col("o_orderkey")) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "EUROPE",
    part_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: national market share — the target supplier
    nation's fraction of revenue for one part type sold into one
    customer region, by order year.

    Scale: part/customer-side dims broadcast; the conditional share is a
    single pass (sum(CASE)/sum), no second scan of the joined fact."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    n1 = nation.alias("n1")  # customer nation → region filter
    n2 = nation.alias("n2")  # supplier nation → share numerator
    joined = (
        lineitem.join(F.broadcast(part.filter(F.col("p_type") == part_type)),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == target_region)),
              F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
    )
    target_rev = F.when(F.col("n2.n_name") == target_nation, rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(target_rev).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias("mkt_share"),
        )
    )


def product_profit(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_fragment: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    whose name contains a fragment. Adapted: cost side is
    p_retailprice * l_quantity (no partsupp.ps_supplycost in schema).

    Scale: the part filter broadcasts; profit is one decimal-exact
    expression per row — single fact scan, one small shuffle on
    (nation, year)."""
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains(name_fragment))),
            F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over
    one quarter-year of orders; deterministic top-20.

    Scale: lineitem is filtered to returnflag='R' at the scan; the only
    large shuffle is lineitem⋈orders on orderkey; customer/nation
    broadcast; top-k is a TakeOrderedAndProject, never a full sort."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        lineitem.filter(F.col("l_returnflag") == F.lit("R"))
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def ship_delay_priority(orders: DataFrame, lineitem: DataFrame, fast_days: int = 30) -> DataFrame:
    """TPC-H Q12 shape: order-priority counts by shipping bucket.
    Adapted: no l_shipmode — lines bucket FAST/SLOW by ship delay
    (l_shipdate - o_orderdate), the schema's analog of the commit/receipt
    lateness test.

    Scale: one lineitem⋈orders shuffle on orderkey, then a 2-row agg;
    the CASE sums are map-side partials."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= fast_days, F.lit("FAST")
    ).otherwise(F.lit("SLOW"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    including zero-order customers (LEFT OUTER), excluding one priority
    class (adapted from the comment-pattern exclusion).

    Scale: two aggregations, both tiny after the first; the outer join
    keeps customer as build side via broadcast at this dim size — at
    100 TB the join key (custkey) is high-cardinality and unskewed."""
    filtered = orders.filter(F.col("o_orderpriority") != F.lit("5-LOW"))
    per_cust = (
        customer.join(filtered, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts. Both sums come out of a single conditional aggregation pass.

    Scale: part broadcasts; the month filter prunes the fact scan;
    output is one row."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == F.lit("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01"))
            & (F.col("l_shipdate") < F.lit("1996-10-01")))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_sum"),
            F.sum(rev).cast("double").alias("total_sum"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo_sum") / F.col("total_sum"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


def important_parts(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    target_nation: str = "NATION_3", threshold_frac: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from one nation's
    suppliers exceeds a fraction of that nation's total. Adapted: value
    is l_extendedprice * l_quantity over lineitem (no partsupp).

    Scale: the national slice is computed ONCE and reused for both the
    per-part agg and the global threshold (self-reuse of a filtered
    scan); the threshold is a 1-row broadcast, so the HAVING is a
    broadcast-join filter, not a second shuffle."""
    value = (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
    national = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.filter(F.col("n_name") == target_nation)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), value.alias("value"))
    )
    per_part = national.groupBy("l_partkey").agg(
        F.sum("value").cast("double").alias("part_value")
    )
    threshold = national.agg(
        (F.sum("value").cast("double") * F.lit(threshold_frac)).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("thr"))
        .select("l_partkey", F.round("part_value", 6).alias("part_value"))
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue (scalar-max subquery → broadcast join back).

    Scale: revenue agg shuffles on suppkey once; the max is a 1-row
    broadcast; no window over a constant partition."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 6).alias("total_revenue"))
    )


def part_supplier_counts(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for a
    size whitelist, excluding one brand and one type. Adapted: supplier
    relationships come from shipped lineitems (no partsupp).

    Scale: count(DISTINCT l_suppkey) compiles to a two-stage expand +
    agg keyed on the composite group — skew-safe; part broadcasts."""
    p = part.filter(
        (F.col("p_brand") != F.lit("Brand#1"))
        & (F.col("p_type") != F.lit("PROMO"))
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, qty_threshold: float = 150.0
) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed a total
    quantity threshold (HAVING on a fact-side agg, then dim joins).

    Scale: the heavy agg runs FIRST on lineitem alone (map-side partial
    on orderkey), shrinking the fact to the rare qualifying orders
    before any join; customer broadcasts."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 6).alias("o_totalprice"),
            F.round("sum_qty", 6).alias("sum_qty"),
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd (brand, size-range,
    quantity-range) predicate triples — the disjunctive-pushdown probe.

    Scale: the common l_partkey = p_partkey conjunct stays a hash-join
    key (the OR only filters rows, it does not degrade the join to a
    nested loop); part broadcasts; output is one row."""
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    q, p, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    triples = (
        ((p == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((p == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((p == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(triples)
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def excess_supply_suppliers(
    supplier: DataFrame, nation: DataFrame, lineitem: DataFrame, part: DataFrame,
    target_nation: str = "NATION_2", name_prefix: str = "red", qty_threshold: float = 50.0,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped more than a
    threshold quantity of parts with a given name prefix (nested
    IN-subqueries → semi-join chain). Adapted: shipped quantity stands
    in for partsupp.ps_availqty.

    Scale: part prefix-filter broadcasts into the lineitem agg; the
    supplier side is tiny; everything upstream of the final semi-join is
    pre-aggregated."""
    heavy = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").startswith(name_prefix))),
            F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"))
        .filter(F.col("qty") > qty_threshold)
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == target_nation)),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


def late_suppliers(
    supplier: DataFrame, nation: DataFrame, orders: DataFrame, lineitem: DataFrame,
    target_nation: str = "NATION_1", grace_days: int = 60,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the SOLE late
    supplier on finished multi-supplier orders (EXISTS + NOT EXISTS
    pair). Adapted: 'late' is l_shipdate > o_orderdate + grace (no
    commit/receipt dates in schema).

    Scale: EXISTS/NOT EXISTS compile to left-semi / left-anti hash
    joins on l_orderkey — no correlated per-row subquery execution;
    supplier and nation broadcast."""
    l1 = lineitem.alias("l1")
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = lineitem.alias("l3")
    o = orders.filter(F.col("o_orderstatus") == F.lit("F"))
    late1 = F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {grace_days} DAYS"
    )
    base = (
        l1.join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .filter(late1)
        .join(supplier, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.filter(F.col("n_name") == target_nation)),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    # another supplier participated in the order
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    # ...but no OTHER supplier was also late on it
    late3 = F.col("l3.l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {grace_days} DAYS"
    )
    sole_late = with_other.join(
        l3.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3"),
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & late3,
        "left_anti",
    )
    return sole_late.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


def sales_opportunity(customer: DataFrame, orders: DataFrame, nation_keys: list[int] = None) -> DataFrame:
    """TPC-H Q22 shape: customers in a nation whitelist with
    above-average positive balances and NO RECENT orders (scalar
    subquery + anti-join). Adapted: c_nationkey whitelist stands in for
    the phone country-code substring, and "no orders" is windowed to the
    trailing period so the shape exercises real rows at every sf.

    Scale: the average is a 1-row broadcast; the no-orders test is a
    left-anti hash join on custkey; both aggs are decimal-exact."""
    keys = nation_keys if nation_keys is not None else [1, 5, 9, 13, 17, 21, 24]
    pool = customer.filter(F.col("c_nationkey").isin(keys))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)))
        .alias("avg_bal")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit("2000-06-01")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )
