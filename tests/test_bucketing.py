"""Bucketed co-located joins — the shuffle-elimination technique for
repeated joins on the same key (SURVEY §4: partitioning is the main
manual lever Spark gives that the single-node reference never needed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # session warehouse dir is a tmp dir (conftest) — static config
    from vectordb_from_scratch_spark.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed):
    orders_b, lineitem_b = bucketed
    from vectordb_from_scratch_spark.sources import load_table

    plain = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .join(load_table(spark, "/root/testdata/sf0.001", "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey).count() == plain


def test_ivf_partitioned_index_prunes_lists(spark, tmp_path):
    """The IVF scale claim (operators/ann.py build_ivf docstring): write
    the assigned table partitioned BY list_id and a probe of n_probe
    lists reads ONLY those partitions — partition pruning is the
    distributed beam search."""
    from vectordb_from_scratch_spark.operators import ann
    from vectordb_from_scratch_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    centers, assigned = ann.build_ivf(emb, n_lists=4)
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("list_id").parquet(path)

    idx = spark.read.parquet(path)
    probe = idx.filter(F.col("list_id").isin([0, 1]))
    # the list_id predicate must land in PartitionFilters (directory-level
    # pruning before any file IO), NOT in PushedFilters/post-scan Filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "list_id" in pf.group(1)
    # and the pruned read still returns exactly those lists' rows
    assert probe.count() == assigned.filter(F.col("list_id").isin([0, 1])).count()
