"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``vectordb_from_scratch_spark``; the query
inventory (Spark builder + DuckDB oracle twin per operator) is in
``vectordb_from_scratch_spark/plans/registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectordb_from_scratch_spark.plans.registry import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: brute-force euclidean k-NN over the embeddings table
    (the reference's FlatIndex::search, src/flat_index.rs:52-65) —
    broadcast probes → cross join → codegen'd distance → per-query top-k."""
    return QUERIES["knn_euclidean"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names,
    same values by construction — see registry.py parity rules)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
