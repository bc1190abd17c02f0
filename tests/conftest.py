from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import tempfile

    s = (
        SparkSession.builder.master("local[4]")
        .appName("vectordb_from_scratch_spark_tests")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="spark_wh_"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias usable inside hypothesis @given tests (plain arg, no funcarg
    re-entry per example)."""
    return spark


@pytest.fixture(scope="session")
def embeddings(spark):
    from vectordb_from_scratch_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="session")
def documents(spark):
    from vectordb_from_scratch_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "documents")
