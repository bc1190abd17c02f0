"""Parquet sources for the driver-generated star schema (TESTDATA.md).

The reference's only "sources" are its own bincode WAL/snapshot files and
a raw f32 mmap file (SURVEY.md §2.4) — columnar Parquet subsumes all of
them as the large-dataset read path. At 100 TB these reads rely on
Catalyst pushing filters/column pruning into the scan; loaders here stay
lazy and unmaterialized so pushdown reaches the files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _parquet_ts_is_nanos(path: str) -> bool:
    """Footer-only probe: does this parquet's `ts` column ship as
    TIMESTAMP(NANOS)? (pyarrow metadata read — no Spark job, no session
    state touched). Reading that layout through Spark requires the
    session-wide legacy nanosAsLong flag; every other layout must not
    trigger any conf mutation."""
    try:
        import pyarrow.parquet as pq

        f = path
        if os.path.isdir(path):
            parts = [p for p in sorted(os.listdir(path)) if p.endswith(".parquet")]
            if not parts:
                return False
            f = os.path.join(path, parts[0])
        field = pq.read_schema(f).field("ts")
        return getattr(field.type, "unit", None) == "ns"
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table; filters/projections push down.

    `events.ts` has shipped in three physical layouts across testdata
    generations — TIMESTAMP(NANOS) (Spark needs the nanosAsLong legacy
    flag and arrives as bigint), TIMESTAMP(MICROS) without tz (arrives
    as TIMESTAMP_NTZ), and tz-aware TIMESTAMP. Downstream code
    (`unix_micros` in sessionize/asof, `withWatermark` in streaming)
    requires a session-TZ TIMESTAMP, so normalize here — once, at the
    source — instead of per call site. The session TZ is UTC everywhere
    (session.py, bench.py, tests), so the naive→timestamp cast keeps
    DuckDB `epoch_us`-over-naive-value oracle parity, and the
    nanos→micros long division keeps DuckDB's floor-truncation
    semantics.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The legacy flag is pre-set in session.py's factory; sessions built
        # elsewhere (driver, tests) get it ONLY when the footer really is
        # TIMESTAMP(NANOS) — a read-path requirement Spark exposes solely as
        # session conf, so this last-resort fallback is the one place the
        # loader may touch shared state (steady-state layouts: no mutation).
        if _parquet_ts_is_nanos(path) and (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true"
        ):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy narrow stages get full parallelism.

    A small single-file parquet scan arrives as ONE partition, serializing
    any expensive per-row work (md5 minhashing, shingling) onto one core.
    Repartition up to the cluster's default parallelism when the scan has
    fewer splits; at real scale inputs arrive pre-split and this is a
    no-op (no shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can address it."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
