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


# Rows of input each spread() task should own. Caps how far a small scan
# fans out: a 5k-row fixture becomes ceil(5000/640)=8 partitions, not
# defaultParallelism — the r11 always-32-way spread made EVERY media
# fixture query 1.4-3.4× slower on the driver's ground-truth box, where
# the added full shuffle + 32 task launches cost more than the Python
# work they parallelized (VERDICT r11 #1). ≤640 rows stays on one
# partition (the work is under the task-overhead floor). At production
# scale inputs arrive pre-split wider than any cap and spread is a
# no-op either way; override per-deployment via the
# spark.vectordb.spread.rowsPerTask conf when per-row work is far from
# the ~0.1-1 ms/row these fixtures exhibit.
SPREAD_ROWS_PER_TASK = 640

_SPREAD_FOOTER_MAX_FILES = 64


def _footer_rows(df: DataFrame) -> int | None:
    """EXACT row count for small local file-backed scans, from parquet
    footer metadata only — no Spark job, no physical planning. Returns
    None for non-file plans, remote filesystems, or tables with more
    than _SPREAD_FOOTER_MAX_FILES files (that many splits already beats
    any spread target, so the caller's no-op answer is right anyway).
    Filters on the scan don't shrink the estimate — an over-count only
    errs toward a few more (cheap) tasks."""
    try:
        files = df.inputFiles()
    except Exception:  # RDD/in-memory-backed plans
        return None
    if not files or len(files) > _SPREAD_FOOTER_MAX_FILES:
        return None
    total = 0
    try:
        import pyarrow.parquet as pq
        from urllib.parse import urlparse

        for f in files:
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                return None
            total += pq.ParquetFile(p.path or f).metadata.num_rows
    except Exception:
        return None
    return total


def spread(df: DataFrame, rows: int | None = None) -> DataFrame:
    """Ensure compute-heavy narrow stages get parallelism PROPORTIONAL to
    their input.

    A small single-file parquet scan arrives as ONE partition, serializing
    any expensive per-row work (md5 minhashing, shingling, Python media
    synth) onto one core. Repartition round-robin to
    min(defaultParallelism, ceil(rows / SPREAD_ROWS_PER_TASK)) when the
    scan has fewer splits — size-aware so tiny fixtures get a few tasks,
    not a full-width fan-out whose task overhead exceeds the work
    (VERDICT r11 #1). At real scale inputs arrive pre-split and this is
    a no-op (no shuffle, and with rows known, no .rdd planning probe).

    ``rows``: optional caller-known row count; when omitted, parquet
    footers provide an exact count for file-backed scans and non-file
    plans fall back to the full defaultParallelism target (the pre-r12
    behavior — only tiny in-memory facades hit this).

    Contract: call this on SHALLOW plans (a scan plus narrow projections)
    only. The partition-count probe forces physical planning of the
    input, which on a deep/iterative plan is driver seconds per call
    (VERDICT r11 #2 — the r11 IVF/PQ Lloyd loops paid it per iteration);
    loop bodies must inherit a spread done once at the source."""
    sc = df.sparkSession.sparkContext
    dp = sc.defaultParallelism
    rpt = SPREAD_ROWS_PER_TASK
    conf_rpt = sc.getConf().get("spark.vectordb.spread.rowsPerTask", None)
    if conf_rpt is not None:
        rpt = max(1, int(conf_rpt))
    if rows is None:
        rows = _footer_rows(df)
    target = dp if rows is None else min(dp, -(-rows // rpt))
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can address it."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
