"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM corpora actually ship in (one JSON document per line: The Pile,
RedPajama, Dolma and every scrape pipeline use it). The engine's tables
are parquet; this module is the ingest/egress edge.

Design rules for 100 TB:
- ALWAYS read with an explicit schema. Schema inference scans the whole
  input once before the real job (a full extra pass at corpus scale) and
  silently widens types on dirty data; a pinned schema makes the read
  single-pass and the row shape a contract. `read_jsonl` therefore
  REQUIRES a schema.
- Corrupt lines are quarantined, not fatal and not silently dropped.
  The read is text-source + from_json rather than the JSON data source:
  that keeps the RAW LINE as a first-class column (the JSON source's
  `_corrupt_record` can only be queried through a cached plan — an
  awkward contract at scale), so quarantine is a plain filter and the
  bad bytes survive verbatim for inspection/replay.
- JSONL is a row format: no column pruning, no predicate pushdown, no
  min/max stats — every query re-parses every byte. `jsonl_to_table`
  exists because the FIRST thing to do with JSONL at scale is convert it
  to parquet once and query the parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_jsonl",
    "write_jsonl",
    "corrupt_lines",
    "jsonl_to_table",
    "read_csv",
    "write_csv",
    "csv_to_table",
]

_RAW = "_raw_line"


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-pinned JSONL read. Returns the columns of `schema` (a DDL
    string) plus `_raw_line`: NULL for clean rows, the verbatim input
    line for rows that failed to parse (their schema columns are NULL).
    Blank lines are skipped. Unknown JSON fields are ignored — the
    schema is the contract.

    The read machinery reserves three names: `__cr` (in-struct corrupt-
    record marker), `value` (the text source's raw-line column), and
    `_raw_line` (the quarantine output column). A user schema using any
    of them would silently corrupt quarantine detection or hit an
    ambiguous-reference error after struct expansion, so they are
    rejected up front."""
    from pyspark.sql.types import StructType

    reserved = {"__cr", "value", _RAW}
    clash = reserved.intersection(f.name for f in StructType.fromDDL(schema).fields)
    if clash:
        raise ValueError(
            f"read_jsonl: schema field name(s) {sorted(clash)} collide with "
            f"reserved column(s) {sorted(reserved)} used by the quarantining "
            "read — rename them in the schema"
        )
    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    # from_json in PERMISSIVE mode fills a corrupt-record field INSIDE the
    # struct when the line fails to parse (a bare null-struct is what it
    # returns for parseable-but-empty objects, so null-ness can't signal
    # corruption)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"{schema}, __cr string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__cr"},
        ).alias("__j"),
        F.col("value"),
    )
    bad = F.col("__j.__cr").isNotNull()
    return parsed.select(
        "__j.*", F.when(bad, F.col("value")).alias(_RAW)
    ).drop("__cr")


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The quarantined raw lines of a read_jsonl frame (empty if clean)."""
    return df.filter(F.col(_RAW).isNotNull()).select(_RAW)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a DataFrame as JSONL. One JSON object per line, field order =
    column order. `n_files` coalesces for hand-off-sized exports; leave
    None to keep the upstream parallelism (one file per task — the right
    answer when the next reader is also distributed)."""
    out = df if n_files is None else df.coalesce(n_files)
    out.write.mode("overwrite").json(path)


def jsonl_to_table(
    spark: SparkSession, src: str, dest: str, schema: str
) -> tuple[int, int]:
    """Ingest JSONL → parquet in one pass, quarantining corrupt lines to
    `<dest>_corrupt`. Returns (n_clean, n_corrupt). This is the step that
    buys columnar pruning/stats for everything downstream — at 100 TB you
    run it exactly once per delivery."""
    raw = read_jsonl(spark, src, schema)
    clean = raw.filter(F.col(_RAW).isNull()).drop(_RAW)
    bad = corrupt_lines(raw)
    clean.write.mode("overwrite").parquet(dest)
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("overwrite").parquet(dest + "_corrupt")
    n_clean = spark.read.parquet(dest).count()
    return n_clean, n_bad


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """Schema-pinned CSV read with the same quarantine contract as
    read_jsonl: the columns of `schema` plus `_raw_line` (NULL for clean
    rows, the verbatim input line for rows that failed to parse).

    Same 100 TB design rules: no schema inference (from_csv over the
    text source is single-pass), and corrupt lines keep their raw bytes
    as a plain column instead of the CSV data source's cached-plan-only
    `_corrupt_record`. `header=True` drops lines that exactly match the
    schema's column list (the file's own header row); a header that
    DISAGREES with the schema is left to quarantine as a corrupt row —
    a delivery whose column order changed should fail loudly, not parse
    shifted.

    Known limitation of the text-match header drop: it removes EVERY
    line equal to `sep.join(column names)`, not just line 1 of each
    file. With an all-string schema a legitimate data row whose
    rendered form coincides with the header string is therefore dropped
    too (with any non-string column such a row could not parse clean
    anyway and would quarantine, so only all-string schemas are
    exposed). Distributed text sources expose no reliable per-file line
    number, so exact first-line semantics would cost a per-file pass —
    accept the documented edge, or pre-strip headers at delivery time
    when column values can collide with column names."""
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(schema).fields
    reserved = {"__cr", "value", _RAW}
    clash = reserved.intersection(f.name for f in fields)
    if clash:
        raise ValueError(
            f"read_csv: schema field name(s) {sorted(clash)} collide with "
            f"reserved column(s) {sorted(reserved)} used by the quarantining "
            "read — rename them in the schema"
        )
    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    if header:
        raw = raw.filter(F.col("value") != sep.join(f.name for f in fields))
    parsed = raw.select(
        F.from_csv(
            F.col("value"),
            f"{schema}, __cr string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__cr",
             "sep": sep},
        ).alias("__c"),
        F.col("value"),
    )
    bad = F.col("__c.__cr").isNotNull()
    return parsed.select(
        "__c.*", F.when(bad, F.col("value")).alias(_RAW)
    ).drop("__cr")


def write_csv(
    df: DataFrame, path: str, sep: str = ",", n_files: int | None = None
) -> None:
    """Write a DataFrame as headered CSV. Same coalesce contract as
    write_jsonl: `n_files` only for hand-off-sized exports."""
    out = df if n_files is None else df.coalesce(n_files)
    out.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)


def csv_to_table(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
) -> tuple[int, int]:
    """Ingest CSV → parquet in one pass, quarantining corrupt lines to
    `<dest>_corrupt`. Returns (n_clean, n_corrupt) — the CSV sibling of
    jsonl_to_table."""
    raw = read_csv(spark, src, schema, sep=sep, header=header)
    clean = raw.filter(F.col(_RAW).isNull()).drop(_RAW)
    bad = corrupt_lines(raw)
    clean.write.mode("overwrite").parquet(dest)
    n_bad = bad.count()
    if n_bad:
        bad.write.mode("overwrite").parquet(dest + "_corrupt")
    n_clean = spark.read.parquet(dest).count()
    return n_clean, n_bad
