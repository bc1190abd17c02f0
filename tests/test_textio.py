"""JSONL source/sink (sources/textio.py): round-trip fidelity, corrupt-
line quarantine, schema pinning, and the jsonl -> parquet ingest step."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.sources import load_table
from vectordb_from_scratch_spark.sources.textio import (
    corrupt_lines,
    jsonl_to_table,
    read_jsonl,
    write_jsonl,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p, n_files=2)
    back = read_jsonl(spark, p, DOCS_SCHEMA)
    assert corrupt_lines(back).count() == 0
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    p = str(tmp_path / "dirty")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    df = read_jsonl(spark, p, "doc_id long, text string")
    assert df.filter(F.col("_raw_line").isNull()).count() == 2
    bad = corrupt_lines(df).collect()
    assert len(bad) == 1 and "not json" in bad[0][0]


def test_jsonl_to_table_converts_and_counts(spark, tmp_path):
    p = str(tmp_path / "dirty2")
    os.makedirs(p)
    with open(os.path.join(p, "a.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "x"}\n{"doc_id": 2, "text": "y"}\nnope\n')
    dest = str(tmp_path / "tbl")
    n_clean, n_bad = jsonl_to_table(spark, p, dest, "doc_id long, text string")
    assert (n_clean, n_bad) == (2, 1)
    assert spark.read.parquet(dest).columns == ["doc_id", "text"]
    assert spark.read.parquet(dest + "_corrupt").count() == 1


def test_schema_pinned_read_ignores_extra_fields(spark, tmp_path):
    p = str(tmp_path / "extra")
    os.makedirs(p)
    with open(os.path.join(p, "a.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "x", "unexpected": [1,2,3]}\n')
    df = read_jsonl(spark, p, "doc_id long, text string")
    rows = df.collect()
    assert rows[0].doc_id == 1 and rows[0]._raw_line is None


def test_cli_ingest_and_dedup_roundtrip(spark, tmp_path):
    """CLI corpus verbs: jsonl -> parquet -> dedup, counts printed."""
    import io
    from contextlib import redirect_stdout

    from vectordb_from_scratch_spark.cli import run

    p = str(tmp_path / "cli_src")
    os.makedirs(p)
    with open(os.path.join(p, "a.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "alpha beta"}\n')
        f.write('{"doc_id": 2, "text": "ALPHA  beta"}\n')   # normalized dup
        f.write('{"doc_id": 3, "text": "gamma delta"}\n')
        f.write("garbage line\n")
    tbl = str(tmp_path / "cli_tbl")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run(["ingest-jsonl", p, tbl, "--schema", "doc_id long, text string"],
                 spark=spark)
    assert rc == 0 and "ingested 3 rows" in buf.getvalue()
    assert "1 corrupt" in buf.getvalue()

    ded = str(tmp_path / "cli_ded")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run(["dedup", tbl, ded], spark=spark)
    assert rc == 0 and "kept 2 of 3" in buf.getvalue()
    assert {r.doc_id for r in spark.read.parquet(ded).collect()} == {1, 3}


def test_read_jsonl_rejects_reserved_column_names(spark, tmp_path):
    """`__cr`, `value`, `_raw_line` are read-machinery names; a schema
    using one would silently break quarantine detection — reject up
    front instead."""
    import pytest as _pt

    from vectordb_from_scratch_spark.sources import textio

    p = str(tmp_path / "x.jsonl")
    with open(p, "w") as f:
        f.write('{"value": 1}\n')
    for bad in ("value int", "doc_id long, __cr string", "_raw_line string"):
        with _pt.raises(ValueError, match="reserved"):
            textio.read_jsonl(spark, p, bad)
