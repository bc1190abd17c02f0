"""CSV source/sink (sources/textio.py read_csv/write_csv/csv_to_table):
the CSV sibling of the JSONL quarantining ingest edge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.sources import load_table
from vectordb_from_scratch_spark.sources.textio import (
    corrupt_lines,
    csv_to_table,
    read_csv,
    write_csv,
)

DOCS_SCHEMA = "doc_id long, lang string, n_chars long"


def test_csv_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "n_chars"
    )
    p = str(tmp_path / "docs_csv")
    write_csv(docs, p, n_files=2)
    back = read_csv(spark, p, DOCS_SCHEMA, header=True)
    assert corrupt_lines(back).count() == 0
    a = {r.doc_id: (r.lang, r.n_chars) for r in docs.collect()}
    b = {r.doc_id: (r.lang, r.n_chars) for r in back.collect()}
    assert a == b


def test_csv_corrupt_lines_quarantined(spark, tmp_path):
    p = str(tmp_path / "dirty")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.csv"), "w") as f:
        f.write("1,en,10\n")
        f.write("not-a-long,xx,zz\n")  # type failures → corrupt, raw kept
        f.write("2,de,20\n")
    df = read_csv(spark, p, DOCS_SCHEMA)
    assert df.filter(F.col("_raw_line").isNull()).count() == 2
    bad = corrupt_lines(df).collect()
    assert len(bad) == 1 and "not-a-long" in bad[0][0]


def test_csv_mismatched_header_is_quarantined_not_shifted(spark, tmp_path):
    """A delivery whose header disagrees with the pinned schema must not
    parse column-shifted: the foreign header lands in quarantine."""
    p = str(tmp_path / "shifted")
    os.makedirs(p)
    with open(os.path.join(p, "a.csv"), "w") as f:
        f.write("lang,doc_id,n_chars\n")  # wrong order vs schema
        f.write("3,fr,30\n")
    df = read_csv(spark, p, DOCS_SCHEMA, header=True)
    assert df.filter(F.col("_raw_line").isNull()).count() == 1
    bad = corrupt_lines(df).collect()
    assert len(bad) == 1 and bad[0][0].startswith("lang,")


def test_csv_to_table_converts_and_counts(spark, tmp_path):
    p = str(tmp_path / "dirty2")
    os.makedirs(p)
    with open(os.path.join(p, "a.csv"), "w") as f:
        f.write("1,en,10\n2,de,20\nbroken,row,here\n")
    dest = str(tmp_path / "tbl")
    n_clean, n_bad = csv_to_table(spark, p, dest, DOCS_SCHEMA)
    assert (n_clean, n_bad) == (2, 1)
    assert spark.read.parquet(dest).count() == 2
    assert spark.read.parquet(dest + "_corrupt").count() == 1
