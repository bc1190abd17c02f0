"""Source/sink format coverage: the engine's tables round-trip through
CSV, JSON-lines, and ORC with explicit schemas (the reference reads only
its own bincode files — SURVEY §2.6 'scans/sources/sinks')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_subset(spark):
    from vectordb_from_scratch_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)


def _rows(df):
    return sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect())


def test_csv_roundtrip(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_csv")
    docs_subset.write.option("header", True).option("quoteAll", True).csv(p)
    back = (
        spark.read.option("header", True)
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .csv(p)
    )
    assert _rows(back) == _rows(docs_subset)


def test_jsonl_roundtrip(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_json")
    docs_subset.write.json(p)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(p)
    assert _rows(back) == _rows(docs_subset)


def test_orc_roundtrip_with_compression(spark, docs_subset, tmp_path):
    p = str(tmp_path / "docs_orc")
    docs_subset.write.option("compression", "zstd").orc(p)
    back = spark.read.orc(p)
    assert _rows(back) == _rows(docs_subset)


def test_parquet_zstd_roundtrip_embeddings(spark, tmp_path):
    from vectordb_from_scratch_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    p = str(tmp_path / "emb_zstd")
    emb.write.option("compression", "zstd").parquet(p)
    back = spark.read.parquet(p)
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in back.collect()}
    assert a == b  # float arrays bit-exact through the sink
