"""SimHash, embedding near-dup, and metrics-report operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import dedup
from vectordb_from_scratch_spark.operators.metrics import latency_report


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),     # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", "s1", 43),     # 1-word diff
        (3, "spark shuffles partition data across many executors tonight", "en", "s1", 59),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_identical_and_near(docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    assert sh[0] == sh[1]                       # identical text → identical simhash
    assert _hamming(sh[0], sh[2]) <= 6          # near-dup → small Hamming distance
    assert _hamming(sh[0], sh[3]) > _hamming(sh[0], sh[2])  # unrelated is farther
    assert all(0 <= v < 2**16 for v in sh.values())


def test_simhash_empty_doc_dropped(spark):
    df = spark.createDataFrame(
        [(0, "   ", "en", "s", 3), (1, "real text here", "en", "s", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id for r in dedup.simhash_fingerprints(df).collect()}
    assert got == {1}


def test_embedding_neardup_self_similar(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [-1.0, 0.0, 0.0, 0.0]),    # opposite
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dedup.embedding_neardup_pairs(df, threshold=0.9, dim=4, nbits=2).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 1) in got
    assert all(p.cos_sim >= 0.9 for p in pairs)
    assert not any({a, b} == {0, 2} for a, b in got)


def test_latency_report_exact_percentiles(spark):
    rows = [("q", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = latency_report(df).collect()[0]
    assert r.n == 100
    assert abs(r.avg_value - 50.5) < 1e-9
    assert abs(r.p50 - 50.5) < 1e-9    # interpolated median of 1..100
    assert abs(r.p95 - 95.05) < 1e-9
    assert abs(r.p99 - 99.01) < 1e-9


def test_latency_report_approx_mode(spark):
    rows = [("q", float(v)) for v in range(1, 1001)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = latency_report(df, approx=True).collect()[0]
    assert abs(r.p50 - 500) < 25  # t-digest tolerance


def test_simhash_pairs_pigeonhole_exact(docs):
    """Pigeonhole blocking loses no pairs: results equal the brute-force
    all-pairs Hamming filter on the same fingerprints."""
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    ids = sorted(fp)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fp[a] ^ fp[b]).count("1") <= 2
    }
    got = {(r.id_a, r.id_b) for r in dedup.simhash_neardup_pairs(docs, max_hamming=2).collect()}
    assert got == brute
    assert (0, 1) in got  # exact dups at Hamming 0


def test_simhash64_pigeonhole_exact_and_tighter(docs, spark):
    """64-bit SimHash: pigeonhole pairs equal brute force, and the wider
    fingerprint separates unrelated docs that 16 bits may conflate."""
    fp = {
        r.doc_id: r.simhash & (2**64 - 1)  # stored as a signed-long bit pattern
        for r in dedup.simhash_fingerprints(docs, bits=64).collect()
    }
    assert fp[0] == fp[1]                      # identical text, identical fp
    ids = sorted(fp)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(docs, max_hamming=3, bits=64).collect()
    }
    assert got == brute
    # unrelated docs are far apart at 64 bits
    assert bin(fp[0] ^ fp[3]).count("1") > 10


def test_simhash_kernel_equals_expression(docs):
    for bits in (16, 64):
        a = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs, bits=bits, strategy="expr").collect()}
        b = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs, bits=bits, strategy="kernel").collect()}
        assert a == b, bits


def test_winnowing_kernel_equals_expression(docs):
    from vectordb_from_scratch_spark.operators.textops import winnowing_fingerprints

    a = {(r.doc_id, r.n_fingerprints, r.fp_digest) for r in winnowing_fingerprints(docs, strategy="expr").collect()}
    b = {(r.doc_id, r.n_fingerprints, r.fp_digest) for r in winnowing_fingerprints(docs, strategy="kernel").collect()}
    assert a == b
