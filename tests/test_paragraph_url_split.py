"""Round-7 pipeline operators: paragraph-level dedup (Dolma/C4
boilerplate removal), URL/domain provenance audit, and the
leakage-free content-keyed split."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import text as X
from vectordb_from_scratch_spark.operators import sampling
from vectordb_from_scratch_spark.operators.dedup import paragraph_dedup
from vectordb_from_scratch_spark.operators.textops import url_domains


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha one\n\nSHARED FOOTER\n\nalpha two"),
            (2, "beta one\n\nSHARED FOOTER\n\nbeta two"),
            (3, "SHARED FOOTER"),
        ],
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].n_paras == 3 and out[1].n_kept == 3
    assert out[1].clean_text == "alpha one\n\nSHARED FOOTER\n\nalpha two"
    # doc 2 loses only the footer, order of survivors preserved
    assert out[2].n_kept == 2
    assert out[2].clean_text == "beta one\n\nbeta two"
    # doc 3 was nothing but boilerplate
    assert out[3].n_kept == 0 and out[3].clean_text == ""


def test_paragraph_dedup_intra_doc_duplicates(spark):
    docs = _docs(spark, [(5, "x\n\nsame\n\nsame\n\ny")])
    r = paragraph_dedup(docs).collect()[0]
    assert r.n_paras == 4 and r.n_kept == 3
    assert r.clean_text == "x\n\nsame\n\ny"


def test_paragraph_dedup_normalizes_with_trim_only(spark):
    # fingerprint is md5(trim(para)): leading/trailing space collapses,
    # interior differences do not
    docs = _docs(spark, [(1, "par a\n\n par a "), (2, "par  a")])
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].n_kept == 1  # " par a " trims equal to "par a"
    assert out[2].n_kept == 1  # double space is a different paragraph


def test_url_domains_counts_and_case(spark):
    docs = _docs(
        spark,
        [
            (1, "a https://WWW.Ex.org/p/1 b http://cdn.ex.org/x"),
            (2, "c https://www.ex.org/p/2"),
            (3, "no urls here"),
        ],
    )
    out = {r.domain: r for r in url_domains(docs).collect()}
    assert set(out) == {"www.ex.org", "cdn.ex.org"}
    assert out["www.ex.org"].n_urls == 2 and out["www.ex.org"].n_docs == 2
    assert out["cdn.ex.org"].n_urls == 1 and out["cdn.ex.org"].n_docs == 1


def test_url_domains_scheme_case_userinfo_and_port(spark):
    """Round-7 review: uppercase schemes must extract, ports must not
    split a host's stats, and userinfo must not be attributed as the
    domain ('trusted.com@evil.com' is an evil.com URL)."""
    docs = _docs(
        spark,
        [
            (1, "x HTTP://EXAMPLE.COM/a and https://example.com:8080/b"),
            (2, "y https://trusted.com@evil.com/phish"),
            (3, "z https://example.com?q=1 w https://example.com#frag"),
        ],
    )
    out = {r.domain: r for r in url_domains(docs).collect()}
    assert set(out) == {"example.com", "evil.com"}
    assert out["example.com"].n_urls == 4 and out["example.com"].n_docs == 2
    assert out["evil.com"].n_urls == 1 and out["evil.com"].n_docs == 1


def test_leakage_free_split_groups_never_straddle(spark):
    # 200 base docs + exact duplicates of every third one: with the draw
    # keyed on the content fingerprint, a duplicate pair must always land
    # in the SAME split, whatever its doc_id
    rows = [(i, f"document body number {i % 60}") for i in range(200)]
    docs = _docs(spark, rows)
    u = sampling.hash_uniform(X.fingerprint("text"), salt="split-v2")
    assigned = docs.select(
        "doc_id",
        X.fingerprint("text").alias("fp"),
        F.when(u < 0.9, "train").when(u < 0.95, "valid").otherwise("test").alias("split"),
    )
    spans = (
        assigned.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    # and the split is non-degenerate on this corpus
    splits = {r.split for r in assigned.select("split").distinct().collect()}
    assert "train" in splits and len(splits) >= 2


# ---- property: paragraph_dedup vs an independent Python reference ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tab included: fingerprinting uses SQL trim (ASCII space only), and the
# reference below must agree — Python's bare strip() would eat the tab too
_para = st.text(alphabet="ab \tX", min_size=0, max_size=6)
_doc_corpus = st.lists(
    st.lists(_para, min_size=1, max_size=5), min_size=1, max_size=8
)


def _reference(corpus):
    """First-occurrence-wins paragraph dedup, computed sequentially."""
    seen = set()
    out = {}
    for doc_id, paras in enumerate(corpus):
        kept = []
        for p in paras:
            key = p.strip(" ")  # SQL trim semantics: spaces only
            if key not in seen:
                seen.add(key)
                kept.append(p)
        out[doc_id] = (len(paras), len(kept), "\n\n".join(kept))
    return out


@given(_doc_corpus)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_paragraph_dedup_matches_sequential_reference(spark, corpus):
    # paragraphs containing the separator would re-split; exclude by
    # construction (alphabet has no newline)
    docs = spark.createDataFrame(
        [(i, "\n\n".join(paras)) for i, paras in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in paragraph_dedup(docs).collect()
    }
    assert got == _reference(corpus)
    # the hot-fingerprint hybrid (r8) must be value-identical for ANY
    # threshold — threshold 0 routes every duplicated fingerprint
    # through the broadcast-keeper path, maximizing divergence surface
    hybrid = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in paragraph_dedup(docs, hot_threshold=0).collect()
    }
    assert hybrid == got


def test_cluster_safe_split_never_straddles_near_dup_pairs(spark):
    """The strongest split guard: even NON-identical near-duplicates
    (same LSH component) must land in the same split."""
    from vectordb_from_scratch_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog tonight"
    rows = []
    for i in range(40):
        rows.append((2 * i, f"{base} family {i}"))
        rows.append((2 * i + 1, f"{base} family {i} appended tail"))  # near dup
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    comp = connected_components(pairs, docs)
    u = sampling.hash_uniform(F.col("component"), salt="split-cluster-v1")
    assigned = comp.select(
        "doc_id", "component",
        F.when(u < 0.9, "train").when(u < 0.95, "valid").otherwise("test").alias("split"),
    )
    straddlers = (
        assigned.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddlers == 0
    # pair-level check: both ends of every LSH pair share a split
    sp = assigned.select(F.col("doc_id"), F.col("split"))
    both = (
        pairs.join(sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
    )
    assert both.filter(F.col("sa") != F.col("sb")).count() == 0
