"""Dedup + text-analysis operator tests (north-star LLM-pipeline ops)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import text as X
from vectordb_from_scratch_spark.operators import dedup, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (1, "the quick  brown fox jumps over the lazy dog", "en", "s0", 45),  # ws/case dup
        (2, "The quick brown fox jumps over the lazy cat today", "en", "s1", 50),  # near-dup
        (3, "completely different text about spark engines and shuffles", "en", "s1", 59),
        (4, "el rapido zorro marron salta sobre el perro perezoso de la casa", "es", "s2", 64),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dedup_groups(docs):
    groups = dedup.exact_dedup(docs).collect()
    sizes = sorted(g.n_dups for g in groups)
    assert sizes == [1, 1, 1, 2]  # docs 0,1 collapse after normalization
    dup = next(g for g in groups if g.n_dups == 2)
    assert dup.keep_id == 0


def test_fingerprint_matches_hashlib(docs):
    row = docs.filter("doc_id = 0").select(X.fingerprint("text").alias("f")).first()
    norm = "the quick brown fox jumps over the lazy dog"
    assert row.f == hashlib.md5(norm.encode()).hexdigest()


def test_minhash_neardup_finds_pair(docs):
    pairs = dedup.neardup_pairs(docs, threshold=0.3, num_hashes=8, bands=4).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 1) in got  # exact dups always collide
    for p in pairs:
        assert 0.0 <= p.jaccard <= 1.0


def test_minhash_signature_properties(docs):
    sigs = dedup.minhash_signatures(docs, num_hashes=8).collect()
    by_id = {r.doc_id: r.sig for r in sigs}
    assert by_id[0] == by_id[1]  # identical normalized text → identical signature
    assert by_id[0] != by_id[3]


def test_ngram_jaccard_pairs(docs):
    allpairs = docs.alias("a").crossJoin(docs.alias("b")).filter(
        F.col("a.doc_id") < F.col("b.doc_id")
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, ngram=3, prefilter=allpairs).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 1) in got
    assert (0, 2) in got  # near-dup above 0.5 on 3-grams
    assert not any({a, b} == {3, 4} for a, b in got)


def test_token_stats(docs):
    stats = {r.doc_id: r for r in textops.token_stats(docs).collect()}
    assert stats[0].n_tokens == 9
    assert stats[0].n_chars_measured == 43


def test_lang_id_heuristic(docs):
    pred = {r.doc_id: r.pred_lang for r in textops.lang_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[4] == "es"


def test_quality_scores_bounded(docs):
    rows = textops.quality_scores(docs).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.punct_ratio >= 0.0


def test_quality_monotone_in_length(spark):
    rows = [(0, "short text", "en", "s", 10), (1, "the " * 60 + "end of a long document with many words", "en", "s", 250)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    scores = {r.doc_id: r.quality_score for r in textops.quality_scores(df).collect()}
    assert scores[1] > scores[0]


def test_lsh_bucket_cap_drops_mega_buckets(spark):
    """max_bucket_size: boilerplate-heavy corpora produce mega-buckets whose
    B² pair blowup the cap suppresses (those docs are exact-dup territory)."""
    boiler = [(i, "common license header text repeated verbatim", "en", "s", 40) for i in range(20)]
    distinct = [(100 + i, f"unique document number {i} with its own words entirely", "en", "s", 50) for i in range(4)]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string, lang string, source string, n_chars long")
    uncapped = dedup.lsh_candidate_pairs(df, num_hashes=8, bands=4)
    capped = dedup.lsh_candidate_pairs(df, num_hashes=8, bands=4, max_bucket_size=5)
    n_unc, n_cap = uncapped.count(), capped.count()
    assert n_unc >= 190          # 20 identical docs → C(20,2) pairs
    assert n_cap < n_unc         # mega-bucket suppressed
    boiler_pairs = capped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count()
    assert boiler_pairs == 0


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core property: docs sharing a long substring share at
    least one fingerprint; disjoint docs (different alphabets) share none."""
    common = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, common + " alpha ending one", "en", "s", 80),
        (1, "prefix words here " + common, "en", "s", 85),      # same substring, shifted
        (2, "zzz qqq xxx completely unrelated content vvv www", "en", "s", 48),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    from vectordb_from_scratch_spark.functions import text as X
    from vectordb_from_scratch_spark.sources.tables import spread
    import pyspark.sql.functions as F

    # recompute the selected sets (operator returns digest; property needs sets)
    grams = X.char_ngrams("text", n=5)
    staged = df.select("doc_id", F.transform(grams, lambda g: X.token_hash16(g)).alias("gh"))
    cnt = F.greatest(F.size("gh") - F.lit(3), F.lit(0))
    acc = F.slice("gh", 1, cnt)
    for j in range(2, 5):
        acc = F.zip_with(acc, F.slice("gh", j, cnt), lambda a, b: F.least(a, b))
    sel = {r.doc_id: set(r.s) for r in df.select("doc_id").join(
        staged.select("doc_id", F.array_distinct(acc).alias("s")), "doc_id").collect()}
    assert sel[0] & sel[1], "shared substring must share fingerprints"
    assert len(sel[0] & sel[1]) / len(sel[0] | sel[1]) > 0.3  # substantial overlap
    assert len(sel[0] & sel[2]) / len(sel[0] | sel[2]) < 0.2  # unrelated ≈ disjoint


def test_winnowing_operator_output(documents):
    from vectordb_from_scratch_spark.operators.textops import winnowing_fingerprints

    rows = winnowing_fingerprints(documents.limit(30)).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.n_fingerprints > 0
        assert len(r.fp_digest) == 32


def test_tfidf_cosine_pairs_semantics(spark):
    """Identical docs → sim 1.0; docs with no shared terms → no pair."""
    rows = [
        (0, "alpha beta gamma delta", "en", "s", 22),
        (1, "alpha beta gamma delta", "en", "s", 22),       # identical
        (2, "alpha beta gamma epsilon", "en", "s", 24),     # mostly shared
        (3, "zeta eta theta iota", "en", "s", 19),          # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    from vectordb_from_scratch_spark.operators.textops import tfidf_cosine_pairs

    pairs = {(r.id_a, r.id_b): r.cos_sim for r in tfidf_cosine_pairs(df, threshold=0.0).collect()}
    assert abs(pairs[(0, 1)] - 1.0) < 1e-9
    # idf down-weights the 3-doc shared terms hard in a 4-doc corpus, so
    # the overlap similarity is modest — positive is the property
    assert pairs[(0, 2)] > 0.1
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_kernel_equals_expression_path(documents):
    """The hashlib kernel and the Column-expression path must be
    bit-identical (same md5 family, same shingling)."""
    sub = documents.limit(60)
    a = {r.doc_id: list(r.sig) for r in dedup.minhash_signatures(sub, strategy="expr").collect()}
    b = {r.doc_id: list(r.sig) for r in dedup.minhash_signatures(sub, strategy="kernel").collect()}
    assert a == b


def test_jaccard_verify_kernel_rounds_like_spark_on_boundary_ratios(spark):
    # Ratios whose double sits just below the .5 decimal boundary expose the
    # rounding base: Spark/DuckDB round the shortest decimal repr
    # (3/640 = "0.0046875" → 0.004688), while quantizing the double's exact
    # binary expansion (0.00468749999…96) gives 0.004687 (ADVICE r1).
    from vectordb_from_scratch_spark.operators.dedup import _jaccard_verify_kernel

    cases = [(3, 640), (451, 640), (1, 128), (3, 256)]
    rows = []
    for i, (inter, union) in enumerate(cases):
        shared = [f"s{j}" for j in range(inter)]
        only_a = [f"a{i}_{j}" for j in range(union - inter)]
        rows.append((i * 2, i * 2 + 1, shared + only_a, shared))
    pairs = spark.createDataFrame(
        rows, "id_a long, id_b long, sh_a array<string>, sh_b array<string>"
    )
    kernel = pairs.mapInPandas(
        _jaccard_verify_kernel(0.0), schema="id_a long, id_b long, jaccard double"
    )
    expr = pairs.select(
        "id_a",
        "id_b",
        F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            6,
        ).alias("jaccard"),
    )
    k = {(r.id_a, r.jaccard) for r in kernel.collect()}
    e = {(r.id_a, r.jaccard) for r in expr.collect()}
    assert k == e
    # and the known boundary value itself
    assert (0, round(0.004688, 6)) in k


def test_ngram_blocking_finds_first_char_mutation(spark):
    # r1's (len_bucket, head_char) blocking deterministically missed any
    # near-dup pair whose first character differs; min-gram-digest
    # blocking must find it.
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    mutated = "The quick brown fox jumps over the lazy dog again and again in the yard"
    assert base[0] != mutated[0]
    docs = spark.createDataFrame([(1, base), (2, mutated)], "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, ngram=5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    j = next(r.jaccard for r in pairs if (r.id_a, r.id_b) == (1, 2))
    assert j >= 0.5


class TestConnectedComponents:
    def _cc(self, spark, edges, node_ids, **kw):
        from vectordb_from_scratch_spark.operators import dedup

        pairs = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
        if not edges:
            pairs = pairs.filter("id_a < 0")
        nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
        out = dedup.connected_components(pairs, nodes, **kw)
        return {r.doc_id: r.component for r in out.collect()}

    def test_chain_triangle_singleton(self, spark):
        # chain 1-2-3-4 (diameter 3), triangle 10-11-12, singleton 99
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
        got = self._cc(spark, edges, [1, 2, 3, 4, 10, 11, 12, 99])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    def test_no_edges_all_singletons(self, spark):
        got = self._cc(spark, [], [5, 6, 7])
        assert got == {5: 5, 6: 6, 7: 7}

    def test_merge_through_hub(self, spark):
        # two stars joined by a bridge — min id must flow across
        edges = [(1, 5), (2, 5), (3, 6), (4, 6), (5, 6)]
        got = self._cc(spark, edges, [1, 2, 3, 4, 5, 6])
        assert set(got.values()) == {1}

    def test_nonconvergence_raises(self, spark):
        import pytest as _pytest

        edges = [(i, i + 1) for i in range(1, 8)]
        with _pytest.raises(RuntimeError, match="did not converge"):
            self._cc(spark, edges, list(range(1, 9)), max_iters=1, driver_threshold=0)

    def test_long_chain_converges_in_log_rounds(self, spark):
        # Adversarial 300-node chain (diameter 299): pure min-propagation
        # would need 299 rounds; pointer jumping must finish within the
        # default max_iters=25 budget (~log2(300) + constants).
        n = 300
        edges = [(i, i + 1) for i in range(1, n)]
        got = self._cc(spark, edges, list(range(1, n + 1)), driver_threshold=0)
        assert set(got.values()) == {1}
        assert len(got) == n

    def test_driver_and_distributed_paths_agree(self, spark):
        # strategy selection must be invisible: same graph, same result
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 4)]
        ids = [1, 2, 3, 4, 10, 11, 12, 20, 99]
        via_driver = self._cc(spark, edges, ids)                      # ≤ threshold
        via_loop = self._cc(spark, edges, ids, driver_threshold=0)    # forced loop
        assert via_driver == via_loop

    def test_two_long_chains_stay_separate(self, spark):
        # jump steps must not leak labels across disconnected chains
        n = 64
        edges = [(i, i + 1) for i in range(1, n)] + [
            (i, i + 1) for i in range(1000, 1000 + n - 1)
        ]
        got = self._cc(
            spark, edges, list(range(1, n + 1)) + list(range(1000, 1000 + n)),
            driver_threshold=0,
        )
        assert set(got.values()) == {1, 1000}
        assert all(c == (1 if k <= n else 1000) for k, c in got.items())


def test_repetition_metrics_semantics(spark):
    from vectordb_from_scratch_spark.operators.textops import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),      # 4 tokens, 2 distinct -> dup 0.5; top 'a' 3/4
            (2, "x y z"),        # no repeats
            (3, "go go go go"),  # all same
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert got[1].n_tokens == 4 and abs(got[1].dup_token_frac - 0.5) < 1e-9
    assert abs(got[1].top_token_share - 0.75) < 1e-9
    # doc 1 bigrams: "a a","a a","a b" -> 3 total, 2 distinct -> 1/3
    assert abs(got[1].dup_2gram_frac - round(1 / 3, 6)) < 1e-9
    assert got[2].dup_token_frac == 0.0 and got[2].top_token_share == round(1 / 3, 6)
    assert got[3].dup_token_frac == 0.75 and got[3].top_token_share == 1.0


def test_shared_ngram_stats_semantics(spark):
    from vectordb_from_scratch_spark.operators.dedup import shared_ngram_stats

    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),
            (2, f"gamma {shared} delta"),
            (3, "totally different words here entirely"),
            (4, "shrt"),  # fewer than n tokens -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in shared_ngram_stats(docs, n=4).collect()}
    # the 4-gram "one two three four" appears in docs 1 and 2
    assert got[1].n_shared == 1 and got[2].n_shared == 1
    assert got[3].n_shared == 0 and got[3].shared_frac == 0.0
    assert got[4].n_grams == 0 and got[4].shared_frac == 0.0
    assert got[1].shared_frac == round(1 / got[1].n_grams, 6)


def test_decontamination_report_semantics(spark):
    from vectordb_from_scratch_spark.operators.dedup import decontamination_report

    leak = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (0, f"eval doc containing {leak} here"),   # id%5==0 -> eval side
            (1, f"train doc leaking {leak} verbatim"),  # contaminated
            (2, "clean train doc nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontamination_report(docs, n=4, eval_mod=5).collect()}
    assert set(got) == {1}  # only contaminated train docs surface
    assert got[1].n_shared_grams == 1 and got[1].n_eval_docs == 1


def test_pii_scrub_semantics(spark):
    from vectordb_from_scratch_spark.operators.textops import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@corp.example.org today"),
            (2, "server 192.168.0.1 and backup 10.0.0.7 up"),
            (3, "call +1 555 0100 42 now"),
            (4, "no pii in this row at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].n_email == 1 and "[PII]" in got[1].scrubbed
    assert "jane.doe" not in got[1].scrubbed
    assert got[2].n_ipv4 == 2 and got[2].scrubbed.count("[PII]") == 2
    assert got[3].n_phone == 1 and "555" not in got[3].scrubbed
    assert got[4].n_email == got[4].n_ipv4 == got[4].n_phone == 0
    assert got[4].scrubbed == "no pii in this row at all"


def test_lsh_bucket_cap_keeps_under_cap_candidates(spark):
    """Candidate RECALL under the cap: every true near-dup pair living in
    an under-cap bucket must survive mega-bucket suppression — the cap
    drops only the adversarial blowup, not the signal."""
    boiler = [
        (i, "common license header text repeated verbatim", "en", "s", 40)
        for i in range(30)
    ]
    # 10 true pairs, each with its own fully-distinct vocabulary so the
    # pair shares a singleton-sized bucket no other doc can enter
    pairs = []
    for p in range(10):
        words = " ".join(f"w{p}x{j}" for j in range(12))
        pairs.append((1000 + 2 * p, words, "en", "s", 60))
        pairs.append((1001 + 2 * p, words, "en", "s", 60))
    df = spark.createDataFrame(
        boiler + pairs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    capped = dedup.lsh_candidate_pairs(df, num_hashes=8, bands=4, max_bucket_size=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    want = {(1000 + 2 * p, 1001 + 2 * p) for p in range(10)}
    assert want <= got                      # full recall on under-cap buckets
    assert not any(a < 100 and b < 100 for a, b in got)  # mega-bucket gone


def test_bigram_logprob_known_values(spark):
    """Hand-computed MLE: corpus 'a b a b' + 'a b c' gives
    c(a,b)=3, c(b,a)=1, c(b,c)=1; prefixes a:3, b:2 →
    d1 = (ln1 + ln.5 + ln1)/3, d2 = (ln1 + ln.5)/2; 1-token docs drop."""
    import math

    from vectordb_from_scratch_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.bigram_logprob, r.n_bigrams)
           for r in textops.bigram_logprob(docs).collect()}
    assert 3 not in out
    assert out[1][1] == 3 and out[2][1] == 2
    assert abs(out[1][0] - round(math.log(0.5) / 3, 6)) < 1e-9
    assert abs(out[2][0] - round(math.log(0.5) / 2, 6)) < 1e-9


class TestSubstringOverlap:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_longest_run_recovered(self, spark):
        from vectordb_from_scratch_spark.operators.dedup import substring_overlap_pairs

        shared = " ".join(f"s{i}" for i in range(15))  # 15-token shared run
        docs = self._docs(spark, [
            (1, "alpha beta " + shared + " gamma"),
            (2, "zzz " + shared + " qqq rrr"),
            (3, "totally different words only here " + " ".join(f"u{i}" for i in range(10))),
        ])
        out = substring_overlap_pairs(docs, k=8, min_tokens=12).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b) == (1, 2)
        # a 15-token common substring = 8 consecutive matching 8-grams
        assert r.longest_overlap_tokens == 15
        assert r.n_gram_matches == 8

    def test_scattered_matches_do_not_form_a_run(self, spark):
        from vectordb_from_scratch_spark.operators.dedup import substring_overlap_pairs

        g1 = " ".join(f"a{i}" for i in range(8))
        g2 = " ".join(f"b{i}" for i in range(8))
        docs = self._docs(spark, [
            (1, g1 + " xx yy zz " + g2),
            (2, g2 + " pp qq rr " + g1),  # both grams shared, different order
        ])
        out = substring_overlap_pairs(docs, k=8, min_tokens=8).collect()
        assert len(out) == 1
        # two isolated 8-gram matches on different diagonals → longest is 8
        assert out[0].longest_overlap_tokens == 8
        assert out[0].n_gram_matches == 2

    def test_max_df_prunes_boilerplate_grams(self, spark):
        from vectordb_from_scratch_spark.operators.dedup import substring_overlap_pairs

        boiler = " ".join(f"c{i}" for i in range(8))
        docs = self._docs(
            spark,
            [(i, boiler + f" unique{i} tail{i}") for i in range(1, 6)],
        )
        full = substring_overlap_pairs(docs, k=8, min_tokens=8).collect()
        assert len(full) == 10  # all 5-choose-2 pairs share the boilerplate
        pruned = substring_overlap_pairs(docs, k=8, min_tokens=8, max_df=3).collect()
        assert pruned == []  # gram df=5 > 3 → dropped before the join


def test_incremental_delivery_report_classification(spark):
    """exact > near > fresh precedence; best near match = max jaccard,
    ties to min corpus id; no corpus-internal pairs ever surface."""
    from vectordb_from_scratch_spark.operators.dedup import (
        incremental_delivery_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),  # replica
            (3, "completely different corpus content about spark engines"),
        ],
        "doc_id long, text string",
    )
    delivery = spark.createDataFrame(
        [
            # exact copy of the 1/2 family -> exact, match_id = 1 (min)
            (101, "the quick brown fox jumps over the lazy dog tonight"),
            # near-dup of the family: appended tail -> near, match 1 (tie min)
            (102, "the quick brown fox jumps over the lazy dog tonight again folks"),
            # nothing like the corpus -> fresh
            (103, "utterly novel delivery text with unique vocabulary payload"),
        ],
        "doc_id long, text string",
    )
    out = {r.delivery_id: r for r in
           incremental_delivery_report(corpus, delivery, threshold=0.3).collect()}
    assert len(out) == 3
    assert out[101].verdict == "exact" and out[101].match_id == 1
    assert out[101].jaccard is None
    assert out[102].verdict == "near" and out[102].match_id == 1
    assert out[102].jaccard is not None and out[102].jaccard >= 0.3
    assert out[103].verdict == "fresh"
    assert out[103].match_id is None and out[103].jaccard is None


def test_incremental_delivery_index_reuse_is_identical(spark):
    """The persisted corpus index path must produce byte-identical
    verdicts to the inline path, and reject mismatched parameters."""
    import pytest as _pytest

    from vectordb_from_scratch_spark.operators.dedup import (
        build_corpus_dedup_index,
        incremental_delivery_report,
        release_caches,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i % 5} body words repeated here zip {i % 5}")
         for i in range(20)],
        "doc_id long, text string",
    )
    delivery = spark.createDataFrame(
        [(100, "corpus doc 2 body words repeated here zip 2"),
         (101, "corpus doc 3 body words repeated here zip 3 extra tail"),
         (102, "nothing in common with anything at all whatsoever")],
        "doc_id long, text string",
    )
    inline = sorted(
        incremental_delivery_report(corpus, delivery, threshold=0.3).collect()
    )
    idx = build_corpus_dedup_index(corpus)
    reused = sorted(
        incremental_delivery_report(
            corpus, delivery, threshold=0.3, corpus_index=idx
        ).collect()
    )
    assert inline == reused
    with _pytest.raises(ValueError, match="different"):
        incremental_delivery_report(
            corpus, delivery, bands=2, corpus_index=idx
        )
    release_caches()


def test_incremental_delivery_bucket_cap(spark):
    """max_bucket_size drops mega-bucket candidates (boilerplate guard):
    with the cap below the family size the near match disappears (falls
    to fresh), while exact matches are unaffected — and the index params
    tuple enforces cap agreement."""
    from vectordb_from_scratch_spark.operators.dedup import (
        build_corpus_dedup_index,
        incremental_delivery_report,
        release_caches,
    )

    # one 12-member exact-dup family: its band bucket has 12 members
    corpus = spark.createDataFrame(
        [(i, "quick brown fox jumps over the lazy dog tonight") for i in range(12)],
        "doc_id long, text string",
    )
    delivery = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog tonight"),        # exact
         (101, "quick brown fox jumps over the lazy dog tonight extra")], # near
        "doc_id long, text string",
    )
    uncapped = {r.delivery_id: r.verdict for r in
                incremental_delivery_report(corpus, delivery, threshold=0.3).collect()}
    assert uncapped == {100: "exact", 101: "near"}
    capped = {r.delivery_id: r.verdict for r in
              incremental_delivery_report(
                  corpus, delivery, threshold=0.3, max_bucket_size=5
              ).collect()}
    # the 12-member bucket is dropped: near-dup falls to fresh, exact
    # still caught by the fingerprint screen (the documented trade)
    assert capped == {100: "exact", 101: "fresh"}
    # no-silent-caps (VERDICT r7 #6): the index build reports the recall
    # surface the cap traded away (eager exact aggregate at build time)
    idx = build_corpus_dedup_index(corpus, max_bucket_size=5, with_cap_report=True)
    via_idx = {r.delivery_id: r.verdict for r in
               incremental_delivery_report(
                   corpus, delivery, threshold=0.3,
                   max_bucket_size=5, corpus_index=idx,
               ).collect()}
    assert via_idx == capped
    # 12 identical docs → 4 band buckets of 12 rows each, all over the cap
    assert idx["cap_report"] == {
        "rows_dropped": 48,
        "buckets_dropped": 4,
        "pairs_dropped": 4 * 66,  # 4 × C(12,2)
    }
    # unrequested → None (the cheap default); uncapped builds report None
    assert build_corpus_dedup_index(corpus)["cap_report"] is None
    release_caches()


def test_persisted_corpus_index_roundtrip(spark, tmp_path):
    """save/load_corpus_dedup_index: the disk-served warm screen must give
    the exact verdicts of the inline and session-cached paths, reject
    mismatched params, and round-trip the no-cap sentinel."""
    from vectordb_from_scratch_spark.operators.dedup import (
        incremental_delivery_report,
        load_corpus_dedup_index,
        release_caches,
        save_corpus_dedup_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha{i % 4} beta{i % 4} gamma{i % 4} delta{i % 4} "
             f"epsilon{i % 4} zeta{i % 4}") for i in range(8)],
        "doc_id long, text string",
    )
    delivery = spark.createDataFrame(
        [(100, "alpha0 beta0 gamma0 delta0 epsilon0 zeta0"),            # exact
         (101, "alpha1 beta1 gamma1 delta1 epsilon1 zeta1 tail words"), # near
         (102, "november kilo lima mike oscar papa quebec romeo")],     # fresh
        "doc_id long, text string",
    )
    inline = sorted(
        (r.delivery_id, r.verdict, r.match_id)
        for r in incremental_delivery_report(corpus, delivery, threshold=0.4).collect()
    )
    path = str(tmp_path / "idx")
    manifest = save_corpus_dedup_index(corpus, path, n_files=4)
    assert manifest["max_bucket_size"] is None
    idx = load_corpus_dedup_index(spark, path)
    assert idx["params"] == (8, 4, 3, None)
    served = sorted(
        (r.delivery_id, r.verdict, r.match_id)
        for r in incremental_delivery_report(
            None, delivery, threshold=0.4, corpus_index=idx
        ).collect()
    )
    assert served == inline
    import pytest as _p

    with _p.raises(ValueError, match="different"):
        incremental_delivery_report(None, delivery, bands=2, corpus_index=idx)
    release_caches()


def test_lsh_cap_report_quantifies_drops(spark):
    """No-silent-caps for the self-join path: lsh_cap_report returns exact
    zero counts when every bucket fits the cap (distinguishing 'cap
    unused' from 'cap bit'), and the exact mega-bucket accounting when it
    bites — same numbers the index-build report gives."""
    from vectordb_from_scratch_spark.operators.dedup import (
        lsh_cap_report,
        release_caches,
    )

    disjoint = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    assert lsh_cap_report(disjoint, num_hashes=8, bands=4, max_bucket_size=5) == {
        "rows_dropped": 0, "buckets_dropped": 0, "pairs_dropped": 0,
    }
    boiler = spark.createDataFrame(
        [(i, "common license header text repeated verbatim") for i in range(20)],
        "doc_id long, text string",
    )
    # 20 identical docs → 4 band buckets of 20 rows, all over the cap
    assert lsh_cap_report(boiler, num_hashes=8, bands=4, max_bucket_size=5) == {
        "rows_dropped": 80, "buckets_dropped": 4, "pairs_dropped": 4 * 190,
    }
    with pytest.raises(ValueError, match="positive"):
        lsh_cap_report(disjoint, max_bucket_size=0)
    release_caches()


# ---------------------------------------------------------------------------
# containment_pairs (round 8): prefix-filtered asymmetric set-containment
# ---------------------------------------------------------------------------


def test_containment_asymmetric_quote(spark):
    """A short doc quoted verbatim inside a long one: containment 1.0 in
    the short→long direction, below threshold the other way — the case
    symmetric Jaccard structurally misses."""
    quote = "the five boxing wizards jump quickly tonight"
    long_doc = (
        "intro paragraph with many unrelated words here "
        + quote
        + " and a long tail of additional unrelated commentary "
        "covering spark shuffles partitions codegen broadcast joins"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "entirely disjoint third document text")],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(docs, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}  # short ⊂ long only; Jaccard here is ~0.2


def test_containment_prefix_filter_lossless(spark):
    """The prefix filter must drop nothing: compare against the brute-force
    all-pairs containment on a corpus with heavy shingle sharing."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(24):
        words = base.split()
        # rotate + vary suffix so docs share most but not all shingles
        rot = words[i % 5 :] + words[: i % 5]
        rows.append((i, " ".join(rot) + f" tail{i % 7} tail{i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fast = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(docs, threshold=0.4).collect()
    }

    sh = docs.select(
        "doc_id", F.array_distinct(X.word_shingles("text", 3)).alias("s")
    ).filter(F.size("s") > 0)
    brute = (
        sh.alias("a")
        .crossJoin(sh.alias("b"))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.size(F.array_intersect("a.s", "b.s")).cast("double")
                / F.size("a.s").cast("double")
            ).alias("c"),
        )
        .filter(F.col("c") >= 0.4)
        .collect()
    )
    want = {(r.id_a, r.id_b): round(r.c, 6) for r in brute}
    assert fast == want
    assert len(want) > 0  # the corpus actually exercises the join


def test_containment_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "also tiny"), (3, "")],
        "doc_id long, text string",
    )
    # no doc has a 3-word shingle → no pairs, no crash
    assert dedup.containment_pairs(docs, threshold=0.5).collect() == []
    with pytest.raises(ValueError, match="threshold"):
        dedup.containment_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        dedup.containment_pairs(docs, threshold=1.5)


# ---------------------------------------------------------------------------
# collocations_pmi (round 8): PMI phrase mining
# ---------------------------------------------------------------------------


def test_collocations_pmi_known_values(spark):
    """Hand-computed PMI on a fixed corpus: 'san francisco' always adjacent
    → highest PMI; filler words co-occur with everything → low PMI."""
    import math

    rows = [
        (1, "san francisco is a city and san francisco is foggy"),
        (2, "the city of san francisco sits on a bay"),
        (3, "a b a b a b a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.collocations_pmi(docs, min_count=3, top=5).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    by_pair = {(r.w1, r.w2): r for r in out}
    assert ("san", "francisco") in by_pair
    sf = by_pair[("san", "francisco")]
    # corpus: tokens 10 + 9 + 8 = 27; bigrams 9 + 8 + 7 = 24
    # c(san francisco)=3, c(san)=3, c(francisco)=3
    want = math.log((3 / 24) / ((3 / 27) * (3 / 27)))
    assert sf.pair_count == 3
    assert abs(sf.pmi - round(want, 6)) < 1e-9
    with pytest.raises(ValueError, match="min_count"):
        textops.collocations_pmi(docs, min_count=0)


def test_collocations_pmi_ranking_deterministic(spark):
    """Ties in PMI break on (w1, w2); rank is contiguous from 1."""
    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "p q p q p q")],
        "doc_id long, text string",
    )
    out = textops.collocations_pmi(docs, min_count=2, top=10).collect()
    pairs = [(r.w1, r.w2) for r in out]
    # (p,q) and (x,y) have identical structure → identical PMI → lexical order
    assert pairs.index(("p", "q")) < pairs.index(("x", "y"))
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


# ---------------------------------------------------------------------------
# char_entropy (round 8): compressibility quality screen
# ---------------------------------------------------------------------------


def test_char_entropy_known_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, "abab"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textops.char_entropy(docs).collect()}
    assert (got[1].n_chars, got[1].n_distinct) == (4, 1)
    assert got[1].entropy == 0.0 and got[1].top_char_share == 1.0
    assert got[2].entropy == round(math.log(2), 6)  # two equiprobable chars
    assert got[2].top_char_share == 0.5
    assert (got[3].n_chars, got[3].entropy, got[3].top_char_share) == (0, 0.0, 0.0)
    assert got[4].entropy == round(math.log(2), 6)  # p(a)=p(b)=0.5
    assert (got[5].n_chars, got[5].entropy) == (0, 0.0)  # null text → empty


def test_char_entropy_flags_degenerate_docs(spark):
    """A padding-dump doc scores far lower entropy than prose of the same
    length — the screen the operator exists for."""
    prose = "the quick brown fox jumps over the lazy dog repeatedly today"
    junk = "x" * len(prose)
    docs = spark.createDataFrame(
        [(1, prose), (2, junk)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in textops.char_entropy(docs).collect()}
    assert got[2].entropy == 0.0
    assert got[1].entropy > 2.0
    assert got[2].top_char_share == 1.0


def test_fragment_report_drops_excerpt_keeps_superset(spark):
    """The quote is a fragment of the article; the article is not a
    fragment of anything; equal-size exact copies keep the smaller id."""
    quote = "the five boxing wizards jump quickly tonight again"
    article = (
        "opening words of a longer article " + quote +
        " closing words with more unique commentary about engines"
    )
    docs = spark.createDataFrame(
        [(1, article), (2, quote), (3, quote), (4, "unrelated standalone text body")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.fragment_report(docs, threshold=0.9).collect()}
    assert not got[1].is_fragment                           # superset survives
    # doc 2: contained in the article (larger); its equal-size copy 3 has
    # a LARGER id so it is not a container of 2 — 1 container
    assert got[2].is_fragment and got[2].n_containers == 1
    # doc 3: article + the equal-size smaller-id copy 2 — 2 containers
    assert got[3].is_fragment and got[3].n_containers == 2
    assert not got[4].is_fragment


def test_containment_threshold_boundary_not_lost(spark):
    """Adversarial boundary: containment EXACTLY at threshold 0.8 with
    the missing shingles being doc a's RAREST (df=1) — under the tight
    float prefix length floor((1-t)*n)+1 the prefix is exactly the
    missing grams ((1-0.8)*10 rounds to 1.9999… → floor 1) and the pair
    is silently lost; the +2 prefix keeps it. Verified against the
    brute-force join."""
    # doc 1: 12 tokens -> 10 distinct 3-shingles; tokens u1 u2 u3 unique
    # to doc 1 make its first two shingles df=1 (the rarest)
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = "u1 u2 " + shared              # shingles: (u1 u2 alpha), (u2 alpha beta), + 8 shared
    b = "prefixword " + shared + " suffixword"  # contains the 8 shared shingles of a
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    sh = docs.select(
        "doc_id", F.array_distinct(X.word_shingles("text", 3)).alias("s")
    )
    rows = {r.doc_id: r.s for r in sh.collect()}
    inter = len(set(rows[1]) & set(rows[2]))
    assert (len(rows[1]), inter) == (10, 8)  # containment(1→2) = 0.8 exactly
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(docs, threshold=0.8).collect()
    }
    assert got[(1, 2)] == 0.8


def test_novelty_stats_first_occurrence_semantics(spark):
    """Doc 1 owns every gram it shares with its later copy; the copy's
    novelty is 0; a disjoint doc is fully novel; sum of n_novel equals
    the corpus's distinct gram count."""
    a = "alpha beta gamma delta epsilon zeta"          # 3 distinct 4-grams
    c = "one two three four five six seven"            # 4 distinct 4-grams
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, c), (4, "too short"), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.novelty_stats(docs, n=4).collect()}
    assert (got[1].n_grams, got[1].n_novel, got[1].novelty_frac) == (3, 3, 1.0)
    assert (got[2].n_grams, got[2].n_novel, got[2].novelty_frac) == (3, 0, 0.0)
    assert (got[3].n_grams, got[3].n_novel) == (4, 4)
    assert (got[4].n_grams, got[4].novelty_frac) == (0, 0.0)
    # NULL text → NULL shingle array: the size coalesce must surface 0,
    # not NULL (the r9 single-shuffle shape lost the old join's implicit
    # coalesce; ADVICE r9)
    assert (got[5].n_grams, got[5].n_novel, got[5].novelty_frac) == (0, 0, 0.0)
    assert sum(r.n_novel for r in got.values()) == 7  # each gram owned once
