"""BPE vocabulary induction (textops.bpe_merges): hand-computed merges
on the classic low/lower/newest corpus, tie-breaking, and the documented
replace-rewrite semantics on same-symbol runs."""

from __future__ import annotations

import pytest

from vectordb_from_scratch_spark.operators import textops


@pytest.fixture(scope="module")
def toy(spark):
    # word freqs: low×5, lower×2, newest×3
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_known_merges(toy):
    res = textops.bpe_merges(toy, n_merges=3).orderBy("step").collect()
    # step 1: (l,o) and (o,w) tie at 7 → lexicographic pick (l,o)
    assert (res[0].lhs, res[0].rhs, res[0].merged, res[0].pair_count) == (
        "l", "o", "lo", 7
    )
    # step 2: (lo,w) at 7 dominates
    assert (res[1].lhs, res[1].rhs, res[1].merged, res[1].pair_count) == (
        "lo", "w", "low", 7
    )
    # step 3: five pairs tie at 3 (all from newest); lex min is (e,s)
    assert (res[2].lhs, res[2].rhs, res[2].merged, res[2].pair_count) == (
        "e", "s", "es", 3
    )


def test_bpe_same_symbol_run_semantics(spark):
    """'aaaaa' under merge (a,a): the separator-padded replace merges
    leftmost-nonoverlapping on the PADDED string — aa,a,aa — which both
    engines produce identically (documented divergence from the
    per-symbol fold's aa,aa,a)."""
    df = spark.createDataFrame([(1, "aaaaa")], "doc_id long, text string")
    res = textops.bpe_merges(df, n_merges=2).orderBy("step").collect()
    assert (res[0].lhs, res[0].rhs, res[0].pair_count) == ("a", "a", 4)
    # after the rewrite the symbols are [aa, a, aa]: pairs (aa,a) and
    # (a,aa) both count 1; lex pick is (a,aa)
    assert (res[1].lhs, res[1].rhs, res[1].merged) == ("a", "aa", "aaa")
