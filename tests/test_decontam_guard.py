"""Hot-gram guard for decontamination (VERDICT r8 #1).

The r8 100M scale cell measured the hazard: a gram hot on both the eval
and train side fans the attribution join out to df_eval × df_train rows
(~10^12 for one universal boilerplate gram). These tests plant exactly
that corpus — a footer appended to EVERY doc, so its pure 4-grams have
eval-side df = |eval slice| — and pin both guards:

- max_eval_df drops eval-hot grams before the broadcast join, and
  decontamination_cap_report accounts for every dropped gram/row
  (no silent caps);
- attribution=False joins against the distinct gram set, so no fan-out
  exists at any df, and its flags agree exactly with the attributed
  mode's on the same gram set.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_from_scratch_spark.operators import dedup
from vectordb_from_scratch_spark.sources import load_table

from conftest import SF_SMOKE

FOOTER = "planted universal boilerplate footer phrase"
EVAL_MOD = 5  # sf0.001 has ~50 docs → ~10 eval docs, so the footer is hot
CAP = 2


@pytest.fixture(scope="module")
def planted(spark):
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    return d.withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit(FOOTER))
    ).cache()


def test_cap_report_accounts_for_planted_grams(spark, planted):
    n_eval = planted.filter(F.col("doc_id") % EVAL_MOD == 0).count()
    assert n_eval > CAP, "fixture must make the footer eval-hot"
    rep = dedup.decontamination_cap_report(
        planted, n=4, eval_mod=EVAL_MOD, max_eval_df=CAP
    )
    # the footer contributes (at least) its two pure 4-grams, each with
    # df == |eval slice| — the hottest any gram can be
    assert rep["grams_dropped"] >= 2
    assert rep["max_eval_df_seen"] == n_eval
    # every dropped gram contributes its full df to the dropped-row count
    assert rep["eval_rows_dropped"] >= 2 * n_eval
    # a cap above the hottest gram drops nothing
    rep_loose = dedup.decontamination_cap_report(
        planted, n=4, eval_mod=EVAL_MOD, max_eval_df=n_eval
    )
    assert rep_loose["grams_dropped"] == 0
    assert rep_loose["eval_rows_dropped"] == 0


def test_cap_removes_universal_contamination(spark, planted):
    n_train = planted.filter(F.col("doc_id") % EVAL_MOD != 0).count()
    uncapped = dedup.decontamination_report(planted, n=4, eval_mod=EVAL_MOD)
    # the planted footer contaminates EVERY train doc without the guard
    assert uncapped.count() == n_train
    capped = dedup.decontamination_report(
        planted, n=4, eval_mod=EVAL_MOD, max_eval_df=CAP
    )
    # the guard removes the universal grams: only genuine (low-df)
    # collisions remain, which cannot cover the whole corpus
    assert capped.count() < n_train
    # and the guard never invents contamination: capped flags ⊆ uncapped
    extra = capped.select("doc_id").subtract(uncapped.select("doc_id"))
    assert extra.count() == 0


def test_flag_only_agrees_with_attributed_mode(spark, planted):
    capped = dedup.decontamination_report(
        planted, n=4, eval_mod=EVAL_MOD, max_eval_df=CAP
    )
    flags = dedup.decontamination_report(
        planted, n=4, eval_mod=EVAL_MOD, max_eval_df=CAP, attribution=False
    )
    assert flags.columns == ["doc_id", "n_shared_grams"]
    # same gram set ⇒ identical (doc, n_shared_grams) verdicts
    a = {(r["doc_id"], r["n_shared_grams"]) for r in capped.select(
        "doc_id", "n_shared_grams").collect()}
    b = {(r["doc_id"], r["n_shared_grams"]) for r in flags.collect()}
    assert a == b


def test_prep_v2_composes_flag_only_screen(spark, planted):
    """The composed pipeline's decontamination is the FLAG-ONLY shape
    (VERDICT r9 #3): no eval_id survives into the screen's plan, so no
    eval-df × train-df fan-out exists at any gram heat — and the screen
    still flags every train doc of the planted hot-footer corpus (they
    genuinely share the footer grams with eval)."""
    from vectordb_from_scratch_spark.plans.registry import QUERIES

    df = QUERIES["pipeline_corpus_prep_v2"].spark(spark, SF_SMOKE)
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "eval_id" not in plan, "composed screen must be flag-only"
        # semantics on the hot corpus: the same composition over the
        # planted-footer table flags ALL train docs (flag-only mode is a
        # guard against fan-out, never a silent cap on what gets flagged)
        n_train = planted.filter(F.col("doc_id") % EVAL_MOD != 0).count()
        flagged = dedup.decontamination_report(
            planted, n=4, eval_mod=EVAL_MOD, attribution=False
        )
        assert flagged.count() == n_train
    finally:
        dedup.release_caches()


def test_bloom_screen_is_answer_invisible(spark, planted):
    """decontamination_report_bloom must return EXACTLY the flag-only
    report — the bloom only thins the verify join's input. Pinned at
    the default sizing AND at an adversarially tiny bitmap (m_bits=64,
    ~every screen test passes → maximal false positives), because false
    positives may cost work but never answers."""
    exact = {
        (r["doc_id"], r["n_shared_grams"])
        for r in dedup.decontamination_report(
            planted, n=4, eval_mod=EVAL_MOD, max_eval_df=2,
            attribution=False,
        ).collect()
    }
    for m_bits in (1 << 18, 64):
        got = {
            (r["doc_id"], r["n_shared_grams"])
            for r in dedup.decontamination_report_bloom(
                planted, n=4, eval_mod=EVAL_MOD, max_eval_df=2,
                m_bits=m_bits,
            ).collect()
        }
        assert got == exact, m_bits
