"""Metadata filter algebra truth tables — translated from the reference's
filter tests (src/storage.rs:456-575; FIXTURES.md §1 vectors_meta)."""

from __future__ import annotations

import pytest

from vectordb_from_scratch_spark.operators.filters import compile_filter


@pytest.fixture(scope="module")
def meta_df(spark):
    rows = [
        ("sunset", {"color": "red", "category": "nature"}),
        ("ocean", {"color": "blue", "category": "nature", "size": "large"}),
        ("fire-truck", {"color": "red", "category": "vehicle"}),
        ("leaf", {"color": "green"}),
        ("bare", {}),
    ]
    return spark.createDataFrame(rows, "id string, metadata map<string,string>")


def _ids(df, spec):
    return {r.id for r in df.filter(compile_filter(spec)).collect()}


def test_eq(meta_df):
    assert _ids(meta_df, {"eq": {"field": "color", "value": "red"}}) == {"sunset", "fire-truck"}


def test_eq_absent_field_is_false(meta_df):
    assert _ids(meta_df, {"eq": {"field": "size", "value": "large"}}) == {"ocean"}


def test_ne_true_when_absent(meta_df):
    # reference: Ne matches when field is ABSENT (src/storage.rs:65)
    got = _ids(meta_df, {"ne": {"field": "color", "value": "red"}})
    assert got == {"ocean", "leaf", "bare"}


def test_exists(meta_df):
    assert _ids(meta_df, {"exists": {"field": "size"}}) == {"ocean"}


def test_and(meta_df):
    spec = {
        "and": [
            {"eq": {"field": "color", "value": "red"}},
            {"eq": {"field": "category", "value": "nature"}},
        ]
    }
    assert _ids(meta_df, spec) == {"sunset"}


def test_or(meta_df):
    spec = {
        "or": [
            {"eq": {"field": "color", "value": "green"}},
            {"eq": {"field": "size", "value": "large"}},
        ]
    }
    assert _ids(meta_df, spec) == {"leaf", "ocean"}


def test_nested_and_or(meta_df):
    spec = {
        "and": [
            {"or": [
                {"eq": {"field": "color", "value": "red"}},
                {"eq": {"field": "color", "value": "blue"}},
            ]},
            {"ne": {"field": "category", "value": "vehicle"}},
        ]
    }
    assert _ids(meta_df, spec) == {"sunset", "ocean"}


def test_bad_spec_raises():
    with pytest.raises(ValueError):
        compile_filter({"bogus": {}})
    with pytest.raises(ValueError):
        compile_filter({})
