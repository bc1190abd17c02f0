"""Metadata filter algebra → Catalyst ``Column`` compiler.

The reference's composable filter enum Eq/Ne/Exists/And/Or over
``map<string,string>`` metadata (src/storage.rs:47-71) becomes a tiny
JSON→Column compiler. Because the output is a plain Catalyst predicate,
Spark pushes it down / prunes partitions for free — the reference instead
post-filters an over-fetched candidate list (src/storage.rs:268-287).

Semantics preserved exactly, including the subtle one: ``Ne`` is TRUE when
the field is ABSENT (reference compares ``Some(v) != None`` →
src/storage.rs:65). ``Eq`` is false when absent.

Filter JSON shape (mirrors the reference's serde-tagged enum):
    {"eq":  {"field": "color", "value": "red"}}
    {"ne":  {"field": "color", "value": "red"}}
    {"exists": {"field": "color"}}
    {"and": [f1, f2, ...]}
    {"or":  [f1, f2, ...]}
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_filter"]


def compile_filter(spec: dict, metadata_col: str = "metadata") -> Column:
    """Compile a filter spec dict into a boolean Column over a map column."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"filter spec must be a single-key dict, got {spec!r}")
    (op, body), = spec.items()
    m = F.col(metadata_col)

    if op == "eq":
        # absent key → element_at returns NULL → NULL==v is NULL → filtered out
        return F.element_at(m, F.lit(body["field"])) == F.lit(body["value"])
    if op == "ne":
        # reference: Some(actual) != Some(expected), and None != Some(v) is TRUE
        # (src/storage.rs:65) — so absent field PASSES ne.
        val = F.element_at(m, F.lit(body["field"]))
        return val.isNull() | (val != F.lit(body["value"]))
    if op == "exists":
        return F.element_at(m, F.lit(body["field"])).isNotNull()
    if op == "and":
        return reduce(lambda a, b: a & b, (compile_filter(s, metadata_col) for s in body))
    if op == "or":
        return reduce(lambda a, b: a | b, (compile_filter(s, metadata_col) for s in body))
    raise ValueError(f"unknown filter op {op!r}")
