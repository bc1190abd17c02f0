"""Slowly-changing-dimension type-2 merge — warehouse mutation as a plan.

The reference engine mutates rows in place (upsert, src/storage.rs); a
warehouse keeps HISTORY instead: each change closes the open version of
a row (sets its `effective_to`) and appends a fresh open version. This
module expresses that merge as a single declarative plan — no MERGE
statement or table format required, so it runs on plain parquet and the
result is itself a DataFrame any sink can write.

Scale design: exactly ONE shuffle — the full-outer join of open
versions with the update batch on the business key. Closed history
never joins (it unions through untouched), unchanged open rows are
recovered from the same join (no second scan of `current`), and when
the update batch is dimension-sized Catalyst broadcasts it (or pass
`broadcast(updates)` explicitly). At 100 TB the dimension's history is
typically millions of rows against a small daily batch — the join is
broadcast and the whole merge is a map-side union.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def _any_diff(tracked: Sequence[str]) -> Column:
    """True when any tracked attribute differs (NULL-safe on both sides)."""
    diffs = [
        ~F.col(f"__cur.{c}").eqNullSafe(F.col(f"__upd.{c}")) for c in tracked
    ]
    out = diffs[0]
    for d in diffs[1:]:
        out = out | d
    return out


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective_date,
    eff_col: str = "effective_from",
    end_col: str = "effective_to",
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    `current`: key cols + tracked cols + `eff_col` + `end_col`
    (NULL end = open version). `updates`: key cols + tracked cols.
    `effective_date`: the date the batch takes effect (python date or
    ISO string).

    Semantics per update row:
    - key exists open, any tracked attribute differs → the open version
      closes at `effective_date` and a new open version is appended;
    - key exists open, nothing differs → no-op (idempotent re-runs);
    - key unknown → new open version;
    and every closed-history row and untouched open row passes through
    verbatim. Column order of the result matches `current`.
    """
    eff = F.lit(effective_date).cast("date")
    cols = list(current.columns)
    keys = list(keys)
    tracked = list(tracked)
    if not tracked:
        # _any_diff would index diffs[0]; fail here with the real reason
        # instead of an IndexError from deep inside column construction.
        raise ValueError(
            "tracked must be non-empty: with no tracked attributes every "
            "matched update is a no-op and the merge cannot version anything"
        )

    closed = current.filter(F.col(end_col).isNotNull())
    open_v = current.filter(F.col(end_col).isNull()).alias("__cur")
    # presence of the update side can't be read off a nullable tracked
    # column — tag it explicitly so all-NULL updates still register
    upd = updates.withColumn("__present", F.lit(True)).alias("__upd")

    j = open_v.join(upd, on=keys, how="full_outer")
    in_cur = F.col(f"__cur.{eff_col}").isNotNull()
    in_upd = F.col("__upd.__present").isNotNull()
    changed = in_cur & in_upd & _any_diff(tracked)

    def _cur(c: str) -> Column:
        return F.col(f"__cur.{c}")

    # surviving open rows: untouched (no matching update, or a no-op
    # update) pass through; changed ones close at the effective date
    kept_open = j.filter(in_cur).select(
        *[
            (
                F.when(changed, eff).otherwise(_cur(end_col)).alias(end_col)
                if c == end_col
                else (F.col(c).alias(c) if c in keys else _cur(c).alias(c))
            )
            for c in cols
        ]
    )
    # fresh open versions: changed keys and brand-new keys
    fresh = j.filter(in_upd & (changed | ~in_cur)).select(
        *[
            (
                eff.alias(eff_col)
                if c == eff_col
                else F.lit(None).cast(current.schema[end_col].dataType).alias(end_col)
                if c == end_col
                else (F.col(c).alias(c) if c in keys else F.col(f"__upd.{c}").alias(c))
            )
            for c in cols
        ]
    )
    return closed.select(cols).unionByName(kept_open).unionByName(fresh)
