"""The registry-wide plan audit as a suite gate (VERDICT r7 #1).

`tools/audit_plans.py` is the mechanized scale-killer hunt (cartesian
products, row-at-a-time Python UDFs, un-broadcast BNLJs, undocumented
exchange blowups). Round 7 shipped with the CLI gate red because nobody
re-ran it after registering a query — so the SAME flag logic now runs
inside `pytest tests/`: registering a query that fails the audit fails
the suite, not a tool someone has to remember.

Runs the full registry at sf0.001 (plan builds only, no execution jobs
beyond tiny in-plan collects) — ~2-3 min, the price of the gate being
un-skippable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_registry_plan_audit_is_green(spark):
    from audit_plans import audit_registry

    from vectordb_from_scratch_spark.operators import cache, dedup
    from vectordb_from_scratch_spark.plans.registry import QUERIES

    # Hermetic gate: the suite shares one session, and leftover persisted
    # subtrees from earlier tests change how union branches PRINT (an
    # already-cached delivery subplan prints as InMemoryTableScan, a
    # fresh one reprints its exchanges) — the audit must see the same
    # fresh-session plans the CLI sees, not whichever tests ran first.
    dedup.release_caches()
    cache.sweep_persistent_rdds(spark, all_rdds=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    flagged, checked = audit_registry(spark, "/root/testdata/sf0.001")
    assert checked == len(QUERIES), (
        f"audit built {checked}/{len(QUERIES)} plans — PLAN_ERROR entries: "
        f"{ {k: v for k, v in flagged.items() if any('PLAN_ERROR' in f for f in v)} }"
    )
    assert flagged == {}, (
        "plan audit flagged scale-killer patterns — fix the plan or add a "
        f"documented EXCHANGE_BUDGETS entry (tools/audit_plans.py): {flagged}"
    )
