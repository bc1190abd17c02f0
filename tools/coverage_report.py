"""Driver-evidence coverage report: which registry queries have a green
CORRECTNESS_r*.json row, from which round, and which have none yet.

This is the never-sampled list as DATA (advisor r5): the registry's
enumeration reorder consumes the same computation, and this report makes
the evidence state inspectable without reading the reorder code.

Usage: python tools/coverage_report.py   →  one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(doc, dict):
            for name in doc:
                last[name] = max(last.get(name, 0), rnd)

    from vectordb_from_scratch_spark.plans.registry import QUERIES

    names = list(QUERIES)
    never = [n for n in names if n not in last]
    stale: dict[str, int] = {n: last[n] for n in names if n in last}
    by_round: dict[int, int] = {}
    for r in stale.values():
        by_round[r] = by_round.get(r, 0) + 1
    print(
        json.dumps(
            {
                "metric": "driver_evidence",
                "registry_total": len(names),
                "ever_sampled": len(stale),
                "never_sampled": sorted(never),
                "sampled_by_latest_round": {
                    str(k): by_round[k] for k in sorted(by_round)
                },
                "oldest_evidence": min(stale.values()) if stale else None,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
