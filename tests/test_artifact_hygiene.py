"""Round-artifact hygiene gate (VERDICT r8 #5, third recurrence of the
same process defect): driver-produced round artifacts — BENCH_r*.json /
CORRECTNESS_r*.json — must never sit untracked in the working tree. An
untracked artifact means a round closed without committing its evidence,
which the judge flagged in rounds 5, 7, and 8. This test turns the
checklist item into a suite failure so it can't recur silently.
"""
from __future__ import annotations

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=30
    ).stdout


def test_round_artifacts_are_tracked():
    try:
        porcelain = _git("status", "--porcelain", "--untracked-files=all")
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("git unavailable")
    if not _git("rev-parse", "--git-dir").strip():
        pytest.skip("not a git repository")
    untracked = [
        line[3:]
        for line in porcelain.splitlines()
        if line.startswith("?? ")
        and (
            line[3:].startswith("BENCH_r")
            or line[3:].startswith("CORRECTNESS_r")
        )
        and line[3:].endswith(".json")
    ]
    assert not untracked, (
        f"driver round artifacts are untracked: {untracked} — "
        "commit them (git add + commit) before closing the round"
    )
