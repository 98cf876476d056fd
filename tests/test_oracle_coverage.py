"""No query can silently rot: every ``queries()`` entry absent from the
latest driver CORRECTNESS file is oracle-checked here (VERDICT r2 #10 —
the driver samples ~50 of the registered queries per round; round 2 left 5
entries unverified in both rounds until the judge re-ran them by hand)."""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


def _latest_correctness() -> set[str]:
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        return set()
    latest = max(files, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(latest) as f:
        return set(json.load(f))


@pytest.mark.oracle_coverage
def test_unsampled_queries_pass_oracles():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    covered = _latest_correctness()
    missing = sorted(registered - covered)
    if not missing:
        pytest.skip("latest CORRECTNESS file covers every registered query")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"), SF_DIR, *missing],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, (
        f"check_oracles failed for {missing}:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
