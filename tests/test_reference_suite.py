"""The reference's own unmodified test suite vs the compat package.

VERDICT r3 #7a: the 107/107 reference-suite result previously lived only in
a hand-run script (benchmarks/run_reference_suite.py); this wires it into
the hermetic suite so it cannot silently rot. The suite runs in a
subprocess — its scratch conftest forces the CPU backend and shims
cachetools (see the runner's docstring) — and every reference test
(tests/test_hyperdb.py + tests/test_ranking_algorithm.py, copied verbatim
from /root/reference) must pass against the drop-in ``hyperdb`` package.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "benchmarks", "run_reference_suite.py")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/tests"),
    reason="reference tree not present in this image",
)
def test_reference_suite_passes():
    # no extra flags: the runner already passes -q, and a second -q would
    # suppress the "107 passed" summary line this test pins
    proc = subprocess.run(
        [sys.executable, RUNNER],
        capture_output=True, text=True, timeout=1800,
    )
    tail = proc.stdout[-4000:] + "\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, f"reference suite failed:\n{tail}"
    # the count is part of the contract: every reference test ran
    assert "107 passed" in proc.stdout, tail
