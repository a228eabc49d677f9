"""Spill-path parity under clamped memory (VERDICT r4 #7): the widest
aggregation states must complete AND stay hash-identical to the oracle
when the JVM has ~1/100th of the dev sandbox's memory. Runs in a
subprocess because driver memory is fixed at JVM launch — the shared
test session can't be re-clamped."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_clamped_memory_parity():
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.spill_check"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "BP_SPILL_MEM": "1g"},
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"spill check failed:\n{out[-4000:]}"
    assert out.count("PASS") == 2, out[-4000:]
