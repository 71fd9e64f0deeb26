"""Run the fused-pipeline byte-identity cases in an isolated interpreter.

The cases themselves live in fused_pipeline_cases.py (not collected
directly): their giant interpret-mode Pallas programs trigger an
order/state-dependent XLA:CPU compiler segfault when compiled late in a
long pytest process (reproduced twice at ~40% of the full suite; the same
cases pass standalone every time).  A fresh subprocess gives them the
state they are known-good under, and a crash there fails THIS test instead
of killing the whole suite.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent


def test_fused_pipeline_cases_isolated():
    env = dict(os.environ, TMPDIR=os.environ.get("TMPDIR", "/tmp"))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         str(HERE / "fused_pipeline_cases.py")],
        capture_output=True, env=env, cwd=str(HERE.parent), timeout=1500)
    tail = (r.stdout or b"")[-2000:].decode("latin-1", "replace")
    assert r.returncode == 0, f"isolated fused-pipeline run failed:\n{tail}"
