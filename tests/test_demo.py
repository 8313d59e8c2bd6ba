"""Demo golden-output test (reference tier-2 strategy: Demo/*.c + .out)."""

import os
import re
import subprocess
import sys

import pytest


def test_demo_matches_golden():
    root = os.path.join(os.path.dirname(__file__), "..")
    gold = os.path.join(root, "demos", "demo.out")
    if not os.path.exists(gold):
        pytest.skip("no golden file")
    env = dict(os.environ, SSTPU_DEMO_CPU="1")
    out = subprocess.run([sys.executable, os.path.join(root, "demos",
                                                       "demo.py")],
                         capture_output=True, text=True, env=env,
                         timeout=600).stdout
    want_lines = open(gold).read().strip().splitlines()
    got_lines = out.strip().splitlines()
    assert len(got_lines) == len(want_lines)
    for w, g in zip(want_lines, got_lines):
        # same fixture rows; residual magnitude must not regress by >100x
        assert w.split()[0] == g.split()[0]
        mw = re.search(r"resid=\s*([0-9.e+-]+)", w)
        mg = re.search(r"resid=\s*([0-9.e+-]+)", g)
        if mw and mg:
            assert float(mg.group(1)) <= 100 * max(float(mw.group(1)), 1e-18)
