"""scripts/acceptance.py end-to-end in stand-in mode (zero-egress harness
for the real-checkpoint gate: README probs + top-1 parity + int8 gate,
/root/reference/tests/test_consistency.py:9-25 is the reference oracle)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_standin(tmp_path):
    out = tmp_path / "ACCEPTANCE.json"
    proc = subprocess.run(
        [sys.executable, "scripts/acceptance.py", "--stand-in", "--platform", "cpu",
         "--out", str(out), "--gate-images", "64", "--torch-n-images", "64"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads(out.read_text())
    assert res["stages_executed"] == 3
    assert res["passed"]
    # our pipeline and the torch reference agree on the demo to the
    # reference's own tolerance, and side-by-side top-1 parity holds
    assert res["demo_probs"]["max_abs_diff_vs_torch"] < 0.01
    assert res["imagenet"]["delta_pct"] <= 0.1
    assert res["int8_gate"]["passed"]
