"""Pure-function tests for the benchmark scripts' offline logic.

The measurement legs need the real chip; the distillation/verdict math does
not — pinned here so artifact post-processing can't silently regress.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _load(name):
    sys.path.insert(0, str(REPO / "scripts"))
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _leg(steps, r1):
    return {
        "steps_completed": steps,
        "loss_last": 2.0,
        "retrieval": {"Retrieval I->T R@1": [[100, 1.0], [steps, r1]]},
    }


def test_equal_device_time_picks_matched_mixer_leg():
    ct = _load("compare_towers")
    doc = {
        "step_time": {
            "mixer-b32": {"sec_per_step": 0.4},
            "transformer-b32": {"sec_per_step": 0.8},
        },
        "curves": {
            "mixer-b32": _leg(400, 3.0),          # 160s device
            "transformer-b32": _leg(400, 5.0),    # 320s device
            "mixer-b32@800": _leg(800, 6.0),      # 320s device — the match
        },
    }
    ct._maybe_equal_device_time(doc)
    eq = doc["equal_device_time"]
    assert eq["mixer"]["steps"] == 800
    assert eq["transformer"]["steps"] == 400
    assert eq["device_time_mismatch_pct"] == 0.0
    assert eq["mixer"]["retrieval_final"]["Retrieval I->T R@1"] == [800, 6.0]


def test_equal_device_time_absent_without_both_towers():
    ct = _load("compare_towers")
    doc = {
        "step_time": {"mixer-b32": {"sec_per_step": 0.4}},
        "curves": {"mixer-b32": _leg(400, 3.0)},
    }
    ct._maybe_equal_device_time(doc)
    assert "equal_device_time" not in doc


def test_wilson_interval_known_values():
    from clip_mixer_tpu.evals.quant_gate import _wilson

    # k=0 lower bound is exactly 0; upper ~ z^2/(n+z^2)
    lo, hi = _wilson(0, 100)
    assert lo == 0.0 and 0.03 < hi < 0.045
    # symmetric case covers the MLE
    lo, hi = _wilson(50, 100)
    assert lo < 0.5 < hi and abs((lo + hi) / 2 - 0.5) < 1e-6
    # interval shrinks with n
    lo1, hi1 = _wilson(10, 100)
    lo2, hi2 = _wilson(100, 1000)
    assert (hi2 - lo2) < (hi1 - lo1)


def test_flip_verdict_ci_fields_and_margin():
    from clip_mixer_tpu.evals.quant_gate import _flip_verdict

    n = 4096
    t32 = np.zeros(n, np.int64)
    t16 = t32.copy()
    tq = t32.copy()
    t16[:36] = 1   # bf16 flips 36
    tq[:60] = 1    # int8 flips 60
    cos = np.full(n, 0.999)
    v = _flip_verdict(t32, t16, tq, cos, max_flip_ratio=2.5)
    assert v["flips_bf16"] == 36 and v["flips_int8"] == 60
    assert abs(v["flip_ratio"] - 60 / 36) < 1e-9
    assert v["flip_ratio_ci_low"] < v["flip_ratio"] < v["flip_ratio_ci_high"]
    assert abs(v["margin_to_budget"] - (2.5 - 60 / 36)) < 1e-9
    assert v["passed"]
    # CI bounds honor the same 1/n floor as the point estimate
    v0 = _flip_verdict(t32, t32, tq, cos, max_flip_ratio=2.5)
    assert v0["flips_bf16"] == 0 and np.isfinite(v0["flip_ratio_ci_high"])
