"""Measure the run-to-run spread of the text int8 noise-floor gate statistic.

Round-2 recorded flip_ratio values of 0.0 and 1.78 from identical code —
at n=768 the flip COUNTS are single digits, so one hardware-nondeterministic
flip moves the ratio by O(1). This script runs the exact bench.py text-gate
protocol (fixed seeds, full Mixer-B/32 scale) N times in one process and
prints a table; the acceptance bar is max-min flip_ratio < 0.3 across 5
runs. The measured table is committed in text_noise_floor_gate's docstring.

Usage: python scripts/text_gate_stability.py [--runs 5] [--n-texts 4096]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--n-texts", type=int, default=4096)
    p.add_argument("--bank", type=int, default=512)
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.evals.quant_gate import synthetic_images, text_noise_floor_gate
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import normalize_images

    cfg = PRESETS["mixer-b32"]
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)

    gate_rng = np.random.default_rng(42)
    texts = np.zeros((args.n_texts, cfg.context_length), np.int32)
    texts[:, 0] = 49406
    texts[:, 1:8] = gate_rng.integers(1, 49000, (args.n_texts, 7))
    texts[:, 8] = 49407

    bank_imgs = synthetic_images(args.bank, cfg.image_resolution, seed=2)
    cfg32 = cfg.replace(compute_dtype="float32")
    bank = np.asarray(
        jax.jit(
            lambda pp, x: clip_model.l2_normalize(
                clip_model.encode_image(pp, cfg32, normalize_images(x, dtype="float32"))
            )
        )(params, jnp.asarray(bank_imgs)),
        np.float32,
    )

    rows = []
    for r in range(args.runs):
        g = text_noise_floor_gate(
            params, cfg, texts, bank.T, calibrate_n=128, batch_size=512
        )
        rows.append(g)
        print(json.dumps({"run": r, **{k: g[k] for k in (
            "flip_bf16_vs_f32", "flip_int8_vs_f32", "flip_ratio", "passed")}}), flush=True)

    ratios = [g["flip_ratio"] for g in rows]
    print(json.dumps({
        "n_texts": args.n_texts,
        "runs": args.runs,
        "ratio_min": min(ratios),
        "ratio_max": max(ratios),
        "spread": max(ratios) - min(ratios),
        "stable": max(ratios) - min(ratios) < 0.3,
    }))


if __name__ == "__main__":
    main()
