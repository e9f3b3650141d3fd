"""Measure the sampling spread of the IMAGE int8 noise-floor gate statistic.

Round 3's bench gate FAILED at flip_ratio 2.6 > 2.5 — decided by 13-vs-5
flip counts at n=768. The text gate already proved n=768 is underpowered
(flip_ratio swung 0.0<->1.78 across identical runs) and moved to n=4096;
this script runs the same diagnosis for the image gate, across BOTH noise
axes and BOTH front-end candidates:

* seed axis (dominant): independent synthetic image sets — the binomial
  sampling noise of the flip counts themselves. At n=768 a true ratio of
  2.0 produces observed ratios anywhere in ~[1, 8].
* front-end axis: planar fused front-end (round-3 headline graph,
  ops.quant.make_planar_front_end) vs NHWC preprocess + encode_image_q
  (round-2 headline graph) — same protocol, same images, so a genuine
  accuracy difference between the two separates from statistic noise.

Per (front_end, seed) row: flip counts, ratio, pass. Per front_end:
pooled counts over all seeds (the highest-powered estimate of the true
flip ratio) and the per-seed ratio spread. The committed table lives in
frontend_noise_floor_gate's docstring / README.

Usage: python scripts/image_gate_stability.py [--n 4096] [--seeds 5]
       [--front-ends planar nhwc] [--out IMAGE_GATE_STABILITY.json]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=4096, help="images per gate run")
    p.add_argument("--seeds", type=int, default=5, help="independent image sets")
    p.add_argument("--src-res", type=int, default=256)
    p.add_argument("--front-ends", nargs="+", default=["planar", "nhwc"])
    p.add_argument("--out", default=None, help="also write the table as JSON")
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
    from clip_mixer_tpu.evals.quant_gate import (
        build_float_classifier,
        frontend_noise_floor_gate,
        synthetic_images,
    )
    from clip_mixer_tpu.models import clip as clip_model

    cfg = PRESETS["mixer-b32"]
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    # bench.py's classifier: 64 classes x 4 templates at full model scale
    w = build_float_classifier(
        params, cfg, IMAGENET_CLASSNAMES[:64], PROMPT_TEMPLATES[:4], batch_size=256
    )

    result = {"n": args.n, "seeds": args.seeds, "front_ends": {}}
    for fe in args.front_ends:
        rows = []
        pooled_bf16 = pooled_int8 = 0
        for seed in range(1, args.seeds + 1):
            imgs = synthetic_images(args.n, args.src_res, seed=seed)
            g = frontend_noise_floor_gate(
                params, cfg, imgs, w, calibrate_n=128, batch_size=256, front_end=fe
            )
            rows.append(g)
            pooled_bf16 += round(g["flip_bf16_vs_f32"] * args.n)
            pooled_int8 += round(g["flip_int8_vs_f32"] * args.n)
            print(json.dumps({"front_end": fe, "seed": seed, **{k: g[k] for k in (
                "flip_bf16_vs_f32", "flip_int8_vs_f32", "flip_ratio", "passed")}}),
                flush=True)
        ratios = [g["flip_ratio"] for g in rows]
        total = args.n * args.seeds
        pooled_ratio = pooled_int8 / max(pooled_bf16, 1)
        summary = {
            "per_seed_ratios": [round(r, 3) for r in ratios],
            "ratio_min": round(min(ratios), 3),
            "ratio_max": round(max(ratios), 3),
            "spread": round(max(ratios) - min(ratios), 3),
            "pooled_flips_bf16": pooled_bf16,
            "pooled_flips_int8": pooled_int8,
            "pooled_n": total,
            "pooled_ratio": round(pooled_ratio, 3),
        }
        result["front_ends"][fe] = {"rows": rows, "summary": summary}
        print(json.dumps({"front_end": fe, **summary}), flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
