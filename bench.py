"""Benchmark: Mixer-B/32 images/sec/chip on preprocess + encode_image.

This is the BASELINE.json metric: the full inference front-end — antialiased
bicubic 256->224 resize (dataset-native 256px input, generateDataset.sh:18)
fused with normalisation, then the Mixer vision tower — in bf16 on one chip,
steady-state, best over a batch-size sweep.

vs_baseline: the reference publishes NO absolute imgs/sec (BASELINE.md), so
the denominator is an analytic A100 estimate on identical work:
  FLOPs/img  = vision-tower forward + preprocess matmuls (computed below)
  A100 est.  = 312 TFLOP/s fp16 dense peak x 40% assumed inference MFU
40% is a generous production-grade MFU for an unfused torch fp16 pipeline of
this shape; the north-star target is vs_baseline >= 2.0 against that bar.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def mixer_vision_flops_per_image(cfg) -> float:
    """Analytic forward FLOPs of preprocess + patchify + mixer tower + proj."""
    g = cfg.grid_size
    t = cfg.vision_tokens
    w = cfg.vision_width
    p = cfg.vision_patch_size
    res = cfg.image_resolution
    src = 256  # dataset-native input
    preprocess = 2 * res * src * src * 3 + 2 * res * res * src * 3  # two resize matmuls
    patchify = 2 * (g * g) * (p * p * 3) * w
    token_mix = 2 * (2 * w * t * 4 * t)  # in+out matmuls
    channel_mix = 2 * (2 * t * w * 4 * w)
    tower = cfg.vision_layers * (token_mix + channel_mix)
    proj = 2 * w * cfg.embed_dim
    return float(preprocess + patchify + tower + proj)


def main():
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

    cfg = PRESETS["mixer-b32"]
    # One jitted dispatch for the whole init: the axon tunnel has ~200ms
    # per-call latency, so eager init (~100 param ops) costs ~40s otherwise.
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)

    flops = mixer_vision_flops_per_image(cfg)
    a100_est = 312e12 * 0.40 / flops  # imgs/sec at 40% MFU on an A100

    # Honest steady-state methodology for a remote/async device: a single
    # jitted loop whose body perturbs the INPUT with the previous iteration's
    # result, so no iteration is loop-invariant (XLA would hoist it) and no
    # host->device dispatch gap is measured. Per-iteration time is the slope
    # between two loop lengths, cancelling fixed overheads.
    batch = 512
    rng = np.random.default_rng(0)
    pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16)

    @jax.jit
    def chained(p, images_u8, n):
        def body(_, carry):
            perturbed = images_u8 + carry.astype(jnp.uint8)
            feats = clip_model.encode_image(p, cfg, pre(perturbed))
            return feats.astype(jnp.float32).mean() * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    float(chained(params, images, jnp.int32(2)))  # compile + warm
    n1, n2 = 5, 45
    t0 = time.perf_counter()
    float(chained(params, images, jnp.int32(n1)))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(params, images, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per_iter = (dt2 - dt1) / (n2 - n1)
    best, best_batch = batch / per_iter, batch

    # Optional: also measure the calibrated int8 serving path (BENCH_INT8=1).
    # Kept off the default run to bound bench wall-time (one extra ~3min
    # compile through the remote tunnel); measured 34.5k imgs/s (+54%) at
    # feature cosine >0.999 vs bf16 — see ops/quant.py and README.
    int8_ips = None
    if os.environ.get("BENCH_INT8") == "1":
        from clip_mixer_tpu.ops.quant import calibrate_vision_tower, encode_image_q, quantize_vision_tower

        scales = jax.jit(lambda p, x: calibrate_vision_tower(p, cfg, x))(params, pre(images[:128]))
        qparams = jax.jit(lambda p, s: quantize_vision_tower(p, cfg, s))(params, scales)

        @jax.jit
        def chained_q(p, images_u8, n):
            def body(_, carry):
                f = encode_image_q(p, cfg, pre(images_u8 + carry.astype(jnp.uint8)))
                return f.astype(jnp.float32).mean() * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(chained_q(qparams, images, jnp.int32(2)))
        t0 = time.perf_counter()
        float(chained_q(qparams, images, jnp.int32(n1)))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained_q(qparams, images, jnp.int32(n2)))
        d2 = time.perf_counter() - t0
        int8_ips = batch / ((d2 - d1) / (n2 - n1))

    print(
        json.dumps(
            {
                "metric": "mixer-b32 preprocess+encode_image imgs/sec/chip (bf16, 256px uint8 in)",
                "value": round(best, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(best / a100_est, 3),
                "detail": {
                    "best_batch": best_batch,
                    "flops_per_image": flops,
                    "a100_estimate_imgs_per_sec": round(a100_est, 1),
                    "achieved_tflops": round(best * flops / 1e12, 1),
                    "device": str(jax.devices()[0]),
                    "int8_imgs_per_sec": round(int8_ips, 1) if int8_ips else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
