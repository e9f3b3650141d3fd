"""One-off hardware measurements: RN50 int8 serving + grad-accum overhead.

Methodology identical to bench.py (loop-carried jitted fori_loop chains,
slope between two loop lengths — the only honest timing through the
remote-dispatch tunnel). Results recorded in README.md / SCALING.md.

Run on the TPU: python scripts/bench_rn_accum.py [rn|accum]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _slope_time(run, n1=5, n2=25):
    """Shared tunnel-safe slope timing (utils/profiling.slope_time); n2=25
    keeps the heavier RN chains short."""
    from clip_mixer_tpu.utils.profiling import slope_time

    return slope_time(run, n1, n2)


def bench_rn():
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.ops.quant import (
        calibrate_resnet_tower,
        encode_image_rn_q,
        quantize_resnet_tower,
    )

    cfg = PRESETS["rn50"]
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)

    batch = 256
    rng = np.random.default_rng(0)
    pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16)
    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def chained(p, images_u8, n):
        def body(_, carry):
            feats = clip_model.encode_image(p, cfg, pre(images_u8 + carry.astype(jnp.uint8)))
            return feats.astype(jnp.float32).mean() * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    bf16_ips = batch / _slope_time(lambda n: chained(params, images, jnp.int32(n)))

    scales = jax.jit(lambda p, x: calibrate_resnet_tower(p, cfg, x))(params, pre(images[:64]))
    qparams = jax.jit(lambda p, s: quantize_resnet_tower(p, cfg, s))(params, scales)

    @jax.jit
    def chained_q(p, images_u8, n):
        def body(_, carry):
            f = encode_image_rn_q(p, cfg, pre(images_u8 + carry.astype(jnp.uint8)))
            return f.astype(jnp.float32).mean() * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.int32(0).astype(jnp.float32))

    int8_ips = batch / _slope_time(lambda n: chained_q(qparams, images, jnp.int32(n)))

    # fidelity on-device (jitted: an eager RN forward is hundreds of
    # individually-dispatched ops through the tunnel)
    f_bf = np.asarray(
        jax.jit(lambda p, im: clip_model.encode_image(p, cfg, pre(im)))(params, images[:64]),
        np.float32,
    )
    f_q = np.asarray(
        jax.jit(lambda p, im: encode_image_rn_q(p, cfg, pre(im)))(qparams, images[:64]),
        np.float32,
    )
    cos = (f_bf * f_q).sum(-1) / (np.linalg.norm(f_bf, axis=-1) * np.linalg.norm(f_q, axis=-1))
    print(json.dumps({
        "model": "rn50 encode_image (preprocess incl.)",
        "batch": batch,
        "bf16_imgs_per_sec": round(bf16_ips, 1),
        "int8_imgs_per_sec": round(int8_ips, 1),
        "speedup": round(int8_ips / bf16_ips, 3),
        "cosine_min": float(cos.min()),
    }))


def bench_accum():
    import optax

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.losses import info_nce
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess, normalize_images
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    cfg = PRESETS["mixer-b32"].replace(remat=True)
    tcfg = TrainConfig()
    mesh = make_mesh()  # 1 chip
    rng = np.random.default_rng(0)

    results = {}
    configs = ((1, 1024), (2, 2048), (4, 4096))
    if os.environ.get("ACCUM_FAST") == "1":
        configs = ((1, 1024), (4, 4096))
    for accum, total in configs:
        opt = make_optimizer(tcfg, total_steps=1000)
        params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(cfg, tcfg, mesh, opt, accum_steps=accum)
        res = cfg.image_resolution  # the step normalises in-graph, no resize
        images = rng.integers(0, 256, (total, res, res, 3), dtype=np.uint8)
        texts = np.zeros((total, cfg.context_length), np.int32)
        texts[:, 0] = 49406
        texts[:, 1:8] = rng.integers(1, 49000, (total, 7))
        texts[:, 8] = 49407
        batch = shard_batch(mesh, {"images": images, "texts": texts})

        def run(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch)
            loss = float(jax.device_get(m["loss"]))  # sync
            return time.perf_counter() - t0, loss

        run(1)  # compile
        dt1, _ = run(2)
        dt2, loss = run(8)
        per_step = (dt2 - dt1) / 6
        results[f"accum{accum}_batch{total}"] = {
            "ms_per_step": round(per_step * 1e3, 1),
            "imgs_per_sec": round(total / per_step, 1),
            "loss": round(loss, 4),
        }
        print(json.dumps({f"accum{accum}_batch{total}": results[f"accum{accum}_batch{total}"]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "rn"
    if which == "rn":
        bench_rn()
    else:
        bench_accum()
