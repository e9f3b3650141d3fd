"""Measure the train step under each contrastive objective on the real chip.

Usage:
    python scripts/bench_loss.py [--batch 1024] [--preset mixer-b32]

InfoNCE (the reference objective, training/training.py:156-168) pays a
row+column softmax over the full batch; SigLIP (ops/losses.siglip_loss)
pays a pairwise sigmoid — on one chip both reduce to a [B, B] logits block
against the towers' ~60 GFLOP/sample forward+backward, so the expected
delta is small. The interesting property is at scale (the ring keeps the
per-chip working set [local_B, local_B] with n-1 neighbour hops instead of
an all_gather), which the virtual-mesh equivalence tests pin for
correctness; this script records the single-chip cost so the README table
has a measured number, not an assumption.

Methodology identical to bench.py: a single jitted loop-carried fori_loop
train chain, timed as the slope between two loop lengths
(utils/profiling.chained_train_time).
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


def _arm_watchdog(seconds: float):
    """Hard deadline: the remote-compile tunnel can stall such that even
    jax.devices() hangs forever (CLAUDE.md; bench.py carries a full child
    supervisor for this). A daemon timer + os._exit is enough for a perf
    script — no partial JSON is worth waiting hours for."""
    import threading

    def die():
        print(f'{{"error": "watchdog: no result within {seconds:.0f}s (tunnel stall?)"}}',
              flush=True)
        os._exit(124)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()
    return t


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="mixer-b32")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--losses", nargs="*", default=["info_nce", "siglip"])
    p.add_argument("--deadline", type=float, default=1800.0,
                   help="hard exit(124) after this many seconds (tunnel-stall guard)")
    args = p.parse_args()
    watchdog = _arm_watchdog(args.deadline)

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.losses import contrastive_loss
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.train.optimizer import make_optimizer
    from clip_mixer_tpu.utils.profiling import chained_train_time

    b = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (b, 256, 256, 3), dtype=np.uint8))
    texts = np.zeros((b, PRESETS[args.preset].context_length), np.int32)
    texts[:, 0] = 49406
    texts[:, 1:8] = rng.integers(1, 49000, (b, 7))
    texts[:, 8] = 49407
    toks = jnp.asarray(texts)

    results = {}
    for loss_kind in args.losses:
        # Same remat-on config as the production train.py default.
        cfg = PRESETS[args.preset].replace(
            remat=True,
            logit_bias_init=-10.0 if loss_kind == "siglip" else None,
        )
        tcfg = TrainConfig(loss=loss_kind)
        pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True,
                                    dtype=jnp.bfloat16)
        params = jax.jit(lambda k, c=cfg: clip_model.init(k, c))(jax.random.key(0))
        jax.block_until_ready(params)
        opt = make_optimizer(tcfg, total_steps=1000)
        opt_state = jax.jit(opt.init)(params)

        def loss_and_grads(p, imgs_u8, tk, c=cfg, kind=loss_kind):
            def loss_fn(pp):
                img, txt, scale = clip_model.forward(pp, c, pre(imgs_u8), tk)
                return contrastive_loss(kind, img, txt, scale,
                                        logit_bias=pp.get("logit_bias"))
            return jax.value_and_grad(loss_fn)(p)

        try:
            dt = chained_train_time(
                params, opt_state, opt, tcfg.logit_scale_max, loss_and_grads, (imgs, toks)
            )
            results[loss_kind] = {"ms_per_step": round(dt * 1e3, 1),
                                  "imgs_per_sec": round(b / dt, 1)}
        except Exception as e:
            results[loss_kind] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({"loss": loss_kind, "batch": b, **results[loss_kind]}), flush=True)

    print(json.dumps({"preset": args.preset, "batch": b,
                      "device": str(jax.devices()[0]), "results": results}))
    watchdog.cancel()


if __name__ == "__main__":
    main()
