"""Measure the train step under each remat policy on the real chip.

Usage:
    python scripts/bench_remat_policy.py [--batch 1024] [--accum 1]
                                         [--preset mixer-b32]

Full remat (`remat_policy="none"`) re-runs each block's forward inside the
backward — ~1/3 of the step's matmul FLOPs are recompute. "mlp_hidden" keeps
the channel-MLP hidden pre-activations ([B, T, 4W] bf16 per block) so the
backward recomputes only LN/elementwise for the channel mix; "all_hidden"
additionally keeps the token-mix hidden, eliminating matmul recompute
entirely (models/layers.remat_policy_fn). This script measures what that
actually buys on hardware at the benched batch size — results recorded in
README's training table.

Methodology identical to bench.py: a single jitted loop-carried fori_loop
train chain (state threads through the loop; nothing loop-invariant), timed
as the slope between two loop lengths.
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
    p.add_argument("--preset", default="mixer-b32")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--policies", nargs="*", default=["none", "mlp_hidden", "all_hidden"])
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.losses import info_nce
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.parallel.train_step import flat_chunker, two_pass_accum_grads
    from clip_mixer_tpu.train.optimizer import make_optimizer
    from clip_mixer_tpu.utils.profiling import chained_train_time

    cfg = PRESETS[args.preset]
    tcfg = TrainConfig()
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    opt = make_optimizer(tcfg, total_steps=1000)
    opt_state = jax.jit(opt.init)(params)

    b = args.batch
    rng = np.random.default_rng(0)
    pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.integers(0, 256, (b, 256, 256, 3), dtype=np.uint8))
    texts = np.zeros((b, cfg.context_length), np.int32)
    texts[:, 0] = 49406
    texts[:, 1:8] = rng.integers(1, 49000, (b, 7))
    texts[:, 8] = 49407
    toks = jnp.asarray(texts)

    results = {}
    for policy in args.policies:
        rcfg = cfg.replace(remat=True, remat_policy=policy)

        # Both paths use info_nce's DEFAULT gradient semantics (stop-grad
        # keys, the reference's detach) so accum-vs-plain timings compare the
        # same backward math.
        if args.accum > 1:
            def loss_and_grads(p, imgs_u8, tk):
                def micro_feats(pp, im_u8, tx):
                    img, txt, _s, _bn = clip_model.forward_train(pp, rcfg, pre(im_u8), tx)
                    return img, txt
                def feat_loss(fi, ft, loss_params):
                    return info_nce(fi.reshape(b, -1), ft.reshape(b, -1),
                                    jnp.exp(loss_params["logit_scale"]))
                get_chunk = flat_chunker(imgs_u8, tk, args.accum)
                return two_pass_accum_grads(p, args.accum, get_chunk, micro_feats, feat_loss)
        else:
            def loss_and_grads(p, imgs_u8, tk):
                def loss_fn(pp):
                    img, txt, scale = clip_model.forward(pp, rcfg, pre(imgs_u8), tk)
                    return info_nce(img, txt, scale)
                return jax.value_and_grad(loss_fn)(p)

        try:
            dt = chained_train_time(
                params, opt_state, opt, tcfg.logit_scale_max, loss_and_grads, (imgs, toks)
            )
            results[policy] = {"ms_per_step": round(dt * 1e3, 1), "imgs_per_sec": round(b / dt, 1)}
        except Exception as e:  # OOM at this batch/policy is a result, not a crash
            results[policy] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({"policy": policy, "batch": b, "accum": args.accum,
                          **results[policy]}), flush=True)

    print(json.dumps({"preset": args.preset, "batch": b, "accum": args.accum,
                      "device": str(jax.devices()[0]), "results": results}))


if __name__ == "__main__":
    main()
