"""Component profile + ceiling accounting for the TRAIN step (real TPU).

Round-4 verdict item 2: inference got an ablation profile and a
speed-of-light closure (scripts/profile_mixer.py, README "ceiling"); the
404ms B=1024 remat train step had neither. Same methodology here — every
number is a loop-carried chained measurement (utils/profiling slope timing,
the only method the axon tunnel doesn't distort), components are isolated by
ablation, and the MFU statement uses XLA's own FLOPs count when available
(jit(...).lower().compile().cost_analysis()) with an analytic matmul count
as the cross-check.

Legs (mixer-b32, InfoNCE, AdamW, B=1024, remat on — the bench/README row):

  full           fwd + bwd + AdamW update + logit clamp   (the real step)
  sgd_apply      fwd + bwd + p -= lr*g                     -> AdamW cost
  ema            full + params EMA                         -> EMA cost
  fwd_only       loss value alone                          -> backward cost
  fwd_image/text per-tower forward                         -> tower split
  cheap_loss     towers fwd+bwd+opt, InfoNCE ablated to a
                 diagonal dot                              -> loss+gather cost
  remat_pair     full step remat on vs off at B=128 (no-remat
                 at B=1024 needs ~86GB and OOMs)           -> recompute cost

Writes TRAIN_PROFILE.json and prints one JSON line.
Usage: python scripts/profile_train.py [--batch 1024]
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

V5E_BF16_PEAK = 197e12  # same constant as bench.py's MFU row


def analytic_fwd_flops(cfg, batch: int) -> float:
    """Matmul-only forward FLOPs per batch (the MXU work; LN/softmax/glue
    excluded, consistent with the inference ceiling accounting)."""
    T = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1  # tokens+cls
    W = cfg.vision_width
    patch_in = cfg.vision_patch_size ** 2 * 3
    tok_hidden = 4 * T if cfg.tower == "mixer" else 0  # token-mix MLP (CLS included)
    vis = (T - 1) * patch_in * W * 2  # patchify-as-matmul
    for _ in range(cfg.vision_layers):
        if cfg.tower == "mixer":
            vis += W * (T * tok_hidden * 2 * 2)          # token-mix in+out
        else:  # ViT twin: QKV+out + scores+weighted sum
            vis += T * W * W * 2 * 4 + 2 * T * T * W * 2
        vis += T * W * (4 * W) * 2 * 2                   # channel/MLP in+out
    vis += W * cfg.embed_dim * 2  # CLS projection
    L, D = cfg.text_layers, cfg.text_width
    C = cfg.context_length
    txt = 0.0
    for _ in range(L):
        if cfg.tower == "mixer":  # text tower is a mixer too (towers.py:154)
            txt += D * (C * (4 * C) * 2 * 2)             # token-mix in+out
        else:
            txt += C * D * D * 2 * 4 + 2 * C * C * D * 2  # attn
        txt += C * D * (4 * D) * 2 * 2                   # MLP
    txt += D * cfg.embed_dim * 2  # EOT projection
    # token embedding gather is not a matmul; logit block counted in the
    # cheap_loss ablation instead
    return batch * (vis + txt)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--preset", default="mixer-b32",
                   help="mixer-debug for a CPU smoke run of the harness")
    p.add_argument("--platform", default=None,
                   help="force the JAX platform (jax.config route; the env "
                   "var is inert under sitecustomize)")
    p.add_argument("--remat-pair-batch", type=int, default=128)
    p.add_argument("--sweep-batches", default=None, metavar="B1,B2,...",
                   help="also time the full step at these batches")
    p.add_argument("--sweep-only", action="store_true",
                   help="run ONLY --sweep-batches and merge into --out")
    p.add_argument("--out", default=str(REPO / "TRAIN_PROFILE.json"))
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.losses import info_nce
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.train.optimizer import make_optimizer
    from clip_mixer_tpu.utils.profiling import chained_train_time, slope_time

    import optax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    B = args.batch
    cfg = PRESETS[args.preset].replace(remat=True)
    tcfg = TrainConfig()
    pre = make_batch_preprocess((256, 256), cfg.image_resolution,
                                normalize=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    toks = jnp.asarray(rng.integers(
        1, cfg.vocab_size - 2, (B, cfg.context_length), dtype=np.int32))
    params = jax.jit(lambda: clip_model.init(jax.random.key(0), cfg))()
    jax.block_until_ready(params)
    opt = make_optimizer(tcfg, total_steps=1000)
    opt_state = jax.jit(opt.init)(params)

    def make_lag(loss_kind, _cfg=cfg):
        def loss_and_grads(p, im, t):
            def loss_fn(pp):
                img, txt, scale = clip_model.forward(pp, _cfg, pre(im), t)
                if loss_kind == "info_nce":
                    return info_nce(img, txt, scale)
                # diagonal dot: grads still flow through BOTH towers but the
                # [B, B] logit block + softmax + its backward are gone
                return -(img * txt).sum() * (1.0 / B)
            return jax.value_and_grad(loss_fn)(p)
        return loss_and_grads

    out = {"batch": B, "model": f"{args.preset}, remat on, InfoNCE, AdamW"}
    if args.sweep_only:
        # merge just the batch sweep into an existing artifact
        prior = {}
        if Path(args.out).exists():
            prior = json.loads(Path(args.out).read_text())
        out = prior or out

    # ---- batch-geometry sweep (is B=1024 the right train geometry?) ------
    if args.sweep_batches:
        import optax
        from clip_mixer_tpu.utils.profiling import slope_time as _slope

        # the batch rides as EXPLICIT jit arguments: a closed-over device
        # array is inlined as an HLO constant, and at B=2048 the 402MB
        # uint8 constant exceeds the remote-compile tunnel's payload cap
        # (HTTP 413)
        @jax.jit
        def sweep_chain(state, im, tk, n):
            def body(_, carry):
                p, o = carry
                def loss_fn(pp):
                    fi, ft, scale = clip_model.forward(pp, cfg, pre(im), tk)
                    return info_nce(fi, ft, scale)
                _, g = jax.value_and_grad(loss_fn)(p)
                updates, o2 = opt.update(g, o, p)
                p = dict(optax.apply_updates(p, updates))
                p["logit_scale"] = jnp.minimum(p["logit_scale"], tcfg.logit_scale_max)
                return (p, o2)
            p, o = jax.lax.fori_loop(0, n, body, state)
            return p["logit_scale"].astype(jnp.float32)

        sweep = {}
        for Bs in [int(x) for x in args.sweep_batches.split(",")]:
            im_s = jnp.asarray(rng.integers(0, 256, (Bs, 256, 256, 3),
                                            dtype=np.uint8))
            tk_s = jnp.asarray(rng.integers(1, cfg.vocab_size - 2,
                                            (Bs, cfg.context_length),
                                            dtype=np.int32))
            dt_s = _slope(
                lambda n: sweep_chain((params, opt_state), im_s, tk_s,
                                      jnp.int32(n)), 3, 13)
            sweep[str(Bs)] = {"ms": round(dt_s * 1e3, 1),
                              "imgs_per_sec": round(Bs / dt_s, 1)}
            print(f"[sweep] B={Bs}: {dt_s*1e3:.1f} ms", flush=True)
            del im_s, tk_s
        out["batch_sweep"] = sweep
    if args.sweep_only:
        Path(args.out).write_text(json.dumps(out, indent=2))
        print(json.dumps(out.get("batch_sweep", {})))
        return 0

    # ---- full step + optimizer/EMA/loss ablations ------------------------
    t_full = chained_train_time(params, opt_state, opt, tcfg.logit_scale_max,
                                make_lag("info_nce"), (imgs, toks))
    out["full_ms"] = round(t_full * 1e3, 1)
    out["imgs_per_sec"] = round(B / t_full, 1)

    # batches ride as explicit jit arguments in every chain below (a
    # closed-over device batch inlines as an HLO constant; at B=2048 the
    # ~400MB constant blows the remote-compile tunnel's payload cap)
    @jax.jit
    def sgd_chain(p, im, tk, n):
        def body(_, pp):
            _, g = make_lag("info_nce")(pp, im, tk)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b.astype(a.dtype), pp, g)
        p = jax.lax.fori_loop(0, n, body, p)
        return p["logit_scale"].astype(jnp.float32)

    t_sgd = slope_time(lambda n: sgd_chain(params, imgs, toks, jnp.int32(n)), 3, 13)
    out["sgd_apply_ms"] = round(t_sgd * 1e3, 1)
    out["adamw_cost_ms"] = round((t_full - t_sgd) * 1e3, 1)

    # EMA leg: the real step calls update_ema AFTER the param fixups
    # (train_step semantics), so the chain mirrors that explicitly.
    from clip_mixer_tpu.parallel.train_step import update_ema

    tcfg_ema = TrainConfig(ema_decay=0.999)
    opt_ema = make_optimizer(tcfg_ema, total_steps=1000)
    opt_state_ema = jax.jit(opt_ema.init)(params)

    @jax.jit
    def ema_chain(state, im, tk, n):
        def body(_, carry):
            p, o = carry
            _, g = make_lag("info_nce")(p, im, tk)
            updates, o = opt_ema.update(g, o, p)
            p = dict(optax.apply_updates(p, updates))
            p["logit_scale"] = jnp.minimum(p["logit_scale"], tcfg.logit_scale_max)
            o = update_ema(o, p, tcfg_ema.ema_decay)
            return (p, o)
        p, o = jax.lax.fori_loop(0, n, body, state)
        return p["logit_scale"].astype(jnp.float32)

    t_ema = slope_time(
        lambda n: ema_chain((params, opt_state_ema), imgs, toks, jnp.int32(n)), 3, 13)
    out["ema_step_ms"] = round(t_ema * 1e3, 1)
    out["ema_cost_ms"] = round((t_ema - t_full) * 1e3, 1)

    t_cheap = chained_train_time(params, opt_state, opt, tcfg.logit_scale_max,
                                 make_lag("cheap"), (imgs, toks))
    out["cheap_loss_step_ms"] = round(t_cheap * 1e3, 1)
    out["info_nce_cost_ms"] = round((t_full - t_cheap) * 1e3, 1)

    # ---- forward-only legs ----------------------------------------------
    def fwd_chain(kind):
        @jax.jit
        def chained(p, base_im, base_tk, n):
            def body(_, carry):
                im = base_im + carry.astype(jnp.uint8)
                # every tower input must carry the loop perturbation or XLA
                # hoists that tower out of the fori_loop (first run of this
                # script measured fwd_both == fwd_image: the text encode had
                # been hoisted as loop-invariant)
                tt = jnp.clip(base_tk + carry.astype(jnp.int32), 0, cfg.vocab_size - 1)
                if kind == "both":
                    fi, ft, scale = clip_model.forward(p, cfg, pre(im), tt)
                    return info_nce(fi, ft, scale).astype(jnp.float32) * 1e-9
                f = (clip_model.encode_image(p, cfg, pre(im)) if kind == "image"
                     else clip_model.encode_text(p, cfg, tt))
                return f.astype(jnp.float32).mean() * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return slope_time(lambda n: chained(params, imgs, toks, jnp.int32(n)), 3, 13)

    t_fwd = fwd_chain("both")
    out["fwd_only_ms"] = round(t_fwd * 1e3, 1)
    out["bwd_and_update_ms"] = round((t_full - t_fwd) * 1e3, 1)
    out["fwd_image_tower_ms"] = round(fwd_chain("image") * 1e3, 1)
    out["fwd_text_tower_ms"] = round(fwd_chain("text") * 1e3, 1)

    # ---- remat recompute cost (at a batch where no-remat fits) -----------
    Bs = args.remat_pair_batch
    imgs_s = imgs[:Bs]
    toks_s = toks[:Bs]
    pair = {}
    for name, on in (("remat_on", True), ("remat_off", False)):
        cfg_s = cfg.replace(remat=on)
        def lag(p, im, t, _c=cfg_s):
            def loss_fn(pp):
                img, txt, scale = clip_model.forward(pp, _c, pre(im), t)
                return info_nce(img, txt, scale)
            return jax.value_and_grad(loss_fn)(p)
        dt = chained_train_time(params, opt_state, opt, tcfg.logit_scale_max,
                                lag, (imgs_s, toks_s))
        pair[name] = round(dt * 1e3, 1)
    pair["recompute_cost_ms"] = round(pair["remat_on"] - pair["remat_off"], 1)
    pair["batch"] = Bs
    pair["note"] = ("no-remat at B=1024 needs ~86GB of saved activations "
                    "and OOMs a 16GB v5e — measured at the largest batch "
                    "where both legs fit")
    out["remat_pair"] = pair

    # ---- FLOPs + MFU -----------------------------------------------------
    # XLA's .compile().cost_analysis() is NOT used: on this remote backend it
    # reported 1.3 TFLOP for a graph whose matmuls alone are 11 TFLOP (the
    # DCE'd-grads lowering) — the analytic matmul count is the trustworthy
    # denominator here, cross-checked against the measured per-tower times.
    fwd_flops = analytic_fwd_flops(cfg, B)
    out["analytic_fwd_matmul_tflops_per_batch"] = round(fwd_flops / 1e12, 3)

    # train matmul FLOPs: fwd + ~2x fwd backward + 1x fwd remat recompute
    train_flops = 4.0 * fwd_flops
    out["train_tflops_per_step_model"] = round(train_flops / 1e12, 3)
    out["achieved_tflops"] = round(train_flops / t_full / 1e12, 1)
    out["mfu_pct_vs_v5e_bf16_peak"] = round(
        100 * train_flops / t_full / V5E_BF16_PEAK, 1)
    out["device"] = str(jax.devices()[0])

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
