"""Mixer-vs-Transformer twin comparison on real TPU — the reference's core claim.

The reference's headline architectural claim is the twin comparison
(/root/reference/README.md:19: "the Mixer variant trains ~25% faster than the
Transformer twin"; /root/reference/tests/clipFigures.py:40-43: zero-shot /
STS figures for both towers at equal step budgets). The real-data curve
reproduction is egress-blocked (BASELINE.md), so this script produces the
honest stand-in, measured end-to-end on hardware:

  1. **Train-step speed** — `chained_train_time` (the bench methodology) on
     both presets at identical batch/remat: a pure device-bound measurement
     of the "~25% faster to train" row. The presets differ ONLY in `tower`
     (mixer token-mix MLP vs multi-head attention); params 111M vs 151M.
  2. **Equal-budget learning curves** — both twins through the real
     `train.py` CLI on the same locally generated natural-ish shard set
     (scripts/make_dress_dataset.py), same seed/batch/steps/LR, with the
     RetrievalValidator on a held-out shard: loss + I->T/T->I R@1 at equal
     steps, the clipFigures.py analogue with retrieval standing in for the
     unfetchable ImageNetV2/STS.

Each training leg runs in its own child process (fresh compile cache hit,
and the axon tunnel's per-transfer host-RSS leak dies with the child).

Writes COMPARE_TOWERS.json. Usage:
  python scripts/compare_towers.py --steps 400 --batch 512
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

PRESET_TWINS = ("mixer-b32", "transformer-b32")


def measure_step_times(batch: int):
    """Device-bound full-train-step seconds for both twins (bench methodology)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.losses import info_nce
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.train.optimizer import make_optimizer
    from clip_mixer_tpu.utils.profiling import chained_train_time

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    toks = jnp.asarray(rng.integers(1, 49000, (batch, 77), dtype=np.int32))

    out = {}
    for preset in PRESET_TWINS:
        cfg = PRESETS[preset].replace(remat=True)
        pre = make_batch_preprocess(
            (256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16
        )
        params = jax.jit(lambda: clip_model.init(jax.random.key(0), cfg))()
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
        tcfg = TrainConfig()
        opt = make_optimizer(tcfg, total_steps=1000)
        opt_state = jax.jit(opt.init)(params)

        def loss_and_grads(p, imgs_u8, t, cfg=cfg, pre=pre):
            def loss_fn(pp):
                img, txt, scale = clip_model.forward(pp, cfg, pre(imgs_u8), t)
                return info_nce(img, txt, scale)

            return jax.value_and_grad(loss_fn)(p)

        dt = chained_train_time(
            params, opt_state, opt, tcfg.logit_scale_max, loss_and_grads, (imgs, toks)
        )
        out[preset] = {
            "params": n_params,
            "sec_per_step": round(dt, 4),
            "imgs_per_sec": round(batch / dt, 1),
        }
        print(f"[compare] {preset}: {n_params/1e6:.1f}M params, "
              f"{dt*1e3:.1f} ms/step, {batch/dt:.0f} imgs/s", flush=True)
        del params, opt_state
    m, t = out["mixer-b32"], out["transformer-b32"]
    out["mixer_speedup"] = round(t["sec_per_step"] / m["sec_per_step"] - 1.0, 4)
    return out


def check_fresh_run_dir(preset: str, steps: int) -> str:
    """A distinct run dir per (preset, steps): an existing checkpoint dir
    would silently RESUME instead of training the leg from scratch. Called
    as a PREFLIGHT on every leg before any measurement or training — a
    stale second-leg dir must not surface hours into the run."""
    run_name = f"compare_{preset}_{steps}"
    if (REPO / "outputs" / run_name / "checkpoints").exists():
        raise SystemExit(
            f"outputs/{run_name} already has checkpoints — the leg would "
            "resume mid-run instead of training from scratch; remove the "
            "directory (or pick different --steps) and re-run"
        )
    return run_name


def train_leg(preset: str, args, run_name: str = None) -> dict:
    from dress_rehearsal import read_metrics, thin  # same distillation

    run_name = run_name or check_fresh_run_dir(preset, args.steps)
    cmd = [
        sys.executable, str(REPO / "train.py"),
        "--preset", preset,
        "--data", args.data,
        "--cache-data", args.cache_dir,
        "--global-batch-size", str(args.batch),
        "--epochs", str(-(-args.steps // args.steps_per_epoch)),
        "--steps-per-epoch", str(args.steps_per_epoch),
        "--checkpoint-every", str(args.steps),
        "--validate-every", str(args.validate_every),
        "--no-validators",
        "--val-data", args.val_data,
        "--val-samples", "2048",
        "--run-name", run_name,
        "--seed", str(args.seed),
        "--verbose",
    ]
    print("[compare] launching:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    wall = time.time() - t0
    series = read_metrics(REPO / "outputs" / run_name)
    losses = series.get("Loss", [])
    return {
        "exit": proc.returncode,
        "wall_seconds": round(wall, 1),
        "steps_completed": losses[-1][0] if losses else 0,
        "loss_first": losses[0][1] if losses else None,
        "loss_last": losses[-1][1] if losses else None,
        "loss_curve": thin(losses, 60),
        "retrieval": {k: thin(v, 30) for k, v in series.items()
                      if k.lower().startswith("retrieval")},
    }


def _maybe_equal_device_time(doc: dict) -> None:
    """When the artifact holds a transformer leg and a LONGER mixer leg,
    record the equal-device-time comparison (the honest restatement of the
    reference's "~25% faster to train": at matched device seconds the mixer
    has run ~1.81x the steps — what does that buy in loss/retrieval?)."""
    st = doc.get("step_time_at_curve_batch", doc.get("step_time", {}))
    curves = doc.get("curves", {})
    if not ("mixer-b32" in st and "transformer-b32" in st):
        return
    legs = {}
    for key, leg in curves.items():
        preset = key.split("@")[0]
        steps = leg.get("steps_completed") or 0
        if preset in st and steps:
            legs.setdefault(preset, []).append((steps, leg))
    if not ("mixer-b32" in legs and "transformer-b32" in legs):
        return
    t_steps, t_leg = max(legs["transformer-b32"], key=lambda sl: sl[0])
    t_dev = t_steps * st["transformer-b32"]["sec_per_step"]
    # mixer leg whose device time lands closest to the transformer's
    m_steps, m_leg = min(
        legs["mixer-b32"],
        key=lambda sl: abs(sl[0] * st["mixer-b32"]["sec_per_step"] - t_dev),
    )
    m_dev = m_steps * st["mixer-b32"]["sec_per_step"]

    def final_retrieval(leg):
        return {name: series[-1] for name, series in leg.get("retrieval", {}).items()
                if series}

    doc["equal_device_time"] = {
        "transformer": {"steps": t_steps, "device_seconds": round(t_dev, 1),
                        "loss": leg_loss(t_leg), "retrieval_final": final_retrieval(t_leg)},
        "mixer": {"steps": m_steps, "device_seconds": round(m_dev, 1),
                  "loss": leg_loss(m_leg), "retrieval_final": final_retrieval(m_leg)},
        "device_time_mismatch_pct": round(100 * abs(m_dev - t_dev) / t_dev, 2),
        "note": ("equal DEVICE time (end-to-end wall clock on this host is "
                 "tunnel-transfer-bound and equal-per-step for both towers); "
                 "retrieval_final = [step, value] of each leg's last "
                 "validation pass"),
    }


def leg_loss(leg: dict):
    return leg.get("loss_last")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--step-time-batch", type=int, default=1024)
    p.add_argument("--validate-every", type=int, default=100)
    p.add_argument("--data", default="/root/data/dress/0000[0-8].tar")
    p.add_argument("--val-data", default="/root/data/dress_val/00000.tar")
    p.add_argument("--cache-dir", default="/root/data/cache")
    p.add_argument("--seed", type=int, default=0,
                   help="passed to both train.py legs (identical twins)")
    p.add_argument("--out", default="COMPARE_TOWERS.json")
    p.add_argument("--skip-curves", action="store_true",
                   help="only the step-time measurement (no training legs)")
    p.add_argument("--match-steps-auto", action="store_true",
                   help="with --single-leg: set --steps to match the "
                        "existing transformer leg's device time at the "
                        "curve batch's measured sec/step")
    p.add_argument("--single-leg", default=None, choices=PRESET_TWINS,
                   help="run ONE extra training leg (e.g. the mixer at "
                        "1.81x the transformer's steps for the equal-"
                        "device-time comparison) and MERGE it into an "
                        "existing --out under curves['<preset>@<steps>'], "
                        "keeping the prior step_time/curves blocks")
    args = p.parse_args()

    if args.single_leg:
        out_path = REPO / args.out
        doc = json.loads(out_path.read_text()) if out_path.exists() else {}
        prior_batch = (doc.get("config", {}).get("batch_curves")
                       or doc.get("step_time_at_curve_batch", {}).get("batch"))
        if prior_batch is not None and prior_batch != args.batch:
            # sec/step measured at a different batch than the existing
            # curves trained at would silently poison equal_device_time
            print(f"[compare] --batch {args.batch} != the artifact's curve "
                  f"batch {prior_batch}; pass --batch {prior_batch}",
                  file=sys.stderr)
            return 1
        if args.match_steps_auto:
            t_steps = max(
                ((l.get("steps_completed") or 0)
                 for k, l in doc.get("curves", {}).items()
                 if k.split("@")[0] == "transformer-b32"),
                default=0)
            if not t_steps:
                # fail BEFORE the expensive TPU step-time measurement
                print("[compare] --match-steps-auto needs an existing "
                      "transformer-b32 curve leg in --out (run the main "
                      "comparison or --single-leg transformer-b32 first)",
                      file=sys.stderr)
                return 1
        if not args.match_steps_auto:
            check_fresh_run_dir(args.single_leg, args.steps)
        # device step time AT THE CURVE BATCH (the main block measures at
        # --step-time-batch 1024; the curves train at --batch 512 — the
        # equal-device-time seconds must use the 512 numbers)
        doc["step_time_at_curve_batch"] = measure_step_times(args.batch)
        doc["step_time_at_curve_batch"]["batch"] = args.batch
        if args.match_steps_auto:
            # steps for this leg = the transformer leg's device seconds
            # divided by the mixer's measured sec/step AT THE CURVE BATCH,
            # rounded to whole epochs so train.py runs exactly that many
            st = doc["step_time_at_curve_batch"]
            target = t_steps * (st["transformer-b32"]["sec_per_step"]
                                / st[args.single_leg]["sec_per_step"])
            args.steps = max(args.steps_per_epoch,
                             round(target / args.steps_per_epoch)
                             * args.steps_per_epoch)
            print(f"[compare] matched steps: {t_steps} transformer steps "
                  f"-> {args.steps} {args.single_leg} steps", flush=True)
        leg = train_leg(args.single_leg, args)
        # record the curve batch so later single-leg runs hit the guard
        # even when the artifact was never written by the two-leg path
        doc.setdefault("config", {}).setdefault("batch_curves", args.batch)
        key = f"{args.single_leg}@{args.steps}"
        doc.setdefault("curves", {})[key] = leg
        doc["curves"][key]["seed"] = args.seed
        _maybe_equal_device_time(doc)
        out_path.write_text(json.dumps(doc, indent=2))
        print(json.dumps({"leg": key, "exit": leg["exit"],
                          "steps_completed": leg["steps_completed"]}))
        return 0 if leg["exit"] == 0 and leg["steps_completed"] >= args.steps else 1

    doc = {"config": {
        "batch_curves": args.batch, "batch_step_time": args.step_time_batch,
        "steps": args.steps, "seed": args.seed,
        "data": args.data, "val_data": args.val_data,
        "reference_claim": "Mixer ~25% faster to train than the Transformer "
                           "twin (reference README.md:19); curves: "
                           "tests/clipFigures.py:40-43 stand-in on local "
                           "natural-ish shards (zero egress)",
    }}
    if not args.skip_curves:
        for p_ in PRESET_TWINS:
            check_fresh_run_dir(p_, args.steps)
    doc["step_time"] = measure_step_times(args.step_time_batch)
    if not args.skip_curves:
        doc["curves"] = {p_: train_leg(p_, args) for p_ in PRESET_TWINS}
        _maybe_equal_device_time(doc)
    (REPO / args.out).write_text(json.dumps(doc, indent=2))
    print(json.dumps({"mixer_speedup": doc["step_time"]["mixer_speedup"]}))
    # The artifact is written above either way (partial evidence is still
    # evidence), but a broken leg must not exit 0 — CI/driver runs would
    # silently record a crashed or truncated comparison as a pass.
    bad = [name for name, leg in doc.get("curves", {}).items()
           if leg["exit"] != 0 or leg["steps_completed"] < args.steps]
    if bad:
        print(f"[compare] FAILED legs: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
