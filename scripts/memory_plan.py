"""Capacity planner: per-chip HBM for each preset x parallelism mode.

Usage:
    python scripts/memory_plan.py [--preset vit-l14] [--devices 8]
                                  [--batch 1024] [--accum 1]

Prints per-chip params / Adam / grads / activations bytes for DP, FSDP, TP
and PP at the given device count, from the real sharding rules
(clip_mixer_tpu/utils/memory.py). Pure shape math — runs anywhere, no
devices needed.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Pure shape math (jax.eval_shape only) — never wait on an accelerator
# backend; keeps the planner usable when the TPU tunnel is down.
jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from clip_mixer_tpu.config import PRESETS as _P

    p.add_argument("--preset", default="mixer-b32", choices=sorted(_P))
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch", type=int, default=1024, help="per-chip batch")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--remat-policy", default="none", choices=["none", "mlp_hidden", "all_hidden"],
                   help="include the saved hidden pre-activations in the working set")
    p.add_argument("--no-remat", action="store_true",
                   help="price the tower WITHOUT rematerialisation (train.py "
                        "defaults remat ON for every tower, incl. the "
                        "per-bottleneck ResNet remat — this prices --no-remat runs)")
    p.add_argument("--ema", action="store_true",
                   help="price a param-EMA copy (TrainConfig.ema_decay): one extra "
                        "params-size in opt_state, sharded like the params")
    p.add_argument("--suggest", action="store_true",
                   help="pick the cheapest parallelism plan that fits --hbm-gib "
                        "(preference order: dp, fsdp, fsdp+accum, fsdp x tp2, pp2)")
    p.add_argument("--global-batch", type=int, default=None,
                   help="global batch for --suggest (default: --batch x --devices)")
    p.add_argument("--hbm-gib", type=float, default=16.0,
                   help="per-chip HBM for --suggest (v5e: 16)")
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.utils.memory import plan, suggest

    cfg = PRESETS[args.preset].replace(remat_policy=args.remat_policy,
                                       remat=not args.no_remat)

    if args.suggest:
        global_batch = args.global_batch or args.batch * args.devices
        best, tried = suggest(
            cfg, args.devices, global_batch, hbm_bytes=int(args.hbm_gib * (1 << 30)),
            ema=args.ema,
        )
        print(f"{args.preset} @ {args.devices} devices, global batch {global_batch}, "
              f"{args.hbm_gib:g} GiB/chip (10% headroom), remat_policy {args.remat_policy}")
        for label, pl, fits in tried:
            if pl is None:
                print(f"  {label:<22} n/a ({fits})")
            else:
                mark = "FITS" if fits else "over"
                star = "  <-- suggested" if best is pl else ""
                print(f"  {pl.row()}  [{mark}]{star}")
        if best is None:
            print("no candidate fits; raise --hbm-gib, devices, or accum range")
            raise SystemExit(1)
        return

    print(f"{args.preset} @ {args.devices} devices, {args.batch}/chip, accum {args.accum}, "
          f"remat_policy {args.remat_policy}")
    for mode, kw in (("dp", {}), ("fsdp", {}), ("fsdp", {"n_model": 2}), ("tp", {}), ("pp", {})):
        try:
            print(plan(cfg, mode, args.devices, args.batch, accum_steps=args.accum, ema=args.ema, **kw).row())
        except ValueError as e:  # pp/tp divisibility / resnet
            label = mode if not kw else f"{mode} x tp{kw['n_model']}"
            print(f"{label}: n/a ({e})")


if __name__ == "__main__":
    main()
