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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    from clip_mixer_tpu.config import PRESETS as _P

    p.add_argument("--preset", default="mixer-b32", choices=sorted(_P))
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch", type=int, default=1024, help="per-chip batch")
    p.add_argument("--accum", type=int, default=1)
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.utils.memory import plan

    cfg = PRESETS[args.preset]
    print(f"{args.preset} @ {args.devices} devices, {args.batch}/chip, accum {args.accum}")
    for mode in ("dp", "fsdp", "tp", "pp"):
        try:
            print(plan(cfg, mode, args.devices, args.batch, accum_steps=args.accum).row())
        except ValueError as e:  # pp divisibility / resnet
            print(f"{mode}: n/a ({e})")


if __name__ == "__main__":
    main()
