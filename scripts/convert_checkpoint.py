"""Checkpoint converter CLI: torch <-> native, any accepted source.

Usage:
    # torch (.pt state_dict / JIT archive / Accelerate dir / OpenAI name)
    #   -> native orbax dir (params + config.json)
    python scripts/convert_checkpoint.py ViT-B-32.pt out/vit_b32

    # native dir -> torch state_dict the REFERENCE can load via
    # build_model(state_dict) (training/clip/model.py:469-513)
    python scripts/convert_checkpoint.py out/vit_b32 vit_b32_roundtrip.pt --to torch

The library surface behind this is clip_mixer_tpu.load (accepts every source
kind, shape-sniffing the architecture — models/convert.py) and
save_pretrained / models.convert.params_to_state_dict (the inverse export,
round-trip tested in tests/test_export.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="OpenAI model name, .pt file, Accelerate dir, or native dir")
    p.add_argument("dst", help="output: native dir (default) or .pt path with --to torch")
    p.add_argument("--to", default="native", choices=["native", "torch"])
    p.add_argument("--compute-dtype", default=None,
                   help="override the saved config's activation dtype (e.g. float32)")
    args = p.parse_args(argv)

    import clip_mixer_tpu as clip

    params, cfg, _ = clip.load(args.src, compute_dtype=args.compute_dtype)
    if args.to == "native":
        clip.save_pretrained(params, cfg, args.dst)
        print(f"wrote native checkpoint (params + config.json) to {args.dst}")
    else:
        import torch

        from clip_mixer_tpu.models.convert import params_to_state_dict

        sd = {k: torch.as_tensor(v.copy()) for k, v in params_to_state_dict(params, cfg).items()}
        torch.save(sd, args.dst)
        print(f"wrote torch state_dict ({len(sd)} tensors) to {args.dst}")


if __name__ == "__main__":
    main()
