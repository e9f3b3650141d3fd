"""Standalone evaluation CLI — the reference's validateModel.py equivalent:
load a checkpoint (native dir, torch .pt, or preset) and run validators.

Examples:
  python eval.py --model outputs/run1/export --validators sts imagenet
  python eval.py --model ViT-B/32 --validators imagenet   # downloads OpenAI ckpt
"""

import argparse

from clip_mixer_tpu.api import load
from clip_mixer_tpu.evals.validators import (
    CosineSimValidator,
    ImageNetValidator,
    MNISTValidator,
    SST2Validator,
)
from clip_mixer_tpu.train.metrics import MetricsWriter

VALIDATORS = {
    "imagenet": ImageNetValidator,
    "sts": CosineSimValidator,
    "sst2": SST2Validator,
    "mnist": MNISTValidator,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="checkpoint dir / .pt / registry or preset name")
    p.add_argument("--validators", nargs="+", default=["sts"], choices=sorted(VALIDATORS.keys()))
    p.add_argument("--compute-dtype", default=None)
    p.add_argument("--log-dir", default=None)
    args = p.parse_args()

    params, cfg, _ = load(args.model, compute_dtype=args.compute_dtype)
    writer = MetricsWriter(log_dir=args.log_dir)
    for name in args.validators:
        v = VALIDATORS[name](params, cfg, writer=writer)
        result = v.validate(step=0, verbose=True)
        print(f"[{name}] {result}")
    # tensorboardX buffers on a background thread; flush before exit or a
    # short run loses its events (the Trainer flushes the same way).
    writer.flush()


if __name__ == "__main__":
    main()
