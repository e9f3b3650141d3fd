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
    RetrievalValidator,
    SST2Validator,
)
from clip_mixer_tpu.train.metrics import MetricsWriter

VALIDATORS = {
    "imagenet": ImageNetValidator,
    "sts": CosineSimValidator,
    "sst2": SST2Validator,
    "mnist": MNISTValidator,
    "retrieval": RetrievalValidator,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="checkpoint dir / .pt / registry or preset name")
    p.add_argument("--validators", nargs="+", default=["sts"], choices=sorted(VALIDATORS.keys()))
    p.add_argument("--val-data", default=None,
                   help="held-out split for the 'retrieval' validator: tar "
                        "glob, .csv/.tsv manifest, or image directory (fully "
                        "offline, unlike the remote-dataset validators)")
    p.add_argument("--val-samples", type=int, default=2048,
                   help="retrieval gallery size drawn from --val-data")
    p.add_argument("--caption-from", default="txt", choices=("txt", "dirname", "stem"),
                   help="caption source when --val-data is an image directory")
    p.add_argument("--compute-dtype", default=None)
    p.add_argument("--log-dir", default=None)
    args = p.parse_args()

    params, cfg, _ = load(args.model, compute_dtype=args.compute_dtype)
    writer = MetricsWriter(log_dir=args.log_dir)
    for name in args.validators:
        if name == "retrieval":
            if not args.val_data:
                raise SystemExit("the 'retrieval' validator needs --val-data")
            from train import build_single_source

            source = build_single_source(
                args.val_data,
                args.caption_from,
                batch_size=min(256, args.val_samples),
                image_size=cfg.image_resolution,
                context_length=cfg.context_length,
                drop_last=False,
            )
            v = RetrievalValidator(params, cfg, data_source=source, writer=writer,
                                   max_samples=args.val_samples)
        else:
            v = VALIDATORS[name](params, cfg, writer=writer)
        result = v.validate(step=0, verbose=True)
        print(f"[{name}] {result}")
    # tensorboardX buffers on a background thread; flush before exit or a
    # short run loses its events (the Trainer flushes the same way).
    writer.flush()


if __name__ == "__main__":
    main()
