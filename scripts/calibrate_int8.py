"""Produce a persistent int8 calibration artifact for a model.

Measures per-site activation scales (ops/quant.py calibrate_* fns) on sample
data and writes the ``.npz`` artifact (ops/quant_io.py) that serving loads
with ``enable_int8(calibration=...)`` / ``python -m clip_mixer_tpu.serving
--int8 scales.npz`` — so production serving needs no calibration data or
warm-up pass.

Usage:
    # calibrate on real shards (preferred) for both towers
    python scripts/calibrate_int8.py --model outputs/run/export \\
        --data '/data/shards/*.tar' --out scales.npz

    # no data on hand: synthetic images + captions (smoke / CI)
    python scripts/calibrate_int8.py --model mixer-b32 --out scales.npz

The reference has no quantized path (it serves fp16 — training/clip/
model.py:445-466); this tool exists for the int8 serving addition.
"""

import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="preset, OpenAI name, .pt, or checkpoint dir")
    p.add_argument("--out", required=True, help="output .npz artifact path")
    p.add_argument("--data", default=None, help="tar-shard glob of calibration images/captions")
    p.add_argument("--texts", default=None, help="file of caption strings (one per line)")
    p.add_argument("--n", type=int, default=512, help="calibration sample count per tower")
    p.add_argument("--no-text", action="store_true", help="skip the text tower")
    p.add_argument("--platform", default=None,
                   help="force the JAX backend (e.g. cpu; the JAX_PLATFORMS env var is "
                        "inert once sitecustomize has imported jax — this goes through "
                        "jax.config)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.data.pipeline import SyntheticSource, TarShardSource
    from clip_mixer_tpu.ops import quant_io
    from clip_mixer_tpu.ops.preprocess import normalize_images
    from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns
    from clip_mixer_tpu.text import tokenize

    params, cfg, _ = clip.load(args.model)

    batch = min(args.n, 256)
    if args.data:
        shards = sorted(glob.glob(args.data))
        if not shards:
            p.error(f"--data matched no shards: {args.data}")
        source = TarShardSource(
            shards, batch_size=batch, image_size=cfg.image_resolution,
            context_length=cfg.context_length, drop_last=False,
        )
    else:
        print("note: no --data given; calibrating on synthetic samples "
              "(real data gives more representative activation scales)")
        source = SyntheticSource(
            batch, image_size=cfg.image_resolution,
            n_batches=-(-args.n // batch), context_length=cfg.context_length,
        )

    images, token_batches = [], []
    n = 0
    for b in source.iter_batches(epoch=0):
        images.append(b["images"])
        token_batches.append(b["texts"])
        n += len(b["images"])
        if n >= args.n:
            break
    if n == 0:
        p.error("calibration source yielded zero samples (empty/undecodable shards?)")
    images_u8 = np.concatenate(images)[: args.n]
    sample = normalize_images(jnp.asarray(images_u8), dtype=jnp.dtype(cfg.compute_dtype))

    calibrate, _, _ = image_quant_fns(cfg)
    image_scales = jax.device_get(calibrate(params, cfg, sample))
    print(f"image tower: calibrated on {len(images_u8)} samples")

    text_scales = None
    if not args.no_text:
        if args.texts:
            lines = [l.strip() for l in open(args.texts) if l.strip()][: args.n]
            if not lines:
                p.error(f"--texts {args.texts} contains no captions")
            tokens = np.asarray(tokenize(lines, cfg.context_length, truncate=True))
        else:
            tokens = np.concatenate(token_batches)[: args.n]
        t_calibrate, _, _ = text_quant_fns(cfg)
        text_scales = jax.device_get(t_calibrate(params, cfg, jnp.asarray(tokens)))
        print(f"text tower: calibrated on {len(tokens)} samples")

    quant_io.save_calibration(args.out, cfg, image_scales=image_scales, text_scales=text_scales)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
