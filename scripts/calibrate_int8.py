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


def run(params, cfg, out, data=None, texts=None, n=512, no_text=False):
    """Calibrate both towers on sample data and write the artifact to
    ``out``. Library entry point — reused by scripts/release.py with
    already-loaded params so large checkpoints aren't restored twice."""
    import jax
    import jax.numpy as jnp

    from clip_mixer_tpu.data.pipeline import SyntheticSource, TarShardSource
    from clip_mixer_tpu.ops import quant_io
    from clip_mixer_tpu.ops.preprocess import normalize_images
    from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns
    from clip_mixer_tpu.text import tokenize

    batch = min(n, 256)
    if data:
        shards = sorted(glob.glob(data))
        if not shards:
            raise SystemExit(f"--data matched no shards: {data}")
        source = TarShardSource(
            shards, batch_size=batch, image_size=cfg.image_resolution,
            context_length=cfg.context_length, drop_last=False,
        )
    else:
        print("note: no --data given; calibrating on synthetic samples "
              "(real data gives more representative activation scales)")
        source = SyntheticSource(
            batch, image_size=cfg.image_resolution,
            n_batches=-(-n // batch), context_length=cfg.context_length,
        )

    images, token_batches = [], []
    got = 0
    for b in source.iter_batches(epoch=0):
        images.append(b["images"])
        token_batches.append(b["texts"])
        got += len(b["images"])
        if got >= n:
            break
    if got == 0:
        raise SystemExit("calibration source yielded zero samples (empty/undecodable shards?)")
    images_u8 = np.concatenate(images)[:n]
    sample = normalize_images(jnp.asarray(images_u8), dtype=jnp.dtype(cfg.compute_dtype))

    calibrate, _, _ = image_quant_fns(cfg)
    image_scales = jax.device_get(calibrate(params, cfg, sample))
    print(f"image tower: calibrated on {len(images_u8)} samples")

    text_scales = None
    if not no_text:
        if texts:
            lines = [l.strip() for l in open(texts) if l.strip()][:n]
            if not lines:
                raise SystemExit(f"--texts {texts} contains no captions")
            tokens = np.asarray(tokenize(lines, cfg.context_length, truncate=True))
        else:
            tokens = np.concatenate(token_batches)[:n]
        t_calibrate, _, _ = text_quant_fns(cfg)
        text_scales = jax.device_get(t_calibrate(params, cfg, jnp.asarray(tokens)))
        print(f"text tower: calibrated on {len(tokens)} samples")

    quant_io.save_calibration(out, cfg, image_scales=image_scales, text_scales=text_scales)
    print(f"wrote {out}")


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

    import clip_mixer_tpu as clip

    params, cfg, _ = clip.load(args.model)
    run(params, cfg, args.out, data=args.data, texts=args.texts, n=args.n, no_text=args.no_text)


if __name__ == "__main__":
    main()
