"""End-to-end training demo on real TPU: full Mixer-B/32, synthetic data.

Trains the flagship model (111M params, remat, the real sharded train step)
on the SyntheticSource's class-colored images for a few hundred steps, then
zero-shot-classifies held-out samples of the 16 synthetic classes with their
caption prompts. A converging CLIP drives the InfoNCE loss from ln(B) toward
0 and the zero-shot accuracy from chance (6.25%) toward 100% — evidence that
the full Trainer/step/metrics stack optimizes on hardware, beyond the CPU
overfit unit tests.

Writes one JSON line with the loss trajectory and final accuracy; the result
from this machine's v5e is committed in TRAIN_DEMO.json.

Usage: python scripts/train_synthetic_demo.py [--steps 150] [--batch 512]
"""

import argparse
import json
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--loss", default="info_nce", choices=["info_nce", "siglip"])
    args = p.parse_args()

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.evals.zeroshot import make_image_classifier
    from clip_mixer_tpu.evals.quant_gate import build_float_classifier
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.train.trainer import Trainer

    from clip_mixer_tpu.config import SIGLIP_LOGIT_SCALE_MAX

    cfg = PRESETS["mixer-b32"].replace(remat=True)
    if args.loss == "siglip":
        cfg = cfg.for_siglip()
    tcfg = TrainConfig(
        global_batch_size=args.batch,
        epochs=1,
        steps_per_epoch=args.steps,
        learning_rate=5e-4,
        warmup_steps=2,
        checkpoint_every_steps=args.steps,  # one final checkpoint
        loss=args.loss,
        logit_scale_max=SIGLIP_LOGIT_SCALE_MAX if args.loss == "siglip" else TrainConfig.logit_scale_max,
    )
    data = SyntheticSource(
        batch_size=args.batch,
        image_size=cfg.image_resolution,
        n_batches=args.steps,
        context_length=cfg.context_length,
    )
    run_dir = tempfile.mkdtemp(prefix="train_demo_")
    # One jitted init (eager init is ~100 dispatches through the tunnel).
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(tcfg.seed))
    tr = Trainer(cfg, tcfg, data, run_dir, params=params, resume=False)
    tr.train()

    losses = [v for _, v in tr.writer.history["Loss"]]

    # Zero-shot eval on HELD-OUT synthetic samples (epoch 999 -> unseen noise
    # draws of the same classes) with the training captions as prompts.
    final = jax.device_get(tr.state.params)
    w = build_float_classifier(final, cfg, data.captions, ["{}"], batch_size=32)
    classify = make_image_classifier(final, cfg, w)
    eval_data = SyntheticSource(
        batch_size=256, image_size=cfg.image_resolution, n_batches=2,
        context_length=cfg.context_length,
    )
    correct = total = 0
    for batch in eval_data.iter_batches(epoch=999):
        # ground truth from PUBLIC data: each sample's caption tokens match
        # exactly one class caption (re-deriving the source's private RNG
        # draws would silently break if its protocol ever changed)
        labels = (batch["texts"][:, None] == eval_data.tokens[None]).all(-1).argmax(-1)
        logits = np.asarray(classify(batch["images"]))
        correct += int((logits.argmax(-1) == labels).sum())
        total += labels.shape[0]
    acc = correct / total

    print(
        json.dumps(
            {
                "model": "mixer-b32 (111M, remat)",
                "loss_kind": args.loss,
                "steps": len(losses),  # actual (a preemption may stop early)
                "global_batch": args.batch,
                "loss_first": round(losses[0], 4),
                "loss_min": round(min(losses), 4),
                "loss_last": round(losses[-1], 4),
                "loss_curve_every10": [round(l, 3) for l in losses[::10]],
                "zero_shot_acc_16class_heldout": round(acc, 4),
                "chance": round(1 / eval_data.n_classes, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
