"""Minimal end-to-end training run: synthetic data, tiny model, CPU-OK.

The same Trainer/step/checkpoint stack the production CLI uses — this is
`train.py --preset mixer-debug --synthetic` expressed as a library call,
for users embedding training in their own programs. Completion writes
`<run>/export`, loadable by the inference API (see zero_shot.py).

    python examples/train_tiny.py
"""

# Allow running straight from a repo checkout without pip install.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import tempfile

import clip_mixer_tpu as cm
from clip_mixer_tpu.config import PRESETS, TrainConfig
from clip_mixer_tpu.data.pipeline import SyntheticSource
from clip_mixer_tpu.train.trainer import Trainer

cfg = PRESETS["mixer-debug"]
tcfg = TrainConfig(
    epochs=1,
    steps_per_epoch=4,
    global_batch_size=8,
    checkpoint_every_steps=2,
)

run_dir = tempfile.mkdtemp(prefix="clip_mixer_tiny_")
data = SyntheticSource(
    batch_size=tcfg.global_batch_size,
    image_size=cfg.image_resolution,
    n_batches=tcfg.steps_per_epoch,
    context_length=cfg.context_length,
)
trainer = Trainer(cfg, tcfg, data, run_dir)
trainer.train()

params, loaded_cfg, preprocess = cm.load(f"{run_dir}/export")
print(f"trained + exported to {run_dir}/export; "
      f"embed_dim={loaded_cfg.embed_dim}, params load OK")
