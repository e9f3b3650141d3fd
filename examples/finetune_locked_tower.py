"""LiT-style fine-tuning as a library call: lock one tower, train the other.

Two stages on the tiny CPU-OK model:

1. pretrain a few steps and export (stand-in for any checkpoint you already
   have — a native export dir, a torch ``.pt``, or a registry name all load
   through ``cm.load``);
2. fine-tune from it with the VISUAL tower frozen
   (``TrainConfig(freeze="visual")``): the frozen tower runs under
   stop_gradient (no backward compute) and is masked out of AdamW (no
   moments allocated), exactly the CLI's
   ``train.py --init-from <ckpt> --freeze-tower visual``.

The final export's visual tower is bitwise the pretrained one; the text
tower moved.

    python examples/finetune_locked_tower.py
"""

# Allow running straight from a repo checkout without pip install.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import tempfile

import numpy as np

import jax

import clip_mixer_tpu as cm
from clip_mixer_tpu.config import PRESETS, TrainConfig
from clip_mixer_tpu.data.pipeline import SyntheticSource
from clip_mixer_tpu.train.trainer import Trainer

cfg = PRESETS["mixer-debug"]


def make_data(tcfg):
    return SyntheticSource(
        batch_size=tcfg.global_batch_size,
        image_size=cfg.image_resolution,
        n_batches=tcfg.steps_per_epoch,
        context_length=cfg.context_length,
    )


# --- stage 1: "pretrain" (any cm.load-able checkpoint works here) ---------
tcfg = TrainConfig(epochs=1, steps_per_epoch=4, global_batch_size=8,
                   checkpoint_every_steps=4)
pre_dir = tempfile.mkdtemp(prefix="lit_pretrain_")
Trainer(cfg, tcfg, make_data(tcfg), pre_dir).train()
pretrained, _, _ = cm.load(f"{pre_dir}/export")

# Host-side snapshot for the comparison below: the jitted train step
# DONATES its input buffers, so the live `pretrained` arrays are consumed
# once training starts.
pre_snapshot = jax.tree.map(np.asarray, pretrained)

# --- stage 2: locked-image fine-tune --------------------------------------
ft_tcfg = TrainConfig(epochs=1, steps_per_epoch=4, global_batch_size=8,
                      checkpoint_every_steps=4, freeze="visual")
ft_dir = tempfile.mkdtemp(prefix="lit_finetune_")
Trainer(cfg, ft_tcfg, make_data(ft_tcfg), ft_dir, params=pretrained).train()

final, _, _ = cm.load(f"{ft_dir}/export")
v_locked = all(
    np.array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(pre_snapshot["visual"]), jax.tree.leaves(final["visual"]))
)
t_moved = any(
    not np.allclose(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(pre_snapshot["text"]), jax.tree.leaves(final["text"]))
)
print(f"visual tower locked bitwise: {v_locked}; text tower fine-tuned: {t_moved}")
assert v_locked and t_moved
