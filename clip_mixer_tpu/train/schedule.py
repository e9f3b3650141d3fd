"""LR schedule: warmup -> single cosine cycle.

Reproduces the reference's CosineAnnealingWarmupRestarts configuration
(training.py:83-89): one cycle spanning the whole run, max_lr -> min_lr =
max_lr/100, linear warmup over ``warmup_steps`` (=2) starting at min_lr.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(max_lr: float, min_lr: float, warmup_steps: int, total_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (max_lr - min_lr) * step / max(warmup_steps, 1)
        prog = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (max_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
