"""Optimizer: AdamW with masked weight decay + global-norm clipping.

Reference (training.py:66-89): two AdamW param groups — weight decay 0.2 only
for params with ndim >= 2 (biases, norms, logit_scale excluded), lr 5e-4,
betas (0.9, 0.98), eps 1e-6 — plus grad-norm clip at 20 (training.py:181).
In optax this is one chain with a decay mask; the clip lives in the same
chain (clip -> adamw), and the grad norm is surfaced as a metric by the train
step before clipping.
"""

from __future__ import annotations

import jax
import optax

from clip_mixer_tpu.config import TrainConfig
from clip_mixer_tpu.train.schedule import warmup_cosine


def decay_mask(params):
    """True (decay) exactly where torch's ndim>=2 rule decays
    (training.py:66-71): matrices/embeddings/convs decay; vectors, scalars,
    norm params, biases, logit_scale do not.

    Tower block params are stacked with a leading layer axis for lax.scan, so
    the torch-equivalent ndim is (ndim - 1) inside the "blocks" subtree — a
    naive ndim>=2 check would wrongly decay every stacked bias/LayerNorm."""

    def rule(path, p):
        stacked = any(getattr(k, "key", None) == "blocks" for k in path)
        # getattr: under optax.masked (freeze), masked-out leaves arrive as
        # MaskedNode placeholders with no ndim — treat as no-decay.
        return (getattr(p, "ndim", 0) - (1 if stacked else 0)) >= 2

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(tcfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    schedule = warmup_cosine(
        tcfg.learning_rate,
        tcfg.learning_rate * tcfg.min_lr_ratio,
        tcfg.warmup_steps,
        total_steps,
    )
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=tcfg.beta1,
        b2=tcfg.beta2,
        eps=tcfg.eps,
        weight_decay=tcfg.weight_decay,
        mask=decay_mask,
    )
    if tcfg.freeze:
        # Locked-tower (LiT): AdamW runs only on the trainable subtree — no
        # moments are even allocated for the frozen tower (the memory point
        # of locking), and weight decay cannot drift it. The frozen leaves'
        # grads are exact zeros (the train steps stop_gradient the subtree),
        # and optax.masked passes their (zero) updates through unchanged.
        def trainable(params):
            def rule(path, _):
                return getattr(path[0], "key", None) != tcfg.freeze

            return jax.tree_util.tree_map_with_path(rule, params)

        adamw = optax.masked(adamw, trainable)
    parts = [
        optax.clip_by_global_norm(tcfg.grad_clip_norm),
        adamw,
    ]
    if tcfg.ema_decay:
        # Passthrough slot holding the param EMA — must be LAST: the train
        # steps update it after their param fixups (train_step.update_ema).
        from clip_mixer_tpu.parallel.train_step import ema_slot

        parts.append(ema_slot())
    return optax.chain(*parts)
