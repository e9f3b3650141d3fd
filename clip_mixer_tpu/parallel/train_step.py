"""Jitted, sharded training step: forward + global-batch InfoNCE + AdamW.

One compiled program per step, mirroring the reference's per-batch sequence
(training.py:144-190): in-step normalisation of uint8 images (:149), forward
to features (:156), cross-device feature gather + symmetric CE (:158-168),
gradient averaging (DDP allreduce :170 -> here an explicit pmean inside
shard_map), logit_scale clamp to ln(100) (:173-178), grad-norm clip at 20 +
norm logging (:180-183), optimizer + schedule step (:185-186).

Parallelism: params are replicated, the batch is split over the mesh's
"data" axis. Loss+grad run under shard_map so the InfoNCE all_gather is an
explicit ICI collective; the optimizer update runs on replicated grads (every
device computes the identical update — the XLA SPMD partitioner keeps it
fused in the same program).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.losses import info_nce
from clip_mixer_tpu.ops.preprocess import normalize_images
from clip_mixer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: CLIPConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    grad_through_gather: bool = False,
    chunk_size: Optional[int] = None,
):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    batch: {"images": uint8 [B, H, W, 3] (global B, sharded over data),
            "texts": int32 [B, 77]}.
    """

    # Tensor parallelism: with a >1 "model" axis, MLP hidden dims are
    # hidden-sharded and attention is head-sharded over it (parallel/tp.py);
    # the blocks insert the psum collectives.
    use_tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    if use_tp and cfg.use_transformer:
        m = mesh.shape[MODEL_AXIS]
        assert cfg.text_heads % m == 0, (cfg.text_heads, m)
        assert cfg.is_resnet or cfg.vision_heads % m == 0, (cfg.vision_heads, m)
    loss_cfg = cfg.replace(model_axis=MODEL_AXIS) if use_tp else cfg

    def local_loss(params, images_u8, texts):
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        # BN towers (ResNet) train on batch stats (SyncBN over the data axis)
        # and surface the moments for the running-stat EMA merge below.
        img, txt, scale, bn_stats = clip_model.forward_train(
            params, loss_cfg, images, texts, axis_name=DATA_AXIS
        )
        loss = info_nce(
            img,
            txt,
            scale,
            axis_name=DATA_AXIS,
            grad_through_gather=grad_through_gather,
            chunk_size=chunk_size,
        )
        return loss, bn_stats

    def sharded_loss_and_grad(params, images, texts):
        (loss, bn_stats), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, images, texts
        )
        # bn moments were already pmean'd inside (SyncBN) — replicated as-is.
        return jax.lax.pmean(loss, DATA_AXIS), jax.lax.pmean(grads, DATA_AXIS), bn_stats

    def run_loss_and_grad(params, images, texts):
        if use_tp:
            from clip_mixer_tpu.parallel.tp import reorder_attn_head_major, tp_param_specs

            # Head-shard attention: permute packed QKV to head-major before
            # sharding, permute the grads back after (a linear bijection —
            # optimizer state and checkpoints stay canonical).
            params_tp = reorder_attn_head_major(params, cfg)
            pspecs = tp_param_specs(params_tp)
            loss, grads_tp, bn_stats = jax.shard_map(
                sharded_loss_and_grad,
                mesh=mesh,
                in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(), pspecs, P()),
                check_vma=False,
            )(params_tp, images, texts)
            grads = reorder_attn_head_major(grads_tp, cfg, inverse=True)
            return loss, grads, bn_stats
        pspecs = jax.tree.map(lambda _: P(), params)
        return jax.shard_map(
            sharded_loss_and_grad,
            mesh=mesh,
            in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), pspecs, P()),
            check_vma=False,
        )(params, images, texts)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        loss, grads, bn_stats = run_loss_and_grad(state.params, batch["images"], batch["texts"])
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # clamp after the step, like the reference (ln(100) bound is the
        # correct branch — see SURVEY "reference bugs not replicated").
        params = dict(params)
        params["logit_scale"] = jnp.minimum(params["logit_scale"], tcfg.logit_scale_max)
        if bn_stats:  # ResNet tower: EMA-merge running BN stats (no gradients)
            from clip_mixer_tpu.models.resnet import apply_bn_updates

            params["visual"] = apply_bn_updates(params["visual"], bn_stats)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "logit_scale": jnp.exp(params["logit_scale"]),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_forward(cfg: CLIPConfig, mesh: Optional[Mesh] = None):
    """Jitted (params, images_u8, texts) -> (img_feats, txt_feats, scale)
    with in-step normalisation; batch sharded over data when a mesh is given."""

    def fwd(params, images_u8, texts):
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        return clip_model.forward(params, cfg, images, texts)

    if mesh is None:
        return jax.jit(fwd)
    return jax.jit(
        fwd,
        in_shardings=(
            jax.sharding.NamedSharding(mesh, P()),
            jax.sharding.NamedSharding(mesh, P(DATA_AXIS)),
            jax.sharding.NamedSharding(mesh, P(DATA_AXIS)),
        ),
    )
