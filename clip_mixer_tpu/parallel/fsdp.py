"""FSDP / ZeRO-3: parameters + optimizer moments sharded over the data axis.

The shard_map training step (parallel/train_step.py) keeps parameters
REPLICATED on every device — the right call at the reference's 111M params
(SURVEY §2.7), but this framework also hosts vit-l14 (428M) and larger
geometries, where f32 masters + Adam mu/nu + grads cost 16 bytes/param per
device before a single activation. This module is the scale-out answer the
torch world gets from FSDP/DeepSpeed-ZeRO (the layer above the reference's
Accelerate/DDP stack, training/training.py:64,93-95), built the TPU way:

* every large parameter leaf (and, automatically, its same-shaped Adam
  moments) is STORED sharded over the mesh's "data" axis — a
  ``NamedSharding`` picked per-leaf by :func:`fsdp_spec`;
* the train step is a plain ``jax.jit`` over GLOBAL arrays with those
  shardings pinned on the state: the XLA SPMD partitioner inserts the
  all-gather right before each weight's use in forward/backward and
  reduce-scatters the gradient — exactly ZeRO-3's bucketing, derived from
  sharding annotations instead of hand-written hook code;
* the InfoNCE loss runs on the logically-global feature matrices
  (``info_nce(axis_name=None)``): with one logical array there is no
  local/global split, so the objective is the EXACT globally-coupled
  contrastive loss — equivalent to the shard_map step with
  ``grad_through_gather=True`` (equivalence-tested, tests/test_fsdp.py).
  The reference's stop-grad-through-gather variant is a DDP-era workaround
  with no GSPMD analogue; FSDP always trains with the exact gradient.

Sharding rule: for each leaf, shard the LAST dimension divisible by the
axis size (skipping small leaves). Scanning from the last dim keeps the
stacked-layer axis [L, ...] unsharded, so ``lax.scan`` over blocks never
slices across devices; hidden/width dims (3072/768/512) are the ones split.

On a mesh with a >1 "model" axis, FSDP COMPOSES with tensor parallelism:
each leaf's TP dimension (the parallel/tp.py rules — MLP hidden dims,
attention head-packed dims) is sharded over the model axis and a second,
different dimension over the data axis, so storage shrinks by the full
device-grid factor while the SPMD partitioner derives megatron-style
compute sharding for the MLPs from the same annotations.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.losses import contrastive_loss, loss_param_keys as losses_loss_param_keys
from clip_mixer_tpu.ops.augment import maybe_augment
from clip_mixer_tpu.ops.preprocess import normalize_images
from clip_mixer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding
from clip_mixer_tpu.parallel.train_step import TrainState, freeze_subtree, two_pass_accum_grads

# Leaves smaller than this stay replicated: sharding a [12, 64] bias saves
# nothing and costs a collective.
_MIN_SHARD_ELEMS = 4096


def fsdp_spec(shape: Tuple[int, ...], n_shard: int, min_elems: int = _MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the last dim divisible by ``n_shard`` over the
    data axis; replicated if none divides or the leaf is small."""
    return _merged_spec(shape, (), n_shard, 1, min_elems)


def _merged_spec(
    shape: Tuple[int, ...],
    path_keys,
    n_data: int,
    n_model: int,
    min_elems: int = _MIN_SHARD_ELEMS,
) -> P:
    """FSDP x TP storage spec for one leaf: the tensor-parallel dimension
    (parallel/tp.py rules, keyed on the leaf's path) goes to the model axis,
    then the LAST remaining dim divisible by ``n_data`` goes to the data axis
    — so a channel-MLP ``w_in [L, W, H]`` on a (data=4, model=2) mesh is
    stored as [L, W/4, H/2] per device, an 8-way ZeRO-3 saving. When a model
    dim was assigned, the data scan skips the leading stacked-layer axis of
    ndim>=2 leaves (slicing the scan axis across devices would turn every
    scan iteration into a collective)."""
    ndim = len(shape)
    spec = [None] * ndim
    size = 1
    for d in shape:
        size *= d
    if n_model > 1 and ndim > 0 and size >= min_elems:
        # min_elems applies to the model axis too: this is STORAGE sharding
        # (unlike tp_param_specs, whose shard_map contract requires every
        # hidden leaf sharded) — grid-sharding a 1KB bias saves nothing and
        # costs an all-gather per use.
        from clip_mixer_tpu.parallel.tp import tp_leaf_dim

        dim = tp_leaf_dim(list(path_keys))
        if dim is not None:
            dim %= ndim
            if shape[dim] >= n_model and shape[dim] % n_model == 0:
                spec[dim] = MODEL_AXIS
    if n_data > 1 and size >= min_elems:
        lowest = 1 if (MODEL_AXIS in spec and ndim >= 2) else 0
        for ax in range(ndim - 1, lowest - 1, -1):
            if spec[ax] is None and shape[ax] >= n_data and shape[ax] % n_data == 0:
                spec[ax] = DATA_AXIS
                break
    if all(s is None for s in spec):
        return P()
    return P(*spec)


def fsdp_state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """TrainState-shaped tree of NamedShardings: params and every optimizer
    leaf sharded by :func:`_merged_spec` (Adam mu/nu mirror the param dict
    keys and shapes, so they land on matching shards); scalars/counters
    replicated. On a mesh with a >1 "model" axis this composes FSDP with
    tensor parallelism: storage is sharded over the full device grid and the
    GSPMD partitioner derives the megatron-style compute sharding from the
    same annotations."""
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def sh(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        return NamedSharding(mesh, _merged_spec(jnp.shape(leaf), keys, n_data, n_model))

    return jax.tree_util.tree_map_with_path(sh, state)


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place a (host or replicated) TrainState onto its FSDP shardings."""
    return jax.tree.map(jax.device_put, state, fsdp_state_shardings(mesh, state))


def make_fsdp_train_step(
    cfg: CLIPConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    state: TrainState,
    chunk_size: Optional[int] = None,
    accum_steps: int = 1,
):
    """Returns jitted ``step(state, batch) -> (state, metrics)`` with FSDP
    state shardings pinned on input AND output (``state`` is only used as the
    pytree/shape template).

    Semantics match make_train_step(grad_through_gather=True): in-step uint8
    normalisation, forward to features, exact global InfoNCE, grad-clip +
    AdamW (reference training/training.py:144-190), logit_scale clamp, BN
    running-stat merge for ResNet towers. ``accum_steps > 1`` is the same
    exact two-pass GradCache-style accumulation as the shard_map step —
    microbatch features first, one global loss/cotangent computation, then a
    per-microbatch VJP scan (activation memory of a single microbatch).
    """
    assert accum_steps >= 1
    if accum_steps > 1 and cfg.is_resnet:
        raise NotImplementedError(
            "grad accumulation with BN batch stats (ResNet tower) is not supported"
        )
    dtype = jnp.dtype(cfg.compute_dtype)

    keys = losses_loss_param_keys(tcfg.loss)

    def local_loss(params, images_u8, texts):
        params = freeze_subtree(params, tcfg.freeze)
        images = normalize_images(images_u8, dtype=dtype)
        # axis_name=None: under GSPMD the batch is one logical array, so BN
        # moments (ResNet) and the contrastive loss are global automatically.
        img, txt, scale, bn_stats = clip_model.forward_train(
            params, cfg, images, texts, bn_eval=tcfg.freeze == "visual"
        )
        # grad_through_gather=True: info_nce stop-grads the key side by
        # default even with axis_name=None (the reference's detach
        # semantics); FSDP trains with the exact globally-coupled gradient.
        loss = contrastive_loss(
            tcfg.loss,
            img,
            txt,
            scale,
            logit_bias=params.get("logit_bias"),
            axis_name=None,
            grad_through_gather=True,
            chunk_size=chunk_size,
        )
        return loss, bn_stats

    def loss_and_grad(params, images, texts):
        (loss, bn_stats), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, images, texts
        )
        return loss, grads, bn_stats

    def loss_and_grad_accum(params, images, texts):
        b = images.shape[0]
        assert b % accum_steps == 0, (b, accum_steps)
        mb = b // accum_steps
        # Keep each microbatch split over data after the reshape.
        mb_spec = NamedSharding(mesh, P(None, DATA_AXIS))
        imgs = jax.lax.with_sharding_constraint(
            images.reshape(accum_steps, mb, *images.shape[1:]), mb_spec
        )
        txts = jax.lax.with_sharding_constraint(
            texts.reshape(accum_steps, mb, *texts.shape[1:]), mb_spec
        )

        def get_chunk(i):
            # GSPMD path: keep the data-axis-resharded stack (each chunk
            # stays split over DATA_AXIS); a flat dynamic_slice here would
            # cut across device shards and force a per-microbatch all-to-all.
            return (
                jax.lax.dynamic_index_in_dim(imgs, i, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(txts, i, 0, keepdims=False),
            )

        def micro_feats(p, im_u8, tx):
            p = freeze_subtree(p, tcfg.freeze)
            im = normalize_images(im_u8, dtype=dtype)
            img, txt, _scale, _bn = clip_model.forward_train(p, cfg, im, tx)
            return img, txt

        def feat_loss(fi, ft, loss_params):
            return contrastive_loss(
                tcfg.loss,
                fi.reshape(b, -1),
                ft.reshape(b, -1),
                jnp.exp(loss_params["logit_scale"]),
                logit_bias=loss_params.get("logit_bias"),
                axis_name=None,
                grad_through_gather=True,
                chunk_size=chunk_size,
            )

        loss, grads = two_pass_accum_grads(
            params, accum_steps, get_chunk, micro_feats, feat_loss, loss_param_keys=keys
        )
        return loss, grads, {}

    run = loss_and_grad_accum if accum_steps > 1 else loss_and_grad

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        images = maybe_augment(tcfg, cfg, state.step, batch["images"])
        loss, grads, bn_stats = run(state.params, images, batch["texts"])
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params)
        params["logit_scale"] = jnp.minimum(params["logit_scale"], tcfg.logit_scale_max)
        if bn_stats:
            from clip_mixer_tpu.models.resnet import apply_bn_updates

            params["visual"] = apply_bn_updates(params["visual"], bn_stats)
        if tcfg.ema_decay:
            from clip_mixer_tpu.parallel.train_step import update_ema

            opt_state = update_ema(opt_state, params, tcfg.ema_decay)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "logit_scale": jnp.exp(params["logit_scale"]),
        }
        if "logit_bias" in params:  # siglip: the bias drives the saddle
            metrics["logit_bias"] = params["logit_bias"]
        return TrainState(params, opt_state, state.step + 1), metrics

    shardings = fsdp_state_shardings(mesh, state)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(shardings, {"images": bsh, "texts": bsh}),
        out_shardings=(shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
