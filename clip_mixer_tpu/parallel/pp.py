"""Pipeline parallelism: tower blocks sharded over a "stage" mesh axis.

The reference's 12-block towers never need pipelining (111M params — SURVEY
§2.7), but this framework's scaling story should not stop at DP x TP x FSDP:
deeper Mixer/Transformer variants on small-HBM chips want the layer axis
split across devices. TPU-native PP falls out of the existing design almost
for free: towers are ALREADY a ``lax.scan`` over stacked ``[L, ...]`` block
params (models/mixer.py:123-135), so sharding the leading layer axis over a
``stage`` axis gives each rank its contiguous block slice natively — no
module surgery, no stage classes.

Schedule: GPipe fill-drain, expressed as a ``lax.scan`` over
``n_micro + S - 1`` ticks inside ``shard_map``. Every tick, each stage runs
its block slice on its current microbatch and ``ppermute``s the activations
to the next stage; stage 0 feeds a fresh microbatch per tick, the last stage
collects. Reverse-mode autodiff derives the backward pipeline automatically
(the transpose of ppermute is the reverse ppermute; the transpose of the
tick-scan is the drain-fill backward schedule) — no hand-written 1F1B state
machine. Bubble fraction is the textbook (S-1)/(n_micro+S-1); pick
``n_micro >= 4*S`` to keep it under ~20%.

Two collective-gradient fixups (same custom-vjp helpers as tensor
parallelism, parallel/tp.py):

* the pipeline INPUT enters at stage 0 only, so its cotangent lands on
  stage 0 alone — ``f_psum`` (identity forward / psum backward) replicates
  it so the pre-tower params (patch/token embeddings) get identical, correct
  gradients on every stage rank;
* the pipeline OUTPUT is collected on the last stage only (zeros elsewhere),
  so ``g_psum`` (psum forward / identity backward) hands every rank the full
  activations for the replicated head (ln_post/projection/loss) while the
  backward cotangent still enters the pipeline only at the last stage (the
  predicated collect masks the others).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.losses import contrastive_loss, loss_param_keys as losses_loss_param_keys
from clip_mixer_tpu.ops.augment import maybe_augment
from clip_mixer_tpu.ops.preprocess import normalize_images
from clip_mixer_tpu.parallel.mesh import DATA_AXIS
from clip_mixer_tpu.parallel.tp import f_psum, g_psum
from clip_mixer_tpu.parallel.train_step import (
    TrainState,
    flat_chunker as train_step_flat_chunker,
    freeze_subtree,
    two_pass_accum_grads,
)

STAGE_AXIS = "stage"


def make_pp_mesh(n_data: int, n_stage: int, devices=None) -> Mesh:
    """(data, stage) mesh. Stages should map to adjacent devices so the
    per-tick activation hop rides one ICI link."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_stage <= len(devices), (n_data, n_stage, len(devices))
    arr = np.array(devices[: n_data * n_stage]).reshape(n_data, n_stage)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def pipeline_tower(
    blocks_local: Dict,
    x: jnp.ndarray,
    block_fn: Callable[[Dict, jnp.ndarray], jnp.ndarray],
    n_stages: int,
    n_micro: int,
    axis_name: str = STAGE_AXIS,
    remat: bool = False,
    remat_policy: str = "none",
) -> jnp.ndarray:
    """Run the full block stack over the pipeline. Called INSIDE shard_map.

    blocks_local: this stage's ``[L/S, ...]`` slice of the stacked params.
    x: [B, T, W] (replicated over the stage axis). Returns [B, T, W].
    """
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    stage = jax.lax.axis_index(axis_name)

    # Input cotangent lands on stage 0 only; psum-backward replicates it for
    # the (replicated) embedding params upstream.
    x = f_psum(x, axis_name)
    x_mb = x.reshape(n_micro, mb, *x.shape[1:])

    body = block_fn
    if remat:
        from clip_mixer_tpu.models.layers import remat_policy_fn

        body = jax.checkpoint(block_fn, policy=remat_policy_fn(remat_policy))

    def stage_fn(h):
        def step(c, layer_params):
            return body(layer_params, c), None

        out, _ = jax.lax.scan(step, h, blocks_local)
        return out

    n_ticks = n_micro + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        state, outputs = carry
        # Stage 0 ingests microbatch t (clamped during drain); other stages
        # consume what the previous stage ppermuted to them.
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False
        )
        inp = jnp.where(stage == 0, feed, state)
        out = stage_fn(inp)
        # Last stage collects microbatch t-(S-1) once the pipe is full.
        m = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        valid = (stage == n_stages - 1) & (t >= n_stages - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, m, axis=0, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(valid, out, cur), m, axis=0
        )
        if perm:
            state = jax.lax.ppermute(out, axis_name, perm)
        return (state, outputs), None

    init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
    (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
    # Non-last stages collected zeros; psum-forward broadcasts the result,
    # identity-backward keeps the cotangent entering only at the last stage
    # (masked by the predicated collect above).
    outputs = g_psum(outputs, axis_name)
    return outputs.reshape(B, *x.shape[1:])


def pp_param_specs(params, n_stages: int):
    """PartitionSpec tree: stacked tower block leaves ([L, ...], L % S == 0)
    sharded over the stage axis on the layer dim; everything else replicated.
    Works for any params-shaped tree (Adam mu/nu included) because it keys on
    the 'blocks' path component."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "blocks" in keys:
            shape = jnp.shape(leaf)
            if len(shape) >= 1 and shape[0] % n_stages == 0:
                return P(STAGE_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pp_state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    n_stages = mesh.shape[STAGE_AXIS]
    specs = pp_param_specs(state, n_stages)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda s: isinstance(s, P))


def place_pp_state(mesh: Mesh, state: TrainState) -> TrainState:
    return jax.tree.map(jax.device_put, state, pp_state_shardings(mesh, state))


def make_pp_train_step(
    cfg: CLIPConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    n_micro: int,
    grad_through_gather: bool = False,
    chunk_size: Optional[int] = None,
    accum_steps: int = 1,
):
    """Pipeline-parallel training step over a (data, stage) mesh.

    Same per-step semantics as make_train_step (parallel/train_step.py —
    in-step normalisation, global-batch InfoNCE over the data axis, pmean
    grads, AdamW, logit_scale clamp); BOTH towers' block stacks run the
    GPipe schedule over the stage axis. Block gradients live on their stage;
    all other gradients are replicated (bit-identical across stages thanks
    to the f_psum/g_psum fixups). ResNet towers are not pipelineable (their
    trunk is not a uniform block stack).

    ``accum_steps > 1`` composes the exact two-pass (GradCache) gradient
    accumulation with the pipeline: each accumulation chunk runs the full
    GPipe schedule (its ``n_micro`` pipeline microbatches within the chunk),
    features are cached, the InfoNCE loss/cotangents are computed ONCE over
    the step's whole batch, and a per-chunk VJP scan replays the pipeline
    backward — activation memory of one chunk's pipeline.
    """
    if cfg.is_resnet:
        raise NotImplementedError("pipeline parallelism needs a uniform block stack (mixer/transformer)")
    assert accum_steps >= 1
    n_stages = mesh.shape[STAGE_AXIS]
    assert cfg.vision_layers % n_stages == 0, (cfg.vision_layers, n_stages)
    assert cfg.text_layers % n_stages == 0, (cfg.text_layers, n_stages)
    loss_cfg = cfg.replace(pipeline_axis=STAGE_AXIS, pipeline_stages=n_stages,
                           pipeline_microbatches=n_micro)
    dtype = jnp.dtype(cfg.compute_dtype)
    keys = losses_loss_param_keys(tcfg.loss)

    def local_loss(params, images_u8, texts):
        params = freeze_subtree(params, tcfg.freeze)
        images = normalize_images(images_u8, dtype=dtype)
        img, txt, scale, _bn = clip_model.forward_train(
            params, loss_cfg, images, texts, axis_name=DATA_AXIS
        )
        loss = contrastive_loss(
            tcfg.loss,
            img, txt, scale,
            logit_bias=params.get("logit_bias"),
            axis_name=DATA_AXIS,
            grad_through_gather=grad_through_gather,
            chunk_size=chunk_size,
        )
        return loss

    def sharded_loss_and_grad(params, images, texts):
        loss, grads = jax.value_and_grad(local_loss)(params, images, texts)
        # Mean over data replicas; stage-sharded block grads are exclusive to
        # their stage, replicated grads are bit-identical across stages.
        return jax.lax.pmean(loss, DATA_AXIS), jax.lax.pmean(grads, DATA_AXIS)

    def sharded_loss_and_grad_accum(params, images, texts):
        """Two-pass exact accumulation with the pipelined forward (same
        scheme as train_step.sharded_loss_and_grad_accum — see its
        docstring for why naive accumulation is wrong for InfoNCE)."""
        local_b = images.shape[0]
        assert local_b % accum_steps == 0, (local_b, accum_steps)
        mb = local_b // accum_steps
        assert mb % n_micro == 0, (mb, n_micro)
        get_chunk = train_step_flat_chunker(images, texts, accum_steps)

        def micro_feats(p, im_u8, tx):
            p = freeze_subtree(p, tcfg.freeze)
            im = normalize_images(im_u8, dtype=dtype)
            img, txt, _scale, _bn = clip_model.forward_train(p, loss_cfg, im, tx)
            return img, txt

        def feat_loss(fi, ft, loss_params):
            return contrastive_loss(
                tcfg.loss,
                fi.reshape(local_b, -1),
                ft.reshape(local_b, -1),
                jnp.exp(loss_params["logit_scale"]),
                logit_bias=loss_params.get("logit_bias"),
                axis_name=DATA_AXIS,
                grad_through_gather=grad_through_gather,
                chunk_size=chunk_size,
            )

        loss, grads = two_pass_accum_grads(
            params, accum_steps, get_chunk, micro_feats, feat_loss, loss_param_keys=keys
        )
        return jax.lax.pmean(loss, DATA_AXIS), jax.lax.pmean(grads, DATA_AXIS)

    if accum_steps > 1:
        sharded_loss_and_grad = sharded_loss_and_grad_accum

    def step_fn(state: TrainState, batch):
        images = maybe_augment(tcfg, cfg, state.step, batch["images"])
        pspecs = pp_param_specs(state.params, n_stages)
        loss, grads = jax.shard_map(
            sharded_loss_and_grad,
            mesh=mesh,
            in_specs=(pspecs, P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), pspecs),
            check_vma=False,
        )(state.params, images, batch["texts"])
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params)
        params["logit_scale"] = jnp.minimum(params["logit_scale"], tcfg.logit_scale_max)
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

    return jax.jit(step_fn, donate_argnums=(0,))
