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
from clip_mixer_tpu.ops.losses import contrastive_loss, loss_param_keys as losses_loss_param_keys
from clip_mixer_tpu.ops.augment import maybe_augment
from clip_mixer_tpu.ops.preprocess import normalize_images
from clip_mixer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def freeze_subtree(params, freeze):
    """Locked-tower training (TrainConfig.freeze, LiT-style): stop_gradient
    the frozen tower at the root of the loss, so its gradients are exact
    zeros AND XLA prunes its entire backward. The ONE helper shared by the
    DP/TP, FSDP and PP steps' loss/micro-feature functions."""
    if not freeze:
        return params
    p = dict(params)
    p[freeze] = jax.lax.stop_gradient(p[freeze])
    return p


class EmaState(NamedTuple):
    """Exponential moving average of the POST-step parameters, carried as the
    last element of the optax chain state (train/optimizer.py appends the
    passthrough slot when TrainConfig.ema_decay is set). Living inside
    opt_state means checkpointing, FSDP/PP sharding rules and resume
    templates all pick it up through the generic tree walks — the EMA leaves
    mirror the param paths, so they store sharded exactly like their params.

    The slot's optax update is a passthrough; the REAL update happens in the
    train steps after every param fixup (logit_scale clamp, ResNet BN
    running-stat merge), so the average tracks exactly what a checkpoint of
    the raw params would contain. No reference counterpart (torch-world EMA
    would be a separate module copy); standard practice for CLIP/SigLIP
    production training — the serving/eval weights are the average."""

    ema: Any


def ema_slot() -> optax.GradientTransformation:
    """Passthrough transform whose state holds the EMA tree (init = a copy of
    the initial params, so a constant decay needs no zero-init bias
    correction). Append LAST in the chain: the steps update it in place.
    The init COPY is load-bearing: jnp.asarray would alias the live param
    buffers and the donated train step would see the same buffer twice."""
    return optax.GradientTransformation(
        lambda params: EmaState(ema=jax.tree.map(lambda p: jnp.array(p, copy=True), params)),
        lambda updates, state, params=None: (updates, state),
    )


def update_ema(opt_state, params, decay: float):
    """The ONE EMA update shared by the DP/TP, FSDP and PP steps: fold the
    post-fixup params into the EmaState at the end of the chain tuple."""
    slot = opt_state[-1]
    assert isinstance(slot, EmaState), (
        "ema_decay set but the optimizer chain has no ema_slot() — build the "
        "optimizer with the same TrainConfig as the step"
    )
    new_ema = jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), slot.ema, params
    )
    return opt_state[:-1] + (EmaState(new_ema),)


def ema_params(state: TrainState):
    """Extract the EMA param tree from a TrainState, or None when EMA is off
    (the Trainer validates/exports with these when present)."""
    if isinstance(state.opt_state, tuple):
        for s in state.opt_state:
            if isinstance(s, EmaState):
                return s.ema
    return None


def flat_chunker(images, texts, accum_steps: int):
    """Microbatch accessor over FLAT [local_B, ...] arrays via dynamic_slice.

    Slicing the original buffer — instead of reshaping to ``[A, mb, ...]``
    scan inputs — matters on a single chip at giant batches: a stacked scan
    input forces XLA to materialise a second full-batch buffer in HBM in
    scan-major layout (measured on v5e: a +4.6G copy of the 32k uint8 image
    batch, the difference between fitting and OOM at the reference's
    global batch, training.py:56)."""
    local_b = images.shape[0]
    assert local_b % accum_steps == 0, (local_b, accum_steps)
    mb = local_b // accum_steps

    def get_chunk(i):
        return (
            jax.lax.dynamic_slice_in_dim(images, i * mb, mb, axis=0),
            jax.lax.dynamic_slice_in_dim(texts, i * mb, mb, axis=0),
        )

    return get_chunk


def two_pass_accum_grads(
    params, accum_steps, get_chunk, micro_feats, feat_loss,
    loss_param_keys=("logit_scale",),
):
    """The shared core of exact (GradCache-style) gradient accumulation,
    used by the DP (below), FSDP and PP steps — ONE implementation so the
    scheme cannot drift between them.

    get_chunk(i) -> (images, texts) of microbatch i (traced index). Local
    shard_map callers use :func:`flat_chunker` (no stacked full-batch copy);
    the GSPMD FSDP step indexes its data-axis-resharded stack instead.
    micro_feats(params, im, tx) -> (img_feats, txt_feats) for one chunk.
    feat_loss(f_img, f_txt, loss_params) -> scalar loss over the step's
    whole batch, where ``loss_params`` is the dict of the top-level scalar
    params named by ``loss_param_keys`` (logit_scale; + logit_bias for the
    siglip loss). The caller closes over its loss kind / axis / flags.

    Pass 1 runs each chunk forward undifferentiated keeping only features;
    the loss + feature cotangents are computed once; pass 2 replays each
    chunk under jax.vjp with its cotangent slice (lax.scan keeps one
    chunk's activations live). micro_feats discards the scale output, so
    the loss-param gradients arrive solely through the loss's direct
    cotangents and are added back here."""
    f_img, f_txt = jax.lax.map(
        lambda i: micro_feats(params, *get_chunk(i)), jnp.arange(accum_steps)
    )  # [A, mb, D] each

    # Tolerate a missing key (e.g. siglip on a model without logit_bias):
    # feat_loss's .get() then hands contrastive_loss a None, which raises
    # the explanatory ValueError instead of a bare KeyError here.
    loss_params = {k: params[k] for k in loss_param_keys if k in params}
    loss, (ct_img, ct_txt, g_loss) = jax.value_and_grad(feat_loss, argnums=(0, 1, 2))(
        f_img, f_txt, loss_params
    )

    def body(acc, xs):
        i, ci, ct = xs
        _, vjp_fn = jax.vjp(lambda p: micro_feats(p, *get_chunk(i)), params)
        (g,) = vjp_fn((ci, ct))
        return jax.tree.map(jnp.add, acc, g), None

    zero = jax.tree.map(jnp.zeros_like, params)
    grads, _ = jax.lax.scan(body, zero, (jnp.arange(accum_steps), ct_img, ct_txt))
    grads = dict(grads)
    for k, g in g_loss.items():
        grads[k] = grads[k] + g
    return loss, grads


def make_train_step(
    cfg: CLIPConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    grad_through_gather: bool = False,
    chunk_size: Optional[int] = None,
    accum_steps: int = 1,
):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    batch: {"images": uint8 [B, H, W, 3] (global B, sharded over data),
            "texts": int32 [B, 77]}.

    ``accum_steps > 1`` enables EXACT gradient accumulation for the
    contrastive loss (GradCache-style two-pass). Naive microbatch
    accumulation is wrong for InfoNCE — the loss couples every sample in the
    step's batch (each row's logsumexp runs over the full global batch), so
    summing per-microbatch losses changes the objective. Instead:

      pass 1   run each microbatch forward WITHOUT differentiation, keeping
               only the [local_B, D] feature matrices (activations are
               never stored);
      loss     compute InfoNCE + its cotangents d loss/d features ONCE on
               the full local feature matrices (the all_gather over the
               data axis sees the step's whole global batch, exactly as in
               the accum_steps=1 path);
      pass 2   re-run each microbatch under jax.vjp with its cotangent
               slice and sum the parameter gradients (lax.scan, so peak
               activation memory is one microbatch).

    The result is bit-for-bit the same objective and (numerics aside — the
    per-microbatch VJP sums in a different order) the same gradients as a
    single step over the whole batch, at 1/accum_steps the activation
    memory. This is how the reference's 32k global batch
    (training.py:56-62, 8xA100-80GB) fits 16GB v5e chips. The reference
    itself has no equivalent (Accelerate's accumulate() would silently
    compute the wrong loss for InfoNCE).
    """
    assert accum_steps >= 1
    if accum_steps > 1 and cfg.is_resnet:
        raise NotImplementedError(
            "grad accumulation with BN batch stats (ResNet tower) is not supported: "
            "per-microbatch moments are not the full-batch moments"
        )
    keys = losses_loss_param_keys(tcfg.loss)

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
        params = freeze_subtree(params, tcfg.freeze)
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        # BN towers (ResNet) train on batch stats (SyncBN over the data axis)
        # and surface the moments for the running-stat EMA merge below.
        img, txt, scale, bn_stats = clip_model.forward_train(
            params, loss_cfg, images, texts, axis_name=DATA_AXIS,
            bn_eval=tcfg.freeze == "visual",
        )
        loss = contrastive_loss(
            tcfg.loss,
            img,
            txt,
            scale,
            logit_bias=params.get("logit_bias"),
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

    def sharded_loss_and_grad_accum(params, images, texts):
        """Two-pass exact-gradient accumulation (see make_train_step
        docstring; shared core in two_pass_accum_grads)."""
        local_b = images.shape[0]
        get_chunk = flat_chunker(images, texts, accum_steps)
        dtype = jnp.dtype(cfg.compute_dtype)

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
        return jax.lax.pmean(loss, DATA_AXIS), jax.lax.pmean(grads, DATA_AXIS), {}

    if accum_steps > 1:
        sharded_loss_and_grad = sharded_loss_and_grad_accum

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
        images = maybe_augment(tcfg, cfg, state.step, batch["images"])
        loss, grads, bn_stats = run_loss_and_grad(state.params, images, batch["texts"])
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
        if tcfg.ema_decay:
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
