"""Analytic per-chip HBM planning for every parallelism mode.

The reference never needed this (8xA100-80GB fits everything replicated);
on 16GB v5e chips the parallelism mode IS the capacity plan. This module
computes per-chip bytes for parameters, Adam moments, gradients and the
rematerialised activation working set — from ``jax.eval_shape`` over the
REAL init and the REAL sharding rules (fsdp_spec / pp_param_specs), so the
numbers move when the code does, and a unit test pins them to the rules
(tests/test_memory_plan.py). TP is reported at its true storage cost:
replicated masters/moments/grads (tp.py shardings are transient,
inside-the-step only).

Used by ``scripts/memory_plan.py`` (the capacity-planning CLI) and quoted
in SCALING.md.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig


def _leaf_bytes(shape, dtype) -> int:
    return math.prod(shape) * jnp.dtype(dtype).itemsize if shape else jnp.dtype(dtype).itemsize


def param_shapes(cfg: CLIPConfig):
    """Abstract param tree (ShapeDtypeStruct leaves) — no arrays materialised."""
    from clip_mixer_tpu.models import clip as clip_model

    return jax.eval_shape(lambda k: clip_model.init(k, cfg), jax.random.key(0))


def _bytes_under_specs(shapes, specs, n: int) -> int:
    """Per-chip bytes for a shapes tree given a matching PartitionSpec tree:
    a leaf with any sharded dim is divided by the axis size ``n``."""
    total = 0
    from jax.sharding import PartitionSpec as P

    for shape_leaf, spec in zip(
        jax.tree.leaves(shapes),
        jax.tree.leaves(specs, is_leaf=lambda s: isinstance(s, P)),
    ):
        div = n if any(s is not None for s in spec) else 1
        total += _leaf_bytes(shape_leaf.shape, shape_leaf.dtype) // div
    return total


def _full_bytes(shapes) -> int:
    return sum(_leaf_bytes(l.shape, l.dtype) for l in jax.tree.leaves(shapes))


def _fsdp_bytes(shapes, n_data: int, n_model: int = 1) -> int:
    # Consumes the REAL rule (parallel/fsdp.py) so the planner tracks it.
    # n_model > 1 = the FSDP x TP composition: each leaf divided by the
    # product of the axes its merged spec actually shards over.
    from clip_mixer_tpu.parallel.fsdp import _merged_spec
    from clip_mixer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    def leaf_bytes(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        spec = _merged_spec(leaf.shape, keys, n_data, n_model)
        div = 1
        for s in spec:
            div *= n_data if s == DATA_AXIS else n_model if s == MODEL_AXIS else 1
        return _leaf_bytes(leaf.shape, leaf.dtype) // div

    return sum(jax.tree.leaves(jax.tree_util.tree_map_with_path(leaf_bytes, shapes)))


def _pp_bytes(shapes, n_stages: int) -> int:
    from clip_mixer_tpu.parallel.pp import pp_param_specs

    return _bytes_under_specs(shapes, pp_param_specs(shapes, n_stages), n_stages)




@dataclasses.dataclass
class MemoryPlan:
    mode: str
    params_bytes: int  # f32 masters, per chip
    opt_bytes: int  # Adam mu+nu, per chip
    grad_bytes: int  # transient gradient buffer, per chip
    act_bytes: int  # remat'd activation working set, per chip
    total_bytes: int

    def row(self) -> str:
        gib = 1 << 30
        return (
            f"{self.mode:<22} params {self.params_bytes / gib:6.2f}  "
            f"adam {self.opt_bytes / gib:6.2f}  grads {self.grad_bytes / gib:6.2f}  "
            f"acts {self.act_bytes / gib:6.2f}  total {self.total_bytes / gib:6.2f} GiB"
        )


def _activation_bytes(
    cfg: CLIPConfig, per_chip_batch: int, accum_steps: int = 1, n_stages: int = 1
) -> int:
    """Rematerialised training working set, per chip (estimate: the scan
    carries per-block INPUTS [B, T, W] for the backward — the dominant term
    under jax.checkpoint; attention/hidden intermediates are recomputed).

    accum divides the live batch; PP keeps the whole step's microbatch
    activations in flight but only for its L/S local blocks (GPipe memory
    profile — the microbatch count cancels out of this estimate)."""
    if cfg.is_resnet:
        # NHWC conv pyramid, ModifiedResNet geometry (reference
        # model.py:12-163): 3-conv stem at res/2, bottleneck stages
        # (expansion 4) of width w,2w,4w,8w at res/4../32. With the
        # per-bottleneck remat (models/resnet.py, the training default)
        # only block INPUTS [B, r, r, 4c] stay live, plus ONE block's
        # recompute transient (~10c r^2 values); without remat every conv
        # input is stored (~10c r^2 per block) — that stored pyramid is
        # what keeps un-rematted RN50x64 training off a 16GB chip. The
        # original stem-only estimate undershot by an order of magnitude.
        b = per_chip_batch // max(accum_steps, 1)
        w = cfg.vision_width
        res = cfg.image_resolution
        bf = 2
        per_img = (res // 2) ** 2 * 2 * w * bf  # stem convs (not rematted)
        transient = 0
        for i, blocks in enumerate(cfg.vision_layers):
            c = w * (2 ** i)
            stage_res = res // (4 * (2 ** i))
            if cfg.remat:
                per_img += blocks * stage_res ** 2 * 4 * c * bf  # inputs
                transient = max(transient, stage_res ** 2 * 10 * c * bf)
            else:
                per_img += blocks * stage_res ** 2 * 10 * c * bf
        # the text tower follows cfg.tower (a transformer for the RN
        # presets) and cfg.remat independently of the conv pyramid: price
        # its stored backward set too when remat is off, not inputs-only
        if cfg.remat:
            txt_b = b * cfg.context_length * cfg.text_width * cfg.text_layers * bf
        else:
            per_tok = 9 * cfg.text_width  # input + QuickGELU hidden pair
            per_block = cfg.context_length * per_tok
            if cfg.tower == "mixer":
                per_block += 8 * cfg.context_length * cfg.text_width
            else:
                per_block += cfg.text_heads * cfg.context_length ** 2
            txt_b = b * cfg.text_layers * per_block * bf
        return int(b * (per_img + transient) + txt_b)
    bsz = per_chip_batch // max(accum_steps, 1)
    bf16 = 2
    v_tokens, v_width, v_layers = cfg.vision_tokens, cfg.vision_width, cfg.vision_layers
    t_tokens, t_width, t_layers = cfg.context_length, cfg.text_width, cfg.text_layers
    if not cfg.remat:
        # No remat: EVERY block's backward set stays live, not just its
        # input — the block input [B,T,W], the QuickGELU hidden pair
        # [B,T,4W]x2, and the attention softmax probs [B,H,T,T] (or the
        # mixer token-mix hidden pair, [B,4T,W]-sized x2). This ~9-17x
        # per-block factor is what train.py's "--no-remat needs ~4x more
        # HBM" measures end-to-end (Mixer-B/32 at 1024 imgs/chip OOMs a
        # 16GB v5e without remat).
        attn_ = cfg.tower != "mixer"

        def stored_block(tokens, width, heads):
            t = tokens * 9 * width  # input + QuickGELU hidden pair
            if attn_:
                t += heads * tokens * tokens  # softmax probs
            else:
                t += 8 * tokens * width  # token-mix hidden pair
            return bsz * t * bf16

        vis = v_layers * stored_block(v_tokens, v_width, cfg.vision_heads)
        txt = t_layers * stored_block(t_tokens, t_width, cfg.text_heads)
        if n_stages > 1:
            vis //= n_stages
            txt //= n_stages
        return vis + txt
    vis = bsz * v_tokens * v_width * v_layers * bf16
    txt = bsz * t_tokens * t_width * t_layers * bf16
    # remat_policy keeps hidden pre-activations live on top of the block
    # inputs: "mlp_hidden" = [B, T, 4W] per block; "all_hidden" additionally
    # the mixer token-mix hidden [B, 4T, W] (same byte count).
    # (this estimate assumes remat ON — the training default — so the policy
    # field alone selects the saved sets)
    saved_sets = {"none": 0, "mlp_hidden": 1, "all_hidden": 2 if cfg.tower == "mixer" else 1}[
        cfg.remat_policy
    ]
    vis += saved_sets * 4 * vis
    txt += saved_sets * 4 * txt
    if n_stages > 1:
        # per-stage blocks, but n_micro microbatches' block inputs stay live
        vis = vis // n_stages
        txt = txt // n_stages
    # TRANSIENT single-block backward working set: under remat, ONE block's
    # recompute+backward is live at a time — for attention towers the
    # [B, H, T, T] score tensors dominate (~3 copies: recomputed scores,
    # softmax output, score grads) plus the [B, T, 4W] MLP hidden pair.
    # Omitting this is how the planner cleared vit-l14-336 at B=256 while
    # the real step OOMed on bf16[256,16,577,577] temps (measured, round 5).
    def block_transient(tokens, width, heads, attention):
        t = 2 * tokens * 4 * width * bf16  # MLP hidden fwd + grad
        if attention:
            t += 3 * heads * tokens * tokens * bf16
        else:  # mixer token-mix hidden pair
            t += 2 * 4 * tokens * width * bf16
        return bsz * t

    attn = cfg.tower != "mixer"
    transient = max(
        block_transient(v_tokens, v_width, cfg.vision_heads if attn else 0, attn),
        block_transient(t_tokens, t_width, cfg.text_heads, True if attn else False),
    )
    return vis + txt + transient


def suggest(
    cfg: CLIPConfig,
    n_devices: int,
    global_batch: int,
    hbm_bytes: int = 16 << 30,
    headroom: float = 0.9,
    ema: bool = False,
):
    """Pick the cheapest parallelism plan that fits per-chip HBM.

    Candidates are tried in a fixed preference order derived from this
    repo's measurements (README): plain DP is the fastest step when state
    and activations fit; FSDP shards the state at near-DP step time
    (GSPMD all-gather/reduce-scatter); exact grad accumulation divides the
    activation working set at a measured ~0.81x step throughput at accum 4;
    the FSDP x TP(2) composition shards each leaf further; GPipe PP(2) is
    the deep-tower fallback. The first candidate whose planned total is
    within ``headroom * hbm_bytes`` wins.

    Returns ``(best, tried)``: ``best`` is the winning MemoryPlan or None,
    ``tried`` is every ``(label, plan_or_none, fits_or_reason)`` in
    preference order for display.
    """
    budget = int(hbm_bytes * headroom)
    shapes = param_shapes(cfg)  # eval_shape once, not once per candidate

    # BN batch stats forbid grad accumulation for the ResNet tower
    # (train_step.py raises) — suggesting an accum plan there would bless
    # an unbuildable config.
    accums = (1,) if cfg.is_resnet else (1, 2, 4, 8)

    def candidates():
        yield "dp", dict(mode="dp", n_devices=n_devices), n_devices, 1
        for a in accums:
            yield f"fsdp accum{a}", dict(mode="fsdp", n_devices=n_devices), n_devices, a
        if n_devices >= 4 and n_devices % 2 == 0:
            for a in accums:
                yield (
                    f"fsdp x tp2 accum{a}",
                    dict(mode="fsdp", n_devices=n_devices, n_model=2),
                    n_devices // 2,
                    a,
                )
        if n_devices % 2 == 0:
            for a in accums:
                yield f"pp2 accum{a}", dict(mode="pp", n_devices=2), n_devices // 2, a

    best = None
    tried = []
    for label, kw, n_data, accum in candidates():
        if global_batch % n_data:
            tried.append((label, None, f"global batch {global_batch} not divisible by {n_data} data shards"))
            continue
        per_chip = global_batch // n_data
        if per_chip % accum:
            tried.append((label, None, f"per-chip batch {per_chip} not divisible by accum {accum}"))
            continue
        try:
            p = plan(cfg, per_chip_batch=per_chip, accum_steps=accum, shapes=shapes, ema=ema, **kw)
        except ValueError as e:
            tried.append((label, None, str(e)))
            continue
        fits = p.total_bytes <= budget
        tried.append((label, p, fits))
        if fits and best is None:
            best = p
    return best, tried


def plan(
    cfg: CLIPConfig,
    mode: str,
    n_devices: int,
    per_chip_batch: int,
    accum_steps: int = 1,
    n_model: int = 1,
    shapes=None,
    ema: bool = False,
) -> MemoryPlan:
    """Per-chip memory plan. mode: dp | fsdp | tp | pp (tp/pp divisor = the
    model/stage axis size = n_devices for a pure mesh). ``n_model > 1`` with
    mode="fsdp" plans the FSDP x TP composition on a
    (n_devices/n_model) x n_model grid. ``shapes``: pre-computed
    param_shapes(cfg), for callers pricing many plans of one config.
    ``ema``: TrainConfig.ema_decay is set — the averaged param copy lives in
    opt_state and shards exactly like the params, one extra params-size."""
    if shapes is None:
        shapes = param_shapes(cfg)
    full = _full_bytes(shapes)
    n_stages = 1
    if mode == "dp":
        p_bytes, opt_bytes, grad_bytes = full, 2 * full, full
    elif mode == "fsdp":
        if n_devices % n_model:
            raise ValueError(f"n_model {n_model} does not divide {n_devices} devices")
        p_bytes = _fsdp_bytes(shapes, n_devices // n_model, n_model)
        opt_bytes, grad_bytes = 2 * p_bytes, p_bytes
    elif mode == "tp":
        # Our TP stores CANONICAL (replicated) masters, optimizer moments
        # and gradients between steps — tp.py shardings exist only inside
        # shard_map during the step (train_step.py reorders grads back).
        # TP buys compute scaling and sharded hidden ACTIVATIONS, not state
        # memory; the transient sharded weight copies during the step add
        # ~_tp_bytes on top of the figures below.
        p_bytes, opt_bytes, grad_bytes = full, 2 * full, full
    elif mode == "pp":
        if cfg.is_resnet:
            raise ValueError("pp needs a uniform block stack")
        if cfg.vision_layers % n_devices or cfg.text_layers % n_devices:
            raise ValueError(
                f"pp needs both tower depths divisible by stages: "
                f"{cfg.vision_layers}/{cfg.text_layers} vs {n_devices}"
            )
        p_bytes = _pp_bytes(shapes, n_devices)
        opt_bytes, grad_bytes = 2 * p_bytes, p_bytes
        n_stages = n_devices
    else:
        raise ValueError(mode)

    if ema:
        opt_bytes += p_bytes  # EMA tree mirrors the params' storage sharding
    act = _activation_bytes(cfg, per_chip_batch, accum_steps, n_stages)
    total = p_bytes + opt_bytes + grad_bytes + act
    label = f"{mode}x{n_devices}"
    if mode == "fsdp" and n_model > 1:
        label = f"fsdp{n_devices // n_model}x tp{n_model}"
    return MemoryPlan(
        mode=label + (f" accum{accum_steps}" if accum_steps > 1 else ""),
        params_bytes=p_bytes,
        opt_bytes=opt_bytes,
        grad_bytes=grad_bytes,
        act_bytes=act,
        total_bytes=total,
    )
