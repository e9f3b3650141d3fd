"""Analytic per-chip HBM planning for every parallelism mode.

The reference never needed this (8xA100-80GB fits everything replicated);
on 16GB v5e chips the parallelism mode IS the capacity plan. This module
computes per-chip bytes for parameters, Adam moments, gradients and the
rematerialised activation working set — from ``jax.eval_shape`` over the
REAL init and the REAL sharding rules (fsdp_spec / pp_param_specs /
tp_param_specs), so the numbers move when the code does, and a unit test
pins them to the rules (tests/test_memory_plan.py).

Used by ``scripts/memory_plan.py`` (the capacity-planning CLI) and quoted
in SCALING.md.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig


def _leaf_bytes(shape, dtype) -> int:
    return math.prod(shape) * jnp.dtype(dtype).itemsize if shape else jnp.dtype(dtype).itemsize


def param_shapes(cfg: CLIPConfig):
    """Abstract param tree (ShapeDtypeStruct leaves) — no arrays materialised."""
    from clip_mixer_tpu.models import clip as clip_model

    return jax.eval_shape(lambda k: clip_model.init(k, cfg), jax.random.key(0))


def _sharded_bytes(shapes, spec_fn) -> int:
    """Sum of per-chip leaf bytes given a leaf -> divisor rule."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        total += _leaf_bytes(leaf.shape, leaf.dtype) // spec_fn(path, leaf)
    return total


def _divisor_dp(path, leaf) -> int:
    return 1


def _make_divisor_fsdp(n: int):
    from clip_mixer_tpu.parallel.fsdp import fsdp_spec

    def div(path, leaf):
        spec = fsdp_spec(leaf.shape, n)
        return n if any(s is not None for s in spec) else 1

    return div


def _make_divisor_pp(n_stages: int):
    def div(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "blocks" in keys and len(leaf.shape) >= 1 and leaf.shape[0] % n_stages == 0:
            return n_stages
        return 1

    return div


def _make_divisor_tp(n_model: int):
    def div(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        name = keys[-1]
        if ("channel_mix" in keys or "mlp" in keys) and name in ("w_in", "b_in", "w_out"):
            return n_model
        if "attn" in keys and name in ("qkv_kernel", "qkv_bias", "out_kernel"):
            return n_model
        return 1

    return div


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
    cfg: CLIPConfig, per_chip_batch: int, accum_steps: int = 1, n_micro: int = 1, n_stages: int = 1
) -> int:
    """Rematerialised training working set, per chip (estimate: the scan
    carries per-block INPUTS [B, T, W] for the backward — the dominant term
    under jax.checkpoint; attention/hidden intermediates are recomputed).

    accum divides the live batch; PP keeps all in-flight microbatch
    activations for its L/S local blocks (GPipe memory profile)."""
    if cfg.is_resnet:
        # conv trunk: rough NHWC pyramid estimate at the stem resolution
        b = per_chip_batch // accum_steps
        return int(b * cfg.image_resolution**2 * 3 * 2 * 8)
    bsz = per_chip_batch // max(accum_steps, 1)
    bf16 = 2
    v_tokens, v_width, v_layers = cfg.vision_tokens, cfg.vision_width, cfg.vision_layers
    t_tokens, t_width, t_layers = cfg.context_length, cfg.text_width, cfg.text_layers
    vis = bsz * v_tokens * v_width * v_layers * bf16
    txt = bsz * t_tokens * t_width * t_layers * bf16
    if n_stages > 1:
        # per-stage blocks, but n_micro microbatches' block inputs stay live
        vis = vis // n_stages
        txt = txt // n_stages
    return vis + txt


def plan(
    cfg: CLIPConfig,
    mode: str,
    n_devices: int,
    per_chip_batch: int,
    accum_steps: int = 1,
    n_micro: int = 8,
) -> MemoryPlan:
    """Per-chip memory plan. mode: dp | fsdp | tp | pp (tp/pp divisor = the
    model/stage axis size = n_devices for a pure mesh)."""
    shapes = param_shapes(cfg)
    f32 = 4
    if mode == "dp":
        div = _divisor_dp
        n_stages = 1
    elif mode == "fsdp":
        div = _make_divisor_fsdp(n_devices)
        n_stages = 1
    elif mode == "tp":
        div = _make_divisor_tp(n_devices)
        n_stages = 1
    elif mode == "pp":
        div = _make_divisor_pp(n_devices)
        n_stages = n_devices
    else:
        raise ValueError(mode)

    p_bytes = _sharded_bytes(shapes, div)
    opt_bytes = 2 * p_bytes  # mu + nu follow the param shardings (or lack of)
    if mode == "tp":
        # TP runs the optimizer on replicated canonical grads (train_step.py
        # reorders back before the update) — moments are NOT sharded.
        full = _sharded_bytes(shapes, _divisor_dp)
        opt_bytes = 2 * full
        grad_bytes = full
    else:
        grad_bytes = p_bytes
    act = _activation_bytes(cfg, per_chip_batch, accum_steps, n_micro, n_stages)
    total = p_bytes + opt_bytes + grad_bytes + act
    return MemoryPlan(
        mode=f"{mode}x{n_devices}" + (f" accum{accum_steps}" if accum_steps > 1 else ""),
        params_bytes=p_bytes,
        opt_bytes=opt_bytes,
        grad_bytes=grad_bytes,
        act_bytes=act,
        total_bytes=total,
    )
