"""Tensor parallelism over the mesh's "model" axis (megatron-style).

The reference needs only data parallelism (111M params), but the mesh design
reserves a model axis (SURVEY §2.7); this module makes it real for both hot
paths: each block's MLP hidden dimension (4W) is column/row-sharded —
``w_in [W, 4W/m]``, ``w_out [4W/m, W]`` — and attention is HEAD-sharded
(each rank computes nh/m heads end-to-end, one psum reassembles the
out-projection). Token mixes, norms and embeddings stay replicated (a small
fraction of FLOPs/params at these widths).

Manual-SPMD correctness: under shard_map autodiff, the backward of the
hidden-sharded contraction produces PARTIAL input cotangents per model rank;
:func:`psum_transpose` is the standard identity-forward / psum-backward
helper (the f_psum pattern) inserted before the sharded matmuls so gradients
of everything upstream are correctly reduced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from clip_mixer_tpu.parallel.mesh import MODEL_AXIS


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def f_psum(x, axis_name: str):
    """Identity forward (x replicated over the axis); psum backward — the
    partial input-cotangents from the hidden-sharded contraction get reduced
    to the full gradient."""
    return x


f_psum.defvjp(lambda x, a: (x, None), lambda a, _, g: (jax.lax.psum(g, a),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def g_psum(x, axis_name: str):
    """psum forward; IDENTITY backward. Raw lax.psum must not be used here:
    its autodiff transpose is another psum, which multiplies replicated
    cotangents by the axis size (out = sum_i partial_i has d out/d partial_i
    = 1, so each rank's partial should receive g unchanged)."""
    return jax.lax.psum(x, axis_name)


g_psum.defvjp(lambda x, a: (jax.lax.psum(x, a), None), lambda a, _, g: (g,))


def sharded_mlp(mlp_params, y: jnp.ndarray, activation, model_axis: str) -> jnp.ndarray:
    """out = g_psum(act(f_psum(y) @ w_in_local + b_in_local) @ w_out_local)
    + b_out. Called INSIDE shard_map with hidden-sharded params; ``y``
    replicated over the model axis; b_out added after the reduction (it is
    replicated)."""
    from jax.ad_checkpoint import checkpoint_name

    dt = y.dtype
    y = f_psum(y, model_axis)
    pre = y @ mlp_params["w_in"].astype(dt) + mlp_params["b_in"].astype(dt)
    # Same saveable tag as the replicated MLP branches (each rank keeps its
    # LOCAL hidden shard), so remat_policy="mlp_hidden" works under TP too.
    pre = checkpoint_name(pre, "mlp_hidden")
    h = activation(pre)
    partial = h @ mlp_params["w_out"].astype(dt)
    return g_psum(partial, model_axis) + mlp_params["b_out"].astype(dt)


def tp_leaf_dim(keys) -> "int | None":
    """The dimension (negative index) a leaf shards over the model axis, or
    None if it stays replicated. ``keys`` is the leaf's path-key list (dict
    keys; non-dict path entries may be None). Negative indices make the rule
    layout-agnostic: hidden dims are last for the *_in leaves and second-to-
    last for the w_out/out_kernel contractions, with or without the stacked
    [L, ...] layer axis in front."""
    if not keys:
        return None
    name = keys[-1]
    if "channel_mix" in keys or "mlp" in keys:
        if name in ("w_in", "b_in"):  # [L, W, H] / [L, H]
            return -1
        if name == "w_out":  # [L, H, W]
            return -2
    if "attn" in keys:
        # head-major packed QKV (reorder_attn_head_major) shards heads
        # contiguously; the out-proj input dim is head-major natively.
        if name in ("qkv_kernel", "qkv_bias"):  # [L, W, 3W] / [L, 3W]
            return -1
        if name == "out_kernel":  # [L, W, W]
            return -2
    return None


def tp_param_specs(params) -> dict:
    """PartitionSpec tree: hidden dims of channel_mix / mlp sharded over the
    model axis, attention head-sharded, everything else replicated. Matches
    the stacked-block layout ([L, ...] leading layer axis)."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        dim = tp_leaf_dim(keys)
        if dim is None:
            return P()
        ndim = jnp.ndim(leaf)
        spec = [None] * ndim
        spec[dim % ndim] = MODEL_AXIS
        return P(*spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


# ---- head-sharded attention (megatron attention TP) -----------------------
#
# The packed-QKV canonical layout ([W, 3W] with columns ordered q|k|v,
# matching torch nn.MultiheadAttention / the checkpoint converter) cannot be
# head-sharded with a contiguous PartitionSpec. The train step therefore
# permutes the packed dim to HEAD-MAJOR order (for each head h: q_h|k_h|v_h)
# right before shard_map and permutes the gradients back right after — a
# linear bijection, so optimizer state and checkpoints stay canonical. The
# out-projection's input dim is already head-major (it consumes the concat
# of head outputs) and shards directly.

import numpy as np


def _head_major_perm(width: int, n_heads: int) -> np.ndarray:
    """Column permutation: canonical packed q|k|v -> per-head q_h|k_h|v_h."""
    hd = width // n_heads
    idx = np.arange(3 * width).reshape(3, n_heads, hd)  # [kind, head, elem]
    return idx.transpose(1, 0, 2).reshape(-1)


def _apply_qkv_perm(attn: dict, perm: np.ndarray) -> dict:
    out = dict(attn)
    out["qkv_kernel"] = jnp.take(attn["qkv_kernel"], perm, axis=-1)
    out["qkv_bias"] = jnp.take(attn["qkv_bias"], perm, axis=-1)
    return out


def reorder_attn_head_major(params: dict, cfg, inverse: bool = False) -> dict:
    """Permute every transformer tower's packed QKV to head-major order
    (or back with ``inverse=True`` — used to map gradients to canonical)."""
    out = dict(params)
    for tower_key, heads, is_tf in (
        ("visual", cfg.vision_heads, cfg.use_transformer and not cfg.is_resnet),
        ("text", cfg.text_heads, cfg.use_transformer),
    ):
        if not is_tf or tower_key not in params:
            continue
        sub = params[tower_key]
        blocks = sub["tower"]["blocks"]
        width = blocks["attn"]["qkv_kernel"].shape[-2]
        perm = _head_major_perm(width, heads)
        if inverse:
            perm = np.argsort(perm)
        new_blocks = dict(blocks)
        new_blocks["attn"] = _apply_qkv_perm(blocks["attn"], perm)
        new_sub = dict(sub)
        new_sub["tower"] = {"blocks": new_blocks}
        out[tower_key] = new_sub
    return out


def tp_attention(attn_params: dict, y: jnp.ndarray, head_dim: int, mask, model_axis: str) -> jnp.ndarray:
    """Head-sharded MHA INSIDE shard_map. attn_params hold this rank's heads
    in head-major packing: qkv_kernel [W, nh_local*3*hd], out_kernel
    [nh_local*hd, W] (a contiguous row-slice of the canonical out kernel);
    out_bias replicated, added after the psum."""
    from clip_mixer_tpu.models.transformer import attention_heads_core

    B, T, W = y.shape
    dt = y.dtype
    local3 = attn_params["qkv_kernel"].shape[-1]
    nh_local = local3 // (3 * head_dim)

    y = f_psum(y, model_axis)
    qkv = y @ attn_params["qkv_kernel"].astype(dt) + attn_params["qkv_bias"].astype(dt)
    qkv = qkv.reshape(B, T, nh_local, 3, head_dim)
    q = qkv[..., 0, :].transpose(0, 2, 1, 3)  # [B, nh_local, T, hd]
    k = qkv[..., 1, :].transpose(0, 2, 1, 3)
    v = qkv[..., 2, :].transpose(0, 2, 1, 3)
    out = attention_heads_core(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, nh_local * head_dim)
    partial = out @ attn_params["out_kernel"].astype(dt)
    return g_psum(partial, model_axis) + attn_params["out_bias"].astype(dt)
