"""Tensor parallelism over the mesh's "model" axis (megatron-style MLP split).

The reference needs only data parallelism (111M params), but the mesh design
reserves a model axis (SURVEY §2.7); this module makes it real for the MLP
hot path: each block's hidden dimension (4W) is column/row-sharded —
``w_in [W, 4W/m]``, ``w_out [4W/m, W]`` — so a block computes a partial
result locally and one ``psum`` over the model axis reassembles it. Token
mixes, attention, norms and embeddings stay replicated (they are a small
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
    dt = y.dtype
    y = f_psum(y, model_axis)
    h = activation(y @ mlp_params["w_in"].astype(dt) + mlp_params["b_in"].astype(dt))
    partial = h @ mlp_params["w_out"].astype(dt)
    return g_psum(partial, model_axis) + mlp_params["b_out"].astype(dt)


def tp_param_specs(params) -> dict:
    """PartitionSpec tree: hidden dims of channel_mix / mlp sharded over the
    model axis, everything else replicated. Matches the stacked-block layout
    ([L, ...] leading layer axis)."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "channel_mix" in keys or "mlp" in keys:
            name = keys[-1]
            if name in ("w_in",):  # [L, W, H]
                return P(None, None, MODEL_AXIS)
            if name in ("b_in",):  # [L, H]
                return P(None, MODEL_AXIS)
            if name in ("w_out",):  # [L, H, W]
                return P(None, MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)
