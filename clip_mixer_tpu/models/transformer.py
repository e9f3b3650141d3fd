"""Pre-LN transformer block and tower (the reference's attention variant).

Semantics of reference model.py:180-236: pre-LN multi-head attention with a
packed QKV projection (torch nn.MultiheadAttention layout — the converter maps
``in_proj_weight`` straight onto our packed kernel), then a pre-LN 4x MLP with
QuickGELU. The text tower adds an additive upper-triangular -inf causal mask
(model.py:398-404).

TPU notes: sequence lengths here are tiny and static (77 text / 50 vision
tokens — architectural constants, see SURVEY §5), a fraction of one MXU tile,
so attention is plain einsums and XLA fuses the softmax chain; a flash/Pallas
attention kernel would only add overhead at these shapes. Softmax runs in f32
inside bf16 towers. The tower is a ``lax.scan`` over stacked block params with
optional ``jax.checkpoint``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from clip_mixer_tpu.models.layers import (
    init_layer_norm,
    init_linear_normal,
    init_linear_torch_default,
    layer_norm,
    quick_gelu,
    remat_policy_fn,
    stack_layers,
)


def multi_head_attention(
    params: Dict,
    x: jnp.ndarray,
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Packed-QKV MHA. x: [B, T, W]; mask: additive [T, T] or None."""
    dt = x.dtype
    qkv = x @ params["qkv_kernel"].astype(dt) + params["qkv_bias"].astype(dt)  # [B,T,3W]
    out = attention_core(qkv, n_heads, mask)
    return out @ params["out_kernel"].astype(dt) + params["out_bias"].astype(dt)


def attention_core(qkv: jnp.ndarray, n_heads: int, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Packed-QKV [B, T, 3W] -> concat of head outputs [B, T, W] (the
    pre-out-projection activation). The int8 block and the calibration
    passes (ops/quant.py) consume it too, so their statistics come from
    exactly the forward being quantized."""
    B, T, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B,T,W] -> [B,H,T,hd]
        return t.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)

    out = attention_heads_core(heads(q), heads(k), heads(v), mask)
    return out.transpose(0, 2, 1, 3).reshape(B, T, W)


def attention_heads_core(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """[B, H, T, hd] q/k/v -> [B, H, T, hd]. The ONE implementation of the
    scaled-scores / f32-softmax chain — the replicated forward, the
    head-sharded TP forward (parallel/tp.py) and the int8/calibration paths
    all route through here so the numerics cannot drift between them."""
    dt = q.dtype
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (head_dim**-0.5)
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1).astype(dt)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def attention_block(
    params: Dict, x: jnp.ndarray, n_heads: int, mask: Optional[jnp.ndarray], model_axis=None
) -> jnp.ndarray:
    """One ResidualAttentionBlock (reference model.py:196-199). With
    ``model_axis`` (inside shard_map, params pre-sharded by
    parallel.tp.tp_param_specs on the head-major-reordered tree) both the
    attention (head-sharded) and the 4x MLP (hidden-sharded) run
    tensor-parallel."""
    if model_axis is not None:
        from clip_mixer_tpu.parallel.tp import sharded_mlp, tp_attention

        head_dim = x.shape[-1] // n_heads
        x = x + tp_attention(params["attn"], layer_norm(params["ln_1"], x), head_dim, mask, model_axis)
        y = layer_norm(params["ln_2"], x)
        return x + sharded_mlp(params["mlp"], y, quick_gelu, model_axis)
    x = x + multi_head_attention(params["attn"], layer_norm(params["ln_1"], x), n_heads, mask)
    y = layer_norm(params["ln_2"], x)
    mlp = params["mlp"]
    dt = x.dtype
    h = y @ mlp["w_in"].astype(dt) + mlp["b_in"].astype(dt)
    # Saveable under remat_policy="mlp_hidden" (models/layers.remat_policy_fn)
    h = checkpoint_name(h, "mlp_hidden")
    h = quick_gelu(h)
    h = h @ mlp["w_out"].astype(dt) + mlp["b_out"].astype(dt)
    return x + h


def init_attention_block(key, width: int, text_tower: bool, n_layers: int) -> Dict:
    """text_tower=True uses the reference's explicit normals
    (model.py:379-387); text_tower=False keeps torch defaults (the reference
    never re-inits the vision tower's blocks)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if text_tower:
        attn_std = width**-0.5
        proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
        fc_std = (2 * width) ** -0.5
        qkv = init_linear_normal(k1, width, 3 * width, attn_std)
        out = init_linear_normal(k2, width, width, proj_std)
        w_in = init_linear_normal(k3, width, 4 * width, fc_std)
        w_out = init_linear_normal(k4, 4 * width, width, proj_std)
    else:
        # torch MultiheadAttention default: xavier_uniform in_proj, zero
        # in_proj_bias is false (bias is zeros), out_proj kaiming-uniform-ish;
        # approximated with the Linear default rule (close enough — the
        # reference's vision transformer is the non-novel branch).
        qkv = init_linear_torch_default(k1, width, 3 * width)
        out = init_linear_torch_default(k2, width, width)
        w_in = init_linear_torch_default(k3, width, 4 * width)
        w_out = init_linear_torch_default(k4, 4 * width, width)
    return {
        "ln_1": init_layer_norm(width),
        "attn": {
            "qkv_kernel": qkv["kernel"],
            "qkv_bias": qkv["bias"],
            "out_kernel": out["kernel"],
            "out_bias": out["bias"],
        },
        "ln_2": init_layer_norm(width),
        "mlp": {
            "w_in": w_in["kernel"],
            "b_in": w_in["bias"],
            "w_out": w_out["kernel"],
            "b_out": w_out["bias"],
        },
    }


def init_transformer_tower(key, width: int, n_layers: int, text_tower: bool) -> Dict:
    keys = jax.random.split(key, n_layers)
    return {"blocks": stack_layers([init_attention_block(k, width, text_tower, n_layers) for k in keys])}


def causal_mask(context_length: int) -> jnp.ndarray:
    """Additive upper-triangular -inf mask (reference model.py:398-404)."""
    return jnp.triu(jnp.full((context_length, context_length), -jnp.inf, jnp.float32), k=1)


def transformer_tower(
    params: Dict,
    x: jnp.ndarray,
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    model_axis=None,
    pipeline=None,
    remat_policy: str = "none",
) -> jnp.ndarray:
    if pipeline is not None:
        from clip_mixer_tpu.parallel.pp import pipeline_tower

        axis_name, n_stages, n_micro = pipeline
        return pipeline_tower(
            params["blocks"],
            x,
            lambda lp, h: attention_block(lp, h, n_heads, mask, model_axis),
            n_stages,
            n_micro,
            axis_name=axis_name,
            remat=remat,
            remat_policy=remat_policy,
        )
    body = attention_block
    if remat:
        body = jax.checkpoint(body, static_argnums=(2, 4), policy=remat_policy_fn(remat_policy))

    def step(h, layer_params):
        return body(layer_params, h, n_heads, mask, model_axis), None

    out, _ = jax.lax.scan(step, x, params["blocks"])
    return out
