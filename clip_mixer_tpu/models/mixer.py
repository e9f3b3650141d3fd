"""MLP-Mixer block and tower — the reference's novelty, TPU-first.

Semantics of reference model.py:201-222 (MixerBlock) and :239-249 (Mixer):
pre-LN token-mixing MLP (contract over the token axis, expansion x4) and
pre-LN channel-mixing MLP (expansion x4), both residual, both QuickGELU.
Note the x4 expansion on BOTH mixes — this differs from the Mixer paper's
(0.5, 4) and is a deliberate property of the reference.

TPU-first layout: instead of the reference's permute->Linear->permute
(model.py:220-222), the token mix is a single einsum contracting the token
axis directly — ``btw,tu->buw`` — which keeps the model width W on the lane
(last) dimension for both mixes, so every matmul hits the MXU with W=768/512
(multiples of 128) lanes and no relayout between the two mixes.

The tower is a ``lax.scan`` over stacked per-layer params (one compiled block
body regardless of depth), with optional ``jax.checkpoint`` rematerialisation
(the reference exposes checkpoint_sequential but never enables it,
model.py:239-249).
"""

from __future__ import annotations

from typing import Dict

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


def token_mix(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """The token-mixing MLP residual branch: LN -> contract T -> gelu ->
    contract back (reference model.py:216,220-222). Shared by the bf16,
    tensor-parallel, and int8 block variants — keep all in sync here."""
    dt = x.dtype
    y = layer_norm(params["ln_token"], x)
    tm = params["token_mix"]
    h = jnp.einsum("btw,tu->buw", y, tm["w_in"].astype(dt))
    h = h + tm["b_in"].astype(dt)[:, None]
    # Saveable under remat_policy="all_hidden" (models/layers.remat_policy_fn)
    h = checkpoint_name(h, "token_hidden")
    h = quick_gelu(h)
    h = jnp.einsum("buw,ut->btw", h, tm["w_out"].astype(dt))
    return h + tm["b_out"].astype(dt)[:, None]


def mixer_block(params: Dict, x: jnp.ndarray, model_axis=None, fused_mlp: bool = False) -> jnp.ndarray:
    """One MixerBlock. x: [B, T, W]. With ``model_axis`` (inside shard_map,
    hidden-sharded params) the channel mix runs tensor-parallel; with
    ``fused_mlp`` it runs through the Pallas LN+MLP kernel."""
    dt = x.dtype
    # Token mix (always replicated: its params are ~1% of the block).
    x = x + token_mix(params, x)

    # Channel mix: LN -> W -> 4W -> W -> residual.
    if model_axis is None and fused_mlp:
        from clip_mixer_tpu.ops.pallas.mlp_kernel import ln_mlp

        B, T, W = x.shape
        return ln_mlp(params["ln_channel"], params["channel_mix"], x.reshape(B * T, W)).reshape(B, T, W)
    y = layer_norm(params["ln_channel"], x)
    if model_axis is not None:
        from clip_mixer_tpu.parallel.tp import sharded_mlp

        return x + sharded_mlp(params["channel_mix"], y, quick_gelu, model_axis)
    cm = params["channel_mix"]
    h = y @ cm["w_in"].astype(dt) + cm["b_in"].astype(dt)
    # Saveable under remat_policy="mlp_hidden": with the pre-activation kept,
    # the backward needs no forward matmul re-run (gelu/LN recompute only).
    h = checkpoint_name(h, "mlp_hidden")
    h = quick_gelu(h)
    h = h @ cm["w_out"].astype(dt) + cm["b_out"].astype(dt)
    return x + h


def init_mixer_block(key, width: int, tokens: int, text_tower: bool, n_layers: int) -> Dict:
    """Init one block.

    text_tower=True applies the reference's explicit normal init
    (model.py:388-393: lin1/lin3 std (2w)^-1/2, lin2/lin4 std
    w^-1/2 (2L)^-1/2, where w is the TEXT width); text_tower=False keeps
    torch-default init, matching the reference's vision-tower quirk (its
    initialize_parameters only touches ``self.transformer``).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if text_tower:
        fc_std = (2 * width) ** -0.5
        proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
        tok_in = init_linear_normal(k1, tokens, tokens * 4, fc_std)
        tok_out = init_linear_normal(k2, tokens * 4, tokens, proj_std)
        ch_in = init_linear_normal(k3, width, width * 4, fc_std)
        ch_out = init_linear_normal(k4, width * 4, width, proj_std)
    else:
        tok_in = init_linear_torch_default(k1, tokens, tokens * 4)
        tok_out = init_linear_torch_default(k2, tokens * 4, tokens)
        ch_in = init_linear_torch_default(k3, width, width * 4)
        ch_out = init_linear_torch_default(k4, width * 4, width)
    return {
        "ln_token": init_layer_norm(width),
        "token_mix": {
            "w_in": tok_in["kernel"],
            "b_in": tok_in["bias"],
            "w_out": tok_out["kernel"],
            "b_out": tok_out["bias"],
        },
        "ln_channel": init_layer_norm(width),
        "channel_mix": {
            "w_in": ch_in["kernel"],
            "b_in": ch_in["bias"],
            "w_out": ch_out["kernel"],
            "b_out": ch_out["bias"],
        },
    }


def init_mixer_tower(key, width: int, tokens: int, n_layers: int, text_tower: bool) -> Dict:
    keys = jax.random.split(key, n_layers)
    return {"blocks": stack_layers([init_mixer_block(k, width, tokens, text_tower, n_layers) for k in keys])}


def mixer_tower(
    params: Dict,
    x: jnp.ndarray,
    remat: bool = False,
    model_axis=None,
    fused_mlp: bool = False,
    pipeline=None,
    remat_policy: str = "none",
) -> jnp.ndarray:
    """Scan the stacked blocks. x: [B, T, W].

    ``pipeline=(axis_name, n_stages, n_micro)`` (inside shard_map, blocks
    stage-sharded on the layer axis) runs the GPipe schedule instead
    (parallel/pp.py)."""
    if pipeline is not None:
        from clip_mixer_tpu.parallel.pp import pipeline_tower

        axis_name, n_stages, n_micro = pipeline
        return pipeline_tower(
            params["blocks"],
            x,
            lambda lp, h: mixer_block(lp, h, model_axis, fused_mlp),
            n_stages,
            n_micro,
            axis_name=axis_name,
            remat=remat,
            remat_policy=remat_policy,
        )
    body = mixer_block
    if remat:
        body = jax.checkpoint(body, static_argnums=(2, 3), policy=remat_policy_fn(remat_policy))

    def step(h, layer_params):
        return body(layer_params, h, model_axis, fused_mlp), None

    out, _ = jax.lax.scan(step, x, params["blocks"])
    return out
