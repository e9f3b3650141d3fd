"""Vision and text encoders (dual-mode: mixer / transformer).

Vision semantics follow reference model.py:252-290; text semantics follow
reference model.py:413-426 (token embed -> optional pos-embed -> tower ->
ln_final -> EOT-argmax pooling @ text_projection).

TPU-first choices:
* images are NHWC and patchify is a reshape + one matmul (the reference's
  stride=kernel conv, model.py:258, IS a patch matmul — expressing it as one
  lets XLA feed the MXU directly and lets the fused preprocessing kernel emit
  patch vectors without an intermediate image layout);
* the mixer path carries NO positional embeddings — position information
  enters solely through the token-mixing MLP (reference model.py:262,278,343);
* EOT pooling uses take_along_axis at argmax(text) — eot id 49407 is the max
  token id, so argmax finds it (reference model.py:424).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models.layers import init_layer_norm, layer_norm
from clip_mixer_tpu.models.mixer import init_mixer_tower, mixer_tower
from clip_mixer_tpu.models.transformer import (
    causal_mask,
    init_transformer_tower,
    transformer_tower,
)


def _pipeline_of(cfg: CLIPConfig):
    """(axis, n_stages, n_micro) for the GPipe tower schedule, or None."""
    if cfg.pipeline_axis is None:
        return None
    return (cfg.pipeline_axis, cfg.pipeline_stages, cfg.pipeline_microbatches)


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3], patch-major (ph, pw, c) order.

    The converter reshapes the torch conv weight [W, 3, p, p] to the matching
    [p*p*3, W] kernel, so conv-as-matmul is numerically identical.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def init_vision_encoder(key, cfg: CLIPConfig) -> Dict:
    keys = jax.random.split(key, 4)
    width = cfg.vision_width
    scale = width**-0.5
    patch_dim = cfg.vision_patch_size**2 * 3
    # conv1 keeps the torch Conv2d default init (kaiming_uniform a=sqrt(5) ->
    # U(+-1/sqrt(fan_in)), fan_in = 3*p*p); class/pos/proj are scale*randn as
    # constructed in reference model.py:260-269.
    bound = patch_dim**-0.5
    params: Dict = {
        "patch_embed": {
            "kernel": jax.random.uniform(keys[0], (patch_dim, width), jnp.float32, -bound, bound)
        },
        "class_embedding": scale * jax.random.normal(keys[1], (width,), jnp.float32),
        "ln_pre": init_layer_norm(width),
        "ln_post": init_layer_norm(width),
        "proj": scale * jax.random.normal(keys[2], (width, cfg.embed_dim), jnp.float32),
    }
    kb, kp = jax.random.split(keys[3])
    if cfg.use_transformer:
        params["pos_embedding"] = scale * jax.random.normal(kp, (cfg.vision_tokens, width), jnp.float32)
        params["tower"] = init_transformer_tower(kb, width, cfg.vision_layers, text_tower=False)
    else:
        params["tower"] = init_mixer_tower(
            kb, width, cfg.vision_tokens, cfg.vision_layers, text_tower=False
        )
    return params


def vision_encoder(params: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, H, W, 3], already normalised, any float dtype.

    Returns [B, embed_dim] (un-normalised features).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    x = patchify(images.astype(dt), cfg.vision_patch_size)
    x = x @ params["patch_embed"]["kernel"].astype(dt)  # [B, T-1, W]
    cls = jnp.broadcast_to(params["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)  # [B, T, W]
    if cfg.use_transformer:
        x = x + params["pos_embedding"].astype(dt)
    x = layer_norm(params["ln_pre"], x)

    pipeline = _pipeline_of(cfg)
    if cfg.use_transformer:
        x = transformer_tower(
            params["tower"], x, cfg.vision_heads, mask=None, remat=cfg.remat,
            model_axis=cfg.model_axis, pipeline=pipeline, remat_policy=cfg.remat_policy,
        )
    else:
        x = mixer_tower(
            params["tower"], x, remat=cfg.remat, model_axis=cfg.model_axis,
            fused_mlp=cfg.fused_mlp, pipeline=pipeline, remat_policy=cfg.remat_policy,
        )

    x = layer_norm(params["ln_post"], x[:, 0, :])  # CLS token only (model.py:285)
    return x @ params["proj"].astype(dt)


def init_text_encoder(key, cfg: CLIPConfig) -> Dict:
    keys = jax.random.split(key, 4)
    width = cfg.text_width
    params: Dict = {
        # std 0.02 (reference model.py:363)
        "token_embedding": 0.02 * jax.random.normal(keys[0], (cfg.vocab_size, width), jnp.float32),
        "ln_final": init_layer_norm(width),
        # std width^-0.5 (reference model.py:395-396)
        "projection": (width**-0.5) * jax.random.normal(keys[1], (width, cfg.embed_dim), jnp.float32),
    }
    if cfg.use_transformer:
        # std 0.01 (reference model.py:364)
        params["pos_embedding"] = 0.01 * jax.random.normal(
            keys[2], (cfg.context_length, width), jnp.float32
        )
        params["tower"] = init_transformer_tower(keys[3], width, cfg.text_layers, text_tower=True)
    else:
        params["tower"] = init_mixer_tower(
            keys[3], width, cfg.context_length, cfg.text_layers, text_tower=True
        )
    return params


def text_encoder(params: Dict, cfg: CLIPConfig, text: jnp.ndarray) -> jnp.ndarray:
    """text: int32 [B, context_length]. Returns [B, embed_dim]."""
    dt = jnp.dtype(cfg.compute_dtype)
    x = jnp.take(params["token_embedding"], text, axis=0).astype(dt)  # [B, T, W]
    pipeline = _pipeline_of(cfg)
    if cfg.use_transformer:
        x = x + params["pos_embedding"].astype(dt)
        x = transformer_tower(
            params["tower"],
            x,
            cfg.text_heads,
            mask=causal_mask(cfg.context_length),
            remat=cfg.remat,
            model_axis=cfg.model_axis,
            pipeline=pipeline,
            remat_policy=cfg.remat_policy,
        )
    else:
        x = mixer_tower(
            params["tower"], x, remat=cfg.remat, model_axis=cfg.model_axis,
            fused_mlp=cfg.fused_mlp, pipeline=pipeline, remat_policy=cfg.remat_policy,
        )
    x = layer_norm(params["ln_final"], x).astype(dt)
    # EOT pooling: feature at argmax token id (eot=49407 is the max id).
    eot_idx = jnp.argmax(text, axis=-1)  # [B]
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]  # [B, W]
    return pooled @ params["projection"].astype(dt)
