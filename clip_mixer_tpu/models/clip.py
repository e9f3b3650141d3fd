"""Top-level CLIP model: init, encode_image / encode_text, forward.

Mirrors reference model.py:293-442. ``forward`` returns the triple
(image_features_l2normalised, text_features_l2normalised, exp(logit_scale)) —
the reference deliberately returns features instead of logits because the
logits matrix is built AFTER the cross-device feature gather in the train loop
(model.py:438-442, training.py:158-163). ``logits()`` is the convenience path
for the README zero-shot demo.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import towers
from clip_mixer_tpu.models import resnet as resnet_mod


def init(key: jax.Array, cfg: CLIPConfig) -> Dict:
    """Random-init parameter pytree (float32 masters)."""
    kv, kt = jax.random.split(key)
    if cfg.is_resnet:
        visual = resnet_mod.init_resnet(kv, cfg)
    else:
        visual = towers.init_vision_encoder(kv, cfg)
    params = {
        "visual": visual,
        "text": towers.init_text_encoder(kt, cfg),
        # ln(1/0.07), reference model.py:347; kept f32 always.
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }
    if cfg.logit_bias_init is not None:
        # Learnable pairwise-sigmoid bias (SigLIP loss; no reference
        # counterpart). Scalar — every sharding/decay rule replicates it.
        params["logit_bias"] = jnp.asarray(cfg.logit_bias_init, jnp.float32)
    return params


def encode_image(params: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    if cfg.is_resnet:
        return resnet_mod.resnet_encoder(params["visual"], cfg, images)
    return towers.vision_encoder(params["visual"], cfg, images)


def encode_text(params: Dict, cfg: CLIPConfig, text: jnp.ndarray) -> jnp.ndarray:
    return towers.text_encoder(params["text"], cfg, text)


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    # Norm in f32 for bf16 stability, result in input dtype.
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / n).astype(x.dtype)


def forward(
    params: Dict, cfg: CLIPConfig, images: jnp.ndarray, text: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The reference CLIP.forward triple (model.py:428-442)."""
    img = l2_normalize(encode_image(params, cfg, images))
    txt = l2_normalize(encode_text(params, cfg, text))
    return img, txt, jnp.exp(params["logit_scale"])


def forward_train(
    params: Dict,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    text: jnp.ndarray,
    axis_name: str | None = None,
    bn_eval: bool = False,
):
    """Training forward. Returns (img, txt, scale, bn_stats): bn_stats is {}
    for BN-free towers (mixer/transformer) and the per-site batch moments for
    the ResNet tower (batch-stat / SyncBN normalisation, to be merged into
    the running stats after the optimizer step — resnet.apply_bn_updates).

    ``bn_eval``: run a ResNet vision tower in INFERENCE mode (pretrained
    running stats, no new moments) — the train steps set it when the visual
    tower is frozen (TrainConfig.freeze='visual'): a locked tower must both
    keep its BN buffers bitwise and normalise with them, torch
    ``module.eval()`` semantics (LiT's locked image tower)."""
    if cfg.is_resnet and not bn_eval:
        feats, bn_stats = resnet_mod.resnet_encoder_train(
            params["visual"], cfg, images, axis_name=axis_name
        )
        img = l2_normalize(feats)
    else:
        img = l2_normalize(encode_image(params, cfg, images))
        bn_stats = {}
    txt = l2_normalize(encode_text(params, cfg, text))
    return img, txt, jnp.exp(params["logit_scale"]), bn_stats


def logits(
    params: Dict, cfg: CLIPConfig, images: jnp.ndarray, text: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logits_per_image, logits_per_text) — the OpenAI-CLIP demo contract."""
    img, txt, scale = forward(params, cfg, images, text)
    per_image = scale * img.astype(jnp.float32) @ txt.astype(jnp.float32).T
    return per_image, per_image.T


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def tower_param_counts(params: Dict, cfg: CLIPConfig) -> Tuple[int, int]:
    """(text_encoder_params, visual_params) as the reference prints them
    (model.py:349-358: text = tower + text_projection + token_embedding
    [+ pos_embedding]; visual = whole visual module)."""
    t = params["text"]
    text_n = param_count(t["tower"]) + t["projection"].size + t["token_embedding"].size
    if cfg.use_transformer:
        text_n += t["pos_embedding"].size
    return text_n, param_count(params["visual"])
