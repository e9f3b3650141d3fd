"""Zero-shot classification machinery (prompt-ensemble classifier + top-k).

Reference: ImageNetValidator.zeroshot_classifier / validate
(validation.py:119-179): per class, encode the 80 filled templates, L2-norm,
mean, re-norm, stack into W; then logits = 100 * image_features @ W and
top-1/top-5 accumulation.

TPU-native: instead of 1000 separate encode_text calls of batch 80 (the
reference's loop), ALL class*template prompts are tokenized once and run
through a single jitted encode_text in large fixed-shape batches (one compile,
full MXU occupancy), then reduced per class. Same math, ~orders faster.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.text import tokenize


import functools


@functools.lru_cache(maxsize=8)
def _jit_text_encoder(cfg: CLIPConfig):
    """One cached compiled encoder per config — a fresh jit(lambda) per call
    would recompile the full text tower on every validator invocation."""
    return jax.jit(lambda p, t: clip_model.encode_text(p, cfg, t))


def encode_texts_batched(
    params,
    cfg: CLIPConfig,
    tokens: np.ndarray,
    batch_size: int = 1024,
    normalize: bool = True,
) -> np.ndarray:
    """Run [N, 77] tokens through jitted encode_text in fixed-shape batches
    (last batch zero-padded so there is exactly one compiled shape)."""
    encode = _jit_text_encoder(cfg)
    n = tokens.shape[0]
    out: List[np.ndarray] = []
    for i in range(0, n, batch_size):
        chunk = tokens[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)])
        feats = np.asarray(encode(params, jnp.asarray(chunk)), np.float32)
        out.append(feats[: batch_size - pad])
    feats = np.concatenate(out)
    if normalize:
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


@functools.lru_cache(maxsize=8)
def _jit_image_encoder(cfg: CLIPConfig):
    """Cached compiled image encoder per config (same rationale as
    _jit_text_encoder): uint8 in, L2-normalised f32 features out."""
    from clip_mixer_tpu.ops.preprocess import normalize_images

    @jax.jit
    def encode(p, images_u8):
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        feats = clip_model.encode_image(p, cfg, images)
        return clip_model.l2_normalize(feats).astype(jnp.float32)

    return encode


def encode_images_batched(
    params,
    cfg: CLIPConfig,
    images_u8: np.ndarray,
    batch_size: int = 256,
) -> np.ndarray:
    """Run [N, H, W, 3] uint8 images through the jitted encoder in
    fixed-shape batches (last batch zero-padded: one compiled shape),
    returning L2-normalised f32 features."""
    encode = _jit_image_encoder(cfg)
    n = images_u8.shape[0]
    out: List[np.ndarray] = []
    for i in range(0, n, batch_size):
        chunk = images_u8[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        feats = np.asarray(encode(params, jnp.asarray(chunk)), np.float32)
        out.append(feats[: batch_size - pad])
    return np.concatenate(out)


def build_zeroshot_classifier(
    params,
    cfg: CLIPConfig,
    classnames: Sequence[str],
    templates: Sequence[str],
    batch_size: int = 1024,
) -> np.ndarray:
    """Returns W: [embed_dim, n_classes] — norm(mean(norm(encode(prompts))))
    per class (validation.py:129-133)."""
    prompts = [t.format(c) for c in classnames for t in templates]
    tokens = tokenize(prompts, cfg.context_length, truncate=True)
    feats = encode_texts_batched(params, cfg, tokens, batch_size)  # [C*T, D]
    feats = feats.reshape(len(classnames), len(templates), -1)
    class_emb = feats.mean(axis=1)
    class_emb /= np.linalg.norm(class_emb, axis=-1, keepdims=True)
    return class_emb.T.astype(np.float32)  # [D, C]


@functools.lru_cache(maxsize=8)
def _jit_image_classifier(cfg: CLIPConfig):
    """Cached per config; classifier weights are an argument so rebuilding
    the zero-shot head every validation round never recompiles the tower."""
    from clip_mixer_tpu.ops.preprocess import normalize_images

    @jax.jit
    def classify(p, images_u8, w):
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        feats = clip_model.encode_image(p, cfg, images)
        feats = clip_model.l2_normalize(feats).astype(jnp.float32)
        return 100.0 * feats @ w

    return classify


def make_image_classifier(params, cfg: CLIPConfig, classifier_weights: np.ndarray) -> Callable:
    """uint8 images [B, H, W, 3] -> class logits (100 * normalised feats @ W,
    validation.py:162); normalisation happens in-graph like the train loop."""
    classify = _jit_image_classifier(cfg)
    w = jnp.asarray(classifier_weights)
    return lambda images_u8: classify(params, images_u8, w)


def topk_accuracy(logits: np.ndarray, targets: np.ndarray, ks: Tuple[int, ...] = (1, 5)) -> List[float]:
    """Fraction correct at each k (validation.py:136-139 semantics)."""
    order = np.argsort(-logits, axis=-1)
    out = []
    for k in ks:
        hit = (order[:, :k] == targets[:, None]).any(axis=1)
        out.append(float(hit.mean()))
    return out


def zero_shot_eval(
    params,
    cfg: CLIPConfig,
    classnames: Sequence[str],
    templates: Sequence[str],
    image_batches,
    batch_size: int = 256,
) -> dict:
    """Full zero-shot pipeline over an iterable of (uint8 images [B,H,W,3],
    int targets [B]) batches. Returns {"top1": %, "top5": %}."""
    w = build_zeroshot_classifier(params, cfg, classnames, templates)
    classify = make_image_classifier(params, cfg, w)
    top1 = top5 = n = 0.0
    for images, targets in image_batches:
        images = np.asarray(images)
        b = images.shape[0]
        pad = (-b) % batch_size
        if pad:
            images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        logits = np.asarray(classify(jnp.asarray(images)))[:b]
        a1, a5 = topk_accuracy(logits, np.asarray(targets), (1, 5))
        top1 += a1 * b
        top5 += a5 * b
        n += b
    if n == 0:
        raise ValueError("image_batches yielded no batches")
    return {"top1": 100.0 * top1 / n, "top5": 100.0 * top5 / n}
