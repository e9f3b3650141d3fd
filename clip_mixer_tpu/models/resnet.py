"""ModifiedResNet vision tower (reference model.py:12-163), NHWC/XLA-native.

OpenAI CLIP's ResNet: 3-conv stem with avgpool, anti-aliased strided
bottlenecks (avgpool before every stride-2 conv), and QKV attention pooling
with a mean-token query. Needed to load/evaluate the RN* checkpoints
(build_model dispatches on the ``visual.proj`` key, reference model.py:470-485).

Inference uses running-stat BatchNorm; training uses batch stats (SyncBN
across a mesh axis) via :func:`resnet_encoder_train`, with running-stat EMA
merges through :func:`apply_bn_updates` — torch nn.BatchNorm2d semantics, the
machinery behind the reference's SyncBatchNorm conversion (training.py:91).
Convolutions run NHWC via lax.conv_general_dilated so XLA tiles them onto the
MXU directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig

_DN = ("NHWC", "HWIO", "NHWC")


def conv(params: Dict, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=_DN,
    )


def batch_norm(
    params: Dict,
    x: jnp.ndarray,
    eps: float = 1e-5,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """BatchNorm with f32 internals.

    train=False: running statistics (inference). train=True: batch statistics
    over (N, H, W); with ``axis_name`` the moments are additionally averaged
    across that mesh axis — the SyncBatchNorm equivalent (the reference
    converts its towers with nn.SyncBatchNorm, training.py:91; vestigial for
    ViT/Mixer but required if the RN tower is ever trained data-parallel).
    Running-stat updates are the caller's concern (returned via
    :func:`batch_moments` when training); this fn only normalises.
    """
    if train:
        mean, var = batch_moments(x, axis_name)
    else:
        mean, var = params["mean"], params["var"]
    return _bn_normalize(x, mean, var, params["scale"], params["bias"], eps)


def _bn_normalize(x, mean, var, scale, bias, eps: float = 1e-5) -> jnp.ndarray:
    """The one BN normalize (f32 internals) shared by batch_norm and the
    training path's bn_train — keep the numerics in a single place."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    return ((x32 - mean) * inv * scale + bias).astype(x.dtype)


def batch_moments(x: jnp.ndarray, axis_name: Optional[str] = None):
    """(mean, var) over (N, H, W), optionally cross-replica — for running-stat
    EMA updates when training a BN tower."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    mean_sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    return mean, mean_sq - jnp.square(mean)


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _init_conv(key, kh, kw, cin, cout) -> Dict:
    bound = (cin * kh * kw) ** -0.5
    return {"kernel": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -bound, bound)}


def _init_bn(c, zero_scale: bool = False) -> Dict:
    return {
        "scale": jnp.zeros((c,), jnp.float32) if zero_scale else jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def bottleneck(params: Dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Anti-aliased bottleneck (reference model.py:12-61): all convs stride 1;
    when stride>1 an avgpool follows conv2, and the downsample path is
    avgpool -> 1x1 conv."""
    out = jax.nn.relu(batch_norm(params["bn1"], conv(params["conv1"], x)))
    out = jax.nn.relu(batch_norm(params["bn2"], conv(params["conv2"], out, padding=1)))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(params["bn3"], conv(params["conv3"], out))

    identity = x
    if "downsample" in params:
        identity = x if stride == 1 else avg_pool(x, stride)
        identity = batch_norm(params["downsample"]["bn"], conv(params["downsample"]["conv"], identity))
    return jax.nn.relu(out + identity)


def _init_bottleneck(key, inplanes: int, planes: int, stride: int) -> Dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, 1, inplanes, planes),
        "bn1": _init_bn(planes),
        "conv2": _init_conv(ks[1], 3, 3, planes, planes),
        "bn2": _init_bn(planes),
        "conv3": _init_conv(ks[2], 1, 1, planes, planes * 4),
        # bn3 scale zero-init (reference model.py:374-377)
        "bn3": _init_bn(planes * 4, zero_scale=True),
    }
    if stride > 1 or inplanes != planes * 4:
        p["downsample"] = {
            "conv": _init_conv(ks[3], 1, 1, inplanes, planes * 4),
            "bn": _init_bn(planes * 4),
        }
    return p


def attention_pool(params: Dict, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """QKV attention pooling with mean-token query (reference model.py:65-100).

    x: [B, H, W, C] -> [B, output_dim].
    """
    B, H, W, C = x.shape
    dt = x.dtype
    tokens = x.reshape(B, H * W, C)
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)  # [B,HW+1,C]
    tokens = tokens + params["pos_embedding"].astype(dt)

    q = tokens[:, :1] @ params["q"]["kernel"].astype(dt) + params["q"]["bias"].astype(dt)
    k = tokens @ params["k"]["kernel"].astype(dt) + params["k"]["bias"].astype(dt)
    v = tokens @ params["v"]["kernel"].astype(dt) + params["v"]["bias"].astype(dt)

    hd = C // n_heads
    q = q.reshape(B, 1, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, n_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd**-0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(B, C)
    return out @ params["c"]["kernel"].astype(dt) + params["c"]["bias"].astype(dt)


def init_resnet(key, cfg: CLIPConfig) -> Dict:
    layers = cfg.vision_layers
    width = cfg.vision_width
    embed_dim_out = cfg.embed_dim
    # 3 stem convs + one key per bottleneck + attnpool draws. Keep the split
    # at >= 64 so existing geometries' init stays bit-identical (a split
    # count change changes every key); deeper stacks (RN50x64 has 64
    # bottlenecks) grow past the old fixed 64 instead of StopIteration.
    keys = iter(jax.random.split(key, max(64, 3 + sum(layers) + 8)))

    params: Dict = {
        "conv1": _init_conv(next(keys), 3, 3, 3, width // 2),
        "bn1": _init_bn(width // 2),
        "conv2": _init_conv(next(keys), 3, 3, width // 2, width // 2),
        "bn2": _init_bn(width // 2),
        "conv3": _init_conv(next(keys), 3, 3, width // 2, width),
        "bn3": _init_bn(width),
    }
    inplanes = width
    for li, (planes_mult, blocks) in enumerate(zip((1, 2, 4, 8), layers)):
        planes = width * planes_mult
        stride = 1 if li == 0 else 2
        stage = []
        for b in range(blocks):
            stage.append(_init_bottleneck(next(keys), inplanes, planes, stride if b == 0 else 1))
            inplanes = planes * 4
        params[f"layer{li + 1}"] = stage

    embed_dim = width * 32
    spacial = cfg.image_resolution // 32
    # attnpool projections: normal std C^-0.5 (reference model.py:366-372)
    std = embed_dim**-0.5

    def lin(k, dout):
        kw, kb = jax.random.split(k)
        return {
            "kernel": std * jax.random.normal(kw, (embed_dim, dout), jnp.float32),
            "bias": jnp.zeros((dout,), jnp.float32),
        }

    params["attnpool"] = {
        "pos_embedding": (embed_dim**-0.5)
        * jax.random.normal(next(keys), (spacial**2 + 1, embed_dim), jnp.float32),
        "q": lin(next(keys), embed_dim),
        "k": lin(next(keys), embed_dim),
        "v": lin(next(keys), embed_dim),
        "c": lin(next(keys), embed_dim_out),
    }
    return params


def resnet_encoder(params: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, H, W, 3] normalised. Returns [B, embed_dim]."""
    dt = jnp.dtype(cfg.compute_dtype)
    x = images.astype(dt)
    x = jax.nn.relu(batch_norm(params["bn1"], conv(params["conv1"], x, stride=2, padding=1)))
    x = jax.nn.relu(batch_norm(params["bn2"], conv(params["conv2"], x, padding=1)))
    x = jax.nn.relu(batch_norm(params["bn3"], conv(params["conv3"], x, padding=1)))
    x = avg_pool(x, 2)
    for li, blocks in enumerate([params["layer1"], params["layer2"], params["layer3"], params["layer4"]]):
        for b, bp in enumerate(blocks):
            stride = (1 if li == 0 else 2) if b == 0 else 1
            x = bottleneck(bp, x, stride)
    return attention_pool(params["attnpool"], x, cfg.vision_heads)


def resnet_encoder_train(
    params: Dict, cfg: CLIPConfig, images: jnp.ndarray, axis_name: Optional[str] = None
):
    """Training forward: batch-stat BatchNorm (SyncBN across ``axis_name``)
    plus the per-site batch moments needed for running-stat EMA updates.

    Returns ``(features, bn_stats)``: bn_stats mirrors the params tree at the
    BN leaves with {"mean", "var", "n"} per site (n = per-replica element
    count, for torch's unbiased running-var correction). Merge into params
    with :func:`apply_bn_updates` after the optimizer step — the torch
    semantics the reference relies on implicitly via nn.BatchNorm2d
    (training.py:91 SyncBatchNorm conversion).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    stats: Dict = {}

    def bn_train(bnp, x, slot: Dict, key: str):
        mean, var = batch_moments(x, axis_name)
        n = jnp.asarray(x.shape[0] * x.shape[1] * x.shape[2], jnp.float32)
        if axis_name is not None:  # SyncBN: global element count
            n = n * jax.lax.psum(jnp.float32(1.0), axis_name)
        slot[key] = {"mean": mean, "var": var, "n": n}
        return _bn_normalize(x, mean, var, bnp["scale"], bnp["bias"])

    def block_fn(bp, x, stride):
        """One bottleneck; returns (activations, bn batch stats)."""
        bstats: Dict = {}
        out = jax.nn.relu(bn_train(bp["bn1"], conv(bp["conv1"], x), bstats, "bn1"))
        out = jax.nn.relu(bn_train(bp["bn2"], conv(bp["conv2"], out, padding=1), bstats, "bn2"))
        if stride > 1:
            out = avg_pool(out, stride)
        out = bn_train(bp["bn3"], conv(bp["conv3"], out), bstats, "bn3")
        identity = x
        if "downsample" in bp:
            identity = x if stride == 1 else avg_pool(x, stride)
            ds: Dict = {}
            identity = bn_train(bp["downsample"]["bn"], conv(bp["downsample"]["conv"], identity), ds, "bn")
            bstats["downsample"] = ds
        return jax.nn.relu(out + identity), bstats

    if cfg.remat:
        # Per-bottleneck rematerialisation: only block INPUTS stay live for
        # the backward (the stored conv pyramid is what makes un-rematted
        # RN50x64 training not fit one 16GB chip — utils/memory.plan). The
        # bn_stats ride through jax.checkpoint as ordinary outputs. stride
        # is static per call site, so it stays a closure, not an operand.
        block_fn = jax.checkpoint(block_fn, static_argnums=(2,))

    x = images.astype(dt)
    x = jax.nn.relu(bn_train(params["bn1"], conv(params["conv1"], x, stride=2, padding=1), stats, "bn1"))
    x = jax.nn.relu(bn_train(params["bn2"], conv(params["conv2"], x, padding=1), stats, "bn2"))
    x = jax.nn.relu(bn_train(params["bn3"], conv(params["conv3"], x, padding=1), stats, "bn3"))
    x = avg_pool(x, 2)
    for li in range(4):
        stage_stats = []
        for b, bp in enumerate(params[f"layer{li + 1}"]):
            stride = (1 if li == 0 else 2) if b == 0 else 1
            x, bstats = block_fn(bp, x, stride)
            stage_stats.append(bstats)
        stats[f"layer{li + 1}"] = stage_stats
    return attention_pool(params["attnpool"], x, cfg.vision_heads), stats


def apply_bn_updates(visual_params: Dict, bn_stats: Dict, momentum: float = 0.1) -> Dict:
    """EMA-merge batch moments into the running stats (new tree returned).

    torch nn.BatchNorm2d semantics: running = (1 - m) * running + m * batch,
    with the running VAR updated from the UNBIASED batch variance
    (var * n / (n - 1)). Gradients never flow here — call after the
    optimizer step on the updated params.
    """

    def merge(node, stats):
        if isinstance(node, list):
            return [merge(c, s) for c, s in zip(node, stats)]
        out = dict(node)
        for k, s in stats.items():
            if isinstance(s, list):  # a stage: list of per-block stat dicts
                out[k] = merge(out[k], s)
            elif set(s.keys()) == {"mean", "var", "n"}:  # a BN site
                bn = dict(out[k])
                n = s["n"]
                unbiased = s["var"] * (n / jnp.maximum(n - 1.0, 1.0))
                bn["mean"] = (1.0 - momentum) * bn["mean"] + momentum * s["mean"]
                bn["var"] = (1.0 - momentum) * bn["var"] + momentum * unbiased
                out[k] = bn
            else:
                out[k] = merge(out[k], s)
        return out

    return merge(visual_params, bn_stats)
