"""int8 quantized inference path (W8A8) for serving.

v5e's MXU runs int8 x int8 -> int32 at ~2x bf16 peak (measured: 329 vs 193
TOP/s on the channel-mix shape). This module quantizes the FLOPs-dominant
matmuls — patchify embed and channel-mix in/out (mixer) or QKV/out + MLPs
(transformer) — with symmetric per-output-channel weight scales. Token
mixes (~11% of FLOPs but MXU-padding-bound at K=50, no int8 win), LayerNorms,
residuals, and the FINAL PROJECTIONS stay bf16/f32: the projection is ~0.01%
of FLOPs but was measured (full-size, 768-image gate set) to contribute ~46%
of the int8 feature error — quantizing it costs accuracy for no speed.

Activation scales come in two flavours:

* **static (calibrated)** — :func:`calibrate_vision_tower` measures a high
  quantile of |activation| per quantisation site on sample batches; the
  runtime quant is then pure elementwise and fuses into the producing op.
  Measured end-to-end on v5e: **33.8k imgs/sec/chip vs 22.4k bf16 (+51%)**,
  passing the noise-floor top-1 gate (evals/quant_gate.py) with flip ratio
  1.00 — int8 adds zero top-1 instability beyond bf16's own numerics.
* **dynamic (per-row max)** — no calibration needed, slightly higher
  fidelity, but the per-row reductions cost more than the int8 matmuls save
  (measured ~21.5k imgs/s — SLOWER than bf16); kept for accuracy reference.

This is a SERVING optimisation, not a training path: quantize once with
:func:`quantize_vision_tower` (+ calibrate), then call
:func:`encode_image_q`. The 0.1%-top-1 gate applies when real eval data is
available; offline fidelity is pinned by feature-cosine tests.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models.layers import layer_norm, quick_gelu
from clip_mixer_tpu.models.towers import patchify


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] float -> int8 with per-output-channel symmetric scales."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def int8_matmul(
    x: jnp.ndarray,
    wq: Dict[str, jnp.ndarray],
    x_scale=None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y = x @ dequant(wq) computed as int8 x int8 -> int32.

    x_scale None -> dynamic symmetric per-row quantisation; a scalar (static,
    calibrated) -> pure-elementwise quantisation that fuses into the producer.
    x: [..., in]."""
    x32 = x.astype(jnp.float32)
    if x_scale is None:
        x_scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * wq["scale"]).astype(out_dtype)


def quantize_vision_tower(params: Dict, cfg: CLIPConfig, a_scales: Dict | None = None) -> Dict:
    """Quantize the Mixer vision tower's heavy matmuls. Returns a new params
    tree where channel_mix w_in/w_out and patch_embed are int8 packs;
    everything else is shared by reference. The final projection stays bf16:
    it is ~0.01% of the FLOPs but (measured, full-size) ~46% of the int8
    feature error — quantizing it costs accuracy for no speed. Pass
    ``a_scales`` from :func:`calibrate_vision_tower` for the fast
    static-scale mode."""
    assert not cfg.use_transformer and not cfg.is_resnet, "int8 path implemented for the mixer tower"
    v = params["visual"]
    blocks = v["tower"]["blocks"]
    qv = dict(v)
    qv["patch_embed"] = {"kernel_q": quantize_weight(v["patch_embed"]["kernel"])}
    qblocks = dict(blocks)
    qblocks["channel_mix"] = {
        "w_in_q": jax.vmap(quantize_weight)(blocks["channel_mix"]["w_in"]),
        "b_in": blocks["channel_mix"]["b_in"],
        "w_out_q": jax.vmap(quantize_weight)(blocks["channel_mix"]["w_out"]),
        "b_out": blocks["channel_mix"]["b_out"],
    }
    qv["tower"] = {"blocks": qblocks}
    if a_scales is not None:
        qv["a_scales"] = a_scales
    out = dict(params)
    out["visual"] = qv
    return out


def _mixer_block_q(p: Dict, x: jnp.ndarray, a_scales=None) -> jnp.ndarray:
    from clip_mixer_tpu.models.mixer import token_mix

    dt = x.dtype
    s_in = a_scales["ch_in"] if a_scales is not None else None
    s_hidden = a_scales["ch_hidden"] if a_scales is not None else None
    x = x + token_mix(p, x)  # bf16 (small)
    # channel mix: int8
    y = layer_norm(p["ln_channel"], x)
    cm = p["channel_mix"]
    h = int8_matmul(y, cm["w_in_q"], s_in, dt) + cm["b_in"].astype(dt)
    h = quick_gelu(h)
    return x + int8_matmul(h, cm["w_out_q"], s_hidden, dt) + cm["b_out"].astype(dt)


def _mixer_q_tail(v: Dict, cfg: CLIPConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Shared mixer-tower tail after the patch embed: cls concat, ln_pre,
    int8 block scan, ln_post, (bf16) projection. x: [B, tokens-1, width]."""
    dt = jnp.dtype(cfg.compute_dtype)
    a = v.get("a_scales")
    cls = jnp.broadcast_to(v["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = layer_norm(v["ln_pre"], x)

    def step(h, args):
        lp, scales = args
        return _mixer_block_q(lp, h, scales), None

    layer_scales = (
        {"ch_in": a["ch_in"], "ch_hidden": a["ch_hidden"]} if a else None
    )
    x, _ = jax.lax.scan(step, x, (v["tower"]["blocks"], layer_scales))
    x = layer_norm(v["ln_post"], x[:, 0, :])
    return x @ v["proj"].astype(dt)  # bf16 by design (see quantize_vision_tower)


def encode_image_q(qparams: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """int8 mirror of towers.vision_encoder. images: normalised [B, H, W, 3].

    Uses calibrated static activation scales when the qparams carry an
    "a_scales" entry (from calibrate_vision_tower); dynamic per-row scales
    otherwise."""
    dt = jnp.dtype(cfg.compute_dtype)
    v = qparams["visual"]
    a = v.get("a_scales")
    x = patchify(images.astype(dt), cfg.vision_patch_size)
    x = int8_matmul(x, v["patch_embed"]["kernel_q"], a["patch"] if a else None, dt)
    return _mixer_q_tail(v, cfg, x)


# --------------------------------------------------------------------------
# Planar fused front-end: resize + normalize + quantize + patchify as one
# int8-emitting graph (the serving/bench path from raw dataset-native uint8).
#
# Why planar: the NHWC resize's second einsum ("pw,bowc->bopc") contracts w
# with the output channel axis c=3 — a [n_px, src] @ [src, 3] matmul whose
# N=3 fills 3/128 MXU lanes. Transposing the uint8 input to [B, 3, H, W]
# once (cheap bytes) makes BOTH resize contractions clean [*, src] @
# [src, n_px] matmuls (N = n_px). Measured at B=512 Mixer-B/32 on v5e
# (scripts/bench_frontend_variants.py, median of 3 chains): e2e int8
# 14.72ms vs 15.08ms shipped (+2.4%), identical feature cosine vs the f32
# reference front-end (0.999889 both). Losing alternatives, measured: bf16
# in NHWC layout 15.12ms (dtype was not the problem, the N=3 axis was);
# int8 resize matmuls 15.28ms (the inter-pass requantize costs more than
# s8 saves at these shapes — same finding as the K=50 token-mix); folding
# the transpose into the first einsum's output layout ties (14.74ms), so
# the explicit uint8 relayout is free.
# --------------------------------------------------------------------------


def patch_perm(patch: int):
    """Row permutation mapping models.towers.patchify's (ph, pw, c) patch
    vector order to the (c, ph, pw) order the planar front-end emits:
    ``kernel_planar = kernel[patch_perm(p), :]``."""
    import numpy as np

    return np.arange(patch * patch * 3).reshape(patch, patch, 3).transpose(2, 0, 1).reshape(-1)


def make_planar_front_end(cfg: CLIPConfig, input_hw, patch_scale):
    """Build the fused serving front-end: uint8 NHWC [B, H, W, 3] -> int8
    c-major patches [B, (n_px/p)^2, 3*p*p], ready for
    :func:`encode_image_q_patches`.

    Channel-planar bf16 resize matmuls (PIL-parity weights from
    ops.preprocess, reference clip.py:76-87 semantics; uint8 -> bf16 is
    exact for 0..255), mean/std normalisation and the static patch-scale
    activation quantisation fused at the matmul output, patchify as an INT8
    reshape/transpose (1 byte/elem of relayout traffic instead of 2-4).
    ``patch_scale``: the calibrated "patch" entry of
    :func:`calibrate_vision_tower`'s scales.
    """
    import numpy as np

    from clip_mixer_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, _cached_matrices

    h, w = input_hw
    n_px = cfg.image_resolution
    p = cfg.vision_patch_size
    g = n_px // p
    rh_np, rw_np = _cached_matrices(h, w, n_px)
    rh = jnp.asarray(rh_np, jnp.bfloat16)
    rw = jnp.asarray(rw_np, jnp.bfloat16)
    mean = (jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0).reshape(1, 3, 1, 1)
    std_inv = (1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)).reshape(1, 3, 1, 1)

    def front_end(images_u8: jnp.ndarray) -> jnp.ndarray:
        B = images_u8.shape[0]
        x = images_u8.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # [B,3,H,W]
        x = jnp.einsum("oh,kchw->kcow", rh, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("pw,kcow->kcop", rw, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        x = (x - mean) * std_inv
        xq = jnp.clip(jnp.round(x / patch_scale), -127, 127).astype(jnp.int8)
        xq = xq.reshape(B, 3, g, p, g, p)
        xq = xq.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, c, ph, pw]
        return xq.reshape(B, g * g, 3 * p * p)

    return front_end


def encode_image_q_patches(qparams: Dict, cfg: CLIPConfig, patches_q: jnp.ndarray) -> jnp.ndarray:
    """encode_image_q's twin consuming :func:`make_planar_front_end` output:
    pre-quantized c-major int8 patches [B, tokens-1, 3*p*p]. The stored
    patch-embed kernel rows are gathered into c-major order in-graph (a
    constant-index gather XLA folds; artifacts/checkpoints keep the one
    (ph, pw, c) layout). Requires calibrated static scales ("a_scales")."""
    dt = jnp.dtype(cfg.compute_dtype)
    v = qparams["visual"]
    a = v["a_scales"]  # the front-end quantized with a["patch"] already
    kq = v["patch_embed"]["kernel_q"]
    acc = jax.lax.dot_general(
        patches_q,
        kq["q"][patch_perm(cfg.vision_patch_size), :],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    x = (acc.astype(jnp.float32) * a["patch"] * kq["scale"]).astype(dt)
    return _mixer_q_tail(v, cfg, x)


def _quantize_attn_blocks(blocks: Dict) -> Dict:
    """int8-pack a stacked transformer block tree: QKV, attention out, and
    MLP in/out are all plain matmuls; only the score/softmax math stays
    bf16."""
    return {
        "ln_1": blocks["ln_1"],
        "attn": {
            "qkv_q": jax.vmap(quantize_weight)(blocks["attn"]["qkv_kernel"]),
            "qkv_bias": blocks["attn"]["qkv_bias"],
            "out_q": jax.vmap(quantize_weight)(blocks["attn"]["out_kernel"]),
            "out_bias": blocks["attn"]["out_bias"],
        },
        "ln_2": blocks["ln_2"],
        "mlp": {
            "w_in_q": jax.vmap(quantize_weight)(blocks["mlp"]["w_in"]),
            "b_in": blocks["mlp"]["b_in"],
            "w_out_q": jax.vmap(quantize_weight)(blocks["mlp"]["w_out"]),
            "b_out": blocks["mlp"]["b_out"],
        },
    }


def _attention_block_q(p: Dict, x: jnp.ndarray, n_heads: int, mask, a=None) -> jnp.ndarray:
    """int8 ResidualAttentionBlock; ``a`` carries this layer's calibrated
    static activation scales (None -> dynamic per-row, measured SLOWER than
    bf16 — use calibrate_vit_vision_tower)."""
    from clip_mixer_tpu.models.transformer import attention_core

    dt = x.dtype
    g = lambda k: (a[k] if a is not None else None)
    y = layer_norm(p["ln_1"], x)
    qkv = int8_matmul(y, p["attn"]["qkv_q"], g("qkv_in"), dt) + p["attn"]["qkv_bias"].astype(dt)
    out = attention_core(qkv, n_heads, mask)
    x = x + int8_matmul(out, p["attn"]["out_q"], g("attn_out_in"), dt) + p["attn"]["out_bias"].astype(dt)

    y = layer_norm(p["ln_2"], x)
    h = int8_matmul(y, p["mlp"]["w_in_q"], g("mlp_in"), dt) + p["mlp"]["b_in"].astype(dt)
    h = quick_gelu(h)
    return x + int8_matmul(h, p["mlp"]["w_out_q"], g("mlp_hidden"), dt) + p["mlp"]["b_out"].astype(dt)


def quantize_vit_vision_tower(params: Dict, cfg: CLIPConfig, a_scales: Dict | None = None) -> Dict:
    """int8-pack a ViT (transformer) vision tower: patchify, QKV/out, MLPs,
    projection. Serves the converted OpenAI checkpoints faster. Pass
    ``a_scales`` from :func:`calibrate_vit_vision_tower` for the fast static
    mode."""
    assert cfg.use_transformer and not cfg.is_resnet
    v = params["visual"]
    qv = dict(v)
    qv["patch_embed"] = {"kernel_q": quantize_weight(v["patch_embed"]["kernel"])}
    qv["tower"] = {"blocks": _quantize_attn_blocks(v["tower"]["blocks"])}
    if a_scales is not None:
        qv["a_scales"] = a_scales
    out = dict(params)
    out["visual"] = qv
    return out


def encode_image_vit_q(qparams: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """int8 mirror of the ViT vision encoder. images: normalised [B,H,W,3]."""
    dt = jnp.dtype(cfg.compute_dtype)
    v = qparams["visual"]
    a = v.get("a_scales")
    x = patchify(images.astype(dt), cfg.vision_patch_size)
    x = int8_matmul(x, v["patch_embed"]["kernel_q"], a["patch"] if a else None, dt)
    cls = jnp.broadcast_to(v["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embedding"].astype(dt)
    x = layer_norm(v["ln_pre"], x)

    layer_scales = (
        {k: a[k] for k in ("qkv_in", "attn_out_in", "mlp_in", "mlp_hidden")} if a else None
    )

    def step(h, args):
        lp, scales = args
        return _attention_block_q(lp, h, cfg.vision_heads, None, scales), None

    x, _ = jax.lax.scan(step, x, (v["tower"]["blocks"], layer_scales))
    x = layer_norm(v["ln_post"], x[:, 0, :])
    return x @ v["proj"].astype(dt)  # bf16 by design (see quantize_vision_tower)


def calibrate_vit_vision_tower(
    params: Dict, cfg: CLIPConfig, sample_images: jnp.ndarray, quantile: float = 0.9999
) -> Dict:
    """Static activation scales for the ViT vision tower's quantisation
    sites: patchify input, per-layer qkv/attn-out/mlp-in/mlp-hidden."""
    assert cfg.use_transformer and not cfg.is_resnet

    dt = jnp.dtype(cfg.compute_dtype)
    v = params["visual"]

    def q(x):
        return jnp.quantile(jnp.abs(x.astype(jnp.float32)), quantile)

    x = patchify(sample_images.astype(dt), cfg.vision_patch_size)
    s_patch = q(x)
    x = x @ v["patch_embed"]["kernel"].astype(dt)
    cls = jnp.broadcast_to(v["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embedding"].astype(dt)
    x = layer_norm(v["ln_pre"], x)

    from clip_mixer_tpu.models.transformer import attention_core

    def step(h, lp):
        y1 = layer_norm(lp["ln_1"], h)
        # attention output before the out-projection (the attn_out_in site)
        # via the model's own attention_core — stats come from exactly the
        # forward being quantized.
        qkv = y1 @ lp["attn"]["qkv_kernel"].astype(dt) + lp["attn"]["qkv_bias"].astype(dt)
        ao = attention_core(qkv, cfg.vision_heads, None)
        h = h + ao @ lp["attn"]["out_kernel"].astype(dt) + lp["attn"]["out_bias"].astype(dt)
        y2 = layer_norm(lp["ln_2"], h)
        hid = quick_gelu(y2 @ lp["mlp"]["w_in"].astype(dt) + lp["mlp"]["b_in"].astype(dt))
        h = h + hid @ lp["mlp"]["w_out"].astype(dt) + lp["mlp"]["b_out"].astype(dt)
        return h, (q(y1), q(ao), q(y2), q(hid))

    x, (s_qkv, s_ao, s_mlp, s_hid) = jax.lax.scan(step, x, v["tower"]["blocks"])
    to_scale = lambda s: jnp.maximum(s / 127.0, 1e-8)
    return {
        "patch": to_scale(s_patch),
        "qkv_in": to_scale(s_qkv),
        "attn_out_in": to_scale(s_ao),
        "mlp_in": to_scale(s_mlp),
        "mlp_hidden": to_scale(s_hid),
    }


def quantize_vit_text_tower(params: Dict, cfg: CLIPConfig, a_scales: Dict | None = None) -> Dict:
    """int8-pack a transformer text tower (causal-masked, reference
    model.py:333-338): QKV/out and MLP matmuls per block plus the final
    text projection. Token + positional embeddings stay float lookups."""
    assert cfg.use_transformer
    t = params["text"]
    qt = dict(t)
    qt["tower"] = {"blocks": _quantize_attn_blocks(t["tower"]["blocks"])}
    if a_scales is not None:
        qt["a_scales"] = a_scales
    out = dict(params)
    out["text"] = qt
    return out


def encode_text_vit_q(qparams: Dict, cfg: CLIPConfig, text: jnp.ndarray) -> jnp.ndarray:
    """int8 mirror of towers.text_encoder in transformer mode (causal mask +
    EOT-argmax pooling, reference model.py:413-426). text: int32 [B, T]."""
    from clip_mixer_tpu.models.transformer import causal_mask

    dt = jnp.dtype(cfg.compute_dtype)
    t = qparams["text"]
    a = t.get("a_scales")
    x = jnp.take(t["token_embedding"], text, axis=0).astype(dt)
    x = x + t["pos_embedding"].astype(dt)
    mask = causal_mask(cfg.context_length)

    layer_scales = (
        {k: a[k] for k in ("qkv_in", "attn_out_in", "mlp_in", "mlp_hidden")} if a else None
    )

    def step(h, args):
        lp, scales = args
        return _attention_block_q(lp, h, cfg.text_heads, mask, scales), None

    x, _ = jax.lax.scan(step, x, (t["tower"]["blocks"], layer_scales))
    x = layer_norm(t["ln_final"], x).astype(dt)
    eot_idx = jnp.argmax(text, axis=-1)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return pooled @ t["projection"].astype(dt)  # bf16 by design


def calibrate_vit_text_tower(
    params: Dict, cfg: CLIPConfig, sample_text: jnp.ndarray, quantile: float = 0.9999
) -> Dict:
    """Static activation scales for the transformer text tower's sites:
    per-layer qkv/attn-out/mlp-in/mlp-hidden."""
    assert cfg.use_transformer
    from clip_mixer_tpu.models.transformer import causal_mask

    dt = jnp.dtype(cfg.compute_dtype)
    t = params["text"]
    mask = causal_mask(cfg.context_length)

    def q(x):
        return jnp.quantile(jnp.abs(x.astype(jnp.float32)), quantile)

    x = jnp.take(t["token_embedding"], sample_text, axis=0).astype(dt)
    x = x + t["pos_embedding"].astype(dt)

    from clip_mixer_tpu.models.transformer import attention_core

    def step(h, lp):
        y1 = layer_norm(lp["ln_1"], h)
        qkv = y1 @ lp["attn"]["qkv_kernel"].astype(dt) + lp["attn"]["qkv_bias"].astype(dt)
        ao = attention_core(qkv, cfg.text_heads, mask)
        h = h + ao @ lp["attn"]["out_kernel"].astype(dt) + lp["attn"]["out_bias"].astype(dt)
        y2 = layer_norm(lp["ln_2"], h)
        hid = quick_gelu(y2 @ lp["mlp"]["w_in"].astype(dt) + lp["mlp"]["b_in"].astype(dt))
        h = h + hid @ lp["mlp"]["w_out"].astype(dt) + lp["mlp"]["b_out"].astype(dt)
        return h, (q(y1), q(ao), q(y2), q(hid))

    x, (s_qkv, s_ao, s_mlp, s_hid) = jax.lax.scan(step, x, t["tower"]["blocks"])
    to_scale = lambda s: jnp.maximum(s / 127.0, 1e-8)
    return {
        "qkv_in": to_scale(s_qkv),
        "attn_out_in": to_scale(s_ao),
        "mlp_in": to_scale(s_mlp),
        "mlp_hidden": to_scale(s_hid),
    }


def quantize_text_tower(params: Dict, cfg: CLIPConfig, a_scales: Dict | None = None) -> Dict:
    """int8-pack the text mixer tower's channel mixes (the token embedding
    stays a lookup; token mixes AND the final projection stay bf16 — see the
    module docstring for the measured reasons)."""
    assert not cfg.use_transformer, "int8 path implemented for the mixer tower"
    t = params["text"]
    qt = dict(t)
    qblocks = dict(t["tower"]["blocks"])
    qblocks["channel_mix"] = {
        "w_in_q": jax.vmap(quantize_weight)(t["tower"]["blocks"]["channel_mix"]["w_in"]),
        "b_in": t["tower"]["blocks"]["channel_mix"]["b_in"],
        "w_out_q": jax.vmap(quantize_weight)(t["tower"]["blocks"]["channel_mix"]["w_out"]),
        "b_out": t["tower"]["blocks"]["channel_mix"]["b_out"],
    }
    qt["tower"] = {"blocks": qblocks}
    if a_scales is not None:
        qt["a_scales"] = a_scales
    out = dict(params)
    out["text"] = qt
    return out


def encode_text_q(qparams: Dict, cfg: CLIPConfig, text: jnp.ndarray) -> jnp.ndarray:
    """int8 mirror of towers.text_encoder (mixer mode). text: int32 [B, T]."""
    dt = jnp.dtype(cfg.compute_dtype)
    t = qparams["text"]
    a = t.get("a_scales")
    x = jnp.take(t["token_embedding"], text, axis=0).astype(dt)

    def step(h, args):
        lp, scales = args
        return _mixer_block_q(lp, h, scales), None

    layer_scales = {"ch_in": a["ch_in"], "ch_hidden": a["ch_hidden"]} if a else None
    x, _ = jax.lax.scan(step, x, (t["tower"]["blocks"], layer_scales))
    x = layer_norm(t["ln_final"], x).astype(dt)
    eot_idx = jnp.argmax(text, axis=-1)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return pooled @ t["projection"].astype(dt)  # bf16 by design


def calibrate_text_tower(
    params: Dict, cfg: CLIPConfig, sample_text: jnp.ndarray, quantile: float = 0.9999
) -> Dict:
    """Static activation scales for the text tower's quantisation sites."""
    assert not cfg.use_transformer, "int8 path implemented for the mixer tower"
    from clip_mixer_tpu.models.mixer import token_mix

    dt = jnp.dtype(cfg.compute_dtype)
    t = params["text"]

    def q(x):
        return jnp.quantile(jnp.abs(x.astype(jnp.float32)), quantile)

    x = jnp.take(t["token_embedding"], sample_text, axis=0).astype(dt)

    def step(h, lp):
        h = h + token_mix(lp, h)
        y = layer_norm(lp["ln_channel"], h)
        cm = lp["channel_mix"]
        hidden = quick_gelu(y @ cm["w_in"].astype(dt) + cm["b_in"].astype(dt))
        out = h + hidden @ cm["w_out"].astype(dt) + cm["b_out"].astype(dt)
        return out, (q(y), q(hidden))

    x, (s_in, s_hidden) = jax.lax.scan(step, x, t["tower"]["blocks"])
    to_scale = lambda s: jnp.maximum(s / 127.0, 1e-8)
    return {"ch_in": to_scale(s_in), "ch_hidden": to_scale(s_hidden)}


def calibrate_vision_tower(
    params: Dict,
    cfg: CLIPConfig,
    sample_images: jnp.ndarray,
    quantile: float = 0.9999,
) -> Dict:
    """Measure |activation| quantiles at each quantisation site on sample
    (normalised) images and return per-site static scales:
    {"patch": (), "ch_in": [L], "ch_hidden": [L]} with scale = quantile/127.
    Attach via quantize_vision_tower(..., a_scales=...).
    """
    assert not cfg.use_transformer and not cfg.is_resnet, "int8 path implemented for the mixer tower"
    dt = jnp.dtype(cfg.compute_dtype)
    v = params["visual"]

    def q(x):
        return jnp.quantile(jnp.abs(x.astype(jnp.float32)), quantile)

    x = patchify(sample_images.astype(dt), cfg.vision_patch_size)
    s_patch = q(x)
    x = x @ v["patch_embed"]["kernel"].astype(dt)
    cls = jnp.broadcast_to(v["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = layer_norm(v["ln_pre"], x)

    from clip_mixer_tpu.models.mixer import token_mix

    def step(h, lp):
        # stats at the two channel-mix sites, computing each part once
        h = h + token_mix(lp, h)
        y = layer_norm(lp["ln_channel"], h)
        cm = lp["channel_mix"]
        hidden = quick_gelu(y @ cm["w_in"].astype(dt) + cm["b_in"].astype(dt))
        out = h + hidden @ cm["w_out"].astype(dt) + cm["b_out"].astype(dt)
        return out, (q(y), q(hidden))

    x, (s_in, s_hidden) = jax.lax.scan(step, x, v["tower"]["blocks"])
    to_scale = lambda s: jnp.maximum(s / 127.0, 1e-8)
    return {
        "patch": to_scale(s_patch),
        "ch_in": to_scale(s_in),
        "ch_hidden": to_scale(s_hidden),
    }


# --------------------------------------------------------------------------
# ResNet tower (W8A8 convolutions with folded BatchNorm)
#
# The RN* presets exist to load/eval OpenAI RN checkpoints (reference
# model.py:12-163; build_model dispatch model.py:470-485). Serving-path
# quantisation: every conv's BatchNorm is FOLDED into the kernel first
# (inference BN is an affine per-channel map), the folded kernel is
# quantised per-output-channel, and activations use static calibrated
# scales — the convolution itself runs int8 x int8 -> int32 on the MXU.
# The attention pool (one 50-token attention, ~0.1% of FLOPs) stays bf16,
# matching the policy that tiny-FLOPs output-critical ops are not worth
# their accuracy cost (see module docstring).
# --------------------------------------------------------------------------


def fold_bn_into_conv(conv_p: Dict, bn_p: Dict, eps: float = 1e-5):
    """Inference-time conv+BN -> single conv with bias.

    y = (conv(x) - mean) * rsqrt(var+eps) * scale + bias
      = conv(x; kernel * g) + (bias - mean * g),  g = scale * rsqrt(var+eps)
    """
    g = (bn_p["scale"] * jax.lax.rsqrt(bn_p["var"] + eps)).astype(jnp.float32)
    kernel = conv_p["kernel"].astype(jnp.float32) * g  # [kh,kw,in,out] * [out]
    bias = bn_p["bias"].astype(jnp.float32) - bn_p["mean"].astype(jnp.float32) * g
    return kernel, bias


def quantize_conv_weight(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[kh, kw, in, out] float -> int8 with per-output-channel scales."""
    k = kernel.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def int8_conv(
    x: jnp.ndarray,
    cp: Dict[str, jnp.ndarray],
    stride: int = 1,
    padding: int = 0,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y = conv(x, dequant(cp)) + bias as s8 x s8 -> s32 (NHWC).

    cp: {"q" int8 [kh,kw,in,out], "scale" [out], "a" scalar activation
    scale, "bias" [out]}. The input quantisation is pure elementwise and
    fuses into the producer; the s32 accumulator dequant + bias fuses into
    the consumer.
    """
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / cp["a"]), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        cp["q"],
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (cp["a"] * cp["scale"]) + cp["bias"]
    return y.astype(out_dtype)


def quantize_resnet_tower(params: Dict, cfg: CLIPConfig, a_scales: Dict) -> Dict:
    """Quantize every conv of the RN vision tower (BN folded, per-out-channel
    weights, static activation scales from :func:`calibrate_resnet_tower`).
    Returns a new params tree; the attention pool is shared by reference."""
    assert cfg.is_resnet
    v = params["visual"]

    def site(path, conv_p, bn_p):
        kernel, bias = fold_bn_into_conv(conv_p, bn_p)
        pack = quantize_conv_weight(kernel)
        node = a_scales
        for k in path:
            node = node[k]
        pack["bias"] = bias
        pack["a"] = node
        return pack

    qv: Dict = {"attnpool": v["attnpool"]}
    for name in ("conv1", "conv2", "conv3"):
        qv[name] = site((name,), v[name], v[f"bn{name[-1]}"])
    for li in range(4):
        stage = []
        for b, bp in enumerate(v[f"layer{li + 1}"]):
            qb = {
                name: site((f"layer{li + 1}", b, name), bp[name], bp[f"bn{name[-1]}"])
                for name in ("conv1", "conv2", "conv3")
            }
            if "downsample" in bp:
                qb["downsample"] = site(
                    (f"layer{li + 1}", b, "downsample"), bp["downsample"]["conv"], bp["downsample"]["bn"]
                )
            stage.append(qb)
        qv[f"layer{li + 1}"] = stage
    out = dict(params)
    out["visual"] = qv
    return out


def encode_image_rn_q(qparams: Dict, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """int8 ModifiedResNet forward (mirror of resnet.resnet_encoder)."""
    from clip_mixer_tpu.models.resnet import attention_pool, avg_pool

    assert cfg.is_resnet
    dt = jnp.dtype(cfg.compute_dtype)
    v = qparams["visual"]
    x = images.astype(dt)
    x = jax.nn.relu(int8_conv(x, v["conv1"], stride=2, padding=1, out_dtype=dt))
    x = jax.nn.relu(int8_conv(x, v["conv2"], padding=1, out_dtype=dt))
    x = jax.nn.relu(int8_conv(x, v["conv3"], padding=1, out_dtype=dt))
    x = avg_pool(x, 2)
    for li in range(4):
        for b, bp in enumerate(v[f"layer{li + 1}"]):
            stride = (1 if li == 0 else 2) if b == 0 else 1
            out = jax.nn.relu(int8_conv(x, bp["conv1"], out_dtype=dt))
            out = jax.nn.relu(int8_conv(out, bp["conv2"], padding=1, out_dtype=dt))
            if stride > 1:
                out = avg_pool(out, stride)
            out = int8_conv(out, bp["conv3"], out_dtype=dt)
            identity = x
            if "downsample" in bp:
                identity = x if stride == 1 else avg_pool(x, stride)
                identity = int8_conv(identity, bp["downsample"], out_dtype=dt)
            x = jax.nn.relu(out + identity)
    return attention_pool(v["attnpool"], x, cfg.vision_heads)


def calibrate_resnet_tower(
    params: Dict,
    cfg: CLIPConfig,
    sample_images: jnp.ndarray,
    quantile: float = 0.9999,
) -> Dict:
    """|input| quantile at every conv site on sample (normalised) images,
    running the float inference forward. Returns the a_scales tree for
    :func:`quantize_resnet_tower` (scale = quantile/127)."""
    from clip_mixer_tpu.models.resnet import avg_pool, batch_norm, conv

    assert cfg.is_resnet
    dt = jnp.dtype(cfg.compute_dtype)
    v = params["visual"]

    def q(x):
        return jnp.maximum(jnp.quantile(jnp.abs(x.astype(jnp.float32)), quantile) / 127.0, 1e-8)

    scales: Dict = {}
    x = sample_images.astype(dt)
    scales["conv1"] = q(x)
    x = jax.nn.relu(batch_norm(v["bn1"], conv(v["conv1"], x, stride=2, padding=1)))
    scales["conv2"] = q(x)
    x = jax.nn.relu(batch_norm(v["bn2"], conv(v["conv2"], x, padding=1)))
    scales["conv3"] = q(x)
    x = jax.nn.relu(batch_norm(v["bn3"], conv(v["conv3"], x, padding=1)))
    x = avg_pool(x, 2)
    for li in range(4):
        stage = []
        for b, bp in enumerate(v[f"layer{li + 1}"]):
            stride = (1 if li == 0 else 2) if b == 0 else 1
            s: Dict = {"conv1": q(x)}
            out = jax.nn.relu(batch_norm(bp["bn1"], conv(bp["conv1"], x)))
            s["conv2"] = q(out)
            out = jax.nn.relu(batch_norm(bp["bn2"], conv(bp["conv2"], out, padding=1)))
            if stride > 1:
                out = avg_pool(out, stride)
            s["conv3"] = q(out)
            out = batch_norm(bp["bn3"], conv(bp["conv3"], out))
            identity = x
            if "downsample" in bp:
                identity = x if stride == 1 else avg_pool(x, stride)
                s["downsample"] = q(identity)
                identity = batch_norm(bp["downsample"]["bn"], conv(bp["downsample"]["conv"], identity))
            x = jax.nn.relu(out + identity)
            stage.append(s)
        scales[f"layer{li + 1}"] = stage
    return scales


def image_quant_fns(cfg: CLIPConfig):
    """(calibrate, quantize, encode_q) for cfg's vision tower — the ONE
    dispatch shared by the accuracy gates (evals/quant_gate.py) and serving
    (serving.Server.enable_int8). is_resnet MUST be checked before
    use_transformer: RN presets carry tower="transformer" for their text
    side while the visual trunk is the conv tower."""
    if cfg.is_resnet:
        return (calibrate_resnet_tower, quantize_resnet_tower, encode_image_rn_q)
    if cfg.use_transformer:
        return (calibrate_vit_vision_tower, quantize_vit_vision_tower, encode_image_vit_q)
    return (calibrate_vision_tower, quantize_vision_tower, encode_image_q)


def text_quant_fns(cfg: CLIPConfig):
    """(calibrate, quantize, encode_q) for cfg's TEXT tower — the one
    dispatch shared by the text-side gate and serving."""
    if cfg.use_transformer:
        return (calibrate_vit_text_tower, quantize_vit_text_tower, encode_text_vit_q)
    return (calibrate_text_tower, quantize_text_tower, encode_text_q)
