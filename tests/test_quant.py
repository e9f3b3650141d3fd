"""int8 quantized-inference gates (CPU; int8 dot_general runs everywhere).

Hardware numbers (v5e, B=512): bf16 22.3k imgs/s -> int8 calibrated 34.5k
(+54%) at feature cosine min 0.9992 — pinned here at small scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.quant import (
    calibrate_vision_tower,
    encode_image_q,
    int8_matmul,
    quantize_vision_tower,
    quantize_weight,
)

CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=12,
    vocab_size=128,
    text_width=64,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.05, (64, 128)), jnp.float32)
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    deq = np.asarray(wq["q"], np.float32) * np.asarray(wq["scale"])
    err = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01  # <=1 LSB of 127


@pytest.mark.parametrize("static", [False, True])
def test_int8_matmul_close(static):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (64, 96)), jnp.float32)
    wq = quantize_weight(w)
    scale = float(np.abs(np.asarray(x)).max() / 127.0) if static else None
    got = np.asarray(int8_matmul(x, wq, scale, out_dtype=jnp.float32))
    want = np.asarray(x @ w)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02


def test_encode_image_q_fidelity():
    params = clip_model.init(jax.random.key(2), CFG)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)

    f_ref = np.asarray(clip_model.encode_image(params, CFG, imgs), np.float32)

    # dynamic scales
    q_dyn = quantize_vision_tower(params, CFG)
    f_dyn = np.asarray(encode_image_q(q_dyn, CFG, imgs), np.float32)
    # calibrated static scales
    scales = calibrate_vision_tower(params, CFG, imgs)
    q_stat = quantize_vision_tower(params, CFG, scales)
    f_stat = np.asarray(encode_image_q(q_stat, CFG, imgs), np.float32)

    for f in (f_dyn, f_stat):
        cos = (f_ref * f).sum(-1) / (np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f, axis=-1))
        assert cos.min() > 0.995, cos.min()


def test_calibration_scale_shapes():
    params = clip_model.init(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    s = calibrate_vision_tower(params, CFG, imgs)
    assert s["ch_in"].shape == (CFG.vision_layers,)
    assert s["ch_hidden"].shape == (CFG.vision_layers,)
    assert s["patch"].shape == ()
    assert float(s["patch"]) > 0
    assert "proj" not in s  # projections stay bf16; no dead scale entries


def test_encode_text_q_fidelity():
    from clip_mixer_tpu.ops.quant import calibrate_text_tower, encode_text_q, quantize_text_tower
    from clip_mixer_tpu.text import tokenize

    cfg = CFG.replace(context_length=77, vocab_size=49408)
    params = clip_model.init(jax.random.key(4), cfg)
    texts = tokenize(
        ["a photo of a cat", "an aerial view of the city at night", "two dogs playing"],
        truncate=True,
    )
    t = jnp.asarray(texts)
    f_ref = np.asarray(clip_model.encode_text(params, cfg, t), np.float32)

    q_dyn = quantize_text_tower(params, cfg)
    f_dyn = np.asarray(encode_text_q(q_dyn, cfg, t), np.float32)
    scales = calibrate_text_tower(params, cfg, t)
    q_stat = quantize_text_tower(params, cfg, scales)
    f_stat = np.asarray(encode_text_q(q_stat, cfg, t), np.float32)

    for f in (f_dyn, f_stat):
        cos = (f_ref * f).sum(-1) / (np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f, axis=-1))
        assert cos.min() > 0.995, cos.min()


def test_quantize_both_towers_compose():
    from clip_mixer_tpu.ops.quant import (
        encode_image_q,
        encode_text_q,
        quantize_text_tower,
        quantize_vision_tower,
    )

    params = clip_model.init(jax.random.key(5), CFG)
    q = quantize_text_tower(quantize_vision_tower(params, CFG), CFG)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    txt = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(126).at[:, 1].set(127)
    fi = encode_image_q(q, CFG, imgs)
    ft = encode_text_q(q, CFG, txt)
    assert fi.shape == (2, 32) and ft.shape == (2, 32)
    assert np.isfinite(np.asarray(fi)).all() and np.isfinite(np.asarray(ft)).all()


def test_vit_int8_fidelity():
    from clip_mixer_tpu.ops.quant import encode_image_vit_q, quantize_vit_vision_tower

    cfg = CFG.replace(tower="transformer", vision_width=64, text_width=64)
    params = clip_model.init(jax.random.key(6), cfg)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    f_ref = np.asarray(clip_model.encode_image(params, cfg, imgs), np.float32)
    q = quantize_vit_vision_tower(params, cfg)
    f_q = np.asarray(encode_image_vit_q(q, cfg, imgs), np.float32)
    cos = (f_ref * f_q).sum(-1) / (np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f_q, axis=-1))
    assert cos.min() > 0.99, cos.min()


def test_vit_int8_calibrated_fidelity():
    from clip_mixer_tpu.ops.quant import (
        calibrate_vit_vision_tower,
        encode_image_vit_q,
        quantize_vit_vision_tower,
    )

    cfg = CFG.replace(tower="transformer", vision_width=64, text_width=64)
    params = clip_model.init(jax.random.key(8), cfg)
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    f_ref = np.asarray(clip_model.encode_image(params, cfg, imgs), np.float32)
    scales = calibrate_vit_vision_tower(params, cfg, imgs)
    q = quantize_vit_vision_tower(params, cfg, scales)
    f_q = np.asarray(encode_image_vit_q(q, cfg, imgs), np.float32)
    cos = (f_ref * f_q).sum(-1) / (np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f_q, axis=-1))
    assert cos.min() > 0.99, cos.min()


def test_vit_text_int8_fidelity():
    """Transformer text tower int8 (dynamic + calibrated) vs float reference."""
    from clip_mixer_tpu.ops.quant import (
        calibrate_vit_text_tower,
        encode_text_vit_q,
        quantize_vit_text_tower,
    )
    from clip_mixer_tpu.text import tokenize

    cfg = CFG.replace(tower="transformer", context_length=77, vocab_size=49408)
    params = clip_model.init(jax.random.key(10), cfg)
    texts = tokenize(
        ["a photo of a cat", "an aerial view of the city at night", "two dogs playing"],
        truncate=True,
    )
    t = jnp.asarray(texts)
    f_ref = np.asarray(clip_model.encode_text(params, cfg, t), np.float32)

    q_dyn = quantize_vit_text_tower(params, cfg)
    f_dyn = np.asarray(encode_text_vit_q(q_dyn, cfg, t), np.float32)
    scales = calibrate_vit_text_tower(params, cfg, t)
    q_stat = quantize_vit_text_tower(params, cfg, scales)
    f_stat = np.asarray(encode_text_vit_q(q_stat, cfg, t), np.float32)

    for f in (f_dyn, f_stat):
        cos = (f_ref * f).sum(-1) / (np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f, axis=-1))
        assert cos.min() > 0.99, cos.min()


def test_vit_text_int8_causality():
    """The int8 text path must keep the causal mask: features at EOT position
    i must not depend on tokens after position i."""
    from clip_mixer_tpu.ops.quant import encode_text_vit_q, quantize_vit_text_tower

    cfg = CFG.replace(tower="transformer", context_length=12, vocab_size=128)
    params = clip_model.init(jax.random.key(11), cfg)
    q = quantize_vit_text_tower(params, cfg)
    base = jnp.zeros((1, 12), jnp.int32).at[:, 0].set(10).at[:, 1].set(127)  # eot at pos 1
    changed = base.at[:, 5].set(55)  # token after EOT differs
    f0 = np.asarray(encode_text_vit_q(q, cfg, base), np.float32)
    f1 = np.asarray(encode_text_vit_q(q, cfg, changed), np.float32)
    np.testing.assert_allclose(f0, f1, rtol=0, atol=0)


# ---- ResNet tower ---------------------------------------------------------

RN_CFG = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=16, vision_patch_size=None)


def _rn_params(seed=0):
    """Random-init RN params with non-trivial BN stats so folding is real
    (init leaves running mean 0 / var 1 and bn3 scale 0)."""
    params = clip_model.init(jax.random.key(seed), RN_CFG)
    rng = np.random.default_rng(seed)

    def perturb(node):
        if isinstance(node, list):
            return [perturb(c) for c in node]
        if isinstance(node, dict):
            if set(node.keys()) == {"scale", "bias", "mean", "var"}:  # a BN site
                c = node["scale"].shape[0]
                return {
                    "scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.1, c), jnp.float32),
                    "mean": jnp.asarray(rng.normal(0, 0.2, c), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
                }
            return {k: perturb(v) for k, v in node.items()}
        return node
    params["visual"] = perturb(params["visual"])
    return params


def test_bn_fold_exact():
    """Folded conv+bias == conv followed by inference BN."""
    from clip_mixer_tpu.models.resnet import batch_norm, conv
    from clip_mixer_tpu.ops.quant import fold_bn_into_conv

    params = _rn_params(3)
    v = params["visual"]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    want = batch_norm(v["bn1"], conv(v["conv1"], x, stride=2, padding=1))
    kernel, bias = fold_bn_into_conv(v["conv1"], v["bn1"])
    got = conv({"kernel": kernel}, x, stride=2, padding=1) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_resnet_int8_fidelity():
    """Calibrated W8A8 RN forward tracks the float forward (cosine)."""
    from clip_mixer_tpu.ops.quant import (
        calibrate_resnet_tower,
        encode_image_rn_q,
        quantize_resnet_tower,
    )

    params = _rn_params(5)
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)

    scales = calibrate_resnet_tower(params, RN_CFG, imgs[:4])
    qparams = quantize_resnet_tower(params, RN_CFG, scales)
    got = np.asarray(encode_image_rn_q(qparams, RN_CFG, imgs), np.float32)
    want = np.asarray(clip_model.encode_image(params, RN_CFG, imgs), np.float32)

    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.99, cos
    # and the quantized tree really is int8 at every conv
    assert qparams["visual"]["conv1"]["q"].dtype == jnp.int8
    assert qparams["visual"]["layer4"][0]["conv3"]["q"].dtype == jnp.int8


def test_resnet_int8_serving_engine():
    """InferenceEngine.enable_int8 covers the RN preset end to end."""
    from clip_mixer_tpu.serving import InferenceEngine

    params = _rn_params(7)
    rng = np.random.default_rng(8)
    engine = InferenceEngine(params, RN_CFG, batch_buckets=(8,))
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    before = engine.encode_image_arrays(imgs)
    engine.enable_int8(imgs[:4])
    after = engine.encode_image_arrays(imgs)
    cos = (before * after).sum(-1)  # both l2-normalised
    assert cos.min() > 0.99, cos


# --------------------------------------------------------------------------
# Planar fused front-end (resize -> int8 c-major patches) — the bench/serving
# headline graph's front half (ops.quant.make_planar_front_end).
# --------------------------------------------------------------------------


def test_patch_perm_is_permutation():
    from clip_mixer_tpu.ops.quant import patch_perm

    perm = patch_perm(16)
    assert sorted(perm.tolist()) == list(range(16 * 16 * 3))
    # spot-check the mapping: planar index c*p*p + ph*p + pw must point at
    # patchify's (ph*p + pw)*3 + c
    p = 16
    for c, ph, pw in [(0, 0, 0), (2, 3, 5), (1, 15, 15)]:
        assert perm[c * p * p + ph * p + pw] == (ph * p + pw) * 3 + c


def test_planar_front_end_bitwise_vs_nhwc_at_identity_resize():
    """With source == target resolution the resize matrices are exactly
    identity, so the planar path must reproduce encode_image_q BITWISE:
    same normalize, same quantization values (reordered), permuted kernel
    rows cancel the reorder."""
    from clip_mixer_tpu.ops.preprocess import normalize_images
    from clip_mixer_tpu.ops.quant import encode_image_q_patches, make_planar_front_end

    params = clip_model.init(jax.random.key(2), CFG)
    rng = np.random.default_rng(5)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    imgs = normalize_images(u8, dtype="float32")
    scales = calibrate_vision_tower(params, CFG, imgs)
    qp = quantize_vision_tower(params, CFG, scales)
    want = np.asarray(encode_image_q(qp, CFG, imgs))

    front = make_planar_front_end(CFG, (32, 32), scales["patch"])
    patches = front(u8)
    assert patches.dtype == jnp.int8 and patches.shape == (4, 4, 16 * 16 * 3)
    got = np.asarray(encode_image_q_patches(qp, CFG, patches))
    np.testing.assert_array_equal(got, want)


def test_planar_front_end_resize_fidelity():
    """Real 64->32 resize: planar bf16 front-end + int8 tower vs the all-f32
    reference front-end + f32 tower — feature cosine must stay high (full
    scale measured 0.99989 on v5e, scripts/bench_frontend_variants.py)."""
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.ops.quant import encode_image_q_patches, make_planar_front_end

    params = clip_model.init(jax.random.key(2), CFG)
    rng = np.random.default_rng(6)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
    pre32 = make_batch_preprocess((64, 64), 32, normalize=True, dtype=jnp.float32)
    ref = np.asarray(clip_model.encode_image(params, CFG, pre32(u8)), np.float32)

    scales = calibrate_vision_tower(params, CFG, pre32(u8))
    qp = quantize_vision_tower(params, CFG, scales)
    front = make_planar_front_end(CFG, (64, 64), scales["patch"])
    got = np.asarray(encode_image_q_patches(qp, CFG, front(u8)), np.float32)

    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.99, cos
