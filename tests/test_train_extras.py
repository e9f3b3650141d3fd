"""Schedule, remat, bf16-drift, chunked-train-step, and StepTimer gates."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.optimizer import decay_mask, make_optimizer
from clip_mixer_tpu.train.schedule import warmup_cosine

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=16,
    vision_layers=2,
    vision_width=32,
    vision_patch_size=8,
    context_length=12,
    vocab_size=128,
    text_width=32,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


def test_schedule_matches_reference_shape():
    """CosineAnnealingWarmupRestarts(first_cycle=total, warmup=2,
    min_lr=max/100) semantics (training.py:83-89)."""
    sched = warmup_cosine(5e-4, 5e-6, 2, 1000)
    assert float(sched(0)) == pytest.approx(5e-6)
    assert float(sched(1)) == pytest.approx(5e-6 + (5e-4 - 5e-6) / 2)
    assert float(sched(2)) == pytest.approx(5e-4)  # peak at end of warmup
    mid = float(sched(2 + (1000 - 2) / 2))
    assert mid == pytest.approx(5e-6 + 0.5 * (5e-4 - 5e-6), rel=1e-3)
    assert float(sched(1000)) == pytest.approx(5e-6, rel=1e-3)
    assert float(sched(2000)) == pytest.approx(5e-6, rel=1e-3)  # clamped after end


def test_decay_mask_matches_reference_rule():
    """Decay exactly the params torch's ndim>=2 rule decays (training.py:
    66-71) — accounting for our stacked [L, ...] block layout: stacked biases
    and LayerNorms must NOT decay, stacked weight matrices must."""
    params = clip_model.init(jax.random.key(0), CFG)
    mask = decay_mask(params)
    blocks = mask["visual"]["tower"]["blocks"]
    assert blocks["channel_mix"]["w_in"] is True
    assert blocks["channel_mix"]["b_in"] is False
    assert blocks["token_mix"]["w_out"] is True
    assert blocks["token_mix"]["b_out"] is False
    assert blocks["ln_token"]["scale"] is False
    assert blocks["ln_channel"]["bias"] is False
    assert mask["logit_scale"] is False
    assert mask["text"]["token_embedding"] is True
    assert mask["text"]["projection"] is True
    assert mask["visual"]["proj"] is True
    assert mask["visual"]["class_embedding"] is False
    assert mask["visual"]["ln_pre"]["scale"] is False
    assert mask["visual"]["patch_embed"]["kernel"] is True


def test_remat_forward_identical():
    params = clip_model.init(jax.random.key(0), CFG)
    imgs = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    a = clip_model.encode_image(params, CFG, imgs)
    b = clip_model.encode_image(params, CFG.replace(remat=True), imgs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_grads_match():
    params = clip_model.init(jax.random.key(1), CFG)
    imgs = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 16, 16, 3)), jnp.float32)

    def loss(p, cfg):
        return clip_model.encode_image(p, cfg, imgs).sum()

    g1 = jax.grad(loss)(params, CFG)
    g2 = jax.grad(loss)(params, CFG.replace(remat=True))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("policy", ["mlp_hidden", "all_hidden"])
@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_remat_policy_grads_match(policy, tower):
    """Saving the tagged hidden pre-activations (models/layers.remat_policy_fn)
    changes only what the backward recomputes, never the math: gradients must
    match full remat to float tolerance for both tower types."""
    cfg = CFG.replace(tower=tower, vision_width=64, text_heads=2)
    params = clip_model.init(jax.random.key(3), cfg)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    txts = jnp.asarray(rng.integers(1, 127, (2, 12)), jnp.int32)

    def loss(p, cfg):
        img, txt, scale = clip_model.forward(p, cfg, imgs, txts)
        return (img * txt).sum() * scale

    g1 = jax.grad(loss)(params, cfg.replace(remat=True))
    g2 = jax.grad(loss)(params, cfg.replace(remat=True, remat_policy=policy))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_feature_drift_bounded():
    """bf16 compute must stay directionally faithful to f32 (the numerics
    policy replacing surgical fp16 — SURVEY hard part 3): cosine similarity
    of features > 0.995."""
    cfg32 = CFG.replace(vision_width=64, text_width=64, embed_dim=32)
    params = clip_model.init(jax.random.key(2), cfg32)
    imgs = jnp.asarray(np.random.default_rng(2).normal(0, 1, (4, 16, 16, 3)), jnp.float32)
    f32 = np.asarray(clip_model.encode_image(params, cfg32, imgs), np.float32)
    f16 = np.asarray(
        clip_model.encode_image(params, cfg32.replace(compute_dtype="bfloat16"), imgs), np.float32
    )
    cos = (f32 * f16).sum(-1) / (np.linalg.norm(f32, axis=-1) * np.linalg.norm(f16, axis=-1))
    assert cos.min() > 0.995, cos


def test_train_step_chunked_matches_full():
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8),
        "texts": np.concatenate(
            [np.full((8, 1), 126, np.int32), rng.integers(1, 120, (8, 10), np.int32), np.full((8, 1), 127, np.int32)],
            axis=1,
        ),
    }
    losses = []
    for chunk in (None, 2):
        opt = make_optimizer(tcfg, total_steps=5)
        state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(3), CFG), opt))
        step = make_train_step(CFG, tcfg, mesh, opt, chunk_size=chunk)
        _, m = step(state, shard_batch(mesh, batch))
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


def test_step_timer():
    from clip_mixer_tpu.utils.profiling import StepTimer

    t = StepTimer(global_batch_size=64, warmup_steps=1)
    assert t.tick() is None  # warmup
    out = None
    for _ in range(3):
        out = t.tick()
    assert out is not None
    assert out["imgs_per_sec"] == pytest.approx(out["steps_per_sec"] * 64)
    assert out["imgs_per_sec_per_chip"] == pytest.approx(out["imgs_per_sec"] / jax.device_count())
