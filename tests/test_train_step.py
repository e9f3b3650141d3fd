"""Sharded train-step gates on the 8-virtual-device CPU mesh.

- a full jitted step runs with params replicated and batch sharded;
- overfitting a fixed tiny batch drives the loss down (optimization sanity);
- the sharded step computes the same loss/update as an equivalent
  single-device step (DP invariance — the distributed-correctness test the
  reference never had);
- logit_scale clamps at ln(100) (training.py:173-178).
"""

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_eval_forward, make_train_step
from clip_mixer_tpu.train.optimizer import make_optimizer

CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=12,
    vocab_size=256,
    text_width=64,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)
TCFG = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2)


def _batch(seed=0, B=16):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (B, 32, 32, 3), dtype=np.uint8)
    texts = np.zeros((B, 12), np.int32)
    texts[:, 0] = 254
    for i in range(B):
        texts[i, 1:4] = rng.integers(1, 250, 3)
        texts[i, 4] = 255  # eot
    return {"images": images, "texts": texts}


def test_overfit_tiny_batch():
    mesh = make_mesh()
    opt = make_optimizer(TCFG, total_steps=60)
    params = clip_model.init(jax.random.key(0), CFG)
    state = init_train_state(params, opt)
    step = make_train_step(CFG, TCFG, mesh, opt)

    state = replicate(mesh, state)
    batch = shard_batch(mesh, _batch())
    losses = []
    for _ in range(50):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_dp_invariance_vs_single_device():
    """Same data, same init: 8-way sharded step == 1-device step."""
    batch = _batch(seed=3)

    mesh8 = make_mesh()
    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])

    results = []
    for mesh in (mesh8, mesh1):
        # Fresh params/opt per mesh: the jitted step donates its input state,
        # and replicate() may alias buffers when the sharding already matches,
        # so state must never be shared across donating steps.
        opt = make_optimizer(TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(1), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(CFG, TCFG, mesh, opt)
        b = shard_batch(mesh, batch)
        metrics = None
        for _ in range(3):
            state, metrics = step(state, b)
        results.append((state, metrics))

    (s8, m8), (s1, m1) = results
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=2e-4)
    # Params: Adam divides by sqrt(nu)+eps, so O(1e-8) reduction-order noise
    # in near-zero grads is amplified into O(1e-4) update differences after a
    # few steps — tolerance reflects that, while loss/grad_norm above pin the
    # collective math tightly.
    flat8 = jax.tree.leaves(s8.params)
    flat1 = jax.tree.leaves(s1.params)
    for a, b_ in zip(flat8, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_logit_scale_clamp():
    mesh = make_mesh()
    tcfg = TrainConfig(learning_rate=0.0, warmup_steps=0)
    opt = make_optimizer(tcfg, total_steps=10)
    params = clip_model.init(jax.random.key(0), CFG)
    # start above the clamp
    params["logit_scale"] = jnp.asarray(10.0, jnp.float32)
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(CFG, tcfg, mesh, opt)
    state, m = step(state, shard_batch(mesh, _batch()))
    assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6


def test_eval_forward_sharded():
    mesh = make_mesh()
    params = replicate(mesh, clip_model.init(jax.random.key(0), CFG))
    fwd = make_eval_forward(CFG, mesh)
    batch = shard_batch(mesh, _batch())
    img, txt, scale = fwd(params, batch["images"], batch["texts"])
    assert img.shape == (16, 32) and txt.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-4)
