"""Tensor-parallel gates on the virtual CPU mesh: a (data=2, model=2) train
step must compute the same loss and the same parameter updates as pure DP —
the TP decomposition is an implementation detail, not a math change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import MODEL_AXIS, make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.parallel.tp import tp_param_specs
from clip_mixer_tpu.train.optimizer import make_optimizer

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
TCFG = TrainConfig(learning_rate=1e-3, warmup_steps=1)


def _batch(B=8):
    rng = np.random.default_rng(0)
    texts = np.zeros((B, 12), np.int32)
    texts[:, 0] = 126
    texts[:, 1:3] = rng.integers(1, 120, (B, 2))
    texts[:, 3] = 127
    return {"images": rng.integers(0, 256, (B, 16, 16, 3), dtype=np.uint8), "texts": texts}


def test_tp_param_specs_structure():
    params = clip_model.init(jax.random.key(0), CFG)
    specs = tp_param_specs(params)
    blocks = specs["visual"]["tower"]["blocks"]
    assert blocks["channel_mix"]["w_in"] == P(None, None, MODEL_AXIS)
    assert blocks["channel_mix"]["w_out"] == P(None, MODEL_AXIS, None)
    assert blocks["channel_mix"]["b_in"] == P(None, MODEL_AXIS)
    assert blocks["channel_mix"]["b_out"] == P()
    assert blocks["token_mix"]["w_in"] == P()
    assert specs["text"]["token_embedding"] == P()
    assert specs["logit_scale"] == P()


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_tp_matches_dp(tower):
    # transformer: 128-wide -> 2 heads, so head-sharded attention splits
    # across the model=2 axis (1 head per rank)
    cfg = CFG.replace(tower=tower, vision_width=128, text_width=128, text_heads=2)
    batch = _batch()
    results = []
    for n_data, n_model in ((4, 1), (2, 2)):
        mesh = make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices()[: n_data * n_model])
        opt = make_optimizer(TCFG, total_steps=5)
        params = clip_model.init(jax.random.key(7), cfg)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(cfg, TCFG, mesh, opt)
        b = shard_batch(mesh, batch)
        losses = []
        for _ in range(2):
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        results.append((losses, jax.tree.map(np.asarray, jax.device_get(state.params)), float(m["grad_norm"])))

    (loss_dp, params_dp, gn_dp), (loss_tp, params_tp, gn_tp) = results
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-5)
    np.testing.assert_allclose(gn_dp, gn_tp, rtol=1e-4)
    # Gradients agree to ~1e-6 (verified leaf-by-leaf during development);
    # the wider param tolerance absorbs Adam's eps-amplification of
    # reduction-order noise on near-zero grads (see test_train_step.py).
    for a, b_ in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(a, b_, atol=5e-4)


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_tp_with_grad_accum_matches_plain_tp(tower):
    """Exact grad accumulation composes with tensor parallelism: the
    two-pass VJP re-enters the TP blocks' psum collectives per microbatch."""
    cfg = CFG.replace(tower=tower, vision_width=128, text_width=128, text_heads=2)
    batch = _batch()
    results = []
    for accum in (1, 2):
        mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
        opt = make_optimizer(TCFG, total_steps=5)
        params = clip_model.init(jax.random.key(7), cfg)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(cfg, TCFG, mesh, opt, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_tp_remat_policy_matches_plain_tp(tower):
    """remat_policy must stay a pure recompute-schedule choice under TP too:
    the sharded_mlp hidden carries the same checkpoint_name tag as the
    replicated branch, and saving it must not change the math."""
    cfg = CFG.replace(
        tower=tower, vision_width=128, text_width=128, text_heads=2, remat=True
    )
    batch = _batch()
    results = []
    for policy in ("none", "mlp_hidden"):
        mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
        opt = make_optimizer(TCFG, total_steps=5)
        params = clip_model.init(jax.random.key(7), cfg)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(cfg.replace(remat_policy=policy), TCFG, mesh, opt)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_siglip_matches_dp():
    """Sigmoid objective under tensor parallelism: (data=2, model=2) == pure
    DP(4) — the ring runs over the data axis within each model column, and
    the scalar logit_bias rides the replicated spec through the head-major
    reorder untouched."""
    cfg = CFG.replace(logit_bias_init=-10.0, logit_scale_init=float(np.log(10.0)))
    stcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2, loss="siglip")
    batch = _batch()
    results = []
    for n_data, n_model in ((4, 1), (2, 2)):
        mesh = make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices()[: n_data * n_model])
        opt = make_optimizer(stcfg, total_steps=5)
        params = clip_model.init(jax.random.key(37), cfg)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(cfg, stcfg, mesh, opt)
        b = shard_batch(mesh, batch)
        m = None
        for _ in range(2):
            state, m = step(state, b)
        results.append((float(m["loss"]), jax.tree.map(np.asarray, jax.device_get(state.params))))

    (loss_dp, params_dp), (loss_tp, params_tp) = results
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(a, b_, atol=5e-4)
    assert float(params_tp["logit_bias"]) != -10.0
