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
from clip_mixer_tpu.ops.losses import info_nce
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


def test_grad_accum_matches_full_batch():
    """accum_steps=4 must give the SAME optimizer step as one full-batch step:
    the two-pass (GradCache) scheme keeps the InfoNCE coupling over the whole
    batch exact — only float reduction order differs."""
    batch = _batch(seed=5)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])

    results = []
    for accum in (1, 4):
        opt = make_optimizer(TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(7), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(CFG, TCFG, mesh, opt, accum_steps=accum)
        b = shard_batch(mesh, batch)
        state, m = step(state, b)
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p4, m4) = results
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m4["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p4), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_grad_accum_under_dp_and_exact_gather():
    """Accumulation composes with data parallelism and grad_through_gather:
    2-device mesh x accum 2 == 2-device mesh x accum 1 (the all_gather still
    sees the full global batch in both)."""
    batch = _batch(seed=9)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])

    results = []
    for accum in (1, 2):
        opt = make_optimizer(TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(11), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(
            CFG, TCFG, mesh, opt, grad_through_gather=True, accum_steps=accum
        )
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_grad_accum_learns_and_logit_scale_flows():
    """The accumulated step optimizes (incl. the logit_scale gradient, which
    arrives only via the loss cotangent in the two-pass scheme)."""
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(TCFG, total_steps=60)
    params = clip_model.init(jax.random.key(0), CFG)
    ls0 = float(params["logit_scale"])
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(CFG, TCFG, mesh, opt, accum_steps=2)
    batch = shard_batch(mesh, _batch())
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"
    assert float(state.params["logit_scale"]) != ls0


def test_grad_accum_resnet_unsupported():
    import pytest

    cfg = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(TCFG, total_steps=10)
    with pytest.raises(NotImplementedError):
        make_train_step(cfg, TCFG, mesh, opt, accum_steps=2)


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


def test_resnet_train_step_updates_bn_ema():
    """RN tower training: SyncBN batch stats drive the forward, the step
    EMA-merges running stats (torch BatchNorm2d semantics), and the loss
    decreases on a fixed batch (reference never trains RN — completeness
    beyond parity; model.py:12-163, training.py:91)."""
    cfg = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None)
    assert cfg.is_resnet
    tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(tcfg, total_steps=30)
    params = clip_model.init(jax.random.key(1), cfg)
    bn_mean_init = np.asarray(params["visual"]["bn1"]["mean"])
    bn_var_init = np.asarray(params["visual"]["bn1"]["var"])
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(cfg, tcfg, mesh, opt)

    batch = shard_batch(mesh, _batch(B=8))
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"

    p = jax.device_get(state.params)
    # Running stats moved away from init (EMA applied every step) ...
    assert not np.allclose(np.asarray(p["visual"]["bn1"]["mean"]), bn_mean_init)
    assert not np.allclose(np.asarray(p["visual"]["bn1"]["var"]), bn_var_init)
    # ... and the deepest block too (stats thread through the whole tower).
    assert not np.allclose(np.asarray(p["visual"]["layer4"][0]["bn3"]["mean"]), 0.0)
    # Inference mode (running stats) produces finite, unit-normalisable feats.
    feats = clip_model.encode_image(p, cfg, jnp.zeros((2, 32, 32, 3), jnp.float32))
    assert np.isfinite(np.asarray(feats)).all()


def test_resnet_bn_stats_match_torch_semantics():
    """One EMA merge equals torch: running = 0.9*running + 0.1*unbiased_batch."""
    from clip_mixer_tpu.models.resnet import apply_bn_updates, resnet_encoder_train

    cfg = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None)
    params = clip_model.init(jax.random.key(2), cfg)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    _, stats = resnet_encoder_train(params["visual"], cfg, imgs)

    # bn1 sees conv1(images): recompute its batch moments directly.
    from clip_mixer_tpu.models.resnet import conv

    pre = conv(params["visual"]["conv1"], imgs, stride=2, padding=1)
    x = np.asarray(pre, np.float32)
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    np.testing.assert_allclose(np.asarray(stats["bn1"]["mean"]), mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["bn1"]["var"]), var, atol=1e-5)

    updated = apply_bn_updates(params["visual"], stats, momentum=0.1)
    want_mean = 0.9 * np.asarray(params["visual"]["bn1"]["mean"]) + 0.1 * mean
    want_var = 0.9 * np.asarray(params["visual"]["bn1"]["var"]) + 0.1 * (var * n / (n - 1))
    np.testing.assert_allclose(np.asarray(updated["bn1"]["mean"]), want_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["bn1"]["var"]), want_var, atol=1e-5)


# ---------------- SigLIP objective through the train steps ----------------

SIGLIP_CFG = CFG.replace(logit_bias_init=-10.0, logit_scale_init=float(np.log(10.0)))
SIGLIP_TCFG = TrainConfig(
    global_batch_size=16, learning_rate=1e-3, warmup_steps=2, loss="siglip"
)


def test_siglip_step_dp_invariance():
    """--loss siglip: 4-way sharded (ppermute ring) step == 1-device step,
    and the learnable logit_bias exists and moves."""
    batch = _batch(seed=13)
    results = []
    for mesh in (make_mesh(n_data=4, devices=jax.devices()[:4]),
                 make_mesh(n_data=1, devices=jax.devices()[:1])):
        opt = make_optimizer(SIGLIP_TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(21), SIGLIP_CFG)
        assert "logit_bias" in params
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(SIGLIP_CFG, SIGLIP_TCFG, mesh, opt)
        b = shard_batch(mesh, batch)
        metrics = None
        for _ in range(3):
            state, metrics = step(state, b)
        results.append((jax.device_get(state.params), jax.device_get(metrics)))

    (p4, m4), (p1, m1) = results
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m4["grad_norm"]), float(m1["grad_norm"]), rtol=2e-4)
    for a, b_ in zip(jax.tree.leaves(p4), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
    assert float(p1["logit_bias"]) != -10.0  # the bias trains


def test_siglip_accum_matches_full_batch():
    """Two-pass accumulation with the sigmoid objective: accum 4 == accum 1
    (incl. the logit_bias gradient, which arrives only via the loss
    cotangents in the two-pass scheme)."""
    batch = _batch(seed=17)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    results = []
    for accum in (1, 4):
        opt = make_optimizer(SIGLIP_TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(23), SIGLIP_CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(SIGLIP_CFG, SIGLIP_TCFG, mesh, opt, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p4, m4) = results
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m4["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p4), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
    assert float(p4["logit_bias"]) != -10.0


def test_siglip_overfits():
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(SIGLIP_TCFG, total_steps=60)
    params = clip_model.init(jax.random.key(0), SIGLIP_CFG)
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(SIGLIP_CFG, SIGLIP_TCFG, mesh, opt)
    batch = shard_batch(mesh, _batch())
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"


def test_siglip_without_bias_param_errors():
    """loss='siglip' on a model initialised without logit_bias_init fails
    loudly at the first step, not silently."""
    import pytest

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(SIGLIP_TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(0), CFG)  # no logit_bias
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(CFG, SIGLIP_TCFG, mesh, opt)
    with pytest.raises(ValueError, match="logit_bias"):
        step(state, shard_batch(mesh, _batch()))


# ---------------- Parameter EMA (opt_state slot) ----------------

from clip_mixer_tpu.parallel.train_step import ema_params  # noqa: E402


def test_ema_matches_manual_recurrence():
    """The EMA slot tracks exactly decay*ema + (1-decay)*post_fixup_params,
    starting from a copy of the init params."""
    tcfg = TrainConfig(
        global_batch_size=16, learning_rate=1e-3, warmup_steps=2, ema_decay=0.5
    )
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(tcfg, total_steps=10)
    params = clip_model.init(jax.random.key(41), CFG)
    expected_ema = jax.tree.map(np.asarray, params)
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(CFG, tcfg, mesh, opt)
    batch = shard_batch(mesh, _batch(seed=41))
    for _ in range(3):
        state, _ = step(state, batch)
        p = jax.tree.map(np.asarray, jax.device_get(state.params))
        expected_ema = jax.tree.map(lambda e, q: 0.5 * e + 0.5 * q, expected_ema, p)

    got = jax.tree.map(np.asarray, jax.device_get(ema_params(state)))
    for a, b_ in zip(jax.tree.leaves(got), jax.tree.leaves(expected_ema)):
        np.testing.assert_allclose(a, b_, atol=1e-6)
    # and the EMA genuinely lags the live params
    assert not np.allclose(
        got["visual"]["tower"]["blocks"]["channel_mix"]["w_in"],
        np.asarray(jax.device_get(state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"])),
    )


def test_ema_off_means_no_slot():
    opt = make_optimizer(TCFG, total_steps=10)
    state = init_train_state(clip_model.init(jax.random.key(0), CFG), opt)
    assert ema_params(state) is None


def test_train_config_validation():
    import pytest

    with pytest.raises(ValueError, match="ema_decay"):
        TrainConfig(ema_decay=1.0)
    with pytest.raises(ValueError, match="ema_decay"):
        TrainConfig(ema_decay=-0.1)
    with pytest.raises(ValueError, match="loss"):
        TrainConfig(loss="nope")
    TrainConfig(ema_decay=0.9999, loss="siglip")  # valid


def test_siglip_accum_without_bias_param_raises_friendly_error():
    """siglip + accumulation on a model without logit_bias: the explanatory
    ValueError, not a bare KeyError from the loss-params dict build."""
    import pytest

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(SIGLIP_TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(0), CFG)  # no logit_bias
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(CFG, SIGLIP_TCFG, mesh, opt, accum_steps=2)
    with pytest.raises(ValueError, match="logit_bias"):
        step(state, shard_batch(mesh, _batch()))


# ---------------- Locked-tower (LiT) training ----------------


def _leaf_floats(tree):
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def test_freeze_tower_locks_params_and_allocates_no_moments():
    """freeze='visual': the frozen tower is bitwise untouched after steps
    (stop_gradient + masked AdamW: no weight-decay drift), the other tower
    and logit_scale train, and the optimizer allocates NO moments for the
    frozen subtree (the memory point of locking)."""
    tcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2,
                       freeze="visual")
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(tcfg, total_steps=30)
    params = clip_model.init(jax.random.key(51), CFG)
    v0 = jax.tree.map(np.asarray, params["visual"])
    t0 = jax.tree.map(np.asarray, params["text"])
    ls0 = float(np.asarray(params["logit_scale"]))  # before donation
    state = replicate(mesh, init_train_state(params, opt))

    # moments exist only for the trainable subtree
    opt_plain = make_optimizer(TCFG, total_steps=30)
    full = _leaf_floats(init_train_state(clip_model.init(jax.random.key(51), CFG),
                                         opt_plain).opt_state)
    frozen = _leaf_floats(state.opt_state)
    visual_n = _leaf_floats(params["visual"])
    assert frozen <= full - 2 * visual_n + 8  # mu+nu for visual gone

    step = make_train_step(CFG, tcfg, mesh, opt)
    batch = shard_batch(mesh, _batch(seed=51))
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # still learns through the text tower

    p = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, p["visual"])),
                    jax.tree.leaves(v0)):
        np.testing.assert_array_equal(a, b)
    changed = [not np.allclose(a, b) for a, b in
               zip(jax.tree.leaves(jax.tree.map(np.asarray, p["text"])),
                   jax.tree.leaves(t0))]
    assert any(changed)
    assert float(p["logit_scale"]) != ls0


def test_freeze_composes_with_accum():
    """Two-pass accumulation under a locked tower: accum 2 == accum 1."""
    tcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2,
                       freeze="text")
    batch = _batch(seed=53)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    results = []
    for accum in (1, 2):
        opt = make_optimizer(tcfg, total_steps=10)
        params = clip_model.init(jax.random.key(53), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(CFG, tcfg, mesh, opt, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))
    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # the frozen text tower is untouched in both
    t_init = jax.tree.map(np.asarray, clip_model.init(jax.random.key(53), CFG)["text"])
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, p1["text"])),
                    jax.tree.leaves(t_init)):
        np.testing.assert_array_equal(a, b)


def test_freeze_visual_resnet_locks_bn_buffers_and_uses_eval_stats():
    """LiT with a ResNet image tower: the frozen tower must keep its BN
    running stats bitwise (no EMA merge) AND normalise with them (eval-mode
    semantics, torch module.eval()) — review catch: train-mode SyncBN +
    stats merge silently violated both."""
    cfg = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None)
    tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2,
                       freeze="visual")
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(tcfg, total_steps=30)
    params = clip_model.init(jax.random.key(61), cfg)
    # seed non-trivial running stats so "uses running stats" is observable
    params["visual"]["bn1"]["mean"] = jnp.full_like(params["visual"]["bn1"]["mean"], 0.3)
    params["visual"]["bn1"]["var"] = jnp.full_like(params["visual"]["bn1"]["var"], 2.0)
    v0 = jax.tree.map(np.asarray, params["visual"])
    # oracle features: INFERENCE path on the same images
    b = _batch(seed=61, B=8)
    from clip_mixer_tpu.ops.preprocess import normalize_images

    imgs_f = normalize_images(jnp.asarray(b["images"]), dtype=jnp.float32)
    feats_eval = np.asarray(clip_model.encode_image(params, cfg, imgs_f))

    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(cfg, tcfg, mesh, opt)
    for _ in range(3):
        state, m = step(state, shard_batch(mesh, b))
    assert np.isfinite(float(m["loss"]))
    p = jax.device_get(state.params)
    # visual tower — weights AND BN buffers — bitwise untouched
    for a, b_ in zip(jax.tree.leaves(jax.tree.map(np.asarray, p["visual"])),
                     jax.tree.leaves(v0)):
        np.testing.assert_array_equal(a, b_)
    # and the frozen tower's features in-step equal the inference path
    # (eval-mode BN): recompute through forward_train with bn_eval
    img, _txt, _s, bn = clip_model.forward_train(
        p, cfg, imgs_f, jnp.asarray(b["texts"]), bn_eval=True
    )
    assert bn == {}
    ref = feats_eval / np.linalg.norm(feats_eval, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-5)


def test_resnet_remat_grad_equivalence():
    """Per-bottleneck jax.checkpoint (cfg.remat) must change neither the
    gradients nor the BN batch stats — remat is a memory schedule, not a
    numerics change (models/resnet.py block_fn; enables single-chip RN50x64
    training per utils/memory.plan)."""
    cfg = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8,
                      vision_patch_size=None, compute_dtype="float32")
    params = clip_model.init(jax.random.key(3), cfg)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size - 2, (4, CFG.context_length), np.int32))

    def loss_fn(p, c):
        img, txt, scale, bn = clip_model.forward_train(p, c, imgs, toks)
        return info_nce(img, txt, scale), bn

    outs = {}
    for remat in (False, True):
        c = cfg.replace(remat=remat)
        (loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, c)
        outs[remat] = (float(loss), jax.device_get(bn), jax.device_get(grads))

    assert outs[False][0] == outs[True][0]
    # forward outputs (incl. BN batch stats) come from the one real forward
    # pass — bitwise; gradients involve the recompute, whose XLA schedule
    # reassociates within float tolerance
    jax.tree_util.tree_map(np.testing.assert_array_equal, outs[False][1], outs[True][1])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7),
        outs[False][2], outs[True][2])
