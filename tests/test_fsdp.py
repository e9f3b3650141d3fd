"""FSDP (ZeRO-3) gates on the virtual CPU mesh.

- parameters and Adam moments are genuinely STORED sharded (addressable
  shard shapes are 1/n of the logical shapes);
- the FSDP step computes the same loss/updates as the shard_map DP step
  with grad_through_gather=True (both are the exact globally-coupled
  InfoNCE objective — the distributed-correctness equivalence);
- exact two-pass grad accumulation composes with FSDP;
- the transformer tower (attention path) trains under FSDP too.

Meshes stay at <= 4 devices: XLA:CPU collectives rendezvous-stall on large
virtual meshes (CLAUDE.md).
"""

import numpy as np

import jax

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.fsdp import (
    fsdp_spec,
    fsdp_state_shardings,
    make_fsdp_train_step,
    shard_state,
)
from clip_mixer_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
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
        texts[i, 4] = 255
    return {"images": images, "texts": texts}


def test_fsdp_spec_rules():
    # last divisible dim is picked; the stacked-layer axis is skipped
    assert fsdp_spec((12, 64, 256), 4) == jax.sharding.PartitionSpec(None, None, DATA_AXIS)
    # indivisible last dim falls back to an earlier one
    assert fsdp_spec((12, 64, 250), 4) == jax.sharding.PartitionSpec(None, DATA_AXIS, None)
    # small leaves and scalars stay replicated
    assert fsdp_spec((12, 64), 4) == jax.sharding.PartitionSpec()
    assert fsdp_spec((), 4) == jax.sharding.PartitionSpec()
    # no divisible dim -> replicated
    assert fsdp_spec((4095, 3), 4) == jax.sharding.PartitionSpec()


def test_state_is_stored_sharded():
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    opt = make_optimizer(TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(0), CFG)
    state = shard_state(mesh, init_train_state(params, opt))

    w = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]  # [L, W, 4W]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, DATA_AXIS)
    shard = w.addressable_shards[0].data
    assert shard.shape == (w.shape[0], w.shape[1], w.shape[2] // 4)
    # Adam moments follow the same shards (ZeRO: optimizer state is sharded)
    sharded_opt_leaves = [
        l for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "sharding") and l.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert len(sharded_opt_leaves) > 0


def test_fsdp_matches_dp_exact_gather():
    """3 steps of FSDP == 3 steps of shard_map DP (grad_through_gather=True):
    identical objective, only float reduction order differs."""
    batch = _batch(seed=3)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])

    opt = make_optimizer(TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(1), CFG)
    state_dp = replicate(mesh, init_train_state(params, opt))
    step_dp = make_train_step(CFG, TCFG, mesh, opt, grad_through_gather=True)

    opt2 = make_optimizer(TCFG, total_steps=10)
    params2 = clip_model.init(jax.random.key(1), CFG)
    state_f = shard_state(mesh, init_train_state(params2, opt2))
    step_f = make_fsdp_train_step(CFG, TCFG, mesh, opt2, state_f)

    b = shard_batch(mesh, batch)
    for _ in range(3):
        state_dp, m_dp = step_dp(state_dp, b)
        state_f, m_f = step_f(state_f, b)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_dp["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m_f["grad_norm"]), float(m_dp["grad_norm"]), rtol=2e-4)
    for a, b_ in zip(jax.tree.leaves(state_f.params), jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
    # output shardings survived the step (state stays ZeRO-sharded)
    w = state_f.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, DATA_AXIS)


def test_fsdp_grad_accum_matches_plain():
    batch = _batch(seed=5)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])

    results = []
    for accum in (1, 2):
        opt = make_optimizer(TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(7), CFG)
        state = shard_state(mesh, init_train_state(params, opt))
        step = make_fsdp_train_step(CFG, TCFG, mesh, opt, state, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_fsdp_trainer_end_to_end_with_resume(tmp_path):
    """Trainer(tcfg.fsdp=True): sharded state through train -> orbax save ->
    fresh-Trainer restore -> placement back onto FSDP shardings."""
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(vocab_size=49408, context_length=16)  # real tokenizer range
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=8, image_size=32, n_batches=4, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=8,
        epochs=1,
        learning_rate=1e-3,
        warmup_steps=2,
        checkpoint_every_steps=3,  # final step 4 != cadence -> a final save with epoch=1 is written
        fsdp=True,
    )
    run = str(tmp_path / "fsdp_run")
    tr = Trainer(cfg, tcfg, data, run, mesh=mesh)
    w = tr.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, DATA_AXIS)
    tr.train()
    assert tr.global_step == 4
    final_a = jax.tree.map(np.asarray, jax.device_get(tr.state.params))

    tr2 = Trainer(cfg, tcfg, data, run, mesh=mesh)
    assert tr2.start_epoch == 1
    w2 = tr2.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w2.sharding.spec == jax.sharding.PartitionSpec(None, None, DATA_AXIS)
    final_b = jax.tree.map(np.asarray, jax.device_get(tr2.state.params))
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        np.testing.assert_array_equal(a, b)


def test_fsdp_tp_state_is_grid_sharded():
    """FSDP x TP composition: the channel-MLP weights are stored sharded over
    BOTH mesh axes (a data*model-way ZeRO saving), and the Adam moments
    follow the same grid shards."""
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    opt = make_optimizer(TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(0), CFG)
    state = shard_state(mesh, init_train_state(params, opt))

    from clip_mixer_tpu.parallel.mesh import MODEL_AXIS

    w = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]  # [L, W, 4W]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, DATA_AXIS, MODEL_AXIS)
    shard = w.addressable_shards[0].data
    assert shard.shape == (w.shape[0], w.shape[1] // 2, w.shape[2] // 2)
    wo = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_out"]  # [L, 4W, W]
    assert wo.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS, DATA_AXIS)
    # the moments land on the identical grid (path suffix matches the params)
    sharded_both = [
        l
        for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "sharding")
        and DATA_AXIS in tuple(l.sharding.spec)
        and MODEL_AXIS in tuple(l.sharding.spec)
    ]
    assert len(sharded_both) > 0


def test_fsdp_tp_matches_dp_exact_gather():
    """FSDP x TP on a (data=2, model=2) grid computes the same objective and
    updates as the shard_map DP step with grad_through_gather=True over the
    same 4 devices (pure DP) — the composition changes only the schedule."""
    batch = _batch(seed=11)
    mesh_dp = make_mesh(n_data=4, devices=jax.devices()[:4])
    opt = make_optimizer(TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(2), CFG)
    state_dp = replicate(mesh_dp, init_train_state(params, opt))
    step_dp = make_train_step(CFG, TCFG, mesh_dp, opt, grad_through_gather=True)

    mesh_ft = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    opt2 = make_optimizer(TCFG, total_steps=10)
    params2 = clip_model.init(jax.random.key(2), CFG)
    state_ft = shard_state(mesh_ft, init_train_state(params2, opt2))
    step_ft = make_fsdp_train_step(CFG, TCFG, mesh_ft, opt2, state_ft)

    for step_i in range(3):
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh_dp, batch))
        state_ft, m_ft = step_ft(state_ft, shard_batch(mesh_ft, batch))

    np.testing.assert_allclose(float(m_ft["loss"]), float(m_dp["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m_ft["grad_norm"]), float(m_dp["grad_norm"]), rtol=2e-4)
    for a, b_ in zip(jax.tree.leaves(state_ft.params), jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_fsdp_tp_transformer_with_accum():
    """The attention path (packed-QKV/head dims model-sharded in storage)
    trains under FSDP x TP with exact grad accumulation composed on top, and
    matches the same step at accum_steps=1."""
    cfg = CFG.replace(tower="transformer")
    batch = _batch(seed=13)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])

    results = []
    for accum in (1, 2):
        opt = make_optimizer(TCFG, total_steps=10)
        params = clip_model.init(jax.random.key(9), cfg)
        state = shard_state(mesh, init_train_state(params, opt))
        step = make_fsdp_train_step(cfg, TCFG, mesh, opt, state, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_fsdp_tp_trainer_end_to_end(tmp_path):
    """Trainer with tcfg.fsdp=True on a (data, model) mesh: grid-sharded
    state through train -> save -> restore directly into the grid shardings."""
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.parallel.mesh import MODEL_AXIS
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(vocab_size=49408, context_length=16)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    data = SyntheticSource(batch_size=8, image_size=32, n_batches=2, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=8, epochs=1, learning_rate=1e-3, warmup_steps=2,
        checkpoint_every_steps=2, fsdp=True,
    )
    run = str(tmp_path / "fsdp_tp_run")
    tr = Trainer(cfg, tcfg, data, run, mesh=mesh)
    w = tr.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, DATA_AXIS, MODEL_AXIS)
    tr.train()
    assert tr.global_step == 2
    final_a = jax.tree.map(np.asarray, jax.device_get(tr.state.params))

    tr2 = Trainer(cfg, tcfg, data, run, mesh=mesh)
    w2 = tr2.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w2.sharding.spec == jax.sharding.PartitionSpec(None, DATA_AXIS, MODEL_AXIS)
    final_b = jax.tree.map(np.asarray, jax.device_get(tr2.state.params))
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        np.testing.assert_array_equal(a, b)


def test_fsdp_transformer_tower_learns():
    cfg = CFG.replace(tower="transformer")
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=60)
    params = clip_model.init(jax.random.key(0), cfg)
    state = shard_state(mesh, init_train_state(params, opt))
    step = make_fsdp_train_step(cfg, TCFG, mesh, opt, state)
    batch = shard_batch(mesh, _batch())
    losses = []
    for _ in range(25):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_fsdp_siglip_matches_dp():
    """The sigmoid objective under FSDP (GSPMD, axis_name=None pairwise loss)
    == the shard_map DP siglip step (ppermute ring) — two entirely different
    collective structures, one objective."""
    scfg = CFG.replace(logit_bias_init=-10.0, logit_scale_init=float(np.log(10.0)))
    stcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2, loss="siglip")
    batch = _batch(seed=19)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])

    opt = make_optimizer(stcfg, total_steps=10)
    params = clip_model.init(jax.random.key(29), scfg)
    state_dp = replicate(mesh, init_train_state(params, opt))
    step_dp = make_train_step(scfg, stcfg, mesh, opt, grad_through_gather=True)

    opt2 = make_optimizer(stcfg, total_steps=10)
    params2 = clip_model.init(jax.random.key(29), scfg)
    state_f = shard_state(mesh, init_train_state(params2, opt2))
    step_f = make_fsdp_train_step(scfg, stcfg, mesh, opt2, state_f, accum_steps=2)

    b = shard_batch(mesh, batch)
    for _ in range(2):
        state_dp, m_dp = step_dp(state_dp, b)
        state_f, m_f = step_f(state_f, b)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_dp["loss"]), rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(state_f.params), jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
    assert float(jax.device_get(state_f.params["logit_bias"])) != -10.0


def test_fsdp_ema_stored_sharded_and_trainer_exports_it(tmp_path):
    """EMA under FSDP: the averaged copy lives in opt_state and stores
    SHARDED like its params (one extra params-size per the memory planner's
    pricing, not a replicated copy), survives Trainer save/resume, and the
    completion export writes the AVERAGE, not the raw params."""
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.parallel.train_step import ema_params
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(vocab_size=49408, context_length=16)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=8, image_size=32, n_batches=4, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=8, epochs=1, learning_rate=1e-3, warmup_steps=2,
        checkpoint_every_steps=3, fsdp=True, ema_decay=0.5,
    )
    run = str(tmp_path / "fsdp_ema")
    tr = Trainer(cfg, tcfg, data, run, mesh=mesh)
    ema0 = ema_params(tr.state)
    w = ema0["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, DATA_AXIS)
    tr.train()

    ema = jax.tree.map(np.asarray, jax.device_get(jax.jit(
        lambda x: x, out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )(ema_params(tr.state))))
    raw_w = np.asarray(jax.device_get(
        jax.jit(lambda x: x, out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))(
            tr.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"])))
    assert not np.allclose(ema["visual"]["tower"]["blocks"]["channel_mix"]["w_in"], raw_w)

    # resume restores the EMA bitwise (it rides the generic opt_state tree)
    tr2 = Trainer(cfg, tcfg, data, run, mesh=mesh)
    ema_b = jax.tree.map(np.asarray, jax.device_get(jax.jit(
        lambda x: x, out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )(ema_params(tr2.state))))
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(ema_b)):
        np.testing.assert_array_equal(a, b)

    # the export bridge wrote the averaged weights
    from clip_mixer_tpu.api import load_pretrained

    exported, _cfg = load_pretrained(f"{run}/export")
    np.testing.assert_allclose(
        np.asarray(exported["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]),
        ema["visual"]["tower"]["blocks"]["channel_mix"]["w_in"], atol=1e-7,
    )
