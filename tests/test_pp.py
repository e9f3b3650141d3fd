"""Pipeline-parallelism gates on the virtual CPU mesh.

- the GPipe tower schedule (parallel/pp.py) computes EXACTLY what the plain
  lax.scan tower computes (forward equivalence, both tower families);
- the full PP train step matches the DP train step (loss, grad norm, params
  after several steps) — the collective-gradient fixups (f_psum at the
  pipeline input, predicated-collect + g_psum at the output) deliver
  bit-identical replicated gradients on every stage rank;
- microbatch counts > stages work (the fill-drain schedule with real
  bubbles), and a 4-stage pipeline works.

Meshes stay at <= 4 devices (XLA:CPU collective rendezvous, CLAUDE.md).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.models.mixer import mixer_block, mixer_tower
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.pp import (
    STAGE_AXIS,
    make_pp_mesh,
    make_pp_train_step,
    pipeline_tower,
    place_pp_state,
    pp_param_specs,
)
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.optimizer import make_optimizer

CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=4,
    vision_width=64,
    vision_patch_size=16,
    context_length=12,
    vocab_size=256,
    text_width=64,
    text_heads=1,
    text_layers=4,
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


def _tower_params(key, n_layers=4):
    from clip_mixer_tpu.models.mixer import init_mixer_tower

    return init_mixer_tower(key, width=64, tokens=8, n_layers=n_layers, text_tower=True)


def test_pipeline_forward_matches_scan():
    """2 stages x {2, 4} microbatches == the plain scanned tower, exactly."""
    tower = _tower_params(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 8, 64), jnp.float32)
    ref = mixer_tower(tower, x)

    mesh = make_pp_mesh(n_data=1, n_stage=2, devices=jax.devices()[:2])
    for n_micro in (2, 4):
        run = jax.jit(
            jax.shard_map(
                lambda blocks, xx: pipeline_tower(
                    blocks, xx, lambda lp, h: mixer_block(lp, h), 2, n_micro
                ),
                mesh=mesh,
                in_specs=(P(STAGE_AXIS), P()),
                out_specs=P(),
                check_vma=False,
            )
        )
        out = run(tower["blocks"], x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_forward_4_stages():
    tower = _tower_params(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (8, 8, 64), jnp.float32)
    ref = mixer_tower(tower, x)
    mesh = make_pp_mesh(n_data=1, n_stage=4, devices=jax.devices()[:4])
    run = jax.jit(
        jax.shard_map(
            lambda blocks, xx: pipeline_tower(
                blocks, xx, lambda lp, h: mixer_block(lp, h), 4, 4
            ),
            mesh=mesh,
            in_specs=(P(STAGE_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(np.asarray(run(tower["blocks"], x)), np.asarray(ref), atol=1e-6)


def _run_steps(step, state, batch, mesh, n=3):
    b = shard_batch(mesh, batch)
    m = None
    for _ in range(n):
        state, m = step(state, b)
    return jax.device_get(state.params), jax.device_get(m)


def test_pp_train_step_matches_dp():
    """(data=2, stage=2) PP step == 2-device DP step: same loss trajectory,
    same parameters — block grads computed on their stage, replicated grads
    bit-consistent across stages."""
    batch = _batch(seed=3)

    mesh_dp = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=10)
    params = clip_model.init(jax.random.key(1), CFG)
    state = replicate(mesh_dp, init_train_state(params, opt))
    p_dp, m_dp = _run_steps(make_train_step(CFG, TCFG, mesh_dp, opt), state, batch, mesh_dp)

    mesh_pp = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])
    opt2 = make_optimizer(TCFG, total_steps=10)
    params2 = clip_model.init(jax.random.key(1), CFG)
    state2 = place_pp_state(mesh_pp, init_train_state(params2, opt2))
    step_pp = make_pp_train_step(CFG, TCFG, mesh_pp, opt2, n_micro=2)
    p_pp, m_pp = _run_steps(step_pp, state2, batch, mesh_pp)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]), float(m_dp["grad_norm"]), rtol=2e-4)
    for a, b_ in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_pp_matches_dp_under_remat():
    """train.py defaults remat ON — the PP schedule must stay equivalent
    with jax.checkpoint wrapping each stage's block body."""
    cfg = CFG.replace(remat=True)
    batch = _batch(seed=11)

    mesh_dp = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=10)
    state = replicate(mesh_dp, init_train_state(clip_model.init(jax.random.key(9), cfg), opt))
    p_dp, m_dp = _run_steps(make_train_step(cfg, TCFG, mesh_dp, opt), state, batch, mesh_dp, n=2)

    mesh_pp = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])
    opt2 = make_optimizer(TCFG, total_steps=10)
    state2 = place_pp_state(mesh_pp, init_train_state(clip_model.init(jax.random.key(9), cfg), opt2))
    p_pp, m_pp = _run_steps(make_pp_train_step(cfg, TCFG, mesh_pp, opt2, n_micro=2), state2, batch, mesh_pp, n=2)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_pp_transformer_tower_matches_dp():
    cfg = CFG.replace(tower="transformer")
    batch = _batch(seed=7)

    mesh_dp = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=10)
    state = replicate(mesh_dp, init_train_state(clip_model.init(jax.random.key(5), cfg), opt))
    p_dp, m_dp = _run_steps(make_train_step(cfg, TCFG, mesh_dp, opt), state, batch, mesh_dp, n=2)

    mesh_pp = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])
    opt2 = make_optimizer(TCFG, total_steps=10)
    state2 = place_pp_state(mesh_pp, init_train_state(clip_model.init(jax.random.key(5), cfg), opt2))
    step_pp = make_pp_train_step(cfg, TCFG, mesh_pp, opt2, n_micro=4)
    p_pp, m_pp = _run_steps(step_pp, state2, batch, mesh_pp, n=2)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_pp_grad_accum_matches_plain():
    """Exact two-pass accumulation composed with the pipeline: accum 2 x
    (pipeline n_micro 2 per chunk) == one full-batch PP step."""
    batch = _batch(seed=13)
    mesh = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])

    results = []
    for accum in (1, 2):
        opt = make_optimizer(TCFG, total_steps=10)
        state = place_pp_state(mesh, init_train_state(clip_model.init(jax.random.key(3), CFG), opt))
        step = make_pp_train_step(CFG, TCFG, mesh, opt, n_micro=2, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, batch))
        results.append((jax.device_get(state.params), jax.device_get(m)))

    (p1, m1), (p2, m2) = results
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_pp_param_specs_shard_blocks_only():
    params = clip_model.init(jax.random.key(0), CFG)
    specs = pp_param_specs(params, 2)
    assert specs["visual"]["tower"]["blocks"]["channel_mix"]["w_in"] == P(STAGE_AXIS)
    assert specs["visual"]["patch_embed"]["kernel"] == P()
    assert specs["logit_scale"] == P()


def test_pp_state_is_stored_stage_sharded():
    mesh = make_pp_mesh(n_data=1, n_stage=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=10)
    state = place_pp_state(mesh, init_train_state(clip_model.init(jax.random.key(0), CFG), opt))
    w = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]  # [L=4, W, 4W]
    assert w.sharding.spec == P(STAGE_AXIS)
    assert w.addressable_shards[0].data.shape == (2, w.shape[1], w.shape[2])


def test_pp_trainer_end_to_end(tmp_path):
    """Trainer auto-selects the PP step when the mesh carries a stage axis;
    state is stage-sharded and the loss decreases."""
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(vocab_size=49408, context_length=16)
    mesh = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])
    data = SyntheticSource(batch_size=8, image_size=32, n_batches=6, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=8,
        epochs=1,
        learning_rate=1e-3,
        warmup_steps=2,
        checkpoint_every_steps=100,
        pipeline_microbatches=2,
    )
    tr = Trainer(cfg, tcfg, data, str(tmp_path / "pp_run"), mesh=mesh)
    w = tr.state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]
    assert w.sharding.spec == P(STAGE_AXIS)
    tr.train()
    losses = [v for v in tr.writer.history["Loss"]]
    assert len(losses) == 6 and np.isfinite([l[1] for l in losses]).all()


def test_pp_rejects_fsdp_combination(tmp_path):
    import pytest

    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(vocab_size=49408, context_length=16)
    mesh = make_pp_mesh(n_data=1, n_stage=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=4, image_size=32, n_batches=2, context_length=16)
    tcfg = TrainConfig(global_batch_size=4, epochs=1, warmup_steps=2, fsdp=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(cfg, tcfg, data, str(tmp_path / "x"), mesh=mesh)


def test_pp_rejects_resnet_and_indivisible_depth():
    import pytest

    mesh = make_pp_mesh(n_data=1, n_stage=2, devices=jax.devices()[:2])
    opt = make_optimizer(TCFG, total_steps=10)
    rn = CFG.replace(vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
                     tower="transformer")
    with pytest.raises(NotImplementedError):
        make_pp_train_step(rn, TCFG, mesh, opt, n_micro=2)
    with pytest.raises(AssertionError):
        make_pp_train_step(CFG.replace(vision_layers=3), TCFG, mesh, opt, n_micro=2)


def test_pp_siglip_matches_dp():
    """The sigmoid objective through the pipeline: (data=2, stage=2) PP ==
    2-device DP — the ppermute ring over the data axis runs identically in
    every stage column, and the logit_bias grad stays stage-consistent."""
    scfg = CFG.replace(logit_bias_init=-10.0, logit_scale_init=float(np.log(10.0)))
    stcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2, loss="siglip")
    batch = _batch(seed=23)

    mesh_dp = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(stcfg, total_steps=10)
    state = replicate(mesh_dp, init_train_state(clip_model.init(jax.random.key(31), scfg), opt))
    p_dp, m_dp = _run_steps(make_train_step(scfg, stcfg, mesh_dp, opt), state, batch, mesh_dp, n=2)

    mesh_pp = make_pp_mesh(n_data=2, n_stage=2, devices=jax.devices()[:4])
    opt2 = make_optimizer(stcfg, total_steps=10)
    state2 = place_pp_state(mesh_pp, init_train_state(clip_model.init(jax.random.key(31), scfg), opt2))
    p_pp, m_pp = _run_steps(make_pp_train_step(scfg, stcfg, mesh_pp, opt2, n_micro=2), state2, batch, mesh_pp, n=2)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_dp["loss"]), rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
    assert float(p_pp["logit_bias"]) != -10.0
