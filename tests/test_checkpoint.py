"""Checkpoint/resume gates: round-trip fidelity and kill-and-resume
bit-determinism (SURVEY §5: same resume semantics as the reference's
save_state + epoch.json + skip_first_batches)."""

import numpy as np
import pytest

import jax

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.checkpoint import Checkpointer
from clip_mixer_tpu.train.optimizer import make_optimizer

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=16,
    vision_layers=1,
    vision_width=32,
    vision_patch_size=8,
    context_length=8,
    vocab_size=64,
    text_width=32,
    text_heads=1,
    text_layers=1,
    tower="mixer",
    compute_dtype="float32",
)
TCFG = TrainConfig(learning_rate=1e-3, warmup_steps=1)


def _batch(seed, B=8):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 256, (B, 16, 16, 3), dtype=np.uint8),
        "texts": np.concatenate(
            [
                np.full((B, 1), 62, np.int32),
                rng.integers(1, 60, (B, 6), dtype=np.int32),
                np.full((B, 1), 63, np.int32),
            ],
            axis=1,
        ),
    }


def _fresh(mesh, opt):
    params = clip_model.init(jax.random.key(0), CFG)
    return replicate(mesh, init_train_state(params, opt))


def test_roundtrip_and_resume_determinism(tmp_path):
    mesh = make_mesh()
    opt = make_optimizer(TCFG, total_steps=20)
    step_fn = make_train_step(CFG, TCFG, mesh, opt)

    # Run A: 6 steps straight through, saving at step 3.
    ckpt_dir = tmp_path / "ckpt"
    ck = Checkpointer(str(ckpt_dir), async_save=False)
    state = _fresh(mesh, opt)
    for i in range(6):
        state, m = step_fn(state, shard_batch(mesh, _batch(i)))
        if i == 2:
            ck.save(state, epoch=0, step=3)
    ck.wait()
    loss_a = float(m["loss"])
    params_a = jax.tree.map(np.asarray, state.params)

    # Run B: restore at step 3, replay the same remaining data.
    ck2 = Checkpointer(str(ckpt_dir), async_save=False)
    restored = ck2.restore(_fresh(mesh, opt))
    assert restored is not None
    state_b, epoch, step = restored
    assert (epoch, step) == (0, 3)
    assert int(state_b.step) == 3
    for i in range(3, 6):
        state_b, m_b = step_fn(state_b, shard_batch(mesh, _batch(i)))
    loss_b = float(m_b["loss"])
    params_b = jax.tree.map(np.asarray, state_b.params)

    # Bit-deterministic resume: identical final loss and params.
    assert loss_a == loss_b
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_array_equal(a, b)


def test_restore_none_when_empty(tmp_path):
    mesh = make_mesh()
    opt = make_optimizer(TCFG, total_steps=20)
    ck = Checkpointer(str(tmp_path / "empty"), async_save=False)
    assert ck.restore(_fresh(mesh, opt)) is None
    assert ck.latest_step() is None


def test_max_to_keep(tmp_path):
    mesh = make_mesh()
    opt = make_optimizer(TCFG, total_steps=20)
    ck = Checkpointer(str(tmp_path / "k"), max_to_keep=2, async_save=False)
    state = _fresh(mesh, opt)
    for s in (1, 2, 3):
        ck.save(state, epoch=0, step=s, step_id=s)
    ck.wait()
    assert ck.latest_step() == 3
    # retention actually pruned: exactly the newest two step dirs remain
    kept = sorted(int(p.name) for p in (tmp_path / "k").iterdir() if p.name.isdigit())
    assert kept == [2, 3]


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption safety: SIGTERM mid-training makes the Trainer checkpoint
    the completed step and exit cleanly; a fresh Trainer resumes from it."""
    import os
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    run_dir = str(tmp_path / "preempt_run")
    child = tmp_path / "child.py"
    child.write_text(f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.data.pipeline import SyntheticSource
from clip_mixer_tpu.train.trainer import Trainer

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32")
# cadence far beyond reach: ONLY the preemption path can produce a checkpoint
tcfg = TrainConfig(global_batch_size=8, epochs=1, steps_per_epoch=100000,
                   learning_rate=1e-3, warmup_steps=2, checkpoint_every_steps=10**6)
data = SyntheticSource(batch_size=8, image_size=16, n_batches=100000, context_length=16)
tr = Trainer(cfg, tcfg, data, {run_dir!r}, verbose=True)
print("READY", flush=True)
tr.train()
print("EXITED_CLEANLY step", tr.global_step, flush=True)
""")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    p = subprocess.Popen(
        [sys.executable, str(child)], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, env=env, text=True,
    )
    try:
        # wait for READY, give it time to take a few steps, then preempt
        deadline = time.monotonic() + 120
        line = ""
        while "READY" not in line:
            line = p.stdout.readline()
            assert line, "child died before READY"
            assert time.monotonic() < deadline
        time.sleep(5)
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out[-3000:]
    assert "preemption save: step" in out and "EXITED_CLEANLY" in out, out[-2000:]

    # a fresh Trainer resumes from the preemption checkpoint
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CFG.replace(context_length=16, vocab_size=49408)
    tcfg = TrainConfig(global_batch_size=8, epochs=1, steps_per_epoch=100000,
                       learning_rate=1e-3, warmup_steps=2, checkpoint_every_steps=10**6)
    data = SyntheticSource(batch_size=8, image_size=16, n_batches=100000, context_length=16)
    tr = Trainer(cfg, tcfg, data, run_dir)
    assert tr.global_step > 0
    assert tr.start_batch == tr.global_step  # epoch 0: batch index == step
