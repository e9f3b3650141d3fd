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


def _wait_for_line(p, token: str, timeout: float = 120.0) -> None:
    """Read child stdout until a line contains ``token``, honoring the
    deadline even while the child prints nothing. select() before each
    readline: a bare readline blocks with the pipe open, so a child wedged
    BEFORE its first print (compile stall) would hang the suite instead of
    failing cleanly."""
    import select
    import time

    deadline = time.monotonic() + timeout
    line = ""
    while token not in line:
        remaining = deadline - time.monotonic()
        assert remaining > 0, f"timed out waiting for {token}"
        ready, _, _ = select.select([p.stdout], [], [], remaining)
        assert ready, f"timed out waiting for {token}"
        line = p.stdout.readline()
        assert line, f"child died before {token}"


def _wait_for_ready(p, timeout: float = 120.0) -> None:
    _wait_for_line(p, "READY", timeout)


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
        _wait_for_ready(p)
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


def test_sigterm_while_blocked_on_data_still_checkpoints(tmp_path):
    """Preemption must not depend on the data pipeline making progress: a
    SIGTERM while the trainer is BLOCKED waiting for a stalled source (hung
    tar read, dead decode worker) still checkpoints the completed steps and
    exits cleanly inside the grace window (prefetch's interruptible wait)."""
    import os
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    run_dir = str(tmp_path / "stall_run")
    child = tmp_path / "child.py"
    child.write_text(f"""
import sys
import time
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.data.pipeline import SyntheticSource
from clip_mixer_tpu.train.trainer import Trainer

class StallAfter:
    \"\"\"Yields the inner source's batches, then hangs forever.\"\"\"
    def __init__(self, inner):
        self.inner = inner
        self.batches_per_epoch = 100000
    def iter_batches(self, epoch, start_batch=0):
        yield from self.inner.iter_batches(epoch, start_batch)
        print("STALLED", flush=True)
        time.sleep(100000)

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32")
tcfg = TrainConfig(global_batch_size=8, epochs=1, steps_per_epoch=100000,
                   learning_rate=1e-3, warmup_steps=2, checkpoint_every_steps=10**6)
data = StallAfter(SyntheticSource(batch_size=8, image_size=16, n_batches=1, context_length=16))
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
        _wait_for_ready(p)
        # the single batch is prefetched immediately, so STALLED prints right
        # away; the long sleep then lets the consumer finish compiling and
        # stepping batch 1 and settle into the BLOCKED data wait before the
        # signal lands. (With the old blocking q.get() this SIGTERM would
        # hang the child forever and communicate() below would time out.)
        _wait_for_line(p, "STALLED")
        time.sleep(20)
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out[-3000:]
    assert "preemption save: step 1" in out and "EXITED_CLEANLY" in out, out[-2000:]


def test_keep_checkpoints_retention(tmp_path):
    """tcfg.keep_checkpoints bounds the orbax retention window."""
    import jax
    import numpy as np

    from clip_mixer_tpu.config import CLIPConfig, TrainConfig
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.parallel.mesh import make_mesh
    from clip_mixer_tpu.train.trainer import Trainer

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
        vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
        text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32",
    )
    tcfg = TrainConfig(global_batch_size=4, epochs=1, learning_rate=1e-3,
                       warmup_steps=1, checkpoint_every_steps=1, keep_checkpoints=2)
    tr = Trainer(
        cfg, tcfg,
        SyntheticSource(batch_size=4, image_size=16, n_batches=5, context_length=16),
        str(tmp_path / "keep"), mesh=make_mesh(n_data=1, devices=jax.devices()[:1]),
    )
    tr.train()
    assert len(tr.checkpointer.all_steps()) == 2  # only the last two survive


def test_crash_during_save_resume(tmp_path):
    """Crash-during-checkpoint-save: SIGKILL a child while its async orbax
    save of step 6 is mid-write — exactly the state a preempted pod leaves
    behind (observed live: a crashed dress rehearsal left
    outputs/dress500/checkpoints/400.orbax-checkpoint-tmp). Prove the full
    recovery contract:

    * the interrupted save leaves a ``6.orbax-checkpoint-tmp`` dir and NO
      committed ``6`` (orbax commits by atomic rename);
    * the supervisor's progress detector (launch.latest_checkpoint_step)
      does not count the tmp as progress;
    * a fresh Checkpointer on the dir removes the tmp, reports latest == 4,
      and restores the step-4 state bit-exactly;
    * re-saving step 6 afterwards commits normally.
    """
    import os
    import signal
    import subprocess
    import sys
    from pathlib import Path

    from clip_mixer_tpu.launch import latest_checkpoint_step

    repo = str(Path(__file__).resolve().parents[1])
    ckpt_dir = tmp_path / "crash_ckpts"
    child = tmp_path / "child.py"
    # A ~64MB filler leaf (plus its Adam moments) makes the async step-6
    # save slow enough that an immediate SIGKILL lands mid-write.
    child.write_text(f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from clip_mixer_tpu.parallel.train_step import TrainState
from clip_mixer_tpu.train.checkpoint import Checkpointer

params = {{"w": jnp.arange(8.0), "big": jnp.zeros((1 << 24,), jnp.float32)}}
state4 = TrainState(params=params, opt_state=(), step=jnp.asarray(4, jnp.int32))
ck = Checkpointer({str(ckpt_dir)!r}, async_save=True)
ck.save(state4, epoch=0, step=4)
ck.wait()
state6 = TrainState(params={{"w": jnp.arange(8.0) * 3,
                            "big": jnp.ones((1 << 24,), jnp.float32)}},
                    opt_state=(), step=jnp.asarray(6, jnp.int32))
ck.save(state6, epoch=0, step=6)
print("SAVE6_DISPATCHED", flush=True)
ck.wait()
print("SAVE6_COMMITTED", flush=True)
""")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    p = subprocess.Popen([sys.executable, str(child)], stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, env=env, text=True)
    try:
        _wait_for_line(p, "SAVE6_DISPATCHED", timeout=300)
        os.kill(p.pid, signal.SIGKILL)
    finally:
        p.wait()
    entries = sorted(os.listdir(ckpt_dir))
    assert "4" in entries, entries
    tmps = [e for e in entries if ".orbax-checkpoint-tmp" in e]
    if not tmps:
        # The async write raced the SIGKILL and won — rare on this host
        # (64MB + moments), but not a correctness failure. Manufacture the
        # observed artifact instead so the recovery contract is still
        # exercised deterministically.
        import shutil

        shutil.copytree(ckpt_dir / "4", ckpt_dir / "6.orbax-checkpoint-tmp")
        entries = sorted(os.listdir(ckpt_dir))
        tmps = ["6.orbax-checkpoint-tmp"]
    assert "6" not in entries, entries  # never a committed 6

    # supervisor progress budget: the tmp is NOT progress
    assert latest_checkpoint_step(str(ckpt_dir)) == 4

    import jax.numpy as jnp

    from clip_mixer_tpu.parallel.train_step import TrainState

    template = TrainState(
        params={"w": jnp.zeros(8), "big": jnp.zeros((1 << 24,), jnp.float32)},
        opt_state=(), step=jnp.asarray(0, jnp.int32),
    )
    ck = Checkpointer(str(ckpt_dir), async_save=False)
    # init removed the interrupted tmp dir(s)
    left = sorted(os.listdir(ckpt_dir))
    assert not any(".orbax-checkpoint-tmp" in e for e in left), left
    assert ck.latest_step() == 4
    state, epoch, step = ck.restore(template)
    assert (epoch, step, int(state.step)) == (0, 4, 4)
    np.testing.assert_array_equal(np.asarray(state.params["w"]), np.arange(8.0))

    # life goes on: the rerun reaches step 6 and commits it cleanly
    state6 = TrainState(params={"w": jnp.arange(8.0) * 3,
                                "big": jnp.ones((1 << 24,), jnp.float32)},
                        opt_state=(), step=jnp.asarray(6, jnp.int32))
    ck.save(state6, epoch=0, step=6)
    ck.wait()
    assert ck.latest_step() == 6
    assert latest_checkpoint_step(str(ckpt_dir)) == 6
