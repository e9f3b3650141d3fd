"""Two-process jax.distributed smoke test — real multi-host code path.

The reference ran 2-node jobs via AzureML + accelerate launch
(launchJob.py:88-96); our equivalent is jax.distributed.initialize + a mesh
spanning processes, per-host TarShardSource shards, and
jax.make_array_from_process_local_data assembling the global batch
(parallel/mesh.shard_batch multi-process branch). None of that executes
under the in-process 8-virtual-device tests — this test actually spawns two
processes with a real coordinator and checks:

* disjoint per-host shard assignment feeding one global batch;
* one sharded train step executing across processes;
* the resulting loss equals a single-process 2-virtual-device run on the
  same global batch (distributed-correctness oracle).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = str(Path(__file__).resolve().parents[1])

WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
shard_dir = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, REPO)

import numpy as np
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.data.pipeline import TarShardSource
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.optimizer import make_optimizer

assert jax.process_count() == 2 and jax.device_count() == 2

import glob
paths = sorted(glob.glob(shard_dir + "/*.tar"))
src = TarShardSource(paths, batch_size=4, image_size=16, context_length=16,
                     n_hosts=2, host_index=pid, drop_last=True)

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32")
tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
mesh = make_mesh()  # all 2 global devices
opt = make_optimizer(tcfg, total_steps=10)
params = clip_model.init(jax.random.key(0), cfg)
state = replicate(mesh, init_train_state(params, opt))
step = make_train_step(cfg, tcfg, mesh, opt)

local = next(src.iter_batches(epoch=0))
batch = shard_batch(mesh, dict(local))   # make_array_from_process_local_data path
state, metrics = step(state, batch)

# FSDP leg: params + Adam moments sharded ACROSS PROCESSES (each process
# device_puts its addressable shard), GSPMD step over the same global batch.
from clip_mixer_tpu.parallel.fsdp import make_fsdp_train_step, shard_state
opt_f = make_optimizer(tcfg, total_steps=10)
state_f = shard_state(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt_f))
emb = state_f.params["text"]["token_embedding"]
local_shard_shapes = [tuple(s.data.shape) for s in emb.addressable_shards]
step_f = make_fsdp_train_step(cfg, tcfg, mesh, opt_f, state_f)
state_f, metrics_f = step_f(state_f, shard_batch(mesh, dict(local)))

out = {
    "pid": pid,
    "shards": [p.split("/")[-1] for p in src.shards],
    "loss": float(jax.device_get(metrics["loss"])),
    "fsdp_loss": float(jax.device_get(metrics_f["loss"])),
    "fsdp_local_shards": local_shard_shapes,
    "fsdp_emb_shape": list(emb.shape),
    "local_texts_sum": int(np.asarray(local["texts"]).sum()),
}
print("RESULT " + json.dumps(out), flush=True)
"""


WORKER_FSDP_TP = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid = int(sys.argv[1])
port = sys.argv[2]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, REPO)

import numpy as np
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.fsdp import make_fsdp_train_step, shard_state
from clip_mixer_tpu.parallel.mesh import make_mesh, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state
from clip_mixer_tpu.train.optimizer import make_optimizer

assert jax.process_count() == 2 and jax.device_count() == 4
assert jax.local_device_count() == 2

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32")
tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
# (data=2, model=2): jax.devices() orders process 0's devices first, so the
# DATA axis spans the two processes and the MODEL axis stays intra-process
# (the axis-placement rule of SCALING.md: per-layer psum traffic inside a
# host, one data reduction across).
mesh = make_mesh(n_data=2, n_model=2)
opt = make_optimizer(tcfg, total_steps=10)
state = shard_state(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt))

w = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]  # [1, 32, 128]
w_local = sorted(tuple(s.data.shape) for s in w.addressable_shards)
emb = state.params["text"]["token_embedding"]  # [49408, 32]
emb_local = sorted(tuple(s.data.shape) for s in emb.addressable_shards)

step = make_fsdp_train_step(cfg, tcfg, mesh, opt, state, accum_steps=2)
rng = np.random.default_rng(7)
local = {
    "images": rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8),
    "texts": np.zeros((4, 16), np.int32),
}
local["texts"][:, 0] = 49406
local["texts"][:, 1] = 300 + pid * 4 + np.arange(4)
local["texts"][:, 2] = 49407
state, metrics = step(state, shard_batch(mesh, local))

out = {
    "pid": pid,
    "loss": float(jax.device_get(metrics["loss"])),
    "w_local": w_local,
    "emb_local": emb_local,
}
print("RESULT " + json.dumps(out), flush=True)
"""


WORKER_PP = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, REPO)

import numpy as np
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import shard_batch
from clip_mixer_tpu.parallel.pp import make_pp_mesh, make_pp_train_step, place_pp_state
from clip_mixer_tpu.parallel.train_step import init_train_state
from clip_mixer_tpu.train.optimizer import make_optimizer

assert jax.process_count() == 2 and jax.device_count() == 2

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=2, tower="mixer", compute_dtype="float32")
tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
# (data=1, stage=2): the STAGE axis spans the two processes, so every
# ppermute activation hop in the GPipe schedule crosses a process boundary.
mesh = make_pp_mesh(n_data=1, n_stage=2)
opt = make_optimizer(tcfg, total_steps=10)
state = place_pp_state(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt))

blk = state.params["visual"]["tower"]["blocks"]["channel_mix"]["w_in"]  # [2, 32, 128]
blk_local = sorted(tuple(s.data.shape) for s in blk.addressable_shards)

step = make_pp_train_step(cfg, tcfg, mesh, opt, n_micro=2)
# identical deterministic batch on both processes (data axis is 1-wide)
rng = np.random.default_rng(11)
texts = np.zeros((8, 16), np.int32)
texts[:, 0] = 49406
texts[:, 1] = 200 + np.arange(8)
texts[:, 2] = 49407
batch = {"images": rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8), "texts": texts}
state, metrics = step(state, shard_batch(mesh, batch))

out = {
    "pid": pid,
    "loss": float(jax.device_get(metrics["loss"])),
    "blk_local": blk_local,
}
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_workers(tmp_path, worker_src: str, extra_args=()):
    """Spawn two coordinated worker processes and return their RESULT dicts
    (pid order). Shared harness: free coordinator port, XLA_FLAGS scrubbed
    (workers set their own device counts), and both processes killed on any
    failure — one worker dying leaves its sibling blocked in the rendezvous,
    and an orphan would hold the coordinator port for the rest of the suite."""
    worker = tmp_path / "worker.py"
    worker.write_text(f"REPO = {REPO!r}\n" + worker_src)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), *map(str, extra_args)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            outs.append(json.loads(line[len("RESULT "):]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return sorted(outs, key=lambda o: o["pid"])


def test_two_process_distributed_train_step(tmp_path):
    # Build 4 deterministic tar shards shared by both "hosts".
    sys.path.insert(0, REPO)
    from clip_mixer_tpu.data.pipeline import write_tar_shards

    rng = np.random.default_rng(0)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"caption {i}") for i in range(16)]
    shard_dir = tmp_path / "shards"
    write_tar_shards(iter(samples), str(shard_dir), samples_per_shard=4)

    r0, r1 = _run_two_workers(tmp_path, WORKER, extra_args=(shard_dir,))
    # Disjoint shard assignment, different local data.
    assert set(r0["shards"]).isdisjoint(r1["shards"])
    assert len(r0["shards"]) == len(r1["shards"]) == 2
    assert r0["local_texts_sum"] != r1["local_texts_sum"]
    # Both processes computed the SAME global loss (pmean'd over the mesh).
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    # FSDP: each process holds exactly ONE addressable half-shard of the
    # embedding ([49408, 16] of [49408, 32]) — the state is genuinely
    # partitioned across hosts — and both agree on the global loss, which
    # matches the DP loss (same params, same objective value at step 1).
    for r in (r0, r1):
        assert r["fsdp_emb_shape"] == [49408, 32]
        assert r["fsdp_local_shards"] == [[49408, 16]]
    assert r0["fsdp_loss"] == pytest.approx(r1["fsdp_loss"], abs=1e-6)
    assert r0["fsdp_loss"] == pytest.approx(r0["loss"], abs=1e-5)

    # Oracle: single-process run over the same global batch on a 2-virtual-
    # device mesh (conftest provides 8) must produce the same loss.
    import jax

    from clip_mixer_tpu.config import CLIPConfig, TrainConfig
    from clip_mixer_tpu.data.pipeline import TarShardSource
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    import glob

    paths = sorted(glob.glob(str(shard_dir) + "/*.tar"))
    # Reassemble the global batch exactly as the two hosts saw it:
    # host h takes shards with index % 2 == h; global batch = concat of the
    # two local halves in process order.
    h0 = TarShardSource(paths, batch_size=4, image_size=16, context_length=16, n_hosts=2, host_index=0, drop_last=True)
    h1 = TarShardSource(paths, batch_size=4, image_size=16, context_length=16, n_hosts=2, host_index=1, drop_last=True)
    b0 = next(h0.iter_batches(epoch=0))
    b1 = next(h1.iter_batches(epoch=0))
    global_batch = {
        "images": np.concatenate([b0["images"], b1["images"]]),
        "texts": np.concatenate([b0["texts"], b1["texts"]]),
    }

    cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                     vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                     text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32")
    tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(tcfg, total_steps=10)
    params = clip_model.init(jax.random.key(0), cfg)
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(cfg, tcfg, mesh, opt)
    _, metrics = step(state, shard_batch(mesh, global_batch))
    oracle = float(jax.device_get(metrics["loss"]))
    assert r0["loss"] == pytest.approx(oracle, abs=5e-6)


def test_two_process_fsdp_tp_grid(tmp_path):
    """FSDP x TP across REAL process boundaries: 2 processes x 2 devices
    form a (data=2, model=2) grid — the data axis spans processes, the model
    axis stays intra-process — with the state stored sharded over the full
    grid and the exact-accum GSPMD step executing across both."""
    r0, r1 = outs = _run_two_workers(tmp_path, WORKER_FSDP_TP)
    # channel w_in [1, 32, 128] grid-sharded (data on W, model on H): each
    # process holds its data-row's TWO model shards of [1, 16, 64].
    for r in outs:
        assert r["w_local"] == [[1, 16, 64], [1, 16, 64]]
        # token embedding [49408, 32]: data-sharded only — one [49408, 16]
        # half per data row, replicated over the intra-process model axis.
        assert r["emb_local"] == [[49408, 16], [49408, 16]]
    # Both processes agree on the global loss of the grid step.
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    assert np.isfinite(r0["loss"])


def test_two_process_pipeline_stage_hops(tmp_path):
    """PP across REAL process boundaries: (data=1, stage=2) with one process
    per stage, so every GPipe ppermute hop (and the autodiff-derived reverse
    hops in backward) crosses processes. Each process must hold exactly its
    stage's block slice, agree on the global loss, and match the DP oracle
    (PP is DP-equivalent by construction)."""
    r0, r1 = outs = _run_two_workers(tmp_path, WORKER_PP)
    for r in outs:
        # stacked blocks [2, 32, 128] stage-sharded on the layer axis:
        # exactly ONE [1, 32, 128] slice addressable per process
        assert r["blk_local"] == [[1, 32, 128]]
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)

    # DP oracle on the same deterministic batch, single device in-process.
    import jax

    from clip_mixer_tpu.config import CLIPConfig, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=2, vision_width=32,
                     vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                     text_heads=1, text_layers=2, tower="mixer", compute_dtype="float32")
    tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2)
    rng = np.random.default_rng(11)
    texts = np.zeros((8, 16), np.int32)
    texts[:, 0] = 49406
    texts[:, 1] = 200 + np.arange(8)
    texts[:, 2] = 49407
    batch = {"images": rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8), "texts": texts}

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    opt = make_optimizer(tcfg, total_steps=10)
    state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt))
    _, metrics = make_train_step(cfg, tcfg, mesh, opt)(state, shard_batch(mesh, batch))
    oracle = float(jax.device_get(metrics["loss"]))
    assert r0["loss"] == pytest.approx(oracle, abs=1e-5)


WORKER_SIGLIP = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, REPO)

import numpy as np
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.optimizer import make_optimizer

assert jax.process_count() == 2 and jax.device_count() == 2

cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                 vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                 text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32",
                 logit_bias_init=-10.0)
tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2, loss="siglip")
# data axis spans the two processes: every tick of the siglip ppermute ring
# hops the text chunk across the process boundary.
mesh = make_mesh()
opt = make_optimizer(tcfg, total_steps=10)
state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt))
step = make_train_step(cfg, tcfg, mesh, opt)

rng = np.random.default_rng(31 + pid)
local = {
    "images": rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8),
    "texts": np.zeros((4, 16), np.int32),
}
local["texts"][:, 0] = 49406
local["texts"][:, 1] = 700 + pid * 4 + np.arange(4)
local["texts"][:, 2] = 49407
state, metrics = step(state, shard_batch(mesh, local))

out = {
    "pid": pid,
    "loss": float(jax.device_get(metrics["loss"])),
    "logit_bias": float(jax.device_get(state.params["logit_bias"])),
}
print("RESULT " + json.dumps(out), flush=True)
"""


def test_two_process_siglip_ring(tmp_path):
    """SigLIP's chunked ppermute ring across REAL process boundaries: with
    the data axis spanning two processes, every ring tick moves the text
    chunk over the inter-process link (and its transpose routes the
    cotangents back). Both processes must agree on the global loss, the
    logit_bias must train, and the loss must equal a single-process
    2-virtual-device run on the concatenated global batch."""
    r0, r1 = _run_two_workers(tmp_path, WORKER_SIGLIP)
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-6)
    assert np.isfinite(r0["loss"])
    assert r0["logit_bias"] != -10.0  # the bias got a gradient through the ring
    assert r0["logit_bias"] == pytest.approx(r1["logit_bias"], abs=1e-7)

    import jax

    from clip_mixer_tpu.config import CLIPConfig, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    # Rebuild the global batch exactly as the two processes generated it.
    halves = []
    for pid in (0, 1):
        rng = np.random.default_rng(31 + pid)
        imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
        texts = np.zeros((4, 16), np.int32)
        texts[:, 0] = 49406
        texts[:, 1] = 700 + pid * 4 + np.arange(4)
        texts[:, 2] = 49407
        halves.append({"images": imgs, "texts": texts})
    global_batch = {k: np.concatenate([h[k] for h in halves]) for k in halves[0]}

    cfg = CLIPConfig(embed_dim=16, image_resolution=16, vision_layers=1, vision_width=32,
                     vision_patch_size=8, context_length=16, vocab_size=49408, text_width=32,
                     text_heads=1, text_layers=1, tower="mixer", compute_dtype="float32",
                     logit_bias_init=-10.0)
    tcfg = TrainConfig(global_batch_size=8, learning_rate=1e-3, warmup_steps=2, loss="siglip")
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    opt = make_optimizer(tcfg, total_steps=10)
    state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(0), cfg), opt))
    step = make_train_step(cfg, tcfg, mesh, opt)
    _, metrics = step(state, shard_batch(mesh, global_batch))
    oracle = float(jax.device_get(metrics["loss"]))
    assert r0["loss"] == pytest.approx(oracle, abs=5e-6)
