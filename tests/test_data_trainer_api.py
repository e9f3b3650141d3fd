"""Data pipeline, Trainer orchestration, and public-API gates."""

import io
import os

import numpy as np
import pytest

import jax

import clip_mixer_tpu as cm
from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.data.pipeline import SyntheticSource, TarShardSource, prefetch, write_tar_shards
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh
from clip_mixer_tpu.train.trainer import Trainer

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=16,
    vision_layers=1,
    vision_width=32,
    vision_patch_size=8,
    context_length=16,
    vocab_size=49408,
    text_width=32,
    text_heads=1,
    text_layers=1,
    tower="mixer",
    compute_dtype="float32",
)


def test_synthetic_source_deterministic():
    s = SyntheticSource(batch_size=8, image_size=16, n_batches=4, context_length=16)
    a = list(s.iter_batches(epoch=1))
    b = list(s.iter_batches(epoch=1))
    assert len(a) == 4
    np.testing.assert_array_equal(a[2]["images"], b[2]["images"])
    # skip fast-forward yields the same tail
    c = list(s.iter_batches(epoch=1, start_batch=2))
    np.testing.assert_array_equal(a[2]["images"], c[0]["images"])
    np.testing.assert_array_equal(a[2]["texts"], c[0]["texts"])
    # different epochs differ
    d = next(iter(s.iter_batches(epoch=2)))
    assert not np.array_equal(a[0]["images"], d["images"])


def test_tar_source_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = [
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"caption number {i}") for i in range(25)
    ]
    paths = write_tar_shards(iter(samples), str(tmp_path / "shards"), samples_per_shard=10)
    assert len(paths) == 3

    src = TarShardSource(paths, batch_size=4, image_size=16, context_length=16, drop_last=True)
    batches = list(src.iter_batches(epoch=0))
    assert len(batches) == 6  # 25 samples -> 6 full batches of 4
    assert batches[0]["images"].shape == (4, 16, 16, 3)
    assert batches[0]["images"].dtype == np.uint8
    assert batches[0]["texts"].shape == (4, 16)
    # determinism + skip
    again = list(src.iter_batches(epoch=0, start_batch=3))
    np.testing.assert_array_equal(batches[3]["images"], again[0]["images"])
    np.testing.assert_array_equal(batches[5]["texts"], again[2]["texts"])


def test_tar_source_shuffle_buffer(tmp_path):
    """The streaming shuffle (the reference's DataLoader(shuffle=True)
    equivalent, training.py:61) must permute samples — not just shards —
    while keeping the epoch stream a pure function of (seed, epoch) so the
    skip-by-count resume contract is untouched."""
    rng = np.random.default_rng(7)
    samples = [
        (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"caption number {i}")
        for i in range(30)
    ]
    paths = write_tar_shards(iter(samples), str(tmp_path / "shuf"), samples_per_shard=10)

    plain = TarShardSource(paths, batch_size=5, image_size=16, context_length=16)
    shuf = TarShardSource(paths, batch_size=5, image_size=16, context_length=16, shuffle_buffer=12)

    a = list(shuf.iter_batches(epoch=0))
    b = list(shuf.iter_batches(epoch=0))
    assert len(a) == 6
    for x, y in zip(a, b):  # deterministic per epoch
        np.testing.assert_array_equal(x["texts"], y["texts"])
    # skip fast-forward lands on the same shuffled tail
    c = list(shuf.iter_batches(epoch=0, start_batch=4))
    np.testing.assert_array_equal(a[4]["texts"], c[0]["texts"])
    # an epoch is still a permutation of the dataset (every caption once)
    caps = sorted(tuple(t) for batch in a for t in batch["texts"])
    ref = sorted(tuple(t) for batch in plain.iter_batches(epoch=0) for t in batch["texts"])
    assert caps == ref
    # within-shard order is actually broken (plain epoch != shuffled epoch)
    flat_a = [tuple(t) for batch in a for t in batch["texts"]]
    flat_p = [tuple(t) for batch in plain.iter_batches(epoch=0) for t in batch["texts"]]
    assert flat_a != flat_p
    # and epochs differ from each other
    flat_e1 = [tuple(t) for batch in shuf.iter_batches(epoch=1) for t in batch["texts"]]
    assert flat_a != flat_e1


def test_tar_source_host_sharding(tmp_path):
    rng = np.random.default_rng(1)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"c{i}") for i in range(20)]
    paths = write_tar_shards(iter(samples), str(tmp_path / "s2"), samples_per_shard=5)
    assert len(paths) == 4
    h0 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=0)
    h1 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=1)
    assert len(h0.shards) == 2 and len(h1.shards) == 2
    assert set(h0.shards).isdisjoint(h1.shards)


def test_tar_source_equal_shard_counts(tmp_path):
    """An uneven split would desync hosts (different batch counts per epoch
    -> one host exhausts its iterator first -> the next collective hangs);
    trailing shards beyond a multiple of n_hosts must be dropped."""
    rng = np.random.default_rng(2)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"c{i}") for i in range(25)]
    paths = write_tar_shards(iter(samples), str(tmp_path / "s5"), samples_per_shard=5)
    assert len(paths) == 5  # odd count: naive [h::2] would give 3 vs 2
    h0 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=0)
    h1 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=1)
    assert len(h0.shards) == len(h1.shards) == 2
    assert set(h0.shards).isdisjoint(h1.shards)
    assert len(list(h0.iter_batches(0))) == len(list(h1.iter_batches(0)))

    with pytest.raises(ValueError, match="cannot feed"):
        TarShardSource(paths[:1], batch_size=5, image_size=16, n_hosts=2, host_index=0)


def test_prefetch_order():
    s = SyntheticSource(batch_size=2, image_size=16, n_batches=5, context_length=16)
    direct = [b["images"] for b in s.iter_batches(0)]
    fetched = [b["images"] for b in prefetch(s.iter_batches(0), depth=2)]
    assert len(fetched) == 5
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_trainer_end_to_end_with_resume(tmp_path):
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=8, image_size=16, n_batches=6, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=8,
        epochs=2,
        learning_rate=1e-3,
        warmup_steps=2,
        checkpoint_every_steps=5,
    )
    run = str(tmp_path / "runA")
    tr = Trainer(CFG, tcfg, data, run, mesh=mesh)
    tr.train()
    assert tr.global_step == 12  # 6 batches x 2 epochs
    assert "Loss" in tr.writer.history and len(tr.writer.history["Loss"]) == 12
    final_a = jax.tree.map(np.asarray, jax.device_get(tr.state.params))

    # Fresh trainer on same dir resumes from the final checkpoint.
    tr2 = Trainer(CFG, tcfg, data, run, mesh=mesh)
    assert tr2.start_epoch == 2  # training complete
    final_b = jax.tree.map(np.asarray, jax.device_get(tr2.state.params))
    la, lb = jax.tree.leaves(final_a), jax.tree.leaves(final_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(a, b)

    # Completion wrote the inference export (the documented
    # `outputs/<run>/export` consumed by eval.py / serving / api.load),
    # holding exactly the final params.
    exp_params, exp_cfg, _ = cm.load(f"{run}/export")
    assert exp_cfg == CFG
    le = jax.tree.leaves(jax.tree.map(np.asarray, exp_params))
    for a, e in zip(la, le):
        np.testing.assert_array_equal(a, e)

    # scripting-friendly scalar sink alongside the TB events
    import json as _json

    with open(f"{run}/runs/metrics.jsonl") as f:
        rows = [_json.loads(line) for line in f]
    assert sum(r["name"] == "Loss" for r in rows) == 12
    # wall-clock throughput recorded at each checkpoint boundary
    assert any(r["name"] == "Throughput (imgs/s)" and r["value"] > 0 for r in rows)


def test_api_presets_and_save_load(tmp_path):
    assert "ViT-B/32" in cm.available_models()
    assert "mixer-b32" in cm.available_models()
    params, cfg, preprocess = cm.load("mixer-b32", compute_dtype="float32")
    assert cfg.tower == "mixer"
    assert clip_model.param_count(params) > 100_000_000

    # native save/load round-trip on a tiny model
    tiny_params = clip_model.init(jax.random.key(0), CFG)
    path = str(tmp_path / "native")
    cm.save_pretrained(tiny_params, CFG, path)
    p2, cfg2 = cm.load_pretrained(path)
    assert cfg2 == CFG
    la, lb = jax.tree.leaves(tiny_params), jax.tree.leaves(p2)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load() dispatches to the native dir too
    p3, cfg3, _ = cm.load(path)
    assert cfg3.tower == "mixer"


def test_api_unknown_name():
    with pytest.raises(RuntimeError, match="not found"):
        cm.load("definitely-not-a-model")


def test_api_remote_uri_dispatch(tmp_path, monkeypatch):
    """Remote URIs: a .pt/.pth torch checkpoint is staged into the download
    cache and converted; a remote dir without config.json raises the clear
    'not found' error instead of a bare epath stack. The fake scheme is
    mapped onto local files the way epath maps gs:// blobs."""
    import torch
    from etils import epath

    from clip_mixer_tpu import api
    from clip_mixer_tpu.models.convert import params_to_state_dict

    params = clip_model.init(jax.random.key(3), CFG)
    remote = tmp_path / "remote"
    remote.mkdir()
    torch.save(
        {k: torch.as_tensor(np.asarray(v).copy())
         for k, v in params_to_state_dict(params, CFG).items()},
        str(remote / "ckpt.pt"),
    )

    real_as_path = api._as_path
    monkeypatch.setattr(
        api,
        "_as_path",
        lambda name: epath.Path(str(remote / name.rsplit("/", 1)[-1]))
        if "://" in name else real_as_path(name),
    )

    cache = tmp_path / "cache"
    p2, cfg2, _ = cm.load("mock://bucket/ckpt.pt", download_root=str(cache),
                          compute_dtype="float32")
    staged = list(cache.glob("*-ckpt.pt"))  # URI-hash-keyed atomic stage
    assert len(staged) == 1 and not list(cache.glob("*.tmp.*"))
    # sniffing uses the reference's heads = width // 64 rule (model.py:506),
    # which floors to 0 at this tiny 32-wide mixer (heads are unused there)
    assert cfg2.replace(text_heads=CFG.text_heads) == CFG
    la, lb = jax.tree.leaves(params), jax.tree.leaves(p2)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))

    # not-an-export remote dir: actionable error, not a config.json traceback
    with pytest.raises(RuntimeError, match="no config.json"):
        cm.load("mock://bucket/no-such-export")


def test_prefetch_propagates_errors():
    def bad():
        yield {"a": 1}
        raise RuntimeError("decode failed")

    it = prefetch(bad())
    assert next(it) == {"a": 1}
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_stop_interrupts_blocked_wait():
    """A consumer blocked on a stalled source must unblock once the stop
    event is set (the Trainer's preemption flag rides this) — but batches
    already queued are still delivered first."""
    import threading
    import time as _time

    stall = threading.Event()

    def stalling():
        yield {"i": 0}
        yield {"i": 1}
        stall.wait()  # never set: upstream hangs forever

    stop = threading.Event()
    it = prefetch(stalling(), depth=2, stop=stop)
    assert next(it)["i"] == 0
    assert next(it)["i"] == 1
    t0 = _time.monotonic()
    threading.Timer(0.3, stop.set).start()
    remaining = list(it)  # would hang forever without the stop event
    assert remaining == []
    assert _time.monotonic() - t0 < 10
    stall.set()  # let the worker thread die


def test_stop_agreed_multiprocess_cadence(monkeypatch, tmp_path):
    """In multi-process mode the preemption stop must only be acted on at
    the agreement cadence (every host reaches the collective at the same
    step); off-cadence steps ignore the local flag."""
    import threading

    import jax as _jax

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    data = SyntheticSource(batch_size=4, image_size=16, n_batches=2, context_length=16)
    tcfg = TrainConfig(global_batch_size=4, epochs=1, learning_rate=1e-3,
                       warmup_steps=2, checkpoint_every_steps=100,
                       preemption_sync_every_steps=4)
    tr = Trainer(CFG, tcfg, data, str(tmp_path / "agree"), mesh=mesh)
    flag = threading.Event()
    flag.set()

    # single process: acted on immediately at any step
    assert tr._stop_agreed(flag, 3) is True
    # "multi-process": off-cadence steps defer; cadence steps OR the flags
    # gathered from every process (collective stubbed — its real multi-host
    # execution is covered by tests/test_multiprocess.py's infrastructure)
    from jax.experimental import multihost_utils

    calls = []

    def fake_allgather(x):
        calls.append(np.asarray(x))
        return np.stack([np.asarray(x), np.asarray([other_flag])])

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    other_flag = False
    assert tr._stop_agreed(flag, 3) is False  # off-cadence: no collective
    assert calls == []
    assert tr._stop_agreed(flag, 8) is True  # local flag set
    other_flag = True
    unset = threading.Event()
    assert tr._stop_agreed(unset, 8) is True  # OTHER host's flag suffices
    other_flag = False
    assert tr._stop_agreed(unset, 8) is False
    assert len(calls) == 3  # collective ran only at cadence steps


class _KillAfter:
    """DataSource wrapper that raises once, mid-epoch, on its first pass —
    simulating a crash between two checkpoints."""

    def __init__(self, inner, kill_at_batch):
        self.inner = inner
        self.kill_at = kill_at_batch
        self.killed = False

    @property
    def batches_per_epoch(self):
        return self.inner.batches_per_epoch

    def iter_batches(self, epoch, start_batch=0):
        for i, b in enumerate(self.inner.iter_batches(epoch, start_batch)):
            if not self.killed and epoch == 0 and start_batch + i == self.kill_at:
                self.killed = True
                raise RuntimeError("simulated crash")
            yield b


def test_kill_and_resume_bit_determinism(tmp_path):
    """SURVEY §7 gate 8: train, kill mid-epoch after a checkpoint, restart
    the Trainer from disk, finish — params must match an uninterrupted run
    BITWISE (CPU f32). Exercises orbax round-trip exactness + the
    deterministic data skip contract end-to-end."""
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])

    def fresh_data():
        return SyntheticSource(batch_size=8, image_size=16, n_batches=6, n_classes=4, context_length=16)

    tcfg = TrainConfig(
        global_batch_size=8,
        epochs=2,
        learning_rate=1e-3,
        warmup_steps=2,
        checkpoint_every_steps=4,
    )

    # Uninterrupted reference: 12 steps.
    tr_full = Trainer(CFG, tcfg, fresh_data(), str(tmp_path / "full"), mesh=mesh)
    tr_full.train()
    ref = jax.tree.map(np.asarray, jax.device_get(tr_full.state.params))

    # Interrupted run: checkpoint lands at step 4; crash at batch index 5.
    run = str(tmp_path / "killed")
    killer = _KillAfter(fresh_data(), kill_at_batch=5)
    tr_a = Trainer(CFG, tcfg, killer, run, mesh=mesh)
    with pytest.raises(RuntimeError, match="simulated crash"):
        tr_a.train()
    assert tr_a.global_step == 5  # steps 1-5 ran; checkpoint holds step 4
    # Let the async step-4 save finalize (a crash before finalization would
    # just resume one checkpoint earlier; resume determinism is what's under
    # test here).
    tr_a.checkpointer.wait()

    # Fresh process equivalent: new Trainer restores epoch 0 / batch 4.
    tr_b = Trainer(CFG, tcfg, killer, run, mesh=mesh)
    assert (tr_b.start_epoch, tr_b.start_batch) == (0, 4)
    assert tr_b.global_step == 4
    tr_b.train()
    assert tr_b.global_step == 12
    got = jax.tree.map(np.asarray, jax.device_get(tr_b.state.params))

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)


def test_validation_cadence_decoupled(tmp_path):
    """validate_every_steps runs validators on its own cadence and passes
    params explicitly (no attribute injection)."""

    calls = []

    class SpyValidator:
        writer = None
        params = "sentinel-untouched"

        def validate(self, step, verbose=False, params=None):
            calls.append((step, params is not None))
            return {}

    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=8, image_size=16, n_batches=6, n_classes=4, context_length=16)
    spy = SpyValidator()
    tcfg = TrainConfig(
        global_batch_size=8,
        epochs=1,
        learning_rate=1e-3,
        warmup_steps=2,
        checkpoint_every_steps=5,
        validate_every_steps=2,
    )
    tr = Trainer(CFG, tcfg, data, str(tmp_path / "v"), mesh=mesh, validators=[spy])
    tr.train()
    assert [s for s, _ in calls] == [2, 4, 6]
    assert all(has_params for _, has_params in calls)
    assert spy.params == "sentinel-untouched"


def test_tar_source_process_decode_matches_thread(tmp_path):
    """decode_mode='process' yields identical batches to the thread pool."""
    rng = np.random.default_rng(7)
    samples = []
    for i in range(12):
        arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        samples.append((arr, f"cap {i}"))
    paths = write_tar_shards(iter(samples), str(tmp_path / "p"), samples_per_shard=6)

    a = TarShardSource(paths, batch_size=4, image_size=16, context_length=16, decode_mode="thread")
    b = TarShardSource(paths, batch_size=4, image_size=16, context_length=16, decode_mode="process", decode_workers=2)
    for ba, bb in zip(a.iter_batches(0), b.iter_batches(0)):
        np.testing.assert_array_equal(ba["images"], bb["images"])
        np.testing.assert_array_equal(ba["texts"], bb["texts"])


def test_pick_trace_start_dodges_cadence_boundaries():
    """The profile window must contain no checkpoint/validation step: a
    traced _flush_metrics device_get or orbax save isn't steady-state."""
    from clip_mixer_tpu.train.trainer import _pick_trace_start

    # fresh run, window fits before the first checkpoint
    assert _pick_trace_start(0, 2, (100, 100)) == 1
    # resume just before a checkpoint step: slides past step 400
    s = _pick_trace_start(398, 3, (400, 400))
    assert s == 401 and all(x % 400 for x in range(s, s + 3))
    # a different validation cadence is dodged too
    s = _pick_trace_start(8, 2, (400, 10))
    assert all(x % 400 and x % 10 for x in range(s, s + 2))
    # no clear window exists (cadence 1): falls back to step+1
    assert _pick_trace_start(5, 2, (1, 400)) == 6


def test_trainer_profile_steps_writes_trace(tmp_path):
    """profile_steps captures a steady-state device trace: the profile dir
    exists and contains an .xplane.pb after training past the window."""
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    data = SyntheticSource(batch_size=4, image_size=16, n_batches=5, context_length=16)
    tcfg = TrainConfig(global_batch_size=4, epochs=1, learning_rate=1e-3,
                       warmup_steps=2, checkpoint_every_steps=100)
    run = tmp_path / "prof_run"
    tr = Trainer(CFG, tcfg, data, str(run), mesh=mesh, profile_steps=2)
    tr.train()
    assert tr.global_step == 5
    assert not tr._profiling
    traces = list((run / "profile").rglob("*.xplane.pb"))
    assert traces, list((run / "profile").rglob("*"))


def test_nonfinite_loss_aborts_before_checkpoint(tmp_path):
    """A diverged (NaN) loss must abort at the flush boundary BEFORE that
    boundary's checkpoint save, so the last good checkpoint survives — and
    must not write the completion export either."""
    import jax.numpy as jnp

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    data = SyntheticSource(batch_size=4, image_size=16, n_batches=6, context_length=16)
    tcfg = TrainConfig(global_batch_size=4, epochs=1, learning_rate=1e-3,
                       warmup_steps=2, checkpoint_every_steps=3)
    run = tmp_path / "nanrun"
    tr = Trainer(CFG, tcfg, data, str(run), mesh=mesh)

    real_step, calls = tr.step_fn, []

    def poisoned(state, batch):
        state, metrics = real_step(state, batch)
        calls.append(1)
        if len(calls) == 2:
            metrics = dict(metrics, loss=jnp.float32(jnp.nan))
        return state, metrics

    tr.step_fn = poisoned
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.train()
    assert tr.checkpointer.latest_step() is None
    assert not (run / "export").exists()

    # the guard is opt-out for divergence debugging
    import dataclasses

    data2 = SyntheticSource(batch_size=4, image_size=16, n_batches=6, context_length=16)
    tr2 = Trainer(CFG, dataclasses.replace(tcfg, abort_on_nonfinite_loss=False), data2,
                  str(tmp_path / "nanrun2"), mesh=mesh)
    real2, calls2 = tr2.step_fn, []

    def poisoned2(state, batch):
        state, metrics = real2(state, batch)
        calls2.append(1)
        if len(calls2) == 2:
            metrics = dict(metrics, loss=jnp.float32(jnp.nan))
        return state, metrics

    tr2.step_fn = poisoned2
    tr2.train()  # trains through
    assert tr2.global_step == 6


def test_metrics_jsonl_sink(tmp_path):
    """Every scalar lands in {log_dir}/metrics.jsonl at flush()/close()
    cadence — persistent and greppable without the TB toolchain."""
    import json

    from clip_mixer_tpu.train.metrics import MetricsWriter

    w = MetricsWriter(log_dir=str(tmp_path / "runs"))
    w.add_scalar("Loss", 1.5, 1)
    w.add_scalar("Loss", 1.25, 2)
    w.flush()
    path = tmp_path / "runs" / "metrics.jsonl"
    rows = [json.loads(line) for line in open(path)]
    assert rows[0] == {"step": 1, "name": "Loss", "value": 1.5}
    assert len(rows) == 2
    w.add_scalar("Gradient norm", 0.5, 3)
    w.close()  # close flushes the tail
    assert len(list(open(path))) == 3


def test_tar_source_corrupt_sample_handling(tmp_path):
    """A corrupt image record must fail loudly by default, and with
    on_decode_error='substitute' must be replaced by the nearest good pair
    in the batch — keeping batch boundaries (and thus the skip-by-count
    resume contract) exactly as if every record decoded."""
    import io
    import tarfile

    rng = np.random.default_rng(3)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"cap {i}") for i in range(8)]
    paths = write_tar_shards(iter(samples), str(tmp_path / "c"), samples_per_shard=8)

    # corrupt sample index 2's image bytes in-place (rewrite the tar)
    src = paths[0]
    rewritten = str(tmp_path / "corrupt.tar")
    with tarfile.open(src) as tin, tarfile.open(rewritten, "w") as tout:
        for info in tin:
            data = tin.extractfile(info).read()
            if info.name == "000000002.jpg":
                data = b"not a jpeg at all"
            out_info = tarfile.TarInfo(info.name)
            out_info.size = len(data)
            tout.addfile(out_info, io.BytesIO(data))

    kw = dict(batch_size=4, image_size=16, context_length=16)
    with pytest.raises(RuntimeError, match="failed to decode"):
        list(TarShardSource([rewritten], **kw).iter_batches(0))

    sub = TarShardSource([rewritten], on_decode_error="substitute", **kw)
    got = list(sub.iter_batches(0))
    clean = list(TarShardSource(paths, **kw).iter_batches(0))
    assert len(got) == len(clean) == 2
    assert sub.decode_errors == 1
    # batch boundaries identical to the clean stream; index 2 became a copy
    # of its nearest good neighbor (index 1 or 3), pair-consistent
    bad_b, bad_i = 0, 2
    np.testing.assert_array_equal(got[1]["images"], clean[1]["images"])
    assert not np.array_equal(got[bad_b]["images"][bad_i], clean[bad_b]["images"][bad_i])
    neighbors = [1, 3]
    assert any(
        np.array_equal(got[bad_b]["images"][bad_i], got[bad_b]["images"][j])
        and np.array_equal(got[bad_b]["texts"][bad_i], got[bad_b]["texts"][j])
        for j in neighbors
    )
    # process-pool decode takes the same path
    subp = TarShardSource([rewritten], on_decode_error="substitute",
                          decode_mode="process", decode_workers=2, **kw)
    gotp = list(subp.iter_batches(0))
    for a, b in zip(got, gotp):
        np.testing.assert_array_equal(a["images"], b["images"])
    assert subp.decode_errors == 1

    # an ALL-corrupt batch has nothing to substitute from: dropped, counted,
    # the stream continues (raw counts advanced -> resume alignment holds)
    all_bad = str(tmp_path / "allbad.tar")
    with tarfile.open(src) as tin, tarfile.open(all_bad, "w") as tout:
        for info in tin:
            data = tin.extractfile(info).read()
            if info.name.endswith(".jpg") and info.name < "000000004":
                data = b"junk"
            out_info = tarfile.TarInfo(info.name)
            out_info.size = len(data)
            tout.addfile(out_info, io.BytesIO(data))
    sub2 = TarShardSource([all_bad], on_decode_error="substitute", seed=1, **kw)
    got2 = list(sub2.iter_batches(0))
    assert len(got2) == 1 and sub2.decode_errors == 4
    np.testing.assert_array_equal(got2[0]["images"], clean[1]["images"])


def test_metrics_writer_remote_log_dir(tmp_path, monkeypatch):
    """A gs:// log_dir must go through epath (object stores can't append:
    flush rewrites the whole small file) and must NOT create a bogus local
    './gs:/...' directory via os.makedirs."""
    import json
    import os

    from etils import epath

    from clip_mixer_tpu.train.metrics import MetricsWriter

    target = tmp_path / "bucket" / "runs"
    real_path = epath.Path
    monkeypatch.setattr(
        epath, "Path",
        lambda p: real_path(str(target)) if "://" in str(p) else real_path(p),
    )
    cwd = os.getcwd()
    os.chdir(tmp_path)  # any accidental relative 'gs:/...' dir lands here
    try:
        w = MetricsWriter(log_dir="gs://bucket/runs")
        w.add_scalar("Loss", 1.0, 1)
        w.flush()
        w.add_scalar("Loss", 0.5, 2)
        w.close()
        rows = [json.loads(line) for line in open(target / "metrics.jsonl")]
        assert [r["value"] for r in rows] == [1.0, 0.5]  # rewrite keeps history
        assert not os.path.exists("gs:")  # no mangled local path
    finally:
        os.chdir(cwd)


# ---------------------------------------------------------------------------
# MixtureSource: weighted multi-corpus blending (the reference trains on a
# single LAION-COCO subset, dataset.py:95-150 — no mixing story).
# ---------------------------------------------------------------------------

def _mk_corpus(tmp_path, name, n, word, samples_per_shard=10):
    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    samples = [
        (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"{word} number {i}")
        for i in range(n)
    ]
    return write_tar_shards(iter(samples), str(tmp_path / name), samples_per_shard=samples_per_shard)


def _marker_token(word):
    from clip_mixer_tpu.text import tokenize

    return int(np.asarray(tokenize([f"{word} number 0"]))[0, 1])


def test_mixture_ratio_determinism_and_resume(tmp_path):
    from itertools import islice

    from clip_mixer_tpu.data.pipeline import MixtureSource

    a = _mk_corpus(tmp_path, "alpha_corpus", 40, "alpha")
    b = _mk_corpus(tmp_path, "beta_corpus", 40, "beta")
    src = MixtureSource(
        [a, b], batch_size=8, weights=[3.0, 1.0], image_size=16, context_length=16
    )
    batches = list(islice(src.iter_batches(epoch=0), 20))  # stream is infinite
    tok_a = _marker_token("alpha")
    n_alpha = sum(int(np.sum(batch["texts"][:, 1] == tok_a)) for batch in batches)
    frac = n_alpha / (20 * 8)
    assert 0.65 < frac < 0.85, frac  # 3:1 weights -> ~0.75 of 160 draws

    # pure function of (seed, epoch): identical on re-iteration...
    again = list(islice(src.iter_batches(epoch=0), 20))
    np.testing.assert_array_equal(batches[7]["images"], again[7]["images"])
    np.testing.assert_array_equal(batches[19]["texts"], again[19]["texts"])
    # ...skip-by-count resume lands on the same batch boundary...
    resumed = next(iter(src.iter_batches(epoch=0, start_batch=5)))
    np.testing.assert_array_equal(batches[5]["images"], resumed["images"])
    np.testing.assert_array_equal(batches[5]["texts"], resumed["texts"])
    # ...and a different epoch reshuffles
    other = next(iter(src.iter_batches(epoch=1)))
    assert not np.array_equal(batches[0]["images"], other["images"])


def test_mixture_small_component_repeats(tmp_path):
    """A component smaller than the epoch restarts (reshuffled) so the
    configured ratio holds — small curated sets repeat, they don't run dry."""
    from itertools import islice

    from clip_mixer_tpu.data.pipeline import MixtureSource

    a = _mk_corpus(tmp_path, "big", 60, "alpha")
    b = _mk_corpus(tmp_path, "tiny", 6, "beta", samples_per_shard=3)
    src = MixtureSource([a, b], batch_size=8, image_size=16, context_length=16)
    batches = list(islice(src.iter_batches(epoch=0), 12))  # 96 draws, ~48 beta >> 6
    tok_b = _marker_token("beta")
    n_beta = sum(int(np.sum(batch["texts"][:, 1] == tok_b)) for batch in batches)
    assert n_beta > 20  # the 6-sample corpus contributed far past its size


def test_mixture_validation(tmp_path):
    from clip_mixer_tpu.data.pipeline import MixtureSource

    a = _mk_corpus(tmp_path, "val_corpus", 10, "alpha")
    with pytest.raises(ValueError, match="at least one shard"):
        MixtureSource([a, []], batch_size=4, image_size=16)
    with pytest.raises(ValueError, match="positive weights"):
        MixtureSource([a, a], batch_size=4, weights=[1.0], image_size=16)
    with pytest.raises(ValueError, match="positive weights"):
        MixtureSource([a, a], batch_size=4, weights=[1.0, -1.0], image_size=16)


def test_mixture_component_with_no_samples(tmp_path):
    """A shard list whose tars contain no usable pairs must fail loudly,
    not spin the restart loop forever."""
    import tarfile

    from clip_mixer_tpu.data.pipeline import MixtureSource

    a = _mk_corpus(tmp_path, "ok_corpus", 10, "alpha")
    junk = tmp_path / "junk.tar"
    with tarfile.open(junk, "w") as tar:
        info = tarfile.TarInfo("not_a_pair.bin")
        info.size = 3
        import io as _io

        tar.addfile(info, _io.BytesIO(b"xyz"))
    src = MixtureSource([a, [str(junk)]], batch_size=4, image_size=16, context_length=16)
    with pytest.raises(RuntimeError, match="yielded no samples"):
        next(iter(src.iter_batches(epoch=0)))


def test_parse_data_spec():
    """'::WEIGHT' only binds when the tail is a positive finite float — paths
    may legitimately contain '::' (review finding: float('v2/*.tar') used to
    traceback)."""
    import train as train_cli

    assert train_cli.parse_data_spec("shards/*.tar") == ("shards/*.tar", 1.0)
    assert train_cli.parse_data_spec("shards/*.tar::3") == ("shards/*.tar", 3.0)
    assert train_cli.parse_data_spec("shards/*.tar::0.25") == ("shards/*.tar", 0.25)
    # '::' inside the path, non-numeric tail: the whole spec is the path
    assert train_cli.parse_data_spec("/mnt/ds::v2/*.tar") == ("/mnt/ds::v2/*.tar", 1.0)
    # trailing '::' (empty weight): path, not a crash
    assert train_cli.parse_data_spec("shards/*.tar::") == ("shards/*.tar::", 1.0)
    # explicit-but-invalid weights fail loudly
    for bad in ["shards/*.tar::0", "shards/*.tar::-2", "shards/*.tar::nan",
                "shards/*.tar::inf"]:
        with pytest.raises(SystemExit, match="positive number"):
            train_cli.parse_data_spec(bad)


def test_mixture_shuffle_buffer_is_a_total_budget(tmp_path):
    """The caller's shuffle_buffer is host-RAM budget for the WHOLE mixture:
    children split it by weight instead of each taking the full size (which
    silently multiplied reservoir memory by the component count)."""
    from clip_mixer_tpu.data.pipeline import MixtureSource

    a = _mk_corpus(tmp_path, "budget_a", 10, "alpha")
    b = _mk_corpus(tmp_path, "budget_b", 10, "beta")
    src = MixtureSource(
        [a, b, b], batch_size=4, weights=[2.0, 1.0, 1.0],
        image_size=16, context_length=16, shuffle_buffer=1000,
    )
    bufs = [c.shuffle_buffer for c in src.children]
    assert bufs == [500, 250, 250]
    assert sum(bufs) == 1000
    # a tiny-weight component still shuffles (floor 2), and buffer 0 stays off
    src2 = MixtureSource(
        [a, b], batch_size=4, weights=[999.0, 1.0],
        image_size=16, context_length=16, shuffle_buffer=100,
    )
    assert src2.children[0].shuffle_buffer == 100
    assert src2.children[1].shuffle_buffer == 2
    src3 = MixtureSource([a, b], batch_size=4, image_size=16, context_length=16)
    assert [c.shuffle_buffer for c in src3.children] == [0, 0]


def test_nonfinite_loss_raises_on_non_lead_hosts():
    """Every process must raise the non-finite abort (not just the lead), so
    a multi-host pod exits EXIT_NONFINITE on all workers instead of the
    non-leads dying in the collective save with a restartable rc."""
    import types

    from clip_mixer_tpu.config import TrainConfig
    from clip_mixer_tpu.train.trainer import Trainer

    fake = types.SimpleNamespace(
        tcfg=TrainConfig(global_batch_size=8, epochs=1),
        is_lead=False,  # non-lead: must still check before any writer work
    )
    pending = [(3, {"loss": np.float32("nan"), "grad_norm": np.float32(1.0)})]
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        Trainer._flush_metrics(fake, pending)


def test_cache_source_contract(tmp_path):
    """CacheSource: one decode pass, then every epoch is a full permutation
    of exactly the inner source's samples; deterministic skip-by-count
    resume; the RAM budget is enforced."""
    from clip_mixer_tpu.data.pipeline import CacheSource

    rng = np.random.default_rng(3)
    samples = [
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"caption number {i}")
        for i in range(23)
    ]
    paths = write_tar_shards(iter(samples), str(tmp_path / "shards"), samples_per_shard=10)
    inner = TarShardSource(paths, batch_size=4, image_size=16, context_length=16)
    src = CacheSource(inner)

    a = list(src.iter_batches(epoch=0))
    assert len(a) == 5 and src.batches_per_epoch == 5  # 23 -> 5 full batches of 4
    assert a[0]["images"].shape == (4, 16, 16, 3)
    assert a[0]["images"].dtype == np.uint8

    # the cache holds EVERY sample (the fill lifts the inner drop_last, so
    # the 3 tail samples are cached too) and an epoch draws from that set
    # without duplicates
    assert src.n_samples == 23
    inner_again = TarShardSource(paths, batch_size=4, image_size=16,
                                 context_length=16, drop_last=False)
    inner_imgs = np.concatenate([b["images"] for b in inner_again.iter_batches(epoch=0)])
    cached = np.concatenate([b["images"] for b in a])
    key = lambda arr: [x.tobytes() for x in arr]  # noqa: E731
    full, drawn = key(inner_imgs), key(cached)
    assert len(set(drawn)) == len(drawn)  # a permutation never repeats
    assert set(drawn) <= set(full) and len(full) == 23

    # determinism + resume + cross-epoch reshuffle
    again = list(src.iter_batches(epoch=0, start_batch=3))
    np.testing.assert_array_equal(a[3]["images"], again[0]["images"])
    np.testing.assert_array_equal(a[4]["texts"], again[1]["texts"])
    e1 = next(iter(src.iter_batches(epoch=1)))
    assert not np.array_equal(a[0]["images"], e1["images"])

    # budget refusal
    tiny = CacheSource(
        TarShardSource(paths, batch_size=4, image_size=16, context_length=16),
        max_bytes=1000,
    )
    with pytest.raises(MemoryError, match="max_bytes"):
        list(tiny.iter_batches(epoch=0))


def test_cache_source_disk_backed(tmp_path):
    """Disk-backed cache: a second CacheSource over the same shards loads the
    memmapped .npy without re-decoding (inner source not touched), yields
    identical batches, and a different geometry misses the fingerprint."""
    from clip_mixer_tpu.data.pipeline import CacheSource

    rng = np.random.default_rng(4)
    samples = [
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"caption number {i}")
        for i in range(9)
    ]
    paths = write_tar_shards(iter(samples), str(tmp_path / "shards"), samples_per_shard=5)
    cache = str(tmp_path / "cache")

    inner = TarShardSource(paths, batch_size=2, image_size=16, context_length=16)
    first = list(CacheSource(inner, cache_dir=cache).iter_batches(epoch=1))

    class Exploding(TarShardSource):
        def iter_batches(self, epoch, start_batch=0):
            raise AssertionError("cache hit must not decode")

    inner2 = Exploding(paths, batch_size=2, image_size=16, context_length=16)
    second = list(CacheSource(inner2, cache_dir=cache).iter_batches(epoch=1))
    assert len(first) == len(second) == 4
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["texts"], b["texts"])

    # different decode geometry -> different fingerprint -> fresh fill
    inner3 = TarShardSource(paths, batch_size=2, image_size=24, context_length=16)
    third = list(CacheSource(inner3, cache_dir=cache).iter_batches(epoch=1))
    assert third[0]["images"].shape == (2, 24, 24, 3)


def test_tar_source_remote_streaming(tmp_path):
    """Direct remote shard streaming (the reference reads every sample over
    the network, dataset.py:126-147): a TarShardSource over file:// and
    memory:// URIs must yield byte-identical batches to the local-path
    source, through the sequential r|* tar stream + retrying reader."""
    import fsspec

    from clip_mixer_tpu.data.pipeline import expand_shard_pattern

    rng = np.random.default_rng(5)
    samples = [
        (rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), f"caption number {i}")
        for i in range(10)
    ]
    paths = write_tar_shards(iter(samples), str(tmp_path / "shards"), samples_per_shard=5)
    kw = dict(batch_size=2, image_size=16, context_length=16)
    local = list(TarShardSource(paths, **kw).iter_batches(epoch=0))

    remote_paths = expand_shard_pattern(f"file://{tmp_path}/shards/*.tar")
    assert [os.path.basename(p) for p in remote_paths] == [os.path.basename(p) for p in paths]
    assert all(p.startswith("file://") for p in remote_paths)
    remote = list(TarShardSource(remote_paths, **kw).iter_batches(epoch=0))
    assert len(remote) == len(local) == 5
    for a, b in zip(local, remote):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["texts"], b["texts"])

    # a second scheme, object-store-shaped (block reads, no OS file handle)
    mem = fsspec.filesystem("memory")
    for p in paths:
        with open(p, "rb") as src, mem.open(f"/shards/{os.path.basename(p)}", "wb") as dst:
            dst.write(src.read())
    mem_paths = expand_shard_pattern("memory://shards/*.tar")
    assert len(mem_paths) == 2
    memory = list(TarShardSource(mem_paths, **kw).iter_batches(epoch=0))
    for a, b in zip(local, memory):
        np.testing.assert_array_equal(a["images"], b["images"])


def test_retrying_stream_resumes_at_offset():
    """A connection dropped mid-shard must resume at the exact byte offset —
    no skipped or duplicated bytes (the resume contract depends on it)."""
    from clip_mixer_tpu.data.pipeline import _RetryingStream

    payload = bytes(range(256)) * 512  # 128 KiB

    class FlakyFile:
        """Raises after serving some bytes, twice; then a clean connection."""

        def __init__(self, fails_left):
            self.pos = 0
            self.fails_left = fails_left

        def seek(self, pos):
            self.pos = pos

        def read(self, n):
            if self.fails_left and self.pos >= len(payload) // 3:
                self.fails_left -= 1
                raise IOError("connection reset by peer")
            out = payload[self.pos : self.pos + n]
            self.pos += len(out)
            return out

        def close(self):
            pass

    state = {"opens": 0, "fails": 2}

    def open_fn():
        state["opens"] += 1
        return FlakyFile(fails_left=state.pop("fails") if "fails" in state else 0)

    raw = _RetryingStream("fake://x", retries=4, backoff=0.0, open_fn=open_fn)
    got = io.BufferedReader(raw, buffer_size=4096).read()
    assert got == payload
    assert state["opens"] >= 2  # it really reconnected

    # retry budget exhausted -> the error propagates
    state2 = {"n": 0}

    def always_fails():
        state2["n"] += 1
        return FlakyFile(fails_left=99)

    raw2 = _RetryingStream("fake://y", retries=2, backoff=0.0, open_fn=always_fails)
    with pytest.raises(IOError):
        io.BufferedReader(raw2, buffer_size=4096).read()


def test_download_resumes_with_range(monkeypatch, tmp_path):
    """api._download survives mid-stream disconnects: retry resumes at the
    byte offset already on disk via an HTTP Range request (no re-download
    from zero), the SHA256 gate still runs on the assembled file, and the
    finished checkpoint lands atomically (no .partial left behind)."""
    import hashlib
    import io as _io
    import urllib.request

    from clip_mixer_tpu import api

    payload = bytes(range(256)) * 2048  # 512 KiB
    sha = hashlib.sha256(payload).hexdigest()
    url = f"https://fake.test/{sha}/model.pt"
    calls = []

    class FlakyRangeServer:
        def __init__(self, start, fail_after):
            self._b = _io.BytesIO(payload[start:])
            self._served = 0
            self._fail_after = fail_after
            self.status = 206 if start else 200
            self.headers = {"Content-Length": str(len(payload) - start)}

        def read(self, n):
            if self._fail_after is not None and self._served >= self._fail_after:
                raise ConnectionResetError("mid-stream drop")
            out = self._b.read(n)
            self._served += len(out)
            return out

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, *a, **k):
        rng_header = req.get_header("Range")
        start = int(rng_header.split("=")[1].rstrip("-")) if rng_header else 0
        calls.append(start)
        # first connection drops after 128 KiB; the resumed one completes
        return FlakyRangeServer(start, fail_after=(128 << 10) if not start else None)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setattr("time.sleep", lambda s: None)
    target = api._download(url, str(tmp_path))
    assert open(target, "rb").read() == payload
    assert calls[0] == 0 and len(calls) == 2
    assert calls[1] > 0  # second request actually resumed mid-file
    assert not os.path.exists(target + ".partial")

    # corrupted payload -> hard error and the poisoned partial is removed
    bad_url = f"https://fake.test/{'0' * 64}/model2.pt"
    monkeypatch.setattr(
        urllib.request, "urlopen", lambda req, *a, **k: FlakyRangeServer(0, None)
    )
    with pytest.raises(RuntimeError, match="SHA256"):
        api._download(bad_url, str(tmp_path))
    assert not os.path.exists(str(tmp_path / "model2.pt.partial"))


def test_cache_source_rejects_remote_dir(tmp_path):
    """cache_dir is memmapped — a gs:// URI can never serve it, and raw
    os.path would silently create a local './gs:/...' dir (repo gs:// rule)."""
    from clip_mixer_tpu.data.pipeline import CacheSource

    rng = np.random.default_rng(5)
    samples = [(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), "c")]
    paths = write_tar_shards(iter(samples), str(tmp_path / "s"), samples_per_shard=1)
    inner = TarShardSource(paths, batch_size=1, image_size=16, context_length=16)
    with pytest.raises(ValueError, match="local directory"):
        CacheSource(inner, cache_dir="gs://bucket/cache")


def test_cache_fingerprint_tracks_captions(tmp_path):
    """A caption edit that leaves every shard file size unchanged (sidecar
    .txt rewrite for FileListSource; same-length in-tar edit) must MISS the
    disk cache — the fingerprint once hashed only (path, size), silently
    serving stale captions."""
    from clip_mixer_tpu.data.pipeline import CacheSource, FileListSource
    from PIL import Image

    img = tmp_path / "a.jpg"
    Image.new("RGB", (32, 32), (90, 10, 10)).save(img, "JPEG")
    cache = str(tmp_path / "cache")

    src1 = CacheSource(
        FileListSource([(str(img), "old caption")], batch_size=1,
                       image_size=16, context_length=16),
        cache_dir=cache,
    )
    [b1] = list(src1.iter_batches(epoch=0))

    src2 = CacheSource(
        FileListSource([(str(img), "new caption")], batch_size=1,
                       image_size=16, context_length=16),
        cache_dir=cache,
    )
    [b2] = list(src2.iter_batches(epoch=0))
    assert src1._fingerprint() != src2._fingerprint()
    assert not np.array_equal(b1["texts"], b2["texts"])  # not the stale rows
    from clip_mixer_tpu.text.fast import fast_tokenize
    np.testing.assert_array_equal(
        b2["texts"], fast_tokenize(["new caption"], context_length=16)
    )


def test_concat_consuming_matches_numpy():
    from clip_mixer_tpu.data.pipeline import _concat_consuming

    rng = np.random.default_rng(6)
    chunks = [rng.integers(0, 256, (n, 3, 2), dtype=np.uint8) for n in (4, 1, 7, 2)]
    want = np.concatenate(chunks)
    got = _concat_consuming([c.copy() for c in chunks])
    np.testing.assert_array_equal(got, want)


def test_download_serializes_concurrent_processes(monkeypatch, tmp_path):
    """Two concurrent downloaders of the same checkpoint (the per-host pod
    layout) must not interleave writes into one .partial: the flock makes
    the loser wait and return the winner's verified file."""
    import hashlib
    import io as _io
    import threading
    import urllib.request

    from clip_mixer_tpu import api

    payload = b"\xab" * (256 << 10)
    sha = hashlib.sha256(payload).hexdigest()
    url = f"https://fake.test/{sha}/model.pt"
    opened = []

    class SlowServer:
        def __init__(self):
            self._b = _io.BytesIO(payload)
            self.status = 200
            self.headers = {"Content-Length": str(len(payload))}

        def read(self, n):
            import time
            time.sleep(0.005)
            return self._b.read(n)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, *a, **k):
        opened.append(1)
        return SlowServer()

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    results, errors = [], []

    def worker():
        try:
            results.append(api._download(url, str(tmp_path)))
        except Exception as e:  # pragma: no cover - fail loudly below
            errors.append(e)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=60) for t in ts]
    assert not errors and len(results) == 2
    assert open(results[0], "rb").read() == payload
    assert len(opened) == 1  # the loser never re-downloaded
