"""Data pipeline, Trainer orchestration, and public-API gates."""

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


def test_tar_source_host_sharding(tmp_path):
    rng = np.random.default_rng(1)
    samples = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), f"c{i}") for i in range(20)]
    paths = write_tar_shards(iter(samples), str(tmp_path / "s2"), samples_per_shard=5)
    assert len(paths) == 4
    h0 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=0)
    h1 = TarShardSource(paths, batch_size=5, image_size=16, n_hosts=2, host_index=1)
    assert len(h0.shards) == 2 and len(h1.shards) == 2
    assert set(h0.shards).isdisjoint(h1.shards)


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
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        np.testing.assert_array_equal(a, b)


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
    for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load() dispatches to the native dir too
    p3, cfg3, _ = cm.load(path)
    assert cfg3.tower == "mixer"


def test_api_unknown_name():
    with pytest.raises(RuntimeError, match="not found"):
        cm.load("definitely-not-a-model")


def test_prefetch_propagates_errors():
    def bad():
        yield {"a": 1}
        raise RuntimeError("decode failed")

    it = prefetch(bad())
    assert next(it) == {"a": 1}
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
