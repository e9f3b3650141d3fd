"""Frozen serving programs (clip_mixer_tpu/aot.py).

Contract: export_servable writes a save_pretrained superset whose recorded
jax.export programs reproduce the live engine bit-for-bit — the JAX
equivalent of the reference's TorchScript serving path (clip.py:95-195,
jit=True), which PARITY previously marked torch-specific."""

from pathlib import Path

import numpy as np
import pytest

import jax

import clip_mixer_tpu as clip
from clip_mixer_tpu import aot
from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.serving import InferenceEngine

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=32,
    vision_layers=2,
    vision_width=32,
    vision_patch_size=16,
    context_length=16,
    vocab_size=49408,
    text_width=32,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return clip_model.init(jax.random.key(0), CFG)


def test_float_export_matches_live_engine(tmp_path, params):
    out = str(tmp_path / "srv")
    aot.export_servable(params, CFG, out, batch_buckets=(4, 8))
    eng = aot.load_servable(out)
    live = InferenceEngine(params, CFG, batch_buckets=(4, 8))

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)  # pads to bucket 8
    texts = ["a cat", "two dogs", "a diagram"]
    got_i, got_t = eng.encode_image_arrays(imgs), eng.encode_text(texts)
    assert np.all(np.isfinite(got_i)) and np.all(np.isfinite(got_t))
    np.testing.assert_array_equal(got_i, live.encode_image_arrays(imgs))
    np.testing.assert_array_equal(got_t, live.encode_text(texts))

    # the dir stays a valid save_pretrained checkpoint
    p2, cfg2, _ = clip.load(out)
    assert cfg2 == CFG
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_export_matches_direct_int8(tmp_path, params):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    texts = ["a photo of a cat", "a dog"]
    calib = str(tmp_path / "scales.npz")

    direct = InferenceEngine(params, CFG, batch_buckets=(8,))
    direct.enable_int8(imgs, sample_texts=texts, save_calibration=calib)

    out = str(tmp_path / "srv8")
    aot.export_servable(params, CFG, out, batch_buckets=(8,), int8_calibration=calib)
    frozen = aot.load_servable(out)

    want_i, want_t = direct.encode_image_arrays(imgs), direct.encode_text(texts)
    assert np.all(np.isfinite(want_i)) and np.all(np.isfinite(want_t))
    np.testing.assert_array_equal(frozen.encode_image_arrays(imgs), want_i)
    np.testing.assert_array_equal(frozen.encode_text(texts), want_t)


def test_int8_export_needs_both_towers(tmp_path, params):
    from clip_mixer_tpu.ops import quant_io

    calib = str(tmp_path / "img_only.npz")
    engine = InferenceEngine(params, CFG, batch_buckets=(4,))
    engine.enable_int8(
        np.zeros((4, 32, 32, 3), np.uint8), save_calibration=calib
    )
    with pytest.raises(ValueError, match="BOTH towers"):
        aot.export_servable(params, CFG, str(tmp_path / "x"), int8_calibration=calib)


def test_load_servable_rejects_plain_checkpoint(tmp_path, params):
    plain = str(tmp_path / "plain")
    clip.save_pretrained(params, CFG, plain)
    with pytest.raises(FileNotFoundError, match="servable"):
        aot.load_servable(plain)


def test_export_cli(tmp_path, params):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import export_servable as cli

    src = str(tmp_path / "src")
    clip.save_pretrained(params, CFG, src)
    out = str(tmp_path / "out")
    cli.main(["--model", src, "--out", out, "--buckets", "2,4"])
    eng = aot.load_servable(out)
    feats = eng.encode_text(["hello world"])
    assert feats.shape == (1, CFG.embed_dim) and np.all(np.isfinite(feats))


def test_cross_platform_export(tmp_path, params):
    """Freeze for a device family the host doesn't have: platforms=("tpu",
    "cpu") lowers both on a CPU host; the CPU leg still runs here (the TPU
    leg is selected at .call time on a TPU host)."""
    out = str(tmp_path / "xsrv")
    aot.export_servable(params, CFG, out, batch_buckets=(2,), platforms=("tpu", "cpu"))
    import json, os
    manifest = json.load(open(os.path.join(out, "servable", "manifest.json")))
    assert sorted(manifest["platforms"]) == ["cpu", "tpu"]
    eng = aot.load_servable(out)
    feats = eng.encode_text(["a cat"])
    assert feats.shape == (1, CFG.embed_dim) and np.all(np.isfinite(feats))


def test_trainer_freeze_serving(tmp_path):
    """--freeze-serving: training completion writes an export that
    load_servable accepts directly (the release-artifact path)."""
    from clip_mixer_tpu.config import TrainConfig
    from clip_mixer_tpu.data.pipeline import SyntheticSource
    from clip_mixer_tpu.parallel.mesh import make_mesh
    from clip_mixer_tpu.train.trainer import Trainer

    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    data = SyntheticSource(batch_size=4, image_size=32, n_batches=2, n_classes=4, context_length=16)
    tcfg = TrainConfig(
        global_batch_size=4, epochs=1, learning_rate=1e-3, warmup_steps=1,
        checkpoint_every_steps=2, freeze_serving=True,
    )
    run = str(tmp_path / "run")
    tr = Trainer(CFG, tcfg, data, run, mesh=mesh)
    tr.train()

    eng = aot.load_servable(f"{run}/export")
    feats = eng.encode_text(["a red square"])
    assert feats.shape == (1, CFG.embed_dim) and np.all(np.isfinite(feats))


def test_platform_mismatch_rejected_at_load(tmp_path, params):
    out = str(tmp_path / "tpuonly")
    aot.export_servable(params, CFG, out, batch_buckets=(2,), platforms=("tpu",))
    with pytest.raises(ValueError, match="lowered for"):
        aot.load_servable(out)  # running on cpu
    # escape hatch defers the check to call time
    eng = aot.load_servable(out, check_platform=False)
    assert eng.buckets == [2]


def test_frozen_engine_reports_provenance(tmp_path, params):
    out = str(tmp_path / "hsrv")
    aot.export_servable(params, CFG, out, batch_buckets=(2,))
    eng = aot.load_servable(out)
    assert eng.frozen is True
    assert eng.path_kinds == {"image": "float", "text": "float"}


def test_mesh_frozen_programs(tmp_path, params):
    """Programs recorded data-parallel over a 4-device mesh: load rebuilds
    the mesh and serves bit-identically to the live meshed engine (and
    numerically to the single-device engine)."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    out = str(tmp_path / "msrv")
    aot.export_servable(params, CFG, out, batch_buckets=(2, 8), mesh=mesh)

    import json, os
    manifest = json.load(open(os.path.join(out, "servable", "manifest.json")))
    assert manifest["mesh"] == {"axis_names": ["data"], "shape": [4]}
    assert manifest["buckets"] == [4, 8]  # rounded to device multiples

    frozen = aot.load_servable(out)
    assert frozen.mesh is not None and frozen.mesh.devices.size == 4
    live = InferenceEngine(params, CFG, batch_buckets=(2, 8), mesh=mesh)
    single = InferenceEngine(params, CFG, batch_buckets=(8,))

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    texts = ["a cat", "two dogs", "a diagram"]
    got_i, got_t = frozen.encode_image_arrays(imgs), frozen.encode_text(texts)
    assert np.all(np.isfinite(got_i)) and np.all(np.isfinite(got_t))
    np.testing.assert_array_equal(got_i, live.encode_image_arrays(imgs))
    np.testing.assert_array_equal(got_t, live.encode_text(texts))
    np.testing.assert_allclose(got_i, single.encode_image_arrays(imgs), atol=1e-5)


def test_enable_int8_on_frozen_engine_clears_provenance(tmp_path, params):
    """enable_int8 swaps recorded programs for live-jitted ones — healthz
    must stop claiming frozen."""
    out = str(tmp_path / "fsrv")
    aot.export_servable(params, CFG, out, batch_buckets=(4,))
    eng = aot.load_servable(out)
    assert eng.frozen is True
    eng.enable_int8(np.zeros((4, 32, 32, 3), np.uint8))
    assert eng.frozen is False and eng.path_kinds["image"] == "int8"


def test_manifest_versioning(tmp_path, params):
    """Plain exports stay manifest version 1 (loadable by older deployments);
    input_hw exports write version 2 so a v1-only loader rejects them cleanly
    instead of host-preprocessing to 224 and hitting a shape error inside the
    frozen (b, ih, iw, 3) programs. Unknown versions fail loudly."""
    import json

    plain = str(tmp_path / "plain")
    aot.export_servable(params, CFG, plain, batch_buckets=(4,))
    m = json.loads((Path(plain) / "servable" / "manifest.json").read_text())
    assert m["version"] == 1

    ihw = str(tmp_path / "ihw")
    aot.export_servable(params, CFG, ihw, batch_buckets=(4,), input_hw=(64, 64))
    m2 = json.loads((Path(ihw) / "servable" / "manifest.json").read_text())
    assert m2["version"] == 2 and m2["input_hw"] == [64, 64]
    eng = aot.load_servable(ihw)
    assert eng.input_hw == (64, 64)

    # future/unknown version: clean rejection
    m2["version"] = 3
    (Path(ihw) / "servable" / "manifest.json").write_text(json.dumps(m2))
    with pytest.raises(ValueError, match="manifest version"):
        aot.load_servable(ihw)
