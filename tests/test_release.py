"""scripts/release.py: calibrate -> gate-the-shipped-scales -> freeze.

The one-command deployment pipeline (the reference ships raw Accelerate
state dirs with no release procedure — training/validateModel.py:48-50)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import clip_mixer_tpu as clip
from clip_mixer_tpu import aot
from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model

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
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rel") / "ckpt")
    clip.save_pretrained(clip_model.init(jax.random.key(0), CFG), CFG, path)
    return path


def test_release_int8_end_to_end(tmp_path, ckpt):
    import release

    out = str(tmp_path / "release")
    release.main([
        "--model", ckpt, "--out", out, "--n", "16",
        "--gate-n", "64", "--buckets", "2,4",
    ])

    manifest = json.loads((Path(out) / "RELEASE.json").read_text())
    assert manifest["int8"] is True
    assert manifest["gates"]["image"]["passed"] and manifest["gates"]["text"]["passed"]
    assert manifest["buckets"] == [2, 4]

    eng = aot.load_servable(out)
    assert eng.path_kinds == {"image": "int8", "text": "int8"} and eng.frozen
    feats = eng.encode_image_arrays(np.zeros((3, 32, 32, 3), np.uint8))
    assert feats.shape == (3, CFG.embed_dim) and np.all(np.isfinite(feats))


def test_release_float_path(tmp_path, ckpt):
    import release

    out = str(tmp_path / "frelease")
    release.main(["--model", ckpt, "--out", out, "--no-int8", "--buckets", "2"])
    manifest = json.loads((Path(out) / "RELEASE.json").read_text())
    assert manifest["int8"] is False and manifest["gates"] == {}
    eng = aot.load_servable(out)
    assert eng.path_kinds == {"image": "float", "text": "float"}


def test_release_aborts_on_failed_gate(tmp_path, ckpt, monkeypatch):
    """A failing accuracy gate must abort BEFORE anything is frozen."""
    import release
    from clip_mixer_tpu.evals import quant_gate

    real_gate = quant_gate.noise_floor_gate

    def failing_gate(*a, **kw):
        out = real_gate(*a, **kw)
        out["passed"] = False
        return out

    monkeypatch.setattr(quant_gate, "noise_floor_gate", failing_gate)
    out = str(tmp_path / "bad")
    with pytest.raises(SystemExit, match="RELEASE ABORTED"):
        release.main([
            "--model", ckpt, "--out", out, "--n", "16",
            "--gate-n", "64", "--buckets", "2",
        ])
    assert not (Path(out) / "servable").exists()


def test_release_verify(tmp_path, ckpt):
    """release.py --verify: passes on a good release, fails on a recorded
    failed gate."""
    import release

    out = str(tmp_path / "vrelease")
    release.main(["--model", ckpt, "--out", out, "--n", "16", "--gate-n", "64", "--buckets", "2"])
    release.main(["--out", out, "--verify"])  # must not raise

    # tamper: a recorded failed gate must fail verification
    rj = Path(out) / "RELEASE.json"
    manifest = json.loads(rj.read_text())
    manifest["gates"]["image"]["passed"] = False
    rj.write_text(json.dumps(manifest))
    with pytest.raises(SystemExit, match="VERIFY FAILED"):
        release.main(["--out", out, "--verify"])
