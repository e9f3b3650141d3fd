"""Persistent int8 calibration artifacts (ops/quant_io.py).

The serving contract: calibrate once (enable_int8(save_calibration=...) or
scripts/calibrate_int8.py), then enable int8 anywhere from the artifact with
NO sample data — producing bit-identical quantized features. The reference
has no quantization; this gates the int8 addition's operational story.
"""

import numpy as np
import pytest

import jax

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.ops import quant_io
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


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flatten_roundtrip_nested_lists():
    """The ResNet scale tree shape: dicts holding per-stage LISTS of dicts."""
    tree = {
        "stem": np.float32(0.25),
        "layer1": [
            {"conv1": np.float32(0.1), "conv2": np.arange(3, dtype=np.float32)},
            {"conv1": np.float32(0.2), "conv2": np.arange(3, 6, dtype=np.float32)},
        ],
        "attnpool": {"q": np.ones((2, 2), np.float32)},
    }
    back = quant_io._unflatten(list(quant_io._flatten(tree)))
    _tree_equal(tree, back)
    assert isinstance(back["layer1"], list) and len(back["layer1"]) == 2


def test_save_load_roundtrip(tmp_path):
    img = {"patch": np.float32(0.01), "ch_in": np.full((2,), 0.02, np.float32)}
    txt = {"embed": np.float32(0.03)}
    path = str(tmp_path / "scales.npz")
    quant_io.save_calibration(path, CFG, image_scales=img, text_scales=txt)
    art = quant_io.load_calibration(path)
    _tree_equal(art["image_scales"], img)
    _tree_equal(art["text_scales"], txt)
    quant_io.check_cfg(art["cfg"], CFG)  # fingerprint matches itself


def test_save_requires_scales(tmp_path):
    with pytest.raises(ValueError, match="nothing to save"):
        quant_io.save_calibration(str(tmp_path / "x.npz"), CFG)


def test_cfg_mismatch_raises(tmp_path):
    path = str(tmp_path / "scales.npz")
    quant_io.save_calibration(path, CFG, image_scales={"patch": np.float32(0.01)})
    art = quant_io.load_calibration(path)
    with pytest.raises(ValueError, match="vision_width"):
        quant_io.check_cfg(art["cfg"], CFG.replace(vision_width=64))
    # train-only fields don't invalidate the artifact
    quant_io.check_cfg(art["cfg"], CFG.replace(remat=True))
    # dtype differences warn but pass (scales are f32 statistics)
    with pytest.warns(UserWarning, match="dtype"):
        quant_io.check_cfg(art["cfg"], CFG.replace(compute_dtype="bfloat16"))


def test_engine_int8_from_artifact_matches_direct(tmp_path):
    """enable_int8(calibration=...) on a data-free engine == direct
    calibration, feature-for-feature, both towers."""
    from clip_mixer_tpu.models import clip as clip_model

    params = clip_model.init(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    texts = ["a photo of a cat", "a dog running", "blue square", "tiny plane"]
    path = str(tmp_path / "scales.npz")

    direct = InferenceEngine(params, CFG, batch_buckets=(8,))
    direct.enable_int8(imgs, sample_texts=texts, save_calibration=path)

    loaded = InferenceEngine(params, CFG, batch_buckets=(8,))
    loaded.enable_int8(calibration=path)

    img_feats, txt_feats = direct.encode_image_arrays(imgs), direct.encode_text(texts)
    # finite first: assert_array_equal treats aligned NaNs as equal, which
    # would mask a broken path matching itself
    assert np.all(np.isfinite(img_feats)) and np.all(np.isfinite(txt_feats))
    np.testing.assert_array_equal(img_feats, loaded.encode_image_arrays(imgs))
    np.testing.assert_array_equal(txt_feats, loaded.encode_text(texts))

    # artifact for a different architecture is refused
    with pytest.raises(ValueError, match="different architecture"):
        InferenceEngine(
            clip_model.init(jax.random.key(0), CFG.replace(vision_layers=1)),
            CFG.replace(vision_layers=1),
        ).enable_int8(calibration=path)


def test_enable_int8_requires_some_source():
    from clip_mixer_tpu.models import clip as clip_model

    engine = InferenceEngine(clip_model.init(jax.random.key(0), CFG), CFG)
    with pytest.raises(ValueError, match="no scales"):
        engine.enable_int8()


def test_text_only_artifact_quantizes_only_text(tmp_path):
    """A text-only artifact serves: text path goes int8, image path keeps
    the float encoder (the advertised 'whichever towers it holds')."""
    from clip_mixer_tpu.models import clip as clip_model

    params = clip_model.init(jax.random.key(0), CFG)
    texts = ["a cat", "a dog"]
    imgs = np.zeros((4, 32, 32, 3), np.uint8)
    path = str(tmp_path / "text_scales.npz")

    src = InferenceEngine(params, CFG, batch_buckets=(4,))
    src.enable_int8(sample_texts=texts, save_calibration=path)
    art = quant_io.load_calibration(path)
    assert art["image_scales"] is None and art["text_scales"] is not None

    flt = InferenceEngine(params, CFG, batch_buckets=(4,))
    before_img, before_txt = flt.encode_image_arrays(imgs), flt.encode_text(texts)
    eng = InferenceEngine(params, CFG, batch_buckets=(4,))
    eng.enable_int8(calibration=path)
    np.testing.assert_array_equal(eng.encode_image_arrays(imgs), before_img)
    after_txt = eng.encode_text(texts)
    assert not np.array_equal(after_txt, before_txt)  # int8 path engaged
    cos = (after_txt * before_txt).sum(-1)
    assert cos.min() > 0.99, cos


def test_non_string_dict_keys_rejected(tmp_path):
    with pytest.raises(TypeError, match="keys must be str"):
        quant_io.save_calibration(
            str(tmp_path / "x.npz"), CFG, image_scales={0: np.float32(0.1)}
        )


def test_calibrate_cli_smoke(tmp_path):
    """scripts/calibrate_int8.py end-to-end on a saved tiny checkpoint."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import calibrate_int8

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.models import clip as clip_model

    ckpt = str(tmp_path / "ckpt")
    clip.save_pretrained(clip_model.init(jax.random.key(1), CFG), CFG, ckpt)
    out = str(tmp_path / "scales.npz")
    calibrate_int8.main(["--model", ckpt, "--out", out, "--n", "16"])

    art = quant_io.load_calibration(out)
    assert art["image_scales"] is not None and art["text_scales"] is not None
    params, cfg, _ = clip.load(ckpt)
    engine = InferenceEngine(params, cfg, batch_buckets=(8,))
    engine.enable_int8(calibration=out)  # fingerprint + structure accepted
    feats = engine.encode_image_arrays(np.zeros((4, 32, 32, 3), np.uint8))
    assert np.all(np.isfinite(feats))


def test_resnet_artifact_roundtrip(tmp_path):
    """RN scale trees carry per-stage LISTS — the artifact must reproduce
    them exactly (features bit-identical to direct calibration)."""
    from test_quant import RN_CFG, _rn_params

    params = _rn_params(3)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "rn_scales.npz")

    direct = InferenceEngine(params, RN_CFG, batch_buckets=(8,))
    direct.enable_int8(imgs[:4], save_calibration=path)
    loaded = InferenceEngine(params, RN_CFG, batch_buckets=(8,))
    loaded.enable_int8(calibration=path)
    feats = direct.encode_image_arrays(imgs)
    assert np.all(np.isfinite(feats))
    np.testing.assert_array_equal(feats, loaded.encode_image_arrays(imgs))


def test_flatten_fuzz_random_trees():
    """Property test: save/load round-trips arbitrary nested dict/list
    trees of arrays (the artifact format must never depend on the exact
    scale-tree shapes the quantizers happen to emit today)."""
    rng = np.random.default_rng(0)

    def random_tree(depth):
        if depth == 0 or rng.random() < 0.3:
            shape = tuple(rng.integers(1, 4, rng.integers(0, 3)))
            return rng.standard_normal(shape).astype(np.float32)
        if rng.random() < 0.5:
            return {f"k{i}": random_tree(depth - 1) for i in range(rng.integers(1, 4))}
        return [random_tree(depth - 1) for _ in range(rng.integers(1, 4))]

    for seed in range(20):
        tree = {"root": random_tree(3)}  # top level must be a dict
        back = quant_io._unflatten(list(quant_io._flatten(tree)))
        _tree_equal(tree, back)


def test_pre_existing_artifacts_without_loss_init_fields_still_pass(tmp_path):
    """Artifacts saved before logit_scale_init/logit_bias_init became config
    FIELDS have no such keys — they must keep validating (the init scalars
    are train-only; the trained values live in the params), or every shipped
    calibration/bank/release dir breaks on upgrade."""
    path = str(tmp_path / "scales.npz")
    quant_io.save_calibration(path, CFG, image_scales={"patch": np.float32(0.01)})
    art = quant_io.load_calibration(path)
    legacy = {k: v for k, v in art["cfg"].items()
              if k not in ("logit_scale_init", "logit_bias_init")}
    quant_io.check_cfg(legacy, CFG)  # no raise
    # and a siglip-trained model serves against a float-era artifact
    quant_io.check_cfg(legacy, CFG.replace(logit_bias_init=-10.0))
