"""The torch drop-in surface (`clip_mixer_tpu.compat`): reference user code
(README.md:42-59 demo shape, tests/test.py) must run unmodified and agree
with the native functional API."""

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

import clip_mixer_tpu.compat as clip
from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.preprocess import normalize_images, preprocess_pil
from clip_mixer_tpu.text import tokenize as tokenize_np

TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=16,
    vocab_size=49408,  # full vocab so real BPE tokens stay in range
    text_width=64,
    text_heads=2,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_preprocess(tmp_path_factory):
    """A compat model over a saved tiny native checkpoint — exercises the
    load() path end-to-end, not just the wrapper class."""
    from clip_mixer_tpu.api import save_pretrained

    params = clip_model.init(jax.random.key(0), TINY)
    path = str(tmp_path_factory.mktemp("compat") / "export")
    save_pretrained(params, TINY, path)
    model, preprocess = clip.load(path, device="cpu")
    return model, preprocess, params


def test_available_models():
    names = clip.available_models()
    assert "ViT-B/32" in names and "mixer-b32" in names


def test_tokenize_matches_native_and_is_torch_long():
    texts = ["a diagram", "a dog", "a cat"]
    t = clip.tokenize(texts)
    assert isinstance(t, torch.Tensor) and t.dtype == torch.long
    assert t.shape == (3, 77)
    np.testing.assert_array_equal(t.numpy(), np.asarray(tokenize_np(texts)))
    with pytest.raises(RuntimeError):
        clip.tokenize(["word " * 50], context_length=8)


def test_reference_demo_shape(model_and_preprocess):
    """The README demo, line for line, against the tiny model."""
    model, preprocess, _ = model_and_preprocess
    rng = np.random.default_rng(0)
    pil = Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8))

    image = preprocess(pil).unsqueeze(0)
    assert image.shape == (1, 3, 32, 32) and image.dtype == torch.float32
    text = clip.tokenize(["a diagram", "a dog", "a cat"], context_length=16, truncate=True)

    with torch.no_grad():
        image_features = model.encode_image(image)
        text_features = model.encode_text(text)
        img_f, txt_f, scale = model(image, text)

    assert image_features.shape == (1, 64) and text_features.shape == (3, 64)
    # forward returns the reference triple: L2-normalised features + exp scale
    np.testing.assert_allclose(np.linalg.norm(img_f.numpy(), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt_f.numpy(), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(scale), np.exp(float(model.logit_scale)), rtol=1e-6)

    per_image, per_text = model.logits(image, text)
    assert per_image.shape == (1, 3)
    np.testing.assert_allclose(per_image.numpy(), per_text.numpy().T, rtol=1e-6)
    probs = per_image.softmax(dim=-1).numpy()
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-6)


def test_compat_agrees_with_native_api(model_and_preprocess):
    """The torch-tensor path must produce the same features as the native
    uint8-HWC + in-graph-normalize path."""
    model, preprocess, params = model_and_preprocess
    rng = np.random.default_rng(1)
    pil = Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8))

    compat_feats = model.encode_image(preprocess(pil).unsqueeze(0)).numpy()

    hwc = preprocess_pil(pil, TINY.image_resolution)[None]
    native = clip_model.encode_image(params, TINY, normalize_images(jnp.asarray(hwc)))
    np.testing.assert_allclose(compat_feats, np.asarray(native), atol=1e-5)

    # uint8 NHWC input is accepted directly too (the native convention)
    direct = model.encode_image(torch.from_numpy(hwc.copy())).numpy()
    np.testing.assert_allclose(direct, compat_feats, atol=1e-5)

    toks = tokenize_np(["hello world"], context_length=16)
    compat_txt = model.encode_text(torch.from_numpy(np.asarray(toks)).long()).numpy()
    native_txt = clip_model.encode_text(params, TINY, jnp.asarray(toks))
    np.testing.assert_allclose(compat_txt, np.asarray(native_txt), atol=1e-5)


def test_torch_idioms_and_attributes(model_and_preprocess):
    model, _, _ = model_and_preprocess
    assert model.eval() is model and model.to("cpu") is model and model.float() is model
    assert model.train(False) is model
    with pytest.raises(RuntimeError):
        model.train()
    assert model.context_length == 16
    assert model.vocab_size == 49408
    assert model.input_resolution == 32
    # the reference's own training.py:288 reads model.visual.input_resolution
    assert model.visual.input_resolution == 32
    assert model.dtype == torch.float32


def test_state_dict_round_trips(model_and_preprocess, tmp_path):
    """torch.save(model.state_dict()) must be loadable back through load()."""
    model, _, params = model_and_preprocess
    sd = model.state_dict()
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    pt = tmp_path / "compat.pt"
    torch.save(sd, pt)
    model2, _ = clip.load(str(pt), device="cpu")
    toks = clip.tokenize(["round trip"], context_length=16, truncate=True)
    np.testing.assert_allclose(
        model.encode_text(toks).numpy(), model2.encode_text(toks).numpy(), atol=1e-5
    )


def test_load_preset_by_name():
    model, preprocess = clip.load("mixer-debug", device="cpu")
    assert model.input_resolution == model.cfg.image_resolution
    img = torch.zeros(1, 3, model.input_resolution, model.input_resolution)
    feats = model.encode_image(img)
    assert feats.shape == (1, model.cfg.embed_dim)
