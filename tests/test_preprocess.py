"""Preprocess parity gates.

1. Host path vs PIL reference pipeline: byte comparison (same library, same
   order of operations, so near-exact — allow +-1 for PIL round-trip modes).
2. Device matmul path vs PIL: mean abs error within ~1.3/255 per pixel (PIL
   quantises each of its two resampling passes to uint8 fixed point; our
   float path differs by at most that rounding), which is eval-accuracy
   neutral (the 0.1%-top-1 gate is enforced on real checkpoints in evals).
3. Fused normalize matches the reference's in-loop Normalize(images/255).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from clip_mixer_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    make_batch_preprocess,
    make_transform,
    normalize_images,
    preprocess_pil,
    resize_geometry,
)


def _rand_img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish random image: random low-res upsampled (more realistic
    # frequency content than iid noise for resampling comparisons).
    small = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2, 3), np.uint8)
    return np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR), np.uint8)


@pytest.mark.parametrize("hw", [(256, 256), (256, 341), (480, 360), (224, 224)])
def test_host_path_matches_pil_reference(hw):
    """Our host path vs the reference transform done manually with PIL."""
    h, w = hw
    img = Image.fromarray(_rand_img(h, w))
    ours = preprocess_pil(img, 224)
    # Reference chain (clip.py:80-87 with torchvision semantics).
    oh, ow, top, left = resize_geometry(h, w, 224)
    ref = img.resize((ow, oh), Image.BICUBIC).crop((left, top, left + 224, top + 224)).convert("RGB")
    ref = np.asarray(ref, np.uint8)
    assert ours.shape == (224, 224, 3)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("hw", [(256, 256), (256, 320)])
def test_device_path_close_to_pil(hw):
    h, w = hw
    raw = _rand_img(h, w, seed=3)
    pil_out = preprocess_pil(Image.fromarray(raw), 224).astype(np.float32)

    fn = make_batch_preprocess((h, w), 224, normalize=False)
    dev_out = np.asarray(fn(jnp.asarray(raw[None]))[0]) * 255.0

    err = np.abs(dev_out - pil_out)
    assert err.mean() < 0.7, f"mean abs err {err.mean()}"
    assert np.percentile(err, 99) < 2.5, f"p99 err {np.percentile(err, 99)}"


def test_device_path_identity_when_same_size():
    """224x224 input: resize is identity, so only /255 applies."""
    raw = _rand_img(224, 224, seed=1)
    fn = make_batch_preprocess((224, 224), 224, normalize=False)
    out = np.asarray(fn(jnp.asarray(raw[None]))[0])
    np.testing.assert_allclose(out, raw.astype(np.float32) / 255.0, atol=1e-5)


def test_normalize_matches_reference_formula():
    raw = _rand_img(64, 64, seed=2)
    out = np.asarray(normalize_images(jnp.asarray(raw[None]))[0])
    expected = (raw.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_fused_normalize_consistent():
    raw = _rand_img(256, 256, seed=4)
    fused = make_batch_preprocess((256, 256), 224, normalize=True)
    plain = make_batch_preprocess((256, 256), 224, normalize=False)
    a = np.asarray(fused(jnp.asarray(raw[None]))[0])
    b = np.asarray(plain(jnp.asarray(raw[None]))[0])
    expected = (b - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(a, expected, atol=1e-4)


def test_make_transform_contract():
    t = make_transform(224)
    out = t(Image.fromarray(_rand_img(300, 400)))
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
