"""Golden-numerics regression: fixed seeds + fixed inputs must reproduce the
committed reference outputs (tests/assets/golden.npz) bit-closely on CPU.

Catches silent numerics drift — init changes, op reorderings, layout changes
— that shape/parity tests structured around a live torch oracle would track
rather than catch. Regenerate DELIBERATELY (script in the npz's git history)
when an intentional numerics change lands, and say why in the commit.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.text import tokenize

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "assets", "golden.npz"))


def _cfg(tower):
    return CLIPConfig(
        embed_dim=16,
        image_resolution=16,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=8,
        context_length=77,
        vocab_size=49408,
        text_width=64,
        text_heads=1,
        text_layers=2,
        tower=tower,
        compute_dtype="float32",
    )


def test_tokenizer_golden():
    np.testing.assert_array_equal(
        tokenize(["a golden test", "the quick brown fox"]), GOLDEN["tokens"]
    )


def test_model_golden():
    for tower in ("mixer", "transformer"):
        cfg = _cfg(tower)
        params = clip_model.init(jax.random.key(42), cfg)
        rng = np.random.default_rng(123)
        imgs = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
        toks = jnp.asarray(GOLDEN["tokens"])
        i, t, _ = clip_model.forward(params, cfg, imgs, toks)
        np.testing.assert_allclose(np.asarray(i), GOLDEN[f"{tower}_img"], atol=2e-6)
        np.testing.assert_allclose(np.asarray(t), GOLDEN[f"{tower}_txt"], atol=2e-6)
