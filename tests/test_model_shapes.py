"""Shape + parameter-count gates for the model core.

Parameter counts are checked against the reference torch model instantiated
from /root/reference (read-only oracle) — the README's 111M (Mixer-B/32) and
151M (Transformer-B/32) figures come from exactly these configs
(training/training.py:275-287, validateModel.py:13-25).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/training/clip")

from clip_mixer_tpu.config import CLIPConfig, PRESETS
from clip_mixer_tpu.models import clip as clip_model

TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=16,
    vocab_size=512,
    text_width=64,
    text_heads=2,
    text_layers=2,
    compute_dtype="float32",
)


def _torch_model(cfg: CLIPConfig):
    """The ONE cfg -> reference-TorchCLIP mapping used by every oracle test
    (keyword args so a constructor change breaks loudly, not by mis-binding)."""
    import torch
    from model import CLIP as TorchCLIP  # reference, read-only oracle

    torch.manual_seed(0)
    return TorchCLIP(
        embed_dim=cfg.embed_dim,
        image_resolution=cfg.image_resolution,
        vision_layers=cfg.vision_layers,
        vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size,
        context_length=cfg.context_length,
        vocab_size=cfg.vocab_size,
        transformer_width=cfg.text_width,
        transformer_heads=cfg.text_heads,
        transformer_layers=cfg.text_layers,
        useTransformer=cfg.use_transformer,
    )


def _torch_param_count(cfg: CLIPConfig):
    return sum(p.numel() for p in _torch_model(cfg).parameters())


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_tiny_forward_shapes(tower):
    cfg = TINY.replace(tower=tower)
    params = clip_model.init(jax.random.key(0), cfg)
    B = 3
    images = jnp.zeros((B, 32, 32, 3), jnp.float32)
    text = jnp.zeros((B, 16), jnp.int32).at[:, 0].set(1).at[:, 1].set(511)
    img, txt, scale = jax.jit(
        lambda p, i, t: clip_model.forward(p, cfg, i, t)
    )(params, images, text)
    assert img.shape == (B, 64) and txt.shape == (B, 64)
    np.testing.assert_allclose(np.linalg.norm(img, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(scale), 1 / 0.07, rtol=1e-5)


@pytest.mark.parametrize("name", ["mixer-b32", "transformer-b32"])
def test_param_count_matches_reference(name):
    cfg = PRESETS[name]
    params = clip_model.init(jax.random.key(0), cfg)
    ours = clip_model.param_count(params)
    theirs = _torch_param_count(cfg)
    assert ours == theirs, f"{name}: ours={ours} reference={theirs}"


@pytest.mark.parametrize("name", ["rn101", "rn50x4", "vit-l14-336"])
def test_big_preset_structure_matches_reference(name):
    """The from-scratch presets for the OpenAI registry geometries must
    define EXACTLY the reference architecture: every state_dict key and
    shape identical to the torch oracle (stronger than a parameter count,
    which would miss shape swaps — and torch's .parameters() excludes the
    BN running-stat buffers our pytree rightly carries). Our side goes
    through eval_shape + the exporter, so nothing big is materialised."""
    from clip_mixer_tpu.models.convert import params_to_state_dict

    cfg = PRESETS[name]
    theirs = {k: tuple(v.shape) for k, v in _torch_model(cfg).state_dict().items()}
    shapes = jax.eval_shape(lambda k: clip_model.init(k, cfg), jax.random.key(0))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    ours = {k: tuple(np.asarray(v).shape) for k, v in params_to_state_dict(zeros, cfg).items()}
    assert ours == theirs


@pytest.mark.parametrize("name", ["rn50x16", "rn50x64"])
def test_huge_preset_geometry(name):
    """Cheap structural gates for the geometries too big to build the torch
    oracle in the suite: init traces (eval_shape) and the attention-pool /
    resolution relations hold."""
    cfg = PRESETS[name]
    shapes = jax.eval_shape(lambda k: clip_model.init(k, cfg), jax.random.key(0))
    pos = shapes["visual"]["attnpool"]["pos_embedding"]
    spacial = cfg.image_resolution // 32
    assert pos.shape == (spacial**2 + 1, cfg.vision_width * 32)
    assert shapes["text"]["projection"].shape == (cfg.text_width, cfg.embed_dim)
    assert cfg.text_width % cfg.text_heads == 0


def test_logits_demo_contract():
    cfg = TINY
    params = clip_model.init(jax.random.key(0), cfg)
    images = jnp.ones((1, 32, 32, 3), jnp.float32)
    text = jnp.zeros((3, 16), jnp.int32).at[:, 0].set(1).at[:, 1].set(511)
    per_image, per_text = clip_model.logits(params, cfg, images, text)
    assert per_image.shape == (1, 3) and per_text.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(per_image).T, np.asarray(per_text), rtol=1e-6)
