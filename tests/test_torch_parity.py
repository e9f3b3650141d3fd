"""Numeric parity vs the reference torch model (read-only oracle).

For each tower variant, a randomly-initialised reference CLIP is exported via
state_dict, converted with our torch->JAX converter, and both implementations
are run on identical inputs in fp32. encode_image / encode_text / forward must
agree to float32 tolerance — this validates the converter's layout mapping
(packed QKV, conv-as-matmul patchify, mixer lin1..lin4) and every apply fn.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/training/clip")

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.models.convert import sniff_config, state_dict_to_params

SMALL = dict(
    embed_dim=64,
    image_resolution=64,
    vision_width=64,
    vision_patch_size=16,
    context_length=19,
    vocab_size=512,
    text_width=64,
    # heads must satisfy the width//64 sniffing rule (reference model.py:491)
    text_heads=1,
)


def _build_torch(tower, vision_layers=3, text_layers=3):
    import torch
    from model import CLIP as TorchCLIP

    torch.manual_seed(42)
    m = TorchCLIP(
        embed_dim=SMALL["embed_dim"],
        image_resolution=SMALL["image_resolution"],
        vision_layers=vision_layers,
        vision_width=SMALL["vision_width"],
        vision_patch_size=SMALL["vision_patch_size"] if not isinstance(vision_layers, tuple) else None,
        context_length=SMALL["context_length"],
        vocab_size=SMALL["vocab_size"],
        transformer_width=SMALL["text_width"],
        transformer_heads=SMALL["text_heads"],
        transformer_layers=text_layers,
        useTransformer=(tower == "transformer"),
    )
    return m.float().eval()


def _inputs(res=64, ctx=19, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 1, (batch, 3, res, res)).astype(np.float32)  # NCHW for torch
    text = np.zeros((batch, ctx), dtype=np.int64)
    for i in range(batch):
        n = int(rng.integers(3, ctx - 1))
        text[i, 0] = 510
        text[i, 1 : n - 1] = rng.integers(1, 500, n - 2)
        text[i, n - 1] = 511  # eot = max id
    return images, text


@pytest.mark.parametrize("tower,vision_layers", [("mixer", 3), ("transformer", 3), ("resnet", (2, 2, 2, 2))])
def test_parity(tower, vision_layers):
    import torch

    torch_tower = "transformer" if tower == "resnet" else tower
    tm = _build_torch(torch_tower, vision_layers=vision_layers)
    sd = {k: v for k, v in tm.state_dict().items()}

    params, cfg = state_dict_to_params(sd)
    assert cfg.tower == torch_tower
    assert cfg.is_resnet == (tower == "resnet")
    cfg = cfg.replace(compute_dtype="float32")

    images, text = _inputs(ctx=cfg.context_length)
    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(images)).numpy()
        t_txt = tm.encode_text(torch.from_numpy(text)).numpy()
        t_if, t_tf, t_scale = tm(torch.from_numpy(images), torch.from_numpy(text))

    j_images = jnp.asarray(images.transpose(0, 2, 3, 1))  # NHWC
    j_text = jnp.asarray(text.astype(np.int32))
    j_img = np.asarray(clip_model.encode_image(params, cfg, j_images))
    j_txt = np.asarray(clip_model.encode_text(params, cfg, j_text))
    j_if, j_tf, j_scale = clip_model.forward(params, cfg, j_images, j_text)

    atol = 2e-4 if tower == "resnet" else 5e-5
    np.testing.assert_allclose(j_img, t_img, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(j_txt, t_txt, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_if), t_if.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_tf), t_tf.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(j_scale), float(t_scale), rtol=1e-6)


def test_sniff_full_size_mixer():
    """Config sniffing on the flagship geometry without running it."""
    import torch
    from model import CLIP as TorchCLIP

    torch.manual_seed(0)
    # Reference trained config (training.py:275-287)
    m = TorchCLIP(512, 224, 12, 768, 32, 77, 49408, 512, 8, 12, useTransformer=False)
    cfg = sniff_config(dict(m.state_dict()))
    assert cfg == CLIPConfig(tower="mixer")
