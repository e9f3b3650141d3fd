"""README demo-path consistency test — the spirit of the reference's
tests/test_consistency.py:9-25, runnable offline.

The reference compares jit vs non-jit torch model outputs on CLIP.png with
three prompts. Offline we cannot download OpenAI checkpoints, so the oracle
is the reference torch implementation with a converted random-init
checkpoint: the FULL demo pipeline (PIL preprocess -> normalize -> both
encoders -> logits -> softmax) must produce the same label probabilities in
torch and in this framework, for both tower types.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/reference/training/clip")

import jax
import jax.numpy as jnp

import clip_mixer_tpu as cm
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.models.convert import state_dict_to_params
from clip_mixer_tpu.ops.preprocess import normalize_images

ASSET = os.path.join(os.path.dirname(__file__), "assets", "CLIP.png")
PROMPTS = ["a diagram", "a dog", "a cat"]


@pytest.mark.parametrize("use_transformer", [False, True])
def test_demo_probs_match_torch(use_transformer):
    import torch
    from model import CLIP as TorchCLIP

    torch.manual_seed(11)
    tm = TorchCLIP(64, 64, 2, 64, 16, 77, 49408, 64, 1, 2, useTransformer=use_transformer).float().eval()
    params, cfg = state_dict_to_params(dict(tm.state_dict()))
    cfg = cfg.replace(compute_dtype="float32")

    from clip_mixer_tpu.ops.preprocess import make_transform

    transform = make_transform(cfg.image_resolution)
    image = transform(Image.open(ASSET))  # HWC uint8
    assert image.shape == (64, 64, 3)
    tokens = cm.tokenize(PROMPTS)

    # torch demo path (reference tests/test.py semantics, fixed for the
    # 3-tuple forward: model returns normalised features + scale)
    with torch.no_grad():
        t_img = torch.from_numpy(
            ((image.astype(np.float32) / 255.0 - np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
             / np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)).transpose(2, 0, 1)[None]
        )
        i_f, t_f, scale = tm(t_img, torch.from_numpy(np.asarray(tokens, np.int64)))
        torch_probs = (scale * i_f @ t_f.T).softmax(dim=-1).numpy()

    # our demo path
    img = normalize_images(jnp.asarray(image[None]), dtype=jnp.float32)
    per_image, _ = clip_model.logits(params, cfg, img, jnp.asarray(tokens))
    our_probs = np.asarray(jax.nn.softmax(per_image, axis=-1))

    np.testing.assert_allclose(our_probs, torch_probs, atol=1e-4)
    np.testing.assert_allclose(our_probs.sum(), 1.0, rtol=1e-5)
