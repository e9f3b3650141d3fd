"""clip_mixer_tpu — TPU-native CLIP + MLP-Mixer contrastive framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
corentin-ryr/CLIP-mixer (reference mounted read-only at /root/reference):
the public clip.load / clip.tokenize / encode_image / encode_text /
model(image, text) API, the MLP-Mixer dual-tower variant, global-batch
InfoNCE training over a device mesh, and the zero-shot/STS/SST-2/MNIST
validation harnesses.

Quick start (README demo path, reference README.md:35-60):

    import jax.numpy as jnp
    import clip_mixer_tpu as clip
    from clip_mixer_tpu.models import clip as clip_model

    params, cfg, preprocess = clip.load("mixer-b32")
    image = preprocess(PIL.Image.open("CLIP.png"))          # HWC uint8
    from clip_mixer_tpu.ops.preprocess import normalize_images
    img = normalize_images(jnp.asarray(image[None]))
    text = jnp.asarray(clip.tokenize(["a diagram", "a dog", "a cat"]))
    per_image, per_text = clip_model.logits(params, cfg, img, text)
"""

from clip_mixer_tpu.api import available_models, load, load_pretrained, save_pretrained
from clip_mixer_tpu.config import CLIPConfig, PRESETS, TrainConfig
from clip_mixer_tpu.text import tokenize

__version__ = "0.1.0"

__all__ = [
    "available_models",
    "load",
    "load_pretrained",
    "save_pretrained",
    "tokenize",
    "CLIPConfig",
    "TrainConfig",
    "PRESETS",
    "__version__",
]
