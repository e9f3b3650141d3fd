"""Zero-shot classification, both API styles.

Runs offline on any backend (CPU or TPU) with a randomly-initialised
preset; swap the model name for "ViT-B/32" (downloads the OpenAI
checkpoint) or a trained `outputs/<run>/export` dir for real predictions.

    python examples/zero_shot.py [model_name]
"""

# Allow running straight from a repo checkout without pip install.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))



import numpy as np
from PIL import Image

MODEL = sys.argv[1] if len(sys.argv) > 1 else "mixer-debug"
LABELS = ["a diagram", "a dog", "a cat"]
_ASSET = os.path.join(os.path.dirname(__file__), "..", "tests", "assets", "CLIP.png")


def demo_image() -> Image.Image:
    try:  # the repo's test asset (the reference's CLIP.png)
        return Image.open(_ASSET).convert("RGB")
    except OSError:
        rng = np.random.default_rng(0)
        return Image.fromarray(rng.integers(0, 255, (224, 224, 3), np.uint8))


def native_style():
    """The functional API — what training/serving/evals use."""
    import jax
    import jax.numpy as jnp

    import clip_mixer_tpu as cm
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import normalize_images

    # float32 so both styles print identical numbers (compat picks f32 on
    # CPU the way the reference's device pick did; default is bf16).
    params, cfg, preprocess = cm.load(MODEL, compute_dtype="float32")
    image = jnp.asarray(preprocess(demo_image()))[None]  # HWC uint8 -> [1,H,W,3]
    tokens = jnp.asarray(
        cm.tokenize(LABELS, context_length=cfg.context_length, truncate=True)
    )
    per_image, _ = clip_model.logits(params, cfg, normalize_images(image), tokens)
    probs = np.asarray(jax.nn.softmax(per_image, axis=-1))  # per row: correct for any batch size
    print("native:", dict(zip(LABELS, np.round(probs[0], 4))))


def torch_style():
    """The reference's torch API, via the compat drop-in."""
    import torch

    import clip_mixer_tpu.compat as clip

    # device picks the compute dtype the way the reference's did (cpu ->
    # f32, accelerator -> bf16); "cpu" here so both styles print identical
    # numbers. Drop it on a TPU for the fast bf16 path.
    model, preprocess = clip.load(MODEL, device="cpu")
    image = preprocess(demo_image()).unsqueeze(0)
    text = clip.tokenize(LABELS, context_length=model.context_length, truncate=True)
    with torch.no_grad():
        per_image, _ = model.logits(image, text)
    print("compat:", dict(zip(LABELS, np.round(per_image.softmax(-1).numpy()[0], 4))))


if __name__ == "__main__":
    native_style()
    torch_style()
