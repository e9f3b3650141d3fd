"""Programmatic serving: the InferenceEngine without the HTTP layer.

Bucketed fixed-shape jits (one compile per batch bucket), zero-shot
classification against an arbitrary label set, and the calibrated int8
switch. For the HTTP server, see `python -m clip_mixer_tpu.serving`;
for multi-chip hosts pass `mesh=` / `--all-devices`.

    python examples/serve_embed.py [model_name]
"""

# Allow running straight from a repo checkout without pip install.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))



import numpy as np

import clip_mixer_tpu as cm
from clip_mixer_tpu.serving import InferenceEngine

MODEL = sys.argv[1] if len(sys.argv) > 1 else "mixer-debug"

params, cfg, preprocess = cm.load(MODEL)
engine = InferenceEngine(params, cfg, batch_buckets=(8, 32))

# Text + image embeddings (inputs are padded to the nearest bucket).
texts = ["a photo of a dog", "a photo of a cat"]
text_emb = engine.encode_text(texts)
rng = np.random.default_rng(0)
images = rng.integers(0, 255, (3, cfg.image_resolution, cfg.image_resolution, 3), np.uint8)
image_emb = engine.encode_image_arrays(images)
print("text:", text_emb.shape, "image:", image_emb.shape)

# Zero-shot classifier over custom labels.
engine.load_classifier(
    classnames=["dog", "cat", "car"],
    templates=["a photo of a {}.", "a blurry photo of a {}."],
)
print("top-2:", engine.classify(images[:1], top_k=2)[0])

# Calibrated int8 (W8A8): +51% imgs/s on v5e for the mixer; accuracy is
# gated by evals/quant_gate.py (see README).
engine.enable_int8(sample_images_u8=images, sample_texts=texts)
print("int8 image:", engine.encode_image_arrays(images).shape)

# Production path — calibrate once, freeze, serve anywhere:
#   python scripts/release.py --model <ckpt> --out release/ --data '.../*.tar'
# then in the serving process (no calibration data, no model-code re-trace):
#   from clip_mixer_tpu.aot import load_servable
#   engine = load_servable("release/")   # recorded jax.export programs
#   engine.warmup()                      # pre-compile every bucket
#   serve(engine, port=8000)

# Semantic search (text -> image retrieval over an indexed bank):
#   engine.index_images(image_batch_u8, ids=[...])   # or load_index(features, ids)
#   engine.retrieve(["a dog on a beach"], top_k=5)   # [{"id": ..., "score": ...}]
# over HTTP: POST /index {"images_b64": [...], "ids": [...]}, then
#            POST /retrieve {"texts": [...], "top_k": 5}
