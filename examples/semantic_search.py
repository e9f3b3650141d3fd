"""Semantic search end to end: embed a corpus, index it, query by text.

    python examples/semantic_search.py [model]

Uses synthetic class-colored images so it runs anywhere; point
`scripts/embed_dataset.py` at real tar shards for a production bank.
"""

# Allow running straight from a repo checkout without pip install.
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import clip_mixer_tpu as clip
from clip_mixer_tpu.data.pipeline import SyntheticSource
from clip_mixer_tpu.serving import InferenceEngine

model = sys.argv[1] if len(sys.argv) > 1 else "mixer-debug"
params, cfg, _ = clip.load(model)
engine = InferenceEngine(params, cfg, batch_buckets=(32,))

# A tiny "corpus": one batch of class-colored synthetic images whose ids
# carry their class names, so hits are human-checkable.
src = SyntheticSource(batch_size=32, image_size=cfg.image_resolution, n_batches=1)
batch = next(src.iter_batches(epoch=0))
ids = [f"img{i:03d}" for i in range(len(batch["images"]))]
engine.index_images(batch["images"], ids)

for query in ["a photo of a red square.", "a photo of a silver moon."]:
    hits = engine.retrieve([query], top_k=3)[0]
    print(query, "->", [(h["id"], round(h["score"], 3)) for h in hits])

# The reference README demo (logits -> softmax probs) over the same engine:
logits = engine.similarity(batch["images"][:1], ["a red square", "a dog", "a car"])
e = np.exp(logits - logits.max(-1, keepdims=True))
print("demo probs:", (e / e.sum(-1, keepdims=True)).round(4))
