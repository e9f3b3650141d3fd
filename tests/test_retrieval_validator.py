"""RetrievalValidator: held-out image<->text retrieval on any DataSource.

No reference counterpart (validation.py's validators all need remote
datasets); this is the offline training-progress signal. Tested two ways:
rank math against hand-built feature matrices, and end-to-end through the
real jitted encoders on a FileListSource split (exercising the pad-to-batch
path and the n < batch_size gallery)."""

import numpy as np

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.data.pipeline import FileListSource, SyntheticSource
from clip_mixer_tpu.evals.validators import RetrievalValidator
from clip_mixer_tpu.models import clip as clip_model

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=16,
    vision_layers=1,
    vision_width=32,
    vision_patch_size=8,
    context_length=16,
    vocab_size=49408,
    text_width=32,
    text_heads=1,
    text_layers=1,
    tower="mixer",
    compute_dtype="float32",
)


class _Writer:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, name, value, step):
        self.scalars.append((name, value, step))


def test_rank_math(monkeypatch):
    n = 8
    src = SyntheticSource(batch_size=n, image_size=16, n_batches=1, context_length=16)

    def fake_img(params, cfg, images, **kw):
        return np.eye(n, 16, dtype=np.float32)

    def swapped_txt(params, cfg, tokens, **kw):
        f = np.eye(n, 16, dtype=np.float32)
        f[[0, 1]] = f[[1, 0]]  # pair 0 and 1 swapped: their true match ranks 2nd
        return f

    import clip_mixer_tpu.evals.validators as V
    import clip_mixer_tpu.evals.zeroshot as Z

    monkeypatch.setattr(Z, "encode_images_batched", fake_img)
    monkeypatch.setattr(V, "encode_texts_batched", swapped_txt)

    w = _Writer()
    res = RetrievalValidator(None, CFG, data_source=src, writer=w).validate(step=7)
    assert res["n"] == n
    # 6 of 8 retrieve at rank 1; the swapped two miss R@1 but land inside R@5
    for d in ("image_to_text", "text_to_image"):
        assert res[f"{d}_r@1"] == 75.0
        assert res[f"{d}_r@5"] == 100.0
        assert res[f"{d}_median_rank"] == 1.0
    assert any(name == "Retrieval I->T R@1" and step == 7 for name, _, step in w.scalars)


def test_end_to_end_tiny_model(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    entries = []
    for i in range(12):
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)).save(p, "JPEG")
        entries.append((p, f"a distinct caption number {i}"))
    src = FileListSource(entries, batch_size=4, image_size=16, context_length=16)

    import jax

    params = clip_model.init(jax.random.key(0), CFG)
    v = RetrievalValidator(params, CFG, data_source=src, max_samples=12)
    res = v.validate(step=0, verbose=True)
    assert res["n"] == 12
    for d in ("image_to_text", "text_to_image"):
        assert 0.0 <= res[f"{d}_r@1"] <= res[f"{d}_r@5"] <= res[f"{d}_r@10"] <= 100.0
        assert 1.0 <= res[f"{d}_median_rank"] <= 12.0
    # explicit-params override path (Trainer injects fresh params each pass)
    res2 = RetrievalValidator(None, CFG, data_source=src, max_samples=12).validate(
        step=0, params=params
    )
    assert res2 == res

    # no source configured: a silent skip, like the offline-gated validators
    assert RetrievalValidator(None, CFG).validate(step=0) == {}


def test_max_samples_truncates():
    src = SyntheticSource(batch_size=8, image_size=16, n_batches=4, context_length=16)

    import jax

    params = clip_model.init(jax.random.key(1), CFG)
    res = RetrievalValidator(params, CFG, data_source=src, max_samples=10).validate(step=0)
    assert res["n"] == 10
