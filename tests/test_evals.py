"""Eval-harness gates with synthetic data (offline environment).

The zero-shot pipeline is validated end-to-end against a planted structure:
a model whose text/image encoders are driven so that class k's prompts and
class k's images align -> top-1 must be ~100%. The SST2 probe is validated on
linearly separable synthetic embeddings. The STS validator is checked against
hand-computed spearman on injected pairs.
"""

import time

import numpy as np
import pytest

import jax

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, MNIST_CLASSNAMES, PROMPT_TEMPLATES
from clip_mixer_tpu.evals.validators import CosineSimValidator, SST2Validator
from clip_mixer_tpu.evals.zeroshot import (
    build_zeroshot_classifier,
    topk_accuracy,
    zero_shot_eval,
)
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.train.metrics import MetricsWriter

CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


def test_prompt_data_shapes():
    assert len(IMAGENET_CLASSNAMES) == 1000
    assert len(PROMPT_TEMPLATES) == 80
    assert len(MNIST_CLASSNAMES) == 10
    assert PROMPT_TEMPLATES[0] == "a bad photo of a {}."
    assert IMAGENET_CLASSNAMES[0] == "tench"
    assert "seven" in MNIST_CLASSNAMES  # typo fixed vs reference "sevem"


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    t1, t2 = topk_accuracy(logits, np.array([1, 0, 0]), (1, 2))
    assert t1 == pytest.approx(2 / 3)
    assert t2 == pytest.approx(2 / 3 + 1 / 3 * 0)  # third sample: top2={2,1}, target 0 miss


def test_zeroshot_classifier_shape():
    params = clip_model.init(jax.random.key(0), CFG)
    w = build_zeroshot_classifier(params, CFG, ["cat", "dog", "bird"], PROMPT_TEMPLATES[:4], batch_size=8)
    assert w.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, rtol=1e-5)


def test_zero_shot_eval_on_trained_alignment():
    """Train a tiny CLIP so images of class k match caption k, then zero-shot
    with those captions as 'classnames' must hit ~100% top-1."""
    from clip_mixer_tpu.config import TrainConfig
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.text import tokenize
    from clip_mixer_tpu.train.optimizer import make_optimizer

    classnames = ["red square", "green circle", "blue triangle", "yellow star"]
    rng = np.random.default_rng(0)
    # class-colored images: class k has a distinctive mean color
    colors = np.array([[220, 30, 30], [30, 220, 30], [30, 30, 220], [220, 220, 30]], np.uint8)
    n_per = 4
    images = np.concatenate(
        [
            np.clip(
                colors[k][None, None, None] + rng.integers(-20, 20, (n_per, 32, 32, 3)), 0, 255
            ).astype(np.uint8)
            for k in range(4)
        ]
    )
    targets = np.repeat(np.arange(4), n_per)
    texts = tokenize([f"a photo of a {classnames[k]}." for k in targets], truncate=True)

    # 2-device mesh on purpose: this model carries the full 49408-token
    # embedding (real tokenizer ids), and XLA:CPU's collective rendezvous has
    # a hardcoded 40s termination deadline — 8 starved device threads on this
    # 1-core host can miss it and SIGABRT the process. 2 devices keeps the
    # sharded path exercised with 4x less contention; 8-way collectives are
    # covered by the lighter tests in test_loss / test_train_step.
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    tcfg = TrainConfig(learning_rate=2e-3, warmup_steps=2)
    opt = make_optimizer(tcfg, total_steps=60)
    state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(1), CFG), opt))
    step = make_train_step(CFG, tcfg, mesh, opt)
    batch = shard_batch(mesh, {"images": images, "texts": texts})
    for _ in range(50):
        state, m = step(state, batch)

    params = jax.tree.map(np.asarray, state.params)
    res = zero_shot_eval(
        params,
        CFG,
        classnames,
        ["a photo of a {}."],
        [(images, targets)],
        batch_size=16,
    )
    assert res["top1"] >= 75.0, res
    assert res["top5"] == 100.0  # only 4 classes


def test_sts_validator_injected_pairs():
    params = clip_model.init(jax.random.key(0), CFG)
    pairs = [
        ("a cat sits on a mat", "a cat sits on a mat", 5.0),  # identical -> cos 1
        ("a cat sits on a mat", "the stock market fell", 1.0),
        ("a dog runs fast", "a dog runs quickly", 4.0),
        ("hello world", "goodbye cruel world", 2.0),
    ] * 3
    writer = MetricsWriter()
    v = CosineSimValidator(params, CFG, writer=writer, datasets=[("synthetic", pairs)])
    res = v.validate(step=0)
    assert "synthetic" in res
    r = res["synthetic"]
    assert -1.0 <= r["srcc_cosine"] <= 1.0
    # identical sentences must score cosine 1 > all others; with gold max on
    # that pair the correlation should be positive even for a random model
    assert r["srcc_cosine"] > 0
    assert ("synthetic/SRCC Cosine" in writer.history)


def test_sst2_probe_separable():
    params = clip_model.init(jax.random.key(0), CFG)
    # synthetic sentences whose labels correlate with an easy lexical signal
    pos = [(f"great wonderful amazing movie number {i}", 1) for i in range(48)]
    neg = [(f"terrible awful boring movie number {i}", 0) for i in range(48)]
    # Interleave labels: the probe mini-batches WITHOUT shuffling (faithful
    # to validation.py:346), so label-sorted batches would make it oscillate.
    train = [s for pair in zip(pos[:32], neg[:32]) for s in pair]
    test = pos[32:] + neg[32:]
    v = SST2Validator(params, CFG, train_data=train, test_data=test)
    res = v.validate(step=0)
    # even an untrained encoder separates these lexically via token embeddings
    assert res["accuracy"] >= 80.0, res


def test_plot_results_both_modes(tmp_path):
    """scripts/plot_results.py: reference-figure mode and the metrics.jsonl
    training-curves mode both render files."""
    import importlib.util
    import json
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "plot_results", str(Path(__file__).resolve().parents[1] / "scripts" / "plot_results.py")
    )
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)

    jsonl = tmp_path / "metrics.jsonl"
    with open(jsonl, "w") as f:
        for s in range(1, 9):
            f.write(json.dumps({"step": s, "name": "Loss", "value": 2.0 / s}) + "\n")
        # a preempted run's truncated tail line must not break post-mortems
        f.write('{"step": 9, "name": "Lo')

    out = tmp_path / "figs"
    argv = sys.argv
    sys.argv = ["plot_results.py", "--metrics", str(jsonl), "--out", str(out)]
    try:
        pr.main()
    finally:
        sys.argv = argv
    assert (out / "training_curves.png").stat().st_size > 0

    sys.argv = ["plot_results.py", "--out", str(out)]
    try:
        pr.main()
    finally:
        sys.argv = argv
    assert (out / "imagenet.png").exists() and (out / "sts.png").exists()


def test_hf_eval_offline_autodetect(monkeypatch):
    """A zero-egress host must fail a non-cached dataset load in one DNS
    probe, not 5 hub retries with backoff (~30s per dataset, per validation
    pass). The probe is once-per-process and cached."""
    import socket

    from clip_mixer_tpu.data import hf_eval

    calls = {"n": 0}

    def no_dns(*a, **k):
        calls["n"] += 1
        raise socket.gaierror("Name or service not known")

    monkeypatch.setattr(socket, "getaddrinfo", no_dns)
    monkeypatch.setattr(hf_eval, "_REACHABLE", {})
    t0 = time.monotonic()
    with pytest.raises(hf_eval.DatasetUnavailable):
        hf_eval._load("this-dataset-does-not-exist-xyz", "test")
    with pytest.raises(hf_eval.DatasetUnavailable):
        hf_eval._load("this-dataset-does-not-exist-xyz", "test")
    assert time.monotonic() - t0 < 20  # no retry/backoff ladder
    assert calls["n"] == 1  # probe result is cached across loads


def test_imagenetv2_fetch_and_batches(monkeypatch, tmp_path):
    """fetch_imagenetv2 self-provisions the class folders the moment egress
    exists (the reference gets this from imagenetv2_pytorch,
    validation.py:114-116): gated by the DNS probe, .partial-safe download,
    extraction feeds _imagenetv2_batches directly. Offline -> fast
    DatasetUnavailable."""
    import gzip
    import io as _io
    import tarfile
    import urllib.request

    import numpy as np
    from PIL import Image

    from clip_mixer_tpu.data import hf_eval
    from clip_mixer_tpu.evals import validators

    # build a tiny archive in the real layout (2 classes x 2 images)
    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        rng = np.random.default_rng(0)
        for cls in range(2):
            for i in range(2):
                img = _io.BytesIO()
                Image.fromarray(
                    rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                ).save(img, "JPEG")
                info = tarfile.TarInfo(
                    f"imagenetv2-matched-frequency-format-val/{cls}/{i}.jpeg")
                info.size = len(img.getvalue())
                tar.addfile(info, _io.BytesIO(img.getvalue()))
    archive = buf.getvalue()

    class FakeResponse:
        def __init__(self):
            self._b = _io.BytesIO(archive)
        def read(self, n):
            return self._b.read(n)
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False

    # offline: probe says unreachable -> DatasetUnavailable, no URL touched
    monkeypatch.setattr(hf_eval, "_REACHABLE", {})
    monkeypatch.setattr(hf_eval, "host_reachable", lambda h, timeout=5.0: False)
    with pytest.raises(validators.DatasetUnavailable, match="offline"):
        validators.fetch_imagenetv2(str(tmp_path / "inet"))

    # online: fetch, extract, and the batches generator serves it
    monkeypatch.setattr(hf_eval, "host_reachable", lambda h, timeout=5.0: True)
    monkeypatch.setattr(urllib.request, "urlopen", lambda url, timeout=60: FakeResponse())
    root = validators.fetch_imagenetv2(str(tmp_path / "inet"))
    assert root.endswith("imagenetv2-matched-frequency-format-val")
    batches = list(validators._imagenetv2_batches(
        batch_size=3, location=str(tmp_path / "inet"), image_size=16))
    images = np.concatenate([b[0] for b in batches])
    targets = np.concatenate([b[1] for b in batches])
    assert images.shape == (4, 16, 16, 3)
    assert sorted(targets.tolist()) == [0, 0, 1, 1]
    # second call is a no-op (already extracted)
    assert validators.fetch_imagenetv2(str(tmp_path / "inet")) == root
