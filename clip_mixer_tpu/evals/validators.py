"""Validation harnesses — the reference's four validators, TPU-native.

Each validator has ``validate(step, verbose=False, params=None) -> dict``
(explicit params override the construction-time tree) mirroring the
reference classes (training/clip/validation.py:19,184,314,375) and logs the
same scalar names to the metrics writer. Dataset access is offline-gated:
when a dataset cannot be fetched the validator returns {} and logs a skip
(the reference assumes online Azure/HF access; we degrade gracefully).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.data.hf_eval import STS_SETS, DatasetUnavailable, mnist_batches, sst2_split, sts_pairs
from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, MNIST_CLASSNAMES, PROMPT_TEMPLATES
from clip_mixer_tpu.evals.zeroshot import encode_texts_batched, zero_shot_eval
from clip_mixer_tpu.text import tokenize


class ImageNetValidator:
    """Zero-shot ImageNetV2 top-1/top-5 (validation.py:19-179).

    ``image_batches_fn`` yields (uint8 [B,224,224,3], targets) — by default
    ImageNetV2 via local files or HF; injectable for tests."""

    def __init__(self, params, cfg: CLIPConfig, writer=None, image_batches_fn: Optional[Callable[[], Iterable]] = None):
        self.params, self.cfg, self.writer = params, cfg, writer
        # default loader preprocesses at the MODEL's resolution (336px for
        # ViT-L/14@336px checkpoints, 224 for the B-scale presets)
        self.image_batches_fn = image_batches_fn or (
            lambda: _imagenetv2_batches(image_size=cfg.image_resolution)
        )

    def validate(self, step: int, verbose: bool = False, params=None) -> Dict[str, float]:
        p = params if params is not None else self.params
        try:
            batches = self.image_batches_fn()
            res = zero_shot_eval(p, self.cfg, IMAGENET_CLASSNAMES, PROMPT_TEMPLATES, batches)
        except DatasetUnavailable as e:
            if verbose:
                print(f"[imagenet] skipped: {e}")
            return {}
        if verbose:
            print(f"Top-1 accuracy: {res['top1']:.2f}%\nTop-5 accuracy: {res['top5']:.2f}%")
        if self.writer is not None:
            self.writer.add_scalar("Top-1 accuracy", res["top1"], step)
            self.writer.add_scalar("Top-5 accuracy", res["top5"], step)
        return res


# The dataset the reference evaluates on, via the imagenetv2_pytorch package
# (validation.py:114-116). Primary URL is that package's current source (its
# original S3 bucket is defunct upstream); extraction yields the
# "imagenetv2-matched-frequency-format-val/<class 0..999>/*.jpeg" layout.
_IMAGENETV2_URLS = (
    "https://huggingface.co/datasets/vaishaal/ImageNetV2/resolve/main/imagenetv2-matched-frequency.tar.gz",
    "https://imagenetv2public.s3-us-west-2.amazonaws.com/imagenetv2-matched-frequency.tar.gz",
)


def _find_imagenetv2_root(location: str):
    import os

    for cand in (
        os.path.join(location, "imagenetv2-matched-frequency-format-val"),
        location,
    ):
        if os.path.isdir(cand) and os.path.isdir(os.path.join(cand, "0")):
            return cand
    return None


def fetch_imagenetv2(location: str = "datasetImageNet") -> str:
    """Download + extract ImageNetV2 matched-frequency into ``location`` and
    return the class-folder root — the self-provisioning the reference gets
    from imagenetv2_pytorch (validation.py:114-116). Offline-gated by the
    same fast DNS probe as the HF loaders; the download goes through a
    .partial temp file so an interrupted fetch is never mistaken for a
    complete archive."""
    import os
    import tarfile
    import urllib.request

    from clip_mixer_tpu.data.hf_eval import host_reachable

    existing = _find_imagenetv2_root(location)
    if existing is not None:
        return existing
    os.makedirs(location, exist_ok=True)
    # Serialize concurrent fetchers: several processes on one host (the pod
    # layout) hitting the first validation pass together would interleave
    # writes into one .partial and extract over each other — flock'd, the
    # losers wake to the extracted tree and return it from the root check.
    import fcntl

    lock = open(os.path.join(location, ".imagenetv2.lock"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    try:
        existing = _find_imagenetv2_root(location)
        if existing is not None:
            return existing
        return _fetch_imagenetv2_locked(location)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()


def _fetch_imagenetv2_locked(location: str) -> str:
    import os
    import tarfile
    import urllib.request

    from clip_mixer_tpu.data.hf_eval import host_reachable

    last_err = "no URL reachable (offline)"
    for url in _IMAGENETV2_URLS:
        host = url.split("/")[2]
        if not host_reachable(host):
            continue
        tmp = os.path.join(location, ".imagenetv2.tar.gz.partial")
        try:
            with urllib.request.urlopen(url, timeout=60) as src, open(tmp, "wb") as out:
                done = 0
                while True:
                    buf = src.read(1 << 20)
                    if not buf:
                        break
                    out.write(buf)
                    done += len(buf)
                    if done % (200 << 20) < (1 << 20):
                        print(f"[imagenetv2] {done >> 20} MiB from {host}", flush=True)
            with tarfile.open(tmp, "r:gz") as tar:
                tar.extractall(location, filter="data")
            os.remove(tmp)
            root = _find_imagenetv2_root(location)
            if root is not None:
                return root
            last_err = f"{url}: archive extracted but no class folders found"
        except Exception as e:
            last_err = f"{url}: {e}"
            try:
                os.remove(tmp)
            except OSError:
                pass
    raise DatasetUnavailable(f"ImageNetV2 fetch failed: {last_err}")


def _imagenetv2_batches(batch_size: int = 256, location: str = "datasetImageNet", image_size: int = 224):
    """ImageNetV2 ("matched-frequency") loader. Uses the extracted class
    folders (0..999) under ``location``, self-provisioning them when egress
    exists (``fetch_imagenetv2``); raises DatasetUnavailable offline."""
    import os

    from PIL import Image

    from clip_mixer_tpu.ops.preprocess import preprocess_pil

    root = _find_imagenetv2_root(location)
    if root is None:
        root = fetch_imagenetv2(location)  # raises DatasetUnavailable offline

    classes = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    if not classes:
        raise DatasetUnavailable(f"ImageNetV2 under {root} has no class folders")

    def gen():
        images, targets = [], []
        yielded = False
        for cls in classes:
            d = os.path.join(root, str(cls))
            try:
                fnames = sorted(os.listdir(d))
            except OSError as e:  # partially-extracted dataset: skip, don't
                raise DatasetUnavailable(f"ImageNetV2 class dir unreadable: {e}")  # crash training
            for fname in fnames:
                with Image.open(os.path.join(d, fname)) as im:
                    images.append(preprocess_pil(im, image_size))
                targets.append(cls)
                if len(images) == batch_size:
                    yield np.stack(images), np.asarray(targets)
                    yielded = True
                    images, targets = [], []
        if images:
            yield np.stack(images), np.asarray(targets)
            yielded = True
        if not yielded:
            raise DatasetUnavailable(f"ImageNetV2 under {root} contains no images")

    return gen()


class CosineSimValidator:
    """STS semantic-similarity: Spearman/Pearson of text-feature similarities
    vs gold scores over 6 datasets (validation.py:184-252), plus the optional
    KDE histogram figures binned by gold-score bucket (validation.py:254-303)
    when matplotlib is available and ``figures=True``."""

    def __init__(self, params, cfg: CLIPConfig, writer=None, datasets=None, figures: bool = False):
        self.params, self.cfg, self.writer = params, cfg, writer
        self.datasets = datasets if datasets is not None else STS_SETS
        self.figures = figures

    def _validate_pairs(self, name: str, pairs, step, verbose, params=None) -> Dict[str, float]:
        from scipy.stats import pearsonr, spearmanr

        model_params = params if params is not None else self.params
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        gold = np.asarray([p[2] for p in pairs], np.float64)
        fa = encode_texts_batched(model_params, self.cfg, tokenize(a, self.cfg.context_length, truncate=True), normalize=False)
        fb = encode_texts_batched(model_params, self.cfg, tokenize(b, self.cfg.context_length, truncate=True), normalize=False)
        linf = np.max(np.abs(fa - fb), axis=1)
        l2 = np.linalg.norm(fa - fb, axis=1)
        cos = (fa * fb).sum(1) / (np.linalg.norm(fa, axis=1) * np.linalg.norm(fb, axis=1))
        out = {
            "srcc_linf": float(spearmanr(linf, gold).correlation),
            "srcc_cosine": float(spearmanr(cos, gold).correlation),
            "pc_cosine": float(pearsonr(cos, gold).statistic),
            "l2_mean": float(l2.mean()),
        }
        if verbose:
            print(f"[{name}] SRCC Linf {out['srcc_linf']:.3f}  SRCC Cosine {out['srcc_cosine']:.3f}  PC Cosine {out['pc_cosine']:.3f}")
        if self.writer is not None and step is not None:
            self.writer.add_scalar(f"{name}/SRCC Linf", out["srcc_linf"], step)
            self.writer.add_scalar(f"{name}/SRCC Cosine", out["srcc_cosine"], step)
            self.writer.add_scalar(f"{name}/PC Cosine", out["pc_cosine"], step)
        if self.figures:
            self._log_figures(name, l2, cos, gold, step, verbose)
        return out

    def _log_figures(self, name: str, l2, cos, gold, step, verbose: bool) -> None:
        """Per-gold-bucket histograms with KDE overlays for L2 and cosine
        distances (validation.py:254-303)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from scipy import stats
        except ImportError:
            return
        colors = ["red", "green", "blue", "orange", "purple"]
        legend = ["0 - 1", "1 - 2", "2 - 3", "3 - 4", "4 - 5"]
        for tag, values, bins in (
            ("neighborContinuousHistogramL2", l2, np.linspace(0, max(float(l2.max()), 1e-6), 100)),
            ("neighborContinuousHistogramCosine", cos, np.linspace(-1, 1, 100)),
        ):
            fig, ax = plt.subplots()
            for g, (c, label) in enumerate(zip(colors, legend)):
                ix = np.where((g <= gold) & (gold < g + 1))[0]
                if ix.size == 0:
                    continue
                _, xs, _ = ax.hist(values[ix], bins=bins, histtype="step", density=True, alpha=0.5, color=c)
                if np.unique(values[ix]).size > 1:
                    density = stats.gaussian_kde(values[ix])
                    ax.plot(xs, density(xs), c=c, label=label)
            ax.legend()
            ax.get_yaxis().set_visible(False)
            ax.set_xlabel(f"{'L2' if 'L2' in tag else 'Cosine'} Distance between pair")
            ax.set_title("Distances for duplicate and non-duplicate pairs")
            if self.writer is not None and step is not None:
                self.writer.add_figure(f"{name}/{tag}", fig, step)
            if verbose:
                fig.savefig(f"{tag}.png")
            plt.close(fig)

    def validate(self, step: int, verbose: bool = False, params=None) -> Dict[str, Dict[str, float]]:
        results = {}
        for name in self.datasets:
            try:
                pairs = sts_pairs(name) if isinstance(name, str) else name[1]
                key = name if isinstance(name, str) else name[0]
            except DatasetUnavailable as e:
                if verbose:
                    print(f"[sts:{name}] skipped: {e}")
                continue
            results[key] = self._validate_pairs(key, pairs, step, verbose, params=params)
        return results


class SST2Validator:
    """Linear probe on SST-2: embed train split, fit a 1-layer classifier
    (10 epochs, Adam lr 1e-3, minibatch 32 — validation.py:339-351), report
    validation accuracy."""

    def __init__(self, params, cfg: CLIPConfig, writer=None, train_data=None, test_data=None):
        self.params, self.cfg, self.writer = params, cfg, writer
        self._train, self._test = train_data, test_data
        # Build the optimizer + jitted probe step ONCE: a fresh closure per
        # validate() call would re-trace/compile the update every round.
        import optax

        self._opt = optax.adam(1e-3)  # validation.py:344
        opt = self._opt

        @jax.jit
        def _update(probe, opt_state, x, y):
            def loss_fn(p):
                logits = x @ p["w"] + p["b"]
                return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(probe)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(probe, updates), opt_state, loss

        self._update = _update

    def _embed(self, data, params=None):
        model_params = params if params is not None else self.params
        texts = [d[0] for d in data]
        labels = np.asarray([d[1] for d in data], np.int32)
        feats = encode_texts_batched(model_params, self.cfg, tokenize(texts, self.cfg.context_length, truncate=True), normalize=False)
        return feats, labels

    def validate(self, step: int, verbose: bool = False, params=None) -> Dict[str, float]:
        try:
            train = self._train if self._train is not None else sst2_split("train")
            test = self._test if self._test is not None else sst2_split("validation")
        except DatasetUnavailable as e:
            if verbose:
                print(f"[sst2] skipped: {e}")
            return {}
        xtr, ytr = self._embed(train, params)
        xte, yte = self._embed(test, params)

        dim = xtr.shape[1]
        probe = {"w": jnp.zeros((dim, 2), jnp.float32), "b": jnp.zeros((2,), jnp.float32)}
        opt_state = self._opt.init(probe)

        n = xtr.shape[0]
        for _ in range(10):
            # include the final partial minibatch — the reference trains on
            # the tail slice too (validation.py:346)
            for i in range(0, n, 32):
                probe, opt_state, _ = self._update(
                    probe, opt_state, jnp.asarray(xtr[i : i + 32]), jnp.asarray(ytr[i : i + 32])
                )
        logits = np.asarray(jnp.asarray(xte) @ probe["w"] + probe["b"])
        acc = 100.0 * float((logits.argmax(-1) == yte).mean())
        if verbose:
            print(f"Accuracy on SST-2: {acc:.2f}%")
        if self.writer is not None:
            self.writer.add_scalar("Accuracy on SST-2", acc, step)
        return {"accuracy": acc}


class MNISTValidator:
    """Zero-shot MNIST with digit-word classnames and the 80 templates
    (validation.py:375-529)."""

    def __init__(self, params, cfg: CLIPConfig, writer=None, image_batches_fn=None):
        self.params, self.cfg, self.writer = params, cfg, writer
        self.image_batches_fn = image_batches_fn or (lambda: mnist_batches("test", 256, self.cfg.image_resolution))

    def validate(self, step: int, verbose: bool = False, params=None) -> Dict[str, float]:
        p = params if params is not None else self.params
        try:
            res = zero_shot_eval(
                p, self.cfg, MNIST_CLASSNAMES, PROMPT_TEMPLATES, self.image_batches_fn()
            )
        except DatasetUnavailable as e:
            if verbose:
                print(f"[mnist] skipped: {e}")
            return {}
        if verbose:
            print(f"MNIST Top-1: {res['top1']:.2f}%")
        if self.writer is not None:
            self.writer.add_scalar("MNIST Top-1 accuracy", res["top1"], step)
            self.writer.add_scalar("MNIST Top-5 accuracy", res["top5"], step)
        return res


class RetrievalValidator:
    """Image↔text retrieval (R@1/5/10 + median rank, both directions) on a
    held-out ``DataSource`` — the CLIP-paper retrieval protocol applied to
    the user's own validation split.

    No reference counterpart: the reference's four validators
    (validation.py:19-529) all require remote Azure/HF datasets, leaving no
    training-progress signal in air-gapped deployments. This one consumes
    any pipeline source (tar shards, CSV manifest, image folder, synthetic),
    so ``--val-data`` works wherever ``--data`` does. Ranks are computed
    against the sampled gallery of ``max_samples`` candidates; as elsewhere
    in retrieval evals, duplicate captions make the true pair's rank
    pessimistic (an identical caption may sort above it) — prefer a split
    with distinct captions.
    """

    def __init__(self, params, cfg: CLIPConfig, data_source=None, writer=None,
                 max_samples: int = 2048):
        self.params, self.cfg, self.writer = params, cfg, writer
        self.data_source = data_source
        self.max_samples = max_samples

    def validate(self, step: int, verbose: bool = False, params=None) -> Dict[str, float]:
        from clip_mixer_tpu.evals.zeroshot import encode_images_batched

        p = params if params is not None else self.params
        if self.data_source is None:
            return {}
        images, texts, n = [], [], 0
        for batch in self.data_source.iter_batches(epoch=0):
            images.append(batch["images"])
            texts.append(batch["texts"])
            n += batch["images"].shape[0]
            if n >= self.max_samples:
                break
        if n == 0:
            if verbose:
                print("[retrieval] skipped: validation source yielded no batches")
            return {}
        images = np.concatenate(images)[: self.max_samples]
        texts = np.concatenate(texts)[: self.max_samples]
        img_f = encode_images_batched(p, self.cfg, images)
        txt_f = encode_texts_batched(p, self.cfg, texts)
        sim = img_f @ txt_f.T  # [N, N]; row i's true match is column i

        res: Dict[str, float] = {"n": float(sim.shape[0])}
        eye = np.arange(sim.shape[0])
        for name, s in (("image_to_text", sim), ("text_to_image", sim.T)):
            order = np.argsort(-s, axis=-1, kind="stable")
            ranks = np.argmax(order == eye[:, None], axis=-1)
            for k in (1, 5, 10):
                res[f"{name}_r@{k}"] = float((ranks < k).mean() * 100.0)
            res[f"{name}_median_rank"] = float(np.median(ranks) + 1.0)
        if verbose:
            print(
                f"Retrieval (n={sim.shape[0]}): "
                f"I->T R@1 {res['image_to_text_r@1']:.2f}% "
                f"R@5 {res['image_to_text_r@5']:.2f}% | "
                f"T->I R@1 {res['text_to_image_r@1']:.2f}% "
                f"R@5 {res['text_to_image_r@5']:.2f}%"
            )
        if self.writer is not None:
            for key in ("image_to_text_r@1", "image_to_text_r@5",
                        "text_to_image_r@1", "text_to_image_r@5"):
                direction = "I->T" if key.startswith("image") else "T->I"
                self.writer.add_scalar(
                    f"Retrieval {direction} R@{key.rsplit('@', 1)[1]}", res[key], step
                )
        return res
