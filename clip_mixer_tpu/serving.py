"""Inference serving: HTTP endpoints over a micro-batching executor.

The reference has no serving story (its inference surface is the Python API).
For production deployment this module provides:

* :class:`InferenceEngine` — fixed-shape jitted encoders (one compile per
  batch bucket) with zero-padding, plus an optional zero-shot classifier head;
* :class:`MicroBatcher` — request coalescing: concurrent requests are merged
  into device-efficient batches (up to ``max_batch`` or ``max_wait_ms``),
  amortising the per-dispatch latency that dominates small-batch TPU serving;
* :func:`serve` — a dependency-free ThreadingHTTPServer exposing
  POST /encode_text {"texts": [...]}, POST /encode_image {"images_b64":
  [...]} (PNG/JPEG), POST /classify {"images_b64": [...]} against a loaded
  classifier, POST /index {"images_b64": [...], "ids": [...]} + POST
  /retrieve {"texts": [...]} (text→image semantic search over an indexed
  feature bank — the canonical CLIP deployment), POST /similarity (the
  reference README demo: logits_per_image + softmax probs), GET /healthz
  (model dims,
  per-tower numeric path, program provenance, index size), and GET /metrics
  (per-endpoint counts/errors + p50/p99 latency over a bounded window).

Single-process by design: cross-HOST serving is a router concern, not a
model concern. Within a host, the engine optionally drives every local chip
(``InferenceEngine(mesh=...)``): params replicated, each padded batch
sharded over the mesh — data-parallel inference without per-chip processes.
"""

from __future__ import annotations

import base64
import io
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.preprocess import normalize_images, preprocess_pil
from clip_mixer_tpu.text.fast import fast_tokenize


def encoder_fns(cfg: CLIPConfig, int8: bool = False, input_hw=None):
    """(image_fn, text_fn) — the ONE serving composition: in-graph
    uint8→normalize + encode + l2-normalize (image) and encode +
    l2-normalize (text), float or calibrated-int8 encoders. Shared by the
    live jitted engine below AND the frozen jax.export programs (aot.py);
    the frozen-vs-live bit-equality contract depends on both building from
    here, so don't inline a copy.

    ``input_hw``: serve dataset-native-resolution uint8 (e.g. (256, 256),
    the reference's generateDataset.sh shard size) and run the antialiased
    bicubic resize+crop ON DEVICE (reference clip.py:76-87 semantics as
    matmuls) instead of per-image host PIL — the host CPU is the serving
    bottleneck for raw-image clients. int8 mixer engines route through the
    planar fused front-end (resize -> int8 patches, ops/quant.py; requires
    calibrated a_scales, which enable_int8/artifacts always provide)."""
    if int8:
        from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns

        encode_image = image_quant_fns(cfg)[2]
        encode_text = text_quant_fns(cfg)[2]
    else:
        encode_image, encode_text = clip_model.encode_image, clip_model.encode_text

    if input_hw is None:
        def to_model_inputs(images_u8):
            return normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
    else:
        from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

        pre = make_batch_preprocess(
            tuple(input_hw), cfg.image_resolution, normalize=True,
            dtype=jnp.dtype(cfg.compute_dtype),
        )

        def to_model_inputs(images_u8):
            return pre(images_u8)

    if int8 and input_hw is not None and not (cfg.use_transformer or cfg.is_resnet):
        from clip_mixer_tpu.ops.quant import encode_image_q_patches, make_planar_front_end

        def image_fn(p, images_u8):
            front = make_planar_front_end(
                cfg, tuple(input_hw), p["visual"]["a_scales"]["patch"]
            )
            return clip_model.l2_normalize(encode_image_q_patches(p, cfg, front(images_u8)))
    else:
        def image_fn(p, images_u8):
            return clip_model.l2_normalize(encode_image(p, cfg, to_model_inputs(images_u8)))

    def text_fn(p, tokens):
        return clip_model.l2_normalize(encode_text(p, cfg, tokens))

    return image_fn, text_fn


@jax.jit
def _bank_sims(q, bank):
    """[Q, D] @ [N, D]^T on device. With a row-sharded bank, each chip
    scans its shard; XLA gathers the [Q, N] sims (tiny next to the bank)."""
    return q @ bank.T


def local_mesh():
    """The --all-devices serving layout: a 1-axis ("data",) mesh over every
    local device, or None on a single-device host. The ONE constructor
    shared by the serving CLI and scripts/embed_dataset.py — the bank/
    serving feature bit-equality contract depends on both using the same
    device layout."""
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs), ("data",))


def softmax_probs(logits: np.ndarray) -> np.ndarray:
    """Row-stable softmax — the ONE implementation shared by classify, the
    /similarity handler, and examples."""
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _topk(row: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest entries, sorted descending. O(N) selection
    (argpartition) + O(k log k) sort — the full argsort would pay
    O(N log N) per query on a large retrieval bank. k must be >= 1."""
    if k < 1:
        raise ValueError(f"top_k must be >= 1, got {k}")
    k = min(k, len(row))
    idx = np.argpartition(-row, k - 1)[:k]
    return idx[np.argsort(-row[idx])]


class InferenceEngine:
    """Padded fixed-shape encoders; one compiled program per batch bucket.

    ``mesh``: optional ``jax.sharding.Mesh`` — params are replicated and
    every padded batch is sharded over ALL mesh axes, so one engine drives
    every chip of a multi-chip serving host (v5e-4/8) data-parallel from a
    single process. Batch buckets are rounded up to multiples of the device
    count so the batch axis always shards evenly."""

    def __init__(self, params, cfg: CLIPConfig, batch_buckets: Sequence[int] = (8, 32, 128),
                 mesh=None, input_hw=None):
        self.mesh = mesh
        # input_hw: accept uint8 at this fixed source resolution and resize
        # ON DEVICE (see encoder_fns). None = images arrive model-sized.
        self.input_hw = None if input_hw is None else tuple(input_hw)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
            n_dev = mesh.devices.size
            batch_buckets = sorted({-(-b // n_dev) * n_dev for b in batch_buckets})
        else:
            self._rep_sharding = None
            self._batch_sharding = None
        self.params = self._put_params(params)
        self.cfg = cfg
        self.buckets = sorted(batch_buckets)

        image_fn, text_fn = encoder_fns(cfg, input_hw=self.input_hw)
        # (fn, params) tuples are swapped ATOMICALLY (single attribute write)
        # so concurrent server threads never see a fn/params mismatch, e.g.
        # during enable_int8 on a live server.
        self._text_path = (jax.jit(text_fn), self.params)
        self._image_path = (jax.jit(image_fn), self.params)
        # observability (reported by /healthz): numeric path per tower and
        # whether the programs are live-jitted or recorded (aot.load_servable)
        self.path_kinds = {"image": "float", "text": "float"}
        self.frozen = False
        self._classifier: Optional[jnp.ndarray] = None
        self._classnames: Optional[List[str]] = None
        self._index = None  # (l2-normalized features [N, D], ids) or None
        # Micro-batcher over the image path for concurrent single-image
        # requests (created lazily; thread is only spawned if used).
        self.__batcher: Optional[MicroBatcher] = None
        self._batcher_lock = threading.Lock()

    @property
    def _image_batcher(self) -> "MicroBatcher":
        with self._batcher_lock:
            if self.__batcher is None:
                self.__batcher = MicroBatcher(
                    lambda batch: self._run_image(batch), max_batch=self.buckets[-1]
                )
            return self.__batcher

    def enable_int8(
        self,
        sample_images_u8: Optional[np.ndarray] = None,
        sample_texts: Optional[Sequence[str]] = None,
        *,
        calibration: Optional[str] = None,
        save_calibration: Optional[str] = None,
    ) -> None:
        """Switch whichever towers scales are available for (image, text,
        or both) to the calibrated W8A8 path — every preset (mixer /
        transformer / ResNet towers; RN convs run int8 with folded BN);
        +51% imgs/s on v5e for the mixer at feature cosine >0.999
        (ops/quant.py).

        Scales come from ``calibration`` (a ``.npz`` written by
        ``save_calibration=`` here or by ``scripts/calibrate_int8.py``;
        architecture-fingerprint-checked) and/or are measured on
        ``sample_images_u8`` ([N, H, W, 3]) / ``sample_texts``. Sample
        arguments fill in whatever tower the artifact lacks."""
        from clip_mixer_tpu.ops import quant_io
        from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns

        cfg = self.cfg
        scales = t_scales = None
        if calibration is not None:
            art = quant_io.load_calibration(calibration)
            quant_io.check_cfg(art["cfg"], cfg)
            scales, t_scales = art["image_scales"], art["text_scales"]

        calibrate, quantize, _ = image_quant_fns(cfg)
        if scales is None and sample_images_u8 is not None:
            if self.input_hw is not None:
                # samples arrive at the engine's source resolution: run the
                # same in-graph resize the serving path will use
                from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

                pre = make_batch_preprocess(
                    self.input_hw, cfg.image_resolution, normalize=True,
                    dtype=jnp.dtype(cfg.compute_dtype),
                )
                sample = pre(jnp.asarray(sample_images_u8))
            else:
                sample = normalize_images(
                    jnp.asarray(sample_images_u8), dtype=jnp.dtype(cfg.compute_dtype)
                )
            scales = calibrate(self.params, cfg, sample)
        t_calibrate, t_quantize, _ = text_quant_fns(cfg)
        if t_scales is None and sample_texts:
            tokens = jnp.asarray(fast_tokenize(list(sample_texts), cfg.context_length, truncate=True))
            t_scales = t_calibrate(self.params, cfg, tokens)
        if scales is None and t_scales is None:
            raise ValueError(
                "enable_int8 has no scales for either tower: pass "
                "sample_images_u8 / sample_texts or a calibration= artifact"
            )

        if save_calibration is not None:
            quant_io.save_calibration(
                save_calibration,
                cfg,
                image_scales=None if scales is None else jax.device_get(scales),
                text_scales=None if t_scales is None else jax.device_get(t_scales),
            )

        image_fn_q, text_fn_q = encoder_fns(cfg, int8=True, input_hw=self.input_hw)
        if scales is not None:
            qparams = self._put_params(quantize(self.params, cfg, scales))
            self._image_path = (jax.jit(image_fn_q), qparams)  # atomic swap
            self.path_kinds["image"] = "int8"
            self.frozen = False  # live-jitted now, even on a load_servable engine

        if t_scales is not None:
            tparams = self._put_params(t_quantize(self.params, cfg, t_scales))
            self._text_path = (jax.jit(text_fn_q), tparams)  # atomic swap
            self.path_kinds["text"] = "int8"
            self.frozen = False

    def _put_params(self, tree):
        """Place a param tree for the engine's device layout (replicated
        over the mesh when one is configured)."""
        if self._rep_sharding is not None:
            return jax.device_put(tree, self._rep_sharding)
        return jax.device_put(tree)

    def _put_batch(self, chunk: np.ndarray):
        if self._batch_sharding is not None:
            return jax.device_put(chunk, self._batch_sharding)
        return jnp.asarray(chunk)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _run_padded(self, path, arr: np.ndarray) -> np.ndarray:
        fn, params = path  # one atomic read of the (fn, params) pair
        n = arr.shape[0]
        if n == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        out: List[np.ndarray] = []
        i = 0
        while i < n:
            take = min(n - i, self.buckets[-1])
            b = self._bucket(take)
            chunk = arr[i : i + take]
            if take < b:
                chunk = np.concatenate([chunk, np.zeros((b - take,) + arr.shape[1:], arr.dtype)])
            out.append(np.asarray(fn(params, self._put_batch(chunk)), np.float32)[:take])
            i += take
        return np.concatenate(out)

    def _run_image(self, images_u8: np.ndarray) -> np.ndarray:
        return self._run_padded(self._image_path, images_u8)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        tokens = fast_tokenize(list(texts), self.cfg.context_length, truncate=True)
        return self._run_padded(self._text_path, tokens)

    def encode_image_arrays(self, images_u8: np.ndarray, coalesce: bool = False) -> np.ndarray:
        """coalesce=True routes single-image requests through the
        micro-batcher so concurrent callers share one device batch."""
        if coalesce and images_u8.shape[0] == 1:
            return self._image_batcher.submit(images_u8[0])[None]
        return self._run_image(images_u8)

    def warmup(self) -> None:
        """Compile (or, for recorded programs, load-and-link) every batch
        bucket on both towers up front, so no production request pays the
        first-touch compile latency — on a remote-dispatch TPU host that
        tail is seconds to minutes. Zeros are enough: compilation keys on
        shapes/dtypes only."""
        R, ctx = self.cfg.image_resolution, self.cfg.context_length
        ih, iw = self.input_hw if self.input_hw is not None else (R, R)
        for b in self.buckets:
            self._run_padded(self._image_path, np.zeros((b, ih, iw, 3), np.uint8))
            self._run_padded(self._text_path, np.zeros((b, ctx), np.int32))
        index = self._index
        if index is not None and isinstance(index[0], jax.Array):
            # warm the device-bank sims program for every bucket too
            for b in self.buckets:
                _bank_sims(np.zeros((b, self.cfg.embed_dim), np.float32), index[0])

    def decode_and_preprocess(self, blobs: Sequence[bytes]) -> np.ndarray:
        from PIL import Image

        if self.input_hw is not None:
            # device-resize engine: blobs must already be at the configured
            # source resolution (the dataset-native deployment contract) —
            # resampling twice (host to input_hw, device to model size)
            # would diverge from the reference's single-resize semantics.
            ih, iw = self.input_hw
            out = []
            for b in blobs:
                img = Image.open(io.BytesIO(b)).convert("RGB")
                if img.size != (iw, ih):
                    raise ValueError(
                        f"engine is configured for {ih}x{iw} source images "
                        f"(device-side resize); got {img.size[1]}x{img.size[0]}. "
                        "Send native-resolution images or serve without --input-size."
                    )
                out.append(np.asarray(img, np.uint8))
            return np.stack(out)
        out = [preprocess_pil(Image.open(io.BytesIO(b)), self.cfg.image_resolution) for b in blobs]
        return np.stack(out)

    def load_classifier(self, classnames: Sequence[str], templates: Sequence[str]) -> None:
        """Prompt-ensemble zero-shot head: norm(mean(norm(encode(prompts))))
        per class (reference validation.py:129-133) — built through the
        ENGINE's own text path, so the classifier matches the numerics the
        images will be encoded with (int8, recorded programs, mesh) and a
        frozen engine keeps its no-model-code-re-trace guarantee."""
        prompts = [t.format(c) for c in classnames for t in templates]
        feats = self.encode_text(prompts)  # [C*T, D], already L2-normalized
        class_emb = feats.reshape(len(classnames), len(templates), -1).mean(axis=1)
        class_emb /= np.maximum(np.linalg.norm(class_emb, axis=-1, keepdims=True), 1e-8)
        self._classifier = jnp.asarray(class_emb.T.astype(np.float32))
        self._classnames = list(classnames)

    def classify(self, images_u8: np.ndarray, top_k: int = 5) -> List[List[dict]]:
        if self._classifier is None:
            raise RuntimeError("no classifier loaded; call load_classifier first")
        feats = self.encode_image_arrays(images_u8)
        probs = softmax_probs(100.0 * feats @ np.asarray(self._classifier))
        return [
            [{"label": self._classnames[i], "prob": float(row[i])} for i in _topk(row, top_k)]
            for row in probs
        ]

    def similarity(self, images_u8: np.ndarray, texts: Sequence[str]) -> np.ndarray:
        """logits_per_image [n_images, n_texts] = 100 * cosine — the
        reference's README demo semantics (softmax over texts gives its
        printed probs; logit_scale is fixed at the eval value 100, reference
        tests/test.py:18-19)."""
        img = self.encode_image_arrays(images_u8)
        txt = self.encode_text(texts)
        return 100.0 * img @ txt.T

    # ---- retrieval index (semantic search — the canonical CLIP deployment)

    # Banks at or above this row count put the similarity matmul on device
    # (the O(N*D) cost — host numpy saturates one core; the MXU doesn't
    # notice). Below it, host numpy avoids a dispatch round-trip per query.
    DEVICE_BANK_MIN_ROWS = 16384

    def load_index(
        self, features: np.ndarray, ids: Sequence[str], device: Optional[bool] = None
    ) -> None:
        """Install a retrieval index: ``features`` [N, embed_dim] (will be
        L2-normalized) with one opaque id per row. Atomic swap — safe on a
        live server.

        device: put the bank in device HBM and run the similarity matmul
        there — sharded row-wise over the engine's mesh when one is
        configured, so an N-chip host scans N bank shards in parallel.
        None = automatic (device for banks >= DEVICE_BANK_MIN_ROWS rows)."""
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2 or feats.shape[0] != len(ids):
            raise ValueError(
                f"index shape {feats.shape} does not match {len(ids)} ids"
            )
        if feats.shape[1] != self.cfg.embed_dim:
            # fail at load, not as a misleading 400 on every later query
            raise ValueError(
                f"index feature dim {feats.shape[1]} does not match this "
                f"model's embed_dim {self.cfg.embed_dim}"
            )
        feats = feats / np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
        n = feats.shape[0]
        if device is None:
            device = n >= self.DEVICE_BANK_MIN_ROWS
        if device:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                # pad rows to a device multiple so the bank shards evenly;
                # retrieve slices the sims back to the true N
                n_dev = self.mesh.devices.size
                pad = (-n) % n_dev
                if pad:
                    feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)])
                sharding = NamedSharding(self.mesh, PartitionSpec(tuple(self.mesh.axis_names)))
                bank = jax.device_put(feats, sharding)
            else:
                bank = jax.device_put(feats)
            self._index = (bank, list(ids))  # atomic
        else:
            self._index = (feats, list(ids))  # atomic

    def _device_sims(self, q: np.ndarray, bank) -> np.ndarray:
        """Bank similarity on device with queries padded to the engine's
        batch buckets — Q is client-controlled, so shipping raw shapes to
        jit would compile per distinct query count (minutes each through a
        remote-compile tunnel) and grow the cache without bound."""
        out = []
        i, n = 0, q.shape[0]
        while i < n:
            take = min(n - i, self.buckets[-1])
            b = self._bucket(take)
            chunk = np.zeros((b, q.shape[1]), np.float32)
            chunk[:take] = q[i : i + take]
            out.append(np.asarray(_bank_sims(chunk, bank))[:take])
            i += take
        return np.concatenate(out)

    def load_index_file(self, path: str) -> None:
        """Install a bank written by scripts/embed_dataset.py: ``.npz``
        with ``features`` [N, embed_dim] + ``ids`` [N] + a provenance
        fingerprint (wrong-architecture banks are refused; a numeric-path
        mismatch, e.g. a float bank on an int8 engine, warns). gs://-safe."""
        import warnings

        from clip_mixer_tpu.api import _as_path
        from clip_mixer_tpu.ops import quant_io

        with np.load(io.BytesIO(_as_path(path).read_bytes())) as z:
            if "__meta__" in z:
                meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
                quant_io.check_cfg(meta["cfg"], self.cfg)
                if meta.get("path") != self.path_kinds["image"]:
                    warnings.warn(
                        f"retrieval bank was embedded on the {meta.get('path')!r} "
                        f"image path but this engine serves {self.path_kinds['image']!r};"
                        " scores will carry the cross-path numerics gap",
                        stacklevel=2,
                    )
                bank_hw = meta.get("input_hw")
                eng_hw = None if self.input_hw is None else list(self.input_hw)
                if bank_hw != eng_hw:
                    warnings.warn(
                        f"retrieval bank was embedded with input_hw={bank_hw} "
                        f"but this engine serves input_hw={eng_hw}; the resize "
                        "numerics differ (host PIL vs device matmul)",
                        stacklevel=2,
                    )
            else:
                warnings.warn(
                    f"retrieval bank {path} carries no provenance metadata; "
                    "cannot verify it was embedded with this model",
                    stacklevel=2,
                )
            self.load_index(z["features"], [str(s) for s in z["ids"]])

    def index_images(self, images_u8: np.ndarray, ids: Sequence[str]) -> None:
        """Build the retrieval index by encoding ``images_u8`` with the
        engine's current image path (int8/frozen included)."""
        self.load_index(self.encode_image_arrays(images_u8), ids)

    def retrieve(self, texts: Sequence[str], top_k: int = 5) -> List[List[dict]]:
        """Top-k index entries per query text by cosine similarity. The
        similarity matmul runs wherever the bank lives (load_index): host
        numpy for small banks, device HBM (mesh-sharded rows) for large —
        only the [Q, N] sims row comes back to host for top-k."""
        index = self._index
        if index is None:
            raise RuntimeError("no index loaded; call load_index/index_images first")
        feats, ids = index  # one atomic read
        q = self.encode_text(texts)
        if isinstance(feats, jax.Array):
            sims = self._device_sims(q, feats)[:, : len(ids)]
        else:
            sims = q @ feats.T
        return [
            [{"id": ids[i], "score": float(row[i])} for i in _topk(row, top_k)]
            for row in sims
        ]


class MicroBatcher:
    """Coalesce concurrent single-item requests into one device batch."""

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray], max_batch: int = 128, max_wait_ms: float = 5.0):
        self._fn = fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item: np.ndarray) -> np.ndarray:
        done = threading.Event()
        holder: dict = {}
        self._q.put((item, done, holder))
        done.wait()
        if "error" in holder:
            raise holder["error"]
        return holder["result"]

    def _loop(self):
        while True:
            item, done, holder = self._q.get()
            batch = [(item, done, holder)]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                stacked = np.stack([b[0] for b in batch])
                results = self._fn(stacked)
                for (_, d, h), r in zip(batch, results):
                    h["result"] = r
                    d.set()
            except Exception as e:  # pragma: no cover - propagate per-request
                for _, d, h in batch:
                    h["error"] = e
                    d.set()


# Largest accepted request body. 256 MiB comfortably fits the biggest
# sane payload (a full 128-image bucket of b64 JPEGs is ~10-50 MB) while a
# runaway or hostile Content-Length can no longer OOM the host.
MAX_BODY_BYTES = 256 * 1024 * 1024


class ServerStats:
    """Thread-safe per-endpoint request counters and latency quantiles over
    a bounded window — the GET /metrics payload."""

    def __init__(self, window: int = 1024):
        from collections import deque

        self._deque = deque
        self._lock = threading.Lock()
        self.window = window
        self._lat: dict = {}
        self._count: dict = {}
        self._errors: dict = {}

    def record(self, endpoint: str, seconds: float, ok: bool) -> None:
        with self._lock:
            self._count[endpoint] = self._count.get(endpoint, 0) + 1
            if not ok:
                self._errors[endpoint] = self._errors.get(endpoint, 0) + 1
            self._lat.setdefault(endpoint, self._deque(maxlen=self.window)).append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            out = {}
            for ep, n in self._count.items():
                lat = sorted(self._lat.get(ep, ()))

                def q(p):
                    return round(1e3 * lat[min(len(lat) - 1, int(p * len(lat)))], 3)

                out[ep] = {
                    "count": n,
                    "errors": self._errors.get(ep, 0),
                    "window": len(lat),
                    "p50_ms": q(0.50) if lat else None,
                    "p99_ms": q(0.99) if lat else None,
                    "max_ms": round(1e3 * lat[-1], 3) if lat else None,
                }
            return out


def make_handler(engine: InferenceEngine, stats: Optional[ServerStats] = None):
    stats = stats or ServerStats()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            # record BEFORE the body is written: a client that reads the
            # response and immediately polls /metrics must see this request.
            # _t0 is cleared unconditionally — a keep-alive connection must
            # not leak one request's clock into the next.
            t0 = getattr(self, "_t0", None)
            self._t0 = None
            if t0 is not None and self.path in ("/encode_text", "/encode_image", "/classify", "/retrieve", "/index", "/similarity"):
                stats.record(self.path, time.perf_counter() - t0, ok=code == 200)
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "model": engine.cfg.tower,
                        "embed_dim": engine.cfg.embed_dim,
                        "image_resolution": engine.cfg.image_resolution,
                        "input_hw": engine.input_hw,
                        "buckets": list(engine.buckets),
                        "paths": dict(engine.path_kinds),
                        "frozen": engine.frozen,
                        "index_size": 0 if engine._index is None else len(engine._index[1]),
                    },
                )
            elif self.path == "/metrics":
                self._reply(200, {"endpoints": stats.snapshot()})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            self._t0 = time.perf_counter()
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0 or length > MAX_BODY_BYTES:
                    # negative would make read() slurp to EOF — same OOM the
                    # cap exists to stop. Close the connection: the unread
                    # body would desync a keep-alive request stream.
                    self.close_connection = True
                    self._reply(
                        413,
                        {"error": f"request body {length} bytes exceeds {MAX_BODY_BYTES}"},
                    )
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/encode_text":
                    feats = engine.encode_text(req["texts"])
                    self._reply(200, {"features": feats.tolist()})
                elif self.path == "/encode_image":
                    blobs = [base64.b64decode(b) for b in req["images_b64"]]
                    feats = engine.encode_image_arrays(
                        engine.decode_and_preprocess(blobs), coalesce=True
                    )
                    self._reply(200, {"features": feats.tolist()})
                elif self.path == "/classify":
                    blobs = [base64.b64decode(b) for b in req["images_b64"]]
                    results = engine.classify(
                        engine.decode_and_preprocess(blobs), top_k=int(req.get("top_k", 5))
                    )
                    self._reply(200, {"results": results})
                elif self.path == "/similarity":
                    blobs = [base64.b64decode(b) for b in req["images_b64"]]
                    logits = engine.similarity(
                        engine.decode_and_preprocess(blobs), req["texts"]
                    )
                    self._reply(
                        200,
                        {
                            "logits_per_image": logits.tolist(),
                            "probs": softmax_probs(logits).tolist(),
                        },
                    )
                elif self.path == "/retrieve":
                    results = engine.retrieve(req["texts"], top_k=int(req.get("top_k", 5)))
                    self._reply(200, {"results": results})
                elif self.path == "/index":
                    blobs = [base64.b64decode(b) for b in req["images_b64"]]
                    engine.index_images(engine.decode_and_preprocess(blobs), req["ids"])
                    self._reply(200, {"indexed": len(req["ids"])})
                else:
                    self._reply(404, {"error": "unknown path"})
            except (KeyError, TypeError, ValueError, json.JSONDecodeError, OSError) as e:
                # OSError covers PIL's UnidentifiedImageError on non-image
                # bytes; TypeError covers well-formed JSON of the wrong type
                # (e.g. {"texts": 5}) — client errors, not server faults.
                self._reply(400, {"error": f"bad request: {e}"})
            except RuntimeError as e:
                self._reply(409, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine: InferenceEngine, host: str = "0.0.0.0", port: int = 8000) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or use the
    returned instance's .shutdown() from tests)."""
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    return server


def main():  # pragma: no cover - CLI
    import argparse

    from clip_mixer_tpu.api import load

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--classifier", default=None, help="'imagenet' or a file with one classname per line")
    p.add_argument(
        "--all-devices", action="store_true",
        help="shard each batch over every local chip (data-parallel serving)",
    )
    p.add_argument(
        "--int8", default=None, metavar="CALIB_NPZ",
        help="serve the W8A8 path using a calibration artifact "
        "(scripts/calibrate_int8.py); covers whichever towers it holds",
    )
    p.add_argument(
        "--warmup", action="store_true",
        help="compile every batch bucket on both towers before accepting "
        "traffic (no first-request compile tail)",
    )
    p.add_argument(
        "--index", default=None, metavar="BANK_NPZ",
        help="serve text->image retrieval over a feature bank "
        "(scripts/embed_dataset.py)",
    )
    p.add_argument(
        "--input-size", type=int, default=None, metavar="N",
        help="accept NxN source images and resize on DEVICE (dataset-native "
        "serving, e.g. 256 for generateDataset.sh shards); clients must "
        "send exactly that resolution",
    )
    p.add_argument(
        "--no-frozen", action="store_true",
        help="ignore recorded servable/ programs in --model and live-jit "
        "instead (an export_servable/release dir is served frozen by default)",
    )
    args = p.parse_args()

    # An export_servable / release dir carries recorded programs — serve
    # those (the reference's load(jit=True) deployment mode) unless told not
    # to. load_servable rebuilds any recorded mesh itself, so the frozen
    # path is incompatible with flags that would re-trace the encoders.
    # epath via api._as_path, NOT os.path: a raw os.path.isfile on a
    # gs:// release dir is always False and would silently live-jit a
    # deployment that pledged never to re-trace (CLAUDE.md gs:// rule).
    from clip_mixer_tpu.api import _as_path

    frozen_manifest = _as_path(args.model) / "servable" / "manifest.json"
    if not args.no_frozen and frozen_manifest.exists():
        for flag, name in ((args.int8, "--int8"), (args.all_devices, "--all-devices"),
                           (args.input_size, "--input-size")):
            if flag:
                raise SystemExit(
                    f"{name} would re-trace the encoders, discarding the recorded "
                    f"programs in {args.model}; pass --no-frozen to live-jit with it"
                )
        from clip_mixer_tpu.aot import load_servable

        engine = load_servable(args.model)
        print(f"frozen programs loaded from {args.model}/servable")
    else:
        params, cfg, _ = load(args.model)
        mesh = local_mesh() if args.all_devices else None
        input_hw = (args.input_size, args.input_size) if args.input_size else None
        engine = InferenceEngine(params, cfg, mesh=mesh, input_hw=input_hw)
        if args.int8:
            engine.enable_int8(calibration=args.int8)
    if args.index:
        engine.load_index_file(args.index)
        print(f"retrieval index loaded: {len(engine._index[1])} entries")
    if args.warmup:  # after --index so a device bank's sims program warms too
        print("warming up all batch buckets...")
        engine.warmup()
    if args.classifier:
        from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES

        names = (
            IMAGENET_CLASSNAMES
            if args.classifier == "imagenet"
            else [l.strip() for l in open(args.classifier) if l.strip()]
        )
        engine.load_classifier(names, PROMPT_TEMPLATES)
    print(f"serving {args.model} on :{args.port}")
    serve(engine, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
