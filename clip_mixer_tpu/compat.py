"""Drop-in replacement for the reference ``clip`` module (torch surface).

``import clip_mixer_tpu.compat as clip`` makes reference user code run
unmodified on this framework: the README demo (reference README.md:42-59,
tests/test.py) works line-for-line —

    import clip_mixer_tpu.compat as clip
    model, preprocess = clip.load("ViT-B/32")
    image = preprocess(Image.open("CLIP.png")).unsqueeze(0)
    text = clip.tokenize(["a diagram", "a dog", "a cat"])
    with torch.no_grad():
        image_features = model.encode_image(image)
        text_features = model.encode_text(text)
        img_f, txt_f, scale = model(image, text)

Semantics mirror the reference exactly where it has them:

* ``load`` (clip.py:95-195) accepts everything ``api.load`` does (registry
  names with SHA256-verified download, local torch/.pt/orbax/Accelerate
  paths, presets). ``device`` picks the compute dtype the way the
  reference's device pick did (CPU -> float32 like ``model.float()``,
  clip.py:155; accelerator -> bf16, our fp16 analogue); computation always
  runs on the default JAX backend. ``jit`` is accepted and ignored —
  everything is XLA-compiled (clip.py loads the non-JIT class at
  jit=False too).
* ``preprocess`` returns the reference transform's output: a normalized
  CHW float32 torch tensor (_transform, clip.py:76-87 + the deferred
  normalisation of training.py:115 folded in, matching torchvision
  ``ToTensor+Normalize``).
* ``tokenize`` (clip.py:198-238): same tokens, returned as torch.long.
* ``model(image, text)`` returns the reference triple
  (image_features_normalised, text_features_normalised, exp(logit_scale))
  — model.py:428-442 returns FEATURES, not logits; the stale
  ``tests/test.py`` unpack is the reference bug SURVEY §7 documents.
  ``logits_per_image`` for the demo comes from ``model.logits(image, text)``.

Everything in/out is torch (CPU tensors); JAX/XLA runs underneath. This
module is a convenience adapter — the native functional API (``api.load``,
``models.clip``) is the performance path and what serving/training use.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import torch

import jax
import jax.numpy as jnp

from clip_mixer_tpu import api
from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, normalize_images
from clip_mixer_tpu.text import tokenize as _tokenize_np

__all__ = ["available_models", "load", "tokenize"]


def available_models():
    """Names accepted by :func:`load` (clip.py:90-92 + native presets)."""
    return api.available_models()


def tokenize(
    texts, context_length: int = 77, truncate: bool = False
) -> torch.Tensor:
    """Reference ``clip.tokenize`` (clip.py:198-238): [N, context_length]
    torch.long tokens, same truncate/raise semantics."""
    return _to_torch(
        _tokenize_np(texts, context_length=context_length, truncate=truncate), np.int64
    )


def _to_numpy(x) -> np.ndarray:
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _to_torch(x, dtype=np.float32) -> torch.Tensor:
    # copy: jax/PIL hand back read-only buffers, which from_numpy would
    # alias and torch warns about.
    return torch.from_numpy(np.array(x, dtype=dtype, copy=True))


class _VisualShim:
    """Attribute shim for reference code touching ``model.visual``."""

    def __init__(self, input_resolution: int):
        self.input_resolution = input_resolution


class CLIP:
    """Object-style wrapper over the functional model: the reference
    ``model.py:293-442`` surface with torch tensors at the boundary.

    Attributes mirror what ``build_model`` stamps on the torch module
    (model.py:488-508): ``context_length``, ``vocab_size``,
    ``input_resolution``. ``params``/``cfg`` expose the native pytree for
    users crossing over to the functional API.
    """

    def __init__(self, params, cfg: CLIPConfig):
        self.params = params
        self.cfg = cfg
        self.context_length = cfg.context_length
        self.vocab_size = cfg.vocab_size
        self.input_resolution = cfg.image_resolution
        # reference call sites read model.visual.input_resolution (e.g. its
        # own training.py:288 builds the transform from it)
        self.visual = _VisualShim(cfg.image_resolution)
        self._encode_image = jax.jit(
            lambda p, x: clip_model.encode_image(p, cfg, x)
        )
        self._encode_text = jax.jit(
            lambda p, t: clip_model.encode_text(p, cfg, t)
        )
        self._forward = jax.jit(lambda p, x, t: clip_model.forward(p, cfg, x, t))
        self._logits = jax.jit(lambda p, x, t: clip_model.logits(p, cfg, x, t))

    # torch idioms: inference-only adapter, so these are no-ops that keep
    # reference call sites (`model.eval()`, `.to(device)`, `.float()`) legal.
    def eval(self):
        return self

    def train(self, mode: bool = True):
        if mode:
            raise RuntimeError(
                "compat.CLIP is inference-only; train with clip_mixer_tpu.train "
                "(see MIGRATING.md)"
            )
        return self

    def to(self, device=None, dtype=None):
        return self

    def float(self):
        return self

    def half(self):
        return self

    @property
    def dtype(self) -> torch.dtype:
        """Compute dtype (reference model.py:405-407 sniffs conv1)."""
        return {
            "float32": torch.float32,
            "bfloat16": torch.bfloat16,
            "float16": torch.float16,
        }[self.cfg.compute_dtype]

    @property
    def logit_scale(self) -> torch.Tensor:
        """The pre-exp learned scalar, like the reference parameter."""
        return torch.tensor(float(self.params["logit_scale"]))

    def _prep_images(self, image) -> jnp.ndarray:
        """Accept the reference preprocess output (normalized [B,3,H,W]
        float, CHW from torchvision) or our native HWC/NHWC uint8."""
        x = _to_numpy(image)
        if x.ndim == 3:
            x = x[None]
        if x.ndim != 4:
            raise ValueError(f"expected [B,C,H,W] or [B,H,W,C] images, got {x.shape}")
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = np.moveaxis(x, 1, -1)  # NCHW -> NHWC
        if x.dtype == np.uint8:
            return normalize_images(jnp.asarray(x))
        return jnp.asarray(x, jnp.float32)

    def encode_image(self, image) -> torch.Tensor:
        """[B, embed_dim] un-normalised features (model.py:410-411)."""
        feats = self._encode_image(self.params, self._prep_images(image))
        return _to_torch(feats)

    def encode_text(self, text) -> torch.Tensor:
        """[B, embed_dim] un-normalised features (model.py:413-426)."""
        toks = jnp.asarray(_to_numpy(text), jnp.int32)
        feats = self._encode_text(self.params, toks)
        return _to_torch(feats)

    def forward(
        self, image, text
    ) -> Tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
        """The reference forward triple (model.py:428-442): L2-normalised
        features for both towers plus exp(logit_scale)."""
        img, txt, scale = self._forward(
            self.params, self._prep_images(image), jnp.asarray(_to_numpy(text), jnp.int32)
        )
        return (_to_torch(img), _to_torch(txt), torch.tensor(float(scale)))

    __call__ = forward

    def state_dict(self) -> dict:
        """Reference-format torch state_dict (model.py naming), so compat
        users can `torch.save(model.state_dict(), ...)` and load the result
        with the reference's ``build_model`` — or back into :func:`load`."""
        from clip_mixer_tpu.models.convert import params_to_state_dict

        return {
            k: _to_torch(v, v.dtype)
            for k, v in params_to_state_dict(self.params, self.cfg).items()
        }

    def logits(self, image, text) -> Tuple[torch.Tensor, torch.Tensor]:
        """(logits_per_image, logits_per_text) — the OpenAI demo contract
        the stale reference tests/test.py expected from forward."""
        per_image, per_text = self._logits(
            self.params, self._prep_images(image), jnp.asarray(_to_numpy(text), jnp.int32)
        )
        return (_to_torch(per_image), _to_torch(per_text))


def _make_torch_transform(hwc_uint8):
    """The reference `_transform(n_px)` composed with the deferred
    normalisation (clip.py:76-87 + training.py:115): PIL -> normalized CHW
    float32 torch tensor. ``hwc_uint8`` is the native preprocess callable
    api.load already returns (byte-parity resize/crop via preprocess_pil)."""
    mean = torch.tensor(CLIP_MEAN).view(3, 1, 1)
    std = torch.tensor(CLIP_STD).view(3, 1, 1)

    def transform(image) -> torch.Tensor:
        x = _to_torch(hwc_uint8(image), np.uint8)
        x = x.permute(2, 0, 1).to(torch.float32) / 255.0
        return (x - mean) / std

    return transform


def load(
    name: str,
    device: Optional[Union[str, "torch.device"]] = None,
    jit: bool = False,
    download_root: Optional[str] = None,
):
    """Reference ``clip.load`` (clip.py:95-195): returns (model, preprocess).

    ``device`` selects the compute dtype the way the reference's device pick
    did (cpu -> float32, matching its ``model.float()``; otherwise bf16);
    execution always happens on the default JAX backend. ``jit`` is ignored
    (everything is XLA-compiled).
    """
    del jit
    if device is None:
        device = "cpu" if jax.default_backend() == "cpu" else "tpu"
    compute_dtype = "float32" if "cpu" in str(device) else "bfloat16"
    params, cfg, preprocess_hwc = api.load(
        name, download_root=download_root, compute_dtype=compute_dtype
    )
    return CLIP(params, cfg), _make_torch_transform(preprocess_hwc)
