"""Image preprocessing: PIL-parity host path + TPU-native device path.

The reference pipeline (clip.py:76-87) is ``Resize(n_px, BICUBIC)`` (short
side, antialiased, PIL) -> ``CenterCrop(n_px)`` -> RGB uint8, with the
/255 + mean/std normalisation deliberately deferred to the train loop
(clip.py:85-86, training.py:115,149). We reproduce that split:

* :func:`preprocess_pil` — host-side single-image path, byte-exact with the
  reference (PIL does the resampling in both);
* :func:`make_batch_preprocess` — device-side batched path for fixed input
  shapes. Antialiased bicubic resampling is *linear*, so the whole
  resize+crop is two small matmuls with precomputed PIL-style weight
  matrices: ``out = R_h @ img @ R_w^T`` per channel. On TPU these land on
  the MXU and XLA fuses the /255 + normalize into the same loop — this is
  the "fused preprocessing kernel" expressed the XLA-native way (a Pallas
  variant lives in ops/pallas/ for the full fusion with patchify).

PIL-parity of the weights (the main accuracy risk — SURVEY §7 hard-part #1):
PIL's ``ImagingResampleHorizontal`` computes, for scale s = in/out > 1, a
support window of ``2*s`` around center ``(i+0.5)*s`` with bicubic kernel
a=-0.5 evaluated at ``(j+0.5-center)/s``, normalised to sum 1. We replicate
that exactly (in float; PIL quantises to 8-bit fixed point per pass, so
uint8 outputs can differ by ~1/255 — eval-metric neutral).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


import jax.numpy as jnp

# CLIP RGB normalisation constants (training.py:115).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys bicubic kernel with a=-0.5 (PIL's BICUBIC)."""
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x < 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * (x3 - 5.0 * x2 + 8.0 * x - 4.0), 0.0),
    )


def resize_weight_matrix(in_size: int, out_size: int, crop_offset: int = 0, crop_size: Optional[int] = None) -> np.ndarray:
    """[crop_size, in_size] row-stochastic matrix: PIL antialiased bicubic
    resize in_size->out_size, composed with a crop [crop_offset, crop_offset
    + crop_size) of the *resized* axis. Rows outside the crop are never
    materialised — resize and center-crop fuse into one matrix."""
    crop_size = crop_size if crop_size is not None else out_size
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale  # bicubic support = 2
    W = np.zeros((crop_size, in_size), np.float64)
    for r in range(crop_size):
        i = r + crop_offset
        center = (i + 0.5) * scale
        jmin = max(int(center - support + 0.5), 0)
        jmax = min(int(center + support + 0.5), in_size)
        js = np.arange(jmin, jmax)
        w = _bicubic((js + 0.5 - center) / filterscale)
        W[r, jmin:jmax] = w / w.sum()
    return W.astype(np.float32)


def resize_geometry(h: int, w: int, n_px: int) -> Tuple[int, int, int, int]:
    """torchvision Resize(short-side)+CenterCrop geometry: resized (oh, ow)
    and crop offsets (top, left). The long side truncates (torchvision
    _compute_resized_output_size uses int(), not round())."""
    if w <= h:
        ow, oh = n_px, int(n_px * h / w)
    else:
        oh, ow = n_px, int(n_px * w / h)
    top = int(round((oh - n_px) / 2.0))
    left = int(round((ow - n_px) / 2.0))
    return oh, ow, top, left


@functools.lru_cache(maxsize=32)
def _cached_matrices(h: int, w: int, n_px: int) -> Tuple[np.ndarray, np.ndarray]:
    oh, ow, top, left = resize_geometry(h, w, n_px)
    return (
        resize_weight_matrix(h, oh, top, n_px),
        resize_weight_matrix(w, ow, left, n_px),
    )


def make_batch_preprocess(
    input_hw: Tuple[int, int],
    n_px: int = 224,
    normalize: bool = True,
    dtype=jnp.float32,
    backend: str = "xla",
):
    """Build a jittable fn: uint8/float [B, H, W, 3] -> [B, n_px, n_px, 3].

    Resize+crop ride the MXU as two matmuls; /255 + mean/std fuse in. The
    result feeds ``encode_image`` directly (which patchifies — another
    reshape+matmul — so the whole front-end is three matmuls, no gather).

    backend="pallas" routes through the single-kernel Pallas variant
    (ops/pallas/preprocess_kernel) — numerically identical; the XLA default
    measured slightly faster at B/32 scale (README perf notes).
    """
    if backend == "pallas":
        if not normalize:
            raise ValueError("the pallas preprocess backend always normalizes")
        from clip_mixer_tpu.ops.pallas.preprocess_kernel import make_pallas_preprocess

        return make_pallas_preprocess(input_hw, n_px, dtype=dtype)
    h, w = input_hw
    rh_np, rw_np = _cached_matrices(h, w, n_px)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    std_inv = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)

    def fn(images: jnp.ndarray) -> jnp.ndarray:
        rh = jnp.asarray(rh_np)
        rw = jnp.asarray(rw_np)
        x = images.astype(jnp.float32)
        # [o,h]@[b,h,w,c] over h, then [p,w] over w.
        x = jnp.einsum("oh,bhwc->bowc", rh, x)
        x = jnp.einsum("pw,bowc->bopc", rw, x)
        if normalize:
            x = (x - mean) * std_inv
        else:
            x = x / 255.0
        return x.astype(dtype)

    return fn


def normalize_images(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> normalised float — the in-train-loop step
    (training.py:149: Normalize(images/255))."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    std_inv = 1.0 / (jnp.asarray(CLIP_STD, jnp.float32) * 255.0)
    return ((images.astype(jnp.float32) - mean) * std_inv).astype(dtype)


def preprocess_pil(image, n_px: int = 224) -> np.ndarray:
    """Host path, byte-exact with the reference preprocess: PIL bicubic
    short-side resize -> center crop -> RGB -> HWC uint8.

    Divergence note: the reference emits CHW (clip.py:77); we emit HWC, the
    TPU-native layout. The uint8 content is identical.
    """
    from PIL import Image

    w, h = image.size
    oh, ow, top, left = resize_geometry(h, w, n_px)
    image = image.resize((ow, oh), Image.BICUBIC)
    image = image.crop((left, top, left + n_px, top + n_px))
    return np.asarray(image.convert("RGB"), dtype=np.uint8)


def make_transform(n_px: int = 224):
    """The reference's ``_transform(n_px)`` factory (clip.py:80-87): returns
    a callable PIL.Image -> HWC uint8."""

    def transform(image) -> np.ndarray:
        return preprocess_pil(image, n_px)

    return transform
