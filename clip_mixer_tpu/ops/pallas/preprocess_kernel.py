"""Fused Pallas preprocessing kernel: bicubic resize + crop + normalize.

The BASELINE.json north-star component: the torchvision/PIL front-end
(bicubic short-side resize, center crop, /255 + mean/std — reference
clip.py:80-87 + training.py:115,149) executed as ONE kernel per image on the
MXU, with the batch grid double-buffering HBM<->VMEM transfers.

Layout strategy (TPU tiling): channels-minor [H, W, 3] tiles terribly (lane
dim 3). Instead images flow as [H, W*3] uint8 — lane dim 768 — and the W-axis
resample matrix is expanded host-side into a block matrix R'[(w, c), (ow, c)]
acting on the flattened axis, so both resample passes are plain matmuls:

    step1: t = Rh @ img          [oh, W*3]   (contract H, K=256)
    step2: o = t @ Rw'           [oh, ow*3]  (contract W*3, K=768)
    step3: o = (o - mean) * inv_std  (per-channel vectors tiled along lanes)

The expanded Rw' costs 3x the FLOPs of a separable W-pass, but keeps
everything on the MXU with no in-kernel transposes; preprocessing is <2% of
end-to-end encode FLOPs, so shape quality beats FLOP count here.

Weights come from ops/preprocess.resize_weight_matrix, so the kernel is
numerically the PIL-parity path (same antialiased bicubic, same crop fusion).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_mixer_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD


def _expanded_w_matrix(rw: np.ndarray, channels: int = 3) -> np.ndarray:
    """[ow, W] -> [(W*c), (ow*c)] block matrix acting on channel-flattened
    lanes: out[(ow, c)] = sum_W in[(W, c)] * rw[ow, W]."""
    ow, w = rw.shape
    out = np.zeros((w * channels, ow * channels), np.float32)
    for c in range(channels):
        out[c::channels, c::channels] = rw.T
    return out


@functools.lru_cache(maxsize=8)
def _build_constants(h: int, w: int, n_px: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    # Same cached matrices as the XLA path (ops/preprocess._cached_matrices)
    # — ONE source for the PIL-parity resize weights.
    from clip_mixer_tpu.ops.preprocess import _cached_matrices

    rh, rw = _cached_matrices(h, w, n_px)  # [n_px, h], [n_px, w]
    rwx = _expanded_w_matrix(rw)  # [w*3, n_px*3]
    mean = np.tile(np.asarray(CLIP_MEAN, np.float32) * 255.0, n_px)
    std_inv = 1.0 / np.tile(np.asarray(CLIP_STD, np.float32) * 255.0, n_px)
    return rh, rwx, mean, std_inv


def _kernel(img_ref, rh_ref, rwx_ref, mean_ref, stdinv_ref, out_ref):
    # img: [1, H, W*3] uint8; Mosaic has no direct uint8->f32 cast, so widen
    # through int32 first.
    img = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    t = jnp.dot(rh_ref[...], img, preferred_element_type=jnp.float32)  # [n_px, W*3]
    o = jnp.dot(t, rwx_ref[...], preferred_element_type=jnp.float32)  # [n_px, n_px*3]
    out_ref[0] = ((o - mean_ref[...]) * stdinv_ref[...]).astype(out_ref.dtype)


def make_pallas_preprocess(input_hw: Tuple[int, int], n_px: int = 224, dtype=jnp.bfloat16):
    """Returns a jittable fn: uint8 [B, H, W, 3] -> [B, n_px, n_px, 3] dtype,
    numerically matching ops.preprocess.make_batch_preprocess(normalize=True)."""
    h, w = input_hw
    rh_np, rwx_np, mean_np, stdinv_np = _build_constants(h, w, n_px)

    def fn(images: jnp.ndarray) -> jnp.ndarray:
        B = images.shape[0]
        flat = images.reshape(B, h, w * 3)
        out = pl.pallas_call(
            _kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, h, w * 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_px, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((w * 3, n_px * 3), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_px * 3), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_px * 3), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_px, n_px * 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_px, n_px * 3), dtype),
            cost_estimate=pl.CostEstimate(
                flops=B * (2 * n_px * h * w * 3 + 2 * n_px * w * 3 * n_px * 3),
                bytes_accessed=B * (h * w * 3 + n_px * n_px * 3 * 2),
                transcendentals=0,
            ),
        )(
            flat,
            jnp.asarray(rh_np),
            jnp.asarray(rwx_np),
            jnp.asarray(mean_np)[None],
            jnp.asarray(stdinv_np)[None],
        )
        return out.reshape(B, n_px, n_px, 3)

    return fn
