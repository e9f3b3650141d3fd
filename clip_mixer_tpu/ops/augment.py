"""In-graph training augmentation: random crop + horizontal flip on device.

The reference trains on the deterministic inference preprocess (resize +
center crop, clip.py:76-87 used by training.py:115) — augmentation is an
addition, done the TPU-native way: the host decodes to a slightly LARGER
square (``train.py --augment`` widens the pipeline's decode size), and the
train step crops/flips **inside the jitted program**, keyed on the step
counter. Properties that fall out:

* the host does zero extra work (the standard torchvision
  RandomResizedCrop burns CPU exactly where our input pipeline is
  tightest — SCALING.md's host-decode budget);
* randomness is STATELESS: ``key = fold_in(seed, step)`` — so
  kill-and-resume replays the identical augmentation stream and the
  bitwise-determinism contract of the Trainer survives;
* under any parallelism mode the op runs on the GLOBAL batch array before
  the loss (GSPMD shards it with the batch), so 1-device and n-device runs
  see identical pixels (DP-invariance holds with augmentation on).

uint8 in, uint8 out — normalization stays in the step, after augmentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def source_size(resolution: int) -> int:
    """Decode size the data pipeline should deliver for random cropping:
    ~14% larger than the model resolution, rounded up to a multiple of 8
    (224 -> 256, 336 -> 384, 32 -> 40)."""
    return (resolution * 8 // 7 + 7) // 8 * 8


def random_crop_flip(key: jax.Array, images_u8: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Per-sample random ``out_size``² crop + 50% horizontal flip.

    images_u8: uint8 [B, S, S, 3] with S >= out_size (equality = flip-only).
    Returns uint8 [B, out_size, out_size, 3].
    """
    B, H, W, _ = images_u8.shape
    assert H >= out_size and W >= out_size, (images_u8.shape, out_size)
    ky, kx, kf = jax.random.split(key, 3)
    oy = jax.random.randint(ky, (B,), 0, H - out_size + 1)
    ox = jax.random.randint(kx, (B,), 0, W - out_size + 1)
    flip = jax.random.bernoulli(kf, 0.5, (B,))

    def one(im, y, x, f):
        c = jax.lax.dynamic_slice(im, (y, x, 0), (out_size, out_size, 3))
        return jnp.where(f, c[:, ::-1, :], c)

    return jax.vmap(one)(images_u8, oy, ox, flip)


def maybe_augment(tcfg, cfg, step, images_u8: jnp.ndarray) -> jnp.ndarray:
    """The ONE augmentation hook shared by the DP/TP, FSDP and PP train
    steps: no-op unless ``tcfg.augment``; otherwise crop to the model's
    resolution + flip, keyed on (seed, step). ``step`` is the TrainState
    counter (traced) — resume replays the same stream."""
    if not tcfg.augment:
        return images_u8
    key = jax.random.fold_in(jax.random.key(tcfg.seed ^ 0x5EED), step)
    return random_crop_flip(key, images_u8, cfg.image_resolution)
