"""Generate a natural-ish synthetic image/caption dataset as webdataset tars.

The reference trains on 200M LAION-COCO JPEGs streamed from blob storage
(/root/reference/training/clip/dataset.py:95-150, generateDataset.sh:18:
256px webdataset, 10k samples/shard). This environment has zero egress, so
the dress-rehearsal equivalent is generated locally: procedural scenes with
a natural-image-like 1/f spectrum (multi-scale noise backgrounds), a colored
object whose shape/color/texture are caption-determined, JPEG-encoded at
quality 90 and packed with ``write_tar_shards`` into the exact shard layout
``TarShardSource`` consumes. Captions span shape x color x background
(~600 classes), so contrastive training and the RetrievalValidator have real
signal on held-out shards.

Deterministic per (seed, index): re-running yields byte-identical pixels.

Usage:
  python scripts/make_dress_dataset.py --out /data/dress --n 100000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COLORS = {
    "red": (200, 40, 40), "green": (40, 170, 60), "blue": (40, 80, 200),
    "yellow": (220, 200, 40), "purple": (140, 60, 180), "orange": (230, 130, 30),
    "white": (235, 235, 235), "black": (25, 25, 25), "pink": (240, 130, 180),
    "brown": (130, 85, 45), "teal": (40, 160, 160), "gray": (128, 128, 128),
}
SHAPES = ["circle", "square", "triangle", "ring", "stripe", "diamond", "cross", "dot"]
BACKDROPS = {
    "grassy": (60, 130, 60), "sandy": (200, 175, 120), "cloudy": (180, 190, 205),
    "rocky": (120, 115, 110), "ocean": (40, 90, 150), "sunset": (210, 120, 70),
}
TEMPLATES = [
    "a photo of a {c} {s} on a {b} background.",
    "a {c} {s} against a {b} backdrop.",
    "an image showing a {c} {s} in a {b} scene.",
    "the {c} {s}, photographed on {b} terrain.",
]


class _Banks:
    """Precomputed texture/noise fields (built once per (seed, size)): each
    sample composes a bank entry with random dihedral flips instead of
    synthesizing full-resolution noise — ~5x faster on this 1-core host,
    still deterministic per (seed, index)."""

    def __init__(self, seed, size, k=48):
        from PIL import Image

        rng = np.random.default_rng(np.random.SeedSequence([seed, 0xBA2C5]))
        self.tex = []
        for _ in range(k):
            acc = np.zeros((size, size, 3), np.float32)
            for res, w in ((8, 0.55), (32, 0.3), (128, 0.15)):
                layer = rng.normal(0.0, 1.0, (res, res, 3)).astype(np.float32)
                img = Image.fromarray(
                    ((layer - layer.min()) / (np.ptp(layer) + 1e-6) * 255).astype(np.uint8))
                acc += w * np.asarray(img.resize((size, size), Image.BILINEAR), np.float32)
            # 1/f-ish multi-octave texture in [-0.5, 0.5]
            self.tex.append(np.ascontiguousarray(acc / 255.0 - 0.5))
        self.noise = [rng.normal(0, 4.0, (size, size, 3)).astype(np.float32) for _ in range(8)]
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        self.yy, self.xx = yy, xx
        d = ((xx / size - 0.5) ** 2 + (yy / size - 0.5) ** 2)[..., None]
        self.vignette = (1.0 - 0.35 * d).astype(np.float32)


_BANKS = {}


def _flip(a, rng):
    sy, sx = (1, -1)[rng.integers(2)], (1, -1)[rng.integers(2)]
    return a[::sy, ::sx]


def _shape_mask(shape, banks, cx, cy, r, rng):
    dx, dy = banks.xx - cx, banks.yy - cy
    if shape == "circle":
        return dx * dx + dy * dy < r * r
    if shape == "dot":
        return dx * dx + dy * dy < (r * 0.4) ** 2
    if shape == "ring":
        d2 = dx * dx + dy * dy
        return (d2 < r * r) & (d2 > (0.55 * r) ** 2)
    if shape == "square":
        return (np.abs(dx) < r) & (np.abs(dy) < r)
    if shape == "diamond":
        return np.abs(dx) + np.abs(dy) < 1.2 * r
    if shape == "triangle":
        return (dy > -r) & (dy + 2 * np.abs(dx) < r)
    if shape == "cross":
        return ((np.abs(dx) < 0.33 * r) & (np.abs(dy) < r)) | (
            (np.abs(dy) < 0.33 * r) & (np.abs(dx) < r))
    if shape == "stripe":
        ang = rng.uniform(0, np.pi)
        return np.abs(dx * np.sin(ang) - dy * np.cos(ang)) < 0.3 * r
    raise ValueError(shape)


def render_sample(seed, index, size=256, color=None, shape=None, backdrop=None):
    """One deterministic (HWC uint8 image, caption) pair. Passing
    color/shape/backdrop forces the class (scripts/acceptance.py builds
    class-folder stand-in eval sets this way); the rng draw order is kept
    identical so forced and free renders share the same noise stream."""
    banks = _BANKS.get((seed, size))
    if banks is None:
        banks = _BANKS[(seed, size)] = _Banks(seed, size)
    rng = np.random.default_rng(np.random.SeedSequence([seed, index]))
    c_i = rng.integers(len(COLORS))  # always drawn, so forcing a class
    s_i = rng.integers(len(SHAPES))  # doesn't shift the downstream stream
    b_i = rng.integers(len(BACKDROPS))
    color = color or list(COLORS)[c_i]
    shape = shape or SHAPES[s_i]
    backdrop = backdrop or list(BACKDROPS)[b_i]
    tex = _flip(banks.tex[rng.integers(len(banks.tex))], rng)
    base = np.asarray(BACKDROPS[backdrop], np.float32)
    img = base * (1.0 + 0.9 * tex)
    cx, cy = rng.uniform(0.3, 0.7, 2) * size
    r = rng.uniform(0.12, 0.28) * size
    mask = _shape_mask(shape, banks, cx, cy, r, rng)
    fg = np.asarray(COLORS[color], np.float32) * rng.uniform(0.85, 1.15)
    img[mask] = np.clip(0.85 * fg + 0.15 * img[mask], 0, 255)
    # photographic touches: vignette + sensor noise
    img *= banks.vignette
    img += _flip(banks.noise[rng.integers(len(banks.noise))], rng)
    caption = TEMPLATES[rng.integers(len(TEMPLATES))].format(c=color, s=shape, b=backdrop)
    return np.clip(img, 0, 255).astype(np.uint8), caption


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--samples-per-shard", type=int, default=10_000)
    p.add_argument("--quality", type=int, default=90)
    args = p.parse_args()

    from clip_mixer_tpu.data.pipeline import write_tar_shards

    def gen():
        for i in range(args.n):
            if i % 2000 == 0:
                print(f"[make_dress_dataset] {i}/{args.n}", flush=True)
            yield render_sample(args.seed, i, args.size)

    paths = write_tar_shards(gen(), args.out, args.samples_per_shard, quality=args.quality)
    print(f"[make_dress_dataset] wrote {len(paths)} shards to {args.out}")


if __name__ == "__main__":
    main()
