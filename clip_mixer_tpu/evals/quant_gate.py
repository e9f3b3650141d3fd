"""int8 serving accuracy gate: zero-shot top-1 agreement vs the float path.

The north-star acceptance for the quantized serving path is "ImageNet
zero-shot top-1 within 0.1% of bf16" (BASELINE.md). Real eval data is not
fetchable in this environment (zero egress), so this module provides the
strongest offline instrument for that gate:

* a **deterministic procedural image set** (seeded structured patterns —
  gradients, oriented stripes, checkers, blobs, noise — no binary assets to
  commit, bit-reproducible everywhere), and
* **top-1 agreement** between the float and calibrated-int8 image encoders
  against a shared zero-shot prompt classifier, plus the logit-margin
  statistics that bound how a small feature perturbation can flip top-1.

A top-1 flip requires the int8 logit perturbation to exceed the float
decision margin. On a *random-init* model the margins are at their smallest
(near-uniform class similarities), so agreement measured here is a
conservative floor for a trained checkpoint, whose class margins are far
larger. In fact the floor is so conservative that bf16 ITSELF flips ~0.9%
of top-1s vs f32 on this set (measured full-size) — so the production gate
(:func:`noise_floor_gate`) is relative: int8 may add at most a bounded
multiple of the top-1 instability bf16 numerics already introduce. bench.py
runs it at full model scale on the TPU and refuses to headline the int8
number if the gate fails.

Reference counterpart: the top-1/top-5 protocol of ImageNetValidator
(/root/reference/training/clip/validation.py:136-179); the classifier
construction mirrors zeroshot_classifier (validation.py:119-134).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model


def synthetic_images(n: int, res: int, seed: int = 0) -> np.ndarray:
    """Deterministic structured uint8 image set [n, res, res, 3].

    Mixes low-frequency gradients, oriented stripes, checkerboards, radial
    blobs and filtered noise so patch statistics span the range a natural
    preprocessing front-end sees (not just iid noise, which under-excites
    the outlier activations that stress int8 scales).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    imgs = np.empty((n, res, res, 3), np.float32)
    for i in range(n):
        kind = i % 5
        if kind == 0:  # linear gradient, random direction per channel
            d = rng.normal(size=(3, 2))
            base = np.stack([d[c, 0] * xx + d[c, 1] * yy for c in range(3)], -1)
        elif kind == 1:  # oriented stripes
            f = rng.uniform(2, 24)
            th = rng.uniform(0, np.pi)
            s = np.sin(2 * np.pi * f * (np.cos(th) * xx + np.sin(th) * yy))
            base = np.stack([s * rng.uniform(0.5, 1.0) for _ in range(3)], -1)
        elif kind == 2:  # checkerboard
            k = int(rng.integers(4, 32))
            s = ((np.floor(xx * k) + np.floor(yy * k)) % 2) * 2 - 1
            base = np.stack([s, -s, s * rng.uniform(-1, 1)], -1)
        elif kind == 3:  # radial blobs
            cx, cy = rng.uniform(0.2, 0.8, 2)
            r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            base = np.stack([np.exp(-r / rng.uniform(0.05, 0.4)) for _ in range(3)], -1)
        else:  # smoothed noise (k x k box filter via integral image)
            k = int(rng.integers(1, 8))
            z = rng.normal(size=(res + k, res + k, 3)).astype(np.float32)
            pad = np.zeros((res + k + 1, res + k + 1, 3), np.float32)
            pad[1:, 1:] = np.cumsum(np.cumsum(z, 0), 1)
            base = (
                pad[k : res + k, k : res + k]
                - pad[:res, k : res + k]
                - pad[k : res + k, :res]
                + pad[:res, :res]
            ) / (k * k)
        lo, hi = base.min(), base.max()
        imgs[i] = (base - lo) / max(hi - lo, 1e-6)
    return (imgs * 255).astype(np.uint8)


def build_float_classifier(
    params,
    cfg: CLIPConfig,
    classnames: Sequence[str],
    templates: Sequence[str],
    batch_size: int = 256,
) -> np.ndarray:
    """Prompt-ensemble classifier [embed_dim, n_classes] in the FLOAT model
    (shared by both paths — the gate isolates the image encoder)."""
    from clip_mixer_tpu.evals.zeroshot import build_zeroshot_classifier

    return np.asarray(
        build_zeroshot_classifier(params, cfg, list(classnames), list(templates), batch_size)
    )


# The (calibrate, quantize, encode_q) tower dispatch lives with the quant
# kernels themselves so the gates here and serving.Server.enable_int8 select
# from the SAME table; re-exported for existing importers.
from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns  # noqa: E402,F401


def _batched_feats(fn, p, images_u8: np.ndarray, batch_size: int) -> np.ndarray:
    """Run a jitted (params, images_u8_batch) -> feats fn over the whole set
    at ONE compiled shape (tail batch zero-padded then sliced)."""
    outs: List[np.ndarray] = []
    n = images_u8.shape[0]
    for i in range(0, n, batch_size):
        chunk = images_u8[i : i + batch_size]
        if chunk.shape[0] < batch_size:
            pad = np.zeros((batch_size - chunk.shape[0],) + chunk.shape[1:], chunk.dtype)
            padded = np.concatenate([chunk, pad])
            outs.append(np.asarray(fn(p, jnp.asarray(padded)), np.float32)[: chunk.shape[0]])
        else:
            outs.append(np.asarray(fn(p, jnp.asarray(chunk)), np.float32))
    return np.concatenate(outs)


def zeroshot_top1_agreement(
    params,
    cfg: CLIPConfig,
    images_u8: np.ndarray,
    classifier: np.ndarray,
    calibrate_n: int = 128,
    batch_size: int = 256,
) -> Dict[str, float]:
    """Compare float vs calibrated-int8 zero-shot predictions.

    Returns {agreement, n, min_cosine, mean_cosine, median_margin,
    flip_margin_max}: ``margin`` is the float top1-top2 logit gap (the
    robustness budget); ``flip_margin_max`` is the largest float margin among
    disagreeing images (how "confident" a prediction int8 managed to flip —
    small is good).
    """
    from clip_mixer_tpu.ops.preprocess import normalize_images

    dt = jnp.dtype(cfg.compute_dtype)
    calibrate, quantize, encode_q = image_quant_fns(cfg)

    sample = normalize_images(jnp.asarray(images_u8[:calibrate_n]), dtype=dt)
    scales = jax.jit(lambda p, x: calibrate(p, cfg, x))(params, sample)
    qparams = jax.jit(lambda p, s: quantize(p, cfg, s))(params, scales)

    f_float = jax.jit(
        lambda p, x: clip_model.l2_normalize(
            clip_model.encode_image(p, cfg, normalize_images(x, dtype=dt))
        )
    )
    f_int8 = jax.jit(
        lambda p, x: clip_model.l2_normalize(encode_q(p, cfg, normalize_images(x, dtype=dt)))
    )

    n = images_u8.shape[0]
    ff = _batched_feats(f_float, params, images_u8, batch_size)
    fq = _batched_feats(f_int8, qparams, images_u8, batch_size)

    cos = (ff * fq).sum(-1)
    logits_f = 100.0 * ff @ classifier  # the reference's 100x logit scale (validation.py:163)
    logits_q = 100.0 * fq @ classifier
    top1_f = logits_f.argmax(-1)
    top1_q = logits_q.argmax(-1)
    agree = top1_f == top1_q
    sorted_f = np.sort(logits_f, -1)
    margin = sorted_f[:, -1] - sorted_f[:, -2]
    flips = margin[~agree]
    return {
        "agreement": float(agree.mean()),
        "n": int(n),
        "min_cosine": float(cos.min()),
        "mean_cosine": float(cos.mean()),
        "median_margin": float(np.median(margin)),
        "flip_margin_max": float(flips.max()) if flips.size else 0.0,
    }


def noise_floor_gate(
    params,
    cfg: CLIPConfig,
    images_u8: np.ndarray,
    classifier: np.ndarray,
    calibrate_n: int = 128,
    batch_size: int = 256,
    max_flip_ratio: float = 2.5,
    a_scales=None,
) -> Dict[str, float]:
    """int8 accuracy gate relative to the numerics noise floor.

    a_scales: gate these activation scales (e.g. a release artifact's)
    instead of self-calibrating on the first ``calibrate_n`` gate images.

    On a random-init model (worst-case decision margins) even bf16 flips
    ~1% of top-1 predictions vs f32 — measured 0.91% at full Mixer-B/32
    scale — because near-zero-margin predictions flip under ANY numerics
    perturbation, including the fp16 the reference itself deploys. An
    absolute agreement bar therefore conflates quantization error with
    inherent low-margin noise. This gate instead compares like with like:

        flip(int8 vs f32)  <=  max_flip_ratio * flip(bf16 vs f32)

    i.e. the int8 path may add at most (ratio-1)x the top-1 instability that
    bf16 numerics already introduce on the same images. On a trained
    checkpoint, whose margins are orders larger than this random-init floor,
    passing this gate implies a top-1 delta far inside the 0.1% target
    (flips require margin < the measured flip_margin_max ~= 0.05 logits;
    trained CLIP ImageNet margins are O(1) logits).

    Returns flip rates, their ratio, and ``passed``.
    """
    dt32 = jnp.float32
    cfg32 = cfg.replace(compute_dtype="float32")

    from clip_mixer_tpu.ops.preprocess import normalize_images

    f_f32 = jax.jit(
        lambda p, x: clip_model.l2_normalize(
            clip_model.encode_image(p, cfg32, normalize_images(x, dtype=dt32))
        )
    )
    f_bf16 = jax.jit(
        lambda p, x: clip_model.l2_normalize(
            clip_model.encode_image(p, cfg, normalize_images(x, dtype=jnp.dtype(cfg.compute_dtype)))
        )
    )
    calibrate, quantize, encode_q = image_quant_fns(cfg)
    if a_scales is None:
        sample = normalize_images(
            jnp.asarray(images_u8[:calibrate_n]), dtype=jnp.dtype(cfg.compute_dtype)
        )
        scales = jax.jit(lambda p, x: calibrate(p, cfg, x))(params, sample)
    else:
        scales = a_scales  # gate the SHIPPED scales (release validation)
    qparams = jax.jit(lambda p, s: quantize(p, cfg, s))(params, scales)
    f_int8 = jax.jit(
        lambda p, x: clip_model.l2_normalize(
            encode_q(p, cfg, normalize_images(x, dtype=jnp.dtype(cfg.compute_dtype)))
        )
    )

    ff32 = _batched_feats(f_f32, params, images_u8, batch_size)
    fbf = _batched_feats(f_bf16, params, images_u8, batch_size)
    fq = _batched_feats(f_int8, qparams, images_u8, batch_size)
    return _flip_stats(ff32, fbf, fq, classifier, max_flip_ratio)


def _wilson(k: int, n: int, z: float = 1.959964) -> tuple:
    """Wilson 95% score interval for a binomial proportion k/n."""
    if n == 0:
        return (0.0, 1.0)
    z2 = z * z
    center = (k + z2 / 2.0) / (n + z2)
    half = (z / (n + z2)) * np.sqrt(k * (n - k) / n + z2 / 4.0)
    return (max(0.0, center - half), min(1.0, center + half))


def _flip_verdict(t32, t16, tq, cos_q, max_flip_ratio: float) -> Dict[str, float]:
    """The shared noise-floor verdict from three top-1 prediction vectors:
    flip(int8 vs f32) <= max_flip_ratio * flip(bf16 vs f32).

    The flip counts are binomial draws, so the dict carries Wilson 95% CIs
    on both flip rates plus a conservative interval on the ratio itself
    (numerator upper / denominator lower, with the same 1/n floor as the
    point estimate) and ``margin_to_budget`` = budget - ratio, so drift
    toward the budget is visible across benches BEFORE a hard failure
    (round-4 verdict: worst observed seed sat at 2.25 of 2.5 with no
    visibility). ``flip_ratio_ci_high`` > budget with ``passed`` still true
    means the pass is not statistically resolved at this n."""
    n = int(t32.shape[0])
    k_bf16 = int((t32 != t16).sum())
    k_int8 = int((t32 != tq).sum())
    flip_bf16 = k_bf16 / n
    flip_int8 = k_int8 / n
    # +1 pseudo-flip in the denominator guards div-by-zero on tiny sets.
    floor = 1.0 / n
    ratio = flip_int8 / max(flip_bf16, floor)
    lo_q, hi_q = _wilson(k_int8, n)
    lo_b, hi_b = _wilson(k_bf16, n)
    ratio_lo = lo_q / max(hi_b, floor)
    ratio_hi = hi_q / max(lo_b, floor)
    return {
        "n": n,
        "flips_bf16": k_bf16,
        "flips_int8": k_int8,
        "flip_bf16_vs_f32": float(flip_bf16),
        "flip_int8_vs_f32": float(flip_int8),
        "flip_bf16_ci95": [float(lo_b), float(hi_b)],
        "flip_int8_ci95": [float(lo_q), float(hi_q)],
        "flip_ratio": float(ratio),
        "flip_ratio_ci_low": float(ratio_lo),
        "flip_ratio_ci_high": float(ratio_hi),
        "max_flip_ratio": float(max_flip_ratio),
        "margin_to_budget": float(max_flip_ratio - ratio),
        "agreement_int8_vs_bf16": float((t16 == tq).mean()),
        "min_cosine_int8_vs_f32": float(cos_q.min()),
        "passed": bool(ratio <= max_flip_ratio),
    }


def _flip_stats(ff32, fbf, fq, classifier, max_flip_ratio: float) -> Dict[str, float]:
    """:func:`_flip_verdict` from three feature banks + a classifier."""
    t32 = (100.0 * ff32 @ classifier).argmax(-1)
    t16 = (100.0 * fbf @ classifier).argmax(-1)
    tq = (100.0 * fq @ classifier).argmax(-1)
    cos_q = (ff32 * fq).sum(-1)
    return _flip_verdict(t32, t16, tq, cos_q, max_flip_ratio)


def frontend_noise_floor_gate(
    params,
    cfg: CLIPConfig,
    images_u8_src: np.ndarray,
    classifier: np.ndarray,
    calibrate_n: int = 128,
    batch_size: int = 256,
    max_flip_ratio: float = 2.5,
    a_scales=None,
    front_end: str = "planar",
) -> Dict[str, float]:
    """:func:`noise_floor_gate` with the RESIZE front-end inside every path —
    gates the exact graph bench.py's int8 headline measures, end to end from
    dataset-native-resolution uint8 (reference clip.py:76-87 preprocess
    semantics):

      f32:  f32 resize+normalize          -> f32 tower
      bf16: shipped bf16-out preprocess   -> bf16 tower
      int8: ``front_end="planar"``: planar fused front-end (bf16 resize ->
            int8 patches, ops.quant.make_planar_front_end) -> int8 tower;
            ``front_end="nhwc"``: shipped bf16 NHWC preprocess ->
            ops.quant.encode_image_q (patchify + static-scale quantize in
            the tower) — the round-2 headline graph, kept gateable so the
            two candidates are always comparable on one protocol.

    Statistic stability (scripts/image_gate_stability.py): n=768 puts
    single-digit flip counts in both numerator and denominator — the ratio
    that failed round 3 at 2.6 (13 vs 5 flips) is inside that protocol's
    noise. Gate at n>=4096 (the text gate's proven protocol). MEASURED
    (IMAGE_GATE_STABILITY.json, 5 seeds x n=4096, v5e): per-seed ratios
    1.714/1.941/1.791/2.250/1.706, pooled 333/178 flips over 20,480
    images = ratio 1.871 — every seed passes at 2.5, and the planar and
    NHWC front-ends give BIT-IDENTICAL flip statistics (same math,
    different layout), so the round-3 failure was sampling noise, not a
    planar-front-end accuracy cost.

    Mixer towers only (the planar patch path). images_u8_src: [N, H, W, 3]
    at source resolution (e.g. 256px)."""
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess
    from clip_mixer_tpu.ops.quant import (
        calibrate_vision_tower,
        encode_image_q,
        encode_image_q_patches,
        make_planar_front_end,
        quantize_vision_tower,
    )

    assert not cfg.use_transformer and not cfg.is_resnet, "planar front-end: mixer towers"
    assert front_end in ("planar", "nhwc"), front_end
    cfg32 = cfg.replace(compute_dtype="float32")
    hw = images_u8_src.shape[1:3]
    pre32 = make_batch_preprocess(hw, cfg.image_resolution, normalize=True, dtype=jnp.float32)
    pre = make_batch_preprocess(
        hw, cfg.image_resolution, normalize=True, dtype=jnp.dtype(cfg.compute_dtype)
    )

    f_f32 = jax.jit(lambda p, x: clip_model.l2_normalize(clip_model.encode_image(p, cfg32, pre32(x))))
    f_bf16 = jax.jit(lambda p, x: clip_model.l2_normalize(clip_model.encode_image(p, cfg, pre(x))))

    if a_scales is None:
        scales = jax.jit(lambda p, x: calibrate_vision_tower(p, cfg, x))(
            params, pre(jnp.asarray(images_u8_src[:calibrate_n]))
        )
    else:
        scales = a_scales
    qparams = jax.jit(lambda p, s: quantize_vision_tower(p, cfg, s))(params, scales)
    if front_end == "planar":
        front = make_planar_front_end(cfg, hw, scales["patch"])
        f_int8 = jax.jit(
            lambda p, x: clip_model.l2_normalize(encode_image_q_patches(p, cfg, front(x)))
        )
    else:
        f_int8 = jax.jit(
            lambda p, x: clip_model.l2_normalize(encode_image_q(p, cfg, pre(x)))
        )

    ff32 = _batched_feats(f_f32, params, images_u8_src, batch_size)
    fbf = _batched_feats(f_bf16, params, images_u8_src, batch_size)
    fq = _batched_feats(f_int8, qparams, images_u8_src, batch_size)
    return _flip_stats(ff32, fbf, fq, classifier, max_flip_ratio)


def text_noise_floor_gate(
    params,
    cfg: CLIPConfig,
    texts: np.ndarray,
    image_bank: np.ndarray,
    calibrate_n: int = 128,
    batch_size: int = 256,
    max_flip_ratio: float = 2.5,
    a_scales=None,
) -> Dict[str, float]:
    """The noise-floor gate for the TEXT tower (same budget logic as
    :func:`noise_floor_gate`): each tokenized text retrieves its top-1 image
    from a float image-feature bank ``image_bank`` [embed_dim, M] — the
    text-side analogue of the class-prompt classifier — and the int8 path's
    retrieval flip rate vs f32 must stay within ``max_flip_ratio`` times the
    flip rate bf16 numerics already introduce. ``a_scales``: gate these
    shipped scales instead of self-calibrating on the first texts.

    Stability (scripts/text_gate_stability.py, measured on v5e 2026-08-19):
    the round-2 statistic at n=768 swung 0.0<->1.78 across identical runs
    (single-digit flip counts). At the fixed-seed n=4096 protocol bench.py
    now uses, five runs measured flip_ratio 1.0 / 1.0 / 1.0 / 1.0 / 1.0
    (flip_int8_vs_f32 = 1/4096 each run, flip_bf16_vs_f32 = 0) — spread 0.0,
    under the <0.3 acceptance bar."""
    cfg32 = cfg.replace(compute_dtype="float32")
    f_f32 = jax.jit(lambda p, t: clip_model.l2_normalize(clip_model.encode_text(p, cfg32, t)))
    f_bf16 = jax.jit(lambda p, t: clip_model.l2_normalize(clip_model.encode_text(p, cfg, t)))

    calibrate, quantize, encode_q = text_quant_fns(cfg)
    if a_scales is None:
        scales = jax.jit(lambda p, t: calibrate(p, cfg, t))(params, jnp.asarray(texts[:calibrate_n]))
    else:
        scales = a_scales
    qparams = jax.jit(lambda p, s: quantize(p, cfg, s))(params, scales)
    f_int8 = jax.jit(lambda p, t: clip_model.l2_normalize(encode_q(p, cfg, t)))

    ff32 = _batched_feats(f_f32, params, texts, batch_size)
    fbf = _batched_feats(f_bf16, params, texts, batch_size)
    fq = _batched_feats(f_int8, qparams, texts, batch_size)

    t32 = (100.0 * ff32 @ image_bank).argmax(-1)
    t16 = (100.0 * fbf @ image_bank).argmax(-1)
    tq = (100.0 * fq @ image_bank).argmax(-1)
    cos_q = (ff32 * fq).sum(-1)
    return _flip_verdict(t32, t16, tq, cos_q, max_flip_ratio)
