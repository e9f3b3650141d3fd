"""Frozen serving programs via jax.export — the TorchScript-load analogue.

The reference's ``clip.load(name, jit=True)`` serves a frozen TorchScript
graph (clip.py:95-195): inference needs the serialized program, not the
model-definition code. This module is that capability the JAX way: each
serving entry point (text/image encoder, one per batch bucket, float or
calibrated int8) is lowered to StableHLO with :func:`jax.export.export` and
serialized next to the checkpoint. A server then runs the *recorded*
program — immune to model-code drift, with tracing/lowering paid at export
time (and, with ``platforms=``, lowerable for a device family the exporting
host doesn't have).

Layout written by :func:`export_servable` (a superset of the
``save_pretrained`` directory, so ``clip_mixer_tpu.load`` still accepts it):

    out_dir/
      config.json + checkpoint/...     # save_pretrained payload
      servable/manifest.json           # buckets, towers, int8, jax version
      servable/{text,image}_{B}.bin    # serialized jax.export programs
      servable/calibration.npz         # int8 scales (quant_io), if int8

:func:`load_servable` returns a regular :class:`serving.InferenceEngine`
whose dispatch tables are the deserialized programs — tokenization, bucket
padding, the micro-batcher, the zero-shot classifier and ``serve()`` all
work unchanged on top.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.preprocess import normalize_images

_MANIFEST_VERSION = 1


def _struct_of(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree)


def _encode_fns(cfg: CLIPConfig, int8: bool):
    """(image_fn, text_fn) with the SAME composition the live engine jits
    (serving.InferenceEngine): in-graph normalize + encode + l2-normalize."""
    if int8:
        from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns

        encode_image = image_quant_fns(cfg)[2]
        encode_text = text_quant_fns(cfg)[2]
    else:
        encode_image = clip_model.encode_image
        encode_text = clip_model.encode_text

    def image_fn(p, images_u8):
        images = normalize_images(images_u8, dtype=jnp.dtype(cfg.compute_dtype))
        return clip_model.l2_normalize(encode_image(p, cfg, images))

    def text_fn(p, tokens):
        return clip_model.l2_normalize(encode_text(p, cfg, tokens))

    return image_fn, text_fn


def _quantized_params(params, cfg: CLIPConfig, art: dict) -> Tuple[dict, dict]:
    """(image qparams, text qparams) re-derived from a calibration artifact
    (deterministic given params + scales — ops/quant_io.py)."""
    from clip_mixer_tpu.ops import quant_io
    from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns

    quant_io.check_cfg(art["cfg"], cfg)
    if art["image_scales"] is None or art["text_scales"] is None:
        raise ValueError(
            "servable int8 export needs a calibration artifact with BOTH "
            "towers (scripts/calibrate_int8.py writes one)"
        )
    qimg = image_quant_fns(cfg)[1](params, cfg, art["image_scales"])
    qtxt = text_quant_fns(cfg)[1](params, cfg, art["text_scales"])
    return qimg, qtxt


def export_servable(
    params,
    cfg: CLIPConfig,
    out_dir: str,
    *,
    batch_buckets: Sequence[int] = (1, 8, 32, 128),
    int8_calibration: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Write a self-contained frozen-serving directory (see module doc):
    a save_pretrained checkpoint plus the recorded programs.

    int8_calibration: path to a quant_io artifact holding BOTH towers'
    scales — the exported programs are then the calibrated W8A8 encoders.
    platforms: jax.export target platforms (e.g. ``("tpu",)`` to lower for
    TPU from a CPU host); default = the exporting host's platform.
    """
    from clip_mixer_tpu.api import save_pretrained

    save_pretrained(params, cfg, out_dir)
    freeze_programs(
        params, cfg, out_dir,
        batch_buckets=batch_buckets,
        int8_calibration=int8_calibration,
        platforms=platforms,
    )
    return out_dir


def freeze_programs(
    params,
    cfg: CLIPConfig,
    out_dir: str,
    *,
    batch_buckets: Sequence[int] = (1, 8, 32, 128),
    int8_calibration: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Record just the ``servable/`` payload into an EXISTING
    save_pretrained directory (e.g. the Trainer's completion export) —
    pure local tracing/lowering, no collectives, so on a pod it is
    rank-gated by the caller."""
    buckets = sorted(set(int(b) for b in batch_buckets))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_buckets must be positive ints, got {batch_buckets!r}")
    sdir = os.path.join(out_dir, "servable")
    os.makedirs(sdir, exist_ok=True)

    int8 = int8_calibration is not None
    image_fn, text_fn = _encode_fns(cfg, int8)
    if int8:
        from clip_mixer_tpu.ops import quant_io

        art = quant_io.load_calibration(int8_calibration)
        img_params, txt_params = _quantized_params(params, cfg, art)
        shutil.copyfile(int8_calibration, os.path.join(sdir, "calibration.npz"))
    else:
        img_params = txt_params = params

    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    R, ctx = cfg.image_resolution, cfg.context_length
    exported_platforms = None
    for b in buckets:
        img_batch = jax.ShapeDtypeStruct((b, R, R, 3), jnp.uint8)
        txt_batch = jax.ShapeDtypeStruct((b, ctx), jnp.int32)
        exp_i = jax_export.export(jax.jit(image_fn), **kw)(_struct_of(img_params), img_batch)
        exp_t = jax_export.export(jax.jit(text_fn), **kw)(_struct_of(txt_params), txt_batch)
        exported_platforms = list(exp_i.platforms)
        with open(os.path.join(sdir, f"image_{b}.bin"), "wb") as f:
            f.write(exp_i.serialize())
        with open(os.path.join(sdir, f"text_{b}.bin"), "wb") as f:
            f.write(exp_t.serialize())

    manifest = {
        "version": _MANIFEST_VERSION,
        "buckets": buckets,
        "int8": int8,
        "platforms": exported_platforms,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(sdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def load_servable(path: str):
    """Load a frozen-serving directory into an InferenceEngine that runs
    the RECORDED programs (no re-tracing of model code). Raises if `path`
    has no ``servable/`` payload — use plain clip_mixer_tpu.load then."""
    from clip_mixer_tpu.api import load
    from clip_mixer_tpu.serving import InferenceEngine

    sdir = os.path.join(path, "servable")
    mpath = os.path.join(sdir, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{path} has no servable/manifest.json — not an export_servable dir"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("version") != _MANIFEST_VERSION:
        raise ValueError(f"unsupported servable manifest version {manifest.get('version')!r}")

    params, cfg, _ = load(path)
    engine = InferenceEngine(params, cfg, batch_buckets=tuple(manifest["buckets"]))

    if manifest["int8"]:
        from clip_mixer_tpu.ops import quant_io

        art = quant_io.load_calibration(os.path.join(sdir, "calibration.npz"))
        img_params, txt_params = _quantized_params(params, cfg, art)
    else:
        img_params = txt_params = params

    def _table(modality):
        progs = {}
        for b in manifest["buckets"]:
            with open(os.path.join(sdir, f"{modality}_{b}.bin"), "rb") as f:
                progs[b] = jax_export.deserialize(f.read())
        return progs

    def _dispatch(progs):
        def fn(p, batch):
            b = int(batch.shape[0])
            if b not in progs:
                raise ValueError(f"no exported program for batch {b} (buckets {sorted(progs)})")
            return progs[b].call(p, batch)

        return fn

    engine._image_path = (_dispatch(_table("image")), jax.device_put(img_params))
    engine._text_path = (_dispatch(_table("text")), jax.device_put(txt_params))
    return engine
