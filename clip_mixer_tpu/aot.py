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
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from clip_mixer_tpu.config import CLIPConfig

# version 1: the original layout; version 2 adds input_hw (device-side
# resize) — written ONLY when input_hw is set, so plain exports stay
# loadable by older deployments while an input_hw export fails cleanly
# there (a v1-only loader feeding 224px images into (b,256,256,3)
# programs would otherwise die with a confusing shape error at request
# time)
_MANIFEST_VERSION = 1
_SUPPORTED_MANIFEST_VERSIONS = (1, 2)


def _sdir(out_dir: str):
    """servable/ under out_dir, gs://-safe (api._as_path keeps the scheme)."""
    from clip_mixer_tpu.api import _as_path

    return _as_path(out_dir) / "servable"


def _struct_of(tree):
    # pure shape/dtype metadata: no jnp.asarray — that would round-trip
    # every leaf through the default device just to read a dtype
    def s(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(tuple(x.shape), jnp.dtype(x.dtype))
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree.map(s, tree)


def _checked_artifact(int8_calibration: str, cfg: CLIPConfig) -> dict:
    """Load + validate a calibration artifact for frozen int8 export."""
    from clip_mixer_tpu.ops import quant_io

    art = quant_io.load_calibration(int8_calibration)
    quant_io.check_cfg(art["cfg"], cfg)
    if art["image_scales"] is None or art["text_scales"] is None:
        raise ValueError(
            "servable int8 export needs a calibration artifact with BOTH "
            "towers (scripts/calibrate_int8.py writes one)"
        )
    return art


def _quantized_params(params, cfg: CLIPConfig, art: dict) -> Tuple[dict, dict]:
    """(image qparams, text qparams) re-derived from a calibration artifact
    (deterministic given params + scales — ops/quant_io.py)."""
    from clip_mixer_tpu.ops.quant import image_quant_fns, text_quant_fns

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
    mesh=None,
    input_hw=None,
) -> str:
    """Write a self-contained frozen-serving directory (see module doc):
    a save_pretrained checkpoint plus the recorded programs.

    int8_calibration: path to a quant_io artifact holding BOTH towers'
    scales — the exported programs are then the calibrated W8A8 encoders.
    platforms: jax.export target platforms (e.g. ``("tpu",)`` to lower for
    TPU from a CPU host); default = the exporting host's platform.
    mesh: optional jax.sharding.Mesh — programs are recorded data-parallel
    over it (params replicated, batch sharded over all axes, the
    InferenceEngine(mesh=) layout); load_servable then requires that many
    local devices and rebuilds the mesh.
    """
    from clip_mixer_tpu.api import save_pretrained

    if int8_calibration is not None:
        # validate BEFORE the (possibly multi-GB) checkpoint write so a bad
        # artifact doesn't leave a half-written export behind
        _checked_artifact(int8_calibration, cfg)
    save_pretrained(params, cfg, out_dir)
    freeze_programs(
        params, cfg, out_dir,
        batch_buckets=batch_buckets,
        int8_calibration=int8_calibration,
        platforms=platforms,
        mesh=mesh,
        input_hw=input_hw,
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
    mesh=None,
    input_hw=None,
) -> str:
    """Record just the ``servable/`` payload into an EXISTING
    save_pretrained directory (e.g. the Trainer's completion export) —
    pure local tracing/lowering, no collectives, so on a pod it is
    rank-gated by the caller."""
    from clip_mixer_tpu.api import _as_path
    from clip_mixer_tpu.serving import encoder_fns

    buckets = sorted(set(int(b) for b in batch_buckets))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_buckets must be positive ints, got {batch_buckets!r}")
    jit_kw = {}
    mesh_info = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        # the InferenceEngine(mesh=) layout: params replicated, batch
        # sharded over all axes, buckets rounded to device multiples
        rep = NamedSharding(mesh, PartitionSpec())
        shard = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
        n_dev = mesh.devices.size
        buckets = sorted({-(-b // n_dev) * n_dev for b in buckets})
        jit_kw = {"in_shardings": (rep, shard), "out_shardings": shard}
        mesh_info = {"axis_names": list(mesh.axis_names), "shape": list(mesh.devices.shape)}
    sdir = _sdir(out_dir)
    sdir.mkdir(parents=True, exist_ok=True)

    int8 = int8_calibration is not None
    # the ONE serving composition (serving.encoder_fns) — frozen-vs-live
    # bit-equality depends on both paths building from it
    image_fn, text_fn = encoder_fns(cfg, int8=int8, input_hw=input_hw)
    if int8:
        art = _checked_artifact(int8_calibration, cfg)
        img_params, txt_params = _quantized_params(params, cfg, art)
        (sdir / "calibration.npz").write_bytes(_as_path(int8_calibration).read_bytes())
    else:
        img_params = txt_params = params

    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    R, ctx = cfg.image_resolution, cfg.context_length
    ih, iw = tuple(input_hw) if input_hw is not None else (R, R)
    img_struct, txt_struct = _struct_of(img_params), _struct_of(txt_params)
    exported_platforms = None
    for b in buckets:
        img_batch = jax.ShapeDtypeStruct((b, ih, iw, 3), jnp.uint8)
        txt_batch = jax.ShapeDtypeStruct((b, ctx), jnp.int32)
        exp_i = jax_export.export(jax.jit(image_fn, **jit_kw), **kw)(img_struct, img_batch)
        exp_t = jax_export.export(jax.jit(text_fn, **jit_kw), **kw)(txt_struct, txt_batch)
        exported_platforms = list(exp_i.platforms)
        (sdir / f"image_{b}.bin").write_bytes(exp_i.serialize())
        (sdir / f"text_{b}.bin").write_bytes(exp_t.serialize())

    manifest = {
        "version": _MANIFEST_VERSION if input_hw is None else 2,
        "buckets": buckets,
        "int8": int8,
        "platforms": exported_platforms,
        "mesh": mesh_info,
        "input_hw": None if input_hw is None else [ih, iw],
        "jax_version": jax.__version__,
    }
    (sdir / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return out_dir


def load_servable(path: str, *, check_platform: bool = True):
    """Load a frozen-serving directory into an InferenceEngine that runs
    the RECORDED programs (no re-tracing of model code). Raises if `path`
    has no ``servable/`` payload — use plain clip_mixer_tpu.load then.

    check_platform: fail fast when the running backend is not among the
    platforms the programs were lowered for (otherwise the mismatch only
    surfaces as a per-request error inside the HTTP handler). Pass False
    to defer to call time, e.g. for a platform alias the check can't see.
    """
    from clip_mixer_tpu.api import load
    from clip_mixer_tpu.serving import InferenceEngine

    sdir = _sdir(path)
    mpath = sdir / "manifest.json"
    if not mpath.exists():
        raise FileNotFoundError(
            f"{path} has no servable/manifest.json — not an export_servable dir"
        )
    manifest = json.loads(mpath.read_text())
    if manifest.get("version") not in _SUPPORTED_MANIFEST_VERSIONS:
        raise ValueError(f"unsupported servable manifest version {manifest.get('version')!r}")
    backend = jax.default_backend()
    if check_platform and manifest["platforms"] and backend not in manifest["platforms"]:
        raise ValueError(
            f"servable programs were lowered for {manifest['platforms']} but this "
            f"process runs on {backend!r} — re-export with platforms=({backend!r},) "
            "or pass check_platform=False to defer to call time"
        )

    params, cfg, _ = load(str(path))
    mesh = None
    if manifest.get("mesh"):
        from jax.sharding import Mesh

        shape = tuple(manifest["mesh"]["shape"])
        n = int(np.prod(shape))
        devs = jax.devices()
        if len(devs) < n:
            raise ValueError(
                f"servable programs were recorded over a {shape} device mesh "
                f"({n} devices) but this process sees {len(devs)}"
            )
        mesh = Mesh(
            np.asarray(devs[:n]).reshape(shape), tuple(manifest["mesh"]["axis_names"])
        )
    input_hw = manifest.get("input_hw")
    engine = InferenceEngine(
        params, cfg, batch_buckets=tuple(manifest["buckets"]), mesh=mesh,
        input_hw=None if input_hw is None else tuple(input_hw),
    )

    if manifest["int8"]:
        from clip_mixer_tpu.ops import quant_io

        art = quant_io.load_calibration(str(sdir / "calibration.npz"))
        quant_io.check_cfg(art["cfg"], cfg)
        img_params, txt_params = _quantized_params(params, cfg, art)
    else:
        img_params = txt_params = params

    def _table(modality):
        return {
            b: jax_export.deserialize((sdir / f"{modality}_{b}.bin").read_bytes())
            for b in manifest["buckets"]
        }

    def _dispatch(progs):
        def fn(p, batch):
            b = int(batch.shape[0])
            if b not in progs:
                raise ValueError(f"no exported program for batch {b} (buckets {sorted(progs)})")
            return progs[b].call(p, batch)

        return fn

    # engine placement (replicated over the mesh when one is configured)
    engine._image_path = (_dispatch(_table("image")), engine._put_params(img_params))
    engine._text_path = (_dispatch(_table("text")), engine._put_params(txt_params))
    kind = "int8" if manifest["int8"] else "float"
    engine.path_kinds = {"image": kind, "text": kind}
    engine.frozen = True
    return engine
