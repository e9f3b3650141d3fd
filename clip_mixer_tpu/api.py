"""Public API: ``available_models`` / ``load`` / ``tokenize`` — the surface of
reference clip.py:90-238, returning JAX-native objects.

``load`` accepts:
* an OpenAI registry name ("ViT-B/32", "RN50", ...) — downloads the torch
  checkpoint with SHA256 verification (clip.py:31-73) and converts it;
* a local path: a torch ``.pt`` (JIT archive or state_dict) or a directory in
  our native format (orbax + config.json, written by ``save_pretrained``);
* a preset name ("mixer-b32", "transformer-b32") — randomly-initialised
  model with that architecture (the reference has no published Mixer
  checkpoint to download; training produces native-format ones).

Returns ``(params, cfg, preprocess)`` where preprocess is the host transform
PIL.Image -> HWC uint8 (the reference's quirk of deferring normalisation to
the model step is preserved: ``encode`` paths normalise in-graph). The
reference's ``jit`` flag is meaningless here — everything is XLA-compiled.
"""

from __future__ import annotations

import hashlib
import json
import os
import urllib.request
import warnings
from typing import Optional, Tuple

import jax

from clip_mixer_tpu.config import CLIPConfig, PRESETS
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.preprocess import make_transform
from clip_mixer_tpu.text import tokenize  # re-exported  # noqa: F401

# OpenAI checkpoint registry (clip.py:31-41). URL path component is the sha256.
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models():
    """Registry names plus local presets (clip.py:90-92)."""
    return list(_MODELS.keys()) + list(PRESETS.keys())


def _download(url: str, root: str, retries: int = 4) -> str:
    """SHA256-verified download to the cache dir (clip.py:44-73), hardened
    for real 338MB checkpoints: bytes stream into a ``.partial`` file, a
    dropped connection retries with an HTTP Range request resuming at the
    exact byte already on disk (the reference restarts from zero), progress
    goes to stderr (the reference's tqdm, clip.py:58-66, without the dep),
    and the finished file lands via atomic rename so a torn download can
    never be mistaken for a cached checkpoint."""
    import sys
    import time

    os.makedirs(root, exist_ok=True)
    expected_sha256 = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if hashlib.sha256(open(target, "rb").read()).hexdigest() == expected_sha256:
            return target
        warnings.warn(f"{target} exists with wrong SHA256; re-downloading")

    # Serialize concurrent downloaders (several processes per host is the
    # normal pod layout): both would otherwise interleave writes into the
    # same .partial. flock is advisory, local-FS only — exactly the cache
    # dir's scope. The loser wakes to a finished `target` and short-circuits.
    import fcntl

    lock = open(target + ".lock", "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    try:
        if os.path.isfile(target) and hashlib.sha256(
            open(target, "rb").read()
        ).hexdigest() == expected_sha256:
            return target
        return _download_locked(url, target, expected_sha256, retries)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()


def _download_locked(url: str, target: str, expected_sha256: str, retries: int) -> str:
    import sys
    import time

    partial = target + ".partial"
    delay = 2.0
    for attempt in range(retries + 1):
        done = os.path.getsize(partial) if os.path.exists(partial) else 0
        req = urllib.request.Request(url)
        if done:
            req.add_header("Range", f"bytes={done}-")
        try:
            with urllib.request.urlopen(req, timeout=60) as src:
                # A server that ignores Range answers 200 with the full
                # body — start the file over instead of corrupting it.
                resumed = done and getattr(src, "status", 200) == 206
                total = src.headers.get("Content-Length")
                total = int(total) + (done if resumed else 0) if total else None
                mode = "ab" if resumed else "wb"
                if not resumed:
                    done = 0
                last_print = 0
                with open(partial, mode) as out:
                    while True:
                        buf = src.read(1 << 16)
                        if not buf:
                            break
                        out.write(buf)
                        done += len(buf)
                        if done - last_print >= (8 << 20):
                            last_print = done
                            pct = f" ({100 * done / total:.0f}%)" if total else ""
                            print(f"\rdownloading {os.path.basename(target)}: "
                                  f"{done >> 20} MiB{pct}", end="", file=sys.stderr)
                if last_print:
                    print(file=sys.stderr)
            break
        except Exception as e:
            status = getattr(e, "code", None) or getattr(e, "status", None)
            if status == 416 and done:  # partial is already the full file
                break
            if attempt == retries:
                raise
            print(f"download interrupted at {done} bytes ({e}); resuming "
                  f"in {delay:.0f}s [{attempt + 1}/{retries}]", file=sys.stderr)
            time.sleep(delay)
            delay *= 2
    if hashlib.sha256(open(partial, "rb").read()).hexdigest() != expected_sha256:
        os.remove(partial)  # poisoned bytes would fail every future resume
        raise RuntimeError("Model downloaded but the SHA256 checksum does not match")
    os.replace(partial, target)
    return target


def _as_path(path: str):
    """epath.Path that keeps remote URIs (gs://...) intact — os.path.abspath
    would mangle the scheme into a local ./gs:/ directory."""
    from etils import epath

    return epath.Path(path if "://" in path else os.path.abspath(path))


def save_pretrained(params, cfg: CLIPConfig, path: str) -> None:
    """Native inference checkpoint: orbax params + config.json.

    Multi-host: call from EVERY process — the orbax save is a collective
    (it synchronizes all processes and writes from the primary host only);
    entering it on one rank deadlocks the others at the save barrier.
    config.json is written by process 0. Local and gs:// paths both work.
    """
    import dataclasses

    import orbax.checkpoint as ocp

    p = _as_path(path)
    if jax.process_index() == 0:
        p.mkdir(parents=True, exist_ok=True)
        (p / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p / "params", params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_pretrained(path: str) -> Tuple[dict, CLIPConfig]:
    import orbax.checkpoint as ocp

    import dataclasses

    p = _as_path(path)
    raw = json.loads((p / "config.json").read_text())
    if isinstance(raw.get("vision_layers"), list):
        raw["vision_layers"] = tuple(raw["vision_layers"])
    # Ignore config keys this version doesn't know (forward compatibility
    # with checkpoints written by newer versions).
    known = {f.name for f in dataclasses.fields(CLIPConfig)}
    cfg = CLIPConfig(**{k: v for k, v in raw.items() if k in known})
    ckptr = ocp.StandardCheckpointer()
    # Restore onto the CURRENT devices: a bare restore pins arrays to the
    # shardings recorded at save time, which fails when the checkpoint was
    # written on a different platform (e.g. saved on CPU, loaded on TPU).
    item = p / "params"
    meta = ckptr.metadata(item)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta.item_metadata if hasattr(meta, "item_metadata") else meta,
    )
    params = ckptr.restore(item, target)
    ckptr.close()
    return params, cfg


def load(
    name: str,
    download_root: Optional[str] = None,
    compute_dtype: Optional[str] = None,
    seed: int = 0,
):
    """Load a CLIP model. Returns (params, cfg, preprocess).

    See module docstring for accepted names. compute_dtype overrides the
    config's activation dtype (bf16 default; use "float32" for exact parity
    checks on CPU).
    """
    if name in _MODELS:
        path = _download(_MODELS[name], download_root or os.path.expanduser("~/.cache/clip"))
        from clip_mixer_tpu.models.convert import load_torch_checkpoint

        params, cfg = load_torch_checkpoint(path)
    elif "://" in name:  # remote URI (gs://, ...)
        if name.endswith((".pt", ".pth")):
            # Remote torch checkpoint: stage it locally (torch.load needs a
            # seekable file), then go through the normal converter. The cache
            # key is a hash of the FULL URI (basename alone would collide
            # across buckets/runs), and the copy goes through a temp file +
            # atomic rename so an interrupted stage can't leave a truncated
            # file that every later load() trusts. A re-uploaded remote
            # object is NOT revalidated — delete the cache entry to refresh.
            import hashlib

            from clip_mixer_tpu.models.convert import load_torch_checkpoint

            root = download_root or os.path.expanduser("~/.cache/clip")
            os.makedirs(root, exist_ok=True)
            uri_key = hashlib.sha256(name.encode()).hexdigest()[:16]
            local = os.path.join(root, f"{uri_key}-{os.path.basename(name)}")
            if not os.path.exists(local):
                tmp = f"{local}.tmp.{os.getpid()}"
                _as_path(name).copy(tmp)
                os.replace(tmp, local)
            params, cfg = load_torch_checkpoint(local)
        else:  # native export dir, e.g. gs://bucket/run/export
            try:
                params, cfg = load_pretrained(name)
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"Model {name} not found: remote path has no config.json, so it "
                    "is not a save_pretrained/export dir (for a remote torch "
                    "checkpoint use a .pt/.pth suffix); available models = "
                    f"{available_models()}"
                ) from e
    elif os.path.isdir(name):
        if os.path.exists(os.path.join(name, "config.json")):
            params, cfg = load_pretrained(name)
        else:  # Accelerate save_state dir (the reference's trained-checkpoint
            # format, validateModel.py:48-50) or other torch dump
            from clip_mixer_tpu.models.convert import load_torch_checkpoint

            params, cfg = load_torch_checkpoint(name)
    elif os.path.isfile(name):
        from clip_mixer_tpu.models.convert import load_torch_checkpoint

        params, cfg = load_torch_checkpoint(name)
    elif name in PRESETS:
        cfg = PRESETS[name]
        params = clip_model.init(jax.random.key(seed), cfg)
    else:
        raise RuntimeError(f"Model {name} not found; available models = {available_models()}")

    if compute_dtype is not None:
        cfg = cfg.replace(compute_dtype=compute_dtype)
    return params, cfg, make_transform(cfg.image_resolution)
