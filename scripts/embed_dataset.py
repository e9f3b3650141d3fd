"""Batch-encode a tar-shard dataset into a persistent retrieval bank.

Produces the ``.npz`` feature bank (``features`` [N, embed_dim] float32 +
``ids`` [N] sample keys) that serving loads for text→image semantic search:

    python scripts/embed_dataset.py --model outputs/run/export \\
        --data '/data/shards/*.tar' --out bank.npz [--int8 scales.npz]
    python -m clip_mixer_tpu.serving --model outputs/run/export \\
        --index bank.npz      # POST /retrieve now serves the bank

Ids are ``<shard-stem>/<member-key>`` (the webdataset {key}.jpg names), so
a retrieval hit maps straight back to the source record. Walks the tars
directly — offline tool, deterministic order, no resume contract — and
encodes through the same InferenceEngine the server runs (int8 and
``--all-devices`` mesh included), so bank features match serving features
bit-for-bit.

The reference has no retrieval/serving story (SURVEY §2.8); this tool
exists for the serving addition.
"""

import argparse
import glob
import io
import sys
import tarfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def iter_tar_images(shard_paths, image_size, limit=None, skipped=None, raw_hw=None):
    """Yield (id, preprocessed HWC uint8 image) from webdataset tars.
    Corrupt/undecodable members are skipped and counted in ``skipped``
    (a multi-hour bank build must not die on one truncated JPEG).

    ``raw_hw``: decode ONLY — yield source-resolution uint8 for an engine
    that resizes on device (InferenceEngine(input_hw=raw_hw)); members at
    any other resolution are skipped with a warning (the fixed-shape
    device program cannot take them)."""
    from clip_mixer_tpu.data.pipeline import _decode_one

    count = 0
    for shard in shard_paths:
        stem = Path(shard).stem
        with tarfile.open(shard) as tar:
            for member in tar:
                if not (member.isfile() and member.name.endswith(".jpg")):
                    continue
                try:
                    data = tar.extractfile(member).read()
                    if raw_hw is not None:
                        import io as _io

                        from PIL import Image

                        with Image.open(_io.BytesIO(data)) as im:
                            img = np.asarray(im.convert("RGB"), np.uint8)
                        if img.shape[:2] != tuple(raw_hw):
                            raise ValueError(
                                f"source is {img.shape[0]}x{img.shape[1]}, "
                                f"--input-size expects {raw_hw[0]}x{raw_hw[1]}"
                            )
                    else:
                        img = _decode_one(data, image_size)
                except Exception as e:
                    print(f"skipping {stem}/{member.name}: {type(e).__name__}: {e}")
                    if skipped is not None:
                        skipped.append(f"{stem}/{member.name}")
                    continue
                yield f"{stem}/{member.name[:-4]}", img
                count += 1
                if limit is not None and count >= limit:
                    return


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="preset, OpenAI name, .pt, or checkpoint dir")
    p.add_argument("--data", required=True, help="tar-shard glob")
    p.add_argument("--out", required=True, help="output .npz bank path")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--int8", default=None, metavar="CALIB_NPZ",
                   help="encode with the calibrated W8A8 path (calibration artifact)")
    p.add_argument("--all-devices", action="store_true",
                   help="shard encode batches over every local chip")
    p.add_argument("--limit", type=int, default=None, help="stop after N samples")
    p.add_argument("--input-size", type=int, default=None, metavar="N",
                   help="decode only on host and resize ON DEVICE from NxN "
                   "source images (must match a server run with the same "
                   "--input-size for bit-equal features)")
    p.add_argument("--platform", default=None,
                   help="force the JAX backend (jax.config; the env var is inert)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import os

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))

    import clip_mixer_tpu as clip
    from clip_mixer_tpu.api import _as_path
    from clip_mixer_tpu.serving import InferenceEngine, local_mesh

    shards = sorted(glob.glob(args.data))
    if not shards:
        p.error(f"--data matched no shards: {args.data}")

    params, cfg, _ = clip.load(args.model)
    mesh = local_mesh() if args.all_devices else None
    input_hw = (args.input_size, args.input_size) if args.input_size else None
    engine = InferenceEngine(params, cfg, batch_buckets=(args.batch,), mesh=mesh,
                             input_hw=input_hw)
    if args.int8:
        engine.enable_int8(calibration=args.int8)

    ids, feats, skipped = [], [], []
    batch_imgs, batch_ids = [], []

    def flush():
        if batch_imgs:
            feats.append(engine.encode_image_arrays(np.stack(batch_imgs)))
            ids.extend(batch_ids)
            batch_imgs.clear()
            batch_ids.clear()

    for sid, img in iter_tar_images(shards, cfg.image_resolution, limit=args.limit,
                                    skipped=skipped, raw_hw=input_hw):
        batch_ids.append(sid)
        batch_imgs.append(img)
        if len(batch_imgs) == args.batch:
            flush()
            print(f"embedded {len(ids)} samples", end="\r")
    flush()
    if not ids:
        p.error("no .jpg members found in the shards")

    import json

    from clip_mixer_tpu.ops import quant_io

    bank = np.concatenate(feats).astype(np.float32)
    # provenance: architecture fingerprint + numeric path, checked by
    # load_index_file — a bank from a different checkpoint/path must not
    # silently serve nonsense rankings
    meta = json.dumps(
        {"cfg": quant_io._cfg_dict(cfg), "path": engine.path_kinds["image"],
         "source": args.model, "input_hw": input_hw}
    )
    buf = io.BytesIO()
    np.savez(
        buf,
        features=bank,
        ids=np.array(ids),
        __meta__=np.frombuffer(meta.encode(), dtype=np.uint8),
    )
    _as_path(args.out).write_bytes(buf.getvalue())  # gs://-safe
    skip_note = f" ({len(skipped)} corrupt members skipped)" if skipped else ""
    print(f"wrote {len(ids)} x {bank.shape[1]} bank to {args.out}{skip_note}")


if __name__ == "__main__":
    main()
