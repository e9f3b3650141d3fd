"""Freeze a model into a self-contained serving directory (clip_mixer_tpu.aot).

The JAX analogue of the reference's TorchScript serving archives
(clip.py:95-195, jit=True): per-bucket encoder programs are lowered to
StableHLO at export time and run as recorded — serving hosts never re-trace
model code.

Usage:
    python scripts/export_servable.py --model outputs/run/export --out srv/
    python scripts/export_servable.py --model mixer-b32 --out srv/ \\
        --buckets 1,8,32,128 --int8 scales.npz --platforms tpu

Then: `clip_mixer_tpu.aot.load_servable("srv/")` -> InferenceEngine, or any
plain `clip_mixer_tpu.load("srv/")` (the dir is a save_pretrained superset).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="preset, OpenAI name, .pt, or checkpoint dir")
    p.add_argument("--out", required=True, help="output servable directory")
    p.add_argument("--buckets", default="1,8,32,128", help="comma-separated batch buckets")
    p.add_argument("--int8", default=None, metavar="CALIB_NPZ",
                   help="freeze the calibrated W8A8 encoders (artifact must hold both towers)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated jax.export targets (e.g. 'tpu' to lower for TPU "
                        "from a CPU host); default = this host's platform")
    p.add_argument("--all-devices", action="store_true",
                   help="record the programs data-parallel over every local device "
                        "(the serving --all-devices layout); load then requires "
                        "that many devices")
    p.add_argument("--platform", default=None,
                   help="force the HOST backend (e.g. cpu to lower without touching a "
                        "device tunnel; the JAX_PLATFORMS env var is inert once "
                        "sitecustomize has imported jax — this goes through jax.config)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import clip_mixer_tpu as clip
    from clip_mixer_tpu import aot

    params, cfg, _ = clip.load(args.model)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    platforms = None if args.platforms is None else tuple(args.platforms.split(","))
    mesh = None
    if args.all_devices:
        import numpy as np
        import jax
        from jax.sharding import Mesh

        if args.platforms:
            raise SystemExit(
                "--all-devices records the mesh from THIS host's visible devices; "
                "combining it with cross-platform --platforms would freeze the "
                "build host's device count, not the serving host's — export the "
                "mesh layout on a host shaped like the serving host instead"
            )
        if len(jax.local_devices()) == 1:
            print("warning: --all-devices on a 1-device host records a 1-device mesh")
        mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    aot.export_servable(
        params, cfg, args.out,
        batch_buckets=buckets, int8_calibration=args.int8, platforms=platforms, mesh=mesh,
    )
    kind = "int8 W8A8" if args.int8 else "float"
    print(f"froze {kind} serving programs for buckets {sorted(set(buckets))} -> {args.out}")


if __name__ == "__main__":
    main()
