"""One-command release artifact: calibrate -> gate -> freeze -> manifest.

Builds the directory a production serving fleet consumes, from any model
source, in one step:

    python scripts/release.py --model outputs/run/export --out release/ \\
        --data '/data/shards/*.tar' [--platforms tpu] [--all-devices]

Pipeline (each stage reuses the standalone tool/library it wraps):
  1. int8 calibration on real data  (scripts/calibrate_int8.py)
  2. accuracy gates on the SHIPPED scales — the noise-floor framing from
     evals/quant_gate for both towers; the release ABORTS if a gate fails
  3. frozen serving programs        (clip_mixer_tpu.aot.export_servable:
     per-bucket jax.export encoders, int8, optional device mesh/platforms)
  4. RELEASE.json                   (gates, buckets, provenance)

Serve with:  python -m clip_mixer_tpu.serving --model release/ ...  (live
jit over the checkpoint) or `aot.load_servable("release/")` (recorded
programs). `--no-int8` releases the float path (stages 1-2 skipped).

The reference ships raw Accelerate state dirs with no release procedure
(training/validateModel.py:48-50 reads them directly); this is the
deployment story its production users would need.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))  # sibling script imports


def verify(release_dir: str) -> None:
    """CD gate: prove a release dir actually serves before rollout — load
    the recorded programs on THIS host, pre-compile every bucket, run one
    inference per tower, and re-check the recorded gate verdicts. Raises
    SystemExit on any failure."""
    import numpy as np

    from clip_mixer_tpu import aot
    from clip_mixer_tpu.api import _as_path

    manifest = json.loads((_as_path(release_dir) / "RELEASE.json").read_text())
    bad_gates = [k for k, g in manifest.get("gates", {}).items() if not g.get("passed")]
    if bad_gates:
        raise SystemExit(f"VERIFY FAILED: RELEASE.json records failed gates {bad_gates}")
    engine = aot.load_servable(release_dir)  # platform + version checked here
    engine.warmup()  # every bucket, both towers — links all recorded programs
    R = engine.cfg.image_resolution
    img = engine.encode_image_arrays(np.zeros((1, R, R, 3), np.uint8))
    txt = engine.encode_text(["release verification probe"])
    if not (np.all(np.isfinite(img)) and np.all(np.isfinite(txt))):
        raise SystemExit("VERIFY FAILED: non-finite features from the recorded programs")
    kind = "int8" if manifest["int8"] else "float"
    print(
        f"VERIFY OK: {kind} release, buckets {manifest['buckets']}, "
        f"paths {engine.path_kinds}, frozen={engine.frozen}"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", help="preset, OpenAI name, .pt, or checkpoint dir")
    p.add_argument("--out", required=True, help="release directory")
    p.add_argument("--verify", action="store_true",
                   help="verify an EXISTING release dir (--out) on this host instead of "
                        "building one: load recorded programs, warm every bucket, probe "
                        "both towers, re-check gate verdicts")
    p.add_argument("--data", default=None, help="tar-shard glob for calibration samples")
    p.add_argument("--texts", default=None, help="caption file for text calibration")
    p.add_argument("--n", type=int, default=512, help="calibration sample count")
    p.add_argument("--buckets", default="1,8,32,128")
    p.add_argument("--no-int8", action="store_true", help="release the float path")
    p.add_argument("--skip-gate", action="store_true",
                   help="skip the accuracy gates (NOT recommended for real releases)")
    p.add_argument("--gate-n", type=int, default=768, help="gate sample count")
    p.add_argument("--max-flip-ratio", type=float, default=2.5)
    p.add_argument("--platforms", default=None, help="jax.export targets, comma-separated")
    p.add_argument("--all-devices", action="store_true",
                   help="record programs data-parallel over every local device")
    p.add_argument("--platform", default=None,
                   help="force the host backend (e.g. cpu) via jax.config")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.verify:
        verify(args.out)
        return
    if not args.model:
        p.error("--model is required (unless --verify)")

    import jax
    import jax.numpy as jnp

    import clip_mixer_tpu as clip
    from clip_mixer_tpu import aot
    from clip_mixer_tpu.api import _as_path
    from clip_mixer_tpu.models import clip as clip_model

    if args.all_devices and args.platforms:
        raise SystemExit(
            "--all-devices records the mesh from THIS host's visible devices; "
            "combining it with cross-platform --platforms would freeze the "
            "build host's device count, not the serving host's — export the "
            "mesh layout on a host shaped like the serving host instead"
        )

    out = _as_path(args.out)  # gs://-safe (epath keeps the scheme)
    out.mkdir(parents=True, exist_ok=True)
    params, cfg, _ = clip.load(args.model)
    gates = {}
    calib_path = None

    if not args.no_int8:
        # 1. calibration artifact (both towers) on the user's data —
        # reuses the already-loaded params (no second checkpoint restore)
        import calibrate_int8

        calib_path = str(out / "calibration.npz")
        calibrate_int8.run(
            params, cfg, calib_path, data=args.data, texts=args.texts, n=args.n
        )

        if not args.skip_gate:
            # 2. gate the SHIPPED scales (noise-floor framing, both towers)
            from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
            from clip_mixer_tpu.evals.quant_gate import (
                build_float_classifier,
                noise_floor_gate,
                synthetic_images,
                text_noise_floor_gate,
            )
            from clip_mixer_tpu.ops import quant_io
            from clip_mixer_tpu.ops.preprocess import normalize_images

            art = quant_io.load_calibration(calib_path)
            gate_imgs = synthetic_images(args.gate_n, cfg.image_resolution, seed=1)
            w = build_float_classifier(
                params, cfg, IMAGENET_CLASSNAMES[:64], PROMPT_TEMPLATES[:4], batch_size=256
            )
            gates["image"] = noise_floor_gate(
                params, cfg, gate_imgs, w, batch_size=256,
                max_flip_ratio=args.max_flip_ratio, a_scales=art["image_scales"],
            )
            print(f"image gate: flip_ratio={gates['image']['flip_ratio']:.2f} "
                  f"passed={gates['image']['passed']}")

            rng = np.random.default_rng(1)
            texts = np.zeros((args.gate_n, cfg.context_length), np.int32)
            texts[:, 0] = min(49406, cfg.vocab_size - 2)  # BOS (in-range for tiny vocabs)
            texts[:, 1:8] = rng.integers(1, min(49000, cfg.vocab_size - 2), (args.gate_n, 7))
            texts[:, 8] = min(49407, cfg.vocab_size - 1)  # EOS
            bank_imgs = synthetic_images(256, cfg.image_resolution, seed=2)
            cfg32 = cfg.replace(compute_dtype="float32")
            bank = np.asarray(
                jax.jit(
                    lambda pp, x: clip_model.l2_normalize(
                        clip_model.encode_image(pp, cfg32, normalize_images(x, dtype="float32"))
                    )
                )(params, jnp.asarray(bank_imgs)),
                np.float32,
            )
            gates["text"] = text_noise_floor_gate(
                params, cfg, texts, bank.T, batch_size=256,
                max_flip_ratio=args.max_flip_ratio, a_scales=art["text_scales"],
            )
            print(f"text gate: flip_ratio={gates['text']['flip_ratio']:.2f} "
                  f"passed={gates['text']['passed']}")
            failed = [k for k, g in gates.items() if not g["passed"]]
            if failed:
                raise SystemExit(
                    f"RELEASE ABORTED: accuracy gate failed for {failed} "
                    f"(flip ratio over {args.max_flip_ratio}); nothing frozen"
                )

    # 3. checkpoint + frozen programs
    buckets = tuple(int(b) for b in args.buckets.split(","))
    platforms = None if args.platforms is None else tuple(args.platforms.split(","))
    mesh = None
    if args.all_devices:
        from jax.sharding import Mesh

        if len(jax.local_devices()) == 1:
            print("warning: --all-devices on a 1-device host records a 1-device mesh")
        mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    aot.export_servable(
        params, cfg, str(out),
        batch_buckets=buckets, int8_calibration=calib_path,
        platforms=platforms, mesh=mesh,
    )

    # 4. release manifest — buckets/platforms read back from the RECORDED
    # servable manifest (mesh rounding may have adjusted the request)
    srv = json.loads((out / "servable" / "manifest.json").read_text())
    manifest = {
        "source": args.model,
        "int8": not args.no_int8,
        "gates": gates,
        "buckets": srv["buckets"],
        "platforms": srv["platforms"],
        "mesh_devices": None if mesh is None else int(mesh.devices.size),
        "calibration_samples": None if args.no_int8 else args.n,
        "jax_version": jax.__version__,
    }
    (out / "RELEASE.json").write_text(json.dumps(manifest, indent=1))
    kind = "float" if args.no_int8 else "int8"
    print(f"release ({kind}) written to {out} — serve with "
          f"aot.load_servable({str(out)!r}) or --model {out}")


if __name__ == "__main__":
    main()
