"""Preflight: fast, hang-proof environment sanity checks before a run.

Composes the framework's own pieces into a go/no-go report (the reference
has nothing like this; its failures surfaced mid-job — e.g. the dataset
init prints at dataset.py:113,121-122 were its only early signal):

  1. tokenizer: vocab asset loads, a probe string round-trips
  2. C++ fast tokenizer: toolchain/compile status (warn-only; Python
     fallback is transparent)
  3. accelerator: device enumeration in a SUBPROCESS with a hard timeout,
     so a stalled remote tunnel reports FAIL instead of hanging preflight
  4. compile cache dir writable
  5. --data: shard glob matches, first shard opens, first sample decodes
  6. --preset/--devices/--global-batch: a parallelism plan fits --hbm-gib
     (utils/memory.suggest)
  7. --full: 2-step CPU training smoke on a tiny config (Trainer +
     checkpoint + export end-to-end)

Usage:
    python scripts/preflight.py [--data '/data/shards/*.tar']
                                [--preset mixer-b32 --devices 8
                                 --global-batch 8192 --hbm-gib 16]
                                [--device-timeout 60] [--full]

Exit code: number of FAILed checks (0 = go).
"""

import argparse
import glob
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Every in-process check is host-only; the real accelerator is probed in a
# subprocess (check 3) so a wedged tunnel cannot hang this process.
jax.config.update("jax_platforms", "cpu")

_RESULTS = []


def report(name: str, ok, detail: str = ""):
    status = {True: "PASS", False: "FAIL", None: "warn"}[ok]
    _RESULTS.append((name, ok))
    print(f"[{status}] {name}" + (f": {detail}" if detail else ""))


def check_tokenizer():
    try:
        from clip_mixer_tpu.text import get_tokenizer, tokenize

        tok = get_tokenizer()
        arr = tokenize(["a photo of a cat"])
        assert arr.shape[0] == 1 and arr[0, 0] == tok.sot_id
        report("tokenizer + vocab asset", True, f"vocab {tok.vocab_size}")
    except Exception as e:
        report("tokenizer + vocab asset", False, repr(e))


def check_fast_tokenizer():
    try:
        from clip_mixer_tpu.text.fast import is_available

        if is_available():
            report("C++ fast tokenizer", True)
        else:
            report("C++ fast tokenizer", None, "unavailable; Python fallback in use")
    except Exception as e:
        report("C++ fast tokenizer", None, repr(e))


def check_devices(timeout_s: int, platform=None):
    # Platform override goes through jax.config inside the child — this
    # machine's sitecustomize pins JAX_PLATFORMS, so the env var is inert.
    code = (
        "import os, jax\n"
        "plat = os.environ.get('PREFLIGHT_PLATFORM')\n"
        "if plat:\n"
        "    jax.config.update('jax_platforms', plat)\n"
        "d = jax.devices(); print(f'{len(d)} x {d[0].platform}')"
    )
    env = dict(os.environ)
    if platform:
        env["PREFLIGHT_PLATFORM"] = platform
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            timeout=timeout_s,
            env=env,
        )
    except subprocess.TimeoutExpired:
        report(
            "accelerator devices",
            False,
            f"device enumeration hung past {timeout_s}s (stalled tunnel / driver?)",
        )
        return
    out = proc.stdout.decode(errors="replace").strip().splitlines()
    if proc.returncode == 0 and out:
        report("accelerator devices", True, out[-1])
    else:
        report("accelerator devices", False, f"rc={proc.returncode}")


def check_compile_cache():
    path = os.environ.get("JAX_CACHE", "/root/.jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".preflight")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        report("compile cache dir", True, path)
    except OSError as e:
        report("compile cache dir", False, f"{path}: {e}")


def check_data(pattern: str):
    shards = sorted(glob.glob(pattern))
    if not shards:
        report("data shards", False, f"no shards match {pattern}")
        return
    try:
        from clip_mixer_tpu.data.pipeline import TarShardSource

        src = TarShardSource(shards[:1], batch_size=1, image_size=64, context_length=77)
        batch = next(iter(src.iter_batches(0)))
        report(
            "data shards",
            True,
            f"{len(shards)} shard(s); first sample decodes to {batch['images'].shape[1:]}",
        )
    except Exception as e:
        report("data shards", False, f"first shard unreadable: {e!r}")


def check_capacity(preset: str, devices: int, global_batch: int, hbm_gib: float,
                   remat: bool = True):
    try:
        from clip_mixer_tpu.config import PRESETS
        from clip_mixer_tpu.utils.memory import suggest

        # price at the remat mode the run will actually use (train.py
        # defaults remat ON; --no-remat preflights price the stored set)
        best, _ = suggest(
            PRESETS[preset].replace(remat=remat), devices, global_batch,
            hbm_bytes=int(hbm_gib * (1 << 30)),
        )
        if best is None:
            report(
                "capacity plan",
                False,
                f"nothing fits {hbm_gib:g} GiB/chip — see scripts/memory_plan.py --suggest",
            )
        else:
            report(
                "capacity plan",
                True,
                f"{best.mode} fits: {best.total_bytes / (1 << 30):.2f} GiB/chip",
            )
    except Exception as e:
        report("capacity plan", False, repr(e))


def check_train_smoke():
    try:
        from clip_mixer_tpu.config import PRESETS, TrainConfig
        from clip_mixer_tpu.data.pipeline import SyntheticSource
        from clip_mixer_tpu.parallel.mesh import make_mesh
        from clip_mixer_tpu.train.trainer import Trainer

        cfg = PRESETS["mixer-debug"]  # the maintained CPU-smoke config
        tcfg = TrainConfig(global_batch_size=4, epochs=1, learning_rate=1e-3,
                           warmup_steps=1, checkpoint_every_steps=2)
        run = os.path.join(tempfile.mkdtemp(prefix="preflight_"), "run")
        tr = Trainer(
            cfg, tcfg,
            SyntheticSource(
                batch_size=4, image_size=cfg.image_resolution, n_batches=2,
                context_length=cfg.context_length,
            ),
            run, mesh=make_mesh(n_data=1, devices=jax.devices()[:1]),
        )
        tr.train()
        assert os.path.exists(os.path.join(run, "export", "config.json"))
        report("CPU train smoke", True, "2 steps + checkpoint + export")
    except Exception as e:
        report("CPU train smoke", False, repr(e))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default=None, help="shard glob to validate")
    p.add_argument("--preset", default=None, help="preset for the capacity check")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--global-batch", type=int, default=8192)
    p.add_argument("--hbm-gib", type=float, default=16.0)
    p.add_argument("--no-remat", action="store_true",
                   help="price capacity for a train.py --no-remat run "
                        "(stored activations, ~4-10x the remat working set)")
    p.add_argument("--device-timeout", type=int, default=60)
    p.add_argument("--platform", default=None,
                   help="probe this platform instead of the ambient one "
                        "(e.g. cpu when preflighting a local rehearsal)")
    p.add_argument("--full", action="store_true", help="add the CPU training smoke")
    args = p.parse_args(argv)

    check_tokenizer()
    check_fast_tokenizer()
    check_devices(args.device_timeout, args.platform)
    check_compile_cache()
    if args.data:
        check_data(args.data)
    if args.preset:
        check_capacity(args.preset, args.devices, args.global_batch, args.hbm_gib,
                       remat=not args.no_remat)
    if args.full:
        check_train_smoke()

    failures = sum(1 for _, ok in _RESULTS if ok is False)
    print(("NO-GO" if failures else "GO") + f": {failures} failed check(s)")
    return failures


if __name__ == "__main__":
    sys.exit(main())
