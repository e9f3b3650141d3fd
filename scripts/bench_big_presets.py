"""Validate the biggest presets on real hardware (round-4 verdict item 5).

TP/FSDP/accum and the capacity planner exist FOR vit-l14-336 (427M) and
rn50x64 (623M), but only B/32-scale models had ever touched the real chip.
Per preset this script measures, on one v5e:

  * bf16 inference (chained loop-carried timing, the bench.py methodology)
    and calibrated-int8 inference, WITH the noise-floor accuracy gate
    (Wilson CIs included) — the gate protocol of bench.py at a time-bounded
    n;
  * a REAL train step (parallel.train_step.make_train_step on a degenerate
    1-device mesh — the production step, BN train path included for the
    ResNet) at a batch chosen by the capacity planner (utils/memory.plan,
    largest power-of-two whose planned total fits 90% of 16GB, with accum
    where needed), compiled AND executed;
  * predicted vs actual HBM: the planner's total against the device's
    reported peak_bytes_in_use — the planner error bound the verdict asked
    to state.

One preset per process (peak-HBM counters and the tunnel's host-RSS leak
both reset with the process): the default --preset all re-execs itself.

Writes/merges BIG_PRESETS.json. Usage:
  python scripts/bench_big_presets.py [--preset vit-l14-336]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

PRESET_LIST = ("vit-l14-336", "rn50x64")


def run_one(preset: str, args) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
    from clip_mixer_tpu.evals.quant_gate import (
        build_float_classifier,
        noise_floor_gate,
        synthetic_images,
    )
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.quant import image_quant_fns
    from clip_mixer_tpu.utils.memory import param_shapes, plan
    from clip_mixer_tpu.utils.profiling import slope_time

    cfg = PRESETS[preset]
    out = {"preset": preset}
    t_start = time.time()

    params = jax.jit(lambda: clip_model.init(jax.random.key(0), cfg))()
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    out["params_m"] = round(n_params / 1e6, 1)

    res = cfg.image_resolution
    rng = np.random.default_rng(0)

    # ---- inference: bf16 vs calibrated int8 ------------------------------
    B = args.infer_batch
    imgs = jnp.asarray(rng.integers(0, 256, (B, res, res, 3), dtype=np.uint8))
    from clip_mixer_tpu.ops.preprocess import normalize_images

    dt = jnp.dtype(cfg.compute_dtype)

    def chained(encode, p):
        # imgs is an explicit jit ARGUMENT: closing over a device batch
        # inlines it as an HLO constant, and at --infer-batch 512 on a
        # 448px preset that ~300MB constant blows the remote-compile
        # tunnel's payload cap (HTTP 413; CLAUDE.md round-5 gotcha).
        @jax.jit
        def run(pp, base, n):
            def body(_, carry):
                x = normalize_images(base + carry.astype(jnp.uint8), dtype=dt)
                return encode(pp, x).astype(jnp.float32).mean() * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return slope_time(lambda n: run(p, imgs, jnp.int32(n)), 2, 8)

    t_bf16 = chained(lambda p, x: clip_model.encode_image(p, cfg, x), params)
    out["bf16_infer"] = {"batch": B, "ms": round(t_bf16 * 1e3, 1),
                         "imgs_per_sec": round(B / t_bf16, 1)}

    calibrate, quantize, encode_q = image_quant_fns(cfg)
    calib_imgs = normalize_images(imgs[: min(B, 128)], dtype=dt)
    scales = jax.jit(lambda p, x: calibrate(p, cfg, x))(params, calib_imgs)
    qparams = jax.jit(lambda p, s: quantize(p, cfg, s))(params, scales)
    t_int8 = chained(lambda p, x: encode_q(p, cfg, x), qparams)
    out["int8_infer"] = {"batch": B, "ms": round(t_int8 * 1e3, 1),
                         "imgs_per_sec": round(B / t_int8, 1),
                         "speedup_vs_bf16": round(t_bf16 / t_int8, 2)}
    del qparams

    # ---- accuracy gate (bench.py protocol, time-bounded n) ---------------
    gate_imgs = synthetic_images(args.gate_n, res, seed=1)
    w = build_float_classifier(params, cfg, IMAGENET_CLASSNAMES[:64],
                               PROMPT_TEMPLATES[:4], batch_size=64)
    out["int8_gate"] = noise_floor_gate(
        params, cfg, gate_imgs, w, calibrate_n=min(B, 128),
        batch_size=min(B, 128))

    # ---- planner-chosen train batch --------------------------------------
    # remat is the training default for every tower (per-bottleneck
    # jax.checkpoint for the ResNet); plan and run the same config
    cfg = cfg.replace(remat=True)
    shapes = param_shapes(cfg)
    budget = int(args.hbm_gib * (1 << 30) * 0.9)
    chosen = None
    for batch in (512, 256, 128, 64, 32, 16):
        for accum in (1, 2, 4, 8):
            if batch % accum:
                continue
            if cfg.is_resnet and accum > 1:
                continue  # BN batch stats forbid accum (train_step.py:223)
            pl = plan(cfg, "dp", 1, batch, accum_steps=accum, shapes=shapes)
            if pl.total_bytes <= budget:
                chosen = (batch, accum, pl)
                break
        if chosen:
            break
    if chosen is None:
        # The planner says single-chip training doesn't fit (rn50x64: the
        # un-rematted conv pyramid + 623M-param f32 state — FSDP/multi-chip
        # territory, which is what parallel/fsdp.py is for). Probe the
        # boundary anyway at the smallest batch so the planner's refusal is
        # tested against hardware, and record whichever way it goes.
        batch, accum = 8, 1
        pl = plan(cfg, "dp", 1, batch, accum_steps=accum, shapes=shapes)
        out["planner_verdict"] = (
            f"no single-chip plan fits (B=8 planned "
            f"{pl.total_bytes / (1 << 30):.1f} GiB vs {budget / (1 << 30):.1f} "
            "budget); attempting B=8 to test the boundary"
        )
    else:
        batch, accum, pl = chosen
    out["train_plan"] = {
        "batch": batch, "accum_steps": accum,
        "predicted_total_gib": round(pl.total_bytes / (1 << 30), 2),
        "predicted_breakdown_gib": {
            "params": round(pl.params_bytes / (1 << 30), 2),
            "opt": round(pl.opt_bytes / (1 << 30), 2),
            "grads": round(pl.grad_bytes / (1 << 30), 2),
            "activations": round(pl.act_bytes / (1 << 30), 2),
        },
    }

    # ---- the real production step on a degenerate 1-device mesh ----------
    from jax.sharding import Mesh

    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    tcfg = TrainConfig(global_batch_size=batch, accum_steps=accum)
    opt = make_optimizer(tcfg, total_steps=1000)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    step = make_train_step(cfg, tcfg, mesh, opt, accum_steps=accum)
    state = init_train_state(params, opt)
    batch_data = {
        "images": jnp.asarray(rng.integers(0, 256, (batch, res, res, 3),
                                           dtype=np.uint8)),
        "texts": jnp.asarray(rng.integers(1, cfg.vocab_size - 2,
                                          (batch, cfg.context_length),
                                          dtype=np.int32)),
    }
    try:
        t0 = time.perf_counter()
        state, metrics = step(state, batch_data)
        loss0 = float(metrics["loss"])
        compile_plus_first = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, metrics = step(state, batch_data)
            jax.block_until_ready(metrics["loss"])
            times.append(time.perf_counter() - t0)
        out["train_step"] = {
            "compile_plus_first_s": round(compile_plus_first, 1),
            "ms_per_step_dispatch_timed": round(min(times) * 1e3, 1),
            "imgs_per_sec_dispatch_timed": round(batch / min(times), 1),
            "loss_first": round(loss0, 3),
            "loss_finite": bool(np.isfinite(loss0)),
            "note": ("dispatch-timed through the tunnel (RTT-inflated lower "
                     "bound; the B/32 bench rows use chained timing — this "
                     "row is a fits-and-runs validation, not a headline)"),
        }
    except Exception as e:
        # an OOM here is itself evidence (records the planner's boundary)
        msg = str(e)
        out["train_step"] = {
            "error": f"{type(e).__name__}: {msg[:300]}",
            "oom": "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg,
        }

    # ---- predicted vs actual HBM ----------------------------------------
    try:
        ms = jax.devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        if peak:
            out["hbm"] = {
                "predicted_gib": round(pl.total_bytes / (1 << 30), 2),
                "actual_peak_gib": round(peak / (1 << 30), 2),
                "planner_error_pct": round(
                    100 * (pl.total_bytes - peak) / peak, 1),
                "note": ("peak is process-wide (includes the inference + "
                         "gate legs above if larger; train state dominates "
                         "at these sizes)"),
            }
        else:
            out["hbm"] = {"actual": "memory_stats empty on this backend"}
    except Exception as e:
        out["hbm"] = {"actual": f"memory_stats unavailable: {type(e).__name__}"}
    out["wall_seconds"] = round(time.time() - t_start, 1)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="all",
                   choices=("all",) + PRESET_LIST)
    p.add_argument("--infer-batch", type=int, default=64)
    p.add_argument("--gate-n", type=int, default=1024)
    p.add_argument("--hbm-gib", type=float, default=16.0)
    p.add_argument("--out", default=str(REPO / "BIG_PRESETS.json"))
    args = p.parse_args()

    if args.preset == "all":
        rc = 0
        for preset in PRESET_LIST:
            r = subprocess.run([sys.executable, __file__, "--preset", preset,
                                "--infer-batch", str(args.infer_batch),
                                "--gate-n", str(args.gate_n),
                                "--hbm-gib", str(args.hbm_gib),
                                "--out", args.out], cwd=REPO)
            rc |= r.returncode
        return rc

    result = run_one(args.preset, args)
    out_path = Path(args.out)
    doc = {}
    if out_path.exists():
        try:
            doc = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            doc = {}
    doc[args.preset] = result
    out_path.write_text(json.dumps(doc, indent=2))
    print(json.dumps({args.preset: {
        "bf16_ips": result.get("bf16_infer", {}).get("imgs_per_sec"),
        "int8_ips": result.get("int8_infer", {}).get("imgs_per_sec"),
        "gate_passed": result.get("int8_gate", {}).get("passed"),
        "train_batch": result.get("train_plan", {}).get("batch"),
        "train_ok": result.get("train_step", {}).get("loss_finite"),
    }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
