"""Benchmark: Mixer-B/32 images/sec/chip on preprocess + encode_image.

This is the BASELINE.json metric: the full inference front-end — antialiased
bicubic 256->224 resize (dataset-native 256px input, generateDataset.sh:18)
fused with normalisation, then the Mixer vision tower — on one chip,
steady-state, calibrated-int8 W8A8 serving path as the headline with the bf16
path reported alongside.

Headline policy: the int8 number is the headline ONLY if it passes the
accuracy gate (evals/quant_gate.noise_floor_gate) — on a deterministic
synthetic image set at full model scale, the int8 path's top-1 flip rate vs
f32 must stay within 2.5x the flip rate bf16 numerics themselves introduce
(measured: bf16 flips ~0.9% vs f32 on this worst-case random-init set; the
reference's own fp16 deployment sits on the same noise floor). If the gate
fails, the bf16 number is the headline and the failure is recorded in
detail.

vs_baseline: the reference publishes NO absolute imgs/sec (BASELINE.md), so
the denominator is an analytic A100 estimate on identical work:
  FLOPs/img  = vision-tower forward + preprocess matmuls (computed below)
  A100 est.  = 312 TFLOP/s fp16 dense peak x 40% assumed inference MFU
MFU-assumption sensitivity (the denominator is self-chosen — README has the
discussion): at 30%/50% assumed A100 MFU the reported ratio scales by
40/30 = 1.333x / 40/50 = 0.8x; detail carries all three.

Also in detail: text-tower texts/sec and full train-step imgs/sec (batch
1024, remat), so round-over-round regressions are caught on more than one
path.

Methodology (see ~axon tunnel quirks): every throughput number comes from a
single jitted loop-carried fori_loop chain whose body perturbs the input with
the previous result (nothing is loop-invariant, no dispatch gaps measured),
timed as the slope between two loop lengths; scalars fetched via float().
The image-path headline is the MEDIAN of three such chains (detail carries
all three), absorbing the measured ±4% identical-code run spread.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/root/.jax_cache"))

MAX_FLIP_RATIO = 2.5  # int8 may add <= 1.5x the top-1 noise bf16 already has

# Chain-admission ceilings (imgs/sec): the architecture's speed-of-light
# accounting (README "ceiling" section) caps int8 at ~36.0k (channel-mix
# 8.8ms @ 329 TOP/s + token-mix 4.05ms + 1.4ms front-end floor) and bf16 at
# ~23.5k (channel-mix 16.8ms @ 88% MFU + token-mix + 2.0ms glue = 22.9ms
# measured e2e, ~21.3ms with zero glue). A measurement chain ABOVE physics
# is a tunnel artifact (observed: a 99,244 imgs/s "sample" in BENCH_r03 —
# 2.75x the ceiling — from a timing hiccup in the short-chain leg of the
# slope), not data; admitting it into the median poisons the record. 1.10x
# headroom: the accounting itself carries ~5% uncertainty.
SOL_INT8_IPS = 36000.0
SOL_BF16_IPS = 23500.0
SOL_HEADROOM = 1.10


def mixer_vision_flops_per_image(cfg) -> float:
    """Analytic forward FLOPs of preprocess + patchify + mixer tower + proj."""
    g = cfg.grid_size
    t = cfg.vision_tokens
    w = cfg.vision_width
    p = cfg.vision_patch_size
    res = cfg.image_resolution
    src = 256  # dataset-native input
    preprocess = 2 * res * src * src * 3 + 2 * res * res * src * 3  # two resize matmuls
    patchify = 2 * (g * g) * (p * p * 3) * w
    token_mix = 2 * (2 * w * t * 4 * t)  # in+out matmuls
    channel_mix = 2 * (2 * t * w * 4 * w)
    tower = cfg.vision_layers * (token_mix + channel_mix)
    proj = 2 * w * cfg.embed_dim
    return float(preprocess + patchify + tower + proj)


def _slope_time(run, n1=5, n2=45):
    """Per-iteration seconds as the slope between two chained loop lengths
    (the shared implementation — utils/profiling.slope_time)."""
    from clip_mixer_tpu.utils.profiling import slope_time

    return slope_time(run, n1, n2)


def _median_ips(run, batch, repeats=3, n1=5, n2=45, sol_cap=None, max_extra=4):
    """Median imgs/sec over ``repeats`` ADMISSIBLE measurement chains.

    Identical-code bench runs historically spread ±4% (README's five-run
    table: 32.5-35.3k); a single draw from that distribution is a noisy
    round-over-round record. The headline is therefore the median of three
    chains measured seconds apart, and the min/max band is self-reported in
    detail (run-to-run drift shows up as band width, not headline jitter).

    Admission (``sol_cap``): a chain implying throughput above the
    speed-of-light ceiling is physically impossible — a tunnel timing
    artifact, not a fast run — and is REJECTED and re-measured (up to
    ``max_extra`` extra chains) instead of averaged in. BENCH_r03 admitted
    a 99,244 imgs/s sample (2.75x the ceiling); median-of-3 survived it
    that time, but one more bad chain would have shipped garbage. Rejected
    values are returned for the record. If re-measures keep exceeding the
    cap (a systematically broken clock), the fallback is the MINIMUM of
    everything seen — the only direction a timing artifact cannot fake.
    """
    vals, rejected = [], []
    attempts = 0
    while len(vals) < repeats and attempts < repeats + max_extra:
        attempts += 1
        v = batch / _slope_time(run, n1, n2)
        if sol_cap is not None and v > sol_cap:
            rejected.append(round(v, 1))
            continue
        vals.append(v)
    if not vals:  # every chain exceeded physics: clock broken, take the min
        vals = [min(rejected)]
    vals = sorted(vals)
    return vals[len(vals) // 2], [round(v, 1) for v in vals], rejected


def main():
    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

    fast = os.environ.get("BENCH_FAST") == "1"  # iteration aid: image paths only

    cfg = PRESETS["mixer-b32"]
    # One jitted dispatch for the whole init: the axon tunnel has ~200ms
    # per-call latency, so eager init (~100 param ops) costs ~40s otherwise.
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)

    flops = mixer_vision_flops_per_image(cfg)
    a100_est = 312e12 * 0.40 / flops  # imgs/sec at 40% assumed MFU on an A100

    batch = 512
    rng = np.random.default_rng(0)
    pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16)
    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))

    # ---- bf16 image path -------------------------------------------------
    @jax.jit
    def chained(p, images_u8, n):
        def body(_, carry):
            perturbed = images_u8 + carry.astype(jnp.uint8)
            feats = clip_model.encode_image(p, cfg, pre(perturbed))
            return feats.astype(jnp.float32).mean() * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    bf16_ips, bf16_runs, bf16_rejected = _median_ips(
        lambda n: chained(params, images, jnp.int32(n)), batch,
        sol_cap=SOL_BF16_IPS * SOL_HEADROOM,
    )

    # ---- int8 calibrated image path (the serving headline) ---------------
    # Front-end: the planar fused resize->int8-patches graph (bf16 resize
    # matmuls in [B,3,H,W] layout, normalize + patch-scale quantize fused;
    # +2.4% e2e over the NHWC front-end whose second einsum had an N=3 MXU
    # axis — measured ablation in scripts/bench_frontend_variants.py).
    from clip_mixer_tpu.ops.quant import (
        calibrate_vision_tower,
        encode_image_q_patches,
        make_planar_front_end,
        quantize_vision_tower,
    )

    scales = jax.jit(lambda p, x: calibrate_vision_tower(p, cfg, x))(params, pre(images[:128]))
    qparams = jax.jit(lambda p, s: quantize_vision_tower(p, cfg, s))(params, scales)
    front = make_planar_front_end(cfg, (256, 256), scales["patch"])

    @jax.jit
    def chained_q(p, images_u8, n):
        def body(_, carry):
            f = encode_image_q_patches(p, cfg, front(images_u8 + carry.astype(jnp.uint8)))
            return f.astype(jnp.float32).mean() * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    int8_ips, int8_runs, int8_rejected = _median_ips(
        lambda n: chained_q(qparams, images, jnp.int32(n)), batch,
        sol_cap=SOL_INT8_IPS * SOL_HEADROOM,
    )

    # ---- int8 accuracy gate: zero-shot top-1 agreement at full scale -----
    gate = None
    text_ips = None
    text_int8_ips = None
    text_gate = None
    train_ips = None
    if not fast:
        from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
        from clip_mixer_tpu.evals.quant_gate import (
            build_float_classifier,
            frontend_noise_floor_gate,
            synthetic_images,
        )

        # 256px gate images: the gate covers the EXACT headline graph end to
        # end (planar fused front-end + int8 tower), resize included.
        # Gate-statistic stability: round 3's gate FAILED at n=768 on
        # 13-vs-5 flip counts — pure sampling noise. IMAGE_GATE_STABILITY
        # .json (5 independent 4096-image seeds, both front-ends) shows the
        # true ratio is ~1.87 pooled over 20,480 images (per-seed spread
        # 1.71..2.25, every seed passing at 2.5), and that planar and NHWC
        # front-ends produce IDENTICAL flip statistics — same math,
        # different layout. n=4096 matches the text gate's proven protocol.
        gate_imgs = synthetic_images(4096, 256, seed=1)
        w = build_float_classifier(
            params, cfg, IMAGENET_CLASSNAMES[:64], PROMPT_TEMPLATES[:4], batch_size=256
        )
        gate = frontend_noise_floor_gate(
            params, cfg, gate_imgs, w, calibrate_n=128, batch_size=256,
            max_flip_ratio=MAX_FLIP_RATIO,
        )

        # ---- text tower texts/sec (bf16) ---------------------------------
        tbatch = 2048
        texts = np.zeros((tbatch, cfg.context_length), np.int32)
        texts[:, 0] = 49406
        texts[:, 1:8] = rng.integers(1, 49000, (tbatch, 7))
        texts[:, 8] = 49407
        texts_j = jnp.asarray(texts)

        @jax.jit
        def chained_t(p, toks, n):
            def body(_, carry):
                perturbed = (toks + carry.astype(jnp.int32)) % cfg.vocab_size
                f = clip_model.encode_text(p, cfg, perturbed)
                return (f.astype(jnp.float32).mean() * 1e-9).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        text_ips = tbatch / _slope_time(lambda n: chained_t(params, texts_j, jnp.int32(n)), 5, 45)

        # ---- text tower texts/sec (calibrated int8, mixer path) -----------
        from clip_mixer_tpu.ops.quant import calibrate_text_tower, encode_text_q, quantize_text_tower

        t_scales = jax.jit(lambda p, t: calibrate_text_tower(p, cfg, t))(params, texts_j[:256])
        tq = jax.jit(lambda p, s: quantize_text_tower(p, cfg, s))(params, t_scales)

        @jax.jit
        def chained_tq(p, toks, n):
            def body(_, carry):
                perturbed = (toks + carry.astype(jnp.int32)) % cfg.vocab_size
                f = encode_text_q(p, cfg, perturbed)
                return (f.astype(jnp.float32).mean() * 1e-9).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        text_int8_ips = tbatch / _slope_time(lambda n: chained_tq(tq, texts_j, jnp.int32(n)), 5, 45)

        # ---- text int8 accuracy gate (same noise-floor framing) ----------
        # The int8 text number above is only as good as its accuracy: run
        # the retrieval-flip gate every bench so a text-quant regression is
        # caught here, not only by the one-off full-scale measurement in
        # README. Bank = f32 features of the deterministic synthetic image
        # set; texts = the worst-case random-token batch measured above.
        from clip_mixer_tpu.evals.quant_gate import text_noise_floor_gate
        from clip_mixer_tpu.ops.preprocess import normalize_images

        # Gate-statistic stability: at n=768 the flip COUNTS are single
        # digits, so the ratio (int8 flips / max(bf16 flips, 1/n)) swung
        # 0.0<->1.78 across identical runs (README round-2 table). A
        # dedicated fixed-seed 4096-text set with a 512-image bank puts
        # tens of flips in both numerator and denominator; the 5-run
        # spread table lives in quant_gate.text_noise_floor_gate's
        # docstring.
        gate_rng = np.random.default_rng(42)
        n_gate_texts = 4096
        gate_texts = np.zeros((n_gate_texts, cfg.context_length), np.int32)
        gate_texts[:, 0] = 49406
        gate_texts[:, 1:8] = gate_rng.integers(1, 49000, (n_gate_texts, 7))
        gate_texts[:, 8] = 49407
        bank_imgs = synthetic_images(512, cfg.image_resolution, seed=2)
        cfg32 = cfg.replace(compute_dtype="float32")
        bank = np.asarray(
            jax.jit(
                lambda p, x: clip_model.l2_normalize(
                    clip_model.encode_image(p, cfg32, normalize_images(x, dtype="float32"))
                )
            )(params, jnp.asarray(bank_imgs)),
            np.float32,
        )
        text_gate = text_noise_floor_gate(
            params, cfg, gate_texts, bank.T, calibrate_n=128, batch_size=512,
            max_flip_ratio=MAX_FLIP_RATIO,
        )

        # ---- full train step imgs/sec (batch 1024, remat) ----------------
        from clip_mixer_tpu.ops.losses import info_nce
        from clip_mixer_tpu.train.optimizer import make_optimizer
        from clip_mixer_tpu.utils.profiling import chained_train_time

        tcfg = TrainConfig()
        rcfg = cfg.replace(remat=True)
        tb = 1024
        opt = make_optimizer(tcfg, total_steps=1000)
        opt_state = jax.jit(opt.init)(params)
        timgs = jnp.asarray(rng.integers(0, 256, (tb, 256, 256, 3), dtype=np.uint8))
        ttxt = jnp.asarray(
            np.concatenate([texts[:tb // 2], texts[:tb - tb // 2]])
        )

        def loss_and_grads(p, imgs_u8, toks):
            def loss_fn(pp):
                img, txt, scale = clip_model.forward(pp, rcfg, pre(imgs_u8), toks)
                return info_nce(img, txt, scale)
            return jax.value_and_grad(loss_fn)(p)

        train_ips = tb / chained_train_time(
            params, opt_state, opt, tcfg.logit_scale_max, loss_and_grads, (timgs, ttxt)
        )

    # ---- headline selection ----------------------------------------------
    gate_ok = gate is not None and gate["passed"]
    if fast:
        gate_ok = False  # no gate run -> no int8 headline
    headline = int8_ips if gate_ok else bf16_ips
    which = "int8-calibrated" if gate_ok else "bf16"

    print(
        json.dumps(
            {
                "metric": f"mixer-b32 preprocess+encode_image imgs/sec/chip ({which}, 256px uint8 in)",
                "value": round(headline, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(headline / a100_est, 3),
                "detail": {
                    "bf16_imgs_per_sec": round(bf16_ips, 1),
                    "int8_imgs_per_sec": round(int8_ips, 1),
                    # value = median of these three ADMITTED chains; band is
                    # min..max; *_rejected = chains above the speed-of-light
                    # cap, re-measured rather than averaged in
                    "bf16_runs": bf16_runs,
                    "int8_runs": int8_runs,
                    "bf16_rejected_chains": bf16_rejected,
                    "int8_rejected_chains": int8_rejected,
                    "chain_admission": {
                        "sol_cap_bf16": SOL_BF16_IPS * SOL_HEADROOM,
                        "sol_cap_int8": SOL_INT8_IPS * SOL_HEADROOM,
                        # band width of admitted chains, as a fraction of the
                        # median — the self-reported run-to-run drift
                        "bf16_spread": round((max(bf16_runs) - min(bf16_runs)) / bf16_ips, 4),
                        "int8_spread": round((max(int8_runs) - min(int8_runs)) / int8_ips, 4),
                    },
                    "int8_accuracy_gate": gate,
                    "int8_gate_scope": "256px planar front-end + tower (the measured graph)",
                    "encode_text_texts_per_sec_bf16": round(text_ips, 1) if text_ips else None,
                    "encode_text_texts_per_sec_int8": round(text_int8_ips, 1) if text_int8_ips else None,
                    "text_int8_accuracy_gate": text_gate,
                    "train_step_imgs_per_sec_b1024_remat": round(train_ips, 1) if train_ips else None,
                    "batch": batch,
                    "flops_per_image": flops,
                    "a100_estimate_imgs_per_sec": round(a100_est, 1),
                    "vs_baseline_sensitivity": {
                        "a100_mfu_30pct": round(headline / (312e12 * 0.30 / flops), 3),
                        "a100_mfu_40pct": round(headline / a100_est, 3),
                        "a100_mfu_50pct": round(headline / (312e12 * 0.50 / flops), 3),
                    },
                    "achieved_tflops_bf16": round(bf16_ips * flops / 1e12, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


def _run_supervised(max_attempts: int = 3, attempt_timeout_s: int = 2100) -> int:
    """Run the measurement in a child process with a hard deadline.

    The remote-compile tunnel fails two ways: it 500s/timeouts (an
    exception a retry fixes) and it HANGS — even jax.devices() blocks
    indefinitely — which no in-process handler can escape because the
    stall is inside a C call. The supervisor owns no JAX state, so it can
    always enforce the deadline (subprocess.run kills the child by pid on
    timeout) and retry with backoff. Hangs and tunnel-fault signatures
    retry; a deterministic child error (a bug in the measurement) fails
    fast rather than burning the retry budget. Only the child's final
    JSON line is relayed to stdout; everything else goes to stderr.
    """
    import subprocess
    import sys

    for attempt in range(1, max_attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=attempt_timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {attempt}/{max_attempts}: hung past "
                f"{attempt_timeout_s}s (tunnel stall), child killed",
                file=sys.stderr,
            )
            if attempt < max_attempts:
                time.sleep(30 * attempt)
            continue
        out = proc.stdout.decode(errors="replace")
        err = proc.stderr.decode(errors="replace")
        sys.stderr.write(err)
        json_lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        sys.stderr.write(out)
        print(f"bench attempt {attempt}/{max_attempts}: rc={proc.returncode}", file=sys.stderr)
        if not _is_tunnel_fault_text(out + err):
            _print_unreachable_json("deterministic child failure (not a tunnel fault)")
            return 1  # retrying would just repeat it
        if attempt < max_attempts:
            time.sleep(30 * attempt)
    _print_unreachable_json(
        f"TPU tunnel unreachable for all {max_attempts} attempts "
        f"(hang or tunnel-fault each time)"
    )
    return 1


def _print_unreachable_json(reason: str) -> None:
    """Terminal failure still emits ONE self-describing JSON line so the
    driver's record explains itself instead of being empty. value=0 is a
    sentinel, NOT a measurement — `detail.error` is authoritative; the last
    hardware-verified numbers live in README's performance table."""
    print(
        json.dumps(
            {
                # EXACT headline metric string (the gate-passing branch at
                # main()) so time-series keyed on the metric name mark the
                # series failed instead of filing a new one
                "metric": "mixer-b32 preprocess+encode_image imgs/sec/chip (int8-calibrated, 256px uint8 in)",
                "value": 0,
                "unit": "imgs/sec/chip",
                "vs_baseline": 0,
                "detail": {
                    "error": reason,
                    "note": "sentinel record — no measurement ran; see README perf "
                    "table for the last hardware-verified numbers "
                    "(33,271 img/s int8 = 1.714x at commit 58463bd lineage)",
                },
            }
        )
    )


def _is_tunnel_fault_text(s: str) -> bool:
    return any(
        k in s for k in ("remote_compile", "HTTP 50", "DEADLINE", "UNAVAILABLE", "timed out")
    )


if __name__ == "__main__":
    import sys

    if "--measure" in sys.argv:
        main()
    else:
        sys.exit(_run_supervised())
