"""Serving-path benchmark: InferenceEngine on real TPU.

Measures the production serving machinery end to end — padded fixed-shape
encoders, bucket selection, micro-batching under concurrency, and the int8
swap — with pre-decoded uint8 arrays (JPEG decode is a host-sizing question,
scripts/bench_input.py).

Caveat on absolute latency: this machine reaches its TPU through the axon
tunnel (~200ms per dispatch round-trip), and every engine call blocks on a
round trip — so RAW per-call numbers are tunnel-dominated and their
bf16/int8 ratios are compressed toward 1. The numbers that transfer are the
``*_rtt_corrected`` throughputs: per-call overhead is estimated from the
smallest bucket (device time there is <1ms, so its latency ≈ RTT) and
subtracted before computing imgs/sec — the differential method bench.py's
loop-carried chains implement on-device.

Usage: python scripts/bench_serving.py   (one JSON line)
"""

import json
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def pct(v, q):
    return float(np.percentile(np.asarray(v), q))


def main():
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.serving import InferenceEngine

    cfg = PRESETS["mixer-b32"]
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    engine = InferenceEngine(params, cfg, batch_buckets=(8, 32, 128))

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (128, 224, 224, 3), dtype=np.uint8)

    out = {}
    for mode in ("bf16", "int8"):
        if mode == "int8":
            engine.enable_int8(imgs, sample_texts=["a photo of a cat", "a dog"])
        # warm all buckets + the micro-batcher thread (its spin-up must not
        # land inside the first mode's timed coalesced loop)
        for b in (8, 32, 128):
            engine.encode_image_arrays(imgs[:b])
        engine.encode_image_arrays(imgs[:1], coalesce=True)

        reps = 8
        # per-call overhead estimate: bucket-8 device time is <1ms, so its
        # per-call latency is ~the tunnel RTT
        t0 = time.perf_counter()
        for _ in range(reps):
            engine.encode_image_arrays(imgs[:8])
        rtt = (time.perf_counter() - t0) / reps

        # batch throughput (bucket 128), amortised over several calls
        t0 = time.perf_counter()
        for _ in range(reps):
            engine.encode_image_arrays(imgs)
        dt = time.perf_counter() - t0
        per_call = dt / reps
        out[f"{mode}_batch128_imgs_per_sec"] = round(reps * 128 / dt, 1)
        out[f"{mode}_call_overhead_ms"] = round(rtt * 1e3, 1)
        if per_call > rtt:
            out[f"{mode}_batch128_imgs_per_sec_rtt_corrected"] = round(
                128 / (per_call - rtt), 1
            )

        # coalesced single-image requests: 16 threads x 8 requests
        lat = []
        def worker():
            for i in range(8):
                t = time.perf_counter()
                engine.encode_image_arrays(imgs[i % 128 : i % 128 + 1], coalesce=True)
                lat.append(time.perf_counter() - t)
        threads = [threading.Thread(target=worker) for _ in range(16)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        out[f"{mode}_coalesced_reqs_per_sec"] = round(128 / dt, 1)
        out[f"{mode}_coalesced_p50_ms"] = round(pct(lat, 50) * 1e3, 1)
        out[f"{mode}_coalesced_p99_ms"] = round(pct(lat, 99) * 1e3, 1)

        # text path (tokenize + encode), batch of 64 prompts
        prompts = [f"a photo of object number {i}" for i in range(64)]
        engine.encode_text(prompts)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            engine.encode_text(prompts)
        out[f"{mode}_text64_texts_per_sec"] = round(reps * 64 / (time.perf_counter() - t0), 1)

    out["note"] = (
        "every engine call ships its uint8 inputs (~19MB at batch 128) "
        "through the axon tunnel, so even *_rtt_corrected numbers remain "
        "TRANSFER-bound on this machine (measured: the bucket-8 overhead "
        "estimate itself swings 2x run to run). This script validates the "
        "serving MACHINERY under concurrency; device-side encoder throughput "
        "is bench.py's loop-carried measurement (33-35k imgs/s int8)."
    )
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
