"""Measured serving benchmark: the real HTTP server driven by concurrent clients.

Round-4 verdict item 1: the serving layer (micro-batching executor, buckets,
frozen programs, int8 swap, /metrics) had endpoints but no committed numbers.
This script produces them, end to end and honestly:

* every leg starts the REAL server CLI (``python -m clip_mixer_tpu.serving``)
  as a subprocess on the TPU chip and drives it with the stdlib client SDK
  (``clip_mixer_tpu.client.ServingClient``) from concurrent threads;
* request payloads are real JPEG bytes from the locally generated dress
  shards (server-side PIL decode + resize, the reference clip.py:76-87
  preprocess), captions from the same shards;
* legs: live-jit bf16, live-jit int8 (calibration artifact), frozen bf16 and
  frozen int8 (``aot.load_servable`` via the CLI's frozen auto-detect), plus
  a raw in-process engine baseline (no HTTP) for micro-batching efficiency,
  and cold-start probes (time-to-healthz + first-request compile tail,
  live vs frozen);
* per endpoint: client-observed p50/p99 latency + items/sec under
  concurrency, cross-checked against the server's own /metrics snapshot.

Environment caveat (same as bench.py): this host reaches its chip through
the axon tunnel (~0.2s per dispatch round trip, ~35MB/s effective transfer),
and serving calls block on round trips — absolute latencies here are
tunnel-dominated and represent a FLOOR for a host with local chips. The
machinery (coalescing, buckets, frozen programs) is what is being measured.

Usage: python scripts/serving_bench.py            # full, writes SERVING_BENCH.json
       python scripts/serving_bench.py --quick    # reduced request counts
"""

import argparse
import io
import json
import os
import signal
import socket
import subprocess
import sys
import tarfile
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from clip_mixer_tpu.client import ServingClient  # stdlib+numpy only, no jax

ASSETS = REPO / "outputs" / "serving_bench"
ENV = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.jax_cache")


def sh(cmd, log_name, timeout=1800):
    """Run a prep subprocess to completion, logging to ASSETS."""
    log = ASSETS / f"{log_name}.log"
    with open(log, "w") as f:
        print(f"[prep] {' '.join(map(str, cmd))}", flush=True)
        subprocess.run([str(c) for c in cmd], cwd=REPO, env=ENV, stdout=f,
                       stderr=subprocess.STDOUT, timeout=timeout, check=True)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def load_payloads(n_imgs=512, n_caps=256):
    """Real JPEG bytes + captions from the dress shards (synthetic JPEGs as
    fallback so the script runs anywhere)."""
    jpegs, caps = [], []
    shards = sorted(Path("/root/data/dress").glob("*.tar"))
    for shard in shards:
        if len(jpegs) >= n_imgs and len(caps) >= n_caps:
            break
        try:
            with tarfile.open(shard) as tf:
                for m in tf:
                    if m.name.endswith(".jpg") and len(jpegs) < n_imgs:
                        jpegs.append(tf.extractfile(m).read())
                    elif m.name.endswith(".txt") and len(caps) < n_caps:
                        caps.append(tf.extractfile(m).read().decode())
                    if len(jpegs) >= n_imgs and len(caps) >= n_caps:
                        break
        except (OSError, tarfile.TarError):
            continue
    n_real = len(jpegs)
    if len(jpegs) < n_imgs or len(caps) < n_caps:
        # TOP UP to the exact requested counts — run_suite slices fixed
        # [0:128]/[128:256]-style windows, so a partially-filled shard
        # (fewer than n_imgs jpegs) would silently post empty batches
        from PIL import Image

        rng = np.random.default_rng(0)
        while len(jpegs) < n_imgs:
            arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            jpegs.append(buf.getvalue())
        while len(caps) < n_caps:
            caps.append(f"a photo of object number {len(caps)}")
    return jpegs, caps, n_real


class Server:
    """One serving CLI subprocess; context-managed shutdown by pid."""

    def __init__(self, extra_args, log_name, startup_deadline=1200):
        self.port = free_port()
        self.log = open(ASSETS / f"{log_name}.log", "w")
        cmd = [sys.executable, "-m", "clip_mixer_tpu.serving",
               "--port", str(self.port)] + [str(a) for a in extra_args]
        print(f"[serve] {' '.join(cmd)}", flush=True)
        self.t0 = time.perf_counter()
        self.proc = subprocess.Popen(cmd, cwd=REPO, env=ENV, stdout=self.log,
                                     stderr=subprocess.STDOUT)
        self.client = ServingClient(f"http://127.0.0.1:{self.port}",
                                    timeout=600.0, retries=0)
        deadline = time.time() + startup_deadline
        while True:
            if self.proc.poll() is not None:
                raise RuntimeError(f"server died at startup, see {self.log.name}")
            try:
                self.healthz = self.client.healthz()
                break
            except Exception:
                if time.time() > deadline:
                    self.stop()
                    raise RuntimeError(f"server not healthy in {startup_deadline}s")
                time.sleep(1.0)
        self.startup_seconds = time.perf_counter() - self.t0

    def stop(self):
        if self.proc.poll() is None:
            self.proc.send_signal(signal.SIGTERM)
            try:
                self.proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()
        self.log.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def hammer(fn, work_items, n_threads):
    """Run fn(item) over work_items from n_threads; return (lat_list, wall,
    n_errors). Latencies only for successful requests."""
    lat, errs = [], []
    lock = threading.Lock()
    it = iter(work_items)

    def worker():
        while True:
            with lock:
                item = next(it, None)
            if item is None:
                return
            t0 = time.perf_counter()
            try:
                fn(item)
            except Exception as e:  # recorded, not fatal — partial evidence
                with lock:
                    errs.append(repr(e))
                continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, time.perf_counter() - t0, errs


def stats(lat, wall, items_per_req, errs):
    if not lat:
        return {"error": f"all requests failed: {errs[:2]}"}
    out = {
        "requests": len(lat),
        "concurrent_wall_s": round(wall, 2),
        "items_per_sec": round(len(lat) * items_per_req / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
    }
    if errs:
        out["errors"] = len(errs)
    return out


def run_suite(srv: Server, jpegs, caps, quick=False):
    """The per-leg endpoint suite."""
    c = srv.client
    k = 2 if quick else 1
    out = {"startup_seconds": round(srv.startup_seconds, 1),
           "healthz": srv.healthz}

    def img_req(n):
        def go(i):
            c.encode_image_files(jpegs[(i * n) % 256:(i * n) % 256 + n])
        return go

    # one untimed request per shape: compile/micro-batcher spin-up out of band
    c.encode_image_files(jpegs[:32]); c.encode_image_files(jpegs[:128])
    c.encode_image_files(jpegs[:1]); c.encode_text(caps[:64])

    lat, wall, errs = hammer(img_req(32), range(16 // k), 4)
    out["encode_image_b32"] = stats(lat, wall, 32, errs)
    lat, wall, errs = hammer(img_req(128), range(8 // k), 2)
    out["encode_image_b128"] = stats(lat, wall, 128, errs)
    lat, wall, errs = hammer(img_req(1), range(128 // k), 8)
    out["encode_image_b1_coalesced_8clients"] = stats(lat, wall, 1, errs)

    def text_req(i):
        c.encode_text(caps[(i * 64) % 192:(i * 64) % 192 + 64])
    lat, wall, errs = hammer(text_req, range(12 // k), 4)
    out["encode_text_b64"] = stats(lat, wall, 64, errs)

    def cls_req(i):
        c.classify(jpegs[(i * 32) % 256:(i * 32) % 256 + 32], top_k=5)
    try:
        c.classify(jpegs[:32], top_k=5)  # warm / availability probe
        lat, wall, errs = hammer(cls_req, range(8 // k), 2)
        out["classify_b32_top5"] = stats(lat, wall, 32, errs)
    except Exception as e:
        out["classify_b32_top5"] = {"skipped": repr(e)}

    # retrieval: index 512 images (untimed), then text->image retrieve
    try:
        for i in range(0, 512, 128):
            c.index(jpegs[i:i + 128], [f"img{j}" for j in range(i, i + 128)])
        def ret_req(i):
            c.retrieve(caps[(i * 8) % 248:(i * 8) % 248 + 8], top_k=5)
        c.retrieve(caps[:8], top_k=5)
        lat, wall, errs = hammer(ret_req, range(16 // k), 4)
        out["retrieve_b8_top5"] = stats(lat, wall, 8, errs)
    except Exception as e:
        out["retrieve_b8_top5"] = {"skipped": repr(e)}

    def sim_req(i):
        c.similarity(jpegs[(i * 8) % 256:(i * 8) % 256 + 8], caps[:8])
    c.similarity(jpegs[:8], caps[:8])
    lat, wall, errs = hammer(sim_req, range(6 // k), 2)
    out["similarity_8x8"] = stats(lat, wall, 8, errs)

    out["server_metrics"] = c.metrics()
    return out


def cold_probe(model_arg, log_name):
    """Start WITHOUT --warmup; time healthz + the first encode requests
    (the compile tail live jit pays and frozen programs don't)."""
    jpegs, _, _ = PAYLOADS
    with Server([ "--model", model_arg], log_name) as srv:
        t0 = time.perf_counter()
        srv.client.encode_image_files(jpegs[:32])
        first_b32 = time.perf_counter() - t0
        t0 = time.perf_counter()
        srv.client.encode_image_files(jpegs[:32])
        warm_b32 = time.perf_counter() - t0
        t0 = time.perf_counter()
        srv.client.encode_image_files(jpegs[:1])
        first_b1 = time.perf_counter() - t0
        return {
            "startup_to_healthz_s": round(srv.startup_seconds, 1),
            "first_request_b32_s": round(first_b32, 2),
            "second_request_b32_s": round(warm_b32, 2),
            "first_request_b1_s": round(first_b1, 2),
        }


PAYLOADS = None


def main():
    global PAYLOADS
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip-prep", action="store_true",
                   help="reuse existing outputs/serving_bench assets")
    p.add_argument("--out", default=str(REPO / "SERVING_BENCH.json"))
    args = p.parse_args()

    ASSETS.mkdir(parents=True, exist_ok=True)
    PAYLOADS = load_payloads()
    jpegs, caps, n_real_jpegs = PAYLOADS

    model = ASSETS / "model"
    calib = ASSETS / "calib.npz"
    frozen = ASSETS / "frozen"
    frozen_int8 = ASSETS / "frozen_int8"
    names = ASSETS / "classnames.txt"
    if not args.skip_prep:
        # deterministic flagship params shared by every leg
        sh([sys.executable, "-c", (
            "import sys; sys.path.insert(0, '.');"
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from clip_mixer_tpu.api import save_pretrained;"
            "from clip_mixer_tpu.config import PRESETS;"
            "from clip_mixer_tpu.models import clip as clip_model;"
            "cfg = PRESETS['mixer-b32'];"
            "save_pretrained(clip_model.init(jax.random.key(0), cfg), cfg, "
            f"'{model}')")], "prep_model")
        sh([sys.executable, "scripts/calibrate_int8.py", "--model", model,
            "--data", "/root/data/dress/0000[0-1].tar", "--n", "512",
            "--out", calib], "prep_calib")
        sh([sys.executable, "scripts/export_servable.py", "--model", model,
            "--out", frozen], "prep_frozen")
        sh([sys.executable, "scripts/export_servable.py", "--model", model,
            "--int8", calib, "--out", frozen_int8], "prep_frozen_int8")
        names.write_text("".join(f"class number {i}\n" for i in range(100)))

    doc = {"config": {
        "model": "mixer-b32 (random-init seed 0, identical across legs)",
        "payloads": (f"256px JPEGs, {n_real_jpegs}/{len(jpegs)} from the dress "
                     "shards (synthetic top-up for the rest; server-side PIL "
                     "decode+resize)"),
        "quick": bool(args.quick),
        "environment_note": (
            "TPU reached through the axon tunnel: ~0.2s dispatch RTT, "
            "~35MB/s effective host->device transfer; latencies are a floor "
            "for locally attached chips. 1-core host: JPEG decode and HTTP "
            "JSON serialisation share one CPU."),
    }}

    # cold-start: the compile tail is THE live-vs-frozen difference
    doc["cold_start"] = {
        "live_bf16": cold_probe(str(model), "cold_live"),
        "frozen_bf16": cold_probe(str(frozen), "cold_frozen"),
        "note": ("persistent XLA compile cache (/root/.jax_cache) warm in "
                 "both probes — live first-compile without it measured at "
                 "~4min on this tunnel (README); frozen programs skip "
                 "compilation by construction"),
    }

    legs = {
        "live_bf16": ["--model", model, "--warmup", "--classifier", names],
        "live_int8": ["--model", model, "--int8", calib, "--warmup",
                      "--classifier", names],
        "frozen_bf16": ["--model", frozen, "--warmup", "--classifier", names],
        "frozen_int8": ["--model", frozen_int8, "--warmup",
                        "--classifier", names],
    }
    for name, extra in legs.items():
        with Server(extra, f"leg_{name}") as srv:
            doc[name] = run_suite(srv, jpegs, caps, quick=args.quick)
        Path(args.out).write_text(json.dumps(doc, indent=2))  # checkpoint

    # raw in-process engine: micro-batching efficiency baseline (no HTTP).
    # A baseline crash must not discard the completed HTTP legs above —
    # record the error in the artifact instead of raising out of main().
    try:
        sh([sys.executable, "scripts/bench_serving.py"], "raw_engine",
           timeout=3600)
        raw_tail = (ASSETS / "raw_engine.log").read_text().strip().splitlines()
        doc["raw_engine_no_http"] = json.loads(raw_tail[-1])
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            json.JSONDecodeError, IndexError, OSError) as e:
        doc["raw_engine_no_http"] = {
            "error": f"bench_serving.py failed: {type(e).__name__}: {e}"}

    Path(args.out).write_text(json.dumps(doc, indent=2))
    print(json.dumps({
        leg: {
            "img_b128_ips": doc[leg].get("encode_image_b128", {}).get("items_per_sec"),
            "b1_coalesced_rps": doc[leg].get(
                "encode_image_b1_coalesced_8clients", {}).get("items_per_sec"),
            "startup_s": doc[leg].get("startup_seconds"),
        }
        for leg in legs
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
