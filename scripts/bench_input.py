"""Host input-pipeline throughput: TarShardSource decode at N workers.

Replaces SCALING.md's per-core extrapolation with measured numbers: builds a
local tar shard of real JPEGs (256px, quality 90 — the img2dataset output
format, generateDataset.sh:18), then measures end-to-end batches/sec
(tar read + JPEG decode + resize-to-224 + tokenize) for the thread and
process decode modes at several worker counts.

Caveat printed with the results: this benchmark host has ONE core, so
worker counts > 1 measure overhead, not scaling; run on the real pod host
to size decode_workers. PIL releases the GIL inside the JPEG decoder, so
thread scaling is expected to track cores until the Python glue saturates
one core; decode_mode="process" removes that ceiling.

Usage: python scripts/bench_input.py   (one JSON line)
"""

import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from PIL import Image

    from clip_mixer_tpu.data.pipeline import TarShardSource, write_tar_shards

    n_images = int(os.environ.get("BENCH_INPUT_N", "512"))

    def jpeg_samples():
        # photo-like structured patterns (gradients/stripes/blobs — the
        # quant gate's deterministic set), NOT max-entropy noise: noise
        # JPEG-encodes to far larger files and overstates decode cost.
        from clip_mixer_tpu.evals.quant_gate import synthetic_images

        imgs = synthetic_images(n_images, 256, seed=0)
        for i in range(n_images):
            yield imgs[i], f"a synthetic caption number {i} for throughput"

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    # quality 90 = the img2dataset output format (generateDataset.sh:18)
    paths = write_tar_shards(jpeg_samples(), tmp, samples_per_shard=n_images, quality=90)

    # at least 4 batches so one warm batch leaves >= 3 timed ones
    batch_size = min(256, max(16, n_images // 4))
    results = {}
    for mode in ("thread", "process"):
        for workers in (1, 2, 4, 8):
            src = TarShardSource(
                paths, batch_size=batch_size, image_size=224,
                decode_workers=workers, decode_mode=mode,
            )
            # Time WITHIN one generator, from the second batch on: each
            # iter_batches() call builds its own decode pool, so a separate
            # warm iterator would still leave pool spin-up (spawn-mode
            # workers re-import jax — seconds) inside the timed region.
            it = src.iter_batches(0)
            next(it)  # pool spin-up + page cache, untimed
            t0 = time.perf_counter()
            n = 0
            for b in it:
                n += b["images"].shape[0]
            dt = time.perf_counter() - t0
            results[f"{mode}_{workers}w"] = round(n / dt, 1)

    print(
        json.dumps(
            {
                "imgs_per_sec": results,
                "n_images": n_images,
                "host_cores": os.cpu_count(),
                "note": "1-core host: >1 worker measures overhead, not scaling",
            }
        )
    )


if __name__ == "__main__":
    main()
