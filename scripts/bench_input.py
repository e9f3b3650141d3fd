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
    rng = np.random.default_rng(0)

    def jpeg_samples():
        for i in range(n_images):
            # structured content so JPEG decode cost is realistic
            base = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
            yield base, f"a synthetic caption number {i} for throughput"

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    paths = write_tar_shards(jpeg_samples(), tmp, samples_per_shard=n_images)

    results = {}
    for mode in ("thread", "process"):
        for workers in (1, 2, 4, 8):
            src = TarShardSource(
                paths, batch_size=256, image_size=224, decode_workers=workers, decode_mode=mode
            )
            # warm (page cache, pool spin-up)
            next(iter(src.iter_batches(0)))
            t0 = time.perf_counter()
            n = 0
            for b in src.iter_batches(0):
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
