"""Host->device input-transfer bandwidth (the real-data training bound).

Every real-data train step must ship its uint8 batch from host RAM to the
device; on a TPU VM that link is PCIe/DMA (GB/s), but through this
environment's remote-dispatch tunnel it is the session bottleneck: the
dress rehearsal (TRAIN_DRESS.json) runs at the transfer rate, not the
2,545 imgs/s the device-side step sustains when inputs are resident
(bench.py detail.train_step_imgs_per_sec_b1024_remat).

Measures steady-state device_put MB/s for a B=2048 uint8 image batch
(308 MB — the dress leg's exact shape), timed over several transfers with
a block_until_ready fence per put (transfer, unlike compute, cannot be
chained on-device; the fence is the honest edge here). Prints one JSON
line. Run it while the chip is otherwise idle.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    dev = jax.devices()[0]
    batch = np.random.default_rng(0).integers(
        0, 256, (2048, 224, 224, 3), dtype=np.uint8
    )
    mb = batch.nbytes / 1e6
    # warmup (allocator + tunnel setup)
    jax.block_until_ready(jax.device_put(batch[:64], dev))
    rates = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(batch, dev))
        rates.append(mb / (time.perf_counter() - t0))
    rates.sort()
    print(
        json.dumps(
            {
                "metric": "host->device uint8 transfer MB/s (B=2048 image batch)",
                "value": round(rates[len(rates) // 2], 1),
                "unit": "MB/s",
                "detail": {
                    "runs_mb_per_s": [round(r, 1) for r in rates],
                    "batch_mb": round(mb, 1),
                    "device": str(dev),
                    "implied_imgs_per_sec_at_b2048": round(
                        rates[len(rates) // 2] / mb * 2048, 1
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
