"""Component profile of the Mixer-B/32 vision tower on real TPU.

Answers "where does the time go?" with ablation timing (the methodology the
axon tunnel permits — see bench.py): e2e preprocess+encode is timed with the
loop-carried chained-fori method, then re-timed with the token-mix branch
ablated to identity, then with the channel-mix branch ablated. The deltas are
the cost of each branch as XLA actually schedules it (including its HBM
traffic), not just its FLOPs.

This is the profile that motivates (or kills) the fused mixer-block Pallas
kernel: the token mix is ~11.5% of FLOPs but MXU-padding-bound (K=50 -> 39%
ceiling) and bandwidth-bound on its [B, 4T, W] hidden tensor; the kernel case
rests on how many ms the ablation assigns to it.

Usage: python scripts/profile_mixer.py   (prints one JSON line)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def slope_time(run, n1=5, n2=45):
    """Shared tunnel-safe slope timing (utils/profiling.slope_time)."""
    from clip_mixer_tpu.utils.profiling import slope_time as _st

    return _st(run, n1, n2)


def main():
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.models.layers import layer_norm, quick_gelu
    from clip_mixer_tpu.models.mixer import token_mix
    from clip_mixer_tpu.models.towers import patchify
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

    cfg = PRESETS["mixer-b32"]
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)

    batch = 512
    rng = np.random.default_rng(0)
    pre = make_batch_preprocess((256, 256), cfg.image_resolution, normalize=True, dtype=jnp.bfloat16)
    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    dt = jnp.dtype(cfg.compute_dtype)

    def encode_ablated(p, imgs, ablate: str):
        """vision_encoder with one branch replaced by identity."""
        v = p["visual"]
        x = patchify(pre(imgs).astype(dt), cfg.vision_patch_size)
        x = x @ v["patch_embed"]["kernel"].astype(dt)
        cls = jnp.broadcast_to(v["class_embedding"].astype(dt), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = layer_norm(v["ln_pre"], x)

        def step(h, lp):
            if ablate != "token":
                h = h + token_mix(lp, h)
            if ablate != "channel":
                y = layer_norm(lp["ln_channel"], h)
                cm = lp["channel_mix"]
                hid = quick_gelu(y @ cm["w_in"].astype(dt) + cm["b_in"].astype(dt))
                h = h + hid @ cm["w_out"].astype(dt) + cm["b_out"].astype(dt)
            return h, None

        x, _ = jax.lax.scan(step, x, v["tower"]["blocks"])
        x = layer_norm(v["ln_post"], x[:, 0, :])
        return x @ v["proj"].astype(dt)

    # Pin the hand-mirrored encoder to the real one BEFORE attributing time:
    # a tower change would otherwise silently profile a different model.
    from clip_mixer_tpu.models import clip as clip_model

    ref = jax.jit(lambda p, im: clip_model.encode_image(p, cfg, pre(im)))(params, images[:8])
    got = jax.jit(lambda p, im: encode_ablated(p, im, "none"))(params, images[:8])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )

    results = {}
    for name in ("none", "token", "channel"):
        @jax.jit
        def chained(p, imgs, n, _name=name):
            def body(_, carry):
                f = encode_ablated(p, imgs + carry.astype(jnp.uint8), _name)
                return f.astype(jnp.float32).mean() * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        per = slope_time(lambda n: chained(params, images, jnp.int32(n)))
        results[name] = per * 1e3  # ms per batch

    full = results["none"]
    out = {
        "batch": batch,
        "e2e_ms": round(full, 3),
        "token_mix_ms": round(full - results["token"], 3),
        "channel_mix_ms": round(full - results["channel"], 3),
        "other_ms": round(results["token"] + results["channel"] - full, 3),
        "token_mix_pct": round(100 * (full - results["token"]) / full, 1),
        "imgs_per_sec_full": round(batch / (full / 1e3), 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
