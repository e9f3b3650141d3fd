"""Execute the FULL-SIZE Mixer-B/32 sharded train step on a multi-device mesh.

Round-2 verdict (VERDICT.md "weak" #5): every >1-device execution so far used
tiny dims — the dryrun gate runs width-64/2-layer models, and the heavy
sharded tests cap at 2-4 virtual devices with small shapes. This script runs
the full 111M-parameter flagship (PRESETS["mixer-b32"], the geometry the
reference trained — /root/reference/training/training.py:275-287) through
TWO production steps on a 4-device (data=2, model=2) virtual CPU mesh:

  leg 1: DP x TP (shard_map step, hidden-sharded MLPs, InfoNCE all_gather)
  leg 2: FSDP x TP (params + Adam moments stored sharded over the full
         grid) with exact two-pass grad accumulation, remat on

and records, per leg: finite losses for both steps, wall time, and genuine
partitioning evidence — for representative parameter leaves, the global
shape vs the per-device addressable shard shape. Output: MULTICHIP_FULLSIZE.json.

This is the sanctioned stand-in for a physical pod slice (none is reachable
from this host); the sharding/collective program is identical — only the
backend differs.

Usage: python scripts/fullsize_multichip.py [--devices 4] [--batch 16]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, default=4)
    p.add_argument("--batch", type=int, default=16, help="global batch per step")
    p.add_argument("--out", default=str(REPO / "MULTICHIP_FULLSIZE.json"))
    args = p.parse_args()

    # Must run before backend init: virtual CPU devices (sitecustomize pins
    # JAX_PLATFORMS=axon; config.update is the working override — CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)

    import numpy as np
    import jax.numpy as jnp

    from clip_mixer_tpu.config import PRESETS, TrainConfig
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
    from clip_mixer_tpu.train.optimizer import make_optimizer

    n_dev = args.devices
    assert len(jax.devices()) == n_dev, jax.devices()
    n_model = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
    n_data = n_dev // n_model

    # Full flagship geometry; f32 compute on the CPU backend (bf16 is the
    # TPU default — emulated and slow here), remat on as in production.
    cfg = PRESETS["mixer-b32"].replace(compute_dtype="float32", remat=True)
    tcfg = TrainConfig(learning_rate=1e-4, warmup_steps=2)
    B = args.batch
    rng = np.random.default_rng(0)

    def make_batch(mesh):
        texts = np.zeros((B, cfg.context_length), np.int32)
        texts[:, 0] = 49406
        texts[:, 1:5] = rng.integers(1, 49000, (B, 4))
        texts[:, 5] = 49407
        return shard_batch(mesh, {
            "images": rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8),
            "texts": texts,
        })

    def shard_evidence(state_params, leaves=("visual/patch_embed/kernel",
                                             "visual/tower/blocks/channel_mix/w_in",
                                             "text/tower/blocks/mlp/w_in",
                                             "logit_scale")):
        """global shape vs device-0 addressable shard shape per leaf."""
        flat = {}

        def walk(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, f"{prefix}/{k}" if prefix else k)
            else:
                flat[prefix] = tree

        walk(state_params)
        out = {}
        for name in leaves:
            arr = flat.get(name)
            if arr is None:
                continue
            shard = arr.addressable_shards[0]
            out[name] = {
                "global_shape": list(arr.shape),
                "device0_shard_shape": list(shard.data.shape),
                "sharding": str(arr.sharding.spec)
                if hasattr(arr.sharding, "spec") else str(arr.sharding),
            }
        return out

    n_params = None
    report = {"devices": n_dev, "mesh": {"data": n_data, "model": n_model},
              "global_batch": B, "preset": "mixer-b32",
              "compute_dtype": "float32 (CPU backend)", "legs": {}}

    # ---- leg 1: DP x TP (replicated state, shard_map step) -----------------
    mesh = make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices())
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    n_params = int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
    opt = make_optimizer(tcfg, total_steps=10)
    state = replicate(mesh, init_train_state(params, opt))
    step = make_train_step(cfg, tcfg, mesh, opt)
    batch = make_batch(mesh)

    t0 = time.time()
    state, m1 = step(state, batch)
    l1a = float(jax.device_get(m1["loss"]))
    t_first = time.time() - t0
    t0 = time.time()
    state, m1 = step(state, make_batch(mesh))
    l1b = float(jax.device_get(m1["loss"]))
    t_second = time.time() - t0
    assert np.isfinite(l1a) and np.isfinite(l1b), (l1a, l1b)
    report["legs"]["dp_x_tp"] = {
        "losses": [round(l1a, 4), round(l1b, 4)],
        "step1_s_incl_compile": round(t_first, 1),
        "step2_s": round(t_second, 1),
    }
    print("[fullsize] dp_x_tp:", report["legs"]["dp_x_tp"], flush=True)
    del state

    # ---- leg 2: FSDP x TP grid, accum 2, state stored sharded --------------
    from clip_mixer_tpu.parallel.fsdp import make_fsdp_train_step, shard_state

    # Fresh init: leg 1's step DONATES its state, whose leaves alias `params`
    # (device_put of an already-committed replicated array can be a no-op),
    # so the leg-1 buffers are dead here (CLAUDE.md donation gotcha).
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    opt_f = make_optimizer(tcfg, total_steps=10)
    state_f = shard_state(mesh, init_train_state(params, opt_f))
    del params
    step_f = make_fsdp_train_step(cfg, tcfg, mesh, opt_f, state_f, accum_steps=2)
    batch_f = make_batch(mesh)

    t0 = time.time()
    state_f, m2 = step_f(state_f, batch_f)
    l2a = float(jax.device_get(m2["loss"]))
    t_first_f = time.time() - t0
    t0 = time.time()
    state_f, m2 = step_f(state_f, make_batch(mesh))
    l2b = float(jax.device_get(m2["loss"]))
    t_second_f = time.time() - t0
    assert np.isfinite(l2a) and np.isfinite(l2b), (l2a, l2b)
    report["legs"]["fsdp_x_tp_accum2"] = {
        "losses": [round(l2a, 4), round(l2b, 4)],
        "step1_s_incl_compile": round(t_first_f, 1),
        "step2_s": round(t_second_f, 1),
        "param_sharding_evidence": shard_evidence(state_f.params),
    }
    print("[fullsize] fsdp_x_tp_accum2:", json.dumps(
        report["legs"]["fsdp_x_tp_accum2"], indent=1), flush=True)

    del state_f

    # ---- leg 3: PP (data=2, stage=2) x accum 2, GPipe + remat ---------------
    # Round-3 verdict #7: every shipped parallelism mode needs full-size
    # execution evidence, not just tiny-shape equivalence. Blocks are
    # stage-sharded on the stacked L axis (pp_param_specs), the step runs
    # the GPipe fill-drain schedule inside shard_map with exact two-pass
    # accumulation across chunks (parallel/pp.py).
    from clip_mixer_tpu.parallel.pp import (
        make_pp_mesh,
        make_pp_train_step,
        place_pp_state,
    )

    n_stage = 2 if n_dev >= 4 else 1
    mesh_pp = make_pp_mesh(n_data=n_dev // n_stage, n_stage=n_stage,
                           devices=jax.devices())
    params = jax.jit(lambda k: clip_model.init(k, cfg))(jax.random.key(0))
    opt_p = make_optimizer(tcfg, total_steps=10)
    state_p = place_pp_state(mesh_pp, init_train_state(params, opt_p))
    del params
    step_p = make_pp_train_step(cfg, tcfg, mesh_pp, opt_p, n_micro=2, accum_steps=2)
    batch_p = make_batch(mesh_pp)

    t0 = time.time()
    state_p, m3 = step_p(state_p, batch_p)
    l3a = float(jax.device_get(m3["loss"]))
    t_first_p = time.time() - t0
    t0 = time.time()
    state_p, m3 = step_p(state_p, make_batch(mesh_pp))
    l3b = float(jax.device_get(m3["loss"]))
    t_second_p = time.time() - t0
    assert np.isfinite(l3a) and np.isfinite(l3b), (l3a, l3b)
    report["legs"]["pp_x_accum2"] = {
        "mesh": {"data": n_dev // n_stage, "stage": n_stage},
        "n_micro": 2,
        "losses": [round(l3a, 4), round(l3b, 4)],
        "step1_s_incl_compile": round(t_first_p, 1),
        "step2_s": round(t_second_p, 1),
        # the stacked-[L, ...] block leaves are genuinely stage-partitioned
        "param_sharding_evidence": shard_evidence(state_p.params),
    }
    print("[fullsize] pp_x_accum2:", json.dumps(
        report["legs"]["pp_x_accum2"], indent=1), flush=True)

    report["n_params"] = n_params
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[fullsize] wrote {args.out}")


if __name__ == "__main__":
    main()
