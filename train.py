"""Training CLI — the reference's ``python training.py`` entry
(training/training.py:253-294), TPU-native.

Builds the Mixer-B/32 CLIP (or any preset), wires the data source, and runs
the Trainer. The reference hardcoded its hyperparameters in Trainer.__init__;
here they live in TrainConfig with CLI overrides.

Examples:
  python train.py --preset mixer-b32 --data 'gs-fuse/shards/*.tar' --run-name run1
  python train.py --preset mixer-b32 --synthetic --steps-per-epoch 50 --epochs 2
"""

import argparse
import glob
import math
import os

from clip_mixer_tpu.config import PRESETS, SIGLIP_LOGIT_SCALE_MAX, TrainConfig
from clip_mixer_tpu.data.pipeline import (
    FileListSource,
    CacheSource,
    MixtureSource,
    SyntheticSource,
    TarShardSource,
    expand_shard_pattern,
)
from clip_mixer_tpu.evals.validators import (
    CosineSimValidator,
    ImageNetValidator,
    MNISTValidator,
    RetrievalValidator,
    SST2Validator,
)
from clip_mixer_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="mixer-b32", choices=sorted(PRESETS.keys()))
    p.add_argument("--data", action="append", default=None,
                   help="glob of webdataset tar shards; repeat for a weighted "
                        "mixture with an optional '::WEIGHT' suffix per glob "
                        "(e.g. --data 'laion/*.tar::3' --data 'curated/*.tar::1'; "
                        "mixtures stream indefinitely — set --steps-per-epoch). "
                        "Also accepts a .csv/.tsv manifest of (image path, "
                        "caption) rows or a plain image directory (sidecar "
                        ".txt captions by default, see --caption-from) — the "
                        "fine-tuning on-ramp, no shard packing needed")
    p.add_argument("--val-data", default=None,
                   help="held-out split for image<->text retrieval validation "
                        "(R@1/5/10 both directions at every validation pass) — "
                        "same spec forms as --data (tar glob, .csv/.tsv "
                        "manifest, image directory); runs fully offline, "
                        "unlike the remote-dataset validators")
    p.add_argument("--val-samples", type=int, default=2048,
                   help="retrieval gallery size drawn from --val-data")
    p.add_argument("--caption-from", default="txt", choices=("txt", "dirname", "stem"),
                   help="caption source when --data is an image directory: "
                        "sidecar <stem>.txt files, the class-folder name, or "
                        "the filename stem")
    p.add_argument("--synthetic", action="store_true", help="synthetic data (smoke runs)")
    p.add_argument("--run-name", default="run", help="output directory name")
    p.add_argument("--epochs", type=int, default=32)  # training.py:255
    p.add_argument("--global-batch-size", type=int, default=32768)  # training.py:56
    p.add_argument("--learning-rate", type=float, default=5e-4)  # training.py:55
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=400)  # training.py:197
    p.add_argument("--validate-every", type=int, default=None,
                   help="validation cadence in steps (default: follow "
                        "--checkpoint-every, as the reference couples them)")
    p.add_argument("--keep-checkpoints", type=int, default=3,
                   help="orbax retention window (last N cadence checkpoints)")
    p.add_argument("--grad-through-gather", action="store_true",
                   help="exact global-batch InfoNCE gradient (default: reference detach semantics)")
    p.add_argument("--chunk-size", type=int, default=None,
                   help="chunked logits (avoid materialising [localB, globalB])")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="exact (GradCache) gradient accumulation: microbatches per "
                        "step at one-microbatch activation memory; the InfoNCE loss "
                        "still couples the full global batch")
    p.add_argument("--max-inflight-steps", type=int, default=2,
                   help="async-dispatch depth: each step blocks on the loss from "
                        "N steps back so queued steps can't pin unbounded host "
                        "batch memory (2 = double buffering)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params + Adam moments over the data axis "
                        "(for models too big to replicate per chip); trains with "
                        "the exact global InfoNCE gradient; composes with "
                        "--tensor-parallel (storage sharded over the full grid)")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="model-axis size: MLP hidden dims and attention heads "
                        "sharded over this many devices (megatron-style); mesh "
                        "becomes (devices/N) data x N model")
    p.add_argument("--pipeline-stages", type=int, default=1,
                   help="pipeline parallelism: split the tower block stacks over "
                        "this many stages (GPipe fill-drain schedule); mesh becomes "
                        "(devices/stages) data x stages")
    p.add_argument("--pipeline-microbatches", type=int, default=8,
                   help="microbatches per PP step (bubble = (S-1)/(M+S-1))")
    p.add_argument("--cache-data", nargs="?", const=True, default=None,
                   metavar="DIR",
                   help="decode the dataset once and serve every epoch from the "
                        "cache with full-permutation shuffling (tf.data .cache() "
                        "analogue; for datasets that fit RAM on decode-bound "
                        "hosts). With DIR the cache is disk-backed (memmapped "
                        ".npy) so resumed/repeat runs skip the decode pass")
    p.add_argument("--shuffle-buffer", type=int, default=10000,
                   help="streaming sample-shuffle buffer (the reference trains "
                        "with DataLoader(shuffle=True)); 0 = sequential shard "
                        "order; size >= samples/shard mixes across shards")
    p.add_argument("--on-decode-error", default="raise", choices=["raise", "substitute"],
                   help="substitute: replace a corrupt record with an in-batch "
                        "neighbor pair instead of failing the run (counted; "
                        "batch boundaries and resume determinism unchanged)")
    p.add_argument("--freeze-serving", action="store_true",
                   help="also record frozen serving programs (jax.export, "
                        "clip_mixer_tpu.aot) into the completion export")
    p.add_argument("--loss", default="info_nce", choices=["info_nce", "siglip"],
                   help="contrastive objective: info_nce (the reference's softmax "
                        "loss) or siglip (pairwise sigmoid, ops/losses.siglip_loss "
                        "— adds a learnable logit_bias param, init -10, and sets "
                        "logit_scale init to log(10) per arXiv:2303.15343)")
    p.add_argument("--init-from", default=None, metavar="PATH",
                   help="initialize params from a loadable checkpoint (native "
                        "export dir, torch .pt, preset name) instead of random "
                        "init — the fine-tuning entry; optimizer state starts "
                        "fresh; resume of THIS run still wins if its checkpoint "
                        "dir is non-empty")
    p.add_argument("--freeze-tower", default=None, choices=["visual", "text"],
                   help="LiT-style locked tower: stop_gradient + no AdamW "
                        "moments for the frozen tower (pair with --init-from)")
    p.add_argument("--augment", action="store_true",
                   help="in-graph training augmentation (ops/augment.py): the "
                        "pipeline decodes ~14%% larger squares and the jitted "
                        "step random-crops to the model resolution + flips, "
                        "keyed on the step counter (bitwise-resumable; zero "
                        "extra host work)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="per-step EMA decay for an averaged copy of the params "
                        "(e.g. 0.9999); validation + the completion export use "
                        "the average, checkpoints carry it, raw params train on")
    p.add_argument("--seed", type=int, default=0,
                   help="init/data RNG seed (TrainConfig.seed)")
    p.add_argument("--no-validators", action="store_true")
    p.add_argument("--no-remat", action="store_true",
                   help="disable gradient rematerialisation (needs ~4x more HBM; "
                        "Mixer-B/32 at 1024 imgs/chip OOMs a 16GB v5e without remat)")
    p.add_argument("--remat-policy", default="none",
                   choices=["none", "mlp_hidden", "all_hidden"],
                   help="what remat saves: 'mlp_hidden' keeps the MLP hidden "
                        "pre-activations so backward skips the dominant matmul "
                        "recompute (~[B,T,4W] bf16/block); 'all_hidden' also "
                        "keeps the mixer token-mix hidden")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="trace this many steady-state steps to outputs/<run>/profile "
                        "(TensorBoard profile plugin; lead process only)")
    p.add_argument("--crash-after-steps", type=int, default=None,
                   help="fault injection: crash (RuntimeError) after this process "
                        "executes N steps (an MTBF simulation) — rehearses the "
                        "supervisor/resume path (scripts/supervise.py) without "
                        "waiting for a real failure")
    p.add_argument("--hang-after-steps", type=int, default=None,
                   help="fault injection: simulate a wedged accelerator after this "
                        "process executes N steps (alive, no progress, no "
                        "heartbeats, never exits) — rehearses supervise "
                        "--stall-timeout hang detection")
    p.add_argument("--verbose", action="store_true")
    # Explicit rendezvous/platform — used by launch.rehearse_local (a pod
    # launch on real TPUs needs none of these: jax.distributed.initialize()
    # auto-discovers the slice).
    p.add_argument("--platform", default=None, help="force a JAX platform (e.g. cpu)")
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def parse_data_spec(spec):
    """Split a --data value into (glob pattern, weight).

    '::WEIGHT' is only a weight if the tail actually parses as a positive
    finite float — paths may legitimately contain '::'. Raises SystemExit on
    an explicit-but-invalid weight (e.g. '::0', '::-1', '::nan')."""
    pattern, sep, w = spec.rpartition("::")
    if sep and pattern:
        try:
            weight = float(w)
        except ValueError:
            return spec, 1.0  # not a weight; the whole spec is the path
        if not (weight > 0 and math.isfinite(weight)):
            raise SystemExit(
                f"--data {spec!r}: weight after '::' must be a "
                f"positive number, got {w!r}"
            )
        return pattern, weight
    return spec, 1.0


def build_single_source(pattern, caption_from="txt", **source_kwargs):
    """One non-mixture data source from a spec: a .csv/.tsv manifest, an
    image directory (FileListSource), or a tar-shard glob (TarShardSource —
    local paths or remote URIs like 'gs://bucket/shards/*.tar', streamed
    directly via fsspec, no FUSE mount)."""
    if pattern.lower().endswith((".csv", ".tsv")):
        return FileListSource.from_csv(pattern, **source_kwargs)
    if "://" in pattern:
        shards = expand_shard_pattern(pattern)
        if not shards:
            raise SystemExit(f"no shards match {pattern}")
        return TarShardSource(shards, **source_kwargs)
    if os.path.isdir(pattern):
        tars = sorted(glob.glob(os.path.join(pattern, "**", "*.tar"), recursive=True))
        if tars:
            return TarShardSource(tars, **source_kwargs)
        return FileListSource.from_folder(pattern, caption_from=caption_from, **source_kwargs)
    shards = sorted(glob.glob(pattern))
    if not shards:
        raise SystemExit(f"no shards match {pattern}")
    return TarShardSource(shards, **source_kwargs)


def main():
    args = parse_args()
    import jax

    if args.platform:  # before any backend touch
        jax.config.update("jax_platforms", args.platform)

    from clip_mixer_tpu.parallel.dist import maybe_initialize_distributed

    maybe_initialize_distributed(
        verbose=args.verbose,
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    cfg = PRESETS[args.preset].replace(remat=not args.no_remat, remat_policy=args.remat_policy)
    if args.loss == "siglip":
        cfg = cfg.for_siglip()

    init_params = None
    if args.init_from:
        # Fine-tuning entry: start from a pretrained model (native export
        # dir, torch .pt/.safetensors, or registry/preset name — whatever
        # api.load accepts). The LOADED architecture wins — it must replace
        # cfg BEFORE the data source / validators / capacity math below are
        # built from it; the CLI keeps only the runtime knobs. A non-empty
        # checkpoint dir for THIS run still takes precedence inside the
        # Trainer (resume beats re-init).
        from clip_mixer_tpu.api import load as _api_load

        init_params, loaded_cfg, _pre = _api_load(args.init_from)
        # Architecture comes from the checkpoint; RUNTIME knobs stay with
        # this run — notably compute_dtype: an export from a CPU/parity run
        # records float32, which would silently halve TPU throughput here.
        cfg = loaded_cfg.replace(
            remat=cfg.remat, remat_policy=cfg.remat_policy,
            fused_mlp=cfg.fused_mlp, compute_dtype=cfg.compute_dtype,
            logit_bias_init=cfg.logit_bias_init,
        )
        if args.loss == "siglip" and "logit_bias" not in init_params:
            # Pretrained InfoNCE checkpoints have no sigmoid bias — add the
            # paper-init scalar so siglip fine-tuning can proceed.
            import jax.numpy as jnp

            init_params = dict(init_params)
            init_params["logit_bias"] = jnp.asarray(-10.0, jnp.float32)
        if args.verbose:
            from clip_mixer_tpu.models.clip import param_count

            print(f"--init-from {args.init_from}: {param_count(init_params)/1e6:.1f}M "
                  f"params (logit_scale={float(init_params['logit_scale']):.3f})")
    logit_scale_max = (
        SIGLIP_LOGIT_SCALE_MAX if args.loss == "siglip" else TrainConfig.logit_scale_max
    )
    tcfg = TrainConfig(
        seed=args.seed,
        logit_scale_max=logit_scale_max,
        global_batch_size=args.global_batch_size,
        epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        learning_rate=args.learning_rate,
        checkpoint_every_steps=args.checkpoint_every,
        validate_every_steps=args.validate_every,
        keep_checkpoints=args.keep_checkpoints,
        accum_steps=args.accum_steps,
        max_inflight_steps=args.max_inflight_steps,
        fsdp=args.fsdp,
        pipeline_microbatches=args.pipeline_microbatches,
        freeze_serving=args.freeze_serving,
        crash_after_steps=args.crash_after_steps,
        hang_after_steps=args.hang_after_steps,
        loss=args.loss,
        ema_decay=args.ema_decay,
        freeze=args.freeze_tower,
        augment=args.augment,
    )

    # With in-graph augmentation the pipeline decodes larger squares and
    # the jitted step crops back to cfg.image_resolution.
    source_res = cfg.image_resolution
    if args.augment:
        from clip_mixer_tpu.ops.augment import source_size

        source_res = source_size(cfg.image_resolution)

    n_hosts, host = jax.process_count(), jax.process_index()
    if args.global_batch_size % n_hosts != 0:
        raise SystemExit(
            f"--global-batch-size {args.global_batch_size} is not divisible by "
            f"{n_hosts} hosts: the actual batch would silently differ from the "
            "configured one (LR schedule / metrics keyed on it would be wrong)"
        )
    per_host_batch = args.global_batch_size // n_hosts
    if args.synthetic or args.data is None:
        data = SyntheticSource(
            batch_size=per_host_batch,
            image_size=source_res,
            n_batches=args.steps_per_epoch or 100,
            context_length=cfg.context_length,
        )
    else:
        source_kwargs = dict(
            batch_size=per_host_batch,
            image_size=source_res,
            context_length=cfg.context_length,
            n_hosts=n_hosts,
            host_index=host,
            shuffle_buffer=args.shuffle_buffer,
            on_decode_error=args.on_decode_error,
            seed=args.seed,
        )
        if len(args.data) == 1:
            # Single source: tar glob, .csv/.tsv manifest, or image directory.
            pattern, _ = parse_data_spec(args.data[0])
            data = build_single_source(pattern, args.caption_from, **source_kwargs)
        else:
            components, weights = [], []
            for spec in args.data:
                pattern, weight = parse_data_spec(spec)
                if pattern.lower().endswith((".csv", ".tsv")) or os.path.isdir(pattern):
                    raise SystemExit(
                        "--data mixtures support tar-shard globs only; a "
                        ".csv/.tsv manifest or image directory must be the "
                        "sole --data argument"
                    )
                weights.append(weight)
                shards = expand_shard_pattern(pattern)
                if not shards:
                    raise SystemExit(f"no shards match {pattern}")
                components.append(shards)
            if args.steps_per_epoch is None:
                raise SystemExit(
                    "a --data mixture streams indefinitely (small components "
                    "repeat to hold the ratio): set --steps-per-epoch"
                )
            data = MixtureSource(components, weights=weights, **source_kwargs)

    if args.cache_data is not None:
        if args.synthetic or args.data is None:
            raise SystemExit("--cache-data needs --data (synthetic data is already RAM-speed)")
        if isinstance(data, MixtureSource):
            raise SystemExit(
                "--cache-data does not compose with --data mixtures (a mixture "
                "streams indefinitely; cache the packed components instead)"
            )
        # Cached epochs are full permutations; the streaming reservoir would
        # only reorder the one-time fill pass.
        data.shuffle_buffer = 0
        cache_dir = args.cache_data if isinstance(args.cache_data, str) else None
        # --seed governs the per-epoch permutation too (the (seed, epoch, b)
        # pure function); leaving the default 0 here made --seed a no-op for
        # cached data order (review catch, round 5)
        data = CacheSource(data, cache_dir=cache_dir, seed=args.seed)

    validators = []
    if not args.no_validators:
        # params are injected fresh by Trainer.validate before each run.
        validators = [
            ImageNetValidator(None, cfg),
            CosineSimValidator(None, cfg),
            SST2Validator(None, cfg),
            MNISTValidator(None, cfg),
        ]
    if args.val_data:
        # Explicitly requested, so it rides along even under --no-validators.
        # Validation sees the MODEL resolution (no augment decode headroom)
        # and keeps the tail batch (small held-out splits).
        val_source = build_single_source(
            args.val_data,
            args.caption_from,
            batch_size=min(256, args.val_samples),
            image_size=cfg.image_resolution,
            context_length=cfg.context_length,
            drop_last=False,
            # a single corrupt image in the held-out split must not abort
            # the run when the user already opted into substitution
            on_decode_error=args.on_decode_error,
        )
        validators.append(
            RetrievalValidator(None, cfg, data_source=val_source, max_samples=args.val_samples)
        )

    mesh = None
    if args.pipeline_stages > 1:
        from clip_mixer_tpu.parallel.pp import make_pp_mesh

        if args.tensor_parallel > 1:
            raise SystemExit("--pipeline-stages and --tensor-parallel do not compose")
        n_dev = len(jax.devices())
        if n_dev % args.pipeline_stages != 0:
            raise SystemExit(
                f"--pipeline-stages {args.pipeline_stages} does not divide the "
                f"{n_dev} available devices (stranded chips / empty mesh)"
            )
        mesh = make_pp_mesh(n_data=n_dev // args.pipeline_stages, n_stage=args.pipeline_stages)
    elif args.tensor_parallel > 1:
        from clip_mixer_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % args.tensor_parallel != 0:
            raise SystemExit(
                f"--tensor-parallel {args.tensor_parallel} does not divide the "
                f"{n_dev} available devices (stranded chips / empty mesh)"
            )
        mesh = make_mesh(n_data=n_dev // args.tensor_parallel, n_model=args.tensor_parallel)

    trainer = Trainer(
        cfg,
        tcfg,
        data,
        run_dir=f"outputs/{args.run_name}",
        mesh=mesh,
        validators=validators,
        grad_through_gather=args.grad_through_gather,
        chunk_size=args.chunk_size,
        verbose=args.verbose,
        profile_steps=args.profile_steps,
        params=init_params,
    )
    try:
        trainer.train()
    except FloatingPointError:
        # The Trainer's non-finite-loss abort (last good checkpoint kept).
        # Distinct exit code: this failure is DETERMINISTIC under bitwise
        # resume, so a supervisor (launch.supervise) must not restart it.
        import sys
        import traceback

        from clip_mixer_tpu.launch import EXIT_NONFINITE

        traceback.print_exc()
        sys.exit(EXIT_NONFINITE)


if __name__ == "__main__":
    main()
