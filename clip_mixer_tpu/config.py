"""Model/training configuration for the TPU-native CLIP-Mixer framework.

A single typed config drives both tower variants (``tower="mixer"`` vs
``tower="transformer"``), mirroring the reference's ``useTransformer`` switch
(reference: training/clip/model.py:253,308) but as a first-class enum-style
field instead of a bool threaded through constructors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Architecture hyperparameters shared by both tower variants.

    Field semantics follow the reference constructor
    (training/clip/model.py:293-338); defaults are the trained "Mixer-B/32"
    configuration (training/training.py:275-287).
    """

    embed_dim: int = 512
    # vision tower
    image_resolution: int = 224
    vision_layers: int | Tuple[int, int, int, int] = 12
    vision_width: int = 768
    vision_patch_size: Optional[int] = 32
    # text tower
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # "mixer" -> token/channel-mixing MLP blocks (no positional embeddings,
    # reference model.py:262,343); "transformer" -> pre-LN attention blocks;
    # "resnet" vision tower is selected automatically when vision_layers is a
    # tuple (reference model.py:315-319).
    tower: str = "mixer"
    # numerics: params are stored float32; activations run in compute_dtype
    # with float32 LayerNorm internals (reference model.py:166-172 keeps LN in
    # fp32 inside an fp16 model; bf16 is the TPU-native analogue).
    compute_dtype: str = "bfloat16"
    # rematerialise tower blocks during training (reference exposes
    # checkpoint_sequential but never enables it, model.py:226-249).
    remat: bool = False
    # What the block remat SAVES instead of recomputing (ignored when
    # remat=False). "none" = full remat (lowest memory, backward re-runs the
    # whole block forward); "mlp_hidden" = save the channel-MLP / MLP hidden
    # pre-activations ([B, T, 4W] per block) — the backward then never
    # re-runs the FLOPs-dominant hidden matmuls, only LN/elementwise;
    # "all_hidden" additionally saves the token-mix hidden ([B, 4T, W] per
    # block), eliminating matmul recompute entirely for mixer towers.
    # Memory cost at Mixer-B/32, batch 1024/chip: ~3.9 GB per tower per
    # saved set — choose by capacity (utils/memory.py accounts for it).
    # Applies to the plain and tensor-parallel block paths; the fused Pallas
    # MLP kernel (fused_mlp=True) manages its own residuals via custom_vjp,
    # so the policy has no effect there.
    remat_policy: str = "none"
    # Use the fused Pallas LN+channel-MLP kernel (ops/pallas/mlp_kernel) in
    # mixer blocks. Off by default: measured on v5e, XLA's own fusion runs
    # the chain at ~180 TF/s and the kernel is parity, not a win, at B/32
    # widths (README perf notes); the flag exists for wider models and for
    # exercising the kernel in product paths. Ignored under tensor
    # parallelism (the TP branch has its own collective structure).
    fused_mlp: bool = False
    # Tensor-parallel mesh axis name. None = pure data parallel (all the
    # reference needs at 111M params — SURVEY §2.7). When set (by the TP
    # train step, under shard_map), the hidden dimension of every
    # channel-mix / transformer-MLP is sharded over this axis and the blocks
    # insert the matching psum collectives (parallel/tp.py).
    model_axis: Optional[str] = None
    # Pipeline-parallel mesh axis (set by the PP train step, under
    # shard_map): tower block stacks run the GPipe fill-drain schedule over
    # this axis instead of a plain lax.scan, with `pipeline_stages` ranks and
    # `pipeline_microbatches` microbatches per step (parallel/pp.py).
    pipeline_axis: Optional[str] = None
    pipeline_stages: int = 0
    pipeline_microbatches: int = 1
    # ln(1/0.07) — reference model.py:347. SigLIP training uses log(10)
    # (arXiv:2303.15343 §4; train.py --loss siglip sets it).
    logit_scale_init: float = math.log(1.0 / 0.07)
    # When set, params carry a learnable scalar "logit_bias" (the pairwise
    # sigmoid loss's additive bias; the paper inits it to -10.0). None = no
    # bias param — the reference/InfoNCE param tree, and what every
    # reference-format checkpoint expects. Inference paths never read it
    # (a per-logit additive constant is softmax/ranking-invariant).
    logit_bias_init: Optional[float] = None

    def __post_init__(self):
        # "resnet" is NOT a tower value: RN configs use tower="transformer"
        # (their text side) + tuple vision_layers (reference model.py:315-319).
        if self.tower not in ("mixer", "transformer"):
            raise ValueError(
                f"tower must be 'mixer' or 'transformer' (got {self.tower!r}); "
                "select the ResNet vision trunk with a tuple vision_layers"
            )
        if self.remat_policy not in ("none", "mlp_hidden", "all_hidden"):
            raise ValueError(
                f"remat_policy must be 'none', 'mlp_hidden' or 'all_hidden' "
                f"(got {self.remat_policy!r})"
            )

    @property
    def use_transformer(self) -> bool:
        return self.tower == "transformer"

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self) -> int:
        if self.is_resnet:
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        assert not self.is_resnet
        return self.image_resolution // self.vision_patch_size

    @property
    def vision_tokens(self) -> int:
        """Patch tokens + CLS (reference model.py:266)."""
        return self.grid_size**2 + 1

    def replace(self, **kw) -> "CLIPConfig":
        return dataclasses.replace(self, **kw)

    def for_siglip(self) -> "CLIPConfig":
        """SigLIP init (arXiv:2303.15343 §4): learnable bias b = -10 and
        temperature t' = log(10) — the sigmoid loss starts near the
        B-1-negatives-per-positive prior. The ONE place the paper's init
        constants live (train.py --loss siglip and the demo both use it)."""
        return self.replace(logit_bias_init=-10.0, logit_scale_init=math.log(10.0))


# The reference's CLIP clamp at ln(100) (training.py:173-178) would BIND
# under the sigmoid objective — SigLIP's released models converge near
# t~118 > e^4.61 and the paper applies no clamp — so siglip runs use this
# roomier bound (TrainConfig.logit_scale_max).
SIGLIP_LOGIT_SCALE_MAX = math.log(1000.0)


# Named presets. "mixer-b32" is the model the reference trained
# (training/training.py:275-287, 111M params); "transformer-b32" is its
# attention twin (training/validateModel.py:13-25, 151M params).
PRESETS = {
    "mixer-b32": CLIPConfig(tower="mixer"),
    "transformer-b32": CLIPConfig(tower="transformer"),
    # OpenAI ViT-B/32 geometry, for loading official checkpoints.
    "vit-b32": CLIPConfig(tower="transformer"),
    "vit-b16": CLIPConfig(tower="transformer", vision_patch_size=16),
    "vit-l14": CLIPConfig(
        tower="transformer",
        embed_dim=768,
        vision_layers=24,
        vision_width=1024,
        vision_patch_size=14,
        text_width=768,
        text_heads=12,
        text_layers=12,
    ),
    # Tiny twin for CPU smoke runs and launch rehearsals (full 49408 vocab so
    # the real tokenizer/data path applies; everything else minimal).
    "mixer-debug": CLIPConfig(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=16,
        text_width=64,
        text_heads=1,
        text_layers=2,
        tower="mixer",
        compute_dtype="float32",
    ),
    "rn50": CLIPConfig(
        tower="transformer",
        embed_dim=1024,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=None,
    ),
    # The rest of the OpenAI registry geometries (reference clip.py:31-41),
    # so every registry model can also be INITIALIZED/TRAINED from scratch —
    # checkpoint loading never needs these (models/convert.py shape-sniffs).
    "vit-l14-336": CLIPConfig(
        tower="transformer",
        embed_dim=768,
        image_resolution=336,
        vision_layers=24,
        vision_width=1024,
        vision_patch_size=14,
        text_width=768,
        text_heads=12,
        text_layers=12,
    ),
    "rn101": CLIPConfig(
        tower="transformer",
        embed_dim=512,
        vision_layers=(3, 4, 23, 3),
        vision_width=64,
        vision_patch_size=None,
    ),
    "rn50x4": CLIPConfig(
        tower="transformer",
        embed_dim=640,
        image_resolution=288,
        vision_layers=(4, 6, 10, 6),
        vision_width=80,
        vision_patch_size=None,
        text_width=640,
        text_heads=10,
    ),
    "rn50x16": CLIPConfig(
        tower="transformer",
        embed_dim=768,
        image_resolution=384,
        vision_layers=(6, 8, 18, 8),
        vision_width=96,
        vision_patch_size=None,
        text_width=768,
        text_heads=12,
    ),
    "rn50x64": CLIPConfig(
        tower="transformer",
        embed_dim=1024,
        image_resolution=448,
        vision_layers=(3, 15, 36, 10),
        vision_width=128,
        vision_patch_size=None,
        text_width=1024,
        text_heads=16,
    ),
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimisation hyperparameters (reference training/training.py:55-89)."""

    global_batch_size: int = 32768
    epochs: int = 32
    steps_per_epoch: Optional[int] = None  # derived from dataset if None
    learning_rate: float = 5e-4
    min_lr_ratio: float = 0.01  # min_lr = lr / 100 (training.py:86)
    warmup_steps: int = 2  # training.py:88
    weight_decay: float = 0.2  # masked, training.py:73
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    grad_clip_norm: float = 20.0  # training.py:181
    # Exact (GradCache-style two-pass) gradient accumulation: each step's
    # per-device batch is split into this many sequential microbatches with
    # activation memory of one microbatch, while the InfoNCE loss/gradient
    # still sees the step's FULL global batch (parallel/train_step.py). How
    # the reference's 32k global batch (training.py:56, 8xA100-80GB) fits
    # 16GB v5e chips. 1 = off.
    accum_steps: int = 1
    # FSDP / ZeRO-3: store parameters AND Adam moments sharded over the data
    # axis (parallel/fsdp.py) — XLA all-gathers weights just-in-time and
    # reduce-scatters gradients. Trains with the EXACT globally-coupled
    # InfoNCE gradient (grad_through_gather is implied). For models too big
    # to replicate per chip (vit-l14 and up); the 111M flagship doesn't need
    # it. Composes with accum_steps, and with tensor parallelism: on a mesh
    # with a >1 "model" axis the state is stored sharded over the FULL
    # (data x model) grid (parallel/fsdp.py merged specs). Mutually
    # exclusive with pipeline parallelism.
    fsdp: bool = False
    # Microbatches per step for pipeline parallelism (used when the Trainer's
    # mesh has a >1 "stage" axis — parallel/pp.py). Bubble fraction is
    # (S-1)/(n_micro+S-1); keep n_micro >= 4*stages.
    pipeline_microbatches: int = 8
    logit_scale_max: float = math.log(100.0)  # training.py:173-178 (ln(100))
    checkpoint_every_steps: int = 400  # training.py:197
    # orbax retention window (the reference keeps every checkpoint forever,
    # training.py:197-205 — bounded here so long runs don't fill the disk)
    keep_checkpoints: int = 3
    # Multi-host preemption agreement cadence (steps): every N steps all
    # processes OR their locally-received SIGTERM/SIGINT flags (a tiny
    # process_allgather) so the preemption checkpoint — a collective orbax
    # save — is entered by every worker at the SAME step. Single-process
    # runs act on the flag immediately and never pay the sync. Keep N small
    # relative to the preemption grace window (~30-90s).
    preemption_sync_every_steps: int = 20
    # validation cadence; None -> follow checkpoint_every_steps (the
    # reference couples them, training.py:197-205 — decoupled here by design)
    validate_every_steps: Optional[int] = None
    # Abort the run when a flushed loss is non-finite, BEFORE the boundary's
    # checkpoint save — a diverged step must not overwrite the last good
    # checkpoint (the retained-checkpoint window is finite). The reference
    # trains on through NaNs (training.py has no guard). Disable only for
    # divergence-debugging runs.
    abort_on_nonfinite_loss: bool = True
    # Also record frozen serving programs (aot.freeze_programs: per-bucket
    # jax.export encoders) into the completion export, so the release
    # artifact serves without re-tracing model code. Local lowering only —
    # no collectives; the Trainer rank-gates it on a pod.
    freeze_serving: bool = False
    # Fault injection for recovery drills (train.py --crash-after-steps):
    # raise RuntimeError (a restartable crash, unlike the non-finite abort's
    # EXIT_NONFINITE) after THIS PROCESS has executed N steps — an MTBF
    # simulation. Counted per process incarnation, not per global step, so a
    # supervised run crashes, resumes past the fault point, and crashes again
    # N steps later: each incarnation still makes checkpoint progress, which
    # is exactly what launch.supervise's progress-aware budget rewards.
    # None = off.
    crash_after_steps: Optional[int] = None
    # Stall-drill twin of crash_after_steps: after THIS PROCESS has executed
    # N steps, simulate a wedged accelerator — stay alive, stop making
    # progress, stop heartbeating, never exit (a hung device/tunnel RPC
    # blocks the loop exactly like this; SIGTERM sets the Trainer's stop
    # flag but the loop never reaches the check). Only an external watchdog
    # (supervise --stall-timeout) can clear it. None = off.
    hang_after_steps: Optional[int] = None
    # Contrastive objective: "info_nce" (the reference's softmax loss,
    # training.py:156-168) or "siglip" (pairwise sigmoid, ops/losses.py
    # siglip_loss — needs a model with logit_bias_init set). Applies to the
    # DP/TP, FSDP and PP steps, incl. the two-pass accumulation path.
    loss: str = "info_nce"
    # Exponential-moving-average of the post-step params (decay per STEP,
    # e.g. 0.9999; None = off). Carried inside opt_state (an ema_slot at the
    # end of the optax chain) so checkpoints, FSDP/PP shardings and resume
    # pick it up automatically; the Trainer validates and exports with the
    # averaged weights when enabled. No reference counterpart — standard
    # large-scale CLIP/SigLIP practice.
    ema_decay: Optional[float] = None
    # Locked-tower training (LiT, arXiv:2111.07991): freeze "visual" or
    # "text" — the frozen tower runs under stop_gradient (no backward
    # compute) and is masked OUT of AdamW (no moments allocated, no weight
    # decay drift); logit_scale/logit_bias stay trainable. Pair with
    # train.py --init-from to fine-tune one tower of a pretrained model.
    freeze: Optional[str] = None
    # In-graph training augmentation (ops/augment.py): per-sample random
    # crop to cfg.image_resolution + 50% horizontal flip, executed INSIDE
    # the jitted step keyed on (seed, step) — stateless, so kill-and-resume
    # replays the identical stream and DP-invariance holds. Requires the
    # data source to deliver images LARGER than the model resolution
    # (train.py --augment widens the pipeline decode size). The reference
    # trains without augmentation (training.py:115 uses the inference
    # preprocess) — this is an addition, off by default.
    augment: bool = False
    # Dispatch-depth throttle: the train loop deliberately avoids per-step
    # host syncs (metrics are buffered to checkpoint cadence), but JAX's
    # async dispatch then lets the host loop run arbitrarily far ahead of
    # the device — every enqueued step pins its full uint8 host batch in
    # transfer staging. At global batch 2048 that is ~0.3GB/step; measured
    # on the remote-TPU host: ~123GB RSS and an OOM kill ~310 steps into
    # the first flush window. Each step blocks on the loss of the step
    # N-max_inflight_steps back — a no-op while the device is the
    # bottleneck, pure backpressure when the host is. 2 = classic double
    # buffering; raise only on hosts with RAM to spare.
    max_inflight_steps: int = 2
    seed: int = 0
    # image normalisation applied inside the train step, NOT in preprocess
    # (reference keeps preprocess uint8 and normalises in-loop,
    # clip.py:85-86 / training.py:115,149)
    image_mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)

    def __post_init__(self):
        if self.loss not in ("info_nce", "siglip"):
            raise ValueError(f"loss must be 'info_nce' or 'siglip' (got {self.loss!r})")
        if self.freeze not in (None, "visual", "text"):
            raise ValueError(f"freeze must be 'visual' or 'text' (got {self.freeze!r})")
        if self.max_inflight_steps < 1:
            raise ValueError(
                f"max_inflight_steps must be >= 1 (got {self.max_inflight_steps})"
            )
        if self.ema_decay is not None and not (0.0 < self.ema_decay < 1.0):
            # decay=1.0 would freeze the EMA at the random init forever and
            # validation/export would silently ship untrained weights.
            raise ValueError(
                f"ema_decay must be in (0, 1) (got {self.ema_decay}); "
                "typical values 0.999-0.9999"
            )
