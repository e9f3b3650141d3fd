"""Parallelism: mesh + DP/TP shard_map step, FSDP/ZeRO-3, pipeline stages.

Four composable axes (SCALING.md "The mesh"):
  data  — batch parallelism (parallel.mesh / parallel.train_step)
  model — megatron tensor parallelism (parallel.tp)
  FSDP  — ZeRO-3 state sharding over data (parallel.fsdp)
  stage — GPipe pipeline parallelism (parallel.pp)
"""

from clip_mixer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from clip_mixer_tpu.parallel.train_step import (
    TrainState,
    init_train_state,
    make_eval_forward,
    make_train_step,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "TrainState",
    "init_train_state",
    "make_eval_forward",
    "make_train_step",
]
