"""Device mesh + sharding helpers.

The reference's distribution story is HF Accelerate -> DDP -> NCCL
(training.py:64,93-95; launchJob.py:88-96). The TPU-native replacement is a
``jax.sharding.Mesh`` with XLA collectives over ICI — no custom backend.

The mesh is (data, model): the reference needs only data parallelism (111M
params — SURVEY §2.7), so ``model=1`` by default, but every entry point takes
the mesh so tensor-parallel shardings can be introduced without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        # derived split must use EVERY device — silently stranding chips
        # (8 devices, n_model=3 -> a 2x3 mesh idling 2 chips) is a paid-for
        # hardware bug, not a convenience.
        if len(devices) % n_model != 0:
            raise ValueError(f"{len(devices)} devices not divisible by n_model={n_model}")
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading dim = global batch) onto
    the mesh split over data. Per-host feeding for multi-host setups goes
    through jax.make_array_from_process_local_data."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:  # pragma: no cover - multihost only
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
