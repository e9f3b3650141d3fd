"""Checkpoint save/resume via orbax — sharded, async-capable, GCS-capable.

Replaces the reference's Accelerate save_state + epoch.json sidecar + Azure
blob mirroring (training.py:218-250,263-268). Semantics preserved:

* each save captures model params, optimizer state, and step counter plus an
  ``{"epoch": E, "step": S}`` metadata record (the epoch.json equivalent,
  training.py:224-227);
* restore returns ``(state, epoch, step)`` so the trainer can fast-forward
  the data pipeline deterministically (the skip_first_batches equivalent,
  training.py:106-113,131);
* no checkpoint found -> None (fresh start, training.py:248-250).

orbax writes natively to GCS paths (gs://...) the way the reference mirrored
files to Azure blobs; no extra upload loop is needed.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from clip_mixer_tpu.parallel.train_step import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        directory = os.fspath(directory)
        if not directory.startswith("gs://"):
            directory = os.path.abspath(directory)
            os.makedirs(directory, exist_ok=True)
        self._cleanup_interrupted_saves(directory)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    @staticmethod
    def _cleanup_interrupted_saves(directory: str) -> None:
        """Remove ``<step>.orbax-checkpoint-tmp*`` dirs a SIGKILLed save left
        behind (exactly what a preempted pod leaves: a crashed dress
        rehearsal left ``400.orbax-checkpoint-tmp`` mid-write). Correctness
        does not depend on this — ``latest_step()`` ignores tmp dirs, so
        resume falls back to the previous complete step, and a later save of
        the same id reuses/clears the tmp (tests/test_checkpoint.py) — but
        an uncleaned tmp dir holds a partial copy of the full train state
        (params + Adam moments: ~GBs at full scale) in dead disk, and
        operators reading the run dir should see only real checkpoints.
        Lead-process only under multi-host (process 0 owns the directory,
        mirroring orbax's own primary-host item handling)."""
        if jax.process_index() != 0:
            return
        import shutil

        try:
            entries = os.listdir(directory)
        except OSError:
            return
        for e in entries:
            if ".orbax-checkpoint-tmp" in e:
                path = os.path.join(directory, e)
                if os.path.isdir(path):
                    shutil.rmtree(path, ignore_errors=True)

    def save(self, state: TrainState, epoch: int, step: int, step_id: Optional[int] = None) -> None:
        """step = batch index to resume from within ``epoch`` (the epoch.json
        contract); step_id = monotonically-increasing checkpoint id (defaults
        to the optimizer's global step so ids never collide across epochs)."""
        if step_id is None:
            step_id = int(jax.device_get(state.step))
        self._mgr.save(
            step_id,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state._asdict()),
                meta=ocp.args.JsonSave({"epoch": int(epoch), "step": int(step)}),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        """Retained step ids (bounded by max_to_keep)."""
        return sorted(self._mgr.all_steps())

    def restore(self, abstract_state: TrainState) -> Optional[Tuple[TrainState, int, int]]:
        """abstract_state: a TrainState of real or jax.ShapeDtypeStruct leaves
        defining shapes/dtypes/shardings to restore into."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state._asdict())
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        state = TrainState(**restored["state"])
        meta = restored["meta"]
        return state, int(meta["epoch"]), int(meta["step"])

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
