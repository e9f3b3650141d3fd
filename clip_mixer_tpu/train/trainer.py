"""Trainer orchestration: epochs, checkpoint cadence, validation, metrics.

The reference Trainer (training/training.py:30-250) wires: data loading,
Accelerate/DDP, AdamW + warmup-cosine, the InfoNCE step, every-400-step
checkpoint + validation on rank 0, TensorBoard scalars (Loss / Learning rate
/ Gradient norm), and crash-resume via epoch.json + skip_first_batches.

Same behaviors here, TPU-native: the step is one jitted program over the
mesh (parallel/train_step.py), data comes from a DataSource with
deterministic skip, orbax handles state, and multi-host roles use
jax.process_index() == 0 in place of rank checks.
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Optional, Sequence

import jax
import numpy as np

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.data.pipeline import DataSource, prefetch
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.parallel.mesh import make_mesh, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.checkpoint import Checkpointer
from clip_mixer_tpu.train.metrics import MetricsWriter
from clip_mixer_tpu.train.optimizer import make_optimizer
from clip_mixer_tpu.train.schedule import warmup_cosine


def _pick_trace_start(step: int, n: int, cadences) -> int:
    """Step value S after which the profile trace should start.

    The trace then covers the N whole steps S+1..S+N *and* the host-side
    checkpoint/validation blocks of steps S..S+N-1 (the profiling hook runs
    before those blocks in the loop body). Pick the smallest S >= step+1
    whose covered block range [S, S+N-1] contains no multiple of any
    cadence, so a traced _flush_metrics device_get / orbax save / validator
    pass can't pollute the "N steady-state steps" contract (matters when
    resuming near a cadence boundary). If no clear window exists (n >= some
    cadence), fall back to step+1 and accept the overlap.
    """
    if not n:
        return step + 1
    for s0 in range(step + 1, step + 2 + max(cadences)):
        if all(s % c for c in cadences for s in range(s0, s0 + n)):
            return s0
    return step + 1


class Trainer:
    def __init__(
        self,
        cfg: CLIPConfig,
        tcfg: TrainConfig,
        data: DataSource,
        run_dir: str,
        mesh=None,
        validators: Sequence = (),
        resume: bool = True,
        grad_through_gather: bool = False,
        chunk_size: Optional[int] = None,
        params=None,
        verbose: bool = False,
        profile_steps: int = 0,
    ):
        self.cfg, self.tcfg, self.data = cfg, tcfg, data
        self.mesh = mesh if mesh is not None else make_mesh()
        self.verbose = verbose
        self.is_lead = jax.process_index() == 0
        # profile_steps > 0: capture a TensorBoard-viewable device trace of
        # that many steady-state steps (the run's second step onward, so the
        # first step's compile doesn't dominate the trace) to
        # {run_dir}/profile on the lead process (SURVEY §5: the reference
        # has no tracing at all).
        self.profile_steps = profile_steps
        self.run_dir = run_dir
        self._profile_dir = f"{run_dir}/profile"
        self._profiling = False
        # Liveness heartbeat for supervise --stall-timeout: a per-process
        # file whose mtime advances every step. With max_inflight_steps
        # bounding async dispatch, a wedged device/tunnel RPC blocks the
        # loop within that many steps and the beats STOP — which is what
        # makes hang detection possible at all (an unthrottled loop would
        # keep beating while enqueueing into a dead backend). Local run
        # dirs only: the watchdog reads mtimes off the local filesystem.
        self._heartbeat_path = (
            None if "://" in str(run_dir)
            else os.path.join(run_dir, f"heartbeat-{jax.process_index()}")
        )
        self._beat_degraded = False
        if self._heartbeat_path is None and verbose:
            print(
                "trainer: heartbeat disabled (remote run_dir) — supervise "
                "--stall-timeout hang detection will not work for this run"
            )

        steps_per_epoch = tcfg.steps_per_epoch or data.batches_per_epoch
        if steps_per_epoch is None:
            raise ValueError("steps_per_epoch unknown: set tcfg.steps_per_epoch or use a sized DataSource")
        self.steps_per_epoch = steps_per_epoch
        self.total_steps = steps_per_epoch * tcfg.epochs

        self.optimizer = make_optimizer(tcfg, self.total_steps)
        self._schedule = warmup_cosine(
            tcfg.learning_rate, tcfg.learning_rate * tcfg.min_lr_ratio, tcfg.warmup_steps, self.total_steps
        )
        self._chunk_size = chunk_size
        from clip_mixer_tpu.parallel.pp import STAGE_AXIS

        self._use_pp = STAGE_AXIS in self.mesh.axis_names and self.mesh.shape[STAGE_AXIS] > 1
        if self._use_pp:
            # Pipeline parallelism: tower blocks stage-sharded, GPipe
            # schedule (parallel/pp.py). Selected by the mesh itself — pass
            # make_pp_mesh(n_data, n_stage).
            from clip_mixer_tpu.parallel.pp import make_pp_train_step

            if tcfg.fsdp:
                raise ValueError("fsdp and pipeline parallelism are mutually exclusive")
            self.step_fn = make_pp_train_step(
                cfg, tcfg, self.mesh, self.optimizer,
                n_micro=tcfg.pipeline_microbatches,
                grad_through_gather=grad_through_gather,
                chunk_size=chunk_size,
                accum_steps=tcfg.accum_steps,
            )
        elif not tcfg.fsdp:
            self.step_fn = make_train_step(
                cfg, tcfg, self.mesh, self.optimizer, grad_through_gather, chunk_size,
                accum_steps=tcfg.accum_steps,
            )
        # else: the FSDP step needs the state pytree as a shape template —
        # built below, after init/restore.
        self.writer = MetricsWriter(log_dir=f"{run_dir}/runs" if self.is_lead else None)
        self.checkpointer = Checkpointer(
            f"{run_dir}/checkpoints", max_to_keep=tcfg.keep_checkpoints
        )
        self.validators = list(validators)
        # Validation cadence is decoupled from the checkpoint cadence (the
        # reference couples both at 400 steps, training.py:197-205).
        self.validate_every_steps = tcfg.validate_every_steps or tcfg.checkpoint_every_steps
        # Wire the run's metrics writer into validators once, at construction
        # (not mutated per validate call).
        for v in self.validators:
            if getattr(v, "writer", None) is None:
                v.writer = self.writer

        def build_state():
            p = clip_model.init(jax.random.key(tcfg.seed), cfg) if params is None else params
            return init_train_state(p, self.optimizer)

        def state_shardings(state_tree):
            """Per-leaf NamedShardings for the selected parallelism mode
            (works on real or abstract leaves)."""
            if self._use_pp:
                from clip_mixer_tpu.parallel.pp import pp_state_shardings

                return pp_state_shardings(self.mesh, state_tree)
            if tcfg.fsdp:
                from clip_mixer_tpu.parallel.fsdp import fsdp_state_shardings

                return fsdp_state_shardings(self.mesh, state_tree)
            from clip_mixer_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            return jax.tree.map(lambda _: rep, state_tree)

        self.start_epoch, self.start_batch = 0, 0
        if resume and self.checkpointer.latest_step() is not None:
            # Restore DIRECTLY into the mode's shardings: an abstract
            # template (eval_shape + the sharding trees) means the full
            # state is never materialised on host — orbax writes each
            # device's shards in place. The throwaway random init is
            # skipped entirely.
            abstract = jax.eval_shape(build_state)
            template = jax.tree.map(
                lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
                abstract,
                state_shardings(abstract),
            )
            self.state, self.start_epoch, self.start_batch = self.checkpointer.restore(template)
            if self.verbose and self.is_lead:
                print(f"Resuming from epoch {self.start_epoch}, batch {self.start_batch}")
        else:
            state = build_state()
            self.state = jax.tree.map(jax.device_put, state, state_shardings(state))

        if tcfg.fsdp and not self._use_pp:
            from clip_mixer_tpu.parallel.fsdp import make_fsdp_train_step

            self.step_fn = make_fsdp_train_step(
                cfg, tcfg, self.mesh, self.optimizer, self.state,
                chunk_size=chunk_size, accum_steps=tcfg.accum_steps,
            )

    @property
    def global_step(self) -> int:
        return int(jax.device_get(self.state.step))

    def train(self) -> None:
        first_caption_logged = -1
        # Preemption safety: TPU slices get SIGTERM'd (maintenance events,
        # spot reclaims). Losing everything since the last cadence save is
        # avoidable — mark the request, checkpoint at a step boundary, then
        # exit the loop cleanly. Orbax saves are collective, so in multi-host
        # runs the stop decision must be AGREED at an identical step on every
        # worker: signals land at different wall-clock loop positions per
        # host, and an unagreed save would be a mismatched/one-sided
        # collective (hang until SIGKILL). _stop_agreed below ORs the local
        # flags across processes at a fixed step cadence. Handlers only
        # install in the main thread (signal.signal raises elsewhere) and are
        # restored on exit; a second SIGINT escalates to KeyboardInterrupt so
        # an interactive Ctrl-C Ctrl-C still kills a wedged run.
        import signal
        import threading

        stop_requested = threading.Event()
        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            def _request_stop(signum, frame):
                if stop_requested.is_set() and signum == signal.SIGINT:
                    raise KeyboardInterrupt
                stop_requested.set()

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)
        try:
            self._train_loop(first_caption_logged, stop_requested)
        finally:
            if self._profiling:  # loop left early mid-capture
                jax.profiler.stop_trace()
                self._profiling = False
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)

    def _beat(self) -> None:
        """Touch the per-process heartbeat file (one utime syscall — free
        next to a train step). Failures are swallowed: liveness reporting
        must never be able to kill the training it reports on."""
        if self._heartbeat_path is None:
            return
        try:
            os.utime(self._heartbeat_path, None)
        except OSError:
            try:
                os.makedirs(self.run_dir, exist_ok=True)
                # Append a byte, don't just open: when the file exists but
                # utime fails persistently (EPERM on a foreign-owned file,
                # read-only remount) a bare open("a") would NOT advance
                # mtime — beats would silently freeze and the stall
                # watchdog would kill a healthy run.
                with open(self._heartbeat_path, "a") as f:
                    f.write(".")
                    f.flush()
                if not self._beat_degraded:
                    self._beat_degraded = True
                    print(
                        f"trainer: heartbeat degraded to append-writes "
                        f"(os.utime failed on {self._heartbeat_path})"
                    )
            except OSError:
                pass

    def _stop_agreed(self, stop_requested, step: int) -> bool:
        """Whether to act on a pending stop request at this step.

        Single process: act immediately. Multi-process: every
        preemption_sync_every_steps, OR the local flags across processes —
        every host executes this collective at the same loop step, so a True
        verdict commits ALL hosts to the same preemption save. The cadence
        bounds the sync cost; keep it small relative to the preemption grace
        window (20 steps at ~0.5s/step ≈ 10s against a 30-90s window).
        """
        if jax.process_count() == 1:
            return stop_requested.is_set()
        if step % self.tcfg.preemption_sync_every_steps != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([stop_requested.is_set()], np.bool_)
        )
        return bool(np.any(flags))

    def _preemption_exit(self, pending, epoch: int, batch_idx: int, step: int) -> None:
        """Persist the completed step and leave — a restarted Trainer resumes
        from exactly here (batch_idx already points at the NEXT batch, the
        same contract as the cadence save)."""
        self._flush_metrics(pending)
        if self.checkpointer.latest_step() != step:
            self.save(epoch, batch_idx)
        self.checkpointer.wait()
        self.writer.flush()
        if self.verbose and self.is_lead:
            print(f"preemption save: step {step} (epoch {epoch}, batch {batch_idx})", flush=True)

    def _train_loop(self, first_caption_logged: int, stop_requested) -> None:
        # Host-side step counter (== state.step at all times): fetching
        # state.step from the device every iteration would force a host-device
        # sync and defeat async dispatch.
        step = self.global_step
        resume_step = step  # for crash_after_steps (steps THIS process ran)
        # Steady-state profile window: start after step+1 (which pays the
        # compile), and slide the window forward so it contains no checkpoint
        # or validation step — a traced _flush_metrics device_get / orbax
        # save / validator pass would pollute the "N steady-state steps"
        # contract (matters when resuming near a cadence boundary).
        self._trace_start_after = _pick_trace_start(
            step,
            self.profile_steps,
            (self.tcfg.checkpoint_every_steps, self.validate_every_steps),
        )
        # Single process: let a stop request also interrupt a BLOCKED data
        # wait (stalled tar read / dead decode worker) so the preemption save
        # happens within the grace window even when input-bound. Multi-host
        # keeps the blocking wait: an early per-host exit could not reach the
        # collective save anyway — agreement happens at step boundaries.
        prefetch_stop = stop_requested if jax.process_count() == 1 else None
        self._beat()  # init/restore done — stall clock starts at the loop
        for epoch in range(self.start_epoch, self.tcfg.epochs):
            start_batch = self.start_batch if epoch == self.start_epoch else 0
            batch_idx = start_batch
            t0 = time.monotonic()
            steps_since_t0 = 0
            pending = []  # (step, metrics) awaiting device_get at cadence
            # Bounded dispatch depth (tcfg.max_inflight_steps): without it
            # the loop enqueues steps as fast as the data source gathers
            # them, and every in-flight step pins its host batch in transfer
            # staging — measured OOM at ~310 x 0.3GB on the dress rehearsal.
            # Blocking on a METRICS scalar (not the state) keeps the next
            # step's dispatch off the critical path.
            inflight: deque = deque()
            for host_batch in prefetch(self.data.iter_batches(epoch, start_batch), stop=prefetch_stop):
                # Per-epoch cap checked BEFORE stepping (the reference's
                # iterationPerEpoch break, training.py:192-194): resuming from
                # an epoch-boundary checkpoint must not train an extra step.
                if batch_idx >= self.steps_per_epoch:
                    break
                if batch_idx == start_batch:
                    # Out-of-range token ids silently become NaN embeddings
                    # (jnp.take fill mode) — catch the config/data mismatch on
                    # the first batch instead of debugging a NaN loss.
                    max_id = int(np.max(host_batch["texts"]))
                    if max_id >= self.cfg.vocab_size:
                        raise ValueError(
                            f"token id {max_id} >= vocab_size {self.cfg.vocab_size}: "
                            "the data pipeline tokenizes with the full 49408-token CLIP "
                            "vocabulary; configure the model accordingly"
                        )
                if self.verbose and self.is_lead and first_caption_logged < epoch:
                    first_caption_logged = epoch  # reference logs the first caption per epoch (training.py:150-152)
                    print(f"epoch {epoch}: first batch images {host_batch['images'].shape}")
                batch = shard_batch(self.mesh, dict(host_batch))
                self.state, metrics = self.step_fn(self.state, batch)
                batch_idx += 1
                step += 1
                steps_since_t0 += 1
                # EVERY process buffers (device arrays; no sync): the
                # non-finite check in _flush_metrics must fire on all hosts
                # so they exit EXIT_NONFINITE together — if only the lead
                # raised, the other workers would die in the collective save
                # with a generic rc and their supervisors would restart them
                # into a dead rendezvous while the lead's supervisor stopped.
                pending.append((step, metrics))
                inflight.append(metrics["loss"])
                if len(inflight) > self.tcfg.max_inflight_steps:
                    jax.block_until_ready(inflight.popleft())
                # Beat AFTER the throttle: a wedged backend blocks above
                # within max_inflight_steps steps, so the beats stop too.
                self._beat()
                if self.profile_steps and self.is_lead:
                    # Trace covers exactly N whole steps after
                    # _trace_start_after (chosen above to dodge checkpoint /
                    # validation steps); block at both edges so the capture
                    # holds exactly N steady-state steps of device work.
                    if step == self._trace_start_after and not self._profiling:
                        jax.block_until_ready(self.state)
                        jax.profiler.start_trace(self._profile_dir)
                        self._profiling = True
                    elif self._profiling and step == self._trace_start_after + self.profile_steps:
                        jax.block_until_ready(self.state)
                        jax.profiler.stop_trace()
                        self._profiling = False
                        if self.verbose:
                            print(f"profile: {self.profile_steps} steps traced to {self._profile_dir}")

                if step % self.tcfg.checkpoint_every_steps == 0:
                    self._flush_metrics(pending)
                    pending = []
                    dt = time.monotonic() - t0
                    if self.is_lead and steps_since_t0 and dt > 0:
                        ips = steps_since_t0 * self.tcfg.global_batch_size / dt
                        # wall-clock global throughput over the window —
                        # includes data waits, so an input-bound run shows
                        # up here, not just in device profiles
                        self.writer.add_scalar("Throughput (imgs/s)", ips, step)
                        if self.verbose:
                            print(f"step {step}: loss {float(metrics['loss']):.4f}  {ips:.0f} imgs/s")
                    self.writer.flush()  # metrics.jsonl stays live mid-run
                    self.save(epoch, batch_idx)
                    t0 = time.monotonic()
                    steps_since_t0 = 0
                if self.tcfg.crash_after_steps is not None and (
                    step - resume_step
                ) == self.tcfg.crash_after_steps:
                    # Fault injection (recovery drills): a hard crash AFTER
                    # this process executed N steps (incl. cadence work above).
                    # RuntimeError -> generic nonzero exit, which
                    # launch.supervise treats as restartable (unlike the
                    # non-finite FloatingPointError). Let any in-flight async
                    # orbax save commit first: the drill rehearses
                    # restart+resume, and an un-awaited save dies with the
                    # interpreter — every relaunch would then restart from the
                    # same (or no) checkpoint and the drill could never
                    # progress past the injection point.
                    self.checkpointer.wait()
                    raise RuntimeError(
                        f"fault injection: crashing at step {step} after "
                        f"{self.tcfg.crash_after_steps} steps this process "
                        "(crash_after_steps)"
                    )
                if self.tcfg.hang_after_steps is not None and (
                    step - resume_step
                ) == self.tcfg.hang_after_steps:
                    # Fault injection (stall drills): simulate a wedged
                    # accelerator/tunnel RPC — alive, no progress, no
                    # heartbeats, never exits. SIGTERM sets stop_requested
                    # but this loop never reaches the check (PEP 475
                    # restarts the sleep), which is faithful to a real hang:
                    # only supervise --stall-timeout's escalation clears it.
                    self.checkpointer.wait()  # like the crash drill: let the
                    # in-flight async save commit so the relaunch can resume
                    if self.verbose and self.is_lead:
                        print(f"fault injection: hanging at step {step} (hang_after_steps)", flush=True)
                    while True:
                        time.sleep(3600)
                # Stop check BEFORE validation: a validation pass (host
                # all-gather of params + every validator) can take minutes at
                # scale and would eat the whole preemption grace window
                # before the checkpoint is written.
                if self._stop_agreed(stop_requested, step):
                    self._preemption_exit(pending, epoch, batch_idx, step)
                    return
                if step % self.validate_every_steps == 0:
                    self.validate(step)
                    self._beat()  # a long validation pass is not a stall
            self._flush_metrics(pending)
            if prefetch_stop is not None and stop_requested.is_set():
                # The data wait was interrupted (or the source ended with a
                # stop pending): save mid-epoch instead of rolling into the
                # next epoch's iterator.
                self._preemption_exit([], epoch, batch_idx, step)
                return
            self.start_batch = 0
        # Final save unless the cadence save already captured this exact step
        # (orbax would silently skip a duplicate step id).
        if self.checkpointer.latest_step() != step:
            self.save(self.tcfg.epochs, 0)
        self.checkpointer.wait()
        self.export()
        self.writer.flush()

    def _flush_metrics(self, pending) -> None:
        """device_get buffered per-step metrics in one sync (same scalar set
        as training.py:188-190)."""
        if not pending:
            return
        values = jax.device_get([m for _, m in pending])
        if self.tcfg.abort_on_nonfinite_loss:
            # Check BEFORE the caller's checkpoint save: aborting here keeps
            # the last good checkpoint alive (a NaN'd AdamW update poisons
            # every param; saving it would evict good history). Multi-host:
            # the loss is replicated and training is bitwise deterministic,
            # so EVERY process (all of them buffer pending) sees the same
            # value at the same step and raises here — before anyone enters
            # the collective save — and train.py turns it into the same
            # EXIT_NONFINITE on every worker, stopping every per-worker
            # supervisor instead of only the lead's.
            for (s, _), m in zip(pending, values):
                if not np.isfinite(m["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss {float(m['loss'])} at step {s}; aborting before "
                        "this boundary's checkpoint so the last good one survives. "
                        "Resume from it with a lower lr / longer warmup "
                        "(set abort_on_nonfinite_loss=False to train through)."
                    )
        if not self.is_lead:
            return
        for (s, _), m in zip(pending, values):
            self.writer.add_scalar("Loss", float(m["loss"]), s)
            self.writer.add_scalar("Learning rate", float(self._schedule(s - 1)), s)
            self.writer.add_scalar("Gradient norm", float(m["grad_norm"]), s)
            self.writer.add_scalar("Logit scale", float(m["logit_scale"]), s)
            if "logit_bias" in m:
                # siglip: the bias is the saddle diagnostic (OPERATIONS.md —
                # feature learning starts once loss < ln(B-1)+1)
                self.writer.add_scalar("Logit bias", float(m["logit_bias"]), s)

    def save(self, epoch: int, batch_idx: int) -> None:
        self.checkpointer.save(self.state, epoch=epoch, step=batch_idx)

    def export(self, path: Optional[str] = None) -> str:
        """Write the inference-ready export (save_pretrained layout:
        config.json + params-only orbax) that the rest of the stack
        consumes — api.load, `eval.py --model`, `serving --model`
        (`outputs/<run>/export`). Training checkpoints hold the full
        optimizer state in the run's shardings and are NOT loadable by the
        inference API; this is the bridge, written automatically when
        training completes (the reference leaves trained weights inside
        Accelerate state dirs, validateModel.py:48-50). Multi-host safe:
        params are gathered on device on every process and EVERY process
        enters save_pretrained — the orbax save inside is a collective
        (primary host writes, all hosts synchronize); rank-gating it would
        deadlock the lead at the save barrier."""
        path = path or f"{self.run_dir}/export"
        params = self._host_params()
        from clip_mixer_tpu.api import save_pretrained

        save_pretrained(params, self.cfg, path)
        if self.tcfg.freeze_serving and jax.process_index() == 0:
            # pure local lowering (no collectives) — rank-gated so N pod
            # workers don't race on the same servable/ files
            from clip_mixer_tpu.aot import freeze_programs

            freeze_programs(params, self.cfg, path)
        return path

    def _host_params(self):
        """Fetch the EVAL params to host memory: the EMA average when
        tcfg.ema_decay is set (that is what the average exists for —
        validation and the serving export both see it; the raw params keep
        training and stay in the checkpoints), else the live params. Under
        FSDP/PP the state is sharded across devices (possibly across hosts,
        where device_get on non-addressable shards raises) — an identity jit
        with replicated out_shardings all-gathers on device first, making
        every shard host-addressable (the EMA tree mirrors the param
        structure and shardings, so the same path covers it)."""
        params = self.state.params
        if self.tcfg.ema_decay:
            from clip_mixer_tpu.parallel.train_step import ema_params

            ema = ema_params(self.state)
            if ema is not None:
                params = ema
        if self._use_pp or self.tcfg.fsdp:
            if not hasattr(self, "_replicate_fn"):
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                self._replicate_fn = jax.jit(lambda x: x, out_shardings=rep)
            params = self._replicate_fn(params)
        return jax.device_get(params)

    def validate(self, step: int) -> None:
        """Rank-0 validation pass over all registered validators
        (training.py:211-216). The live params are passed explicitly — the
        validator's own params (if any) are untouched."""
        if not self.validators:
            return
        params = self._host_params()
        if not self.is_lead:
            return
        for v in self.validators:
            v.validate(step, verbose=self.verbose, params=params)
