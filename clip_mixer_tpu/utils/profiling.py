"""Profiling + step-time metering.

The reference has no tracing (SURVEY §5 — only tqdm throttling). Here:
``trace()`` wraps jax.profiler for TensorBoard-viewable device traces, and
``StepTimer`` is the imgs/sec-per-chip meter for perf scripts and ad-hoc
runs. (bench.py itself measures with a loop-carried jitted chain instead —
wall-clock tick meters lie on the remote-dispatch tunnel; see bench.py.)
"""

from __future__ import annotations

import time
from typing import Optional

import jax


def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin.
    Thin alias of ``jax.profiler.trace`` (kept as the framework's single
    documented entry point for tracing)."""
    return jax.profiler.trace(log_dir)


def slope_time(run, n1: int = 5, n2: int = 45) -> float:
    """Per-iteration time of a loop-carried jitted chain, by slope.

    ``run(n)`` must execute an n-iteration on-device chain (each iteration
    consuming the previous result) and return a scalar to fetch. Timing the
    DIFFERENCE between an n2- and an n1-chain cancels dispatch/tunnel
    overhead — the only honest timing method on remote-dispatch devices
    (CLAUDE.md; used by bench.py and the perf scripts)."""
    float(run(2))  # compile + warm
    t0 = time.perf_counter()
    float(run(n1))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(n2))
    d2 = time.perf_counter() - t0
    return (d2 - d1) / (n2 - n1)


def chained_train_time(
    params,
    opt_state,
    opt,
    logit_scale_max: float,
    loss_and_grads,
    batch,
    n1: int = 3,
    n2: int = 13,
) -> float:
    """Seconds per full train step (grads + optimizer update + clamp), via a
    loop-carried jitted chain — THE shared implementation of the train-step
    timing methodology (bench.py detail number and the perf scripts), so the
    chain's load-bearing details (state threads through the loop; nothing
    loop-invariant; scalar fetch forces the chain) live in one place.

    ``loss_and_grads(params, *batch) -> (loss, grads)`` defines the step's
    backward; ``batch`` is a tuple of device arrays passed as EXPLICIT jit
    arguments — a closed-over device batch is inlined as an HLO constant,
    and at B=2048 the ~400MB uint8 constant exceeds the remote-compile
    tunnel's payload cap (HTTP 413). Perturbation is unnecessary — the
    params carry changes every iteration."""
    import jax.numpy as jnp
    import optax

    @jax.jit
    def chained(state, batch_args, n):
        def body(_, carry):
            p, o = carry
            _, grads = loss_and_grads(p, *batch_args)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            p = dict(p)
            p["logit_scale"] = jnp.minimum(p["logit_scale"], logit_scale_max)
            return (p, o)

        p, o = jax.lax.fori_loop(0, n, body, state)
        return p["logit_scale"].astype(jnp.float32)  # forces the chain

    return slope_time(
        lambda n: chained((params, opt_state), tuple(batch), jnp.int32(n)), n1, n2
    )


class StepTimer:
    """Rolling steps/sec + imgs/sec/chip meter.

    Call ``tick()`` once per completed (blocked-on) step. Warmup steps are
    excluded so compile time never pollutes the rate.
    """

    def __init__(self, global_batch_size: int, warmup_steps: int = 2):
        self.global_batch_size = global_batch_size
        self.warmup = warmup_steps
        self.n_chips = jax.device_count()
        self._count = 0
        # warmup_steps=0: the construction time is the reference point
        self._t0: float = time.perf_counter()

    def tick(self) -> Optional[dict]:
        self._count += 1
        if self._count <= self.warmup:
            self._t0 = time.perf_counter()
            return None
        steps = self._count - self.warmup
        dt = time.perf_counter() - self._t0
        if dt <= 0:
            return None
        sps = steps / dt
        return {
            "steps_per_sec": sps,
            "imgs_per_sec": sps * self.global_batch_size,
            "imgs_per_sec_per_chip": sps * self.global_batch_size / self.n_chips,
        }
