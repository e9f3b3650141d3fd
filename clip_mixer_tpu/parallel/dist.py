"""Multi-host bootstrap.

On a Cloud TPU pod slice, ``jax.distributed.initialize()`` auto-discovers the
slice topology from TPU metadata (the NCCL/MASTER_ADDR rendezvous of the
reference's launchJob.py:134-138 has no TPU equivalent to configure). On a
single host or in non-TPU environments initialization is unnecessary and can
raise — hence the guarded helper every entry point calls.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(
    verbose: bool = False,
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Call jax.distributed.initialize() when a multi-host environment is
    detectable; no-op otherwise. Returns True if initialized.

    Explicit ``coordinator``/``num_processes``/``process_id`` force an
    initialization with a known rendezvous — the launch-rehearsal path
    (launch.rehearse_local) and any cluster whose topology JAX cannot
    auto-discover."""
    import jax

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        if verbose:
            print(
                f"jax.distributed initialized (explicit): process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
        return True

    multi_host_hint = any(
        os.environ.get(k)
        for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if not multi_host_hint:
        return False
    # Already initialized? Probe the distributed runtime state, NOT
    # jax.process_count(): process_count() initializes the XLA backend, and
    # jax.distributed.initialize() refuses to run after ANY backend-touching
    # call — probing with it would make auto-init fail on every real pod
    # worker and turn the expect_multi branch below into a guaranteed crash.
    try:
        if jax.distributed.is_initialized():
            return True
    except AttributeError:  # older jax — private fallback
        try:
            from jax._src import distributed as _distributed

            if getattr(_distributed.global_state, "client", None) is not None:
                return True
        except Exception:
            pass
    # A single-host TPU VM also sets TPU_WORKER_HOSTNAMES (one entry), and
    # initialize() can raise there — benign. But when the env names MULTIPLE
    # workers, a failed rendezvous must be FATAL: swallowing it would let
    # every worker proceed as an independent single-host replica (silently
    # wrong training) or hang later deep inside a collective.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    expect_multi = len([h for h in hostnames.split(",") if h.strip()]) > 1 or any(
        os.environ.get(k) for k in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize()
        if verbose:
            print(
                f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}"
            )
        return True
    except Exception as e:
        if "already" in str(e).lower() or "once" in str(e).lower():
            return True  # raced/duplicate initialize — the runtime is up
        if expect_multi:
            raise RuntimeError(
                f"multi-host environment detected ({hostnames!r}) but "
                f"jax.distributed.initialize() failed: {e}"
            ) from e
        if verbose:
            print(f"jax.distributed.initialize skipped (single-host hint vars): {e}")
        return False
