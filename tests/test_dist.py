"""Multi-host bootstrap gates (parallel/dist.maybe_initialize_distributed).

The auto-init path must not touch the XLA backend before calling
jax.distributed.initialize(): initialize() refuses to run after any
backend-initializing call (jax.process_count(), jax.devices(), ...), so a
probe-first ordering would crash every real pod worker. These tests pin the
ordering and the fatal-vs-benign failure split.
"""

import jax
import pytest

from clip_mixer_tpu.parallel.dist import maybe_initialize_distributed


@pytest.fixture
def no_backend_probes(monkeypatch):
    """Make any backend-touching probe an error (the ordering regression):
    jax.distributed.initialize() refuses to run after ANY of these."""
    def _boom(*a, **k):
        raise AssertionError("backend touched before jax.distributed.initialize()")

    for name in (
        "process_count",
        "process_index",
        "devices",
        "local_devices",
        "device_count",
        "local_device_count",
    ):
        monkeypatch.setattr(jax, name, _boom)


def test_no_hints_is_noop(monkeypatch):
    for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert maybe_initialize_distributed() is False


def test_multi_worker_hint_initializes_before_any_backend_touch(
    monkeypatch, no_backend_probes
):
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: calls.append(1))
    assert maybe_initialize_distributed() is True
    assert calls == [1]


def test_multi_worker_rendezvous_failure_is_fatal(monkeypatch, no_backend_probes):
    """N>1 workers + failed rendezvous must raise — swallowing it would let
    every worker train as an independent replica (silently wrong)."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")

    def _fail(*a, **k):
        raise RuntimeError("rendezvous timed out")

    monkeypatch.setattr(jax.distributed, "initialize", _fail)
    with pytest.raises(RuntimeError, match="multi-host environment detected"):
        maybe_initialize_distributed()


def test_single_worker_hint_failure_is_benign(monkeypatch, no_backend_probes):
    """A single-host TPU VM also sets TPU_WORKER_HOSTNAMES (one entry);
    initialize() raising there must degrade to single-process mode."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0")
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)

    def _fail(*a, **k):
        raise RuntimeError("must be called before any JAX calls")

    monkeypatch.setattr(jax.distributed, "initialize", _fail)
    assert maybe_initialize_distributed() is False


def test_already_initialized_short_circuits(monkeypatch, no_backend_probes):
    from jax._src import distributed as _distributed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    monkeypatch.setattr(_distributed.global_state, "client", object(), raising=False)

    def _fail(*a, **k):
        raise AssertionError("initialize() called despite live client")

    monkeypatch.setattr(jax.distributed, "initialize", _fail)
    assert maybe_initialize_distributed() is True
