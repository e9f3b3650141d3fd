"""Test configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE jax is imported anywhere, so
multi-chip sharding tests run on any machine — the TPU-native answer to
"test multi-node without a cluster" (the reference has no distributed tests at
all; multi-node was only exercised by real AzureML jobs, launchJob.py).
"""

import os
import sys
import types

# Force-override: the machine environment pins JAX_PLATFORMS=axon (the TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so the env
# var alone is read too late — update the live jax config as well. Tests run
# on CPU for determinism and full-precision f32 (TPU f32 matmuls use reduced
# precision by default).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def install_ftfy_stub():
    """Identity ftfy stub so the reference tokenizer can run as a test oracle.

    Both our tokenizer and the oracle then skip mojibake repair, keeping the
    comparison apples-to-apples on this machine (ftfy is not installed here).
    """
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
