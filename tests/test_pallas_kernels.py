"""Pallas kernel parity tests (interpret mode on CPU).

On real TPU hardware these kernels were measured bit-close to the XLA paths
(preprocess: max abs diff 7e-7 fp32; fused LN+MLP: bf16 rounding only); the
interpret-mode tests here keep that parity pinned in CI without a TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # Force all pallas_call sites into interpreter mode on CPU.
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_preprocess_kernel_matches_xla_path():
    from clip_mixer_tpu.ops.pallas.preprocess_kernel import make_pallas_preprocess
    from clip_mixer_tpu.ops.preprocess import make_batch_preprocess

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    pk = make_pallas_preprocess((64, 64), 32, dtype=jnp.float32)
    ref = make_batch_preprocess((64, 64), 32, normalize=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pk(imgs)), np.asarray(ref(imgs)), atol=1e-5)


def test_fused_ln_mlp_matches_plain():
    from clip_mixer_tpu.ops.pallas.mlp_kernel import _plain_ln_mlp, fused_ln_mlp

    rng = np.random.default_rng(1)
    R, W = 256, 128
    ln = {
        "scale": jnp.asarray(rng.normal(1, 0.1, W), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.1, W), jnp.float32),
    }
    mlp = {
        "w_in": jnp.asarray(rng.normal(0, 0.05, (W, 4 * W)), jnp.float32),
        "b_in": jnp.asarray(rng.normal(0, 0.01, 4 * W), jnp.float32),
        "w_out": jnp.asarray(rng.normal(0, 0.05, (4 * W, W)), jnp.float32),
        "b_out": jnp.asarray(rng.normal(0, 0.01, W), jnp.float32),
    }
    x = jnp.asarray(rng.normal(0, 1, (R, W)), jnp.float32)
    got = np.asarray(fused_ln_mlp(ln, mlp, x, row_tile=128, hidden_chunks=4))
    want = np.asarray(_plain_ln_mlp(ln, mlp, x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fused_ln_mlp_grad_matches_plain():
    from clip_mixer_tpu.ops.pallas.mlp_kernel import _plain_ln_mlp, ln_mlp

    rng = np.random.default_rng(2)
    R, W = 128, 128
    ln = {
        "scale": jnp.ones((W,), jnp.float32),
        "bias": jnp.zeros((W,), jnp.float32),
    }
    mlp = {
        "w_in": jnp.asarray(rng.normal(0, 0.05, (W, 4 * W)), jnp.float32),
        "b_in": jnp.zeros((4 * W,), jnp.float32),
        "w_out": jnp.asarray(rng.normal(0, 0.05, (4 * W, W)), jnp.float32),
        "b_out": jnp.zeros((W,), jnp.float32),
    }
    x = jnp.asarray(rng.normal(0, 1, (R, W)), jnp.float32)

    g1 = jax.grad(lambda p, x: ln_mlp(p[0], p[1], x).sum(), argnums=(0, 1))((ln, mlp), x)
    g2 = jax.grad(lambda p, x: _plain_ln_mlp(p[0], p[1], x).sum(), argnums=(0, 1))((ln, mlp), x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_fused_mixer_block_matches_plain():
    from clip_mixer_tpu.models.mixer import init_mixer_block
    from clip_mixer_tpu.ops.pallas.block_kernel import _plain_block_tbd, fused_mixer_block_tbd

    T, B, D = 8, 16, 128
    params = init_mixer_block(jax.random.key(0), width=D, tokens=T, text_tower=True, n_layers=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (T, B, D)), jnp.float32)
    got = np.asarray(fused_mixer_block_tbd(params, x, batch_tile=8, hidden_chunks=2))
    want = np.asarray(_plain_block_tbd(params, x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mixer_tower_matches_plain_tower():
    from clip_mixer_tpu.models.mixer import init_mixer_tower, mixer_tower
    from clip_mixer_tpu.ops.pallas.block_kernel import mixer_tower_fused

    T, B, D = 8, 12, 128  # B=12 exercises the pad-to-batch_tile path
    tower = init_mixer_tower(jax.random.key(1), width=D, tokens=T, n_layers=2, text_tower=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, T, D)), jnp.float32)
    got = np.asarray(mixer_tower_fused(tower, x))
    want = np.asarray(mixer_tower(tower, x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mixer_block_grad_matches_plain():
    from clip_mixer_tpu.models.mixer import init_mixer_block
    from clip_mixer_tpu.ops.pallas.block_kernel import _plain_block_tbd, mixer_block_fused

    T, B, D = 8, 8, 128
    params = init_mixer_block(jax.random.key(4), width=D, tokens=T, text_tower=True, n_layers=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (T, B, D)), jnp.float32)

    g1 = jax.grad(lambda p, v: mixer_block_fused(p, v).sum(), argnums=(0, 1))(params, x)
    g2 = jax.grad(lambda p, v: _plain_block_tbd(p, v).sum(), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)
