"""Fused LN + channel-MLP Pallas kernel — the Mixer's FLOPs hot spot.

One mixer channel-mix (reference model.py:210-217: x + lin4(gelu(lin3(LN(x)))))
moves ~157MB of hidden activations [B*T, 4W] through HBM per block when the
two matmuls are separate XLA ops (the gelu fuses into the producer, but the
consumer matmul must re-read h). This kernel chunks the hidden dimension so
h lives only in VMEM:

    grid = (R/Rt, K)   # K chunks of the 4W hidden dim; K axis accumulates
    per step: acc += gelu(LN(x_tile) @ w_in[:, k]) @ w_out[k, :]
    last step: out = x_tile + acc + b_out     (residual + bias epilogue)

LN(x_tile) is computed once per row-tile (at k==0) into a VMEM scratch and
reused across hidden chunks. All matmuls accumulate in f32 on the MXU; the
residual add also runs in f32 before the bf16 store.

The backward pass reuses the plain-JAX ops via custom_vjp (XLA's backward is
matmul-bound, which it schedules well); the kernel is the inference/forward
fast path.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_mixer_tpu.models.layers import layer_norm, quick_gelu


def _kernel(x_ref, scale_ref, bias_ref, win_ref, bin_ref, wout_ref, bout_ref, out_ref, y_scratch, acc_scratch):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        # fp32-internal LN (reference model.py:166-172), once per row tile.
        x32 = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
        y_scratch[...] = y.astype(y_scratch.dtype)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    h = jnp.dot(y_scratch[...], win_ref[...], preferred_element_type=jnp.float32)
    h = h + bin_ref[...].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(win_ref.dtype)  # QuickGELU
    acc_scratch[...] += jnp.dot(h, wout_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        res = x_ref[...].astype(jnp.float32) + acc_scratch[...] + bout_ref[...].astype(jnp.float32)
        out_ref[...] = res.astype(out_ref.dtype)


def fused_ln_mlp(
    ln_params: Dict,
    mlp_params: Dict,
    x: jnp.ndarray,
    row_tile: int | None = None,
    hidden_chunks: int = 4,
) -> jnp.ndarray:
    """x: [R, W] (R % row_tile == 0). Returns x + MLP(LN(x)), bf16/f32-safe.

    mlp_params: {"w_in": [W, H], "b_in": [H], "w_out": [H, W], "b_out": [W]}.
    """
    R, W = x.shape
    H = mlp_params["w_in"].shape[1]
    if row_tile is None:
        # largest divisor of R up to 512 (R is rarely a multiple of 512 —
        # e.g. B*T = 32*50 = 1600)
        row_tile = next((t for t in (512, 400, 320, 256, 200, 160, 128, 100, 80, 64, 50, 32, 25, 16, 8) if R % t == 0), R)
    assert R % row_tile == 0, (R, row_tile)
    assert H % hidden_chunks == 0
    hc = H // hidden_chunks
    dt = x.dtype

    return pl.pallas_call(
        _kernel,
        grid=(R // row_tile, hidden_chunks),
        in_specs=[
            pl.BlockSpec((row_tile, W), lambda r, k: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda r, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda r, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, hc), lambda r, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda r, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, W), lambda r, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda r, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, W), lambda r, k: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), dt),
        scratch_shapes=[
            pltpu.VMEM((row_tile, W), dt),
            pltpu.VMEM((row_tile, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * W * H * 2,
            bytes_accessed=R * W * 2 * 2 + (W * H * 2) * 2,
            transcendentals=R * H,
        ),
    )(
        x,
        ln_params["scale"].astype(dt)[None],
        ln_params["bias"].astype(dt)[None],
        mlp_params["w_in"].astype(dt),
        mlp_params["b_in"].astype(dt)[None],
        mlp_params["w_out"].astype(dt),
        mlp_params["b_out"].astype(dt)[None],
    )


def _plain_ln_mlp(ln_params, mlp_params, x):
    """Reference implementation (used for the custom_vjp backward and tests)."""
    y = layer_norm(ln_params, x)
    dt = x.dtype
    h = quick_gelu(y @ mlp_params["w_in"].astype(dt) + mlp_params["b_in"].astype(dt))
    return x + h @ mlp_params["w_out"].astype(dt) + mlp_params["b_out"].astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def ln_mlp(ln_params, mlp_params, x):
    """Differentiable fused LN+MLP: Pallas forward, plain-JAX backward."""
    return fused_ln_mlp(ln_params, mlp_params, x)


def _fwd(ln_params, mlp_params, x):
    return fused_ln_mlp(ln_params, mlp_params, x), (ln_params, mlp_params, x)


def _bwd(residuals, g):
    ln_params, mlp_params, x = residuals
    _, vjp = jax.vjp(_plain_ln_mlp, ln_params, mlp_params, x)
    return vjp(g)


ln_mlp.defvjp(_fwd, _bwd)
