"""Fused whole-MixerBlock Pallas kernel (token mix + channel mix).

Why: XLA runs the mixer block as a chain of matmuls whose intermediates
round-trip HBM — per block, the token hidden [B, 4T, W], the token output,
the post-token residual, and the channel hidden [B*T, 4W] (~9.8 GFLOP of
matmul but ~0.6 GB of HBM traffic per 512-image batch per block). The
component profile (scripts/profile_mixer.py) assigns the token-mix branch
several ms/batch beyond its FLOPs — it is MXU-padding-bound (contraction
K=T=50 pads to 128 lanes, 39% ceiling) AND bandwidth-bound. This kernel
executes the ENTIRE block per batch tile with every intermediate resident in
VMEM.

Layout: the kernel operates in [T, Bt, D] orientation — with tokens as the
leading (ungridded) dim, BOTH token-mix contractions and BOTH channel-mix
contractions are plain dot_generals whose outputs keep D on the lane
dimension, so there is not a single transpose/relayout inside the block. The
tower wrapper transposes [B, T, D] -> [T, B, D] once before the 12-layer
scan and back once after.

Grid: (B/Bt, KU + KC) — one "arbitrary" chunk axis covering KU token-hidden
chunks then KC channel-hidden chunks, so neither hidden tensor ever exceeds
a chunk of VMEM:

    k == 0:            y  = LN_tok(x)           (f32 internals) -> scratch
    k in [0, KU):      zacc += w_tout[uc] . gelu(w_tin[:, uc] . y)
    k == KU-1:         z = x + zacc + b_tout -> scratch;
                       y2 = LN_ch(z) -> scratch; acc <- 0 (reuses zacc)
    k in [KU, KU+KC):  acc += gelu(y2 @ w_in[:, hc] + b_in[hc]) @ w_out[hc, :]
    k == KU+KC-1:      out = z + acc + b_out

All matmuls accumulate in f32 on the MXU; QuickGELU runs in f32.

Semantics mirrored: reference model.py:201-222 (MixerBlock) via
models/mixer.py:38-75 — parity-tested against the plain path. Backward is
the plain-JAX block via custom_vjp (training keeps XLA's schedule).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x_ref, scale_ref, bias_ref):
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)


def _quick_gelu_f32(h):
    return h * jax.nn.sigmoid(1.702 * h)


def _kernel(
    ku,  # static: number of token chunks (closed over)
    x_ref,          # [T, Bt, D]
    lt_s_ref, lt_b_ref,      # LN_token scale/bias [1, 1, D]
    wtin_ref,       # [T, uc]    (token chunk)
    btin_ref,       # [uc, 1, 1]
    wtout_ref,      # [uc, T]
    btout_ref,      # [T, 1, 1]
    lc_s_ref, lc_b_ref,      # LN_channel scale/bias [1, 1, D]
    win_ref,        # [D, hc]    (channel chunk)
    bin_ref,        # [1, hc]
    wout_ref,       # [hc, D]
    bout_ref,       # [1, 1, D]
    out_ref,        # [T, Bt, D]
    y_scr,          # [T, Bt, D] bf16: LN_tok(x)
    z_scr,          # [T, Bt, D] bf16: post-token residual
    y2_scr,         # [T, Bt, D] bf16: LN_ch(z)
    acc_scr,        # [T, Bt, D] f32: token acc then channel acc
):
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    T, Bt, D = x_ref.shape

    @pl.when(k == 0)
    def _():
        y_scr[...] = _ln_f32(x_ref, lt_s_ref, lt_b_ref).astype(y_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(k < ku)
    def _():
        # token chunk: h = gelu(w_tin[:, uc]^T . y + b_tin[uc])  -> [uc, Bt, D]
        h = jax.lax.dot_general(
            wtin_ref[...], y_scr[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = _quick_gelu_f32(h + btin_ref[...].astype(jnp.float32)).astype(y_scr.dtype)
        # zacc += w_tout[uc]^T . h  -> [T, Bt, D]
        acc_scr[...] += jax.lax.dot_general(
            wtout_ref[...], h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == ku - 1)
    def _():
        z = x_ref[...].astype(jnp.float32) + acc_scr[...] + btout_ref[...].astype(jnp.float32)
        z_scr[...] = z.astype(z_scr.dtype)
        y2_scr[...] = _ln_f32(z_scr, lc_s_ref, lc_b_ref).astype(y2_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(k >= ku)
    def _():
        # channel chunk on [T*Bt, D] rows
        y2 = y2_scr[...].reshape(T * Bt, D)
        h = jnp.dot(y2, win_ref[...], preferred_element_type=jnp.float32)
        h = _quick_gelu_f32(h + bin_ref[...].astype(jnp.float32)).astype(y2_scr.dtype)
        acc_scr[...] += jnp.dot(
            h, wout_ref[...], preferred_element_type=jnp.float32
        ).reshape(T, Bt, D)

    @pl.when(k == nk - 1)
    def _():
        res = z_scr[...].astype(jnp.float32) + acc_scr[...] + bout_ref[...].astype(jnp.float32)
        out_ref[...] = res.astype(out_ref.dtype)


def fused_mixer_block_tbd(
    params: Dict,
    x: jnp.ndarray,
    batch_tile: int = 8,
    token_chunks: int = 4,
    hidden_chunks: int = 4,
) -> jnp.ndarray:
    """One full mixer block on x: [T, B, D] (token-major orientation).

    params: a single (unstacked) mixer block tree — {"ln_token", "token_mix",
    "ln_channel", "channel_mix"}. B % batch_tile == 0 (wrapper pads).
    """
    T, B, D = x.shape
    tm, cm = params["token_mix"], params["channel_mix"]
    U = tm["w_in"].shape[1]
    H = cm["w_in"].shape[1]
    assert B % batch_tile == 0, (B, batch_tile)
    assert U % token_chunks == 0 and H % hidden_chunks == 0
    uc, hc = U // token_chunks, H // hidden_chunks
    ku, kc = token_chunks, hidden_chunks
    dt = x.dtype

    # Chunk index maps: clamp to this phase's range while the other phase runs.
    tok = lambda k: jnp.minimum(k, ku - 1)
    ch = lambda k: jnp.maximum(k - ku, 0)

    kernel = functools.partial(_kernel, ku)
    return pl.pallas_call(
        kernel,
        grid=(B // batch_tile, ku + kc),
        in_specs=[
            pl.BlockSpec((T, batch_tile, D), lambda b, k: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, uc), lambda b, k: (0, tok(k)), memory_space=pltpu.VMEM),
            pl.BlockSpec((uc, 1, 1), lambda b, k: (tok(k), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((uc, T), lambda b, k: (tok(k), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, 1), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, hc), lambda b, k: (0, ch(k)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda b, k: (0, ch(k)), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, D), lambda b, k: (ch(k), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, batch_tile, D), lambda b, k: (0, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, D), dt),
        scratch_shapes=[
            pltpu.VMEM((T, batch_tile, D), dt),
            pltpu.VMEM((T, batch_tile, D), dt),
            pltpu.VMEM((T, batch_tile, D), dt),
            pltpu.VMEM((T, batch_tile, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * (2 * T * U) + 2 * B * T * (2 * D * H),
            bytes_accessed=T * B * D * 2 * 2 + (T * U * 2 + D * H * 2) * 2,
            transcendentals=B * D * U + B * T * H,
        ),
    )(
        x,
        params["ln_token"]["scale"].astype(dt).reshape(1, 1, D),
        params["ln_token"]["bias"].astype(dt).reshape(1, 1, D),
        tm["w_in"].astype(dt),
        tm["b_in"].astype(dt).reshape(U, 1, 1),
        tm["w_out"].astype(dt),
        tm["b_out"].astype(dt).reshape(T, 1, 1),
        params["ln_channel"]["scale"].astype(dt).reshape(1, 1, D),
        params["ln_channel"]["bias"].astype(dt).reshape(1, 1, D),
        cm["w_in"].astype(dt),
        cm["b_in"].astype(dt).reshape(1, H),
        cm["w_out"].astype(dt),
        cm["b_out"].astype(dt).reshape(1, 1, D),
    )


def _plain_block_tbd(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Plain-JAX reference of the same [T, B, D]-oriented block (backward +
    tests)."""
    from clip_mixer_tpu.models.mixer import mixer_block

    return jnp.transpose(mixer_block(params, jnp.transpose(x, (1, 0, 2))), (1, 0, 2))


@jax.custom_vjp
def mixer_block_fused(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused block: Pallas forward, plain-JAX backward."""
    return fused_mixer_block_tbd(params, x)


def _fwd(params, x):
    return fused_mixer_block_tbd(params, x), (params, x)


def _bwd(res, g):
    params, x = res
    _, vjp = jax.vjp(_plain_block_tbd, params, x)
    return vjp(g)


mixer_block_fused.defvjp(_fwd, _bwd)


def mixer_tower_fused(params: Dict, x: jnp.ndarray, batch_tile: int = 8) -> jnp.ndarray:
    """Scan the stacked blocks through the fused kernel. x: [B, T, D].

    Transposes to token-major [T, B, D] once for the whole tower (the fused
    block is transpose-free inside) and back after. Pads B to a multiple of
    batch_tile.
    """
    B, T, D = x.shape
    pad = (-B) % batch_tile
    xt = jnp.transpose(x, (1, 0, 2))
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))

    def step(h, layer_params):
        return mixer_block_fused(layer_params, h), None

    out, _ = jax.lax.scan(step, xt, params["blocks"])
    if pad:
        out = out[:, :B]
    return jnp.transpose(out, (1, 0, 2))
