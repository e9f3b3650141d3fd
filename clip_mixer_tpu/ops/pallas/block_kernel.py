"""Fused whole-MixerBlock Pallas kernel (token mix + channel mix).

Hypothesis (round-2 roadmap / VERDICT item 2c): XLA runs the mixer block as
a chain of matmuls whose intermediates round-trip HBM — fusing the ENTIRE
block per batch tile with every intermediate resident in VMEM should recover
that bandwidth. This kernel implements the hypothesis; the measurements
below kill it for Mixer-B/32 on v5e.

MEASURED (v5e, B=512, T=50, D=768, 12 layers, loop-carried chained timing):

    XLA tower (models/mixer.py)          20.03 ms/batch   154 TF/s
    this kernel, bt=8, kc=4 (2D dots)    23.24 ms/batch   133 TF/s
    rank-3 dot variant (no view flips)   30.39 ms/batch   102 TF/s
    bt=16 / bt=32 tiles                  exceed VMEM (compile failure)

Why XLA wins here: the channel-mix matmuls already run at ~90% MFU under
XLA with its own epilogue fusion (scripts/profile_mixer.py: channel 16.8ms,
token 4.05ms, other 2.0ms of the 22.9ms e2e), the token-mix contraction
K=T=50 is MXU-padding-bound (~39% ceiling) in ANY formulation, and the
16MB-VMEM budget caps batch tiles at 8, too small to amortise the kernel's
per-tile relayouts between the (T, Bt*D) token view and the (T*Bt, D)
channel view (~3ms/batch). A model with BOTH larger token counts (K >= 128)
and larger width would tip the balance; at B/32 geometry the XLA schedule is
the speed of light.

Kept as a product option (and the measurement artifact): numerics are
parity-tested in interpret mode, gradients flow via a plain-JAX custom_vjp
backward, and ``mixer_tower_fused`` is a drop-in for ``mixer_tower``.

Kernel structure — grid (B/Bt, 1 + KC), one "arbitrary" chunk axis:

    k == 0:        y = LN_tok(x); z = x + tokmix(y)   (full token mix:
                   its weights are ~40KB; 50-sized chunks would violate the
                   (8,128) block-alignment rule anyway)
                   y2 = LN_ch(z) -> scratch; acc <- 0
    k in [1, KC]:  acc += gelu(y2 @ w_in[:, hc] + b_in[hc]) @ w_out[hc, :]
    k == KC:       out = z + acc + b_out

All compute is rank-2 with lane-aligned (1, N) biases — Mosaic rejects
singleton-lane rank-3 broadcasts (probed: a (U,1,1) bias block fails to
compile) — so the token biases are folded into ones-row-augmented weights.
All matmuls accumulate in f32 on the MXU; QuickGELU runs in f32.

Semantics mirrored: reference model.py:201-222 (MixerBlock) via
models/mixer.py:38-75 — parity-tested against the plain path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows_f32(x, scale_ref, bias_ref):
    """LayerNorm over the last dim of a rank-2 array (f32 internals)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)


def _quick_gelu_f32(h):
    return h * jax.nn.sigmoid(1.702 * h)


def _kernel(
    x_ref,          # [T, Bt, D]
    lt_s_ref, lt_b_ref,      # LN_token scale/bias [1, D]
    wtin_ref,       # [T+1, U]  (full, ones-row-augmented: bias folded)
    wtout_ref,      # [U+1, T]  (full, ones-row-augmented: bias folded)
    lc_s_ref, lc_b_ref,      # LN_channel scale/bias [1, D]
    win_ref,        # [D, hc]    (channel chunk)
    bin_ref,        # [1, hc]
    wout_ref,       # [hc, D]
    bout_ref,       # [1, D]
    out_ref,        # [T, Bt, D]
    z_scr,          # [T*Bt, D] bf16: post-token residual
    y2_scr,         # [T*Bt, D] bf16: LN_ch(z)
    acc_scr,        # [T*Bt, D] f32: channel acc
):
    # The (T, Bt*D) and (T*Bt, D) views share one element order (row-major),
    # so reshapes between them are VMEM relayouts, not HBM traffic.
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    T, Bt, D = x_ref.shape

    @pl.when(k == 0)
    def _():
        x2 = x_ref[...].reshape(T * Bt, D)
        y = _ln_rows_f32(x2, lt_s_ref, lt_b_ref).astype(x_ref.dtype)
        # token dots on the (T, Bt*D) view, ones-row for the folded bias
        y_t = y.reshape(T, Bt * D)
        ones = jnp.ones((1, Bt * D), y_t.dtype)
        h = jax.lax.dot_general(
            wtin_ref[...], jnp.concatenate([y_t, ones], axis=0),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = _quick_gelu_f32(h).astype(x_ref.dtype)
        tok = jax.lax.dot_general(
            wtout_ref[...], jnp.concatenate([h, ones], axis=0),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z = (x2.astype(jnp.float32).reshape(T, Bt * D) + tok).reshape(T * Bt, D)
        z_scr[...] = z.astype(z_scr.dtype)
        y2_scr[...] = _ln_rows_f32(z_scr[...], lc_s_ref, lc_b_ref).astype(y2_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(k > 0)
    def _():
        h = jnp.dot(y2_scr[...], win_ref[...], preferred_element_type=jnp.float32)
        h = _quick_gelu_f32(h + bin_ref[...].astype(jnp.float32)).astype(y2_scr.dtype)
        acc_scr[...] += jnp.dot(h, wout_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        res = z_scr[...].astype(jnp.float32) + acc_scr[...] + bout_ref[...].astype(jnp.float32)
        out_ref[...] = res.astype(out_ref.dtype).reshape(T, Bt, D)


def fused_mixer_block_tbd(
    params: Dict,
    x: jnp.ndarray,
    batch_tile: int = 8,
    hidden_chunks: int = 4,
) -> jnp.ndarray:
    """One full mixer block on x: [T, B, D] (token-major orientation).

    params: a single (unstacked) mixer block tree — {"ln_token", "token_mix",
    "ln_channel", "channel_mix"}. B % batch_tile == 0 (wrapper pads);
    batch_tile must be a multiple of 8 (TPU sublane alignment) and stay small
    enough that the three (T*batch_tile, D) scratches + double-buffered
    blocks fit the ~16MB VMEM (8 is the measured sweet spot at B/32 shapes).
    """
    T, B, D = x.shape
    tm, cm = params["token_mix"], params["channel_mix"]
    U = tm["w_in"].shape[1]
    H = cm["w_in"].shape[1]
    assert B % batch_tile == 0, (B, batch_tile)
    assert batch_tile % 8 == 0, batch_tile
    assert H % hidden_chunks == 0
    hc = H // hidden_chunks
    kc = hidden_chunks
    dt = x.dtype

    # Channel chunk index, clamped while the token step (k==0) runs.
    ch = lambda k: jnp.maximum(k - 1, 0)

    return pl.pallas_call(
        _kernel,
        grid=(B // batch_tile, 1 + kc),
        in_specs=[
            pl.BlockSpec((T, batch_tile, D), lambda b, k: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T + 1, U), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U + 1, T), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, hc), lambda b, k: (0, ch(k)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda b, k: (0, ch(k)), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, D), lambda b, k: (ch(k), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, batch_tile, D), lambda b, k: (0, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, D), dt),
        scratch_shapes=[
            pltpu.VMEM((T * batch_tile, D), dt),
            pltpu.VMEM((T * batch_tile, D), dt),
            pltpu.VMEM((T * batch_tile, D), jnp.float32),
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
        params["ln_token"]["scale"].astype(dt).reshape(1, D),
        params["ln_token"]["bias"].astype(dt).reshape(1, D),
        jnp.concatenate([tm["w_in"].astype(dt), tm["b_in"].astype(dt)[None]], axis=0),
        jnp.concatenate([tm["w_out"].astype(dt), tm["b_out"].astype(dt)[None]], axis=0),
        params["ln_channel"]["scale"].astype(dt).reshape(1, D),
        params["ln_channel"]["bias"].astype(dt).reshape(1, D),
        cm["w_in"].astype(dt),
        cm["b_in"].astype(dt).reshape(1, H),
        cm["w_out"].astype(dt),
        cm["b_out"].astype(dt).reshape(1, D),
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
