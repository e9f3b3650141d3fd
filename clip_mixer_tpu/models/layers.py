"""Shared primitives: fp32-safe LayerNorm, QuickGELU, linear init helpers.

The model is a pure-pytree functional core: parameters are nested dicts of
``jnp`` arrays (stored float32), apply functions are pure and jit-friendly.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — must match reference model.py:175-177 exactly
    (NOT tanh/erf GELU) for checkpoint parity."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(params: Dict[str, jnp.ndarray], x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with float32 internals regardless of activation dtype.

    Mirrors the fp16-safe LayerNorm of reference model.py:166-172: the input is
    promoted to f32, normalised, affine-transformed in f32, and cast back to
    the original dtype. On TPU this keeps bf16 towers numerically stable.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def init_layer_norm(dim: int) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# Linear convention (documented once, here): kernels are stored (in, out) —
# JAX convention; the torch converter transposes its (out, in) weights on
# import. Call sites inline `x @ kernel + bias` directly.
def init_linear_normal(key, d_in: int, d_out: int, std: float, bias: bool = True) -> Dict[str, jnp.ndarray]:
    """Normal(0, std) WEIGHTS with torch-default uniform biases — exactly the
    reference's text-tower init: initialize_parameters overwrites only the
    weights (model.py:379-396), so nn.Linear's kaiming-uniform biases
    (U(+-1/sqrt(fan_in))) survive."""
    kw, kb = jax.random.split(key)
    p = {"kernel": std * jax.random.normal(kw, (d_in, d_out), jnp.float32)}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["bias"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def init_linear_torch_default(key, d_in: int, d_out: int, bias: bool = True) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear/Conv2d default init: kaiming_uniform(a=sqrt(5)) ==
    U(+-1/sqrt(fan_in)) for weights, U(+-1/sqrt(fan_in)) for bias.

    The reference re-initialises only the TEXT tower's blocks
    (model.py:382-393 loops over ``self.transformer``); the VISION tower's
    mixer/attention linears keep torch defaults — we reproduce that quirk so
    training dynamics match.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def stack_layers(layer_params_list):
    """Stack per-layer pytrees along a new leading axis for lax.scan towers."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params_list)


def remat_policy_fn(name: str):
    """jax.checkpoint policy for CLIPConfig.remat_policy.

    The block bodies tag their hidden pre-activations with
    ``jax.ad_checkpoint.checkpoint_name`` ("mlp_hidden" for the channel-MLP /
    transformer-MLP hidden, "token_hidden" for the mixer token-mix hidden);
    saving those lets the backward pass skip re-running the FLOPs-dominant
    forward matmuls — only LN and elementwise ops are recomputed — at
    [B, T, 4W] (resp. [B, 4T, W]) bf16 memory per block. "none" is classic
    full remat (save only block boundaries)."""
    if name in (None, "none"):
        return None
    names = {
        "mlp_hidden": ("mlp_hidden",),
        "all_hidden": ("mlp_hidden", "token_hidden"),
    }[name]
    return jax.checkpoint_policies.save_only_these_names(*names)
