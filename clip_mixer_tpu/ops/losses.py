"""Global-batch contrastive InfoNCE — the one bespoke collective pattern.

Reference semantics (training/training.py:156-168): every rank all-gathers
the *detached* image and text features, builds local-vs-global logits in both
directions, and uses rank-offset arange labels; gradients flow only through
the local features (query side), and DDP averages gradients across ranks.
Value-wise the mean of per-rank losses equals the global symmetric CE.

TPU-native: the gather is ``jax.lax.all_gather(feats, axis_name)`` over ICI
*inside* the jitted step (under shard_map), with ``stop_gradient`` standing in
for ``.detach()``. Two variants:

* ``grad_through_gather=False`` (default) — faithful to the reference: no
  gradient through gathered keys.
* ``grad_through_gather=True`` — exact global-batch gradient: on TPU the
  backward of all_gather is a cheap reduce-scatter over ICI, so the full
  gradient costs almost nothing extra (unlike NCCL-era torch where detaching
  was the established workaround).

``chunk_size`` streams the [localB, globalB] logits matrix in chunks with an
online logsumexp so the full fp32 matrix is never materialised — the
reference materialises it twice at 32k batch (training.py:162-163); at scale
this is the memory headroom win called out in BASELINE.json's north star.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cross_entropy_rows(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE in f32: logsumexp(row) - row[label]."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return lse - picked


def _chunked_ce(queries: jnp.ndarray, keys: jnp.ndarray, scale, labels: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """CE over rows of scale * queries @ keys.T without materialising the full
    [Q, K] matrix: scan over K-chunks with streaming logsumexp."""
    Q = queries.shape[0]
    K = keys.shape[0]
    assert K % chunk == 0, f"global batch {K} not divisible by chunk {chunk}"
    keys_c = keys.reshape(K // chunk, chunk, -1)
    q32 = queries.astype(jnp.float32)

    def body(carry, args):
        m, s, picked = carry
        idx, kc = args
        logits = scale * (q32 @ kc.astype(jnp.float32).T)  # [Q, chunk]
        # streaming logsumexp
        m_new = jnp.maximum(m, logits.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(logits - m_new[:, None]).sum(axis=-1)
        # pick the positive logit if it lives in this chunk
        local_label = labels - idx * chunk
        in_chunk = (local_label >= 0) & (local_label < chunk)
        got = jnp.take_along_axis(logits, jnp.clip(local_label, 0, chunk - 1)[:, None], axis=-1)[:, 0]
        picked = jnp.where(in_chunk, got, picked)
        return (m_new, s, picked), None

    init = (
        jnp.full((Q,), -jnp.inf, jnp.float32),
        jnp.zeros((Q,), jnp.float32),
        jnp.zeros((Q,), jnp.float32),
    )
    (m, s, picked), _ = jax.lax.scan(
        body, init, (jnp.arange(K // chunk), keys_c)
    )
    return m + jnp.log(s) - picked


def info_nce(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: Optional[str] = None,
    grad_through_gather: bool = False,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Symmetric local-vs-global InfoNCE. Features must be L2-normalised.

    Inside shard_map, pass ``axis_name`` of the data axis; standalone
    (single shard) pass None and the global batch is the local batch.
    Returns the per-rank mean loss (pmean across ranks == global CE).
    """
    local_b = image_features.shape[0]
    scale = logit_scale.astype(jnp.float32)

    if axis_name is None:
        gathered_img, gathered_txt = image_features, text_features
        rank = 0
    else:
        gathered_img = jax.lax.all_gather(image_features, axis_name, tiled=True)
        gathered_txt = jax.lax.all_gather(text_features, axis_name, tiled=True)
        rank = jax.lax.axis_index(axis_name)

    if not grad_through_gather:
        gathered_img = jax.lax.stop_gradient(gathered_img)
        gathered_txt = jax.lax.stop_gradient(gathered_txt)

    # Ground truth: local row i pairs with global column rank*local_b + i
    # (training.py:165-167).
    labels = jnp.arange(local_b, dtype=jnp.int32) + rank * local_b

    if chunk_size is None:
        logits_t2i = scale * text_features.astype(jnp.float32) @ gathered_img.astype(jnp.float32).T
        logits_i2t = scale * image_features.astype(jnp.float32) @ gathered_txt.astype(jnp.float32).T
        loss_t = _cross_entropy_rows(logits_t2i, labels)
        loss_i = _cross_entropy_rows(logits_i2t, labels)
    else:
        loss_t = _chunked_ce(text_features, gathered_img, scale, labels, chunk_size)
        loss_i = _chunked_ce(image_features, gathered_txt, scale, labels, chunk_size)

    # Symmetric mean (training.py:168).
    return 0.5 * (loss_t.mean() + loss_i.mean())
