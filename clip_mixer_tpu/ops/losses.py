"""Global-batch contrastive losses — the bespoke collective patterns.

Two objectives:

* :func:`info_nce` — the reference's softmax contrastive loss
  (training/training.py:156-168), local-vs-global with an all_gather.
* :func:`siglip_loss` — the pairwise sigmoid loss (SigLIP,
  arXiv:2303.15343), absent from the reference but the natural TPU-native
  objective: no global softmax coupling, so the sharded form needs only a
  neighbour ``ppermute`` ring (the paper's §3.3 "chunked" implementation,
  itself designed for TPUs) and no rank ever materialises more than a
  [local_B, local_B] logits block.


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


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Pairwise sigmoid contrastive loss (SigLIP, arXiv:2303.15343 eq. 1):

        -1/B · Σ_i Σ_j log σ( z_ij · (t · x_i·y_j + b) ),   z_ij = +1 iff i==j

    with learnable temperature ``t`` (pass ``exp(params["logit_scale"])``,
    like info_nce) and learnable bias ``b`` (``params["logit_bias"]``, a raw
    additive scalar — init -10.0 per the paper so training starts near the
    heavily-imbalanced prior of B-1 negatives per positive).

    Sharded form (``axis_name`` set, inside shard_map): the paper's §3.3
    chunked ring, the pattern it introduced FOR TPUs — each of the
    ``n = axis_size`` ticks computes the [local_B, local_B] block of local
    images against the currently-held text chunk, then ``ppermute``s the
    chunk one rank around the ring. Positives exist only at tick 0 (the
    rank's own texts). No device ever holds more than one block, vs
    info_nce's [local_B, global_B] (or its streamed chunks). Gradients are
    exact: ppermute's transpose routes each text chunk's cotangents back
    around the ring to its owner, so the train steps' ``pmean`` of
    per-rank parameter grads equals the global-loss gradient — there is no
    detached-keys variant (the sigmoid loss has no softmax normaliser to
    make that a meaningful economy).

    Returns the per-rank loss (local rows x global columns, normalised by
    local_B); its pmean over ranks == the global mean loss, matching the
    info_nce convention so the two objectives are drop-in interchangeable
    in the train steps.
    """
    local_b = image_features.shape[0]
    scale = logit_scale.astype(jnp.float32)
    bias = logit_bias.astype(jnp.float32)
    img = image_features.astype(jnp.float32)
    eye = jnp.eye(local_b, dtype=bool)

    def block_loss(txt_chunk, positives):
        logits = scale * (img @ txt_chunk.astype(jnp.float32).T) + bias
        z = jnp.where(positives, 1.0, -1.0)
        return -jax.nn.log_sigmoid(z * logits).sum()

    if axis_name is None:
        return block_loss(text_features, eye) / local_b

    n = jax.lax.axis_size(axis_name)
    ring = [(i, (i + 1) % n) for i in range(n)]

    def tick(carry, k):
        txt, acc = carry
        acc = acc + block_loss(txt, eye & (k == 0))
        # The final hop returns the chunk to its owner — one redundant
        # permute, kept so the scan body is uniform (a lax.cond around a
        # collective would force both branches into the schedule anyway).
        txt = jax.lax.ppermute(txt, axis_name, ring)
        return (txt, acc), None

    (_, total), _ = jax.lax.scan(
        tick, (text_features, jnp.zeros((), jnp.float32)), jnp.arange(n)
    )
    return total / local_b


def loss_param_keys(kind: str) -> tuple:
    """Top-level scalar params the objective differentiates directly — the
    keys of the two-pass accumulation's loss_params dict. ONE definition so
    the DP/TP, FSDP and PP steps cannot drift when a loss kind changes."""
    return ("logit_scale", "logit_bias") if kind == "siglip" else ("logit_scale",)


def contrastive_loss(
    kind: str,
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    grad_through_gather: bool = False,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """The ONE objective dispatch shared by the DP/TP, FSDP and PP train
    steps (``TrainConfig.loss``). ``grad_through_gather``/``chunk_size`` are
    info_nce-specific (siglip's ring is already exact-gradient and already
    chunked); ``logit_bias`` is siglip-specific."""
    if kind == "info_nce":
        return info_nce(
            image_features,
            text_features,
            scale,
            axis_name=axis_name,
            grad_through_gather=grad_through_gather,
            chunk_size=chunk_size,
        )
    if kind == "siglip":
        if logit_bias is None:
            raise ValueError(
                "siglip loss needs a learnable 'logit_bias' param: init the "
                "model with CLIPConfig(logit_bias_init=-10.0) (train.py "
                "--loss siglip does this)"
            )
        return siglip_loss(
            image_features, text_features, scale, logit_bias, axis_name=axis_name
        )
    raise ValueError(f"unknown contrastive loss {kind!r} (info_nce|siglip)")
