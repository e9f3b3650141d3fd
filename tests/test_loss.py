"""Loss-math gates (SURVEY §4): rank-offset labels, detached-gather gradient
semantics vs a single-device big-batch oracle, chunked-logsumexp equivalence,
all on the 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from clip_mixer_tpu.ops.losses import info_nce
from clip_mixer_tpu.parallel.mesh import make_mesh

B, D = 16, 8  # global batch, embed dim


def _feats(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 1, (B, D)).astype(np.float32)
    txt = rng.normal(0, 1, (B, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.asarray(img), jnp.asarray(txt)


def _oracle_loss(img, txt, scale, detach_keys: bool):
    """Naive global symmetric CE; keys optionally stop-gradient (the
    reference's .detach() on gathered features, training.py:158-159)."""
    keys_img = jax.lax.stop_gradient(img) if detach_keys else img
    keys_txt = jax.lax.stop_gradient(txt) if detach_keys else txt
    lt = scale * txt @ keys_img.T
    li = scale * img @ keys_txt.T
    labels = jnp.arange(B)
    ce = lambda lg: (jax.nn.logsumexp(lg, -1) - jnp.take_along_axis(lg, labels[:, None], -1)[:, 0]).mean()
    return 0.5 * (ce(lt) + ce(li))


def test_single_shard_value_matches_oracle():
    img, txt = _feats()
    scale = jnp.asarray(25.0)
    ours = info_nce(img, txt, scale)
    ref = _oracle_loss(img, txt, scale, detach_keys=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_chunked_matches_full():
    img, txt = _feats(1)
    scale = jnp.asarray(50.0)
    full = info_nce(img, txt, scale)
    for chunk in (4, 8, 16):
        ch = info_nce(img, txt, scale, chunk_size=chunk)
        np.testing.assert_allclose(float(ch), float(full), rtol=1e-6)


def _sharded_loss_and_grad(img, txt, scale, **kw):
    mesh = make_mesh()

    def local(img_s, txt_s):
        return info_nce(img_s, txt_s, scale, axis_name="data", **kw)

    def fn(img_s, txt_s):
        loss, grads = jax.value_and_grad(local, argnums=(0, 1))(img_s, txt_s)
        # Per-rank losses are local means; the global loss is their pmean.
        # Feature grads of the per-rank loss are therefore n_ranks x the
        # global-mean-loss gradient — the 1/n lands in the pmean over PARAM
        # grads in the real train step (DDP's allreduce-average). Normalise
        # here so feature grads compare directly against the global oracle.
        n = jax.lax.axis_size("data")
        grads = jax.tree.map(lambda g: g / n, grads)
        return jax.lax.pmean(loss, "data"), grads

    loss, grads = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P("data")),
            check_vma=False,
        )
    )(img, txt)
    return loss, grads


def test_sharded_value_matches_global():
    img, txt = _feats(2)
    scale = jnp.asarray(25.0)
    loss, _ = _sharded_loss_and_grad(img, txt, scale)
    ref = _oracle_loss(img, txt, scale, detach_keys=True)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


def test_sharded_detached_grads_match_reference_semantics():
    """8-way sharded detached-gather grads == single-device stop-grad-keys
    oracle grads. The mean-of-rank-losses scaling matches DDP's grad
    averaging: oracle loss is mean over global batch, and pmean'd per-rank
    losses differentiate to (1/n_rank) * sum of rank grads... which for the
    query-side-only terms is exactly the oracle gradient."""
    img, txt = _feats(3)
    scale = jnp.asarray(25.0)
    _, (gi, gt) = _sharded_loss_and_grad(img, txt, scale)
    ogi, ogt = jax.grad(lambda a, b: _oracle_loss(a, b, scale, True), argnums=(0, 1))(img, txt)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ogi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(ogt), atol=1e-6)


def test_sharded_full_grads_match_bigbatch_oracle():
    """grad_through_gather=True == exact big-batch gradient."""
    img, txt = _feats(4)
    scale = jnp.asarray(25.0)
    _, (gi, gt) = _sharded_loss_and_grad(img, txt, scale, grad_through_gather=True)
    ogi, ogt = jax.grad(lambda a, b: _oracle_loss(a, b, scale, False), argnums=(0, 1))(img, txt)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ogi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(ogt), atol=1e-6)


def test_sharded_chunked_matches_sharded_full():
    img, txt = _feats(5)
    scale = jnp.asarray(25.0)
    l1, (gi1, gt1) = _sharded_loss_and_grad(img, txt, scale)
    l2, (gi2, gt2) = _sharded_loss_and_grad(img, txt, scale, chunk_size=4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-6)


def test_perfect_alignment_low_loss():
    """Identical, well-separated image/text features with high scale -> loss ~ 0."""
    rng = np.random.default_rng(0)
    f = rng.normal(0, 1, (B, D)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    f = jnp.asarray(f)
    loss = info_nce(f, f, jnp.asarray(100.0))
    assert float(loss) < 0.05


# ---------------- SigLIP (pairwise sigmoid) loss gates ----------------

from clip_mixer_tpu.ops.losses import contrastive_loss, siglip_loss  # noqa: E402


def _siglip_oracle(img, txt, scale, bias):
    """Naive global pairwise sigmoid loss (arXiv:2303.15343 eq. 1), written
    independently of the implementation: -log sigmoid(x) == logaddexp(0, -x)."""
    logits = scale * img @ txt.T + bias
    z = 2.0 * jnp.eye(img.shape[0]) - 1.0
    return jnp.logaddexp(0.0, -z * logits).sum() / img.shape[0]


def test_siglip_matches_naive_oracle():
    img, txt = _feats(6)
    scale, bias = jnp.asarray(10.0), jnp.asarray(-10.0)
    ours = siglip_loss(img, txt, scale, bias)
    ref = _siglip_oracle(img, txt, scale, bias)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_siglip_alignment_is_preferred():
    """Correctly-paired features score lower than a shuffled pairing."""
    img, txt = _feats(7)
    scale, bias = jnp.asarray(10.0), jnp.asarray(-10.0)
    aligned = float(siglip_loss(img, 0.5 * img + 0.5 * txt, scale, bias))
    shuffled = float(siglip_loss(img, jnp.roll(0.5 * img + 0.5 * txt, 3, axis=0), scale, bias))
    assert aligned < shuffled


def _sharded_siglip_loss_and_grad(img, txt, scale, bias):
    mesh = make_mesh()

    def fn(img_s, txt_s):
        loss, grads = jax.value_and_grad(
            lambda a, b: siglip_loss(a, b, scale, bias, axis_name="data"),
            argnums=(0, 1),
        )(img_s, txt_s)
        # Same normalisation story as _sharded_loss_and_grad above: the 1/n
        # lands in the train step's pmean over param grads.
        n = jax.lax.axis_size("data")
        grads = jax.tree.map(lambda g: g / n, grads)
        return jax.lax.pmean(loss, "data"), grads

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P("data")),
            check_vma=False,
        )
    )(img, txt)


def test_siglip_ring_matches_global():
    """The 8-rank ppermute ring (paper §3.3 chunking) computes the global
    loss AND the exact global gradient: the ring's transpose routes each
    text chunk's cotangents back to its owner."""
    img, txt = _feats(8)
    scale, bias = jnp.asarray(10.0), jnp.asarray(-10.0)
    loss, (gi, gt) = _sharded_siglip_loss_and_grad(img, txt, scale, bias)
    ref = _siglip_oracle(img, txt, scale, bias)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    ogi, ogt = jax.grad(lambda a, b: _siglip_oracle(a, b, scale, bias), argnums=(0, 1))(img, txt)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ogi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(ogt), atol=1e-6)


def test_siglip_scale_and_bias_grads():
    """Temperature/bias gradients through the ring match the global oracle
    (they arrive only via the loss in the two-pass accumulation scheme)."""
    img, txt = _feats(9)
    mesh = make_mesh()

    def global_fn(scale, bias):
        return _siglip_oracle(img, txt, scale, bias)

    def sharded_fn(scale, bias):
        def fn(img_s, txt_s):
            loss = siglip_loss(img_s, txt_s, scale, bias, axis_name="data")
            return jax.lax.pmean(loss, "data")

        return jax.shard_map(
            fn, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(img, txt)

    s, b = jnp.asarray(10.0), jnp.asarray(-10.0)
    gs_ref, gb_ref = jax.grad(global_fn, argnums=(0, 1))(s, b)
    gs, gb = jax.jit(jax.grad(sharded_fn, argnums=(0, 1)))(s, b)
    np.testing.assert_allclose(float(gs), float(gs_ref), rtol=1e-5)
    np.testing.assert_allclose(float(gb), float(gb_ref), rtol=1e-5)


def test_contrastive_loss_dispatch():
    img, txt = _feats(10)
    scale = jnp.asarray(25.0)
    np.testing.assert_allclose(
        float(contrastive_loss("info_nce", img, txt, scale)),
        float(info_nce(img, txt, scale)),
    )
    with pytest.raises(ValueError, match="logit_bias"):
        contrastive_loss("siglip", img, txt, scale)  # bias param missing
    with pytest.raises(ValueError, match="unknown"):
        contrastive_loss("nope", img, txt, scale)
