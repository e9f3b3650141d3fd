"""In-graph augmentation gates (ops/augment.py): stateless crop+flip on
device, replayable from the step counter, invariant under data sharding."""

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig, TrainConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.ops.augment import maybe_augment, random_crop_flip
from clip_mixer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from clip_mixer_tpu.parallel.train_step import init_train_state, make_train_step
from clip_mixer_tpu.train.optimizer import make_optimizer

CFG = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=12, vocab_size=256, text_width=64,
    text_heads=1, text_layers=2, tower="mixer", compute_dtype="float32",
)
SRC = 40  # augmented sources decode larger than the model resolution


def _batch(seed=0, B=16, size=SRC):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (B, size, size, 3), dtype=np.uint8)
    texts = np.zeros((B, 12), np.int32)
    texts[:, 0] = 254
    for i in range(B):
        texts[i, 1:4] = rng.integers(1, 250, 3)
        texts[i, 4] = 255
    return {"images": images, "texts": texts}


def test_random_crop_flip_properties():
    imgs = jnp.asarray(_batch(B=64)["images"])
    key = jax.random.key(7)
    out = random_crop_flip(key, imgs, 32)
    assert out.shape == (64, 32, 32, 3) and out.dtype == jnp.uint8
    # deterministic under the same key; different under another
    np.testing.assert_array_equal(np.asarray(random_crop_flip(key, imgs, 32)), np.asarray(out))
    assert not np.array_equal(np.asarray(random_crop_flip(jax.random.key(8), imgs, 32)),
                              np.asarray(out))
    # every output crop is a genuine sub-window of its source (possibly
    # flipped): its pixel multiset must be a subset of the source's rows
    src0 = np.asarray(imgs[0])
    o0 = np.asarray(out[0])
    found = any(
        np.array_equal(o0, src0[y:y + 32, x:x + 32])
        or np.array_equal(o0, src0[y:y + 32, x:x + 32][:, ::-1])
        for y in range(SRC - 32 + 1) for x in range(SRC - 32 + 1)
    )
    assert found
    # flips actually happen (~half the batch, loose bound)
    flipped = sum(
        not any(np.array_equal(np.asarray(out[i]), np.asarray(imgs[i])[y:y + 32, x:x + 32])
                for y in range(SRC - 31) for x in range(SRC - 31))
        for i in range(16)
    )
    assert 1 <= flipped <= 15


def test_maybe_augment_off_is_identity():
    tcfg = TrainConfig(augment=False)
    imgs = jnp.asarray(_batch(size=32)["images"])
    assert maybe_augment(tcfg, CFG, jnp.asarray(3), imgs) is imgs


def test_augmented_step_dp_invariance_and_replay():
    """Augmentation runs on the GLOBAL batch keyed on (seed, step): 4-way
    sharded == single-device (same pixels either way), and re-running the
    same step from the same state replays the same augmentation (the
    bitwise-resume contract)."""
    tcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2,
                       augment=True)
    batch = _batch(seed=3)
    results = []
    for mesh in (make_mesh(n_data=4, devices=jax.devices()[:4]),
                 make_mesh(n_data=1, devices=jax.devices()[:1])):
        opt = make_optimizer(tcfg, total_steps=10)
        params = clip_model.init(jax.random.key(1), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(CFG, tcfg, mesh, opt)
        b = shard_batch(mesh, batch)
        m = None
        for _ in range(2):
            state, m = step(state, b)
        results.append((jax.device_get(state.params), float(m["loss"])))
    (p4, l4), (p1, l1) = results
    np.testing.assert_allclose(l4, l1, rtol=2e-5)
    for a, b_ in zip(jax.tree.leaves(p4), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)

    # replay: fresh identical state -> identical loss trajectory (the key is
    # (seed, step), not a host RNG)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    losses = []
    for _ in range(2):
        opt = make_optimizer(tcfg, total_steps=10)
        state = replicate(mesh, init_train_state(clip_model.init(jax.random.key(1), CFG), opt))
        step = make_train_step(CFG, tcfg, mesh, opt)
        state, m = step(state, shard_batch(mesh, _batch(seed=3)))
        losses.append(float(m["loss"]))
    assert losses[0] == losses[1]


def test_augment_composes_with_accum_and_freeze():
    tcfg = TrainConfig(global_batch_size=16, learning_rate=1e-3, warmup_steps=2,
                       augment=True, freeze="text")
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    results = []
    for accum in (1, 2):
        opt = make_optimizer(tcfg, total_steps=10)
        params = clip_model.init(jax.random.key(5), CFG)
        state = replicate(mesh, init_train_state(params, opt))
        step = make_train_step(CFG, tcfg, mesh, opt, accum_steps=accum)
        state, m = step(state, shard_batch(mesh, _batch(seed=5)))
        results.append((jax.device_get(state.params), float(m["loss"])))
    (p1, l1), (p2, l2) = results
    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
