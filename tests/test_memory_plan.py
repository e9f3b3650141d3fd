"""Capacity-planner gates: the analytic per-chip accounting must follow the
real sharding rules (and stay in sync with them — the divisor fns consume
fsdp_spec / the blocks-path rule directly)."""

import jax

from clip_mixer_tpu.config import PRESETS
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.utils.memory import param_shapes, plan


def test_param_shapes_match_real_init():
    cfg = PRESETS["mixer-debug"]
    shapes = param_shapes(cfg)
    real = clip_model.init(jax.random.key(0), cfg)
    assert jax.tree.map(lambda s: s.shape, shapes) == jax.tree.map(lambda a: a.shape, real)


def test_dp_vs_sharded_modes():
    cfg = PRESETS["mixer-b32"]
    n = 8
    dp = plan(cfg, "dp", n, per_chip_batch=1024)
    fsdp = plan(cfg, "fsdp", n, per_chip_batch=1024)
    tp = plan(cfg, "tp", n, per_chip_batch=1024)

    # DP replicates everything: params = 4 bytes x param count.
    assert dp.params_bytes == 4 * clip_model.param_count(clip_model.init(jax.random.key(0), cfg))
    # FSDP shards the bulk of the state (>70% of params at B/32 widths).
    assert fsdp.params_bytes < 0.3 * dp.params_bytes
    assert fsdp.opt_bytes == 2 * fsdp.params_bytes
    # TP stores CANONICAL replicated masters/moments/grads between steps
    # (tp.py shardings are transient, inside shard_map only) — the planner
    # must report true storage, not the transient shards.
    assert tp.params_bytes == dp.params_bytes
    assert tp.opt_bytes == 2 * dp.params_bytes
    assert tp.grad_bytes == dp.params_bytes
    for p in (dp, fsdp, tp):
        assert p.total_bytes == p.params_bytes + p.opt_bytes + p.grad_bytes + p.act_bytes


def test_pp_rejects_indivisible_and_resnet():
    import pytest

    cfg = PRESETS["mixer-b32"]  # 12 layers: 8 stages do not divide
    with pytest.raises(ValueError, match="divisible"):
        plan(cfg, "pp", 8, per_chip_batch=1024)
    with pytest.raises(ValueError):
        plan(PRESETS["rn50"], "pp", 2, per_chip_batch=256)


def test_pp_divides_blocks_and_activations():
    cfg = PRESETS["mixer-b32"]  # 12 layers
    dp = plan(cfg, "dp", 4, per_chip_batch=1024)
    pp = plan(cfg, "pp", 4, per_chip_batch=1024)  # 12 % 4 == 0
    # Block params dominate; 4-stage sharding must cut params to well under
    # half (embeddings/head stay replicated).
    assert pp.params_bytes < 0.5 * dp.params_bytes
    assert pp.act_bytes < dp.act_bytes


def test_accum_divides_activations():
    cfg = PRESETS["mixer-b32"]
    a1 = plan(cfg, "dp", 8, per_chip_batch=4096, accum_steps=1)
    a4 = plan(cfg, "dp", 8, per_chip_batch=4096, accum_steps=4)
    assert a4.act_bytes * 4 == a1.act_bytes
    assert a4.params_bytes == a1.params_bytes


def test_suggest_prefers_dp_when_everything_fits():
    from clip_mixer_tpu.utils.memory import suggest

    # remat=True = train.py's default; the estimator is cfg-driven
    best, tried = suggest(PRESETS["mixer-b32"].replace(remat=True), 8,
                          global_batch=8192)
    assert best is not None and best.mode.startswith("dp")
    # dp is the first candidate, so nothing before it to check
    assert tried[0][1] is best


def test_no_remat_pricing_is_not_a_noop():
    """Review catch (round 5): --no-remat silently priced the rematted
    working set for transformer/mixer towers, blessing configs train.py
    itself documents as OOMing (~4x more HBM without remat). The stored
    per-block backward set must dominate the inputs-only remat estimate,
    and no-remat Mixer-B/32 at 1024 imgs/chip must NOT fit a 16GB chip."""
    cfg = PRESETS["mixer-b32"]
    on = plan(cfg.replace(remat=True), "dp", 8, per_chip_batch=1024)
    off = plan(cfg.replace(remat=False), "dp", 8, per_chip_batch=1024)
    assert off.act_bytes > 4 * on.act_bytes
    assert off.total_bytes > 16 << 30 > on.total_bytes
    # attention twin: softmax probs [B,H,T,T] are part of the stored set
    t_on = plan(PRESETS["transformer-b32"].replace(remat=True), "dp", 8,
                per_chip_batch=1024)
    t_off = plan(PRESETS["transformer-b32"].replace(remat=False), "dp", 8,
                 per_chip_batch=1024)
    assert t_off.act_bytes > 4 * t_on.act_bytes


def test_suggest_escalates_to_first_fitting_candidate():
    from clip_mixer_tpu.utils.memory import suggest

    # ViT-L/14 at 4096/chip: activations blow 16 GiB until accum divides them
    best, tried = suggest(PRESETS["vit-l14"].replace(remat=True), 8,
                          global_batch=32768)
    assert best is not None and best.mode.startswith("fsdp")
    assert best.total_bytes <= int(0.9 * (16 << 30))
    # internal consistency: every candidate ranked before the pick overflows
    for label, pl, fits in tried:
        if pl is best:
            break
        assert fits is not True, label
    else:
        raise AssertionError("suggested plan not in tried list")


def test_suggest_none_when_nothing_fits_and_divisibility_reasons():
    from clip_mixer_tpu.utils.memory import suggest

    best, _ = suggest(PRESETS["vit-l14"], 8, global_batch=32768, hbm_bytes=1 << 30)
    assert best is None

    # indivisible global batch: candidates are skipped with a reason string
    _, tried = suggest(PRESETS["mixer-b32"], 8, global_batch=12)
    reasons = [fits for _, pl, fits in tried if pl is None]
    assert any("not divisible" in r for r in reasons)


def test_suggest_prices_ema():
    """--suggest with ema=True must include the extra params-size (a plan
    the tool blesses without it can OOM once --ema-decay is enabled)."""
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.utils.memory import suggest

    cfg = PRESETS["mixer-b32"]
    _, tried = suggest(cfg, 8, 8192, hbm_bytes=16 << 30)
    _, tried_e = suggest(cfg, 8, 8192, hbm_bytes=16 << 30, ema=True)
    by_label = {lbl: p for lbl, p, _ in tried if p is not None}
    for lbl, p, _ in tried_e:
        if p is not None and lbl in by_label:
            assert p.opt_bytes == by_label[lbl].opt_bytes + by_label[lbl].params_bytes


def test_vit_l14_336_transient_term_rejects_oom_batch():
    """Round-5 hardware lesson, pinned: vit-l14-336 at B=256 OOMs a 16GB
    v5e on bf16[256,16,577,577] attention-score temps. The planner's
    transformer-block transient term must price that batch OVER budget,
    while the accum-microbatch plan that executed on hardware
    (BIG_PRESETS.json: B=512 accum 8 -> microbatch 64) stays under."""
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.utils.memory import plan

    cfg = PRESETS["vit-l14-336"].replace(remat=True)
    budget = int(16 * (1 << 30) * 0.9)
    assert plan(cfg, "dp", 1, 256).total_bytes > budget
    assert plan(cfg, "dp", 1, 512, accum_steps=8).total_bytes <= budget


def test_rn50x64_fits_only_with_remat():
    """Round-5 hardware lesson, pinned: the stored conv pyramid keeps
    un-rematted RN50x64 training off one 16GB chip at ANY batch; the
    per-bottleneck remat (models/resnet.py) fits B=16, which compiled and
    ran on hardware (BIG_PRESETS.json)."""
    from clip_mixer_tpu.config import PRESETS
    from clip_mixer_tpu.utils.memory import plan

    budget = int(16 * (1 << 30) * 0.9)
    no_remat = PRESETS["rn50x64"]
    assert no_remat.remat is False
    assert all(plan(no_remat, "dp", 1, b).total_bytes > budget
               for b in (64, 32, 16, 8))
    remat = no_remat.replace(remat=True)
    assert plan(remat, "dp", 1, 16).total_bytes <= budget
