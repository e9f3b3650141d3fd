"""Reverse-converter gates: params -> reference-format state_dict.

Round-trip (export -> re-import) must be exact, and the exported dict must
load into the reference torch model class and produce identical outputs —
i.e. checkpoints trained here are usable by reference-ecosystem tooling.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/training/clip")

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models import clip as clip_model
from clip_mixer_tpu.models.convert import params_to_state_dict, state_dict_to_params

CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=13,
    vocab_size=256,
    text_width=64,
    text_heads=1,
    text_layers=2,
    tower="mixer",
    compute_dtype="float32",
)


@pytest.mark.parametrize("tower", ["mixer", "transformer"])
def test_roundtrip_exact(tower):
    cfg = CFG.replace(tower=tower)
    params = clip_model.init(jax.random.key(5), cfg)
    sd = params_to_state_dict(params, cfg)
    params2, cfg2 = state_dict_to_params(sd)
    assert cfg2.replace(compute_dtype=cfg.compute_dtype) == cfg
    la, lb = jax.tree.leaves(params), jax.tree.leaves(params2)
    assert len(la) == len(lb)  # zip would hide a silently-dropped leaf
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """scripts/convert_checkpoint.py: torch .pt -> native dir -> torch .pt
    preserves every tensor exactly (the migration path both directions)."""
    import torch

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import convert_checkpoint

    params = clip_model.init(jax.random.key(8), CFG)
    src_pt = str(tmp_path / "src.pt")
    torch.save({k: torch.as_tensor(v.copy()) for k, v in params_to_state_dict(params, CFG).items()}, src_pt)

    native = str(tmp_path / "native")
    convert_checkpoint.main([src_pt, native, "--compute-dtype", "float32"])
    back_pt = str(tmp_path / "back.pt")
    convert_checkpoint.main([native, back_pt, "--to", "torch"])

    a = torch.load(src_pt, weights_only=True)
    b = torch.load(back_pt, weights_only=True)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k].numpy(), b[k].numpy())


def test_export_loads_into_reference_model():
    import torch
    from model import CLIP as TorchCLIP

    cfg = CFG
    params = clip_model.init(jax.random.key(6), cfg)
    sd = {k: torch.as_tensor(v.copy()) for k, v in params_to_state_dict(params, cfg).items()}

    tm = TorchCLIP(32, 32, 2, 64, 16, 13, 256, 64, 1, 2, useTransformer=False).float()
    tm.load_state_dict(sd, strict=True)  # strict raises on missing/unexpected keys
    tm = tm.eval()

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    text = np.zeros((2, 13), np.int64)
    text[:, 0] = 254
    text[:, 1] = 10
    text[:, 2] = 255
    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(images)).numpy()
    j_img = np.asarray(
        clip_model.encode_image(params, cfg, jnp.asarray(images.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(j_img, t_img, atol=5e-5, rtol=1e-3)


def test_load_accelerate_format_dir(tmp_path):
    """Accelerate save_state directories (module.-prefixed safetensors /
    pytorch_model.bin) load through the public API — the only format the
    reference's own trained Mixer checkpoints exist in."""
    import torch
    from safetensors.torch import save_file

    import clip_mixer_tpu as cm
    from model import CLIP as TorchCLIP

    torch.manual_seed(9)
    tm = TorchCLIP(32, 32, 2, 64, 16, 13, 256, 64, 1, 2, useTransformer=False).float().eval()
    sd = {f"module.{k}": v.contiguous() for k, v in tm.state_dict().items()}
    d = tmp_path / "accel_ckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))

    params, cfg, _ = cm.load(str(d), compute_dtype="float32")
    assert cfg.tower == "mixer" and cfg.context_length == 13

    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(images)).numpy()
    j_img = np.asarray(
        clip_model.encode_image(params, cfg, jnp.asarray(images.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(j_img, t_img, atol=5e-5, rtol=1e-3)


RN_CFG = CLIPConfig(
    embed_dim=32,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_patch_size=None,
    context_length=13,
    vocab_size=256,
    text_width=64,
    text_heads=1,
    text_layers=1,
    tower="transformer",
    compute_dtype="float32",
)


def test_resnet_roundtrip_exact():
    params = clip_model.init(jax.random.key(7), RN_CFG)
    sd = params_to_state_dict(params, RN_CFG)
    params2, cfg2 = state_dict_to_params(sd)
    assert cfg2.replace(compute_dtype="float32") == RN_CFG
    leaves_a = jax.tree.leaves(params)
    leaves_b = jax.tree.leaves(params2)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_resnet_export_loads_into_reference_model():
    import torch
    from model import CLIP as TorchCLIP

    params = clip_model.init(jax.random.key(8), RN_CFG)
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in params_to_state_dict(params, RN_CFG).items()}

    tm = TorchCLIP(32, 64, (1, 1, 1, 1), 8, None, 13, 256, 64, 1, 1, useTransformer=True).float()
    tm.load_state_dict(sd, strict=True)
    tm = tm.eval()

    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(images)).numpy()
    j_img = np.asarray(
        clip_model.encode_image(params, RN_CFG, jnp.asarray(images.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(j_img, t_img, atol=2e-4, rtol=1e-3)
