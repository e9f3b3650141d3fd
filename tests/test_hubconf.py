"""Hub entrypoints (reference hubconf.py:8-42 equivalent): one sanitised
entrypoint per registry model + preset, returning the native triple or the
reference-style torch pair with compat=True."""

import importlib.util
import os

import torch


def _hubconf():
    path = os.path.join(os.path.dirname(__file__), "..", "hubconf.py")
    spec = importlib.util.spec_from_file_location("hubconf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entrypoints_exist_and_sanitised():
    hub = _hubconf()
    for name in ["ViT_B_32", "RN50", "ViT_L_14_336px", "mixer_b32", "mixer_debug"]:
        assert callable(getattr(hub, name)), name
    assert callable(hub.tokenize)


def test_entrypoint_native_and_compat():
    hub = _hubconf()
    params, cfg, preprocess = hub.mixer_debug()
    assert cfg.tower == "mixer" and "visual" in params

    model, tpre = hub.mixer_debug(compat=True, device="cpu")
    toks = hub.tokenize(["hub"], context_length=model.context_length)
    feats = model.encode_text(torch.from_numpy(toks).long())
    assert feats.shape == (1, cfg.embed_dim)
