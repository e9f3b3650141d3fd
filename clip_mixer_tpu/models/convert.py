"""Torch-checkpoint -> JAX pytree converter with architecture sniffing.

Replaces the reference's ``build_model(state_dict)`` (model.py:469-513): the
architecture is inferred purely from state-dict shapes/keys, then tensors are
mapped onto our parameter tree. Extends the reference's sniffing — which only
recognises ViT/ResNet keys — to Mixer checkpoints as well (the reference
could only load those back through Accelerate state, validateModel.py:48-50).

All weights load as float32 masters; the compute dtype is a config choice
(bf16 on TPU), replacing the reference's surgical fp16 cast
(convert_weights, model.py:445-466).

Layout conventions converted here:
* torch Linear stores (out, in); ours is (in, out) -> transpose;
* torch Conv2d stores (out, in, kh, kw); patchify kernels become
  (kh*kw*in, out) matching ``towers.patchify``'s (ph, pw, c) flatten order,
  ResNet convs become HWIO;
* nn.MultiheadAttention packs in_proj as (3W, W) -> our (W, 3W) qkv kernel.

State dicts arrive as numpy/torch tensors; ``.pt`` loading is gated on torch
being importable (host-side only — torch never touches the TPU path).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clip_mixer_tpu.config import CLIPConfig
from clip_mixer_tpu.models.layers import stack_layers


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().float().numpy()  # torch tensor


def sniff_config(sd: Dict) -> CLIPConfig:
    """Infer the architecture from state-dict shapes (reference
    model.py:469-492, extended with the mixer branch)."""
    is_vit = "visual.proj" in sd
    is_mixer = any(".mixBlocks." in k for k in sd)

    embed_dim = sd["text_projection"].shape[1]
    vocab_size = sd["token_embedding.weight"].shape[0]
    text_width = sd["ln_final.weight"].shape[0]
    if is_mixer:
        context_length = sd["transformer.mixBlocks.0.token_mix_seq.lin1.weight"].shape[1]
        text_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.mixBlocks")})
    else:
        context_length = sd["positional_embedding"].shape[0]
        text_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")})

    if is_vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_patch = sd["visual.conv1.weight"].shape[-1]
        if is_mixer:
            vision_layers = len(
                {k.split(".")[3] for k in sd if k.startswith("visual.transformer.mixBlocks")}
            )
            vis_tokens = sd["visual.transformer.mixBlocks.0.token_mix_seq.lin1.weight"].shape[1]
            grid = round((vis_tokens - 1) ** 0.5)
        else:
            vision_layers = len(
                [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
            )
            grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch * grid
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")}) for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        vision_patch = None
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = out_width * 32

    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch,
        context_length=context_length,
        vocab_size=vocab_size,
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
        tower="mixer" if is_mixer else "transformer",
    )


def _ln(sd, prefix: str) -> Dict:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])), "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _attn_block(sd, p: str) -> Dict:
    return {
        "ln_1": _ln(sd, f"{p}.ln_1"),
        "attn": {
            "qkv_kernel": jnp.asarray(_np(sd[f"{p}.attn.in_proj_weight"]).T),
            "qkv_bias": jnp.asarray(_np(sd[f"{p}.attn.in_proj_bias"])),
            "out_kernel": jnp.asarray(_np(sd[f"{p}.attn.out_proj.weight"]).T),
            "out_bias": jnp.asarray(_np(sd[f"{p}.attn.out_proj.bias"])),
        },
        "ln_2": _ln(sd, f"{p}.ln_2"),
        "mlp": {
            "w_in": jnp.asarray(_np(sd[f"{p}.mlp.c_fc.weight"]).T),
            "b_in": jnp.asarray(_np(sd[f"{p}.mlp.c_fc.bias"])),
            "w_out": jnp.asarray(_np(sd[f"{p}.mlp.c_proj.weight"]).T),
            "b_out": jnp.asarray(_np(sd[f"{p}.mlp.c_proj.bias"])),
        },
    }


def _mixer_block(sd, p: str) -> Dict:
    return {
        "ln_token": _ln(sd, f"{p}.layerNorm1"),
        "token_mix": {
            "w_in": jnp.asarray(_np(sd[f"{p}.token_mix_seq.lin1.weight"]).T),
            "b_in": jnp.asarray(_np(sd[f"{p}.token_mix_seq.lin1.bias"])),
            "w_out": jnp.asarray(_np(sd[f"{p}.token_mix_seq.lin2.weight"]).T),
            "b_out": jnp.asarray(_np(sd[f"{p}.token_mix_seq.lin2.bias"])),
        },
        "ln_channel": _ln(sd, f"{p}.layerNorm2"),
        "channel_mix": {
            "w_in": jnp.asarray(_np(sd[f"{p}.channel_mix_seq.lin3.weight"]).T),
            "b_in": jnp.asarray(_np(sd[f"{p}.channel_mix_seq.lin3.bias"])),
            "w_out": jnp.asarray(_np(sd[f"{p}.channel_mix_seq.lin4.weight"]).T),
            "b_out": jnp.asarray(_np(sd[f"{p}.channel_mix_seq.lin4.bias"])),
        },
    }


def _tower(sd, prefix: str, n_layers: int, mixer: bool) -> Dict:
    if mixer:
        blocks = [_mixer_block(sd, f"{prefix}.mixBlocks.{i}") for i in range(n_layers)]
    else:
        blocks = [_attn_block(sd, f"{prefix}.resblocks.{i}") for i in range(n_layers)]
    return {"blocks": stack_layers(blocks)}


def _conv_hwio(sd, key: str) -> Dict:
    return {"kernel": jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))}


def _bn(sd, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def _resnet_visual(sd, cfg: CLIPConfig) -> Dict:
    params: Dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv_hwio(sd, f"visual.conv{i}.weight")
        params[f"bn{i}"] = _bn(sd, f"visual.bn{i}")
    for li, blocks in enumerate(cfg.vision_layers):
        stage = []
        for b in range(blocks):
            p = f"visual.layer{li + 1}.{b}"
            bp = {
                "conv1": _conv_hwio(sd, f"{p}.conv1.weight"),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv_hwio(sd, f"{p}.conv2.weight"),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv_hwio(sd, f"{p}.conv3.weight"),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _conv_hwio(sd, f"{p}.downsample.0.weight"),
                    "bn": _bn(sd, f"{p}.downsample.1"),
                }
            stage.append(bp)
        params[f"layer{li + 1}"] = stage

    def lin(p):
        return {
            "kernel": jnp.asarray(_np(sd[f"{p}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{p}.bias"])),
        }

    params["attnpool"] = {
        "pos_embedding": jnp.asarray(_np(sd["visual.attnpool.positional_embedding"])),
        "q": lin("visual.attnpool.q_proj"),
        "k": lin("visual.attnpool.k_proj"),
        "v": lin("visual.attnpool.v_proj"),
        "c": lin("visual.attnpool.c_proj"),
    }
    return params


def _vit_visual(sd, cfg: CLIPConfig) -> Dict:
    w = _np(sd["visual.conv1.weight"])  # [W, 3, p, p]
    patch_kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])  # [(ph pw c), W]
    params: Dict = {
        "patch_embed": {"kernel": jnp.asarray(patch_kernel)},
        "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": jnp.asarray(_np(sd["visual.proj"])),
        "tower": _tower(sd, "visual.transformer", cfg.vision_layers, mixer=not cfg.use_transformer),
    }
    if cfg.use_transformer:
        params["pos_embedding"] = jnp.asarray(_np(sd["visual.positional_embedding"]))
    return params


def state_dict_to_params(sd: Dict) -> Tuple[Dict, CLIPConfig]:
    """Convert a reference-format torch state_dict to (params, config)."""
    # Drop non-tensor bookkeeping keys (reference model.py:507-509).
    sd = {k: v for k, v in sd.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    cfg = sniff_config(sd)

    text: Dict = {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
        "ln_final": _ln(sd, "ln_final"),
        "projection": jnp.asarray(_np(sd["text_projection"])),
        "tower": _tower(sd, "transformer", cfg.text_layers, mixer=not cfg.use_transformer),
    }
    if cfg.use_transformer:
        text["pos_embedding"] = jnp.asarray(_np(sd["positional_embedding"]))

    visual = _resnet_visual(sd, cfg) if cfg.is_resnet else _vit_visual(sd, cfg)
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(float(_np(sd["logit_scale"])), jnp.float32),
    }
    return params, cfg


def params_to_state_dict(params: Dict, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Inverse converter: JAX pytree -> reference-format torch state_dict
    (numpy values; wrap with torch.as_tensor to save a .pt the reference's
    ``build_model``/Accelerate paths can load). Exact round-trip with
    :func:`state_dict_to_params` is tested."""
    sd: Dict[str, np.ndarray] = {}

    def put_ln(prefix, ln):
        sd[f"{prefix}.weight"] = np.asarray(ln["scale"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(ln["bias"], np.float32)

    def unstack(tree, i):
        return jax.tree.map(lambda x: np.asarray(x[i], np.float32), tree)

    def put_tower(prefix, tower, n_layers, mixer):
        for i in range(n_layers):
            b = unstack(tower["blocks"], i)
            if mixer:
                p = f"{prefix}.mixBlocks.{i}"
                put_ln(f"{p}.layerNorm1", b["ln_token"])
                sd[f"{p}.token_mix_seq.lin1.weight"] = b["token_mix"]["w_in"].T
                sd[f"{p}.token_mix_seq.lin1.bias"] = b["token_mix"]["b_in"]
                sd[f"{p}.token_mix_seq.lin2.weight"] = b["token_mix"]["w_out"].T
                sd[f"{p}.token_mix_seq.lin2.bias"] = b["token_mix"]["b_out"]
                put_ln(f"{p}.layerNorm2", b["ln_channel"])
                sd[f"{p}.channel_mix_seq.lin3.weight"] = b["channel_mix"]["w_in"].T
                sd[f"{p}.channel_mix_seq.lin3.bias"] = b["channel_mix"]["b_in"]
                sd[f"{p}.channel_mix_seq.lin4.weight"] = b["channel_mix"]["w_out"].T
                sd[f"{p}.channel_mix_seq.lin4.bias"] = b["channel_mix"]["b_out"]
            else:
                p = f"{prefix}.resblocks.{i}"
                put_ln(f"{p}.ln_1", b["ln_1"])
                sd[f"{p}.attn.in_proj_weight"] = b["attn"]["qkv_kernel"].T
                sd[f"{p}.attn.in_proj_bias"] = b["attn"]["qkv_bias"]
                sd[f"{p}.attn.out_proj.weight"] = b["attn"]["out_kernel"].T
                sd[f"{p}.attn.out_proj.bias"] = b["attn"]["out_bias"]
                put_ln(f"{p}.ln_2", b["ln_2"])
                sd[f"{p}.mlp.c_fc.weight"] = b["mlp"]["w_in"].T
                sd[f"{p}.mlp.c_fc.bias"] = b["mlp"]["b_in"]
                sd[f"{p}.mlp.c_proj.weight"] = b["mlp"]["w_out"].T
                sd[f"{p}.mlp.c_proj.bias"] = b["mlp"]["b_out"]

    def put_conv(key, conv):
        # HWIO -> torch OIHW
        sd[key] = np.asarray(conv["kernel"], np.float32).transpose(3, 2, 0, 1)

    def put_bn(prefix, bn):
        sd[f"{prefix}.weight"] = np.asarray(bn["scale"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(bn["bias"], np.float32)
        sd[f"{prefix}.running_mean"] = np.asarray(bn["mean"], np.float32)
        sd[f"{prefix}.running_var"] = np.asarray(bn["var"], np.float32)
        # torch BatchNorm2d buffers include this; emit it so the reference
        # model loads with strict=True (the importer ignores it).
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    if cfg.is_resnet:
        v = params["visual"]
        for i in (1, 2, 3):
            put_conv(f"visual.conv{i}.weight", v[f"conv{i}"])
            put_bn(f"visual.bn{i}", v[f"bn{i}"])
        for li, blocks in enumerate(cfg.vision_layers):
            for b in range(blocks):
                p = f"visual.layer{li + 1}.{b}"
                bp = v[f"layer{li + 1}"][b]
                for j in (1, 2, 3):
                    put_conv(f"{p}.conv{j}.weight", bp[f"conv{j}"])
                    put_bn(f"{p}.bn{j}", bp[f"bn{j}"])
                if "downsample" in bp:
                    # reference Bottleneck downsample: ("-1" avgpool, "0" conv,
                    # "1" bn) — model.py:36-41
                    put_conv(f"{p}.downsample.0.weight", bp["downsample"]["conv"])
                    put_bn(f"{p}.downsample.1", bp["downsample"]["bn"])
        ap = v["attnpool"]
        sd["visual.attnpool.positional_embedding"] = np.asarray(ap["pos_embedding"], np.float32)
        for name in ("q", "k", "v", "c"):
            sd[f"visual.attnpool.{name}_proj.weight"] = np.asarray(ap[name]["kernel"], np.float32).T
            sd[f"visual.attnpool.{name}_proj.bias"] = np.asarray(ap[name]["bias"], np.float32)

        t = params["text"]
        sd["token_embedding.weight"] = np.asarray(t["token_embedding"], np.float32)
        sd["positional_embedding"] = np.asarray(t["pos_embedding"], np.float32)
        put_tower("transformer", t["tower"], cfg.text_layers, mixer=not cfg.use_transformer)
        put_ln("ln_final", t["ln_final"])
        sd["text_projection"] = np.asarray(t["projection"], np.float32)
        sd["logit_scale"] = np.asarray(params["logit_scale"], np.float32)
        return sd

    v = params["visual"]
    w = np.asarray(v["patch_embed"]["kernel"], np.float32)  # [(ph pw c), W]
    p_sz = cfg.vision_patch_size
    sd["visual.conv1.weight"] = w.reshape(p_sz, p_sz, 3, cfg.vision_width).transpose(3, 2, 0, 1)
    sd["visual.class_embedding"] = np.asarray(v["class_embedding"], np.float32)
    if cfg.use_transformer:
        sd["visual.positional_embedding"] = np.asarray(v["pos_embedding"], np.float32)
    put_ln("visual.ln_pre", v["ln_pre"])
    put_tower("visual.transformer", v["tower"], cfg.vision_layers, mixer=not cfg.use_transformer)
    put_ln("visual.ln_post", v["ln_post"])
    sd["visual.proj"] = np.asarray(v["proj"], np.float32)

    t = params["text"]
    sd["token_embedding.weight"] = np.asarray(t["token_embedding"], np.float32)
    if cfg.use_transformer:
        sd["positional_embedding"] = np.asarray(t["pos_embedding"], np.float32)
    put_tower("transformer", t["tower"], cfg.text_layers, mixer=not cfg.use_transformer)
    put_ln("ln_final", t["ln_final"])
    sd["text_projection"] = np.asarray(t["projection"], np.float32)
    sd["logit_scale"] = np.asarray(params["logit_scale"], np.float32)
    # A "logit_bias" leaf (siglip-trained models, CLIPConfig.logit_bias_init)
    # is deliberately DROPPED: the reference format has no slot for it and it
    # only parameterises the sigmoid training objective — inference is
    # unaffected (an additive per-logit constant is softmax/ranking
    # invariant), so the exported checkpoint encodes identically.
    return sd


def load_torch_checkpoint(path: str) -> Tuple[Dict, CLIPConfig]:
    """Load a torch checkpoint and convert.

    Accepts: a .pt file (JIT archive or plain state_dict — the reference load
    fallback chain, clip.py:127-137), a .safetensors file, or an
    Accelerate ``save_state`` output directory (model.safetensors /
    pytorch_model.bin) — the only format the reference's own trained Mixer
    checkpoints exist in (validateModel.py:48-50). Host-side only.
    """
    import os

    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin", "pytorch_model/mp_rank_00_model_states.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no model weights found under {path}")

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    else:
        import torch

        try:
            model = torch.jit.load(path, map_location="cpu").eval()
            sd = model.state_dict()
        except RuntimeError:
            sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # DDP-wrapped state dicts (Accelerate) prefix every key with "module."
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module.") :]: v for k, v in sd.items()}
    return state_dict_to_params(sd)
