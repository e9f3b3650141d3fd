"""One-command acceptance gate against a real (or stand-in) OpenAI checkpoint.

The reference's only real automated quality gate is loading each registry
model and reproducing the README demo probabilities
(/root/reference/tests/test_consistency.py:9-25, README.md:59
``[[0.9928, 0.0042, 0.0030]]``); the north star additionally demands
ImageNet zero-shot top-1 within 0.1% of the torch reference. This script
runs all of that end-to-end and writes ``ACCEPTANCE.json``:

  (a) README demo probs — our JAX pipeline AND the torch reference executed
      side-by-side on CLIP.png x {"a diagram","a dog","a cat"}; plus the
      published-probs oracle when the checkpoint is the real ViT-B/32.
  (b) ImageNet(V2) zero-shot top-1 — ours on the full set; ours-vs-torch
      side-by-side parity (|delta| <= 0.1%) on a common subset (the torch
      leg runs on host CPU, so it is capped by --torch-n-images).
  (c) the int8 noise-floor gate (evals/quant_gate.py) on THIS checkpoint
      with natural-ish rendered images (not the procedural gate set).

Zero-egress today: ``--stand-in`` proves the whole harness end-to-end with a
randomly-initialised torch reference checkpoint (reduced geometry, real
49408-token vocab) and a generated class-folder eval set. The moment the
driver seeds ``~/.cache/clip/ViT-B-32.pt`` (or egress exists), the real run
is just::

    python scripts/acceptance.py --imagenet datasetImageNet

Exit code 0 iff every stage that executed passed.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEMO_PROMPTS = ["a diagram", "a dog", "a cat"]
# README.md:59 — published OpenAI ViT-B/32 output on CLIP.png.
PUBLISHED_PROBS = np.array([[0.9927937, 0.00421068, 0.00299572]])
ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "assets", "CLIP.png")
NORM_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
NORM_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# 16 stand-in classes: (color, shape) pairs rendered by make_dress_dataset.
STANDIN_CLASSES = [
    ("red", "circle"), ("green", "square"), ("blue", "triangle"), ("yellow", "ring"),
    ("purple", "diamond"), ("orange", "cross"), ("white", "dot"), ("black", "stripe"),
    ("pink", "circle"), ("brown", "square"), ("teal", "triangle"), ("gray", "ring"),
    ("red", "diamond"), ("green", "cross"), ("blue", "dot"), ("yellow", "stripe"),
]


def _torch_reference(state_dict):
    """Build the reference torch model (read-only oracle) from a state_dict."""
    if "ftfy" not in sys.modules:  # identity stub, as tests/conftest.py
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    sys.path.insert(0, "/root/reference/training/clip")
    import torch  # noqa: F401
    from model import build_model

    model = build_model({k: v.clone() for k, v in state_dict.items()})
    return model.float().eval()


def _torch_encode_images(model, images_u8):
    """uint8 HWC batch -> torch-reference image features (the training-loop
    normalize, /root/reference/training/training.py:115,149)."""
    import torch

    x = images_u8.astype(np.float32) / 255.0
    x = (x - NORM_MEAN) / NORM_STD
    x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        f = model.encode_image(x)
        return (f / f.norm(dim=-1, keepdim=True)).numpy()


def _torch_classifier(model, classnames, templates, progress=""):
    """Prompt-ensemble classifier via the torch reference
    (/root/reference/training/clip/validation.py:119-134)."""
    import torch

    from clip_mixer_tpu import tokenize

    cols = []
    with torch.no_grad():
        for i, name in enumerate(classnames):
            if progress and i % 50 == 0:
                print(f"[acceptance]   torch classifier {progress}: {i}/{len(classnames)}", flush=True)
            toks = torch.from_numpy(np.asarray(tokenize([t.format(name) for t in templates], truncate=True)))
            f = model.encode_text(toks)
            f = f / f.norm(dim=-1, keepdim=True)
            f = f.mean(0)
            cols.append((f / f.norm()).numpy())
    return np.stack(cols, 1)  # [D, C]


def _make_standin_checkpoint(path):
    """Random-init torch reference CLIP (ViT tower, reduced width/depth but
    the REAL 49408 vocab + 77 context so real tokenized prompts are in-range)
    saved as a plain state_dict .pt — exactly what api.load converts."""
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    sys.path.insert(0, "/root/reference/training/clip")
    import torch
    from model import CLIP as TorchCLIP

    torch.manual_seed(7)
    m = TorchCLIP(
        embed_dim=128, image_resolution=224, vision_layers=2, vision_width=128,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
        useTransformer=True,
    )
    torch.save(m.float().eval().state_dict(), path)
    return path


def _make_standin_imagenet(root, per_class, size, seed=123):
    """Class-folder eval set (the ImageNetV2 extracted layout: <root>/<idx>/*.jpg)
    from the natural-ish renderer, classes = STANDIN_CLASSES."""
    from PIL import Image

    from make_dress_dataset import render_sample

    idx = 0
    for c, (color, shape) in enumerate(STANDIN_CLASSES):
        d = os.path.join(root, str(c))
        os.makedirs(d, exist_ok=True)
        for k in range(per_class):
            img, _ = render_sample(seed, idx, size=size, color=color, shape=shape)
            Image.fromarray(img).save(os.path.join(d, f"{k}.jpeg"), quality=92)
            idx += 1
    return [f"{color} {shape}" for color, shape in STANDIN_CLASSES]


def _standin_batches(root, n_classes, batch_size, image_size):
    """Class-folder batches for the stand-in set (``_imagenetv2_batches``
    hard-codes the real dataset's 1000 class dirs)."""
    from PIL import Image

    from clip_mixer_tpu.ops.preprocess import preprocess_pil

    def gen():
        images, targets = [], []
        for cls in range(n_classes):
            d = os.path.join(root, str(cls))
            for fname in sorted(os.listdir(d)):
                with Image.open(os.path.join(d, fname)) as im:
                    images.append(preprocess_pil(im, image_size))
                targets.append(cls)
                if len(images) == batch_size:
                    yield np.stack(images), np.asarray(targets)
                    images, targets = [], []
        if images:
            yield np.stack(images), np.asarray(targets)

    return gen()


def stage_demo_probs(params, cfg, preprocess, torch_model, check_published):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import clip_mixer_tpu as cm
    from clip_mixer_tpu.models import clip as clip_model
    from clip_mixer_tpu.ops.preprocess import normalize_images

    image_u8 = preprocess(Image.open(ASSET))
    text = jnp.asarray(cm.tokenize(DEMO_PROMPTS))
    img = normalize_images(jnp.asarray(image_u8[None]), dtype=jnp.float32)
    per_image, _ = clip_model.logits(params, cfg, img, text)
    ours = np.asarray(jax.nn.softmax(per_image, axis=-1), np.float64)

    # torch reference, same pixels (our host preprocess) and same prompts
    import torch

    tfeat_img = _torch_encode_images(torch_model, image_u8[None])
    toks = torch.from_numpy(np.asarray(cm.tokenize(DEMO_PROMPTS)))
    with torch.no_grad():
        tf = torch_model.encode_text(toks)
        tf = (tf / tf.norm(dim=-1, keepdim=True)).numpy()
        scale = float(torch_model.logit_scale.exp())
    tlogits = scale * tfeat_img @ tf.T
    theirs = np.exp(tlogits - tlogits.max(-1, keepdims=True))
    theirs = theirs / theirs.sum(-1, keepdims=True)

    out = {
        "ours": ours.tolist(),
        "torch": theirs.tolist(),
        "max_abs_diff_vs_torch": float(np.abs(ours - theirs).max()),
        # the reference's own tolerance (tests/test_consistency.py:25)
        "passed": bool(np.allclose(ours, theirs, atol=0.01, rtol=0.1)),
    }
    if check_published:
        out["expected_published"] = PUBLISHED_PROBS.tolist()
        out["published_ok"] = bool(np.allclose(ours, PUBLISHED_PROBS, atol=0.01, rtol=0.1))
        out["passed"] = out["passed"] and out["published_ok"]
    return out


def stage_imagenet(params, cfg, torch_model, batches_fn, classnames, templates,
                   torch_n_images):
    from clip_mixer_tpu.evals.zeroshot import (build_zeroshot_classifier,
                                               make_image_classifier, topk_accuracy)

    w = build_zeroshot_classifier(params, cfg, classnames, templates)
    classify = make_image_classifier(params, cfg, w)
    tw = _torch_classifier(torch_model, classnames, templates, progress="imagenet")

    n = n_common = top1 = top5 = t_top1_hits = ours_common_hits = 0
    for images, targets in batches_fn():
        logits = np.asarray(classify(images))
        a1, a5 = topk_accuracy(logits, targets)  # fractions
        top1 += 100.0 * a1 * len(targets)
        top5 += 100.0 * a5 * len(targets)
        n += len(targets)
        if n_common < torch_n_images:
            take = min(len(targets), torch_n_images - n_common)
            tf = _torch_encode_images(torch_model, images[:take])
            t_pred = (100.0 * tf @ tw).argmax(-1)
            t_top1_hits += int((t_pred == targets[:take]).sum())
            ours_common_hits += int((logits[:take].argmax(-1) == targets[:take]).sum())
            n_common += take
            print(f"[acceptance]   imagenet: {n} ours / {n_common} side-by-side", flush=True)
    ours_common = 100.0 * ours_common_hits / max(n_common, 1)
    torch_common = 100.0 * t_top1_hits / max(n_common, 1)
    return {
        "n": int(n),
        "classes": len(classnames),
        "top1_ours": top1 / max(n, 1),
        "top5_ours": top5 / max(n, 1),
        "side_by_side_n": int(n_common),
        "top1_ours_common": ours_common,
        "top1_torch_common": torch_common,
        "delta_pct": abs(ours_common - torch_common),
        "passed": bool(abs(ours_common - torch_common) <= 0.1),
    }


def stage_int8_gate(params, cfg, classnames, templates, n_images, seed=777):
    from make_dress_dataset import render_sample

    from clip_mixer_tpu.evals.quant_gate import build_float_classifier, noise_floor_gate

    imgs = np.stack([
        render_sample(seed, i, size=cfg.image_resolution)[0] for i in range(n_images)
    ])
    w = build_float_classifier(params, cfg, classnames, templates)
    res = noise_floor_gate(params, cfg, imgs, w, calibrate_n=min(128, n_images))
    res["images"] = "rendered-natural-ish"
    return res


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default="ViT-B/32",
                   help="registry name, .pt path, or native export dir")
    p.add_argument("--imagenet", default="datasetImageNet",
                   help="ImageNetV2 extracted class-folder root")
    p.add_argument("--out", default="ACCEPTANCE.json")
    p.add_argument("--stand-in", action="store_true",
                   help="zero-egress mode: random-init reference checkpoint + "
                        "generated class-folder eval set")
    p.add_argument("--torch-n-images", type=int, default=1024,
                   help="side-by-side parity subset size (torch runs on host CPU)")
    p.add_argument("--gate-images", type=int, default=512)
    p.add_argument("--platform", default=None, choices=[None, "cpu"],
                   help="force the JAX platform (sitecustomize pins "
                        "JAX_PLATFORMS; the env var is inert)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import torch

    import clip_mixer_tpu as cm
    from clip_mixer_tpu.evals.prompts import IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
    from clip_mixer_tpu.evals.validators import DatasetUnavailable, _imagenetv2_batches

    t0 = time.time()
    result = {"checkpoint": args.checkpoint, "stand_in": bool(args.stand_in)}

    if args.stand_in:
        import tempfile

        workdir = tempfile.mkdtemp(prefix="acceptance_standin_")
        ckpt = _make_standin_checkpoint(os.path.join(workdir, "standin.pt"))
        result["checkpoint"] = ckpt
        params, cfg, preprocess = cm.load(ckpt, compute_dtype="float32")
        state_dict = torch.load(ckpt, map_location="cpu", weights_only=False)
        classnames = _make_standin_imagenet(
            os.path.join(workdir, "imagenetv2-matched-frequency-format-val"),
            per_class=8, size=256)
        templates = PROMPT_TEMPLATES[:8]
        standin_root = os.path.join(workdir, "imagenetv2-matched-frequency-format-val")
        batches_fn = lambda: _standin_batches(  # noqa: E731
            standin_root, len(classnames), 64, cfg.image_resolution)
        gate_images = min(args.gate_images, 128)
    else:
        try:
            params, cfg, preprocess = cm.load(args.checkpoint, compute_dtype="float32")
        except Exception as e:
            result["error"] = (f"checkpoint unavailable ({e}); seed "
                               "~/.cache/clip or pass --stand-in")
            print(json.dumps(result))
            with open(args.out, "w") as f:
                json.dump(result, f, indent=2)
            return 2
        # the torch oracle needs the raw state_dict
        from clip_mixer_tpu.api import _MODELS

        path = args.checkpoint
        if args.checkpoint in _MODELS:
            path = os.path.join(os.path.expanduser("~/.cache/clip"),
                                os.path.basename(_MODELS[args.checkpoint]))
        try:
            obj = torch.jit.load(path, map_location="cpu").state_dict()
        except Exception:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
        state_dict = {k: v for k, v in state_dict.items() if isinstance(v, torch.Tensor)}
        classnames, templates = IMAGENET_CLASSNAMES, PROMPT_TEMPLATES
        batches_fn = lambda: _imagenetv2_batches(  # noqa: E731
            batch_size=256, location=args.imagenet, image_size=cfg.image_resolution)
        gate_images = args.gate_images

    torch_model = _torch_reference(state_dict)

    print("[acceptance] stage a: README demo probs (ours vs torch)", flush=True)
    result["demo_probs"] = stage_demo_probs(
        params, cfg, preprocess, torch_model,
        check_published=(args.checkpoint == "ViT-B/32" and not args.stand_in))

    print("[acceptance] stage b: ImageNet zero-shot parity", flush=True)
    try:
        result["imagenet"] = stage_imagenet(
            params, cfg, torch_model, batches_fn, classnames, templates,
            torch_n_images=args.torch_n_images)
    except DatasetUnavailable as e:
        result["imagenet"] = {"skipped": str(e)}

    print("[acceptance] stage c: int8 noise-floor gate on this checkpoint", flush=True)
    result["int8_gate"] = stage_int8_gate(params, cfg, classnames, templates, gate_images)

    executed = [v for v in (result["demo_probs"], result["imagenet"], result["int8_gate"])
                if "passed" in v]
    result["stages_executed"] = len(executed)
    result["passed"] = bool(executed) and all(v["passed"] for v in executed)
    result["seconds"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in ("passed", "stages_executed", "seconds")}))
    return 0 if result["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
