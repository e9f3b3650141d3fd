"""Hub entrypoints — the reference hubconf.py equivalent.

The reference dynamically creates one torch.hub entrypoint per registry model
with punctuation sanitised to underscores (hubconf.py:8,40-42). Same naming
here; each entrypoint returns ``(params, cfg, preprocess)`` from
``clip_mixer_tpu.load`` — or, with ``compat=True``, the reference-style
``(model, preprocess)`` pair of torch-tensor objects
(``clip_mixer_tpu.compat``), matching what the reference's hub returned.
"""

from clip_mixer_tpu.api import _MODELS, available_models, load
from clip_mixer_tpu.config import PRESETS

dependencies = ["jax", "numpy"]


def tokenize(*args, **kwargs):
    from clip_mixer_tpu.text import tokenize as _tokenize

    return _tokenize(*args, **kwargs)


def _create_entrypoint(model_name):
    def entrypoint(compat=False, **kwargs):
        if compat:
            from clip_mixer_tpu import compat as _compat

            return _compat.load(model_name, **kwargs)
        return load(model_name, **kwargs)

    entrypoint.__doc__ = (
        f"Load the {model_name} model (params, cfg, preprocess); "
        "compat=True returns the reference-style torch (model, preprocess)."
    )
    return entrypoint


_SANITIZED = {
    name.replace("/", "_").replace("-", "_").replace("@", "_"): name
    for name in list(_MODELS.keys()) + list(PRESETS.keys())
}

for _entry, _name in _SANITIZED.items():
    globals()[_entry] = _create_entrypoint(_name)
